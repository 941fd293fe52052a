"""The minimum end-to-end slice (SURVEY §7 step 2): fused multimodal
search over the driver's ``documents`` testdata.

Pipeline: scan → stub-embed text → encode modalities (sparse lang,
sparse source, dense n_chars) → compile a query (text + IN filter +
numeric interval) → dot-score → top-k → exact-SQL twin for recall.

Every stage is the library; this file is glue.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import schema as S
from .embed import DeterministicStubEmbedder, embed_corpus
from .encode import CorpusStats, VectorLayout, compute_stats, encode_products, record_text_dim
from .query import CompiledQuery, compile_query
from .search import topk

EMB_DIM = 64
NUM_HARMONICS = 64  # enough for ≈0.9+ fused-vs-exact recall; reference default is 200

AUX_SCHEMA = {"lang": S.SPARSE, "source": S.SPARSE, "n_chars": S.DENSE}
TEXT_SCHEMA = {"text": 1.0}


@dataclass
class DocumentCorpus:
    encoded: DataFrame
    stats: CorpusStats
    layout: VectorLayout
    num_harmonics: int = NUM_HARMONICS


def build_corpus(
    spark: SparkSession, sf_dir: str, num_harmonics: int = NUM_HARMONICS
) -> DocumentCorpus:
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).withColumn(
        "row_id", F.col("doc_id")
    )
    # source has high-ish cardinality at larger SF; cap the sparse vocab
    # story by bucketing to 16 sources (still a real categorical filter).
    # Portable md5 bucketing, not xxhash64: the flagship is oracle-checked
    # (q_fused_topk) and the hashing invariant requires engine-neutral
    # hashes anywhere a DuckDB twin must reproduce the value.
    from .pipeline_ext.hashing import portable_hash32

    docs = docs.withColumn(
        "source",
        F.concat(F.lit("srcb"), F.pmod(portable_hash32(F.col("source")), F.lit(16))),
    )
    embedded = embed_corpus(docs, TEXT_SCHEMA, dim=EMB_DIM)
    stats = compute_stats(embedded, AUX_SCHEMA)
    encoded, layout = encode_products(
        embedded, AUX_SCHEMA, stats, num_harmonics=num_harmonics
    )
    record_text_dim(layout, EMB_DIM)
    return DocumentCorpus(
        encoded=encoded, stats=stats, layout=layout, num_harmonics=num_harmonics
    )


def flagship_compiled(corpus: DocumentCorpus, num_harmonics: int | None = None) -> CompiledQuery:
    # query K must equal the corpus's encode K or the vectors misalign
    num_harmonics = corpus.num_harmonics if num_harmonics is None else num_harmonics
    aux_data = {
        "lang": ((["en", "de"], False), 2.0),
        "source": (None, 1.0),
        "n_chars": ((120.0, 360.0, False), 1.5),
    }
    return compile_query(
        "spark join filter vector search",
        aux_data,
        AUX_SCHEMA,
        corpus.stats,
        corpus.layout,
        text_embedder=DeterministicStubEmbedder(EMB_DIM),
        num_harmonics=num_harmonics,
    )


def flagship_query(spark: SparkSession, sf_dir: str, k: int = 10) -> DataFrame:
    """Fused retrieval: one exact inner-product top-k performs
    retrieval + soft filtering in a single pass (the FuseRank idea,
    reference README.md:1, src/encode.py:11-22)."""
    corpus = build_corpus(spark, sf_dir)
    cq = flagship_compiled(corpus)
    hits = topk(corpus.encoded, cq.vector, k=k)
    return hits.select("row_id", "lang", "source", "n_chars", F.round("relevance", 6).alias("relevance"))
