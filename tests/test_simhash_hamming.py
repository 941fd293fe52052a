"""SimHash banded Hamming near-dup pairs (dedup.simhash_hamming_pairs).

Not in the frozen 67-entry driver registry, so the oracle evidence
lives HERE (CLAUDE.md convention): signatures, band buckets, pair
generation and the bit_count(xor) verification are re-derived in
DuckDB end-to-end and compared pair-for-pair. The test corpus mixes
exact duplicates (Hamming 0) and one-token perturbations so both the
trivial and near-threshold cases appear.

The oracle states ALL within-band pairs, so the Spark side pins an
effectively-unbounded max_bucket_size (q_ngram_jaccard precedent);
star-degrade behavior of the shared pair core is covered by its own
randomized differential test."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fuserank_spark.pipeline_ext.dedup import simhash_hamming_pairs
from fuserank_spark.pipeline_ext.hashing import portable_hash32_sql

from .conftest import SF_SMOKE

MAX_HAMMING = 3
BANDS = 4

_H = portable_hash32_sql("s")

_ORACLE = f"""
WITH base AS (
  SELECT doc_id, text FROM documents WHERE doc_id < 200
  UNION ALL
  SELECT doc_id + 10000, text FROM documents WHERE doc_id < 60
  UNION ALL
  SELECT doc_id + 20000, text || ' qqzz' FROM documents WHERE doc_id < 60
), t AS (
  SELECT doc_id,
         list_transform(regexp_split_to_array(trim(text), '\\s+'),
                        s -> {_H}) AS th
  FROM base
), sig AS (
  SELECT doc_id,
         CAST(list_sum(list_transform(range(0, 32), i ->
           CASE WHEN COALESCE(list_sum(list_transform(th,
                      h -> 2 * ((h >> i) % 2) - 1)), 0) >= 0
                THEN (CAST(1 AS BIGINT) << i) ELSE CAST(0 AS BIGINT) END))
              AS BIGINT) AS simhash
  FROM t
), banded AS (
  SELECT doc_id, simhash, i AS band_idx,
         (simhash >> (i * 8)) % 256 AS band_val
  FROM sig, (SELECT unnest(range(0, {BANDS})) AS i)
), pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         bit_count(xor(a.simhash, b.simhash)) AS hamming
  FROM banded a
  JOIN banded b ON a.band_idx = b.band_idx AND a.band_val = b.band_val
              AND a.doc_id < b.doc_id
  WHERE bit_count(xor(a.simhash, b.simhash)) <= {MAX_HAMMING}
)
SELECT id_a, id_b, hamming FROM pairs ORDER BY id_a, id_b
"""


@pytest.fixture(scope="module")
def corpus(spark):
    d = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id", "text")
    )
    base = d.filter(F.col("doc_id") < 200)
    dup = d.filter(F.col("doc_id") < 60).select(
        (F.col("doc_id") + 10000).alias("doc_id"), "text"
    )
    near = d.filter(F.col("doc_id") < 60).select(
        (F.col("doc_id") + 20000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" qqzz")).alias("text"),
    )
    c = base.unionByName(dup).unionByName(near)
    c.cache().count()
    return c


def test_simhash_hamming_pairs_match_duckdb_rederivation(corpus, duck):
    got = sorted(
        (r["id_a"], r["id_b"], r["hamming"])
        for r in simhash_hamming_pairs(
            corpus, max_hamming=MAX_HAMMING, bands=BANDS,
            max_bucket_size=10**9,
        ).collect()
    )
    want = [tuple(r) for r in duck.execute(_ORACLE).fetchall()]
    assert got == want
    # the corpus plants 60 exact duplicates: all must surface at 0
    zeros = {(a, b) for a, b, h in got if h == 0}
    assert all((i, i + 10000) in zeros for i in range(60))


def test_simhash_hamming_recall_guard():
    with pytest.raises(ValueError, match="band prefilter"):
        simhash_hamming_pairs(None, bands=4, max_hamming=4)
    with pytest.raises(ValueError, match="divisible"):
        simhash_hamming_pairs(None, bits=32, bands=5)
    # ADVICE r6: bits=64, bands=1 is band-legal when max_hamming=0 but
    # the band extraction would compute F.lit(1 << 64) → LongType
    # overflow at plan build; must raise a CLEAR error instead
    with pytest.raises(ValueError, match="overflows"):
        simhash_hamming_pairs(None, bits=64, bands=1, max_hamming=0)


def test_simhash_hamming_no_false_pairs_above_threshold(corpus):
    out = simhash_hamming_pairs(
        corpus, max_hamming=1, bands=BANDS, max_bucket_size=10**9
    )
    assert out.filter(F.col("hamming") > 1).count() == 0
