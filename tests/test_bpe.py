"""BPE tokenizer induction + distributed application
(pipeline_ext.bpe). The merge loop is inherently sequential Python
(no SQL oracle form; registry frozen anyway), so evidence is:
the Sennrich paper's worked example reproduced exactly, a DuckDB
re-derivation of the distributed word-frequency training input,
distributed-apply == driver-apply parity over real docs,
reconstruction and determinism invariants, and packing integration.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fuserank_spark.pipeline_ext.bpe import (
    END,
    bpe_encode_word,
    bpe_token_count,
    bpe_tokens,
    bpe_train,
    bpe_train_from_corpus,
    word_frequencies,
)
from tests.conftest import SF_SMOKE


def test_bpe_train_reproduces_sennrich_example():
    """The worked example of Sennrich et al. 2016 §3.2: vocabulary
    {low:5, lower:2, newest:6, widest:3} — the first merges are
    (e,s), (es,t), (est,</w>), (l,o), (lo,w)."""
    wf = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = bpe_train(wf, num_merges=5)
    assert merges == [
        ("e", "s"),
        ("es", "t"),
        ("est", END),
        ("l", "o"),
        ("lo", "w"),
    ]
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    assert bpe_encode_word("lowest", ranks) == ["low", "est" + END]


def test_word_frequencies_matches_duckdb(spark, duck):
    got = [
        (r["word"], r["freq"])
        for r in word_frequencies(
            spark.read.parquet(f"{SF_SMOKE}/documents.parquet"), max_words=25
        ).collect()
    ]
    want = duck.execute(
        """
        SELECT word, count(*) AS freq FROM (
          SELECT unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS word
          FROM documents WHERE text IS NOT NULL AND trim(text) <> ''
        ) GROUP BY word ORDER BY freq DESC, word LIMIT 25
        """
    ).fetchall()
    assert got == [tuple(r) for r in want]


@pytest.fixture(scope="module")
def corpus_bpe(spark):
    docs = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id", "text")
        .cache()
    )
    merges = bpe_train_from_corpus(docs, num_merges=80)
    return docs, merges


def test_distributed_apply_matches_driver_twin(corpus_bpe):
    """mapInPandas application over every doc == bpe_encode_word run
    driver-side on the collected rows (the shared encoder makes this
    structural, the test pins the plumbing: batching, memo, NULLs)."""
    docs, merges = corpus_bpe
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    got = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe_tokens(docs, merges).collect()
    }
    for row in docs.collect():
        want = []
        for w in (row["text"] or "").lower().split():
            want.extend(bpe_encode_word(w, ranks))
        assert got[row["doc_id"]] == want


def test_bpe_tokens_reconstruct_and_count(corpus_bpe, spark):
    """Invariants: concatenating a word's BPE tokens reproduces the
    word + end marker; counts == len(tokens); subword count >= the
    whitespace count the heuristic packers use; NULL text → 0."""
    docs, merges = corpus_bpe
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    for w in ("spark", "distributed", "deduplication"):
        assert "".join(bpe_encode_word(w, ranks)) == w + END
    withnull = docs.unionByName(
        spark.createDataFrame([(999999, None)], "doc_id long, text string")
    )
    toks = bpe_tokens(withnull, merges)
    cnts = bpe_token_count(withnull, merges)
    joined = toks.join(cnts, "doc_id").withColumn("ws", F.lit(None))
    bad = joined.filter(F.size("bpe_tokens") != F.col("n_bpe_tokens")).count()
    assert bad == 0
    n_null = {r["doc_id"]: r["n_bpe_tokens"] for r in cnts.collect()}[999999]
    assert n_null == 0
    from fuserank_spark.pipeline_ext.textstats import token_count

    both = (
        token_count(docs)
        .select("doc_id", "n_tokens")
        .join(bpe_token_count(docs, merges), "doc_id")
    )
    assert both.filter(F.col("n_bpe_tokens") < F.col("n_tokens")).count() == 0


def test_bpe_training_is_deterministic(corpus_bpe, spark):
    docs, merges = corpus_bpe
    again = bpe_train_from_corpus(docs, num_merges=80)
    assert merges == again


def test_bpe_packing_integration_and_plan(corpus_bpe):
    """The subword counts drive pack_split directly; the apply plan
    is a narrow mapInPandas — no shuffle, no join."""
    docs, merges = corpus_bpe
    cnts = bpe_token_count(docs, merges)
    plan = cnts._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    assert "Exchange" not in plan and "Join" not in plan
    from fuserank_spark.pipeline_ext.packing import pack_split

    packed = pack_split(
        cnts.withColumnRenamed("n_bpe_tokens", "n_tokens"), budget=512, key_col="doc_id"
    )
    assert packed.count() > 0


def test_bpe_token_count_non_long_key(spark):
    """The mapInPandas schema derives the key's REAL type (review
    catch: a hardcoded `long` broke string keys at Arrow time)."""
    df = spark.createDataFrame(
        [("u1", "ab ab ba"), ("u2", None)], "url string, text string"
    )
    merges = bpe_train([("ab", 3), ("ba", 2)], num_merges=4)
    got = {r["url"]: r["n_bpe_tokens"] for r in bpe_token_count(df, merges, key_col="url").collect()}
    assert got["u1"] > 0 and got["u2"] == 0
