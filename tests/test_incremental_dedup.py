"""Incremental LSH dedup maintenance (dedup.incremental_lsh_dedup):
batch-vs-persisted-store near-dup dedup with store append. Evidence:
exact-copy corpora make the greedy semantics coincide with global
keep-first dedup (all bands match for exact copies), so the
incremental two-batch result is checked against the global answer;
plus idempotent-replay, store-growth, existing-wins, and
within-batch properties.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fuserank_spark.pipeline_ext.dedup import incremental_lsh_dedup
from tests.conftest import SF_SMOKE


@pytest.fixture()
def store(tmp_path):
    return str(tmp_path / "lsh_store")


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _texts(spark, n=30):
    return [
        r["text"]
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .orderBy("doc_id")
        .limit(n)
        .collect()
    ]


def test_incremental_matches_global_on_exact_copies(spark, store):
    """Batch 1 has a within-batch duplicate pair; batch 2 re-ingests
    two batch-1 docs under new ids and adds fresh docs. The
    incremental survivors across both batches must equal global
    keep-min dedup over the union (exact copies ⇒ every band
    matches ⇒ greedy == global)."""
    t = _texts(spark)
    b1 = _docs(
        spark,
        [(1, t[0]), (2, t[1]), (3, t[2]), (4, t[1])],  # 4 dups 2
    )
    b2 = _docs(
        spark,
        [(10, t[0]), (11, t[3]), (12, t[2]), (13, t[4])],  # 10 dups 1, 12 dups 3
    )
    s1 = {r["doc_id"] for r in incremental_lsh_dedup(b1, store).collect()}
    assert s1 == {1, 2, 3}
    s2 = {r["doc_id"] for r in incremental_lsh_dedup(b2, store).collect()}
    assert s2 == {11, 13}
    # global answer over the union with batch-1 ids smaller: keep-min
    # per text = {1, 2, 3, 11, 13}
    assert s1 | s2 == {1, 2, 3, 11, 13}


def test_replay_is_idempotent_and_store_growth_bounded(spark, store):
    t = _texts(spark)
    b = _docs(spark, [(i, t[i]) for i in range(5)])
    s1 = incremental_lsh_dedup(b, store)
    assert s1.count() == 5
    n_store = spark.read.parquet(store).count()
    assert n_store == 5 * 2  # survivors × bands
    # replaying the identical batch: everything is a store dup
    s2 = incremental_lsh_dedup(b, store)
    assert s2.count() == 0
    assert spark.read.parquet(store).count() == n_store  # no growth


def test_existing_corpus_always_wins(spark, store):
    """Re-ingesting old content under a SMALLER id still loses — the
    store side has precedence regardless of key order."""
    t = _texts(spark)
    incremental_lsh_dedup(_docs(spark, [(100, t[0])]), store)
    out = incremental_lsh_dedup(_docs(spark, [(1, t[0])]), store)
    assert out.count() == 0


def test_near_dup_not_just_exact_is_caught(spark, store):
    """A perturbed re-ingest (small token change, Jaccard ≥ 0.9 on
    shingles) is caught by the signature estimate, not just byte
    equality."""
    t = _texts(spark)
    long_text = " ".join((t[0] + " " + t[1]).split())
    incremental_lsh_dedup(_docs(spark, [(1, long_text)]), store)
    toks = long_text.split()
    toks[len(toks) // 2] = "perturbed"
    out = incremental_lsh_dedup(
        _docs(spark, [(2, " ".join(toks)), (3, "completely different content here")]),
        store,
        threshold=0.5,
    )
    ids = {r["doc_id"] for r in out.collect()}
    assert ids == {3}


def test_store_and_batch_band_identically(spark, store):
    """The stored band rows reproduce _band_rows of the same docs —
    one banding definition (shared helper), byte-for-byte."""
    from fuserank_spark.pipeline_ext.dedup import _band_rows, minhash_signature

    t = _texts(spark)
    b = _docs(spark, [(7, t[7]), (8, t[8])])
    incremental_lsh_dedup(b, store)
    got = {
        tuple(r)
        for r in spark.read.parquet(store)
        .select("id", "band_idx", "band_hash")
        .collect()
    }
    want = {
        tuple(r)
        for r in _band_rows(minhash_signature(b), "doc_id", 2, 4, "mh")
        .select("id", "band_idx", "band_hash")
        .collect()
    }
    assert got == want


def test_incremental_dedup_as_foreach_batch_sink(spark, store, tmp_path):
    """The op IS the foreachBatch body: a file stream of document
    batches maintains the band store across micro-batches — batch 2's
    re-ingests of batch 1's content are dropped by the store, not by
    within-batch state. availableNow + maxFilesPerTrigger=1 forces
    two separate micro-batches."""
    import os

    t = _texts(spark)
    src = str(tmp_path / "src")
    os.makedirs(src)
    _docs(spark, [(1, t[0]), (2, t[1])]).coalesce(1).write.parquet(src + "/b1")
    _docs(spark, [(10, t[0]), (11, t[5])]).coalesce(1).write.parquet(src + "/b2")
    out: list[tuple[int, int]] = []

    def sink(batch_df, batch_id):
        surv = incremental_lsh_dedup(batch_df, store)
        out.extend((batch_id, r["doc_id"]) for r in surv.collect())

    schema = "doc_id long, text string"
    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
        .writeStream.foreachBatch(sink)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    survived = {d for _, d in out}
    # doc 10 re-ingests t[0] from an EARLIER micro-batch → store drop
    assert 10 not in survived
    assert {1, 2, 11} <= survived
