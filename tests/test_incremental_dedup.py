"""Incremental LSH dedup maintenance (dedup.incremental_lsh_dedup):
batch-vs-persisted-store near-dup dedup with ingest-partitioned
idempotent publish. Evidence: exact-copy corpora make the greedy
semantics coincide with global keep-first dedup (all bands match for
exact copies), so the incremental two-batch result is checked against
the global answer; plus replay-recomputes-identically (the
foreachBatch retry contract), store-growth, existing-wins,
band-parameter guard, unscorable passthrough, bootstrap, and the
streaming sink itself.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fuserank_spark.pipeline_ext.dedup import (
    build_lsh_store,
    incremental_lsh_dedup,
)
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
    b1 = _docs(spark, [(1, t[0]), (2, t[1]), (3, t[2]), (4, t[1])])  # 4 dups 2
    b2 = _docs(
        spark, [(10, t[0]), (11, t[3]), (12, t[2]), (13, t[4])]
    )  # 10 dups 1, 12 dups 3
    s1 = {r["doc_id"] for r in incremental_lsh_dedup(b1, store, ingest_id=1).collect()}
    assert s1 == {1, 2, 3}
    s2 = {r["doc_id"] for r in incremental_lsh_dedup(b2, store, ingest_id=2).collect()}
    assert s2 == {11, 13}
    assert s1 | s2 == {1, 2, 3, 11, 13}


def test_replay_same_ingest_recomputes_identically(spark, store):
    """The foreachBatch retry contract: replaying an epoch under the
    SAME ingest_id ignores its own half-published partition and
    returns the SAME survivors, and the store partition is
    overwritten, not doubled (review catch: a blind append made the
    replay match its own rows and silently lose the batch)."""
    t = _texts(spark)
    b = _docs(spark, [(i, t[i]) for i in range(5)])
    s1 = {r["doc_id"] for r in incremental_lsh_dedup(b, store, ingest_id=7).collect()}
    assert s1 == set(range(5))
    n_store = spark.read.parquet(store).count()
    assert n_store == 5 * 2  # survivors × bands
    s2 = {r["doc_id"] for r in incremental_lsh_dedup(b, store, ingest_id=7).collect()}
    assert s2 == s1
    assert spark.read.parquet(store).count() == n_store  # overwrite, not append
    # the same content under a NEW ingest id is an ordinary re-ingest:
    # everything is a store dup now
    s3 = incremental_lsh_dedup(b, store, ingest_id=8)
    assert s3.count() == 0


def test_existing_corpus_always_wins(spark, store):
    t = _texts(spark)
    incremental_lsh_dedup(_docs(spark, [(100, t[0])]), store, ingest_id="a")
    out = incremental_lsh_dedup(_docs(spark, [(1, t[0])]), store, ingest_id="b")
    assert out.count() == 0


def test_near_dup_not_just_exact_is_caught(spark, store):
    t = _texts(spark)
    long_text = " ".join((t[0] + " " + t[1]).split())
    incremental_lsh_dedup(_docs(spark, [(1, long_text)]), store, ingest_id=1)
    toks = long_text.split()
    toks[len(toks) // 2] = "perturbed"
    out = incremental_lsh_dedup(
        _docs(spark, [(2, " ".join(toks)), (3, "completely different content here")]),
        store,
        ingest_id=2,
        threshold=0.5,
    )
    assert {r["doc_id"] for r in out.collect()} == {3}


def test_band_parameter_mismatch_raises(spark, store):
    t = _texts(spark)
    incremental_lsh_dedup(_docs(spark, [(1, t[0])]), store, ingest_id=1)
    with pytest.raises(ValueError, match="bands"):
        incremental_lsh_dedup(
            _docs(spark, [(2, t[1])]), store, ingest_id=2, bands=4, rows_per_band=2
        )


def test_unscorable_docs_pass_through_and_are_not_stored(spark, store):
    """Sub-shingle texts have no signature: they survive (MinHash
    cannot judge them) and add NOTHING to the store — the degenerate
    shared-band bucket that would otherwise grow with corpus age is
    structurally impossible (review catch)."""
    t = _texts(spark)
    out = incremental_lsh_dedup(
        _docs(spark, [(1, t[0]), (2, "ab"), (3, ""), (4, None)]),
        store,
        ingest_id=1,
    )
    assert {r["doc_id"] for r in out.collect()} == {1, 2, 3, 4}
    stored_ids = {r["id"] for r in spark.read.parquet(store).collect()}
    assert stored_ids == {1}
    # and a replayed tiny doc never matches the store
    again = incremental_lsh_dedup(_docs(spark, [(9, "ab")]), store, ingest_id=2)
    assert again.count() == 1
    assert 9 not in {r["id"] for r in spark.read.parquet(store).collect()}


def test_bootstrap_store_then_ingest(spark, store):
    """build_lsh_store seeds from an already-deduped corpus; a later
    ingest of the same content is fully suppressed."""
    t = _texts(spark)
    corpus = _docs(spark, [(i, t[i]) for i in range(8)])
    build_lsh_store(corpus, store)
    assert spark.read.parquet(store).count() == 8 * 2
    out = incremental_lsh_dedup(
        _docs(spark, [(100, t[2]), (101, t[25])]), store, ingest_id=1
    )
    assert {r["doc_id"] for r in out.collect()} == {101}
    with pytest.raises(ValueError, match="bands"):
        build_lsh_store(corpus, store, bands=4, rows_per_band=2)


def test_store_and_batch_band_identically(spark, store):
    from fuserank_spark.pipeline_ext.dedup import _band_rows, minhash_signature

    t = _texts(spark)
    b = _docs(spark, [(7, t[7]), (8, t[8])])
    incremental_lsh_dedup(b, store, ingest_id=3)
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


def test_volatile_lazy_batch_is_pinned_before_decisions(spark, store):
    """The input frame is evaluated ONCE (the r12 driver-env flake:
    5/5 suppression misses on a bare ``limit(5)`` batch): a lazy batch
    whose evaluation is order-sensitive must not hand one row set to
    the victim/loser decision joins and a DIFFERENT one to the
    survivors anti-joins. A genuinely nondeterministic filter is the
    adversarial version of an unordered limit — re-ingesting stored
    content through it must still be fully suppressed, every time."""
    import random

    t = _texts(spark)
    corpus = _docs(spark, [(i, t[i]) for i in range(20)])
    build_lsh_store(corpus, store)
    flip = F.udf(lambda: random.random() < 0.5, "boolean").asNondeterministic()
    for attempt in range(3):
        volatile = (
            corpus.repartition(4)
            .withColumn("doc_id", F.col("doc_id") + 500 * (attempt + 1))
            .filter(flip())
        )
        assert (
            incremental_lsh_dedup(volatile, store, ingest_id=f"v{attempt}").count()
            == 0
        )


def test_incremental_dedup_as_foreach_batch_sink(spark, store, tmp_path):
    """The op IS the foreachBatch body (batch_id = ingest_id): a file
    stream of document batches maintains the band store across
    micro-batches — batch 2's re-ingest of batch 1's content is
    dropped by the store, not within-batch state."""
    import os

    t = _texts(spark)
    src = str(tmp_path / "src")
    os.makedirs(src)
    _docs(spark, [(1, t[0]), (2, t[1])]).coalesce(1).write.parquet(src + "/b1")
    _docs(spark, [(10, t[0]), (11, t[5])]).coalesce(1).write.parquet(src + "/b2")
    out: list[tuple[int, int]] = []

    def sink(batch_df, batch_id):
        surv = incremental_lsh_dedup(batch_df, store, ingest_id=batch_id)
        out.extend((batch_id, r["doc_id"]) for r in surv.collect())

    q = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
        .writeStream.foreachBatch(sink)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    survived = {d for _, d in out}
    assert 10 not in survived
    assert {1, 2, 11} <= survived
