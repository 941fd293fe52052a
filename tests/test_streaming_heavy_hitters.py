"""Streaming heavy hitters: per-shard MG state accumulates ACROSS
micro-batches; with budget >= distinct items per shard there are no
evictions, so the final summaries are EXACT stream counts — the
differential anchor (vs a plain batch groupBy over the same files).
Under-budget shards keep the guarantee: hot items present with
cnt >= true - n_shard/(budget+1).
"""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fuserank_spark.streaming.heavy_hitters import streaming_heavy_hitters
from fuserank_spark.streaming.incremental import read_document_stream


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="fuserank_shh_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


SCHEMA = T.StructType([T.StructField("item", T.StringType())])


def _run(spark, tmpdir, budget, shards=8):
    stream = read_document_stream(spark, f"{tmpdir}/src", schema=SCHEMA, max_files=1)
    out = streaming_heavy_hitters(stream, shards=shards, budget_per_shard=budget)
    q = (
        out.writeStream.format("memory")
        .queryName("hh_out")
        .outputMode("update")
        .option("checkpointLocation", f"{tmpdir}/ck")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # update-mode memory sink appends every trigger's emissions: the
    # current summary per shard is the one at that shard's max n_shard
    rows = spark.sql("SELECT * FROM hh_out").collect()
    spark.catalog.dropTempView("hh_out")
    latest_n = {}
    for r in rows:
        latest_n[r["shard"]] = max(latest_n.get(r["shard"], 0), r["n_shard"])
    return {
        r["item"]: r["cnt"]
        for r in rows
        if r["item"] is not None and r["n_shard"] == latest_n[r["shard"]]
    }, latest_n


def _write_batches(spark, tmpdir):
    src = f"{tmpdir}/src"
    b1 = [("hot",)] * 120 + [(f"u{i}",) for i in range(40)]
    b2 = [("hot",)] * 80 + [("warm",)] * 50 + [(f"v{i}",) for i in range(40)]
    spark.createDataFrame(b1, SCHEMA).coalesce(1).write.parquet(src)
    spark.createDataFrame(b2, SCHEMA).coalesce(1).write.mode("append").parquet(src)
    return b1 + b2


def test_streaming_hh_exact_when_budget_covers(spark, tmpdir):
    rows = _write_batches(spark, tmpdir)
    got, _ = _run(spark, tmpdir, budget=4096)
    from collections import Counter

    exact = Counter(r[0] for r in rows)
    # no evictions -> the latest summaries ARE the exact stream counts,
    # accumulated across both micro-batches
    assert got == dict(exact)
    assert got["hot"] == 200 and got["warm"] == 50


def test_streaming_hh_guarantee_under_eviction(spark, tmpdir):
    rows = _write_batches(spark, tmpdir)
    got, latest_n = _run(spark, tmpdir, budget=4)
    from collections import Counter

    exact = Counter(r[0] for r in rows)
    n_total = sum(latest_n.values())
    assert n_total == len(rows)
    # the hot item's true count exceeds any shard's n/(budget+1), so it
    # must be present, undercounting by at most its shard's bound
    assert "hot" in got
    for item, cnt in got.items():
        true = exact[item]
        assert cnt <= true  # MG never overcounts
        shard_bound = max(latest_n.values()) / (4 + 1)
        assert true - cnt <= shard_bound + 1e-9


def test_streaming_hh_validation(spark):
    with pytest.raises(ValueError, match=">= 1"):
        streaming_heavy_hitters(None, shards=0)


def test_streaming_hh_null_items_ignored(spark, tmpdir):
    """NULL items drop before sharding — a NULL shard key would kill
    the query inside the state fn (review catch)."""
    src = f"{tmpdir}/src"
    spark.createDataFrame(
        [("x",), (None,), ("x",), (None,)], SCHEMA
    ).coalesce(1).write.parquet(src)
    got, latest_n = _run(spark, tmpdir, budget=64)
    assert got == {"x": 2}
    assert sum(latest_n.values()) == 2
