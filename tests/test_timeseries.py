"""Time-series operators: sessionize gap semantics, as-of join parity
with pandas merge_asof, interval join vs a naive range join, and plan
posture (single exchange / no cartesian)."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from fuserank_spark.pipeline_ext.timeseries import (
    asof_join,
    interval_join,
    session_stats,
    sessionize,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def ts(minutes: float) -> dt.datetime:
    return T0 + dt.timedelta(minutes=minutes)


@pytest.fixture(scope="module")
def ev(spark):
    rows = [
        # user 1: two sessions split by a 45-min gap
        (1, ts(0), 1.0),
        (1, ts(10), 2.0),
        (1, ts(55), 4.0),
        (1, ts(60), 8.0),
        # user 2: single event
        (2, ts(5), 16.0),
        # user 3: events exactly gap apart (30 min => same session,
        # boundary is strict >)
        (3, ts(0), 1.0),
        (3, ts(30), 1.0),
        (3, ts(60.001), 1.0),
    ]
    return spark.createDataFrame(rows, ["user_id", "ts", "value"])


def test_sessionize_gap_semantics(ev):
    got = {
        (r["user_id"], r["ts"].minute + 60 * r["ts"].hour): r["session_seq"]
        for r in sessionize(ev, gap_minutes=30.0).collect()
    }
    assert got[(1, 0)] == 1 and got[(1, 10)] == 1
    assert got[(1, 55)] == 2 and got[(1, 60)] == 2
    assert got[(2, 5)] == 1
    # exactly 30 min apart: same session; 30.001: new session
    assert got[(3, 0)] == 1 and got[(3, 30)] == 1 and got[(3, 60)] == 2


def test_session_stats(ev):
    rows = {
        (r["user_id"], r["session_seq"]): r
        for r in session_stats(ev, gap_minutes=30.0, value_col="value").collect()
    }
    s = rows[(1, 1)]
    assert s["n_events"] == 2 and s["sum_value"] == 3.0
    assert s["session_start"] == ts(0) and s["session_end"] == ts(10)
    assert rows[(1, 2)]["sum_value"] == 12.0


def test_sessionize_single_exchange(ev):
    plan = (
        sessionize(ev)._jdf.queryExecution().executedPlan().toString()
    )
    # ONE shuffle; Spark still emits a (no-op) Sort per Window node,
    # so only the Exchange count is asserted
    assert plan.count("Exchange") == 1, plan


def _asof_frames(spark):
    left = [(1, ts(m)) for m in (0, 10, 20, 35)] + [(2, ts(5))]
    right = [(1, ts(-5), 100.0), (1, ts(10), 200.0), (1, ts(21), 300.0)]
    ldf = spark.createDataFrame(left, ["user_id", "ts"])
    rdf = spark.createDataFrame(right, ["user_id", "ts", "metric"])
    return ldf, rdf, left, right


def test_asof_matches_pandas(spark):
    ldf, rdf, left, right = _asof_frames(spark)
    got = asof_join(ldf, rdf, key_col="user_id", ts_col="ts", right_cols=["metric"])
    gotm = {(r["user_id"], r["ts"]): r["metric_r"] for r in got.collect()}
    assert got.count() == len(left)  # every left row survives

    lp = pd.DataFrame(left, columns=["user_id", "ts"]).sort_values("ts")
    rp = pd.DataFrame(right, columns=["user_id", "ts", "metric"]).sort_values("ts")
    want = pd.merge_asof(lp, rp, on="ts", by="user_id", direction="backward")
    for _, row in want.iterrows():
        w = None if pd.isna(row["metric"]) else row["metric"]
        assert gotm[(row["user_id"], row["ts"].to_pydatetime())] == w


def test_asof_tie_is_inclusive_and_matched_ts(spark):
    ldf, rdf, *_ = _asof_frames(spark)
    got = {
        (r["user_id"], r["ts"]): (r["metric_r"], r["ts_r"])
        for r in asof_join(
            ldf, rdf, key_col="user_id", ts_col="ts", right_cols=["metric"]
        ).collect()
    }
    # left ts(10) has a right row at exactly ts(10): inclusive match
    assert got[(1, ts(10))] == (200.0, ts(10))
    # user 2 has no right rows at all
    assert got[(2, ts(5))] == (None, None)


def test_asof_tolerance_nulls_stale(spark):
    ldf, rdf, *_ = _asof_frames(spark)
    got = {
        (r["user_id"], r["ts"]): r["metric_r"]
        for r in asof_join(
            ldf,
            rdf,
            key_col="user_id",
            ts_col="ts",
            right_cols=["metric"],
            tolerance_minutes=5.0,
        ).collect()
    }
    assert got[(1, ts(0))] == 100.0  # match ts(-5): exactly at tolerance, kept
    assert got[(1, ts(20))] is None  # match ts(10): 10 min stale, nulled
    assert got[(1, ts(35))] is None  # match ts(21): 14 min stale, nulled


def test_asof_no_join_in_plan(spark):
    ldf, rdf, *_ = _asof_frames(spark)
    plan = (
        asof_join(ldf, rdf, key_col="user_id", ts_col="ts", right_cols=["metric"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan, plan
    assert plan.count("Exchange") == 1, plan


def test_asof_input_validation(spark):
    ldf, rdf, *_ = _asof_frames(spark)
    with pytest.raises(ValueError, match="exclude"):
        asof_join(ldf, rdf, key_col="user_id", ts_col="ts", right_cols=["ts"])
    with pytest.raises(ValueError, match="lacks"):
        asof_join(ldf, rdf, key_col="user_id", ts_col="ts", right_cols=["nope"])


@pytest.fixture(scope="module")
def ivdata(spark):
    points = [(u, ts(m), float(m)) for u in (1, 2) for m in range(0, 120, 7)]
    intervals = [
        (100, 1, ts(0), ts(15)),
        (101, 1, ts(50), ts(130)),
        (102, 2, ts(10), ts(10.5)),
        (103, 2, ts(200), ts(210)),  # no points
    ]
    p = spark.createDataFrame(points, ["user_id", "ts", "value"])
    iv = spark.createDataFrame(intervals, ["interval_id", "user_id", "start", "end"])
    return p, iv


def test_interval_join_matches_naive(ivdata):
    p, iv = ivdata
    got = interval_join(
        p, iv, key_col="user_id", bucket_minutes=30.0
    )
    naive = (
        p.alias("p")
        .join(
            iv.alias("i"),
            (F.col("p.user_id") == F.col("i.user_id"))
            & (F.col("p.ts") >= F.col("i.start"))
            & (F.col("p.ts") <= F.col("i.end")),
        )
        .select("interval_id", "p.user_id", "p.ts", "p.value")
    )
    g = {tuple(r) for r in got.collect()}
    n = {tuple(r) for r in naive.collect()}
    assert g == n and len(g) > 0
    # each pair exactly once
    assert got.count() == got.distinct().count()


def test_interval_join_plan_is_hash_join(ivdata):
    p, iv = ivdata
    plan = (
        interval_join(p, iv, key_col="user_id", bucket_minutes=30.0)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_interval_join_max_buckets_raises(ivdata, spark):
    p, iv = ivdata
    from py4j.protocol import Py4JJavaError

    with pytest.raises(Exception) as ei:
        interval_join(
            p, iv, key_col="user_id", bucket_minutes=30.0, max_buckets=2
        ).collect()
    assert "max_buckets" in str(ei.value)
