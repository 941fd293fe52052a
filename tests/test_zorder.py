"""Z-order (Morton) layout — partitioning.zorder_value /
zorder_layout / file_pruning_fraction.

Registry is frozen, so the oracle evidence lives HERE: the Morton key
(grid scaling + bit interleave) is re-derived bit-for-bit in DuckDB
and compared per-row; the LAYOUT claim — files tile the column space
so footer stats prune on ANY z-column — is verified by measuring the
actual skip fraction from written parquet footers against a
single-column linear layout."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fuserank_spark.partitioning import (
    file_pruning_fraction,
    zorder_layout,
    zorder_stats,
    zorder_value,
)

from .conftest import SF_SMOKE, SF_T2

BITS = 8

_ORACLE = f"""
WITH stats AS (
  SELECT min(CAST(o_custkey AS DOUBLE)) AS mn0, max(CAST(o_custkey AS DOUBLE)) AS mx0,
         min(CAST(o_totalprice AS DOUBLE)) AS mn1, max(CAST(o_totalprice AS DOUBLE)) AS mx1
  FROM orders
), g AS (
  SELECT o_orderkey,
         CAST(least(255, greatest(0,
           floor((CAST(o_custkey AS DOUBLE) - mn0) / (mx0 - mn0) * 256.0))) AS BIGINT) AS g0,
         CAST(least(255, greatest(0,
           floor((CAST(o_totalprice AS DOUBLE) - mn1) / (mx1 - mn1) * 256.0))) AS BIGINT) AS g1
  FROM orders, stats
)
SELECT o_orderkey,
       CAST(list_sum(list_transform(range(0, {BITS}), i ->
         (((g0 >> i) % 2) << (i * 2)) + (((g1 >> i) % 2) << (i * 2 + 1))))
            AS BIGINT) AS zv
FROM g ORDER BY o_orderkey
"""


def test_zorder_value_matches_duckdb_rederivation(spark, duck):
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    cols = ["o_custkey", "o_totalprice"]
    mins, maxs = zorder_stats(o, cols)
    got = [
        (r["o_orderkey"], r["zv"])
        for r in o.select(
            "o_orderkey", zorder_value(cols, mins, maxs, bits=BITS).alias("zv")
        )
        .orderBy("o_orderkey")
        .collect()
    ]
    want = [tuple(r) for r in duck.execute(_ORACLE).fetchall()]
    assert got == want


def test_zorder_layout_prunes_on_both_columns(spark, tmp_path):
    """The measurable payoff: a predicate band on EITHER z-column
    skips most files from footer stats, while a linear layout sorted
    on the leading column alone prunes only that column."""
    o = spark.read.parquet(f"{SF_T2}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    cols = ["o_custkey", "o_totalprice"]
    mins, maxs = zorder_stats(o, cols)

    zpath = str(tmp_path / "zorder")
    zorder_layout(o, cols, zpath, n_files=64, bits=16, stats=(mins, maxs))

    lpath = str(tmp_path / "linear")
    (
        o.repartitionByRange(64, F.col("o_custkey"))
        .sortWithinPartitions("o_custkey")
        .write.mode("overwrite")
        .parquet(lpath)
    )

    # 10%-of-domain band on each column
    def band(d):
        lo = mins[d] + 0.45 * (maxs[d] - mins[d])
        hi = mins[d] + 0.55 * (maxs[d] - mins[d])
        return lo, hi

    lo0, hi0 = band(0)
    lo1, hi1 = band(1)
    z_on_lead = file_pruning_fraction(zpath, "o_custkey", lo0, hi0)
    z_on_second = file_pruning_fraction(zpath, "o_totalprice", lo1, hi1)
    lin_on_lead = file_pruning_fraction(lpath, "o_custkey", lo0, hi0)
    lin_on_second = file_pruning_fraction(lpath, "o_totalprice", lo1, hi1)

    # z-order prunes substantially on BOTH dimensions
    # (measured 0.66/0.70 on this data at the worst-case midline
    # band; 0.5 leaves host-independent margin)
    assert z_on_lead >= 0.5, z_on_lead
    assert z_on_second >= 0.5, z_on_second
    # the linear layout is near-perfect on its sort column but blind
    # on the second — the gap z-order exists to close
    assert lin_on_lead >= z_on_lead
    assert lin_on_second <= 0.05, lin_on_second

    # layout is a pure reorder: same rows
    assert (
        spark.read.parquet(zpath).count()
        == spark.read.parquet(lpath).count()
        == o.count()
    )


def test_zorder_value_guards(spark):
    with pytest.raises(ValueError, match="z-bits"):
        zorder_value(["a", "b"], [0, 0], [1, 1], bits=32)
    with pytest.raises(ValueError, match="match cols"):
        zorder_value(["a", "b"], [0], [1, 1], bits=8)
    # constant column grids to 0 and nulls grid to 0
    df = spark.createDataFrame(
        [(1.0, 5.0), (None, 5.0), (2.0, 5.0)], "x double, y double"
    )
    mins, maxs = zorder_stats(df, ["x", "y"])
    vals = [
        r["zv"]
        for r in df.select(
            zorder_value(["x", "y"], mins, maxs, bits=4).alias("zv")
        ).collect()
    ]
    # y constant -> contributes nothing; null x -> grid 0
    assert vals[1] == 0
    assert all(v >= 0 for v in vals)
