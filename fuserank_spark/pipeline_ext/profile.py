"""Table profiling: per-column statistics in long format — the
data-quality snapshot every ingestion pipeline runs before and after
a transformation (count / nulls / distinct / min / max / mean /
quantiles).

Scale posture: ONE aggregation pass computes the non-distinct
aggregates simultaneously (Catalyst fuses them into a single
partial+final agg — no per-column scans), then a driver-side unpivot
of the 1-row result into (column, metric, value) rows. ``exact=True``
uses exact count-distinct and exact interpolated percentiles (what
the DuckDB differential twin states); the EXACT distinct counts run
as a SEPARATE second agg — multiple count(distinct) in one agg makes
Catalyst Expand the input N+1×, and the exact-percentile buffers
would ride every expanded copy (measured 3× slower combined than
split). At 100 TB switch ``exact=False`` for HLL++
``approx_count_distinct`` and t-digest ``approx_percentile`` — those
rejoin the single pass (no Expand) with bounded memory."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["profile"]

_QUANTILES = (0.25, 0.5, 0.75)


def profile(df: DataFrame, cols: list[str], *, exact: bool = True) -> DataFrame:
    """Profile numeric columns → long DataFrame
    (column, n, n_null, n_distinct, min, max, mean, p25, p50, p75).
    Values are doubles rounded to 6 (cross-engine hash stability);
    counts stay exact bigints."""
    if not cols:
        raise ValueError("profile needs at least one column")
    dtypes = dict(df.dtypes)
    missing = [c for c in cols if c not in dtypes]
    if missing:
        raise ValueError(f"columns not in frame: {missing}")
    numeric = ("tinyint", "smallint", "int", "bigint", "float", "double")
    bad = [
        c
        for c in cols
        if not (dtypes[c] in numeric or dtypes[c].startswith("decimal"))
    ]
    if bad:
        raise ValueError(
            "profile() aggregates (mean/percentile/min-max-as-double) need "
            f"numeric columns; non-numeric: {[(c, dtypes[c]) for c in bad]}"
        )
    aggs = []
    for c in cols:
        col = F.col(c)
        aggs += [
            F.count(col).alias(f"{c}__n"),
            F.sum(col.isNull().cast("long")).alias(f"{c}__null"),
            F.min(col).cast("double").alias(f"{c}__min"),
            F.max(col).cast("double").alias(f"{c}__max"),
            F.avg(col).alias(f"{c}__mean"),
            (
                F.percentile(col, F.array(*[F.lit(q) for q in _QUANTILES]))
                if exact
                else F.percentile_approx(
                    col, F.array(*[F.lit(q) for q in _QUANTILES])
                )
            ).alias(f"{c}__q"),
        ]
        if not exact:
            aggs.append(F.approx_count_distinct(col).alias(f"{c}__dist"))
    row = df.agg(*aggs).collect()[0]
    if exact:
        drow = df.agg(
            *[F.countDistinct(F.col(c)).alias(f"{c}__dist") for c in cols]
        ).collect()[0]
        row = {**row.asDict(), **drow.asDict()}
    spark = df.sparkSession
    out = []
    for c in cols:
        q = row[f"{c}__q"] or [None] * len(_QUANTILES)
        out.append(
            (
                c,
                int(row[f"{c}__n"]),
                int(row[f"{c}__null"] or 0),
                int(row[f"{c}__dist"]),
                row[f"{c}__min"],
                row[f"{c}__max"],
                row[f"{c}__mean"],
                *[float(v) if v is not None else None for v in q],
            )
        )
    res = spark.createDataFrame(
        out,
        "column string, n bigint, n_null bigint, n_distinct bigint, "
        "min double, max double, mean double, p25 double, p50 double, p75 double",
    )
    rounded = [
        F.round(F.col(c), 6).alias(c)
        for c in ("min", "max", "mean", "p25", "p50", "p75")
    ]
    return res.select("column", "n", "n_null", "n_distinct", *rounded)
