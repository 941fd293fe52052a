"""Time-series operators: batch sessionization, as-of join, and
bucketed interval (range) join.

The reference engine has no time-series surface; these extend the
event-stream side of the rebuild (SURVEY §2.11's batch twin) with
the three ops every event pipeline needs. All three are built on
integer microsecond arithmetic (↔ DuckDB ``epoch_us``) so
differential checks are exact — never seconds casts, which truncate.

Timestamp dtypes: parquet TIMESTAMP(NANOS/MICROS, isAdjusted=false)
loads as TIMESTAMP_NTZ on Spark 4.x, where ``unix_micros`` does NOT
apply (LTZ-only). ``_us_for`` therefore branches on the column's
dtype: NTZ → ``timestampdiff`` from the NTZ epoch (wall time as UTC,
session-timezone-independent — exactly DuckDB's ``epoch_us``); LTZ →
``unix_micros``. Never ``to_utc_timestamp`` on NTZ: under a non-UTC
session timezone it shifts the epoch.

Scale posture (100 TB of events):
* ``sessionize`` is ONE shuffle on the session key; both windows
  (lag + running sum) share the same partitioning and sort, so
  Catalyst plans a single Exchange + Sort. A key's full history
  lands on one task — inherent to gap sessionization; for keys with
  unbounded history use the streaming session windows
  (streaming/incremental.py) which bound state by watermark.
* ``asof_join`` is the UNION trick: tag both sides, one window over
  (key) ordered by (ts, side), carry the most recent right-side row
  forward with last(ignorenulls). ZERO joins — a naive formulation
  (join + per-left-row max) shuffles |L|·|R| candidate pairs; this
  shuffles |L|+|R| rows exactly once, on the key.
* ``interval_join`` equi-joins on (key, time bucket) after exploding
  each interval into the buckets it covers — a point lives in
  exactly one bucket, so no post-join dedup is needed. Naive range
  predicates force BroadcastNestedLoop/cartesian plans; the bucket
  join is a plain hash join whose explode factor is bounded by
  ``max_buckets`` (raise_error, not silent truncation).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["sessionize", "session_stats", "asof_join", "interval_join"]


def _us_for(dtype: str, col: str) -> Column:
    """Timestamp column → integer epoch microseconds, exact and
    session-timezone-independent (DuckDB twin: epoch_us)."""
    if dtype == "timestamp_ntz":
        return F.expr(
            f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', `{col}`)"
        )
    if dtype == "timestamp":
        return F.unix_micros(F.col(col))
    raise TypeError(
        f"column {col!r} has dtype {dtype!r}; timeseries ops need "
        "timestamp or timestamp_ntz"
    )


def _us(df: DataFrame, col: str) -> Column:
    dt = dict(df.dtypes).get(col)
    if dt is None:
        raise ValueError(f"column {col!r} not found in {df.columns}")
    return _us_for(dt, col)


# ---------------------------------------------------------- sessionize


def sessionize(
    df: DataFrame,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: float = 30.0,
    out_col: str = "session_seq",
) -> DataFrame:
    """Label each row with a per-key session sequence number: a new
    session starts when the gap to the previous event exceeds
    ``gap_minutes``. First event of a key is session 1.

    One shuffle: lag() and the running sum() share
    Window.partitionBy(key).orderBy(ts) — one Exchange, one Sort in
    the physical plan (asserted in tests/test_timeseries.py)."""
    gap_us = int(gap_minutes * 60_000_000)
    ts_us = _us(df, ts_col)
    w = Window.partitionBy(key_col).orderBy(ts_us)
    prev = F.lag(ts_us).over(w)
    new_session = F.when(
        prev.isNull() | ((ts_us - prev) > F.lit(gap_us)), F.lit(1)
    ).otherwise(F.lit(0))
    run = Window.partitionBy(key_col).orderBy(ts_us).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn(out_col, F.sum(new_session).over(run).cast("bigint"))


def session_stats(
    df: DataFrame,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: float = 30.0,
    value_col: str | None = None,
) -> DataFrame:
    """Session summary: (key, session_seq, session_start, session_end,
    n_events[, sum_value]). Aggregation key (key, session_seq) is at
    least as fine as the window key, so the groupBy reuses the
    sessionize partitioning without a second wide shuffle."""
    s = sessionize(df, key_col=key_col, ts_col=ts_col, gap_minutes=gap_minutes)
    aggs = [
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    ]
    if value_col is not None:
        aggs.append(F.round(F.sum(value_col), 4).alias("sum_value"))
    return s.groupBy(key_col, "session_seq").agg(*aggs)


# ------------------------------------------------------------ as-of join


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    key_col: str,
    ts_col: str,
    right_cols: list[str],
    suffix: str = "_r",
    tolerance_minutes: float | None = None,
) -> DataFrame:
    """For every left row, attach the most recent right row with
    ``right.ts <= left.ts`` on the same key (backward as-of, ties
    inclusive — DuckDB ``ASOF JOIN ... ON l.ts >= r.ts`` semantics).
    Left rows with no match (or a match older than
    ``tolerance_minutes``) keep NULL right columns, like pandas
    merge_asof.

    Union trick: zero joins, one shuffle of |L|+|R| rows on the key.
    Right rows sort BEFORE left rows at equal ts (side tag 0 < 1), so
    an exactly-simultaneous right row matches. For deterministic
    attribute pickup, (key, ts) should be unique on the right —
    pre-aggregate if it isn't (the oracle entry does).

    ``right_cols`` must not include key/ts; they surface as
    ``{col}{suffix}``, plus ``{ts_col}{suffix}`` for the matched
    timestamp."""
    if key_col in right_cols or ts_col in right_cols:
        raise ValueError("right_cols must exclude the key and ts columns")
    ltypes = dict(left.dtypes)
    rtypes = dict(right.dtypes)
    missing = [c for c in right_cols if c not in rtypes]
    if missing:
        raise ValueError(f"right side lacks columns: {missing}")
    if ltypes[ts_col] != rtypes[ts_col]:
        raise TypeError(
            f"as-of ts dtypes differ: left {ltypes[ts_col]!r} vs right "
            f"{rtypes[ts_col]!r} — align them before the join"
        )
    carry = [(f"{c}{suffix}", rtypes[c], c) for c in right_cols] + [
        (f"{ts_col}{suffix}", ltypes[ts_col], ts_col)
    ]
    pass_cols = [c for c in left.columns]
    l_side = left.select(
        F.col(key_col).alias("__k"),
        _us(left, ts_col).alias("__t"),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in pass_cols],
        *[F.lit(None).cast(t).alias(out) for out, t, _ in carry],
    )
    r_side = right.select(
        F.col(key_col).alias("__k"),
        _us(right, ts_col).alias("__t"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(ltypes[c]).alias(c) for c in pass_cols],
        *[F.col(src).alias(out) for out, _, src in carry],
    )
    u = l_side.unionByName(r_side)
    w = (
        Window.partitionBy("__k")
        .orderBy("__t", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        "__side",
        "__t",
        *pass_cols,
        *[F.last(out, ignorenulls=True).over(w).alias(out) for out, _, _ in carry],
    ).filter(F.col("__side") == 1)
    if tolerance_minutes is not None:
        tol_us = int(tolerance_minutes * 60_000_000)
        ts_r = f"{ts_col}{suffix}"
        stale = (F.col("__t") - _us_for(ltypes[ts_col], ts_r)) > F.lit(tol_us)
        filled = filled.select(
            "__side",
            "__t",
            *pass_cols,
            *[
                F.when(stale, F.lit(None).cast(t)).otherwise(F.col(out)).alias(out)
                for out, t, _ in carry
            ],
        )
    return filled.select(*pass_cols, *[out for out, _, _ in carry])


# ------------------------------------------------------- interval join


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    key_col: str,
    ts_col: str = "ts",
    interval_id_col: str = "interval_id",
    start_col: str = "start",
    end_col: str = "end",
    bucket_minutes: float = 30.0,
    max_buckets: int = 4096,
) -> DataFrame:
    """Point-in-interval join on a shared key: every (interval, point)
    pair with ``start <= ts <= end``. Output = point rows + the
    interval id (inner semantics; an interval with no points emits
    nothing — aggregate with a left join against intervals if empty
    groups matter).

    Each interval explodes into the time buckets it covers; a point
    belongs to exactly ONE bucket, so the (key, bucket) hash join
    yields each pair at most once — no dedup pass. Intervals longer
    than ``max_buckets`` buckets raise at runtime (raise_error inside
    the sequence branch) instead of silently truncating coverage:
    pick bucket_minutes near the TYPICAL interval length so the
    explode factor stays O(1)."""
    width_us = int(bucket_minutes * 60_000_000)
    b0 = F.floor(_us(intervals, start_col) / F.lit(width_us))
    b1 = F.floor(_us(intervals, end_col) / F.lit(width_us))
    n_b = b1 - b0 + 1
    seq = F.when((n_b >= 1) & (n_b <= max_buckets), F.sequence(b0, b1)).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    f"interval spans more than max_buckets={max_buckets} "
                    f"buckets of {bucket_minutes} min (or end < start); "
                    "raise bucket_minutes or split the interval: id="
                ),
                F.col(interval_id_col).cast("string"),
            )
        ).cast("array<bigint>")
    )
    iv = intervals.select(
        F.col(interval_id_col),
        F.col(key_col).alias("__ik"),
        _us(intervals, start_col).alias("__s"),
        _us(intervals, end_col).alias("__e"),
        F.explode(seq).alias("__bucket"),
    )
    pt = points.withColumn("__pt_us", _us(points, ts_col)).withColumn(
        "__bucket", F.floor(F.col("__pt_us") / F.lit(width_us))
    )
    joined = pt.join(
        iv,
        (pt[key_col] == iv["__ik"])
        & (pt["__bucket"] == iv["__bucket"])
        & (pt["__pt_us"] >= iv["__s"])
        & (pt["__pt_us"] <= iv["__e"]),
    )
    return joined.select(interval_id_col, *points.columns).drop("__bucket")
