"""Streaming heavy hitters: a per-shard Misra–Gries summary as grouped
state via applyInPandasWithState — the running "what is frequent in
this ingest stream" monitor (hot boilerplate grams, hot domains, hot
tokens) that a batch job can only answer after the fact.

Each item hash-routes to exactly ONE shard, so a shard's summary is a
complete MG sketch of that item's whole history: for any item,
``true_count − cnt ≤ n_shard/(budget+1)`` (the per-shard bound — 
TIGHTER than the batch sketch's merged N/(k+1) bound, because sharding
partitions the stream instead of summing per-partition errors). Any
item whose true stream count exceeds ``n_shard/(budget+1)`` is
GUARANTEED present in the emitted summary.

Scale posture: state per shard is exactly ``budget`` (item, count)
pairs — constant in stream length; each trigger emits the updated
shards' current summaries (update semantics: downstream keeps the
latest row set per shard, e.g. via a foreachBatch overwrite of a
store partitioned by shard, the incremental_lsh_dedup pattern).
Shares :func:`curation._mg_merge` with the batch sketch — one audited
eviction rule for both engines of the guarantee.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..pipeline_ext.curation import _mg_merge

HH_OUT_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.LongType()),
        T.StructField("item", T.StringType()),
        T.StructField("cnt", T.LongType()),
        T.StructField("n_shard", T.LongType()),
    ]
)

HH_STATE_SCHEMA = T.StructType(
    [
        T.StructField("items", T.ArrayType(T.StringType())),
        T.StructField("cnts", T.ArrayType(T.LongType())),
        T.StructField("n", T.LongType()),
    ]
)


def _make_hh_group(budget: int):
    def _hh_group(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:  # pragma: no cover - TTL eviction path
            state.remove()
            return
        if state.exists:
            items, cnts, n = state.get
            counters = pd.Series(list(cnts), index=list(items), dtype="int64")
        else:
            counters, n = pd.Series(dtype="int64"), 0
        for pdf in pdfs:
            col = pdf["item"].dropna()
            n += len(col)
            counters = _mg_merge(counters, col.value_counts(), budget)
        state.update((list(counters.index), [int(c) for c in counters], int(n)))
        # counter rows PLUS one NULL-item sentinel carrying the shard
        # total (the batch sketch's convention) — a shard whose
        # counters emptied under eviction must still report its n, or
        # downstream error bounds read a stale stream volume
        summary = pd.DataFrame(
            {
                "shard": int(key[0]),
                "item": counters.index,
                "cnt": counters.to_numpy("int64"),
                "n_shard": int(n),
            }
        )
        sentinel = pd.DataFrame(
            {
                "shard": [int(key[0])],
                "item": pd.Series([None], dtype=object),
                "cnt": [0],
                "n_shard": [int(n)],
            }
        )
        yield pd.concat([summary, sentinel], ignore_index=True)

    return _hh_group


def streaming_heavy_hitters(
    stream: DataFrame,
    item_col: str = "item",
    *,
    shards: int = 32,
    budget_per_shard: int = 4096,
) -> DataFrame:
    """Running frequent-item summaries over a stream (see module
    docstring for the per-shard guarantee). Items must be strings
    (cast upstream — gram hashes travel fine as their decimal string);
    NULLs are ignored. Emits each updated shard's full current
    summary per trigger: read the LATEST emission per shard."""
    if shards < 1 or budget_per_shard < 1:
        raise ValueError("shards and budget_per_shard must be >= 1")
    # NULLs drop BEFORE the groupBy — a NULL shard key would reach
    # int(key[0]) in the state fn and kill the query on every restart.
    # Shard placement never reaches an oracle-checked output, so the
    # JVM-native hash applies (CLAUDE.md r6 corollary), not md5.
    routed = (
        stream.select(F.col(item_col).cast("string").alias("item"))
        .filter(F.col("item").isNotNull())
        .withColumn("shard", F.pmod(F.xxhash64(F.col("item")), F.lit(shards)))
    )
    return routed.groupBy("shard").applyInPandasWithState(
        _make_hh_group(budget_per_shard),
        outputStructType=HH_OUT_SCHEMA,
        stateStructType=HH_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
