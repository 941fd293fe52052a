"""Custom stateful streaming operator: cross-batch stream
deduplication via applyInPandasWithState.

A training-data ingest stream must drop documents already seen in
PREVIOUS micro-batches — `dropDuplicates` state grows unboundedly and
plain foreachBatch dedup only sees one batch. This operator keeps the
seen-fingerprint set as grouped state keyed by a fingerprint shard,
with a processing-time TTL bounding state size.

Scale posture: state is partitioned by fingerprint shard (uniform by
construction — md5), so state volume per task is |seen|/shards;
timeouts evict idle shards wholesale. The emitted stream carries only
first-seen rows.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("fp", T.StringType()),
    ]
)

STATE_SCHEMA = T.StructType([T.StructField("seen", T.ArrayType(T.StringType()))])


def _dedup_group(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.hasTimedOut:
        state.remove()
        return
    seen = set(state.get[0]) if state.exists else set()
    for pdf in pdfs:
        fresh_mask = []
        for fp in pdf["fp"]:
            is_new = fp not in seen
            if is_new:
                seen.add(fp)
            fresh_mask.append(is_new)
        out = pdf.loc[fresh_mask, ["doc_id", "text", "fp"]]
        if len(out):
            yield out
    state.update((list(seen),))
    state.setTimeoutDuration(3600 * 1000)  # 1h idle TTL bounds state


def streaming_dedup(
    stream: DataFrame, text_col: str = "text", shards: int = 32
) -> DataFrame:
    """First-seen-wins stream dedup: fingerprint → shard →
    applyInPandasWithState holding the seen set per shard."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    with_fp = stream.withColumn("fp", F.md5(norm)).withColumn(
        "shard", F.pmod(F.conv(F.substring("fp", 1, 6), 16, 10).cast("long"), F.lit(shards))
    )
    return (
        with_fp.groupBy("shard")
        .applyInPandasWithState(
            _dedup_group,
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
