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

# Bloom mode: fixed-size bitset per shard. m bits / k hashes sized for
# ~1% false-positive rate at n = m·ln2/k entries per shard; the md5
# fingerprint's 32 hex chars give 4 independent 32-bit hash slices.
BLOOM_BITS = 1 << 23  # 1 MiB per shard, ~1.2M fps/shard at 1% FP
BLOOM_HASHES = 4
BLOOM_STATE_SCHEMA = T.StructType([T.StructField("bits", T.BinaryType())])


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


def _bloom_indices(fp: str) -> list[int]:
    # 4 independent 32-bit slices of the md5 hex fingerprint
    return [int(fp[i * 8 : (i + 1) * 8], 16) % BLOOM_BITS for i in range(BLOOM_HASHES)]


def _dedup_group_bloom(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.hasTimedOut:
        state.remove()
        return
    bits = bytearray(state.get[0]) if state.exists else bytearray(BLOOM_BITS // 8)
    for pdf in pdfs:
        fresh_mask = []
        for fp in pdf["fp"]:
            idx = _bloom_indices(fp)
            is_new = any(((bits[i >> 3] >> (i & 7)) & 1) == 0 for i in idx)
            if is_new:
                for i in idx:
                    bits[i >> 3] |= 1 << (i & 7)
            fresh_mask.append(is_new)
        out = pdf.loc[fresh_mask, ["doc_id", "text", "fp"]]
        if len(out):
            yield out
    state.update((bytes(bits),))
    state.setTimeoutDuration(3600 * 1000)


def streaming_dedup(
    stream: DataFrame, text_col: str = "text", shards: int = 32, mode: str = "exact"
) -> DataFrame:
    """First-seen-wins stream dedup: fingerprint → shard →
    applyInPandasWithState holding per-shard seen state.

    ``mode``:
    - ``"exact"`` — per-shard fingerprint set. Exact, but state is
      ~32 B/fingerprint and the whole set round-trips through the
      state store every batch: at 10⁸ fps/shard that is ~3 GB of
      state rewrite per shard per batch — measured figures in
      SCALING.md §streaming. Right below ~10⁷ fps/shard.
    - ``"bloom"`` — fixed 1 MiB bitset per shard (m=2²³ bits, k=4
      md5-derived hashes): state size and per-batch rewrite are
      CONSTANT regardless of stream length; ~1% of NEW documents are
      falsely dropped once a shard holds ~1.2M fingerprints (never
      the reverse — a duplicate is never emitted twice). The 100 TB
      posture: 32 shards ⇒ 32 MiB total state, forever.
    """
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    with_fp = stream.withColumn("fp", F.md5(norm)).withColumn(
        "shard", F.pmod(F.conv(F.substring("fp", 1, 6), 16, 10).cast("long"), F.lit(shards))
    )
    if mode == "bloom":
        fn, st = _dedup_group_bloom, BLOOM_STATE_SCHEMA
    elif mode == "exact":
        fn, st = _dedup_group, STATE_SCHEMA
    else:
        raise ValueError(f"unknown mode {mode!r}")
    return (
        with_fp.groupBy("shard")
        .applyInPandasWithState(
            fn,
            outputStructType=OUT_SCHEMA,
            stateStructType=st,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
