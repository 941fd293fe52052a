"""Cross-batch streaming dedup: duplicates in LATER micro-batches are
dropped (state persists across batches within the run)."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from fuserank_spark.streaming.incremental import read_document_stream
from fuserank_spark.streaming.stateful_dedup import streaming_dedup

from tests.conftest import SF_SMOKE


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="fuserank_sdd_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_streaming_dedup_across_batches(spark, tmpdir):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(100)
    # batch 1: originals; batch 2 (separate file): half duplicates, half new
    originals = docs.filter(F.col("doc_id") < 80).select("doc_id", "text")
    dups = docs.filter(F.col("doc_id") < 40).select(
        (F.col("doc_id") + 500000).alias("doc_id"), "text"
    )
    fresh = docs.filter((F.col("doc_id") >= 80)).select("doc_id", "text")

    src = f"{tmpdir}/src"
    originals.coalesce(1).write.parquet(src)
    dups.union(fresh).coalesce(1).write.mode("append").parquet(src)

    import pyspark.sql.types as T

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    stream = read_document_stream(spark, src, schema=schema, max_files=1)
    out = streaming_dedup(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .option("checkpointLocation", f"{tmpdir}/ck")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    res = spark.sql("SELECT * FROM dedup_out").collect()
    # exactly one survivor per distinct text — cross-batch duplicates
    # dropped regardless of which micro-batch ran first (file order
    # by mtime can tie)
    assert len(res) == 100
    fps = [r["fp"] for r in res]
    assert len(set(fps)) == 100


def test_streaming_dedup_bloom_across_batches(spark, tmpdir):
    """Bloom mode: same cross-batch first-seen-wins semantics at this
    scale (far below the FP regime), with CONSTANT per-shard state."""
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(100)
    originals = docs.filter(F.col("doc_id") < 80).select("doc_id", "text")
    dups = docs.filter(F.col("doc_id") < 40).select(
        (F.col("doc_id") + 500000).alias("doc_id"), "text"
    )
    fresh = docs.filter((F.col("doc_id") >= 80)).select("doc_id", "text")

    src = f"{tmpdir}/src"
    originals.coalesce(1).write.parquet(src)
    dups.union(fresh).coalesce(1).write.mode("append").parquet(src)

    import pyspark.sql.types as T

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    stream = read_document_stream(spark, src, schema=schema, max_files=1)
    out = streaming_dedup(stream, mode="bloom")
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_bloom_out")
        .outputMode("append")
        .option("checkpointLocation", f"{tmpdir}/ck")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    res = spark.sql("SELECT * FROM dedup_bloom_out").collect()
    assert len(res) == 100
    assert len({r["fp"] for r in res}) == 100


def test_bloom_state_is_constant_size():
    """The scale property itself: bloom bits never grow with the
    number of fingerprints inserted (exact-mode state would)."""
    from fuserank_spark.streaming.stateful_dedup import (
        BLOOM_BITS,
        _bloom_indices,
    )

    bits = bytearray(BLOOM_BITS // 8)
    import hashlib

    dropped = 0
    for i in range(10000):
        fp = hashlib.md5(f"doc-{i}".encode()).hexdigest()
        idx = _bloom_indices(fp)
        if all((bits[j >> 3] >> (j & 7)) & 1 for j in idx):
            dropped += 1
        for j in idx:
            bits[j >> 3] |= 1 << (j & 7)
    assert len(bits) == BLOOM_BITS // 8  # constant, by construction
    # at 10k entries in 2^23 bits the FP rate is ~(k*n/m)^k ≈ 5e-10
    assert dropped == 0
