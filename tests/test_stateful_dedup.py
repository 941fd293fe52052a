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


def test_bloom_fpr_within_2x_theoretical():
    """VERDICT r2 #4: measured false-positive rate at the CONFIGURED
    bitset size (m=2^23 bits, k=4 md5-derived hashes) must stay
    within 2x the theoretical (1 - e^(-kn/m))^k after n insertions —
    protects the constant-state claim's quality bound. n=1M puts the
    filter at ~2% theoretical FPR, large enough to measure tightly
    (expected ~2.1k FPs over 100k fresh probes, sigma ~46)."""
    import hashlib
    import math

    from fuserank_spark.streaming.stateful_dedup import (
        BLOOM_BITS,
        BLOOM_HASHES,
        _bloom_indices,
    )

    bits = bytearray(BLOOM_BITS // 8)
    n = 1_000_000
    for i in range(n):
        fp = hashlib.md5(f"inserted-{i}".encode()).hexdigest()
        for j in _bloom_indices(fp):
            bits[j >> 3] |= 1 << (j & 7)

    probes = 100_000
    false_pos = 0
    for i in range(probes):
        fp = hashlib.md5(f"fresh-{i}".encode()).hexdigest()
        if all((bits[j >> 3] >> (j & 7)) & 1 for j in _bloom_indices(fp)):
            false_pos += 1

    theoretical = (1.0 - math.exp(-BLOOM_HASHES * n / BLOOM_BITS)) ** BLOOM_HASHES
    measured = false_pos / probes
    assert measured <= 2.0 * theoretical, (measured, theoretical)
    # and the filter is actually filtering — not degenerate/all-zero
    assert measured > 0


def test_bloom_output_is_subset_of_exact(spark, tmpdir):
    """One-sided error, end-to-end: bloom mode may falsely DROP a new
    document but never emits a duplicate — its emitted fp set is a
    subset of exact mode's on the same stream (equal at this scale,
    far below the FP regime)."""
    import pyspark.sql.types as T

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(120)
    originals = docs.filter(F.col("doc_id") < 90).select("doc_id", "text")
    mixed = docs.filter(F.col("doc_id") >= 60).select(
        (F.col("doc_id") + 700000).alias("doc_id"), "text"
    )
    src = f"{tmpdir}/src"
    originals.coalesce(1).write.parquet(src)
    mixed.coalesce(1).write.mode("append").parquet(src)

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    outputs = {}
    for mode in ("exact", "bloom"):
        stream = read_document_stream(spark, src, schema=schema, max_files=1)
        q = (
            streaming_dedup(stream, mode=mode)
            .writeStream.format("memory")
            .queryName(f"subset_{mode}")
            .outputMode("append")
            .option("checkpointLocation", f"{tmpdir}/ck_{mode}")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        outputs[mode] = {r["fp"] for r in spark.sql(f"SELECT fp FROM subset_{mode}").collect()}

    assert outputs["bloom"] <= outputs["exact"]
    assert outputs["bloom"] == outputs["exact"]  # no FPs at 120 docs
