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
