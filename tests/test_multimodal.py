"""Multimodal plumbing (pipeline_ext/multimodal.py): payload decode
stub, resize and frame-sample stages — Spark-side schema/batch/
explode machinery is real; codecs are deterministic stubs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fuserank_spark.pipeline_ext import multimodal as M

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def media(spark):
    d = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .filter(F.col("doc_id") < 50)
        .select("doc_id", "text")
    )
    return M.extract_media_metadata(M.attach_payload(d), media_type="video")


def test_resize_payload_size_and_determinism(media):
    r1 = M.resize_media(media, width=32, height=32)
    rows = {r["doc_id"]: bytes(r["resized_payload"]) for r in r1.collect()}
    assert all(len(p) == (32 * 32) // 64 for p in rows.values())
    r2 = {
        r["doc_id"]: bytes(r["resized_payload"])
        for r in M.resize_media(media, width=32, height=32).collect()
    }
    assert rows == r2
    # different target dims -> different stub bytes
    r3 = {
        r["doc_id"]: bytes(r["resized_payload"])
        for r in M.resize_media(media, width=64, height=64).collect()
    }
    assert all(rows[k] != r3[k][: len(rows[k])] for k in rows)
    with pytest.raises(ValueError, match="positive"):
        M.resize_media(media, width=0, height=32)


def test_frame_sample_counts_and_cap(media):
    frames = M.frame_sample(media, every_ms=7000, max_frames=64)
    got = (
        frames.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"), F.max("frame_ts_ms").alias("mx"))
        .collect()
    )
    durs = {
        r["doc_id"]: r["media_meta"]["duration_ms"]
        for r in media.select("doc_id", "media_meta").collect()
    }
    for r in got:
        want = min(durs[r["doc_id"]] // 7000 + 1, 64)
        assert r["n"] == want
        assert r["mx"] == (want - 1) * 7000
    # zero-duration (image) rows emit no frames
    img = M.extract_media_metadata(
        M.attach_payload(
            media.sparkSession.createDataFrame([(1, "x")], "doc_id long, text string")
        ),
        media_type="image",
    )
    assert M.frame_sample(img).count() == 0


def test_frame_payloads_distinct_per_ts(media):
    frames = M.frame_sample(media, every_ms=7000, max_frames=8)
    one = frames.filter(F.col("doc_id") == frames.select("doc_id").first()["doc_id"])
    payloads = [bytes(r["frame_payload"]) for r in one.collect()]
    assert len(set(payloads)) == len(payloads)
