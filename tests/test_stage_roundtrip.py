"""Materialized-stage posture (§4): the encoded corpus persists to
parquet and a fresh read serves identical search results — the
pipeline's stages are durable, re-usable artifacts, not in-memory
state."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from fuserank_spark.flagship import build_corpus, flagship_compiled
from fuserank_spark.search import topk

from tests.conftest import SF_SMOKE


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="fuserank_rt_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_encoded_corpus_parquet_roundtrip(spark, tmpdir):
    corpus = build_corpus(spark, SF_SMOKE)
    cq = flagship_compiled(corpus)
    before = [
        r["row_id"]
        for r in topk(corpus.encoded, cq.vector, k=10).select("row_id").collect()
    ]
    corpus.encoded.select("row_id", "vector").write.parquet(f"{tmpdir}/encoded")

    reloaded = spark.read.parquet(f"{tmpdir}/encoded")
    assert dict(reloaded.dtypes)["vector"] == "array<double>"
    after = [
        r["row_id"] for r in topk(reloaded, cq.vector, k=10).select("row_id").collect()
    ]
    assert before == after
