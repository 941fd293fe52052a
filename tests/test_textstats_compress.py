"""compression_ratio: driver-twin exact equality (same zlib build —
the value is a quality signal, deliberately outside cross-engine
oracles) + the discriminative property the gate relies on."""

from __future__ import annotations

import zlib

import pandas as pd

from tests.conftest import SF_SMOKE

from fuserank_spark.pipeline_ext.textstats import compression_ratio


def test_compression_ratio_matches_driver_twin(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select(
        "doc_id", "text"
    ).limit(200)
    got = {
        r["doc_id"]: r["compression_ratio"]
        for r in compression_ratio(docs).collect()
    }
    for r in docs.collect():
        b = r["text"].encode("utf-8")
        exp = len(zlib.compress(b, 6)) / len(b) if b else None
        assert got[r["doc_id"]] == exp


def test_compression_ratio_discriminates_repetition(spark):
    rows = [
        (0, "spam spam spam " * 200),                       # template farm
        (1, " ".join(f"w{i*7919%9973}x{i}" for i in range(600))),  # high-entropy
        (2, None),
        (3, ""),
    ]
    sdf = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    out = {r["doc_id"]: r["compression_ratio"] for r in compression_ratio(sdf).collect()}
    assert out[0] < 0.1 < 0.4 < out[1]
    assert out[2] is None and out[3] is None


def test_compression_ratio_plan_narrow(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select("doc_id", "text")
    plan = compression_ratio(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "ArrowEvalPython" in plan  # the Arrow-batched path, not row-at-a-time
