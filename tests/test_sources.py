"""S1-S3 source/sink parity: CSV scan, embedding cache miss→create→hit."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from fuserank_spark import sources


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="fuserank_src_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_csv_roundtrip(spark, tmpdir):
    df = spark.createDataFrame([(1, "a b"), (2, "c,d")], "id long, txt string")
    df.write.option("header", "true").csv(f"{tmpdir}/csv")
    back = sources.read_csv(spark, f"{tmpdir}/csv")
    assert back.count() == 2
    assert dict(back.dtypes)["id"] in ("int", "bigint")  # inferSchema worked


def test_embedding_cache_flow(spark, tmpdir):
    docs = (
        spark.range(50)
        .select(F.col("id").alias("row_id"), F.concat(F.lit("doc "), F.col("id")).alias("text"))
    )
    assert sources.load_cached_embeddings(spark, tmpdir, "ds", "m", dim=16) is None  # miss
    out1 = sources.embed_with_cache(docs, {"text": 1.0}, tmpdir, "ds", "m", dim=16)
    assert out1.count() == 50 and "text_emb" in out1.columns
    cached = sources.load_cached_embeddings(spark, tmpdir, "ds", "m", dim=16)  # hit
    assert cached is not None and cached.count() == 50
    # a different dim is a different cache — never silently reused
    assert sources.load_cached_embeddings(spark, tmpdir, "ds", "m", dim=32) is None
    out2 = sources.embed_with_cache(docs, {"text": 1.0}, tmpdir, "ds", "m", dim=16)
    a = {r["row_id"]: r["text_emb"] for r in out1.collect()}
    b = {r["row_id"]: r["text_emb"] for r in out2.collect()}
    assert a == b  # cache returns the identical embeddings


def test_geocode_gated():
    with pytest.raises(NotImplementedError):
        sources.geocode("Berlin")


def test_read_jsonl_permissive_quarantines_corrupt_lines(spark, tmpdir):
    """Explicit-schema JSONL: good lines parse, malformed lines land
    whole in _corrupt_record instead of failing the job."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from fuserank_spark.sources import read_jsonl

    p = f"{tmpdir}/docs.jsonl"
    with open(p, "w") as f:
        f.write('{"doc_id": 1, "text": "hello world"}\n')
        f.write('{"doc_id": 2, "text": "second"}\n')
        f.write('{"doc_id": 3, "text": broken!!\n')
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    out = read_jsonl(spark, p, schema)
    # the caller's schema object must NOT grow a phantom field
    assert schema.fieldNames() == ["doc_id", "text"]
    good = out.filter(F.col("_corrupt_record").isNull())
    bad = out.filter(F.col("_corrupt_record").isNotNull())
    assert {r["doc_id"] for r in good.collect()} == {1, 2}
    # Spark disallows queries that prune down to ONLY the corrupt
    # column (see read_jsonl docstring) — collect the full rows
    bad_rows = bad.collect()
    assert len(bad_rows) == 1
    assert "broken" in bad_rows[0]["_corrupt_record"]
