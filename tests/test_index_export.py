"""S4/S5 index export: shard build + manifest + merged shard search
agrees with the in-Spark exact top-k."""

from __future__ import annotations

import shutil
import tempfile

import numpy as np
import pytest
from pyspark.sql import functions as F

from fuserank_spark.index_export import export_shards, search_shards
from fuserank_spark.search import topk

from tests.conftest import SF_SMOKE


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="fuserank_idx_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_shard_export_and_search(spark, tmpdir):
    emb = (
        spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
        .select(F.col("vec_id").alias("row_id"), F.col("embedding").alias("vector"))
    )
    manifest = export_shards(emb, tmpdir, num_shards=4).collect()
    assert len(manifest) == emb.count()
    # every row_id appears exactly once across shards
    ids = [r["row_id"] for r in manifest]
    assert len(set(ids)) == len(ids)

    # serving twin: merged shard search == Spark exact top-k
    qvec = np.array(
        emb.filter(F.col("row_id") == 7).collect()[0]["vector"], dtype="float64"
    )
    hits = search_shards(tmpdir, qvec, k=5)
    pos_map = {(r["shard_id"], r["local_pos"]): r["row_id"] for r in manifest}
    got_ids = [pos_map[(s, p)] for s, p, _ in hits]
    expect = [
        r["row_id"]
        for r in topk(emb, qvec, k=5, vector_col="vector").select("row_id").collect()
    ]
    assert got_ids == expect
    assert got_ids[0] == 7  # self-match first
