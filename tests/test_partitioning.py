"""Shuffle-control machinery: bucketed joins are exchange-free,
salted aggregation matches the plain aggregation."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from fuserank_spark.partitioning import salted_count_agg, write_bucketed

from tests.conftest import SF_SMOKE


def plan_str(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def test_bucketed_join_no_shuffle(spark):
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").withColumnRenamed(
        "doc_id", "vec_id"
    )
    write_bucketed(emb, "t_emb_b", key="vec_id", buckets=8)
    write_bucketed(docs.select("vec_id", "lang"), "t_doc_b", key="vec_id", buckets=8)
    # force the merge strategy (AQE would broadcast the tiny test side;
    # at corpus scale both sides exceed the broadcast threshold)
    joined = spark.table("t_emb_b").hint("merge").join(spark.table("t_doc_b"), "vec_id")
    p = plan_str(joined)
    # co-located bucketed join: sort-merge with NO exchange on either side
    assert "SortMergeJoin" in p
    assert "Exchange hashpartitioning" not in p
    assert joined.count() == emb.count()


def test_salted_agg_matches_plain(spark):
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    salted = salted_count_agg(
        li, ["l_returnflag"], {"*": "count", "l_quantity": "sum"}, salt_buckets=8
    ).orderBy("l_returnflag")
    plain = (
        li.groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("count"), F.sum("l_quantity").alias("sum_l_quantity"))
        .orderBy("l_returnflag")
    )
    got = [(r["l_returnflag"], r["count"], round(r["sum_l_quantity"], 4)) for r in salted.collect()]
    exp = [(r["l_returnflag"], r["count"], round(r["sum_l_quantity"], 4)) for r in plain.collect()]
    assert got == exp
