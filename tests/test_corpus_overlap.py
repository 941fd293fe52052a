"""Corpus-overlap MinHash sketch (dedup.corpus_minhash_sketch /
corpus_overlap) — zero-join shingle-level Jaccard estimation between
two corpora. Registry is frozen at 67 entries, so the oracle lives
here: the sketch slots are re-derived exactly in DuckDB (same
shingles, same portable hash, same pinned permutation constants);
identical sketches pin the estimator's inputs bit-for-bit.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fuserank_spark.pipeline_ext.dedup import corpus_minhash_sketch, corpus_overlap
from fuserank_spark.pipeline_ext.hashing import HASH_PRIME, minhash_perms

N_PERMS = 16


def _duck_sketch(duck, table: str) -> list[int]:
    h = "CAST(concat('0x', substring(md5(s), 1, 8)) AS BIGINT)"
    slots = ", ".join(
        f"min(list_min(list_transform(sh, s -> (({a} * {h} + {b}) % {HASH_PRIME})))) AS m{j}"
        for j, (a, b) in enumerate(minhash_perms(N_PERMS))
    )
    row = duck.execute(
        f"""
        WITH sh AS (
          SELECT list_distinct(list_transform(generate_series(1, length(text) - 4),
                                              i -> substring(text, i, 5))) AS sh
          FROM {table}
        )
        SELECT {slots} FROM sh
        """
    ).fetchone()
    return list(row)


def test_corpus_sketch_matches_duckdb_rederivation(spark, duck):
    """Both halves of the documents table sketched by both engines —
    every slot must agree exactly (shingles, portable hash, pinned
    perms, global min)."""
    from tests.conftest import SF_SMOKE

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select("doc_id", "text")
    for pred, sql_pred in ((0, "doc_id % 2 = 0"), (1, "doc_id % 2 = 1")):
        got = corpus_minhash_sketch(
            docs.filter(F.col("doc_id") % 2 == pred), num_perms=N_PERMS
        )
        duck.execute(
            f"CREATE OR REPLACE TEMP VIEW co_half AS "
            f"SELECT text FROM documents WHERE {sql_pred}"
        )
        assert got == _duck_sketch(duck, "co_half")


def test_corpus_overlap_identical_and_disjoint(spark):
    ident = spark.createDataFrame(
        [(i, f"shared passage number {i} with plenty of shingle material") for i in range(40)],
        "doc_id long, text string",
    )
    est = corpus_overlap(ident, ident, num_perms=N_PERMS)
    assert est["jaccard_est"] == 1.0 and est["slots_equal"] == N_PERMS
    disjoint = spark.createDataFrame(
        [(i, f"completely different wording here item {i} zzz") for i in range(40)],
        "doc_id long, text string",
    )
    est2 = corpus_overlap(ident, disjoint, num_perms=N_PERMS)
    assert est2["jaccard_est"] <= 0.2  # tiny shared-shingle tail allowed
    assert 0.0 <= est2["std_err"] <= 0.5 / N_PERMS**0.5


def test_corpus_overlap_partial_is_between(spark):
    a = spark.createDataFrame(
        [(i, f"common core sentence repeated verbatim across both corpora {i % 4}")
         for i in range(30)]
        + [(100 + i, f"alpha only material unique to corpus a number {i}") for i in range(10)],
        "doc_id long, text string",
    )
    b = spark.createDataFrame(
        [(i, f"common core sentence repeated verbatim across both corpora {i % 4}")
         for i in range(30)]
        + [(200 + i, f"beta side exclusive text not in the other {i}") for i in range(10)],
        "doc_id long, text string",
    )
    est = corpus_overlap(a, b, num_perms=64)
    assert 0.1 < est["jaccard_est"] < 0.95


def test_corpus_sketch_empty_corpus_raises(spark):
    empty = spark.createDataFrame([(1, "ab"), (2, None)], "doc_id long, text string")
    with pytest.raises(ValueError):
        corpus_minhash_sketch(empty, num_perms=4)


def test_corpus_sketch_plan_has_no_join_or_data_shuffle(spark):
    from tests.conftest import SF_SMOKE

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    from fuserank_spark.pipeline_ext.dedup import shingles_expr
    from fuserank_spark.pipeline_ext.hashing import minhash_perm, portable_hash32

    hashed = docs.withColumn(
        "__sh", F.transform(shingles_expr(F.col("text")), lambda s: portable_hash32(s))
    )
    aggs = [
        F.min(F.array_min(F.transform(F.col("__sh"), lambda h: minhash_perm(h, a, b)))).alias(f"m{j}")
        for j, (a, b) in enumerate(minhash_perms(4))
    ]
    plan = hashed.agg(*aggs)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "CartesianProduct" not in plan
    # the only exchange is the final single-partition reduce
    assert plan.count("Exchange") <= 1 and "SinglePartition" in plan
