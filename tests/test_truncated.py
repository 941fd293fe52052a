"""Dimension-truncation prefilter ANN — simsearch.truncated_prefilter_topk.

Registry-external (frozen 67-entry window): the DuckDB oracle lives
here — coarse cosine over the FIRST prefix_dim dims (same sequential
fold as the Spark HOF expressions), unrounded rank to k*refine_factor
survivors, exact full-dim rescoring of the survivors, rank to k —
re-derived end-to-end and compared row-for-row (the q_knn oracle's
cosine form, staged twice)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fuserank_spark.pipeline_ext.simsearch import (
    brute_force_knn,
    truncated_prefilter_topk,
)

from .conftest import SF_SMOKE

DIM = 64
PREFIX = 16
K = 10
RF = 4
N_Q = 3


@pytest.fixture(scope="module")
def emb(spark):
    e = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    e.cache().count()
    return e


@pytest.fixture(scope="module")
def qdf(emb):
    return emb.filter(F.col("vec_id") < N_Q).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )


_ORACLE = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qe,
         sqrt(list_sum(list_transform(range(1, {PREFIX + 1}),
           i -> CAST(qe[i] AS DOUBLE) * qe[i]))) AS qn_c,
         sqrt(list_sum(list_transform(qe, x -> CAST(x AS DOUBLE) * x))) AS qn_f
  FROM embeddings WHERE vec_id < {N_Q}
), coarse AS (
  SELECT q.query_id, e.vec_id,
         list_sum(list_transform(range(1, {PREFIX + 1}),
           i -> CAST(e.embedding[i] AS DOUBLE) * q.qe[i]))
           / (sqrt(list_sum(list_transform(range(1, {PREFIX + 1}),
                i -> CAST(e.embedding[i] AS DOUBLE) * e.embedding[i]))) * q.qn_c)
           AS c_cos
  FROM embeddings e, q
), cand AS (
  SELECT query_id, vec_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY c_cos DESC, vec_id) AS crnk
  FROM coarse QUALIFY crnk <= {K * RF}
), rescored AS (
  SELECT c.query_id, c.vec_id,
         list_sum(list_transform(range(1, {DIM + 1}),
           i -> CAST(e.embedding[i] AS DOUBLE) * q.qe[i]))
           / (sqrt(list_sum(list_transform(e.embedding,
                x -> CAST(x AS DOUBLE) * x))) * q.qn_f)
           AS cosine
  FROM cand c
  JOIN embeddings e ON e.vec_id = c.vec_id
  JOIN q ON q.query_id = c.query_id
)
SELECT query_id, vec_id,
       row_number() OVER (PARTITION BY query_id
                          ORDER BY cosine DESC, vec_id) AS rnk,
       round(cosine, 6) AS cosine
FROM rescored
QUALIFY rnk <= {K}
ORDER BY query_id, rnk
"""


def test_truncated_matches_duckdb_rederivation(emb, qdf, duck):
    got = [
        (r["query_id"], r["vec_id"], r["rnk"], r["cosine"])
        for r in truncated_prefilter_topk(
            emb, qdf, prefix_dim=PREFIX, k=K, refine_factor=RF
        )
        .orderBy("query_id", "rnk")
        .collect()
    ]
    want = [tuple(r) for r in duck.execute(_ORACLE).fetchall()]
    assert [g[:3] for g in got] == [w[:3] for w in want]
    for g, w in zip(got, want):
        assert g[3] == pytest.approx(w[3], abs=1e-6)


def test_truncated_full_prefix_full_refine_is_exact(emb, qdf):
    """prefix_dim == dim with a corpus-covering refine must equal the
    exact brute-force result."""
    n = emb.count()
    got = (
        truncated_prefilter_topk(
            emb, qdf, prefix_dim=DIM, k=K, refine_factor=(n // K) + 1
        )
        .orderBy("query_id", "rnk")
        .collect()
    )
    want = brute_force_knn(emb, qdf, k=K).orderBy("query_id", "rnk").collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_truncated_output_schema_and_bounds(emb, qdf):
    out = truncated_prefilter_topk(emb, qdf, prefix_dim=8, k=5)
    rows = out.collect()
    assert out.columns == ["query_id", "vec_id", "rnk", "cosine"]
    assert len(rows) == N_Q * 5
    assert all(-1.000001 <= r["cosine"] <= 1.000001 for r in rows)


def test_truncated_invalid_args(emb, qdf):
    with pytest.raises(ValueError):
        truncated_prefilter_topk(emb, qdf, prefix_dim=0)
    with pytest.raises(ValueError):
        truncated_prefilter_topk(emb, qdf, prefix_dim=8, refine_factor=0)
