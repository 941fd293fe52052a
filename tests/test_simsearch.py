"""ANN scale paths: IVF (k-means cells + nprobe) and Spark ML LSH
similarity join, measured against the exact brute-force baseline."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fuserank_spark.metrics import recall
from fuserank_spark.pipeline_ext.simsearch import (
    brute_force_knn,
    ivf_build,
    ivf_knn,
    lsh_knn,
    ml_cosine_similarity_join,
)

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").persist()
    df.count()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def queries(spark, emb):
    return emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )


@pytest.fixture(scope="module")
def exact(emb, queries):
    out = brute_force_knn(emb, queries, k=10)
    return {
        qid: [r["vec_id"] for r in out.filter(F.col("query_id") == qid).orderBy("rnk").collect()]
        for qid in range(5)
    }


def test_ivf_recall_vs_exact(emb, queries, exact):
    assigned, centroids = ivf_build(emb, dim=64, n_centroids=8)
    got = ivf_knn(assigned, centroids, queries, k=10, nprobe=4)
    recalls = []
    for qid in range(5):
        ids = [r["vec_id"] for r in got.filter(F.col("query_id") == qid).orderBy("rnk").collect()]
        recalls.append(recall(exact[qid], ids))
    assert sum(recalls) / len(recalls) >= 0.6, recalls
    # self-match always survives probing (query cell is always probed)
    for qid in range(5):
        ids = [r["vec_id"] for r in got.filter(F.col("query_id") == qid).orderBy("rnk").collect()]
        assert ids[0] == qid


def test_ivf_nprobe_monotone(emb, queries, exact):
    """More probes → recall can only improve (cells are a partition)."""
    assigned, centroids = ivf_build(emb, dim=64, n_centroids=8)

    def mean_recall(nprobe):
        got = ivf_knn(assigned, centroids, queries, k=10, nprobe=nprobe)
        rs = []
        for qid in range(5):
            ids = [
                r["vec_id"]
                for r in got.filter(F.col("query_id") == qid).orderBy("rnk").collect()
            ]
            rs.append(recall(exact[qid], ids))
        return sum(rs) / len(rs)

    assert mean_recall(8) >= mean_recall(2) - 1e-9
    assert mean_recall(8) >= 0.99  # all cells probed == exact


def test_ml_similarity_join_finds_top_pairs(spark, emb):
    """The ML LSH join recovers the strongest cosine pairs the exact
    near-dup scan finds."""
    from fuserank_spark.pipeline_ext.dedup import embedding_neardup_pairs

    exact_pairs = {
        (r["id_a"], r["id_b"])
        for r in embedding_neardup_pairs(emb, threshold=0.45, max_id=500).collect()
    }
    if not exact_pairs:
        pytest.skip("no strong pairs at this SF")
    approx = ml_cosine_similarity_join(emb, emb, dim=64, threshold_distance=1.1)
    got_pairs = {(r["id_a"], r["id_b"]) for r in approx.collect()}
    hit = len(exact_pairs & got_pairs) / len(exact_pairs)
    assert hit >= 0.5, (len(exact_pairs), len(got_pairs), hit)


def test_ivf_assign_matches_kmeans_transform(emb):
    """ivf_assign (expression-only argmin, the serve path under the
    q_ivf_knn oracle) must agree row-for-row with pyspark.ml KMeans
    .transform on the SAME trained centroids — both are
    nearest-centroid-by-Euclidean; this pins the frozen-quantizer
    serve path to the trained path's semantics."""
    from fuserank_spark.pipeline_ext.simsearch import ivf_assign

    assigned, centroids = ivf_build(emb, dim=64, n_centroids=5, max_iter=5)
    ml = {r["vec_id"]: r["centroid_id"] for r in assigned.select("vec_id", "centroid_id").collect()}
    ex = {
        r["vec_id"]: r["centroid_id"]
        for r in ivf_assign(emb, centroids).select("vec_id", "centroid_id").collect()
    }
    assert ml == ex


def test_brute_force_arrow_matches_expression(emb, queries):
    """The Arrow scan path (normalized matmul + k·P·Q survivor
    shuffle) returns the same ranked top-k as the expression path
    that the DuckDB oracle checks."""
    expr = brute_force_knn(emb, queries, k=10).orderBy("query_id", "rnk").collect()
    arrow = (
        brute_force_knn(emb, queries, k=10, use_arrow=True)
        .orderBy("query_id", "rnk")
        .collect()
    )
    assert [(r["query_id"], r["vec_id"], r["rnk"]) for r in expr] == [
        (r["query_id"], r["vec_id"], r["rnk"]) for r in arrow
    ]
    for a, b in zip(expr, arrow):
        assert abs(a["cosine"] - b["cosine"]) < 1e-6


def test_ivf_assign_arrow_matches_expression(emb):
    """The Arrow matmul twin must assign every row to the same cell
    as the expression path — both metrics, with and without the
    rounded tie-break domain."""
    import numpy as np

    from fuserank_spark.pipeline_ext.simsearch import ivf_assign, ivf_assign_arrow

    rows = emb.filter(F.col("vec_id") < 8).orderBy("vec_id").collect()
    cents = np.array([[float(x) for x in r["embedding"]] for r in rows])
    for metric in ("l2", "ip"):
        for rnd in (6, None):
            ex = {
                r["vec_id"]: r["centroid_id"]
                for r in ivf_assign(
                    emb, cents, metric=metric, score_round=rnd
                ).select("vec_id", "centroid_id").collect()
            }
            ar = {
                r["vec_id"]: r["centroid_id"]
                for r in ivf_assign_arrow(
                    emb, cents, metric=metric, score_round=rnd
                ).select("vec_id", "centroid_id").collect()
            }
            assert ex == ar, (metric, rnd)


def test_ivf_assign_arrow_rejects_bad_vectors(spark):
    import numpy as np

    from fuserank_spark.pipeline_ext.simsearch import ivf_assign_arrow

    cents = np.eye(3)
    bad_null = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0]), (1, None)], "vec_id long, embedding array<double>"
    )
    with pytest.raises(Exception, match="NULL vector"):
        ivf_assign_arrow(bad_null, cents).collect()
    bad_len = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(Exception, match="vector length"):
        ivf_assign_arrow(bad_len, cents).collect()
