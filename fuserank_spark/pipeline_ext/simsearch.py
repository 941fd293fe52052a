"""Similarity search over embedding columns: exact brute-force
cosine top-k (the baseline every ANN variant is measured against) and
a random-hyperplane LSH bucketed variant (the scale path).

Exact path = crossJoin-score + two-phase top-k (search.topk_batch
machinery): at 100 TB the broadcast side is the query batch and the
corpus never shuffles. LSH path prunes the scored pairs to matching
buckets first — the crossJoin disappears entirely.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..search import dot_expr, l2_norm_expr


def _cosine(a_vec, b_vec):
    return dot_expr(a_vec, b_vec) / (l2_norm_expr(a_vec) * l2_norm_expr(b_vec))


def brute_force_knn(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
    query_key: str = "query_id",
    query_vec: str = "qvec",
) -> DataFrame:
    """Exact cosine top-k per query: broadcast queries, score, rank.
    Output: (query_id, vec_id, rnk, cosine)."""
    scored = corpus.crossJoin(F.broadcast(queries)).select(
        F.col(query_key),
        F.col(key_col),
        _cosine(F.col(vec_col), F.col(query_vec)).alias("cosine"),
    )
    w = Window.partitionBy(query_key).orderBy(F.desc("cosine"), F.col(key_col))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(query_key, key_col, "rnk", F.round("cosine", 6).alias("cosine"))
    )


def hyperplanes(dim: int, n_planes: int = 8, seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed)
    h = rng.normal(size=(n_planes, dim))
    return h / np.linalg.norm(h, axis=1, keepdims=True)


def lsh_bucket_expr(vec_col, planes: np.ndarray):
    """Sign-of-projection bucket id: bit j = 1 iff v·h_j ≥ 0."""
    bits = []
    for j in range(planes.shape[0]):
        proj = F.aggregate(
            F.zip_with(
                F.col(vec_col) if isinstance(vec_col, str) else vec_col,
                F.array(*[F.lit(float(x)) for x in planes[j]]),
                lambda x, y: x.cast("double") * y,
            ),
            F.lit(0.0),
            lambda a, v: a + v,
        )
        bits.append(F.when(proj >= 0, F.lit(1 << j)).otherwise(F.lit(0)))
    return sum(bits[1:], bits[0])


def lsh_knn(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 6,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
    query_key: str = "query_id",
    query_vec: str = "qvec",
    multiprobe: int = 1,
) -> DataFrame:
    """ANN: random-hyperplane buckets + exact rerank within bucket.
    ``multiprobe`` additionally probes buckets at Hamming distance 1
    (recall knob). The corpus is scored only where buckets match —
    the join is an equi-join on bucket id, shuffle keyed uniformly."""
    planes = hyperplanes(dim, n_planes)
    c = corpus.withColumn("bucket", lsh_bucket_expr(vec_col, planes))
    q = queries.withColumn("bucket", lsh_bucket_expr(query_vec, planes))
    if multiprobe:
        probe = F.explode(
            F.array(
                F.col("bucket"),
                *[F.col("bucket").bitwiseXOR(F.lit(1 << j)) for j in range(n_planes)],
            )
        )
        q = q.withColumn("bucket", probe)
    joined = c.join(F.broadcast(q), "bucket").select(
        F.col(query_key),
        F.col(key_col),
        _cosine(F.col(vec_col), F.col(query_vec)).alias("cosine"),
    )
    w = Window.partitionBy(query_key).orderBy(F.desc("cosine"), F.col(key_col))
    return (
        joined.groupBy(query_key, key_col)
        .agg(F.max("cosine").alias("cosine"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(query_key, key_col, "rnk", F.round("cosine", 6).alias("cosine"))
    )
