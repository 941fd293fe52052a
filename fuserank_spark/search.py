"""Top-k vector search T1-T2 (reference: FAISS IndexFlatIP,
`src/app.py:78,171-172`) as declarative Spark plans.

Single query: score = dot(vector, broadcast literal) → orderBy desc →
limit k. Catalyst compiles this to TakeOrderedAndProject: a
per-partition bounded heap + driver merge of k·P rows — no global
sort, no shuffle of the corpus. That IS the distributed analog of a
brute-force IP scan and is the exact-search baseline at any scale.

Batch of queries: broadcast the query table, crossJoin-score, then
TWO-PHASE top-k — a per-(query, corpus-partition) local heap first,
then a global top-k over the k·P survivors — so the big shuffle moves
O(k·P·Q) rows, not O(N·Q) (SURVEY T1 batch note).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dot_expr(vec_col: Column | str, other: Column | str) -> Column:
    """A9/T1: JVM-side dot product of two array columns (no UDF)."""
    a = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    b = F.col(other) if isinstance(other, str) else other
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def lit_vector(vec: np.ndarray) -> Column:
    return F.array(*[F.lit(float(x)) for x in np.asarray(vec, dtype="float64")])


def l2_norm_expr(vec_col: Column | str) -> Column:
    """A9 (src/encode.py:130): vector L2 norm as expressions."""
    c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    return F.sqrt(
        F.aggregate(
            F.transform(c, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0).cast("double"),
            lambda acc, v: acc + v,
        )
    )


def cosine_expr(a: Column | str, b: Column | str) -> Column:
    return dot_expr(a, b) / (l2_norm_expr(a) * l2_norm_expr(b))


def topk(
    df: DataFrame,
    query_vector: np.ndarray,
    k: int = 10,
    vector_col: str = "vector",
    score_col: str = "relevance",
    predicate: Column | None = None,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """T1 single-query exact top-k (replaces
    faiss.IndexFlatIP.search, src/app.py:78). Optional hard predicate
    = the exact/oracle arm (pre-filter, pushed to the scan).

    Ties break deterministically on the key column (row_id when
    present) so results are stable across partition scan orders."""
    if predicate is not None:
        df = df.filter(predicate)
    scored = df.withColumn(score_col, dot_expr(vector_col, lit_vector(query_vector)))
    order = [F.desc(score_col)]
    tb = tiebreak_col or ("row_id" if "row_id" in df.columns else None)
    if tb is not None:
        order.append(F.col(tb))
    return scored.orderBy(*order).limit(k)


def text_topk_then_rerank(
    encoded: DataFrame,
    compiled_query,
    aux_encoding_schema: dict[str, str],
    stats,
    text_dim: int,
    k: int = 10,
    transformation_schema=None,
    vector_col: str = "vector",
) -> DataFrame:
    """The reference's "Re-ranking" method (src/app.py:73-89 with
    method="Re-ranking"): retrieve top-k by TEXT similarity only,
    then re-rank the k-row result by the aux modalities (W1-W8) and
    sort. The retrieval pass reads only the text slice of the fused
    vector; the re-rank is a k-row window computation."""
    from .rerank import rerank

    text_vec = compiled_query.vector[:text_dim]
    scored = encoded.withColumn(
        "relevance", dot_expr(F.slice(vector_col, 1, text_dim), lit_vector(text_vec))
    )
    order = [F.desc("relevance")]
    if "row_id" in encoded.columns:
        order.append(F.col("row_id"))
    result = scored.orderBy(*order).limit(k)
    result = rerank(
        result,
        compiled_query.aux_data,
        aux_encoding_schema,
        stats,
        transformation_schema=transformation_schema,
    )
    final_order = [F.desc_nulls_last("relevance")]
    if "row_id" in encoded.columns:
        final_order.append(F.col("row_id"))
    return result.orderBy(*final_order)


def topk_batch(
    products: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vector_col: str = "vector",
    query_vec_col: str = "qvec",
    query_id_col: str = "query_id",
    score_col: str = "relevance",
    key_col: str = "row_id",
    local_buckets: int = 32,
) -> DataFrame:
    """T1 batch variant: broadcast queries ⋈ corpus, two-phase top-k.

    Phase 1 ranks within (query, hash-bucket of key) — fully parallel,
    no data movement beyond the broadcast. Phase 2 ranks the
    k·buckets survivors per query — a shuffle of k·buckets·Q tiny
    rows. At 100 TB this is the difference between shuffling the
    corpus per query and shuffling a few thousand rows.
    """
    scored = products.crossJoin(F.broadcast(queries)).withColumn(
        score_col, dot_expr(vector_col, F.col(query_vec_col))
    )
    bucket = F.pmod(F.xxhash64(F.col(key_col)), F.lit(local_buckets))
    w_local = Window.partitionBy(F.col(query_id_col), bucket).orderBy(
        F.desc(score_col), F.col(key_col)
    )
    survivors = scored.withColumn("__r", F.row_number().over(w_local)).filter(
        F.col("__r") <= k
    )
    w_global = Window.partitionBy(query_id_col).orderBy(F.desc(score_col), F.col(key_col))
    return (
        survivors.withColumn("__r", F.row_number().over(w_global))
        .filter(F.col("__r") <= k)
        .drop("__r", query_vec_col)
    )
