"""r13 phase decomposition for the optimization targets (guide §1:
measure first, isolate with the noop sink). One session, labeled jobs;
each phase timed median-of-3 after one warm run.

Usage: python tools/r13_decompose.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def med3(fn):
    fn()  # warm
    runs = []
    for _ in range(3):
        t0 = time.time()
        fn()
        runs.append(time.time() - t0)
    return sorted(runs)[1]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from fuserank_spark.session import get_spark

    spark = get_spark("r13-decompose")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    def t(label, fn):
        sc.setJobDescription(label)
        m = med3(fn)
        sc.setJobDescription(None)
        print(f"{m:8.3f}  {label}", flush=True)

    # ---------------- q_profile: agg1 (fused non-distinct) vs agg2 (distinct)
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    li.count()
    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    aggs1 = []
    for c in cols:
        col = F.col(c)
        aggs1 += [
            F.count(col).alias(f"{c}__n"),
            F.sum(col.isNull().cast("long")).alias(f"{c}__null"),
            F.min(col).cast("double").alias(f"{c}__min"),
            F.max(col).cast("double").alias(f"{c}__max"),
            F.avg(col).alias(f"{c}__mean"),
            F.percentile(col, F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75))).alias(
                f"{c}__q"
            ),
        ]
    t("profile.agg1_fused_with_percentile", lambda: li.agg(*aggs1).collect())
    aggs1b = [a for a in aggs1 if "__q" not in str(a)]
    t("profile.agg1_no_percentile", lambda: li.agg(*aggs1b).collect())
    t(
        "profile.percentile_only",
        lambda: li.agg(
            *[
                F.percentile(
                    F.col(c), F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75))
                ).alias(c)
                for c in cols
            ]
        ).collect(),
    )
    t(
        "profile.agg2_countdistinct3",
        lambda: li.agg(
            *[F.countDistinct(F.col(c)).alias(c) for c in cols]
        ).collect(),
    )
    t(
        "profile.agg2_countdistinct1",
        lambda: li.agg(F.countDistinct(F.col(cols[0]))).collect(),
    )
    # a distinct-count alternative: per-column groupBy counts
    t(
        "profile.distinct_via_3groupbys",
        lambda: [
            li.select(F.col(c)).groupBy(c).agg(F.lit(1)).count() for c in cols
        ],
    )

    # ---------------- q_lsh_pairs: signature vs banding vs pairs
    from fuserank_spark.ext_queries import _docs, _docs_with_dups
    from fuserank_spark.pipeline_ext import dedup as D

    d = _docs_with_dups(_docs(spark, sf_dir))
    t("lsh.docs_scan", lambda: _noop(d))
    sigs = D.minhash_signature(d).drop("text")
    t("lsh.minhash_signature", lambda: _noop(sigs))
    # shingle hashing alone (no perms)
    from fuserank_spark.pipeline_ext.dedup import shingles_expr
    from fuserank_spark.pipeline_ext.hashing import portable_hash32

    hashed = d.withColumn(
        "__sh", F.transform(shingles_expr(F.col("text")), lambda s: portable_hash32(s))
    ).select("doc_id", F.size("__sh").alias("ns"))
    t("lsh.shingle_md5_only", lambda: _noop(hashed))
    sh_only = d.select(
        "doc_id", F.size(shingles_expr(F.col("text"))).alias("ns")
    )
    t("lsh.shingles_no_md5", lambda: _noop(sh_only))
    t("lsh.full_pairs", lambda: _noop(D.lsh_candidate_pairs(sigs)))

    # ---------------- q_ngram_jaccard: blocking vs pair stage
    dd = _docs(spark, sf_dir).select("doc_id", "text")
    t("jac.full", lambda: _noop(D.ngram_jaccard_pairs(dd, max_bucket_size=1 << 31)))
    tokens = F.split(F.trim(F.col("text")), r"\s+")
    block = F.concat_ws(" ", F.slice(tokens, 1, 2))
    blocked = dd.select(
        block.alias("block_key"),
        F.col("doc_id").alias("id"),
        shingles_expr(F.col("text"), 5).alias("sh"),
    )
    t("jac.blocked_projection", lambda: _noop(blocked))
    # block-size histogram: how selective would a hot-key prefilter be?
    sizes = (
        dd.select(block.alias("bk"))
        .groupBy("bk")
        .count()
        .groupBy("count")
        .agg(F.count(F.lit(1)).alias("n_blocks"))
        .orderBy("count")
    )
    sc.setJobDescription("jac.block_size_histogram")
    print(
        "   block sizes:",
        [(r["count"], r["n_blocks"]) for r in sizes.collect()][:12],
        flush=True,
    )
    sc.setJobDescription(None)

    # ---------------- q_ivfpq_knn / q_pq_trained phase decomposition
    from fuserank_spark.ext_queries import _PQ_K, _PQ_M, _emb
    from fuserank_spark.pipeline_ext import quantization as Q
    from fuserank_spark.pipeline_ext import simsearch as SS
    import numpy as np

    e = _emb(spark, sf_dir)
    e.count()
    t(
        "ivfpq.seed_collects",
        lambda: (
            e.filter(F.col("vec_id") < 8).orderBy("vec_id").collect(),
            e.filter(F.col("vec_id") < _PQ_K).orderBy("vec_id").collect(),
        ),
    )
    cent_rows = e.filter(F.col("vec_id") < 8).orderBy("vec_id").collect()
    centroids = np.array([r["embedding"] for r in cent_rows], dtype="float64")
    seed_rows = e.filter(F.col("vec_id") < _PQ_K).orderBy("vec_id").collect()
    books = Q.forgy_codebooks(
        [r["embedding"] for r in seed_rows], dim=64, m=_PQ_M, k=_PQ_K
    )
    assigned = SS.ivf_assign(e, centroids, score_round=6)
    t("ivfpq.ivf_assign", lambda: _noop(assigned))
    codes = Q.pq_encode(assigned, books, vec_col="embedding")
    t("ivfpq.assign_plus_pq_encode", lambda: _noop(codes))
    queries = [(r["vec_id"], r["embedding"]) for r in cent_rows[:3]]
    t(
        "ivfpq.full",
        lambda: _noop(
            Q.ivf_pq_knn(codes, centroids, books, queries, k=10, nprobe=3).orderBy(
                "query_id", "rnk"
            )
        ),
    )
    # pq_trained: training vs serve
    t(
        "pqt.train_portable",
        lambda: Q.train_pq(
            e, dim=64, m=_PQ_M, k=_PQ_K, sample_n=256, iters=2, portable=True
        ),
    )
    books_t = Q.train_pq(
        e, dim=64, m=_PQ_M, k=_PQ_K, sample_n=256, iters=2, portable=True
    )
    codes_t = Q.pq_encode(e, books_t, vec_col="embedding")
    t("pqt.pq_encode", lambda: _noop(codes_t))
    t(
        "pqt.adc_topk",
        lambda: _noop(
            Q.pq_adc_topk(codes_t, books_t, queries, k=10).orderBy("query_id", "rnk")
        ),
    )


if __name__ == "__main__":
    main()
