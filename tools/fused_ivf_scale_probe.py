"""Corpus-scale fused-IVF recall probe (VERDICT r6 next-round #2).

Round 6 attributed the fused-IVF fast point's 0.70 recall@10 (nprobe
3/8 on the 5k-row sf0.1 corpus) to the tiny near-isotropic corpus, not
the method. That claim is testable: build a ≥100k-row fused corpus
(stub embedder), train 64 k-means cells, sweep nprobe, and report
recall@10 vs SCAN FRACTION next to the sf0.1 head-8 curve. If recall
at a fixed scan fraction rises with corpus size, the fast point is
corpus-bound; if it stays flat, the coarse quantizer needs work.

Also sweeps the coarse-quantizer choice itself at this scale —
TRAINED k-means centroids vs the serve default's first-N corpus rows
("head") — so the default is a measured pick, not a guess.

Usage: python tools/fused_ivf_scale_probe.py [factor] [n_cells] [sf_dir]
       (defaults 20 → 100k rows, 64 cells, sf0.1)
Prints one JSON line per (centroids, nprobe) with mean recall@10 over
8 seeded queries, plus a summary line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def main():
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    n_cells = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"

    from fuserank_spark.session import get_spark
    from fuserank_spark import schema as S
    from fuserank_spark.embed import DeterministicStubEmbedder, embed_corpus
    from fuserank_spark.encode import compute_stats, encode_products, record_text_dim
    from fuserank_spark.flagship import probe_cells
    from fuserank_spark.pipeline_ext.simsearch import ivf_assign, ivf_build
    from fuserank_spark.query import compile_query
    from fuserank_spark.search import topk

    spark = get_spark("fused-ivf-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    # replicated corpus with per-replica text perturbation: embeddings
    # vary per replica (hashed BOW sees the rep token), aux spreads —
    # the scale_smoke construction
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    big = (
        docs.crossJoin(spark.range(factor).select(F.col("id").alias("rep")))
        .select(
            (F.col("doc_id") * factor + F.col("rep")).alias("row_id"),
            F.concat(F.col("text"), F.lit(" rep"), F.col("rep")).alias("text"),
            "lang",
            (F.col("n_chars") + F.col("rep") % 37).alias("n_chars"),
        )
        .repartition(64, "row_id")
    )
    aux = {"lang": S.SPARSE, "n_chars": S.DENSE}
    embedded = embed_corpus(big, {"text": 1.0}, dim=64)
    stats = compute_stats(embedded, aux)
    encoded, layout = encode_products(embedded, aux, stats, num_harmonics=64)
    record_text_dim(layout, 64)
    enc = encoded.select("row_id", "vector").persist()
    n = enc.count()
    print(f"fused corpus: {n} rows, dim {layout.dim}", file=sys.stderr)

    # 8 seeded fused queries (bench's qvec construction)
    emb = DeterministicStubEmbedder(64)
    qvecs = []
    for i in range(8):
        cq = compile_query(
            f"scale probe query {i} spark filter",
            {
                "lang": (([["en", "de"], ["fr"], ["es", "zh"]][i % 3], False), 2.0),
                "n_chars": ((100.0 + 20 * i, 300.0 + 20 * i, False), 1.5),
            },
            aux, stats, layout,
            text_embedder=emb, num_harmonics=64,
        )
        qvecs.append(np.asarray(cq.vector, dtype="float64"))

    exact = [
        {r["row_id"] for r in topk(enc, qv, k=10).select("row_id").collect()}
        for qv in qvecs
    ]

    head_cents = np.array(
        [
            r["vector"]
            for r in enc.orderBy("row_id").limit(n_cells).select("vector").collect()
        ],
        dtype="float64",
    )
    t0 = time.time()
    _assigned_ml, trained_cents = ivf_build(
        enc, dim=layout.dim, n_centroids=n_cells, vec_col="vector",
        sample_fraction=min(1.0, 50_000 / n), max_iter=10,
    )
    train_sec = round(time.time() - t0, 1)
    print(f"k-means {n_cells} cells trained in {train_sec}s", file=sys.stderr)

    # spherical k-means: train on L2-normalized vectors, renormalize
    # the centroids — the IP-aligned trainer (plain k-means optimizes
    # L2 cell geometry, which need not match inner-product retrieval
    # over fused vectors whose norms vary by modality coverage)
    norm = F.sqrt(F.aggregate(F.transform("vector", lambda x: x * x),
                              F.lit(0.0), lambda a, v: a + v))
    enc_unit = enc.withColumn("__n", norm).select(
        "row_id", F.transform("vector", lambda x: x / F.col("__n")).alias("vector")
    )
    _a, sph = ivf_build(
        enc_unit, dim=layout.dim, n_centroids=n_cells, vec_col="vector",
        sample_fraction=min(1.0, 50_000 / n), max_iter=10,
    )
    sph = sph / np.maximum(np.linalg.norm(sph, axis=1, keepdims=True), 1e-12)

    nprobes = tuple(sorted({p for p in (1, 2, 4, 8, 16, 24, 32, n_cells) if p <= n_cells}))
    results = []
    for cents_name, cents in (
        ("head", head_cents), ("trained", trained_cents), ("spherical", sph)
    ):
        assigned = ivf_assign(
            enc, cents, vec_col="vector", metric="ip", score_round=6
        ).persist()
        assigned.count()
        for nprobe in nprobes:
            recalls = []
            for qi, qv in enumerate(qvecs):
                probed = probe_cells(cents, qv, nprobe)
                got = {
                    r["row_id"]
                    for r in topk(
                        assigned, qv, k=10,
                        predicate=F.col("centroid_id").isin(probed),
                    ).select("row_id").collect()
                }
                recalls.append(len(exact[qi] & got) / 10.0)
            row = {
                "centroids": cents_name,
                "n_rows": n,
                "n_cells": n_cells,
                "nprobe": nprobe,
                "scan_frac": round(nprobe / n_cells, 4),
                "mean_recall_at_10": round(sum(recalls) / len(recalls), 4),
                "min_recall": round(min(recalls), 2),
            }
            results.append(row)
            print(json.dumps(row))
        assigned.unpersist()

    # scan fraction actually read per probe set differs from
    # nprobe/n_cells when cells are unbalanced — report observed
    # fractions for the trained cells at the fast points
    sizes = {
        r["centroid_id"]: r["c"]
        for r in ivf_assign(enc, trained_cents, vec_col="vector", metric="ip",
                            score_round=6)
        .groupBy("centroid_id").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    print(json.dumps({
        "summary": "cell balance (trained)",
        "n_cells_used": len(sizes),
        "max_cell_frac": round(max(sizes.values()) / n, 4),
        "train_sec": train_sec,
    }))


if __name__ == "__main__":
    main()
