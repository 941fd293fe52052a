"""Quantization-tier recall on PROXY-TRANSFORMER geometry (VERDICT r7
ask #1, second half).

Every r7 PQ/SQ8/BQ recall number was measured on the hash-BOW stub's
near-isotropic embedding space. Real transformer embeddings are
anisotropic and correlated, and quantizer quality depends on exactly
that structure (PQ subspace codebooks degrade when variance
concentrates in few directions; BQ thresholds degrade when dimensions
correlate). This tool re-measures the tier table on
``ProxyTransformerEmbedder`` vectors — a pinned-weight numpy
transformer forward pass producing realistically-shaped geometry with
no downloads — and prints GEOMETRY EVIDENCE first, so "anisotropic,
correlated" is a measured property, not an adjective:

* participation ratio PR = (Σλ)²/Σλ² of the covariance eigenspectrum
  — the effective number of variance-carrying dimensions (isotropic
  space: PR ≈ dim; anisotropic: PR ≪ dim);
* top-1 eigenvalue share of total variance;
* mean pairwise cosine over a seeded sample (correlated spaces sit far
  from 0).

Queries are the first N corpus vectors (the r7 eval-harness
methodology — same protocol, different geometry, comparable table).
PQ's ``m`` defaults to dim/8 so SUBVECTOR GRANULARITY (8 dims/code)
and compression ratio (32×) match the r7 stub table at dim 64 / m 8.

Usage: python tools/quantization_proxy_probe.py [n_rows] [sf_dir]
           [--embedder proxy|stub] [--queries N] [--k K]
Prints one JSON line of geometry stats and one of the recall report.
"""

from __future__ import annotations

import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def geometry_stats(vecs: np.ndarray, seed: int = 42) -> dict:
    """Measured anisotropy/correlation evidence on a bounded sample."""
    n, d = vecs.shape
    mu = vecs.mean(axis=0)
    centered = vecs - mu
    # eigenspectrum of the covariance via SVD of the centered sample
    sv = np.linalg.svd(centered, compute_uv=False)
    lam = (sv**2) / max(n - 1, 1)
    pr = float(lam.sum() ** 2 / (lam**2).sum())
    rng = np.random.Generator(np.random.PCG64(seed))
    i = rng.integers(0, n, size=4096)
    j = rng.integers(0, n, size=4096)
    keep = i != j
    a, b = vecs[i[keep]], vecs[j[keep]]
    cos = np.einsum("nd,nd->n", a, b) / (
        np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1)
    )
    return {
        "n_sample": int(n),
        "dim": int(d),
        "participation_ratio": round(pr, 1),
        "pr_over_dim": round(pr / d, 4),
        "top1_eig_share": round(float(lam[0] / lam.sum()), 4),
        "mean_pairwise_cos": round(float(cos.mean()), 4),
        "mean_norm_of_mean": round(float(np.linalg.norm(mu)), 4),
    }


def main():
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    opts = {a.split("=")[0]: (a.split("=", 1)[1] if "=" in a else True)
            for a in sys.argv[1:] if a.startswith("--")}
    n_rows = int(argv[0]) if len(argv) > 0 else 100_000
    sf_dir = argv[1] if len(argv) > 1 else "/root/testdata/sf0.1"
    embedder_kind = str(opts.get("--embedder", "proxy"))
    n_queries = int(opts.get("--queries", 8))
    k = int(opts.get("--k", 10))

    from fuserank_spark.session import get_spark
    from fuserank_spark.embed import (
        DeterministicStubEmbedder,
        ProxyTransformerEmbedder,
        embed_corpus,
    )
    from fuserank_spark.pipeline_ext.quantization import quantization_recall_report

    spark = get_spark("quantization-proxy-probe")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n_docs = docs.count()
    factor = max(1, math.ceil(n_rows / n_docs))
    big = (
        docs.crossJoin(spark.range(factor).select(F.col("id").alias("rep")))
        .select(
            (F.col("doc_id") * factor + F.col("rep")).alias("vec_id"),
            F.concat(F.col("text"), F.lit(" rep"), F.col("rep")).alias("text"),
        )
        .filter(F.col("vec_id") < n_rows)
        .repartition(64, "vec_id")
    )
    if embedder_kind == "proxy":
        dim = 384
        factory = lambda: ProxyTransformerEmbedder(blas_threads=1)  # noqa: E731
    elif embedder_kind == "stub":
        dim = 64
        factory = lambda: DeterministicStubEmbedder(dim)  # noqa: E731
    else:
        raise SystemExit(f"--embedder must be proxy|stub, got {embedder_kind}")

    emb = (
        embed_corpus(big, {"text": 1.0}, dim=dim, embedder_factory=factory,
                     out_col="embedding")
        .select("vec_id", "embedding")
        .persist()
    )
    n = emb.count()
    print(f"embedded corpus: {n} rows × {dim} ({embedder_kind})", file=sys.stderr)

    sample = np.array(
        [r["embedding"] for r in emb.orderBy("vec_id").limit(4096).collect()],
        dtype="float64",
    )
    print(json.dumps({"geometry": embedder_kind} | geometry_stats(sample)))

    qrows = emb.filter(F.col("vec_id") < n_queries).orderBy("vec_id").collect()
    queries = [(int(r["vec_id"]), [float(x) for x in r["embedding"]]) for r in qrows]
    m = dim // 8  # 8 dims per PQ code — the r7 stub-table granularity
    report = quantization_recall_report(emb, queries, dim=dim, k=k, m=m)
    print(json.dumps(
        {"recall_report": embedder_kind, "n_rows": n, "dim": dim, "m": m} | report
    ))


if __name__ == "__main__":
    main()
