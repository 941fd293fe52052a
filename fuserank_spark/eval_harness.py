"""Differential-eval harness (reference `src/eval/evaluate.py`):
exact hard-filtered search as oracle vs fused-vector search as
system-under-test, over seeded random query fixtures, swept across
``num_harmonics`` (the reference's config.yaml knob).

The corpus is the driver's ``documents`` testdata enriched with
deterministic modality columns covering all four kinds:
  lang        sparse   (as shipped)
  is_long     binary   (derived: n_chars above corpus median)
  n_chars     dense    (as shipped)
  location    geo      (derived deterministic lon/lat from doc_id)

Metrics: recall / r_precision (metrics.py, evaluate.py:92-110);
reporting: grouped means (A5, evaluate.py:113-129).
"""

from __future__ import annotations

import random
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import schema as S
from .embed import DeterministicStubEmbedder
from .encode import CorpusStats, VectorLayout, compute_stats, encode_products, record_text_dim
from .flagship import EMB_DIM
from .metrics import r_precision, recall
from .query import compile_query
from .search import dot_expr, lit_vector, topk

EVAL_AUX_SCHEMA = {
    "lang": S.SPARSE,
    "is_long": S.BINARY,
    "n_chars": S.DENSE,
    "location": S.GEO,
}
TEXT_SCHEMA = {"text": 1.0}


def enriched_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents + derived binary & geo modality columns (seeded by
    doc_id — deterministic across runs and engines)."""
    import os

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).withColumn(
        "row_id", F.col("doc_id")
    )
    median = docs.approxQuantile("n_chars", [0.5], 0.0)[0]
    lon = (F.pmod(F.col("doc_id") * 37 + 11, F.lit(360)) - 180).cast("double")
    lat = (F.pmod(F.col("doc_id") * 53 + 7, F.lit(170)) - 85).cast("double")
    return docs.withColumns(
        {
            "is_long": F.when(F.col("n_chars") > median, "yes").otherwise("no"),
            "location": F.when(
                F.col("doc_id") % 17 != 0,  # ~6% missing (null-encoding path)
                F.struct(lon.alias("lon"), lat.alias("lat")),
            ),
        }
    )


@dataclass
class EvalCorpus:
    df: DataFrame
    encoded: DataFrame
    stats: CorpusStats
    layout: VectorLayout
    num_harmonics: int


def prepare_eval_base(spark: SparkSession, sf_dir: str):
    """Embed + stats once — only the encode stage depends on K, so a
    K-sweep must not re-run the (expensive) embedding pass. The
    embedded frame is persisted across the sweep."""
    from .embed import embed_corpus

    docs = enriched_documents(spark, sf_dir)
    embedded = embed_corpus(docs, TEXT_SCHEMA, dim=EMB_DIM).persist()
    stats = compute_stats(embedded, EVAL_AUX_SCHEMA)
    return docs, embedded, stats


def build_eval_corpus(
    spark: SparkSession, sf_dir: str, num_harmonics: int, base=None
) -> EvalCorpus:
    docs, embedded, stats = base if base is not None else prepare_eval_base(spark, sf_dir)
    encoded, layout = encode_products(
        embedded, EVAL_AUX_SCHEMA, stats, num_harmonics=num_harmonics
    )
    record_text_dim(layout, EMB_DIM)
    return EvalCorpus(docs, encoded.persist(), stats, layout, num_harmonics)


def sample_queries(
    corpus_rows: list,
    n_queries: int,
    n_modalities: int,
    seed: int = 42,
    reference_regime: bool = False,
    n_chars_min: float | None = None,
    include_geo: bool = False,
) -> list[dict]:
    """Seeded (query-row, modality-subset) draws mirroring
    evaluate.py:173-181; filter values derive from the sampled row so
    the hard filter is satisfiable.

    ``reference_regime=True`` reproduces the reference eval exactly
    (faiss_experiment.py:36-63): full text field as query, weight 1.0
    everywhere, dense filter = (column_min, sampled_value) interval.
    Default regime uses tighter intervals + weight 3.0 (a harder
    soft-filter stress)."""
    out = []
    weight = 1.0 if reference_regime else 3.0
    # geolocation has no hard-filter oracle form — the reference
    # excludes it from the differential eval pool (config.yaml:2,
    # milvus_experiment.py:51-52); include_geo keeps fused-vs-fused
    # experiments possible
    pool = sorted(EVAL_AUX_SCHEMA if include_geo else
                  {c: k for c, k in EVAL_AUX_SCHEMA.items() if k != S.GEO})
    for i in range(n_queries):
        rng = random.Random(seed * 1000 + i)  # seed = f(i) (evaluate.py:174-175)
        row = rng.choice(corpus_rows)
        chosen = rng.sample(pool, k=min(n_modalities, len(pool)))
        aux: dict[str, tuple] = {c: (None, 1.0) for c in EVAL_AUX_SCHEMA}
        for c in chosen:
            if c == "lang":
                aux[c] = (([row["lang"]], False), weight)
            elif c == "is_long":
                aux[c] = (row["is_long"], weight)
            elif c == "n_chars":
                v = float(row["n_chars"])
                if reference_regime:
                    lo = n_chars_min if n_chars_min is not None else 0.0
                    aux[c] = ((lo, v, False), weight)
                else:
                    aux[c] = ((v - 40.0, v + 40.0, False), weight)
            elif c == "location":
                loc = row["location"]
                if loc is None:
                    continue
                aux[c] = ((loc["lon"], loc["lat"], False), weight)
        text = str(row["text"]) if reference_regime else " ".join(str(row["text"]).split()[:6])
        out.append({"query_id": i, "text": text, "aux": aux})
    return out


def evaluate_fused_vs_exact(
    spark: SparkSession,
    sf_dir: str,
    num_harmonics_list: tuple[int, ...] = (8, 64, 200),
    n_queries: int = 8,
    n_modalities: int = 2,
    k: int = 10,
    seed: int = 42,
    interval_epsilon: float = 0.01,
    reference_regime: bool = False,
    base=None,
) -> list[dict]:
    """The reference's sweep loop (evaluate.py:205-242): for each K,
    run seeded queries through both arms, record recall/r-precision.
    Sweep ``interval_epsilon`` by calling this per ε (the reference's
    second knob, config.yaml:8).

    Geo has no hard-filter form (milvus_experiment.py:51-52) — it
    contributes to the fused arm only, exactly as in the reference.

    Pass ``base`` (prepare_eval_base output) to share ONE corpus
    embed + stats pass across several eval calls (ε sweeps, the geo
    metric) — a caller-provided base is NOT unpersisted here.
    """
    results: list[dict] = []
    embedder = DeterministicStubEmbedder(EMB_DIM)
    sample_rows = None
    own_base = base is None
    if own_base:
        base = prepare_eval_base(spark, sf_dir)
    for K in num_harmonics_list:
        corpus = build_eval_corpus(spark, sf_dir, K, base=base)
        if sample_rows is None:
            sample_rows = corpus.df.select(
                "row_id", "text", "lang", "is_long", "n_chars", "location"
            ).collect()
        n_chars_min = float(corpus.stats.columns["n_chars"].min or 0.0)
        queries = sample_queries(
            sample_rows, n_queries, n_modalities, seed,
            reference_regime=reference_regime, n_chars_min=n_chars_min,
        )

        def _one(q: dict) -> dict:
            cq = compile_query(
                q["text"], q["aux"], EVAL_AUX_SCHEMA, corpus.stats, corpus.layout,
                text_embedder=embedder, num_harmonics=K,
                interval_epsilon=interval_epsilon,
            )
            fused = [
                r["row_id"]
                for r in topk(corpus.encoded, cq.vector, k=k).select("row_id").collect()
            ]
            text_score = dot_expr(F.slice("vector", 1, EMB_DIM), lit_vector(cq.vector[:EMB_DIM]))
            oracle_df = corpus.encoded
            if cq.predicate is not None:
                oracle_df = oracle_df.filter(cq.predicate)
            oracle = [
                r["row_id"]
                for r in oracle_df.withColumn("ts", text_score)
                .orderBy(F.desc("ts"), "row_id")
                .limit(k)
                .select("row_id")
                .collect()
            ]
            return {
                "num_harmonics": K,
                "interval_epsilon": interval_epsilon,
                "query_id": q["query_id"],
                "recall": recall(oracle, fused),
                "r_precision": r_precision(oracle, fused),
            }

        # the per-query jobs are INDEPENDENT driver actions over the
        # persisted corpus — submit them from a small thread pool so
        # the 2·n_queries sequential collects overlap (guide §2.6);
        # pool.map preserves query order, results are byte-identical
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=4) as pool:
            results.extend(pool.map(_one, queries))
        corpus.encoded.unpersist()
    if own_base:
        base[1].unpersist()
    return results


def haversine_km_expr(col: Column, lon: float, lat: float) -> Column:
    """Exact haversine km from a (lon, lat) struct column to a fixed
    query point — Column-expression twin of fourier.haversine_km (G1,
    src/encode.py:371-388), R=6371."""
    import numpy as np

    plon, plat = F.radians(col.getField("lon")), F.radians(col.getField("lat"))
    qlon, qlat = np.radians([float(lon), float(lat)])
    hav = (
        F.pow(F.sin((plat - F.lit(qlat)) / 2), 2)
        + F.cos(F.lit(qlat)) * F.cos(plat) * F.pow(F.sin((plon - F.lit(qlon)) / 2), 2)
    )
    return 2 * 6371.0 * F.asin(F.sqrt(hav))


def evaluate_geo_rank_agreement(
    spark: SparkSession,
    sf_dir: str,
    num_harmonics: int = 200,
    n_queries: int = 8,
    k: int = 10,
    seed: int = 42,
    base=None,
    max_sample_rows: int = 100_000,
) -> list[dict]:
    """Geo quality metric (VERDICT r5 next-round #5). Geolocation has
    no hard-filter oracle form — the reference excludes it from its
    own differential eval (config.yaml:2, milvus_experiment.py:51-52)
    and that invariant is kept here — but the reference app DOES serve
    geo fused queries (src/app.py:216-228), so the modality needs a
    quality number. This scores RANK AGREEMENT instead of a hard
    oracle: a geo-dominant fused query's top-k vs the exact haversine
    ordering.

    Arms, per seeded query point (a sampled document's location):
      system  fused top-k where ONLY geo carries weight (empty query
              text → zero text segment; every other modality weighted
              0.0), i.e. the geo product encoding alone drives rank;
      exact   the k nearest non-null-location documents by exact
              haversine km, ascending, ties by row_id.
    Metrics: recall@k + r_precision, same shape as the text harness,
    so report()/export_report() work unchanged.
    """
    corpus = build_eval_corpus(spark, sf_dir, num_harmonics, base=base)
    embedder = DeterministicStubEmbedder(EMB_DIM)
    with_loc = corpus.df.filter(F.col("location").isNotNull())
    # query-point pool: BOUNDED deterministic sample (orderBy row_id,
    # limit — the train_pca precedent), never an unguarded collect of
    # the whole location column: pointed at a production corpus the
    # bare collect materializes every row on the driver (VERDICT r6
    # wrong #2). Only the sampled pool lands driver-side; both scoring
    # arms below stay distributed. Raise max_sample_rows explicitly if
    # a wider pool is genuinely wanted.
    loc_rows = (
        with_loc.select("row_id", "location")
        .orderBy("row_id")
        .limit(max_sample_rows)
        .collect()
    )
    rng = random.Random(seed)
    picks = rng.sample(loc_rows, k=min(n_queries, len(loc_rows)))

    def _one(item) -> dict:
        i, row = item
        lon = float(row["location"]["lon"])
        lat = float(row["location"]["lat"])
        aux: dict[str, tuple] = {c: (None, 0.0) for c in EVAL_AUX_SCHEMA}
        aux["location"] = ((lon, lat, False), 1.0)
        cq = compile_query(
            "", aux, EVAL_AUX_SCHEMA, corpus.stats, corpus.layout,
            text_embedder=embedder, num_harmonics=num_harmonics,
        )
        # round-before-rank on BOTH arms (the CLAUDE.md doctrine, and
        # the r6 0.9833 residual's fix): the integer-grid corpus
        # produces MIRROR-POINT pairs (same |Δlon|, same lat) that are
        # exactly equidistant in real arithmetic — raw haversine
        # orders them by fold-order ulps while the fused dot ties, so
        # a pair straddling the k boundary was a coin flip. Rounding
        # (score@9, km@6 ≈ 1 mm) makes both arms tie and fall to the
        # same row_id tie-break. Mechanism pinned by
        # tests/test_eval_harness.py::test_geo_boundary_mirror_tie.
        fused = [
            r["row_id"]
            for r in topk(corpus.encoded, cq.vector, k=k, score_round=9)
            .select("row_id")
            .collect()
        ]
        exact = [
            r["row_id"]
            for r in with_loc.withColumn(
                "hav_km", haversine_km_expr(F.col("location"), lon, lat)
            )
            .orderBy(F.asc(F.round(F.col("hav_km"), 6)), F.asc("row_id"))
            .limit(k)
            .select("row_id")
            .collect()
        ]
        return {
            "num_harmonics": num_harmonics,
            "query_id": i,
            "recall": recall(exact, fused),
            "r_precision": r_precision(exact, fused),
        }

    # independent per-query jobs overlapped (guide §2.6) — see
    # evaluate_fused_vs_exact; order preserved by pool.map
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=4) as pool:
        results = list(pool.map(_one, enumerate(picks)))
    corpus.encoded.unpersist()
    return results


def report(spark: SparkSession, results: list[dict]) -> DataFrame:
    """A5 grouped-mean report (evaluate.py:113-129)."""
    df = spark.createDataFrame(results)
    keys = ["num_harmonics"]
    if "interval_epsilon" in df.columns:
        keys.append("interval_epsilon")
    return (
        df.groupBy(*keys)
        .agg(
            F.round(F.avg("recall"), 4).alias("mean_recall"),
            F.round(F.avg("r_precision"), 4).alias("mean_r_precision"),
        )
        .orderBy(*keys)
    )


def export_report(
    spark: SparkSession, results: list[dict], out_dir: str = "eval_out"
) -> list[str]:
    """Persist the sweep report as artifacts — the reference renders
    matplotlib recall-vs-harmonics figures
    (/root/reference/src/eval/evaluate.py:132-153); here the same
    series is written as CSV (always) plus a PNG when matplotlib is
    importable (gated — not in this container) with an ASCII-chart
    .txt fallback, so the sweep output is inspectable artifacts
    either way. Returns the written paths."""
    import os

    rows = [r.asDict() for r in report(spark, results).collect()]
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    cols = list(rows[0].keys()) if rows else ["num_harmonics", "mean_recall"]
    csv_path = os.path.join(out_dir, "recall_sweep.csv")
    with open(csv_path, "w") as f:
        f.write(",".join(cols) + "\n")
        for r in rows:
            f.write(",".join(str(r[c]) for c in cols) + "\n")
    paths.append(csv_path)
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots()
        xs = [r["num_harmonics"] for r in rows]
        ax.plot(xs, [r["mean_recall"] for r in rows], marker="o", label="recall")
        ax.plot(
            xs, [r["mean_r_precision"] for r in rows], marker="s",
            label="r_precision",
        )
        ax.set_xlabel("num_harmonics")
        ax.set_ylabel("mean metric")
        ax.legend()
        png_path = os.path.join(out_dir, "recall_sweep.png")
        fig.savefig(png_path, dpi=120)
        plt.close(fig)
        paths.append(png_path)
    except ImportError:
        txt_path = os.path.join(out_dir, "recall_sweep.txt")
        with open(txt_path, "w") as f:
            f.write("mean_recall vs num_harmonics (bar = recall, 50 cols)\n")
            for r in rows:
                bar = "#" * int(round(50 * float(r["mean_recall"])))
                f.write(f"K={r['num_harmonics']:>4} |{bar:<50}| {r['mean_recall']}\n")
        paths.append(txt_path)
    return paths


def fused_ivf_nprobe_sweep(
    spark: SparkSession, sf_dir: str, nprobes=(1, 2, 3, 4, 8), k: int = 10,
    n_queries: int = 1, seed: int = 42,
) -> DataFrame:
    """Recall@k of the fused-IVF serve path per nprobe, against the
    exact fused scan (the ann-index analog of the harmonics sweep;
    reference eval loop src/eval/evaluate.py:156-202). One corpus
    build is shared across the sweep; recall at nprobe=n_cells is
    1.0 by construction and anchors the table.

    ``n_queries > 1`` (r11, VERDICT r10 #3): sweep a seeded batch of
    fused queries instead of the single flagship query, and emit a
    ``recall_min`` column (the worst query per point) alongside the
    mean — ``flagship.curve_from_sweep`` then produces a (frac, mean,
    min) curve that supports ``target_min_recall``. The single-query
    default keeps the historical 2-column schema (its min IS its
    mean)."""
    from pyspark.sql import functions as _F

    from .embed import DeterministicStubEmbedder
    from .flagship import (
        AUX_SCHEMA, EMB_DIM, FUSED_IVF_CELLS, NUM_HARMONICS,
        build_corpus_cached, fused_ivf_parts, probe_cells,
    )
    from .query import compile_query
    from .search import topk

    corpus = build_corpus_cached(spark, sf_dir)
    # one assignment + one exact baseline for the whole sweep; only
    # the probe set varies per nprobe (probe sets nest by construction)
    # single-query mode sweeps the flagship query; multi-query mode
    # brings its own seeded batch, so the flagship compile (stub embed
    # + encode work) is skipped there (ADVICE r11)
    assigned, cq, _ = fused_ivf_parts(
        corpus, FUSED_IVF_CELLS, compile_flagship=(n_queries <= 1)
    )
    # materialize the assignment ONCE: each probe's top-k would
    # otherwise re-run the 8-centroid IP argmax over every corpus row
    # per scan (HOF aggregates are interpreted, not codegen'd — the
    # re-derivation, not the probe, dominated the sweep's wall)
    assigned = assigned.persist()
    assigned.count()
    cents = [
        r["vector"]
        for r in corpus.encoded.filter(_F.col("row_id") < FUSED_IVF_CELLS)
        .orderBy("row_id")
        .select("vector")
        .collect()
    ]
    if n_queries <= 1:
        qvecs = [cq.vector]
    else:
        emb = DeterministicStubEmbedder(EMB_DIM)
        qvecs = []
        for i in range(n_queries):
            rng = random.Random(seed * 1000 + i)
            lo = float(rng.uniform(50.0, 250.0))
            cqi = compile_query(
                f"sweep query {i} spark join filter",
                {
                    "lang": (([rng.choice(["en", "de", "es", "fr"])], False), 2.0),
                    "source": (None, 1.0),
                    "n_chars": ((lo, lo + 200.0, False), 1.5),
                },
                AUX_SCHEMA, corpus.stats, corpus.layout,
                text_embedder=emb, num_harmonics=NUM_HARMONICS,
            )
            qvecs.append(cqi.vector)
    # every (query, nprobe) top-k is an independent driver action over
    # persisted frames — overlap them from a small thread pool (guide
    # §2.6; pool.map preserves order, results byte-identical)
    from concurrent.futures import ThreadPoolExecutor

    def _approx(args):
        qi, np_ = args
        probed = probe_cells(cents, qvecs[qi], int(np_))
        return {
            r["row_id"]
            for r in topk(
                assigned, qvecs[qi], k=k,
                predicate=_F.col("centroid_id").isin(probed),
            ).collect()
        }

    with ThreadPoolExecutor(max_workers=4) as pool:
        exact = list(
            pool.map(
                lambda qv: {r["row_id"] for r in topk(corpus.encoded, qv, k=k).collect()},
                qvecs,
            )
        )
        grid = [(qi, np_) for np_ in nprobes for qi in range(len(qvecs))]
        approx = dict(zip(grid, pool.map(_approx, grid)))
    rows = []
    for np_ in nprobes:
        recalls = [
            len(exact[qi] & approx[(qi, np_)]) / max(len(exact[qi]), 1)
            for qi in range(len(qvecs))
        ]
        if n_queries <= 1:
            rows.append((int(np_), recalls[0]))
        else:
            rows.append(
                (int(np_), sum(recalls) / len(recalls), min(recalls))
            )
    assigned.unpersist()
    schema = (
        "nprobe int, recall double"
        if n_queries <= 1
        else "nprobe int, recall double, recall_min double"
    )
    from .session import local_frame

    return local_frame(spark, rows, schema)


def evaluate_lsh_dedup_recall(
    spark: SparkSession,
    sf_dir: str,
    n_docs: int = 200,
    bands: int = 2,
    rows_per_band: int = 4,
) -> dict:
    """Measured recall of the MinHash-LSH candidate generator against
    EXACT shingle-Jaccard ground truth, by true-similarity band — the
    quality number behind the (bands × rows_per_band) banding default
    (theory: P(candidate) = 1 − (1 − J^rows)^bands; this measures it
    on real signatures end-to-end). Eval-class: the corpus is a
    bounded sample (n_docs originals + one perturbed twin each, so
    high-J truth pairs exist by construction) and the exact pairwise
    Jaccard runs driver-side over ≤ (2·n_docs)² shingle sets — the
    same boundedness contract as the recall sweeps.

    Returns {"recall_by_band": {"0.5-0.7": r, "0.7-0.9": r,
    "0.9-1.0": r}, "n_truth_pairs": ..., "n_candidates": ...,
    "false_candidate_frac": fraction of emitted candidates whose true
    J < 0.3}."""
    from pyspark.sql import functions as F

    from .pipeline_ext.dedup import (
        lsh_candidate_pairs,
        minhash_signature,
        shingles_expr,
    )

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .orderBy("doc_id")
        .limit(n_docs)
        .select("doc_id", "text")
    )
    # perturbed twin: replace every 6th token deterministically —
    # a high-but-not-1.0 true Jaccard per (doc, twin) pair
    toks = F.split(F.trim(F.col("text")), r"\s+")
    perturbed = docs.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.array_join(
            F.transform(
                toks,
                lambda t, i: F.when(i % 6 == 0, F.concat(F.lit("zz"), t)).otherwise(t),
            ),
            " ",
        ).alias("text"),
    )
    corpus = docs.unionByName(perturbed)
    sh_rows = corpus.select(
        "doc_id", shingles_expr(F.col("text")).alias("sh")
    ).collect()
    sets = {r["doc_id"]: frozenset(r["sh"]) for r in sh_rows}
    ids = sorted(sets)
    truth: dict[tuple[int, int], float] = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            sa, sb = sets[a], sets[b]
            if not sa or not sb:
                continue
            inter = len(sa & sb)
            if inter == 0:
                continue
            truth[(a, b)] = inter / len(sa | sb)
    cands = {
        (min(r["id_a"], r["id_b"]), max(r["id_a"], r["id_b"]))
        for r in lsh_candidate_pairs(
            minhash_signature(corpus), bands=bands, rows_per_band=rows_per_band
        ).collect()
    }
    bands_def = (("0.5-0.7", 0.5, 0.7), ("0.7-0.9", 0.7, 0.9), ("0.9-1.0", 0.9, 1.01))
    recall_by_band = {}
    for name, lo, hi in bands_def:
        in_band = [p for p, j in truth.items() if lo <= j < hi]
        recall_by_band[name] = (
            sum(1 for p in in_band if p in cands) / len(in_band) if in_band else None
        )
    n_false = sum(1 for p in cands if truth.get(p, 0.0) < 0.3)
    return {
        "recall_by_band": recall_by_band,
        "n_truth_pairs": len(truth),
        "n_candidates": len(cands),
        "false_candidate_frac": (n_false / len(cands)) if cands else 0.0,
    }


def main() -> None:
    """CLI twin of the reference's `python src/eval/evaluate.py`
    (evaluate.py:205-242): run the sweep, print the grouped report."""
    import argparse
    import os

    from .session import get_spark

    ap = argparse.ArgumentParser(description="fused-vs-exact differential eval")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("--harmonics", type=int, nargs="+", default=[8, 64, 200])
    ap.add_argument("--epsilons", type=float, nargs="+", default=[0.01])
    ap.add_argument("--queries", type=int, default=10)
    ap.add_argument("--modalities", type=int, default=2)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument(
        "--export-dir",
        default=None,
        help="also write CSV (+ PNG if matplotlib, else ASCII chart) here",
    )
    args = ap.parse_args()

    spark = get_spark("fuserank-eval")
    spark.sparkContext.setLogLevel("ERROR")
    all_results: list[dict] = []
    # one embed+stats pass shared by every ε, every K, and the geo
    # metric — only the K-dependent encode re-runs inside the sweep
    base = prepare_eval_base(spark, args.sf_dir)
    for eps in args.epsilons:
        all_results.extend(
            evaluate_fused_vs_exact(
                spark, args.sf_dir, tuple(args.harmonics),
                n_queries=args.queries, n_modalities=args.modalities,
                k=args.k, interval_epsilon=eps, base=base,
            )
        )
    report(spark, all_results).show(truncate=False)
    fused_ivf_nprobe_sweep(spark, args.sf_dir, k=args.k).show(truncate=False)
    geo = evaluate_geo_rank_agreement(
        spark, args.sf_dir, num_harmonics=max(args.harmonics),
        n_queries=args.queries, k=args.k, base=base,
    )
    base[1].unpersist()
    print(
        "geo rank agreement vs exact haversine: "
        f"mean recall@{args.k} = {sum(r['recall'] for r in geo) / len(geo):.4f} "
        f"({len(geo)} seeded geo queries, K={max(args.harmonics)})"
    )
    lsh = evaluate_lsh_dedup_recall(spark, args.sf_dir)
    print(
        "minhash-LSH candidate recall vs exact shingle-Jaccard: "
        + ", ".join(
            f"J {band} → {r:.3f}" if r is not None else f"J {band} → n/a"
            for band, r in lsh["recall_by_band"].items()
        )
        + f"; false-candidate frac (true J<0.3) = {lsh['false_candidate_frac']:.3f}"
    )
    from pyspark.sql import functions as _F

    from .pipeline_ext.quantization import quantization_recall_report

    emb = spark.read.parquet(os.path.join(args.sf_dir, "embeddings.parquet"))
    qrows = emb.filter(_F.col("vec_id") < args.queries).orderBy("vec_id").collect()
    qr = quantization_recall_report(
        emb.select("vec_id", "embedding"),
        [(int(r["vec_id"]), [float(x) for x in r["embedding"]]) for r in qrows],
        dim=64, k=args.k,
    )
    print(
        "quantization-family recall@%d (refine_factor=%d): " % (args.k, qr["refine_factor"])
        + ", ".join(
            f"{fam} {qr[fam]:.3f}"
            for fam in ("pq_raw", "pq_refined", "sq8_raw", "sq8_refined", "bq_raw", "bq_refined")
        )
    )
    if args.export_dir:
        for p in export_report(spark, all_results, args.export_dir):
            print(f"wrote {p}")


if __name__ == "__main__":
    main()
