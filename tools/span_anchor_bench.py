"""Anchored vs exact ExactSubstr A/B: wall, SHUFFLE BYTES, and the
exactness differential in one run (VERDICT r7 #4 "Done" criteria).

The crawl→shards composition's cost center is dedup_spans' token-
granular gram exchange (99.97% of the r7 composition's shuffle bytes
came from curate_corpus's gram streams). ``strategy="anchor"`` claims
a ~(w+1)/2× exchange cut by shuffling only winnowing anchors; this
tool measures that claim on the scale_trend corpus (per-replica
suffixed tokens + planted dup clusters + shared boilerplate hot gram)
and prices the miss profile at the same time:

* one JSON line per strategy with wall seconds and shuffle read/write
  MB (Spark UI REST deltas, the crawl_pipeline_bench mechanics);
* one differential line: docs where anchored deleted MORE than exact
  (must be 0 — one-sided error), tokens exact deleted, tokens anchored
  missed, and the miss fraction.

Usage: python tools/span_anchor_bench.py [factor] [sf_dir] [window]
       (defaults: 100 → 500k rows, sf0.1, anchor_window=4)
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402


def main():
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    w = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .appName("span-anchor-bench")
        .config("spark.driver.memory", os.environ.get("FUSERANK_DRIVER_MEM", "48g"))
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4056")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from scale_trend import build_corpus
    from fuserank_spark.pipeline_ext.dedup import dedup_spans

    big, n = build_corpus(spark, sf_dir, factor)
    print(f"corpus: {n} rows", file=sys.stderr)

    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId

    def snap():
        data = json.load(
            urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages")
        )
        return {
            "w": sum(s.get("shuffleWriteBytes", 0) for s in data),
            "r": sum(s.get("shuffleReadBytes", 0) for s in data),
        }

    outs = {}
    last = snap()
    for name, kwargs in (
        ("exact_join", {"strategy": "join"}),
        ("anchor", {"strategy": "anchor", "anchor_window": w}),
    ):
        out = dedup_spans(big, **kwargs).select("doc_id", "n_tokens", "n_kept")
        t0 = time.time()
        # persist+count, not a bare noop write: the differential below
        # consumes each output a second time, and an unmaterialized
        # frame would re-run the whole dedup pipeline per action
        # (CLAUDE.md r6-3 — this tool paid that twice at 5M before)
        out = out.persist()
        out.count()
        wall = round(time.time() - t0, 1)
        cur = snap()
        print(json.dumps({
            "strategy": name, "n_rows": n, "anchor_window": w,
            "wall_sec": wall,
            "shuffle_write_mb": round((cur["w"] - last["w"]) / 1e6, 1),
            "shuffle_read_mb": round((cur["r"] - last["r"]) / 1e6, 1),
        }))
        last = cur
        outs[name] = out

    # exactness differential (one action): anchored must never delete
    # a token exact keeps; the miss fraction prices the trade
    ex = outs["exact_join"].select(
        "doc_id", F.col("n_tokens").alias("nt"), F.col("n_kept").alias("ke")
    )
    an = outs["anchor"].select("doc_id", F.col("n_kept").alias("ka"))
    d = (
        ex.join(an, "doc_id")
        .agg(
            F.sum(F.when(F.col("ka") < F.col("ke"), 1).otherwise(0)).alias("overdel"),
            F.sum(F.col("nt") - F.col("ke")).alias("exact_deleted"),
            F.sum(F.col("ka") - F.col("ke")).alias("missed"),
        )
        .first()
    )
    missed_frac = (
        float(d["missed"]) / float(d["exact_deleted"]) if d["exact_deleted"] else 0.0
    )
    print(json.dumps({
        "differential": "anchor_vs_exact",
        "docs_overdeleted": int(d["overdel"]),
        "tokens_exact_deleted": int(d["exact_deleted"]),
        "tokens_missed_by_anchor": int(d["missed"]),
        "missed_frac": round(missed_frac, 4),
    }))


if __name__ == "__main__":
    main()
