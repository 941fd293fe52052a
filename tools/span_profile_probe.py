"""Duplicated-span length profile on the trend corpus — the measured
demonstration that the anchor-mode miss regime (missed_frac 0.184
@500k → 0.432 @5M, SCALING.md r8) is a property of the duplicated-span
LENGTH distribution, not of corpus size (VERDICT r8 finding #1).

For each factor tier this builds the scale_trend corpus (the same
corpus span_anchor_bench A/Bs on), runs ``dedup.span_length_profile``,
and prints one JSON line per tier:

* the head of the histogram (the serve-relevant short-span band),
* duplicated-token mass below the w=2/4/8 guarantee thresholds
  (L+w−1 = 9/11/15) — the guarantee-gap read,
* ``recommended_anchor_window`` at three miss budgets.

Usage: python tools/span_profile_probe.py [factors] [sf_dir] [L]
           [--sample-fraction f]
       (defaults: 100,1000 → 500k and 5M rows, sf0.1, L=8)
``--sample-fraction`` bounds the 5M tier's gram groupBy; the profile
is then a within-sample lower bound on dup mass (documented in the
helper), which preserves the length-distribution SHAPE the w choice
reads.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    opts = {a.split("=")[0]: (a.split("=", 1)[1] if "=" in a else True)
            for a in sys.argv[1:] if a.startswith("--")}
    factors = [int(x) for x in (argv[0] if len(argv) > 0 else "100,1000").split(",")]
    sf_dir = argv[1] if len(argv) > 1 else "/root/testdata/sf0.1"
    L = int(argv[2]) if len(argv) > 2 else 8
    sample = opts.get("--sample-fraction")
    sample = float(sample) if sample is not None else None

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .appName("span-profile-probe")
        .config("spark.driver.memory", os.environ.get("FUSERANK_DRIVER_MEM", "48g"))
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from scale_trend import build_corpus
    from fuserank_spark.pipeline_ext.dedup import (
        recommended_anchor_window,
        span_length_profile,
    )

    for factor in factors:
        big, n = build_corpus(spark, sf_dir, factor)
        t0 = time.time()
        prof = span_length_profile(
            big, min_span_tokens=L, sample_fraction=sample
        ).persist()
        rows = [
            (int(r["span_tokens"]), int(r["n_spans"]),
             int(r["dup_token_mass"]), float(r["cum_mass_frac"]))
            for r in prof.collect()
        ]
        wall = round(time.time() - t0, 1)

        def mass_below(thr):
            g = 0.0
            for s, _n, _m, cum in rows:
                if s < thr:
                    g = cum
                else:
                    break
            return round(g, 4)

        recs = {
            f"budget_{b}": recommended_anchor_window(
                prof, min_span_tokens=L, max_miss_frac=b
            )
            for b in (0.02, 0.1, 0.3)
        }
        print(json.dumps({
            "factor": factor,
            "n_rows": n,
            "L": L,
            "sample_fraction": sample,
            "profile_wall_sec": wall,
            "total_dup_token_mass": sum(m for _s, _n, m, _c in rows),
            "n_distinct_lengths": len(rows),
            "hist_head": rows[:8],
            "gap_mass_frac_below_w2_thr9": mass_below(L + 1),
            "gap_mass_frac_below_w4_thr11": mass_below(L + 3),
            "gap_mass_frac_below_w8_thr15": mass_below(L + 7),
            "recommendations": recs,
        }))
        prof.unpersist()
        big.unpersist()


if __name__ == "__main__":
    main()
