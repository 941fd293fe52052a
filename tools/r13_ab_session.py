"""One A/B session: run the named registry entries in ONE spark
session (warm once, median-of-3, noop sink — the bench's serve-class
methodology) against the repo tree given as argv[1], and print one
JSON line {entry: median_sec}.

Used by the r13 paired-A/B loop: alternate sessions over the baseline
worktree and the working tree so host bands hit both arms equally.

Usage: python tools/r13_ab_session.py <tree> <entries_csv> [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

tree = os.path.abspath(sys.argv[1])
entries = sys.argv[2].split(",")
sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
sys.path.insert(0, tree)
os.chdir(tree)


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def med3(fn):
    fn()
    runs = []
    for _ in range(3):
        t0 = time.time()
        fn()
        runs.append(time.time() - t0)
    return sorted(runs)[1]


def main():
    from fuserank_spark.session import get_spark
    import __spark_entry__ as em

    spark = get_spark("r13-ab")
    spark.sparkContext.setLogLevel("ERROR")
    # bench-style warm: scan + tiny window/join so the first entry
    # doesn't absorb one-time codegen
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    li.count()
    qs = em.queries()
    out = {}
    for name in entries:
        fn = qs[name]
        spark.sparkContext.setJobDescription(name)
        out[name] = round(med3(lambda: noop(fn(spark, sf_dir))), 3)
        spark.sparkContext.setJobDescription(None)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
