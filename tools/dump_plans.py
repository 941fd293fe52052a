"""Dump .explain("formatted") for every declared query into a directory.

Usage: python tools/dump_plans.py <out_dir> [sf_dir] [name1,name2,...]

Writes <out_dir>/<name>.txt per entry. Plans are captured against the
same vanilla-ish session shape the bench uses (get_spark), at the given
SF dir (default sf0.1 — the bench SF, so AQE initial plans match what
the bench executes).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    out_dir = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    os.makedirs(out_dir, exist_ok=True)

    from fuserank_spark.session import get_spark
    import __spark_entry__ as entry_mod

    spark = get_spark("fuserank-plandump")
    spark.sparkContext.setLogLevel("ERROR")

    for name, fn in entry_mod.queries().items():
        if only is not None and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001 — record the failure in place
            plan = f"EXPLAIN FAILED: {type(e).__name__}: {e}"
        with open(os.path.join(out_dir, f"{name}.txt"), "w") as f:
            f.write(plan)
        print(f"wrote {name}")


if __name__ == "__main__":
    main()
