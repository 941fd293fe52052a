"""Paired A/B for the scale-trend's mild per-row degraders
(phash_pairs 1.22×, contamination_fraction 1.18× across the 500k→5M
decade): SCALING.md r7 attributes them to `spark.sql.shuffle.partitions`
held FIXED at 32 while the input grew 10× — this measures that claim
in ONE session (same corpus, interleaved A/B/A/B, runtime conf flip)
so host variance can't fake the answer.

Usage: python tools/shuffle_partitions_ab.py [factor=1000] [sf_dir]
Prints one JSON line with per-(op, partitions, rep) walls.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main():
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    os.environ.setdefault("FUSERANK_DRIVER_MEM", "48g")
    from fuserank_spark.session import get_spark
    from tools.scale_trend import build_corpus

    spark = get_spark("shuffle-parts-ab")
    spark.sparkContext.setLogLevel("ERROR")
    big, n = build_corpus(spark, sf_dir, factor)
    print(f"corpus {n} rows", file=sys.stderr)

    from fuserank_spark.pipeline_ext.curation import contamination_fraction
    from fuserank_spark.pipeline_ext.multimodal import attach_payload, phash_hamming_pairs

    test_slice = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .filter(F.col("doc_id") % 17 == 0)
        .select("doc_id", "text")
    )

    out = {"n_rows": n, "runs": []}
    for rep in range(2):
        for parts in (32, 128):
            spark.conf.set("spark.sql.shuffle.partitions", str(parts))
            t0 = time.time()
            n_pairs = phash_hamming_pairs(attach_payload(big)).count()
            out["runs"].append(
                {"op": "phash_pairs", "parts": parts, "rep": rep,
                 "wall": round(time.time() - t0, 1), "out": n_pairs}
            )
            print(json.dumps(out["runs"][-1]), file=sys.stderr)
            t0 = time.time()
            contamination_fraction(big, test_slice).write.format("noop").mode(
                "overwrite"
            ).save()
            out["runs"].append(
                {"op": "contamination", "parts": parts, "rep": rep,
                 "wall": round(time.time() - t0, 1)}
            )
            print(json.dumps(out["runs"][-1]), file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
