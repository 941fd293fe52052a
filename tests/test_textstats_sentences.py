"""Sentence segmentation (textstats.split_sentences). Frozen
registry — the oracle lives here: the sentinel-replacement +
literal-split pipeline re-derived verbatim in DuckDB (the RE2-safe
form; lookbehind does not exist there), compared row-for-row.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from fuserank_spark.pipeline_ext.textstats import split_sentences


def test_split_sentences_matches_duckdb(spark, duck):
    rows = [
        (1, "First sentence. Second one! Third?? Trailing tail without dot"),
        (2, "One sentence only."),
        (3, "Ellipsis... then more. done."),
        (4, "   leading space. and end   "),
        (5, ""),
        (6, None),
        (7, "No terminators at all just words"),
        (8, "a.b stays together. next"),  # no whitespace after '.' → no split
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    duck.register("sent_docs", pdf)
    try:
        sdf = spark.createDataFrame(pdf).select(
            "doc_id", F.col("text").cast("string").alias("text")
        )
        got = {
            (r["doc_id"], r["sent_idx"]): r["sentence"]
            for r in split_sentences(sdf).collect()
        }
        want = {
            (r[0], r[1]): r[2]
            for r in duck.execute(
                r"""
                WITH m AS (
                  SELECT doc_id,
                         regexp_replace(trim(text), '([.!?]+)\s+',
                                        '\1' || chr(31), 'g') AS mk
                  FROM sent_docs
                  WHERE text IS NOT NULL AND trim(text) <> ''
                ), sp AS (
                  SELECT doc_id, string_split(mk, chr(31)) AS ss FROM m
                ), s AS (
                  SELECT doc_id, ss[u.i] AS sentence,
                         row_number() OVER (PARTITION BY doc_id ORDER BY u.i) - 1 AS sent_idx
                  FROM sp, unnest(generate_series(1, len(ss))) AS u(i)
                  WHERE trim(ss[u.i]) <> ''
                )
                SELECT doc_id, sent_idx, sentence FROM s
                """
            ).fetchall()
        }
        assert got == want
        # semantics spot checks
        assert got[(1, 0)] == "First sentence."
        assert got[(1, 3)] == "Trailing tail without dot"
        assert got[(3, 0)] == "Ellipsis..."
        assert got[(8, 0)] == "a.b stays together."
        assert not any(k for k, _ in got if k in (5, 6))
    finally:
        duck.unregister("sent_docs")


def test_split_sentences_plan_is_shuffle_free(spark):
    df = spark.createDataFrame([(1, "a. b. c")], "doc_id long, text string")
    plan = split_sentences(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan
