"""Cross-document line-level dedup (dedup.dedup_lines) — the C4 /
RefinedWeb boilerplate-line removal step.

Not in the frozen 67-entry driver registry (adding entries would push
verified rows out of the driver's first-50 window), so the oracle
evidence lives HERE: a full DuckDB re-derivation of split →
normalize → portable-hash → first-occurrence winner → rebuild,
compared row-for-row (the semantic_dedup / boilerplate precedent).
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from fuserank_spark.pipeline_ext.dedup import dedup_lines

from .conftest import SF_SMOKE

HEADER = "Subscribe to our newsletter today"
FOOTER = "all rights   reserved"  # inner-whitespace variant collapses


@pytest.fixture(scope="module")
def line_docs(spark, duck):
    """Line-structured docs derived from the sf0.001 documents table:
    tokens re-chunked into 6-token lines, a shared header on every
    doc, a footer (with whitespace-variant normalization bait) on
    even doc_ids, a blank separator line, and one NULL-text row.
    The SAME pandas frame feeds both engines."""
    rows = (
        duck.execute("SELECT doc_id, text FROM documents ORDER BY doc_id LIMIT 120")
        .fetchall()
    )
    out = []
    for doc_id, text in rows:
        toks = text.split()
        chunks = [" ".join(toks[i : i + 6]) for i in range(0, len(toks), 6)]
        lines = [HEADER, ""] + chunks
        if doc_id % 2 == 0:
            lines.append(FOOTER if doc_id % 4 == 0 else "all rights reserved")
        out.append((doc_id, "\n".join(lines)))
    out.append((100000, None))
    pdf = pd.DataFrame(out, columns=["doc_id", "text"])
    duck.register("line_docs", pdf)
    sdf = spark.createDataFrame(pdf).select(
        "doc_id", F.col("text").cast("string").alias("text")
    )
    sdf.cache().count()
    yield sdf
    duck.unregister("line_docs")


_ORACLE = r"""
WITH b AS (
  SELECT doc_id, string_split(text, chr(10)) AS ls
  FROM line_docs WHERE text IS NOT NULL
), ex AS (
  SELECT doc_id, pos, ls[pos] AS line
  FROM b, unnest(generate_series(1, len(ls))) AS u(pos)
), h AS (
  SELECT doc_id, pos, line,
         length(regexp_replace(lower(trim(line)), '\s+', ' ', 'g')) AS nl,
         CAST(concat('0x', substring(md5(
             regexp_replace(lower(trim(line)), '\s+', ' ', 'g')), 1, 8)) AS BIGINT) AS lh
  FROM ex
), keep AS (
  SELECT doc_id, pos, line FROM (
    SELECT doc_id, pos, line,
           row_number() OVER (PARTITION BY lh ORDER BY doc_id, pos) AS rn
    FROM h WHERE nl >= {min_chars}) WHERE rn = 1
  UNION ALL
  SELECT doc_id, pos, line FROM h WHERE nl < {min_chars}
), reb AS (
  SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text_kept,
         count(*) AS n_kept
  FROM keep GROUP BY doc_id
)
SELECT d.doc_id,
       CASE WHEN d.text IS NULL THEN NULL
            ELSE coalesce(r.text_kept, '') END AS text,
       CASE WHEN d.text IS NULL THEN 0
            ELSE len(string_split(d.text, chr(10))) END AS n_lines,
       coalesce(r.n_kept, 0) AS n_kept
FROM line_docs d LEFT JOIN reb r USING (doc_id)
ORDER BY d.doc_id
"""


def _rows(df):
    return {
        r["doc_id"]: (r["text"], r["n_lines"], r["n_kept"])
        for r in df.select("doc_id", "text", "n_lines", "n_kept").collect()
    }


def test_dedup_lines_matches_duckdb_rederivation(line_docs, duck):
    """The whole op — literal-delimiter split, whitespace-collapse
    normalization, portable-hash grouping, (key, pos) first-occurrence
    winner, in-order rebuild — re-derived in DuckDB; rebuilt text and
    both counters must match row-for-row."""
    got = _rows(dedup_lines(line_docs))
    want = {
        r[0]: (r[1], r[2], r[3])
        for r in duck.execute(_ORACLE.format(min_chars=1)).fetchall()
    }
    assert got == want
    # the header actually got deduplicated somewhere
    n_header = sum(1 for t, _, _ in got.values() if t and HEADER in t)
    assert n_header == 1


def test_dedup_lines_min_line_chars_exempts_short_lines(line_docs, duck):
    """min_line_chars=40 exempts the 33-char header (and everything
    shorter) from dedup — only longer lines compete."""
    got = _rows(dedup_lines(line_docs, min_line_chars=40))
    want = {
        r[0]: (r[1], r[2], r[3])
        for r in duck.execute(_ORACLE.format(min_chars=40)).fetchall()
    }
    assert got == want
    n_header = sum(1 for t, _, _ in got.values() if t and HEADER in t)
    assert n_header == 120  # every doc keeps it


def test_dedup_lines_first_occurrence_semantics(spark):
    """The winner is the minimum (key, pos): doc 1 keeps the line it
    saw first; doc 2's copy goes; normalization folds case and inner
    whitespace; blank lines always survive."""
    df = spark.createDataFrame(
        [
            (1, "alpha beta\n\nshared line here"),
            (2, "Shared   LINE here\n\ngamma delta"),
            (3, "shared line here"),
        ],
        "doc_id long, text string",
    )
    got = _rows(dedup_lines(df))
    assert got[1] == ("alpha beta\n\nshared line here", 3, 3)
    assert got[2] == ("\ngamma delta", 3, 2)
    assert got[3] == ("", 1, 0)


def test_dedup_lines_null_and_empty_passthrough(spark):
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "x y")], "doc_id long, text string"
    )
    got = _rows(dedup_lines(df))
    assert got[1] == (None, 0, 0)
    assert got[2] == ("", 1, 1)  # empty line is structure — kept
    assert got[3] == ("x y", 1, 1)


def test_dedup_lines_preserves_other_columns(line_docs):
    out = dedup_lines(line_docs.withColumn("src", F.lit("web")))
    assert set(out.columns) == {"doc_id", "text", "src", "n_lines", "n_kept"}
    assert out.filter(F.col("src") != "web").count() == 0


def test_dedup_lines_plan_has_no_quadratic_ops(line_docs):
    plan = (
        dedup_lines(line_docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
