"""Vocabulary induction + OOV coverage (textstats.build_vocab /
vocab_coverage). Registry is frozen at 67 entries, so the oracle
lives here: both ops re-derived end-to-end in DuckDB over the same
documents slice — vocabulary rows (counts, doc-freq, deterministic
tie-broken rank) and per-doc OOV rates must match row-for-row.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from fuserank_spark.pipeline_ext.textstats import build_vocab, vocab_coverage
from tests.conftest import SF_SMOKE

_TOKS = (
    "CASE WHEN text IS NULL OR trim(text) = '' THEN CAST([] AS VARCHAR[]) "
    "ELSE regexp_split_to_array(trim(text), '\\s+') END"
)
# the sf0.001 synthetic docs have 31 distinct tokens — 20 forces the
# limit to actually cut and leaves a real OOV tail for coverage
TOP_V = 20


def _spark_docs(spark):
    return (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .filter(F.col("doc_id") < 150)
        .select("doc_id", "text")
    )


def test_build_vocab_matches_duckdb(spark, duck):
    got = [
        (r["token"], r["tf"], r["doc_freq"], r["rank"])
        for r in build_vocab(_spark_docs(spark), top_v=TOP_V).orderBy("rank").collect()
    ]
    want = duck.execute(
        f"""
        WITH ex AS (
          SELECT doc_id, unnest({_TOKS}) AS token
          FROM documents WHERE doc_id < 150
        ), c AS (
          SELECT token, count(*) AS tf, count(DISTINCT doc_id) AS doc_freq
          FROM ex GROUP BY token
        )
        SELECT token, tf, doc_freq,
               row_number() OVER (ORDER BY tf DESC, token) AS rank
        FROM c ORDER BY tf DESC, token LIMIT {TOP_V}
        """
    ).fetchall()
    assert got == [tuple(r) for r in want]


def test_vocab_coverage_matches_duckdb(spark, duck):
    docs = _spark_docs(spark)
    vocab = build_vocab(docs, top_v=TOP_V)
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_oov"], r["oov_frac"])
        for r in vocab_coverage(docs, vocab).collect()
    }
    want = {
        r[0]: (r[1], r[2], r[3])
        for r in duck.execute(
            f"""
            WITH ex0 AS (
              SELECT doc_id, unnest({_TOKS}) AS token
              FROM documents WHERE doc_id < 150
            ), c AS (
              SELECT token, count(*) AS tf FROM ex0 GROUP BY token
            ), top AS (
              SELECT token FROM c ORDER BY tf DESC, token LIMIT {TOP_V}
            ), toks AS (
              SELECT doc_id, {_TOKS} AS tk FROM documents WHERE doc_id < 150
            ), hit AS (
              SELECT doc_id, count(*) AS n_in
              FROM (SELECT doc_id, unnest(tk) AS token FROM toks)
              WHERE token IN (SELECT token FROM top) GROUP BY doc_id
            )
            SELECT t.doc_id, len(tk) AS n_tokens,
                   len(tk) - coalesce(h.n_in, 0) AS n_oov,
                   CASE WHEN len(tk) > 0
                        THEN (len(tk) - coalesce(h.n_in, 0)) / len(tk)
                        ELSE 0.0 END AS oov_frac
            FROM toks t LEFT JOIN hit h USING (doc_id)
            """
        ).fetchall()
    }
    assert got == want
    # the vocab was induced from this very corpus, so coverage is high
    # but the tail forces real OOV somewhere
    fracs = [v[2] for v in got.values()]
    assert any(f > 0 for f in fracs) and sum(fracs) / len(fracs) < 0.5


def test_vocab_coverage_null_and_empty_docs(spark):
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, None), (3, ""), (4, "zz yy zz")],
        "doc_id long, text string",
    )
    vocab = spark.createDataFrame([("a",), ("zz",)], "token string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_oov"], r["oov_frac"])
        for r in vocab_coverage(docs, vocab).collect()
    }
    assert got[1] == (3, 2, 2 / 3)
    assert got[2] == (0, 0, 0.0)
    assert got[3] == (0, 0, 0.0)
    assert got[4] == (3, 1, 1 / 3)


def test_vocab_coverage_plan_broadcasts_vocab(spark):
    docs = _spark_docs(spark)
    vocab = build_vocab(docs, top_v=50)
    plan = (
        vocab_coverage(docs, vocab)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
