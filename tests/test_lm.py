"""Hashed n-gram LM perplexity scoring (lm.ngram_lm_train /
ngram_lm_perplexity) — the CCNet-style corpus-quality signal.

Not in the frozen 67-entry driver registry, so the oracle evidence
lives HERE: a full DuckDB re-derivation of train (gram counts,
context marginals, vocabulary) + score (smoothed log-prob terms
quantized to scaled BIGINTs, exact integer sums, rounded edges),
compared row-for-row (the semantic_dedup / line-dedup precedent).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from fuserank_spark.pipeline_ext.lm import ngram_lm_perplexity, ngram_lm_train

from .conftest import SF_SMOKE

_TOKS = (
    "CASE WHEN text IS NULL OR trim(text) = '' THEN CAST([] AS VARCHAR[]) "
    "ELSE string_split_regex(trim(lower(text)), '\\s+') END"
)


def _h(expr: str) -> str:
    return f"CAST(concat('0x', substring(md5({expr}), 1, 8)) AS BIGINT)"


def _oracle(n: int, train_pred: str) -> str:
    """Full DuckDB re-derivation: train on the docs matching
    ``train_pred``, score every doc. Same hashes, same quantized
    ln terms, same integer sums, same rounded edges."""
    if n == 1:
        ctx = _h("''")
    else:
        gram = "concat_ws(' ', " + ", ".join(f"tk[i+{j}]" for j in range(n - 1)) + ")"
        ctx = _h(gram)
    tok = _h(f"tk[i+{n - 1}]")
    return f"""
WITH t AS (SELECT doc_id, {_TOKS} AS tk FROM documents),
tr AS (SELECT tk FROM t WHERE {train_pred}),
g AS (SELECT {ctx} AS ctx_hash, {tok} AS tok_hash
      FROM tr, unnest(generate_series(1, len(tk)-{n - 1})) AS u(i)),
m AS (SELECT ctx_hash, tok_hash, count(*) AS cnt FROM g GROUP BY 1, 2),
ctx AS (SELECT ctx_hash, sum(cnt) AS ctx_cnt FROM m GROUP BY 1),
v AS (SELECT count(DISTINCT {_h("tok")}) AS vs
      FROM (SELECT unnest(tk) AS tok FROM tr)),
sg AS (SELECT doc_id, {ctx} AS ctx_hash, {tok} AS tok_hash
       FROM t, unnest(generate_series(1, len(tk)-{n - 1})) AS u(i)),
terms AS (
  SELECT doc_id,
         CAST(floor(ln((coalesce(cnt, 0) + 1.0)
                       / (coalesce(ctx_cnt, 0) + 1.0 * (vs + 1))) * 1e9 + 0.5)
              AS BIGINT) AS term
  FROM sg LEFT JOIN m USING (ctx_hash, tok_hash)
          LEFT JOIN ctx USING (ctx_hash)
          CROSS JOIN v),
agg AS (SELECT doc_id, sum(term) AS lp, count(*) AS ns FROM terms GROUP BY 1)
SELECT t.doc_id,
       coalesce(agg.ns, 0) AS n_scored,
       round(CAST(agg.lp AS DOUBLE) / 1e9, 6) AS logprob,
       CASE WHEN coalesce(agg.ns, 0) > 0
            THEN round(-CAST(agg.lp AS DOUBLE) / (CAST(agg.ns AS DOUBLE) * 1e9), 6)
       END AS cross_entropy
FROM t LEFT JOIN agg USING (doc_id)
ORDER BY t.doc_id
"""


@pytest.fixture(scope="module")
def docs(spark):
    d = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select("doc_id", "text")
    d.cache().count()
    return d


def _got(out):
    return {
        r["doc_id"]: (r["n_scored"], r["logprob"], r["cross_entropy"], r["perplexity"])
        for r in out.collect()
    }


def _check_against_oracle(got, duck, n, train_pred):
    want = {r[0]: (r[1], r[2], r[3]) for r in duck.execute(_oracle(n, train_pred)).fetchall()}
    assert set(got) == set(want)
    for d in got:
        ns, lp, ce, ppl = got[d]
        assert ns == want[d][0], d
        assert lp == pytest.approx(want[d][1], abs=1e-12), d
        assert ce == pytest.approx(want[d][2], abs=1e-12), d
        if ce is None:
            assert ppl is None
        else:
            # perplexity = round(exp(rounded ce), 6) on identical inputs
            assert ppl == pytest.approx(
                round(math.exp(ce), 6), abs=1e-6
            ), d


def test_bigram_perplexity_matches_duckdb_rederivation(docs, duck):
    """Train a bigram LM on the even doc_ids, score ALL docs (odd
    docs exercise the unseen-gram and unseen-context smoothing
    branches) — n_scored, logprob, cross_entropy match the full
    DuckDB re-derivation row-for-row."""
    lm = ngram_lm_train(docs.filter(F.col("doc_id") % 2 == 0), n=2)
    out = ngram_lm_perplexity(docs, lm).select(
        "doc_id", "n_scored", "logprob", "cross_entropy", "perplexity"
    )
    _check_against_oracle(_got(out), duck, 2, "doc_id % 2 = 0")


def test_unigram_perplexity_matches_duckdb_rederivation(docs, duck):
    """n=1: one shared empty-string context marginal (= total token
    count), same differential check."""
    lm = ngram_lm_train(docs.filter(F.col("doc_id") % 2 == 0), n=1)
    assert lm.contexts.count() == 1
    out = ngram_lm_perplexity(docs, lm).select(
        "doc_id", "n_scored", "logprob", "cross_entropy", "perplexity"
    )
    _check_against_oracle(_got(out), duck, 1, "doc_id % 2 = 0")


def test_perplexity_separates_fluent_from_shuffled(spark):
    """The whole point of the filter: text made of grams the LM saw
    scores lower perplexity than text made of unseen tokens."""
    train = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog") for i in range(20)],
        "doc_id long, text string",
    )
    lm = ngram_lm_train(train, n=2)
    score = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "zxq wvu tsr qpo")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["perplexity"] for r in ngram_lm_perplexity(score, lm).collect()}
    assert got[1] < got[2]


def test_short_and_null_docs_score_null(spark):
    train = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    lm = ngram_lm_train(train, n=3)
    score = spark.createDataFrame(
        [(1, "a b"), (2, None), (3, "")], "doc_id long, text string"
    )
    for r in ngram_lm_perplexity(score, lm).collect():
        assert r["n_scored"] == 0
        assert r["cross_entropy"] is None and r["perplexity"] is None


def test_model_rows_hint_matches_auto(docs):
    lm = ngram_lm_train(docs.limit(50), n=2)
    auto = _got(
        ngram_lm_perplexity(docs.limit(80), lm).select(
            "doc_id", "n_scored", "logprob", "cross_entropy", "perplexity"
        )
    )
    hinted = _got(
        ngram_lm_perplexity(docs.limit(80), lm, model_rows=lm.ngrams.count()).select(
            "doc_id", "n_scored", "logprob", "cross_entropy", "perplexity"
        )
    )
    assert auto == hinted


def test_small_model_broadcasts_and_no_quadratic_ops(docs):
    lm = ngram_lm_train(docs.limit(50), n=2)
    plan = (
        ngram_lm_perplexity(docs, lm, model_rows=100)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_param_validation(spark):
    d = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="n must be"):
        ngram_lm_train(d, n=0)
    lm = ngram_lm_train(d, n=2)
    with pytest.raises(ValueError, match="alpha must be"):
        ngram_lm_perplexity(d, lm, alpha=0.0)
