"""DSIR importance weighting + deterministic Gumbel-top-k resampling
(lm.dsir_train / dsir_weights / dsir_sample; Xie et al. 2023,
arXiv:2302.03169).

Not in the frozen 67-entry driver registry, so the oracle evidence
lives HERE: a full DuckDB re-derivation of feature bucketing →
smoothed per-bucket log ratios (including the unseen-bucket default,
re-derived from the SQL side's own totals) → per-doc integer-sum
weights; the Gumbel sampler is pinned by an exact Python hash twin.
"""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from fuserank_spark.pipeline_ext.lm import dsir_sample, dsir_train, dsir_weights

from .conftest import SF_SMOKE

B = 64  # small bucket count → collisions + both-seen/one-seen branches

_TOKS = (
    "CASE WHEN text IS NULL OR trim(text) = '' THEN CAST([] AS VARCHAR[]) "
    "ELSE string_split_regex(trim(lower(text)), '\\s+') END"
)


def _h(expr: str) -> str:
    return f"CAST(concat('0x', substring(md5({expr}), 1, 8)) AS BIGINT)"


_ORACLE = f"""
WITH t AS (SELECT doc_id, {_TOKS} AS tk FROM documents),
feats AS (
  SELECT doc_id, {_h("tk[i]")} % {B} AS bucket
  FROM t, unnest(generate_series(1, len(tk))) AS u(i)
  UNION ALL
  SELECT doc_id, {_h("concat_ws(' ', tk[i], tk[i+1])")} % {B} AS bucket
  FROM t, unnest(generate_series(1, len(tk)-1)) AS u(i)
),
tc AS (SELECT bucket, count(*) AS c FROM feats WHERE doc_id % 3 = 0 GROUP BY 1),
rc AS (SELECT bucket, count(*) AS c FROM feats WHERE doc_id % 3 <> 0 GROUP BY 1),
tot AS (SELECT (SELECT sum(c) FROM tc) AS tt, (SELECT sum(c) FROM rc) AS tr),
lr AS (
  SELECT coalesce(tc.bucket, rc.bucket) AS bucket,
         CAST(floor(ln((coalesce(tc.c,0)+1.0)/(tt+1.0*{B}))*1e9+0.5) AS BIGINT)
       - CAST(floor(ln((coalesce(rc.c,0)+1.0)/(tr+1.0*{B}))*1e9+0.5) AS BIGINT) AS lrs
  FROM tc FULL OUTER JOIN rc ON tc.bucket = rc.bucket CROSS JOIN tot),
dflt AS (
  SELECT CAST(floor(ln(1.0/(tt+1.0*{B}))*1e9+0.5) AS BIGINT)
       - CAST(floor(ln(1.0/(tr+1.0*{B}))*1e9+0.5) AS BIGINT) AS d FROM tot),
sc AS (
  SELECT doc_id, sum(coalesce(lr.lrs, dflt.d)) AS lw, count(*) AS nf
  FROM feats LEFT JOIN lr USING (bucket) CROSS JOIN dflt
  WHERE doc_id % 3 <> 0 GROUP BY doc_id)
SELECT t.doc_id, coalesce(sc.nf, 0) AS n_feats,
       round(CAST(sc.lw AS DOUBLE)/1e9, 6) AS log_weight
FROM t LEFT JOIN sc USING (doc_id)
WHERE t.doc_id % 3 <> 0 ORDER BY t.doc_id
"""


@pytest.fixture(scope="module")
def docs(spark):
    d = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select("doc_id", "text")
    d.cache().count()
    return d


def test_dsir_weights_match_duckdb_rederivation(docs, duck):
    """Train on target = doc_id%3==0, score the raw rest — feature
    bucketing, smoothed per-bucket log ratios, the unseen-bucket
    default (re-derived from the SQL side's OWN totals), and the
    per-doc integer-sum weights all match row-for-row."""
    target = docs.filter(F.col("doc_id") % 3 == 0)
    raw = docs.filter(F.col("doc_id") % 3 != 0)
    model = dsir_train(target, raw, ns=(1, 2), n_buckets=B)
    got = {
        r["doc_id"]: (r["n_feats"], r["log_weight"])
        for r in dsir_weights(raw, model).select("doc_id", "n_feats", "log_weight").collect()
    }
    want = {r[0]: (r[1], r[2]) for r in duck.execute(_ORACLE).fetchall()}
    assert set(got) == set(want)
    for d in got:
        assert got[d][0] == want[d][0], d
        assert got[d][1] == pytest.approx(want[d][1], abs=1e-12), d


def test_dsir_direction_and_default_branch(spark):
    """Synthetic check of the signal itself: a doc made of target
    vocabulary outweighs a doc of raw vocabulary, and a doc of tokens
    unseen in EITHER corpus lands on the default (neutral-ish) ratio
    between them. Exact Python twin for the default doc."""
    target = spark.createDataFrame(
        [(i, "science method results analysis") for i in range(10)],
        "doc_id long, text string",
    )
    raw = spark.createDataFrame(
        [(100 + i, "buy cheap pills now") for i in range(10)],
        "doc_id long, text string",
    )
    model = dsir_train(target, raw, ns=(1, 2), n_buckets=1 << 20)
    score = spark.createDataFrame(
        [(1, "science method analysis"), (2, "buy cheap pills"), (3, "zzqx wvvu")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["log_weight"] for r in dsir_weights(score, model).collect()}
    assert got[1] > got[3] > got[2]

    # doc 3: 2 unigrams + 1 bigram, all (with 2^20 buckets over an
    # 8-type vocab) unseen → exactly 3 × default
    def h32(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    seen = set()
    for txt, which in [("science method results analysis", "t"), ("buy cheap pills now", "r")]:
        toks = txt.split()
        for g in toks + [" ".join(p) for p in zip(toks, toks[1:])]:
            seen.add(h32(g) % (1 << 20))
    d3 = ["zzqx", "wvvu", "zzqx wvvu"]
    assert all(h32(g) % (1 << 20) not in seen for g in d3)
    assert got[3] == pytest.approx(round(3 * model.default_lr_scaled / 1e9, 6), abs=1e-12)


def test_dsir_featureless_docs_score_null(spark):
    target = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    model = dsir_train(target, target, ns=(1,), n_buckets=B)
    score = spark.createDataFrame([(1, None), (2, "")], "doc_id long, text string")
    for r in dsir_weights(score, model).collect():
        assert r["n_feats"] == 0 and r["log_weight"] is None


def test_dsir_sample_matches_python_gumbel_twin(docs):
    """dsir_sample is deterministic Gumbel-top-k: re-derive the keyed
    scores in Python from the same salted portable hash and compare
    the selected id set; a different salt redraws."""
    target = docs.filter(F.col("doc_id") % 3 == 0)
    raw = docs.filter(F.col("doc_id") % 3 != 0)
    model = dsir_train(target, raw, ns=(1, 2), n_buckets=B)
    scored = dsir_weights(raw, model).select("doc_id", "log_weight")
    got = {r["doc_id"] for r in dsir_sample(scored, 40, salt="s1").collect()}

    def key(doc_id, lw):
        h = int(hashlib.md5(f"s1:{doc_id}".encode()).hexdigest()[:8], 16)
        u = (h + 0.5) / 2**32
        g = math.floor(-math.log(-math.log(u)) * 1e9 + 0.5) / 1e9
        return lw + g

    rows = scored.collect()
    want = {
        r["doc_id"]
        for r in sorted(rows, key=lambda r: (-key(r["doc_id"], r["log_weight"]), r["doc_id"]))[:40]
    }
    assert got == want
    # determinism and redraw
    again = {r["doc_id"] for r in dsir_sample(scored, 40, salt="s1").collect()}
    other = {r["doc_id"] for r in dsir_sample(scored, 40, salt="s2").collect()}
    assert again == got
    assert other != got
    assert len(other) == 40


def test_dsir_validation(spark):
    d = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    empty = spark.createDataFrame([(2, "")], "doc_id long, text string")
    with pytest.raises(ValueError, match="ns must be"):
        dsir_train(d, d, ns=())
    with pytest.raises(ValueError, match="distinct"):
        dsir_train(d, d, ns=(1, 1))
    with pytest.raises(ValueError, match="non-empty feature"):
        dsir_train(empty, d, ns=(1,))
    model = dsir_train(d, d, ns=(1,), n_buckets=B)
    with pytest.raises(ValueError, match="n must be"):
        dsir_sample(dsir_weights(d, model), 0)


def test_dsir_plan_broadcasts_model_no_quadratic(docs):
    target = docs.filter(F.col("doc_id") % 3 == 0)
    raw = docs.filter(F.col("doc_id") % 3 != 0)
    model = dsir_train(target, raw, ns=(1, 2), n_buckets=B)
    plan = (
        dsir_weights(raw, model)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
