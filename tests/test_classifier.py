"""Trained quality classifier (pipeline_ext.classifier) — learned
GPT-3/CCNet-style corpus filter. No SQL oracle form exists for a
fitted LogisticRegression (the registry is frozen anyway), so the
evidence is property-based: held-out separation, scoring determinism,
an exact Python twin for the deterministic Pareto gate, save/load
round-trip, and a shuffle-free scoring plan.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from fuserank_spark.pipeline_ext.classifier import (
    pareto_quality_filter,
    quality_scores,
    train_quality_classifier,
)
from tests.conftest import SF_SMOKE


# a fixed 500-word fake vocabulary: train and held-out gibberish draw
# from the SAME token distribution (hashed-BOW features only generalize
# through shared tokens — per-doc-unique tokens would leave held-out
# docs with nothing but the intercept)
_VOCAB = [hashlib.md5(f"v{v}".encode()).hexdigest()[:6] for v in range(500)]


def _gibberish(i: int, n_tokens: int = 40) -> str:
    return " ".join(
        _VOCAB[int(hashlib.md5(f"{i}:{j}".encode()).hexdigest()[:8], 16) % 500]
        for j in range(n_tokens)
    )


@pytest.fixture(scope="module")
def qc(spark):
    """Model trained on 80 real docs vs 80 gibberish docs; 20/20
    held out for the separation check."""
    docs = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .orderBy("doc_id")
        .limit(100)
        .select("doc_id", "text")
        .cache()
    )
    gib = spark.createDataFrame(
        [(10_000 + i, _gibberish(i)) for i in range(100)], "doc_id long, text string"
    ).cache()
    pos_tr, pos_ho = docs.filter(F.col("doc_id") % 5 != 0), docs.filter(
        F.col("doc_id") % 5 == 0
    )
    neg_tr, neg_ho = gib.filter(F.col("doc_id") % 5 != 0), gib.filter(
        F.col("doc_id") % 5 == 0
    )
    model = train_quality_classifier(pos_tr, neg_tr, n_features=1 << 15)
    return model, pos_ho, neg_ho


def test_classifier_separates_held_out(qc):
    model, pos_ho, neg_ho = qc
    ps = [r["quality_score"] for r in quality_scores(pos_ho, model).collect()]
    ns = [r["quality_score"] for r in quality_scores(neg_ho, model).collect()]
    assert ps and ns
    acc = (sum(1 for p in ps if p > 0.5) + sum(1 for q in ns if q <= 0.5)) / (
        len(ps) + len(ns)
    )
    assert acc >= 0.9
    assert sum(ps) / len(ps) > 0.8 > 0.2 > sum(ns) / len(ns)


def test_scoring_deterministic_and_null_handling(qc, spark):
    model, pos_ho, _ = qc
    extra = spark.createDataFrame(
        [(1_000_001, None), (1_000_002, ""), (1_000_003, "   ")],
        "doc_id long, text string",
    )
    df = pos_ho.unionByName(extra)
    a = {r["doc_id"]: r["quality_score"] for r in quality_scores(df, model).collect()}
    b = {r["doc_id"]: r["quality_score"] for r in quality_scores(df, model).collect()}
    assert a == b
    assert a[1_000_001] is None and a[1_000_002] is None and a[1_000_003] is None


def test_pareto_filter_matches_python_twin(qc, spark):
    """The stochastic-acceptance gate re-derived exactly in Python
    from the collected scores: same md5-derived uniform, same Lomax
    inverse-CDF, same keep rule."""
    model, pos_ho, neg_ho = qc
    scored = quality_scores(pos_ho.unionByName(neg_ho), model).cache()
    alpha = 9.0
    got = {r["doc_id"] for r in pareto_quality_filter(scored, alpha=alpha).collect()}

    def h32(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    want = set()
    for r in scored.collect():
        if r["quality_score"] is None:
            continue
        u = (h32(str(r["doc_id"])) + 1.0) / float(1 << 32)
        draw = u ** (-1.0 / alpha) - 1.0
        if 1.0 - r["quality_score"] < draw:
            want.add(r["doc_id"])
    assert got == want
    # real docs overwhelmingly survive; gibberish mostly dies
    pos_keep = sum(1 for d in got if d < 10_000)
    neg_keep = sum(1 for d in got if d >= 10_000)
    assert pos_keep >= 15 and neg_keep <= 10


def test_model_save_load_round_trip(qc, tmp_path):
    from pyspark.ml import PipelineModel

    model, pos_ho, _ = qc
    path = str(tmp_path / "qc_model")
    model.write().overwrite().save(path)
    loaded = PipelineModel.load(path)
    a = {r["doc_id"]: r["quality_score"] for r in quality_scores(pos_ho, model).collect()}
    b = {r["doc_id"]: r["quality_score"] for r in quality_scores(pos_ho, loaded).collect()}
    assert a == b


def test_scoring_plan_is_shuffle_free(qc, spark):
    model, pos_ho, _ = qc
    plan = (
        quality_scores(pos_ho, model)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "Join" not in plan


def test_curate_corpus_optional_classifier_stage(qc, spark):
    """curate_corpus(quality_model=..., pareto_alpha=...) drops
    gibberish that passes the heuristic gate while keeping real docs;
    paired-arg validation mirrors the perplexity stage."""
    from fuserank_spark.pipeline_ext.curation import curate_corpus

    model, pos_ho, neg_ho = qc
    corpus = pos_ho.unionByName(neg_ho)
    out = curate_corpus(
        corpus, min_quality=0.0, quality_model=model, pareto_alpha=9.0
    ).cache()
    kept = {r["doc_id"] for r in out.select("doc_id").collect()}
    pos_keep = sum(1 for d in kept if d < 10_000)
    neg_keep = sum(1 for d in kept if d >= 10_000)
    assert pos_keep >= 15 and neg_keep <= 5
    assert "clf_score" in out.columns and "split" in out.columns
    with pytest.raises(ValueError):
        curate_corpus(corpus, quality_model=model)  # alpha missing
