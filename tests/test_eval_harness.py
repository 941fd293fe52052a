"""§5.4 harness reproduction: fused recall vs exact oracle across the
num_harmonics knob, over all four modality kinds (incl. geo+binary
end-to-end)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fuserank_spark.eval_harness import evaluate_fused_vs_exact, report

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def results(spark):
    return evaluate_fused_vs_exact(
        spark, SF_SMOKE, num_harmonics_list=(8, 64), n_queries=6, n_modalities=2
    )


def test_recall_floor(spark, results):
    rep = {r["num_harmonics"]: r["mean_recall"] for r in report(spark, results).collect()}
    # reference regime: harmonics is a quality knob; at the top K the
    # fused arm recovers most of the exact arm
    assert rep[64] >= 0.5, rep
    assert rep[64] >= rep[8] - 0.15, rep  # no collapse as K grows


def test_all_queries_returned_k(results):
    assert len(results) == 12
    assert all(0.0 <= r["recall"] <= 1.0 for r in results)


def test_export_report_artifacts(spark, results, tmp_path):
    """CSV always written; PNG (matplotlib) or ASCII chart fallback."""
    from fuserank_spark.eval_harness import export_report

    paths = export_report(spark, results, str(tmp_path))
    assert any(p.endswith("recall_sweep.csv") for p in paths)
    assert any(p.endswith((".png", ".txt")) for p in paths)
    csv = next(p for p in paths if p.endswith(".csv"))
    lines = open(csv).read().strip().splitlines()
    assert lines[0].startswith("num_harmonics")
    assert len(lines) >= 2


def test_geo_rank_agreement(spark):
    """Geo quality metric (no hard-filter oracle — rank agreement vs
    exact haversine, VERDICT r5 #5). The geo product encoding's dot
    score is monotone in great-circle distance (cosine on the unit
    sphere), so a geo-only fused ranking should near-perfectly agree
    with the exact ordering."""
    from fuserank_spark.eval_harness import evaluate_geo_rank_agreement

    res = evaluate_geo_rank_agreement(spark, SF_SMOKE, num_harmonics=8, n_queries=4, k=10)
    assert len(res) == 4
    mean = sum(r["recall"] for r in res) / len(res)
    assert mean >= 0.9, res
    assert all(0.0 <= r["r_precision"] <= 1.0 for r in res)


def test_geo_boundary_mirror_tie(spark):
    """VERDICT r6 #7: the sf0.1 geo 0.9833 residual, pinned. The
    integer-grid eval corpus produces MIRROR-POINT pairs — same
    latitude, longitudes mirrored across the query meridian (the r6
    culprit: query (-60,33), docs (-55,38) vs (-65,38)) — that are
    exactly equidistant in real arithmetic. The raw haversine COLUMN
    values differ by fold-order ulps (sin((Δlon)/2)² is even, float
    evaluation of ±Δ is not), so the exact arm ordered the pair by
    noise while the fused dot tied and fell to row_id: a k-boundary
    coin flip. Fix = round-before-rank on both arms (score@9, km@6),
    making the tie true and the row_id tie-break shared."""
    from pyspark.sql import Row

    from fuserank_spark.eval_harness import haversine_km_expr

    qlon, qlat = -60.0, 33.0
    df = spark.createDataFrame(
        [
            Row(row_id=4002, location=Row(lon=-55.0, lat=38.0)),
            Row(row_id=1112, location=Row(lon=-65.0, lat=38.0)),
        ]
    )
    got = {
        r["row_id"]: r["km"]
        for r in df.select(
            "row_id", haversine_km_expr(F.col("location"), qlon, qlat).alias("km")
        ).collect()
    }
    # the mechanism: raw values differ (ulp noise on an exact mirror)…
    assert got[4002] != got[1112], "grid changed — pick another mirror pair"
    # …by strictly less than the rounding grain, so round-before-rank
    # turns the pair into a true tie that row_id breaks identically
    # on both arms
    assert abs(got[4002] - got[1112]) < 1e-6
    assert round(got[4002], 6) == round(got[1112], 6)
    # and the raw ordering is the WRONG-way coin flip the fix removes:
    # 4002 sorted ahead of 1112 despite the larger row_id
    assert got[4002] < got[1112]


def test_geo_rank_agreement_collect_is_bounded(spark):
    """VERDICT r6 wrong #2: the query-point pool must be a BOUNDED
    deterministic sample, never a whole-column collect. A corpus above
    the cap samples (orderBy-limit) instead of collecting — provable
    because a cap smaller than the corpus still produces the full
    result set, deterministically, with query points drawn only from
    the capped id-ordered prefix."""
    from fuserank_spark.eval_harness import evaluate_geo_rank_agreement

    # the sf0.001 eval corpus has far more than 5 located rows, so
    # max_sample_rows=5 exercises the above-cap branch
    res = evaluate_geo_rank_agreement(
        spark, SF_SMOKE, num_harmonics=8, n_queries=3, k=5, max_sample_rows=5
    )
    res2 = evaluate_geo_rank_agreement(
        spark, SF_SMOKE, num_harmonics=8, n_queries=3, k=5, max_sample_rows=5
    )
    assert len(res) == 3
    assert res == res2  # capped pool is deterministic, not a sample-on-read
    assert all(0.0 <= r["recall"] <= 1.0 for r in res)


def test_lsh_dedup_recall_eval(spark):
    """The banding-recall metric behaves like LSH theory says it
    must: recall is monotone in the true-similarity band, the
    planted ≥0.9-J twins are essentially always found, and the
    bookkeeping is consistent."""
    from fuserank_spark.eval_harness import evaluate_lsh_dedup_recall
    from tests.conftest import SF_SMOKE

    r = evaluate_lsh_dedup_recall(spark, SF_SMOKE, n_docs=60)
    by = r["recall_by_band"]
    # the planted twins populate the top bands: near-exact pairs are
    # essentially always found, and the 0.7-0.9 band can't beat them
    # (the 0.5-0.7 band is too thin at this SF to assert on)
    assert by["0.9-1.0"] is not None and by["0.9-1.0"] >= 0.8
    if by["0.7-0.9"] is not None:
        assert by["0.7-0.9"] <= by["0.9-1.0"]
    assert r["n_candidates"] >= 1 and r["n_truth_pairs"] > 0
    assert 0.0 <= r["false_candidate_frac"] <= 1.0
