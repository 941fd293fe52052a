"""§5.4 harness reproduction: fused recall vs exact oracle across the
num_harmonics knob, over all four modality kinds (incl. geo+binary
end-to-end)."""

from __future__ import annotations

import pytest

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
