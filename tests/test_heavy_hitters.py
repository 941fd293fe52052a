"""heavy_hitters (curation.py): two-pass Misra–Gries sketch + exact
recount. The contract is EXACTNESS — output == groupBy.count >=
min_count whenever min_count > N/(budget+1) — so the oracles are (a)
Spark's own exact plan and (b) an independent DuckDB groupBy, both
row-for-row including counts, across budgets down to the guarantee
boundary and adversarial skew shapes.
"""

from __future__ import annotations

import random

import pandas as pd
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE

from fuserank_spark.pipeline_ext.curation import frequent_ngrams, heavy_hitters


def _zipf_rows(n: int, seed: int) -> list[tuple[int, str]]:
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        r = rng.random()
        if r < 0.30:
            item = f"hot{rng.randrange(5)}"
        elif r < 0.55:
            item = f"warm{rng.randrange(40)}"
        else:
            item = f"cold{rng.randrange(n)}"
        rows.append((i, item))
    # a null sprinkle: must be ignored
    rows.extend((n + j, None) for j in range(25))
    return rows


@pytest.fixture(scope="module")
def zipf(spark, duck):
    pdf = pd.DataFrame(_zipf_rows(6000, seed=7), columns=["rid", "item"])
    duck.register("hh_items", pdf)
    sdf = spark.createDataFrame(pdf).repartition(16, "rid").cache()
    sdf.count()
    yield sdf
    duck.unregister("hh_items")


@pytest.mark.parametrize("budget", [64, 256, 4096])
@pytest.mark.parametrize("min_count", [50, 200])
def test_heavy_hitters_exact_vs_both_oracles(spark, duck, zipf, budget, min_count):
    n_total = zipf.filter(F.col("item").isNotNull()).count()
    if min_count <= n_total / (budget + 1):
        pytest.skip("outside the guarantee region (covered by the raise test)")
    got = {
        (r["item"], r["count"])
        for r in heavy_hitters(zipf, "item", min_count=min_count, budget=budget).collect()
    }
    exact = {
        (r["item"], r["c"])
        for r in zipf.filter(F.col("item").isNotNull())
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= min_count)
        .collect()
    }
    duck_exact = set(
        duck.execute(
            f"""
            SELECT item, count(*) FROM hh_items WHERE item IS NOT NULL
            GROUP BY item HAVING count(*) >= {min_count}
            """
        ).fetchall()
    )
    assert got == exact == duck_exact
    assert got, "fixture must actually contain heavy hitters"


def test_heavy_hitters_all_duplicates_one_partition_shape(spark):
    # mass-skew: one item dominates; tiny budget still exact because
    # the hot item can never be fully evicted
    rows = [(i, "mono") for i in range(3000)] + [(9000 + i, f"u{i}") for i in range(500)]
    sdf = spark.createDataFrame(pd.DataFrame(rows, columns=["rid", "item"])).repartition(8)
    got = heavy_hitters(sdf, "item", min_count=1000, budget=8).collect()
    assert [(r["item"], r["count"]) for r in got] == [("mono", 3000)]


def test_heavy_hitters_budget_too_small_raises(spark, zipf):
    with pytest.raises(ValueError, match="raise budget"):
        heavy_hitters(zipf, "item", min_count=2, budget=16)
    with pytest.raises(ValueError, match="min_count"):
        heavy_hitters(zipf, "item", min_count=0, budget=16)


def test_frequent_ngrams_budget_path_identical(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select("doc_id", "text")
    exact = frequent_ngrams(docs, n=3, min_doc_count=5)
    sketched = frequent_ngrams(docs, n=3, min_doc_count=5, budget=1 << 15)
    as_set = lambda d: {(r["gram_hash"], r["n_docs"]) for r in d.collect()}  # noqa: E731
    e = as_set(exact)
    assert e and as_set(sketched) == e
    # metadata contract preserved on the sketch path
    assert sketched.schema["gram_hash"].metadata["ngram_n"] == 3


def test_dataset_card_hand_computed(spark):
    """dataset_card on a crafted corpus: every number hand-derivable."""
    import pandas as pd

    from fuserank_spark.pipeline_ext.profile import dataset_card

    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog"),   # exact dup
        (2, "a be to of and in that it is was"),
        (3, None),
    ]
    sdf = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    card = dataset_card(sdf, exact=True)
    assert card["n_docs"] == 4
    assert card["null_text_frac"] == 0.25
    assert card["total_tokens"] == 9 + 9 + 10  # NULL -> 0 tokens
    assert card["max_tokens"] == 10
    # duplicate_frac over docs WITH content: 3 non-null, 2 distinct
    # (NULL text is null_text_frac's business, never a duplicate)
    assert card["distinct_exact"] is True
    assert card["duplicate_frac"] == round(1 - 2 / 3, 6)
    assert card["lang_mix"]  # at least one predicted language bucket


def test_dataset_card_runs_on_documents(spark):
    from fuserank_spark.pipeline_ext.profile import dataset_card

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select(
        "doc_id", "text"
    ).limit(300)
    card = dataset_card(docs)
    assert card["n_docs"] == 300 and card["total_tokens"] > 0
    assert card["null_text_frac"] == 0.0
    assert 0.0 <= card["duplicate_frac"] < 1.0
    assert sum(card["lang_mix"].values()) <= 300
