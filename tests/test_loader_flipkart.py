"""Flipkart loader on FIXTURES A2-shaped synthetic data (the real
CSV is a missing large blob in the reference snapshot)."""

from __future__ import annotations

import shutil
import tempfile

import pytest

from fuserank_spark import schema as S
from fuserank_spark.loaders import load_flipkart


@pytest.fixture()
def flipkart_csv(spark):
    d = tempfile.mkdtemp(prefix="fuserank_fk_")
    rows = []
    for i in range(60):
        specs = f'{{"key"=>"ram", "value"=>"{i}GB"}}'
        tree = f'["Electronics >> Phones >> Model{i % 5} >> Sub{i}"]'
        rows.append(
            (
                f"pid{i}", f"uid{i}", f"Phone {i}", tree,
                f"https://x/{i}", float(100 + i * 3), float(80 + i * 2),
                f"img{i}", None if i % 10 == 0 else f"desc {i}",
                "No rating" if i % 2 else "4 stars", "5 stars",
                None if i % 7 == 0 else f"brand{i % 6}", specs, "2016-01-01",
            )
        )
    df = spark.createDataFrame(
        rows,
        "pid string, uniq_id string, product_name string, product_category_tree string, "
        "product_url string, retail_price double, discounted_price double, image string, "
        "description string, product_rating string, overall_rating string, brand string, "
        "product_specifications string, crawl_timestamp string",
    )
    df.coalesce(1).write.option("header", "true").option("escape", '"').csv(f"{d}/csv")
    yield f"{d}/csv"
    shutil.rmtree(d, ignore_errors=True)


def test_flipkart_loader(spark, flipkart_csv):
    ds = load_flipkart(spark, flipkart_csv, fit_transforms=True)
    assert ds.df.count() == 60
    cols = set(ds.df.columns)
    assert {"product_category_1", "product_category_2", "product_category_3"} <= cols
    assert "product_url" not in cols and "pid" not in cols
    row = ds.df.filter(ds.df["product_name"] == "Phone 3").collect()[0]
    assert row["product_category_1"] == "Electronics"
    assert row["product_category_3"] == "Model3"
    assert row["product_specifications"] == "ram: 3GB;"
    assert row["brand"] == "brand3"
    # fillna applied (P1)
    nulls = ds.df.filter(ds.df["description"].isNull()).count()
    assert nulls == 0
    aux = ds.schema.aux_encoding_schema
    assert aux["brand"] == S.SPARSE
    assert aux["retail_price"] == S.DENSE
    # log transform view applies
    tdf = ds.transformed_df
    v = tdf.filter(tdf["product_name"] == "Phone 0").collect()[0]["retail_price"]
    import math

    assert v == pytest.approx(math.log2(101.0), rel=1e-9)
