"""Y1-Y5 distribution transforms + P12-P14 schema inference +
prep-op coverage (SURVEY §2.2, §2.13)."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from fuserank_spark import prep
from fuserank_spark import schema as S
from fuserank_spark.transforms import (
    FittedTransform,
    best_transform,
    fit_transform,
    transformed_view,
)


# ----------------------------------------------------------------- transforms
@pytest.mark.parametrize(
    "name,x,expected",
    [
        ("log", 7.0, math.log2(8.0)),
        ("sqrt", 9.0, 3.0),
        ("inverse", 4.0, 1.0 / (4.0 + 1e-10)),
        ("identity", 5.5, 5.5),
    ],
)
def test_transform_expr_matches_numpy(spark, name, x, expected):
    ft = FittedTransform(name)
    got = spark.range(1).select(ft.expr(F.lit(x)).alias("v")).collect()[0]["v"]
    assert got == pytest.approx(expected, rel=1e-12)
    assert float(ft.apply_np(x)) == pytest.approx(expected, rel=1e-12)


def test_yeojohnson_expr_matches_scipy(spark):
    scipy = pytest.importorskip("scipy")
    rng = np.random.RandomState(7)
    sample = rng.lognormal(0, 1, 500)
    ft = fit_transform("yeojohnson", sample)
    expect = scipy.stats.yeojohnson(sample, ft.lmbda)
    df = spark.createDataFrame([(float(v),) for v in sample[:50]], "x double")
    got = np.array([r["v"] for r in df.select(ft.expr("x").alias("v")).collect()])
    assert np.allclose(got, expect[:50], rtol=1e-9)
    # driver twin agrees (query compiler transforms filter bounds with it)
    assert np.allclose(ft.apply_np(sample[:50]), expect[:50], rtol=1e-9)


def test_log_rejects_negative():
    with pytest.raises(ValueError):
        fit_transform("log", np.array([1.0, -2.0]))


def test_best_transform_normalizes_lognormal(spark):
    """Y5: for lognormal data the KS-selected transform must beat
    identity (reference picks LogTransform for such columns,
    src/load_flipkart.py:47)."""
    rng = np.random.RandomState(42)
    vals = rng.lognormal(3, 1, 4000)
    df = spark.createDataFrame([(float(v),) for v in vals], "x double")
    ft = best_transform(df, "x", sample_limit=4000)
    assert ft is not None and ft.name in ("log", "yeojohnson", "sqrt")


def test_transformed_view_overlays(spark):
    df = spark.createDataFrame([(4.0, "a")], "x double, s string")
    out = transformed_view(df, {"x": FittedTransform("sqrt")})
    row = out.collect()[0]
    assert row["x"] == 2.0 and row["s"] == "a"


# ------------------------------------------------------------------ inference
def test_infer_aux_schema(spark):
    df = spark.createDataFrame(
        [
            (0, "t", "cat_a", "y", 1.5, (10.0, 20.0)),
            (1, "t", "cat_b", "n", 2.5, (11.0, 21.0)),
            (2, "t", "cat_c", "y", 3.5, None),
        ],
        "row_id long, name string, cat string, flag string, price double, "
        "loc struct<lon: double, lat: double>",
    )
    kinds = S.infer_aux_schema(df, text_columns={"name"})
    assert kinds == {
        "cat": S.SPARSE,
        "flag": S.BINARY,
        "price": S.DENSE,
        "loc": S.GEO,
    }


def test_infer_skips_constant_and_text(spark):
    df = spark.createDataFrame(
        [(0, "x", "const"), (1, "y", "const")], "row_id long, name string, c string"
    )
    kinds = S.infer_aux_schema(df, text_columns={"name"})
    assert kinds == {}


def test_infer_rejects_map_type_strict(spark):
    df = spark.createDataFrame(
        [(0, "t", {"a": "b"})], "row_id long, name string, m map<string,string>"
    )
    with pytest.raises(ValueError, match="Unsupported modality dtype"):
        S.infer_aux_schema(df, text_columns={"name"}, strict=True)
    assert S.infer_aux_schema(df, text_columns={"name"}, strict=False) == {}


def test_with_row_id_deterministic(spark):
    df = spark.createDataFrame([("b",), ("a",), ("c",)], "s string")
    out = S.with_row_id(df, order_by=["s"]).orderBy("row_id").collect()
    assert [(r["row_id"], r["s"]) for r in out] == [(0, "a"), (1, "b"), (2, "c")]


# ----------------------------------------------------------------------- prep
def test_prep_ops_pipeline(spark):
    df = spark.createDataFrame(
        [
            # flipkart raw specs: alternating "key"=>"k", "value"=>"v" tokens
            (0, ' Electronics >> Phones >> Android ', '{"key"=>"ram", "value"=>"8GB", "key"=>"rom", "value"=>"128GB"}', None, 10.0, 20.0),
            (1, 'Home >> Decor >> Wall', '{"size"=>"XL"}', "desc", 0.0, 30.0),
        ],
        "row_id long, tree string, specs string, d string, lat double, lon double",
    )
    out = prep.fill_na(df, {"d": "n/a"})
    out = prep.split_category_tree(out, "tree")
    out = prep.reformat_specs(out, "specs")
    out = prep.zip_geo(out, "lon", "lat")
    out = prep.filter_rows(out, F.col("lat") != 0)
    rows = out.collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["d"] == "n/a"
    assert (r["category_1"], r["category_2"], r["category_3"]) == (
        "Electronics",
        "Phones",
        "Android",
    )
    assert r["specs"] == "ram: 8GB; rom: 128GB;"
    assert r["location"]["lon"] == 20.0 and r["location"]["lat"] == 10.0


def test_drop_rows_by_id(spark):
    df = spark.createDataFrame([(i,) for i in range(5)], "row_id long")
    out = prep.drop_rows_by_id(df, [1, 3])
    assert sorted(r["row_id"] for r in out.collect()) == [0, 2, 4]
