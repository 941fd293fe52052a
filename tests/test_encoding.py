"""Encoding-semantics unit layer (SURVEY §5.3, FIXTURES A4): golden
properties of the FuseRank vector math, plus Spark-expression vs
numpy equivalence."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from fuserank_spark import fourier
from fuserank_spark import schema as S
from fuserank_spark.encode import (
    binary_pm1,
    compute_stats,
    dense_product_expr,
    dense_product_udf,
    geo_product_block,
    null_indicator,
    sparse_onehot,
)


# ------------------------------------------------------------- numpy layer
@pytest.mark.parametrize("k", [1, 8, 200])
def test_dense_dims(k):
    block = fourier.dense_product_block(np.array([0.3, np.nan]), 0.0, 1.0, k)
    assert block.shape == (2, 2 * k + 5)  # src/encode.py:163


def test_dense_block_structure():
    block = fourier.dense_product_block(np.array([0.5, np.nan]), 0.0, 1.0, 4)
    # shift dims are constant 1 (src/encode.py:94,96)
    assert block[0, 2] == 1.0 and block[0, -2] == 1.0
    # null row: fourier zeros, null indicator −1 (src/encode.py:363-369,422)
    assert block[1, 0] == 0.0 and block[1, 1] == 0.0 and block[1, -1] == -1.0
    assert block[0, -1] == 0.0


@pytest.mark.parametrize("lo,hi", [(-0.5, 0.2), (0.1, 0.6), (-0.9, -0.2)])
def test_interval_dot(lo, hi):
    """dot(in)≈+1, dot(out)≈−1 (src/encode.py:329-334) at K=200."""
    K = 200
    vec = fourier.interval_encoding(lo, hi, K)
    for point, expect in [((lo + hi) / 2, 1.0), (min(lo, hi) - 0.3 if lo > -0.6 else hi + 0.3, -1.0)]:
        feats = np.append(fourier.fourier_series(point, K), 1.0)  # + shift dim
        got = float(np.dot(feats, vec))
        assert got == pytest.approx(expect, abs=0.1), (point, got)


def test_interval_inside_beats_outside():
    K = 200
    vec = fourier.interval_encoding(-0.2, 0.4, K)

    def score(x):
        return float(np.dot(np.append(fourier.fourier_series(x, K), 1.0), vec))

    assert min(score(0.0), score(0.3), score(-0.1)) > max(score(0.7), score(-0.6), score(0.95))


def test_centroid_monotone():
    vec = fourier.centroid_encoding(0.25)

    def score(x):
        return float(np.dot(np.append(fourier.fourier_series(x, 1, freq=math.pi / 2), 1.0), vec))

    xs = [0.25, 0.1, -0.2, -0.6, -1.0]
    scores = [score(x) for x in xs]
    assert scores == sorted(scores, reverse=True)
    assert scores[0] == pytest.approx(1.0, abs=1e-9)
    assert score(-1.0) == pytest.approx(-1.0, abs=1e-9)


def test_geo_encoding_bounds():
    q = (13.4, 52.5)  # Berlin
    far = (151.2, -33.9)  # Sydney
    vec = fourier.geo_encoding(q, far)
    assert vec.shape == (4,)

    def score(p):
        return float(np.dot(np.append(fourier.geo_to_cartesian(p), 1.0), vec))

    assert score(q) == pytest.approx(1.0, abs=1e-9)
    assert score(far) == pytest.approx(-1.0, abs=1e-9)
    assert score((2.35, 48.85)) > score((139.7, 35.7))  # Paris closer than Tokyo


def test_haversine_known_pairs():
    # Berlin↔Paris ≈ 878 km, Berlin↔Sydney ≈ 16100 km (±0.5% sphere error)
    d = fourier.haversine_km(
        np.array([[2.35, 48.85], [151.21, -33.87], [np.nan, 1.0]]), (13.41, 52.52)
    )
    assert d[0] == pytest.approx(878, rel=0.01)
    assert d[1] == pytest.approx(16100, rel=0.01)
    assert np.isnan(d[2])


# ------------------------------------------------------------- spark layer
def _one_col_df(spark, values, dtype="double", name="x"):
    return spark.createDataFrame([(v,) for v in values], f"{name} {dtype}")


def test_spark_onehot_matches_pandas(spark):
    df = _one_col_df(spark, ["b", "a", None, "c", "a"], "string")
    vocab = ["a", "b", "c"]
    rows = df.select(sparse_onehot(F.col("x"), vocab).alias("v")).collect()
    got = [r["v"] for r in rows]
    # pd.get_dummies: sorted vocab one-hot, NaN row all-zeros (src/encode.py:71)
    assert got[0] == [0.0, 1.0, 0.0]
    assert got[1] == [1.0, 0.0, 0.0]
    assert got[2] == [0.0, 0.0, 0.0]


def test_spark_binary_pm1(spark):
    df = _one_col_df(spark, ["yes", "no", None], "string")
    rows = df.select(binary_pm1(F.col("x"), ["no", "yes"]).alias("v")).collect()
    assert [r["v"] for r in rows] == [[1.0], [-1.0], [0.0]]


def test_spark_null_indicator(spark):
    df = _one_col_df(spark, [1.0, None, float("nan")])
    rows = df.select(null_indicator(F.col("x")).alias("v")).collect()
    assert [r["v"] for r in rows] == [0.0, -1.0, -1.0]


def test_spark_geo_block(spark):
    df = spark.createDataFrame(
        [((13.4, 52.5),), (None,)], "x struct<lon: double, lat: double>"
    )
    rows = df.select(geo_product_block(F.col("x")).alias("v")).collect()
    v0 = np.array(rows[0]["v"])
    expect = np.append(fourier.geo_to_cartesian((13.4, 52.5)), [1.0, 0.0])
    assert np.allclose(v0, expect)
    assert rows[1]["v"] == [0.0, 0.0, 0.0, 1.0, -1.0]


@pytest.mark.parametrize("use_udf", [False, True])
def test_spark_dense_block_matches_numpy(spark, use_udf):
    """The Column-expression path and the Arrow pandas-UDF path both
    reproduce the shared numpy block exactly."""
    vals = [1.0, 3.5, 10.0, None]
    df = _one_col_df(spark, vals)
    K, mn, mx = 8, 1.0, 10.0
    if use_udf:
        col = dense_product_udf(mn, mx, K)(F.col("x"))
    else:
        col = dense_product_expr(F.col("x"), mn, mx, K)
    got = np.array([r["v"] for r in df.select(col.alias("v")).collect()])
    expect = fourier.dense_product_block(
        np.array([v if v is not None else np.nan for v in vals]), mn, mx, K
    )
    assert got.shape == expect.shape == (4, 2 * K + 5)
    assert np.allclose(got, expect, atol=1e-12)


def test_compute_stats(spark):
    df = spark.createDataFrame(
        [(1.0, "a", "y"), (5.0, "b", "n"), (3.0, "a", None), (None, None, "y")],
        "d double, s string, b string",
    )
    stats = compute_stats(df, {"d": S.DENSE, "s": S.SPARSE, "b": S.BINARY})
    assert stats.n_rows == 4
    assert stats.columns["d"].min == 1.0 and stats.columns["d"].max == 5.0
    assert stats.columns["s"].vocab == ["a", "b"]
    assert stats.columns["b"].values == ["n", "y"]


def test_encoder_meta_roundtrip_bit_identical(spark, tmp_path):
    """save/load of the frozen encoder must reproduce ELEMENT-
    IDENTICAL vectors and an identical query compile — the restart
    contract behind persisted indexes and streaming maintenance."""
    from fuserank_spark import schema as S
    from fuserank_spark.embed import DeterministicStubEmbedder, embed_corpus
    from fuserank_spark.encode import (
        compute_stats,
        encode_products,
        load_encoder_meta,
        record_text_dim,
        save_encoder_meta,
    )
    from fuserank_spark.query import compile_query

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .limit(60)
        .select("doc_id", "text", "lang", "n_chars")
    )
    aux = {"lang": S.SPARSE, "n_chars": S.DENSE}
    emb = embed_corpus(docs, {"text": 1.0}, dim=16)
    stats = compute_stats(emb, aux)
    enc1, layout = encode_products(emb, aux, stats, num_harmonics=8)
    record_text_dim(layout, 16)

    meta = str(tmp_path / "enc" / "meta.json")
    save_encoder_meta(meta, stats, layout, num_harmonics=8, extra={"emb_dim": 16})
    stats2, layout2, knobs = load_encoder_meta(meta)
    assert knobs == {"num_harmonics": 8, "emb_dim": 16}
    assert layout2.segments == layout.segments

    enc2, _ = encode_products(emb, aux, stats2, num_harmonics=knobs["num_harmonics"])
    v1 = {r["doc_id"]: r["vector"] for r in enc1.select("doc_id", "vector").collect()}
    v2 = {r["doc_id"]: r["vector"] for r in enc2.select("doc_id", "vector").collect()}
    assert v1 == v2

    q1 = compile_query(
        "roundtrip probe", {"lang": ((["en"], False), 2.0), "n_chars": (None, 1.0)},
        aux, stats, layout,
        text_embedder=DeterministicStubEmbedder(16), num_harmonics=8,
    )
    q2 = compile_query(
        "roundtrip probe", {"lang": ((["en"], False), 2.0), "n_chars": (None, 1.0)},
        aux, stats2, layout2,
        text_embedder=DeterministicStubEmbedder(16), num_harmonics=8,
    )
    assert [float(x) for x in q1.vector] == [float(x) for x in q2.vector]


def test_encoder_meta_geo_and_binary_roundtrip(tmp_path):
    """geo_sample tuples and binary values survive the JSON
    round-trip with exact float identity."""
    from fuserank_spark.encode import (
        ColumnStats,
        CorpusStats,
        VectorLayout,
        load_encoder_meta,
        save_encoder_meta,
    )

    stats = CorpusStats(n_rows=7)
    stats.columns["loc"] = ColumnStats(
        kind="geolocation", geo_sample=[(77.2090001, 28.6139), (-0.1278, 51.5074)]
    )
    stats.columns["flag"] = ColumnStats(kind="binary", values=["No", "Yes"])
    layout = VectorLayout(segments=[("__text__", 16), ("loc", 5), ("flag", 1)])
    p = str(tmp_path / "m.json")
    save_encoder_meta(p, stats, layout, num_harmonics=4)
    s2, l2, knobs = load_encoder_meta(p)
    assert s2.columns["loc"].geo_sample == [(77.2090001, 28.6139), (-0.1278, 51.5074)]
    assert s2.columns["flag"].values == ["No", "Yes"]
    assert l2.segments == layout.segments and l2.dim == 22
    assert s2.n_rows == 7 and knobs["num_harmonics"] == 4


def test_compute_stats_rejects_high_cardinality_sparse(spark):
    """A misdeclared high-cardinality SPARSE column must fail with
    the column name, not build an unbounded vocab (the check rides
    the one stats aggregate — no extra scan)."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from fuserank_spark import schema as S
    from fuserank_spark.encode import compute_stats

    df = spark.range(5000).select(
        F.concat(F.lit("id-"), F.col("id")).alias("doc_key"),
        (F.col("id") % 3).cast("string").alias("cat"),
    )
    with _pytest.raises(ValueError, match="doc_key.*distinct"):
        compute_stats(df, {"doc_key": S.SPARSE}, max_vocab=1000)
    # a sane column under the cap still works
    st = compute_stats(df, {"cat": S.SPARSE}, max_vocab=1000)
    assert st.columns["cat"].vocab == ["0", "1", "2"]
