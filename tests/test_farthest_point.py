"""A6 exact farthest-point (max_by) vs the numpy reference math."""

from __future__ import annotations

import numpy as np

from fuserank_spark import fourier
from fuserank_spark.encode import exact_farthest_point


def test_exact_farthest_matches_numpy(spark):
    pts = [(77.2, 28.6), (13.4, 52.5), (151.2, -33.9), (-58.4, -34.6), None]
    df = spark.createDataFrame(
        [(p,) for p in pts], "loc struct<lon: double, lat: double>"
    )
    q = (0.0, 51.5)  # ~London
    got = exact_farthest_point(df, "loc", q)

    arr = np.array([[np.nan, np.nan] if p is None else p for p in pts])
    d = fourier.haversine_km(arr, q)
    expect = pts[int(np.nanargmax(d))]
    assert got == expect  # Sydney is farthest from London here


def test_exact_farthest_all_null(spark):
    df = spark.createDataFrame([(None,)], "loc struct<lon: double, lat: double>")
    assert exact_farthest_point(df, "loc", (0.0, 0.0)) is None
