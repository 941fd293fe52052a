"""Property-based invariants (hypothesis) for the encoding math —
§5.5 plus dot-product bound properties of the fused encodings."""

from __future__ import annotations

import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from fuserank_spark import fourier

finite = st.floats(min_value=-1.0, max_value=1.0, allow_nan=False)


@given(x=finite, k=st.integers(min_value=1, max_value=64))
@settings(max_examples=60, deadline=None)
def test_fourier_norm_bound(x, k):
    """Damped Fourier features are bounded: |pair_k| ≤ σ_k ≤ 1."""
    v = fourier.fourier_series(x, k)
    assert v.shape == (2 * k,)
    assert np.all(np.abs(v) <= 1.0 + 1e-12)


@given(x=st.floats(allow_nan=True, allow_infinity=False, width=64))
@settings(max_examples=40, deadline=None)
def test_fourier_nan_to_zero(x):
    v = fourier.fourier_series(x, 8)
    if math.isnan(x):
        assert np.all(v == 0.0)
    else:
        assert not np.any(np.isnan(v))


@given(
    lo=st.floats(min_value=-0.95, max_value=0.4, allow_nan=False),
    width=st.floats(min_value=0.1, max_value=0.5, allow_nan=False),
)
@settings(max_examples=25, deadline=None)
def test_interval_midpoint_is_positive(lo, width):
    """The interval encoding scores its midpoint ≈ +1 by construction
    (probe-point normalization) — for any interval."""
    hi = lo + width
    vec = fourier.interval_encoding(lo, hi, 64)
    mid = np.append(fourier.fourier_series((lo + hi) / 2, 64), 1.0)
    assert float(mid @ vec) > 0.5


@given(v=st.floats(min_value=-0.99, max_value=0.99, allow_nan=False))
@settings(max_examples=40, deadline=None)
def test_centroid_self_score_is_one(v):
    vec = fourier.centroid_encoding(v)
    feats = np.append(fourier.fourier_series(v, 1, freq=math.pi / 2), 1.0)
    assert float(feats @ vec) == np.float64(1.0) or abs(float(feats @ vec) - 1.0) < 1e-9


@given(
    lon=st.floats(min_value=-179.0, max_value=179.0, allow_nan=False),
    lat=st.floats(min_value=-85.0, max_value=85.0, allow_nan=False),
)
@settings(max_examples=40, deadline=None)
def test_cartesian_unit_norm(lon, lat):
    c = fourier.geo_to_cartesian((lon, lat))
    assert abs(np.linalg.norm(c) - 1.0) < 1e-12


@given(
    qlon=st.floats(min_value=-170.0, max_value=170.0, allow_nan=False),
    qlat=st.floats(min_value=-80.0, max_value=80.0, allow_nan=False),
    plon=st.floats(min_value=-170.0, max_value=170.0, allow_nan=False),
    plat=st.floats(min_value=-80.0, max_value=80.0, allow_nan=False),
)
@settings(max_examples=30, deadline=None)
def test_geo_scores_within_pm1(qlon, qlat, plon, plat):
    """Scale-and-shift guarantees every corpus point scores in
    [−1, 1] when the farthest point is truly farthest; scoring any
    point not farther than that stays ≥ the farthest's score."""
    far = (qlon + 180.0 if qlon < 0 else qlon - 180.0, -qlat)
    vec = fourier.geo_encoding((qlon, qlat), far)
    p = np.append(fourier.geo_to_cartesian((plon, plat)), 1.0)
    s = float(p @ vec)
    assert -1.0 - 1e-9 <= s <= 1.0 + 1e-9


@given(st.data())
@settings(max_examples=25, deadline=None)
def test_minmax_scale_bounds(data):
    mn = data.draw(st.floats(min_value=-1e6, max_value=1e6, allow_nan=False))
    mx = data.draw(st.floats(min_value=mn + 1e-3, max_value=mn + 2e6, allow_nan=False))
    x = data.draw(st.floats(min_value=mn, max_value=mx, allow_nan=False))
    s = float(fourier.min_max_scale(x, mn, mx))
    assert -1.0 - 1e-9 <= s <= 1.0 + 1e-9


@given(st.floats(min_value=-1e6, max_value=1e6, allow_nan=False))
@settings(max_examples=300, deadline=None)
def test_round9_idempotent_and_bounded(x):
    """Portable half-up rounding (quantization._round9): idempotent,
    within half a grid step of the input, and symmetric under the
    explicit IEEE formula (the SQL-twin contract)."""
    from fuserank_spark.pipeline_ext.quantization import _round9

    r = _round9(x)
    assert _round9(r) == r
    assert abs(r - x) <= 5.0000001e-10 * max(1.0, abs(x) * 1e-0) + 1e-12 * abs(x)
    # explicit formula equivalence (the definition itself)
    import math

    assert r == math.floor(x * 1e9 + 0.5) / 1e9


@given(
    st.lists(
        st.text(alphabet="abcd", min_size=1, max_size=8), min_size=1, max_size=12
    ),
    st.integers(min_value=0, max_value=30),
)
@settings(max_examples=60, deadline=None)
def test_bpe_encoder_reconstructs_any_word(words, n_merges):
    """For ANY corpus and merge budget: encoding a word and
    concatenating the pieces reproduces word+END exactly, and every
    emitted piece is a substring of word+END (merges never invent
    content)."""
    from fuserank_spark.pipeline_ext.bpe import END, bpe_encode_word, bpe_train

    wf = [(w, 1 + (i % 3)) for i, w in enumerate(words)]
    merges = bpe_train(wf, num_merges=n_merges)
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    for w in set(words):
        toks = bpe_encode_word(w, ranks)
        assert "".join(toks) == w + END
        assert all(t in (w + END) for t in toks)
