"""Pure-numpy FuseRank encoding math — the driver-side half of the
engine (query-compile-time only; never touches row data).

Re-derivation of the reference formulas (semantics per
`src/encode.py`, cited per function). Layout convention: Fourier
blocks are interleaved ``[sin(1fx)σ1, cos(1fx)σ1, sin(2fx)σ2, ...]``;
the dot product is invariant to any consistent permutation, and the
Spark product encoder (encode.py) uses the identical layout.
"""

from __future__ import annotations

import numpy as np


def sigma(harmonics: np.ndarray, num_harmonics: int, freq: float = np.pi) -> np.ndarray:
    """Lanczos sigma damping (src/encode.py:441-448): σ_k =
    sinc(f·k/K); exactly 1.0 for the single-harmonic case."""
    harmonics = np.atleast_1d(np.asarray(harmonics, dtype="float64"))
    if len(harmonics) == 1 and harmonics[0] == 1:
        return np.ones(1)
    x = freq * harmonics / num_harmonics
    return np.sin(x) / x


def fourier_series(
    values: np.ndarray | float, num_harmonics: int, freq: float = np.pi
) -> np.ndarray:
    """Interleaved damped Fourier features of a scalar (or batch)
    (src/encode.py:402-427): per harmonic k, the pair
    (sin(k·f·x)·σ_k, cos(k·f·x)·σ_k); NaN inputs → zero vectors."""
    scalar_in = np.isscalar(values)
    x = np.atleast_1d(np.asarray(values, dtype="float64")).reshape(-1, 1)
    k = np.arange(1, num_harmonics + 1, dtype="float64")
    s = sigma(k, num_harmonics, freq)
    ang = k * freq * x  # (n, K)
    out = np.empty((x.shape[0], 2 * num_harmonics))
    out[:, 0::2] = np.sin(ang) * s
    out[:, 1::2] = np.cos(ang) * s
    out[np.isnan(out)] = 0.0
    return out[0] if scalar_in else out


def integrate_pair(lower: float, upper: float, k: int, num_harmonics: int) -> tuple[float, float]:
    """Analytic definite integral of the k-th (sin, cos) basis pair
    over [lower, upper], with the reference's normalization and
    per-k sigma (src/encode.py:429-439). Note the reference's sigma
    here is evaluated per single k — which yields σ=1 at k=1 (the
    single-harmonic special case), a deliberate parity quirk."""
    a, b = lower, upper
    norm = 1.0 / (b - a)
    sig = float(sigma(np.array([k]), num_harmonics)[0]) if k != 1 else 1.0
    sin_term = (np.cos(a * np.pi * k) - np.cos(b * np.pi * k)) / ((np.pi * k) * (b - a))
    cos_term = (np.sin(b * np.pi * k) - np.sin(a * np.pi * k)) / ((np.pi * k) * (b - a))
    return norm * sin_term * sig, norm * cos_term * sig


def scale_and_shift(vector: np.ndarray, farthest: np.ndarray) -> np.ndarray:
    """Normalize the dot-product range (src/encode.py:347-354): scale
    so the farthest match scores −1, append a shift coefficient so the
    perfect match scores +1 (the product side carries a constant 1
    shift dimension)."""
    dot_min = float(np.dot(vector, farthest))
    scale = 2.0 / (1.0 - dot_min)
    scaled = vector * scale
    dot_max = float(np.dot(vector, scaled))
    return np.append(scaled, 1.0 - dot_max)


def interval_encoding(
    lower: float, upper: float, num_harmonics: int
) -> np.ndarray:
    """N5 (src/encode.py:320-334): integral of the Fourier basis over
    the (already scaled+epsilon-corrected) interval, then normalized
    via two probe points so dot(point-in)≈+1 and dot(point-out)≈−1.
    Returns 2K+1 dims (2K coefficients + shift coefficient)."""
    vec = np.array(
        [integrate_pair(lower, upper, k + 1, num_harmonics) for k in range(num_harmonics)]
    ).reshape(-1)
    point_in = (lower + upper) / 2.0
    if abs(lower + 1.0) > abs(1.0 - upper):
        point_out = (lower - 1.0) / 2.0
    else:
        point_out = (upper + 1.0) / 2.0
    dot_in = float(np.dot(fourier_series(point_in, num_harmonics), vec))
    dot_out = float(np.dot(fourier_series(point_out, num_harmonics), vec))
    scale = 2.0 / (dot_in - dot_out)
    shift = (dot_in + dot_out) / 2.0
    return np.append(vec * scale, -scale * shift)


def centroid_encoding(scaled_value: float) -> np.ndarray:
    """N6 (src/encode.py:336-340): half-circle (freq π/2, K=1)
    features of the scaled target value, normalized against the
    farthest end of the [−1,1] range. 3 dims."""
    v = fourier_series(scaled_value, 1, freq=np.pi / 2)
    farthest = 1.0 if scaled_value < 0 else -1.0
    fv = fourier_series(farthest, 1, freq=np.pi / 2)
    return scale_and_shift(v, fv)


def geo_to_cartesian(point: tuple[float, float] | None) -> np.ndarray:
    """G2 (src/encode.py:390-400): (lon, lat) degrees → unit-sphere
    Cartesian; missing point → zero vector."""
    if point is None:
        return np.zeros(3)
    lon, lat = np.radians(np.asarray(point, dtype="float64"))
    return np.array([np.cos(lat) * np.cos(lon), np.cos(lat) * np.sin(lon), np.sin(lat)])


def geo_encoding(query_point: tuple[float, float], farthest_point: tuple[float, float]) -> np.ndarray:
    """G4 (src/encode.py:342-345): scale-and-shift the query's
    Cartesian vector w.r.t. the corpus's farthest point. 4 dims."""
    return scale_and_shift(geo_to_cartesian(query_point), geo_to_cartesian(farthest_point))


def haversine_km(
    points: np.ndarray, ref_point: tuple[float, float]
) -> np.ndarray:
    """G1 (src/encode.py:371-388): vectorized spherical distance in
    km to a reference point; NaN rows stay NaN. points: (n,2) lon/lat."""
    pts = np.asarray(points, dtype="float64")
    out = np.full(pts.shape[0], np.nan)
    ok = ~np.isnan(pts).any(axis=1)
    lon1, lat1 = np.radians(ref_point)
    lon2 = np.radians(pts[ok, 0])
    lat2 = np.radians(pts[ok, 1])
    a = (
        np.sin((lat2 - lat1) / 2) ** 2
        + np.cos(lat1) * np.cos(lat2) * np.sin((lon2 - lon1) / 2) ** 2
    )
    out[ok] = 2 * 6371.0 * np.arcsin(np.sqrt(a))
    return out


def min_max_scale(x: np.ndarray | float, mn: float, mx: float) -> np.ndarray | float:
    """N1 (src/encode.py:356-361)."""
    return 2.0 * ((np.asarray(x, dtype="float64") - mn) / (mx - mn)) - 1.0


def dense_product_block(
    values: np.ndarray, mn: float, mx: float, num_harmonics: int, range_epsilon: float = 0.01
) -> np.ndarray:
    """N4 (src/encode.py:85-100): per row —
    [half-circle(2) | 1 | full-circle(2K) | 1 | null-indicator].
    Shared by the Spark pandas-UDF fast path and the golden tests."""
    x = np.asarray(values, dtype="float64")
    scaled = (1.0 - range_epsilon) * min_max_scale(x, mn, mx)
    half = fourier_series(scaled, 1, freq=np.pi / 2)
    full = fourier_series(scaled, num_harmonics, freq=np.pi)
    n = x.shape[0]
    ones = np.ones((n, 1))
    null_ind = np.where(np.isnan(x), -1.0, 0.0).reshape(-1, 1)
    return np.concatenate([half, ones, full, ones, null_ind], axis=1)
