"""Numeric distribution transforms Y1-Y5 (reference
`src/transform.py`), re-expressed as fit-on-driver / apply-as-Column.

The reference fits eagerly on a whole pandas column; here fitting
(Yeo-Johnson λ, KS scoring) runs on a driver-side sample (bounded,
deterministic) and application is a closed-form Column expression —
so the 100 TB apply path is pure Catalyst codegen, no Python.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

try:
    from scipy import stats as _scipy_stats
except ImportError:  # scipy is optional: λ fit falls back to numpy grid search
    _scipy_stats = None


@dataclass
class FittedTransform:
    name: str  # 'identity' | 'yeojohnson' | 'inverse' | 'log' | 'sqrt'
    lmbda: float | None = None  # Yeo-Johnson λ
    epsilon: float = 1e-10  # inverse transform epsilon (src/transform.py:49)

    def expr(self, col: Column | str) -> Column:
        c = F.col(col) if isinstance(col, str) else col
        c = c.cast("double")
        if self.name == "identity":
            return c
        if self.name == "inverse":  # Y2: 1/(x+eps) (src/transform.py:54)
            return F.lit(1.0) / (c + F.lit(self.epsilon))
        if self.name == "log":  # Y3: log2(x+1) (src/transform.py:63)
            return F.log2(c + F.lit(1.0))
        if self.name == "sqrt":  # Y4 (src/transform.py:72)
            return F.sqrt(c)
        if self.name == "yeojohnson":  # Y1: closed form given λ (src/transform.py:44)
            lam = self.lmbda
            pos = c >= 0
            if abs(lam) < 1e-12:
                pos_branch = F.log(c + 1.0)
            else:
                pos_branch = (F.pow(c + 1.0, F.lit(lam)) - 1.0) / F.lit(lam)
            if abs(lam - 2.0) < 1e-12:
                neg_branch = -F.log(-c + 1.0)
            else:
                neg_branch = -(F.pow(-c + 1.0, F.lit(2.0 - lam)) - 1.0) / F.lit(2.0 - lam)
            return F.when(pos, pos_branch).otherwise(neg_branch)
        raise ValueError(f"unknown transform {self.name}")

    def apply_np(self, x: np.ndarray | float) -> np.ndarray | float:
        """Driver-side twin of expr() — used by the query compiler to
        transform filter bounds the same way the column was
        (src/app.py:273-277)."""
        x = np.asarray(x, dtype="float64")
        if self.name == "identity":
            return x
        if self.name == "inverse":
            return 1.0 / (x + self.epsilon)
        if self.name == "log":
            return np.log2(x + 1.0)
        if self.name == "sqrt":
            return np.sqrt(x)
        if self.name == "yeojohnson":
            lam = self.lmbda
            out = np.empty_like(x)
            pos = x >= 0
            if abs(lam) < 1e-12:
                out[pos] = np.log1p(x[pos])
            else:
                out[pos] = ((x[pos] + 1.0) ** lam - 1.0) / lam
            if abs(lam - 2.0) < 1e-12:
                out[~pos] = -np.log1p(-x[~pos])
            else:
                out[~pos] = -((-x[~pos] + 1.0) ** (2.0 - lam) - 1.0) / (2.0 - lam)
            return out
        raise ValueError(self.name)


def _yj_lambda(sample: np.ndarray) -> float:
    if _scipy_stats is not None:
        return float(_scipy_stats.yeojohnson(sample)[1])
    # fallback: coarse log-likelihood grid search
    best_lam, best_ll = 1.0, -math.inf
    for lam in np.linspace(-2, 2, 81):
        t = FittedTransform("yeojohnson", lmbda=float(lam)).apply_np(sample)
        var = t.var()
        if var <= 0:
            continue
        ll = -0.5 * len(t) * math.log(var) + (lam - 1) * np.sum(np.sign(sample) * np.log1p(np.abs(sample)))
        if ll > best_ll:
            best_lam, best_ll = float(lam), ll
    return best_lam


def _ks_normal(sample: np.ndarray) -> float:
    """KS statistic vs a normal fitted with the sample's mean/std —
    the Y5 selection score (src/transform.py:94-98)."""
    mu, sd = float(np.mean(sample)), float(np.std(sample))
    if sd == 0:
        return 1.0
    if _scipy_stats is not None:
        return float(_scipy_stats.kstest(sample, "norm", args=(mu, sd))[0])
    xs = np.sort(sample)
    n = len(xs)
    cdf = 0.5 * (1.0 + np.vectorize(math.erf)((xs - mu) / (sd * math.sqrt(2))))
    ecdf_hi = np.arange(1, n + 1) / n
    ecdf_lo = np.arange(0, n) / n
    return float(max(np.max(np.abs(ecdf_hi - cdf)), np.max(np.abs(ecdf_lo - cdf))))


def fit_transform(name: str, sample: np.ndarray) -> FittedTransform:
    sample = np.asarray(sample, dtype="float64")
    sample = sample[~np.isnan(sample)]
    if name in ("log", "sqrt") and np.any(sample < 0):
        # non_negative_data guard (src/transform.py:22-29)
        raise ValueError("Input data must be non-negative.")
    if name == "yeojohnson":
        return FittedTransform(name, lmbda=_yj_lambda(sample))
    return FittedTransform(name)


ALL_TRANSFORMS = ("yeojohnson", "inverse", "log", "sqrt")


def best_transform(
    df: DataFrame, column: str, sample_limit: int = 100_000, seed: int = 42
) -> FittedTransform | None:
    """Y5 (src/transform.py:86-102): try every registered transform,
    keep the one whose output is closest to normal by KS statistic.

    Fit runs on a bounded deterministic sample pulled to the driver —
    the only sane posture at 100 TB; application stays columnar.
    Returns None when nothing beats statistic 1.0 (as the reference).
    """
    n = df.count()
    frac = min(1.0, (sample_limit * 1.2) / max(n, 1))
    sample = np.array(
        [
            r[0]
            for r in df.select(F.col(column).cast("double"))
            .na.drop()
            .sample(fraction=frac, seed=seed)
            .limit(sample_limit)
            .collect()
        ],
        dtype="float64",
    )
    if len(sample) == 0:
        return None
    best: FittedTransform | None = None
    best_stat = 1.0
    for name in ALL_TRANSFORMS:
        try:
            ft = fit_transform(name, sample)
        except ValueError:
            continue
        stat = _ks_normal(np.asarray(ft.apply_np(sample)))
        if stat < best_stat:
            best_stat, best = stat, ft
    return best


def transformed_view(df: DataFrame, transformation_schema: dict[str, FittedTransform]) -> DataFrame:
    """The `transformed_df` overlay (src/load.py:37-42): same frame
    with transformed numeric columns layered on — lazy, Catalyst
    folds it into downstream plans."""
    if not transformation_schema:
        return df
    return df.withColumns({c: t.expr(c) for c, t in transformation_schema.items()})
