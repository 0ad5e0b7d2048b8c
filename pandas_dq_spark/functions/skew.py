"""Skew-transform fitting: log1p and Yeo-Johnson (SURVEY.md F6/F8).

The reference uses sklearn's ``PowerTransformer("yeo-johnson")``
(pandas_dq.py:974-979).  sklearn is not a dependency of this engine, so
the lambda MLE is implemented here in numpy (standard Yeo-Johnson
log-likelihood, golden-section search).  The fitted lambda becomes
broadcastable fit-state and the *apply* side is a pure Catalyst column
expression — no Python on the executors.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F


def yeo_johnson_transform_np(x: np.ndarray, lmbda: float) -> np.ndarray:
    out = np.empty_like(x, dtype=float)
    pos = x >= 0
    if abs(lmbda) < 1e-12:
        out[pos] = np.log1p(x[pos])
    else:
        out[pos] = ((x[pos] + 1.0) ** lmbda - 1.0) / lmbda
    if abs(lmbda - 2.0) < 1e-12:
        out[~pos] = -np.log1p(-x[~pos])
    else:
        out[~pos] = -(((-x[~pos] + 1.0) ** (2.0 - lmbda) - 1.0) / (2.0 - lmbda))
    return out


def _neg_loglik(x: np.ndarray, lmbda: float) -> float:
    n = x.shape[0]
    y = yeo_johnson_transform_np(x, lmbda)
    var = y.var()
    if var <= 0:
        return np.inf
    loglik = -0.5 * n * np.log(var) + (lmbda - 1.0) * np.sign(x) @ np.log1p(np.abs(x))
    return -loglik


def fit_yeo_johnson_lambda(x: np.ndarray, lo: float = -5.0, hi: float = 5.0) -> float:
    """MLE for lambda via golden-section search (unimodal objective).

    At engine scale the input is a seeded sample of the column (the
    transform is insensitive to lambda at the 3rd decimal); at parity/
    test scale the full column is collected.
    """
    x = np.asarray(x, dtype=float)
    x = x[np.isfinite(x)]
    if x.size < 3:
        return 1.0
    invphi = (np.sqrt(5) - 1) / 2
    a, b = lo, hi
    c, d = b - invphi * (b - a), a + invphi * (b - a)
    fc, fd = _neg_loglik(x, c), _neg_loglik(x, d)
    for _ in range(80):
        if fc < fd:
            b, d, fd = d, c, fc
            c = b - invphi * (b - a)
            fc = _neg_loglik(x, c)
        else:
            a, c, fc = c, d, fd
            d = a + invphi * (b - a)
            fd = _neg_loglik(x, d)
    return (a + b) / 2


def yeo_johnson_col(c: Column, lmbda: float, standardize: tuple[float, float] | None = None) -> Column:
    """Closed-form Yeo-Johnson as a Catalyst expression."""
    if abs(lmbda) < 1e-12:
        pos_expr = F.log1p(c)
    else:
        pos_expr = (F.pow(c + 1.0, F.lit(lmbda)) - 1.0) / lmbda
    if abs(lmbda - 2.0) < 1e-12:
        neg_expr = -F.log1p(-c)
    else:
        neg_expr = -((F.pow(-c + 1.0, F.lit(2.0 - lmbda)) - 1.0) / (2.0 - lmbda))
    out = F.when(c >= 0, pos_expr).otherwise(neg_expr)
    if standardize is not None:
        mu, sigma = standardize
        out = (out - mu) / (sigma if sigma else 1.0)
    return out


def pandas_adjusted_skew(values: np.ndarray) -> float:
    """Reference skew semantics (pandas .skew(): adjusted Fisher-Pearson;
    pandas_dq.py:954-961) for driver-side use."""
    x = np.asarray(values, dtype=float)
    x = x[~np.isnan(x)]
    n = x.size
    if n < 3:
        return float("nan")
    m = x.mean()
    m2 = ((x - m) ** 2).mean()
    m3 = ((x - m) ** 3).mean()
    if m2 == 0:
        return float("nan")
    g1 = m3 / m2**1.5
    return g1 * np.sqrt(n * (n - 1)) / (n - 2)
