"""Load the ACTUAL reference (/root/reference/pandas_dq.py) read-only.

The container lacks sklearn / scipy / IPython, which the reference
imports at module level, so minimal stand-ins are installed in
``sys.modules`` first:

- ``sklearn.base.BaseEstimator/TransformerMixin`` — empty mixins (the
  reference only inherits from them, pandas_dq.py:601).
- ``sklearn.preprocessing.FunctionTransformer`` — fit/transform wrapper
  around a callable (used for log1p only, pandas_dq.py:965-967).
- ``sklearn.preprocessing.PowerTransformer`` — Yeo-Johnson MLE +
  standardize, implemented here from the published log-likelihood via
  the numpy routines in ``pandas_dq_spark.functions.skew`` (whose
  agreement with sklearn was verified numerically when they were
  written; SURVEY.md §7.2).  Its ``repr`` starts with
  "PowerTransformer(" because the reference dispatches on
  ``str(transformer).split("(")[0]`` (pandas_dq.py:860).
- ``scipy.stats.ks_2samp`` — the exact two-sample KS statistic
  (searchsorted side='right' convention, identical to scipy's
  definition); only ``.statistic`` is consumed (pandas_dq.py:1316).
- ``IPython.display.display`` — no-op (report styling is lazy, so the
  Styler never renders and matplotlib is never needed).

Everything the parity tests actually compare (issue strings, fitted
bounds, drop lists, imputation, capping, rare grouping) runs the
reference's own pandas code unmodified.
"""

from __future__ import annotations

import importlib.util
import sys
import types

import numpy as np

REFERENCE_PATH = "/root/reference/pandas_dq.py"
_ref_module = None


def _install_stub_modules() -> None:
    from pandas_dq_spark.functions.skew import (
        fit_yeo_johnson_lambda,
        yeo_johnson_transform_np,
    )

    if "sklearn" not in sys.modules:
        class BaseEstimator:  # noqa: D401 - marker base
            pass

        class TransformerMixin:
            pass

        class FunctionTransformer:
            def __init__(self, func=None):
                self.func = func

            def fit(self, X, y=None):
                return self

            def transform(self, X):
                return self.func(X) if self.func is not None else X

            def __repr__(self):
                return f"FunctionTransformer(func={getattr(self.func, '__name__', self.func)})"

        class PowerTransformer:
            """NaN-aware Yeo-Johnson (sklearn treats NaN as missing:
            disregarded in fit, propagated in transform)."""

            def __init__(self, method="yeo-johnson", standardize=True):
                self.method = method
                self.standardize = standardize

            def fit(self, X, y=None):
                x = np.asarray(X, dtype=float).ravel()
                x = x[np.isfinite(x)]
                lam = fit_yeo_johnson_lambda(x)
                self.lambdas_ = np.array([lam])
                t = yeo_johnson_transform_np(x, lam)
                self._mean = float(t.mean())
                self._std = float(t.std())
                return self

            def transform(self, X):
                x = np.asarray(X, dtype=float)
                shape = x.shape
                t = yeo_johnson_transform_np(x.ravel(), float(self.lambdas_[0]))
                if self.standardize:
                    t = (t - self._mean) / (self._std if self._std else 1.0)
                return t.reshape(shape)

            def __repr__(self):
                return f"PowerTransformer(method='{self.method}')"

        sk = types.ModuleType("sklearn")
        pre = types.ModuleType("sklearn.preprocessing")
        base = types.ModuleType("sklearn.base")
        pre.PowerTransformer = PowerTransformer
        pre.FunctionTransformer = FunctionTransformer
        base.BaseEstimator = BaseEstimator
        base.TransformerMixin = TransformerMixin
        sk.preprocessing = pre
        sk.base = base
        sys.modules.update(
            {"sklearn": sk, "sklearn.preprocessing": pre, "sklearn.base": base}
        )

    if "scipy" not in sys.modules:
        def ks_2samp(a, b):
            x = np.sort(np.asarray(a, dtype=float))
            y = np.sort(np.asarray(b, dtype=float))
            n1, n2 = x.size, y.size
            if n1 == 0 or n2 == 0:
                d = float("nan")
            else:
                allv = np.concatenate([x, y])
                cdf1 = np.searchsorted(x, allv, side="right") / n1
                cdf2 = np.searchsorted(y, allv, side="right") / n2
                d = float(np.abs(cdf1 - cdf2).max())
            return types.SimpleNamespace(statistic=d, pvalue=float("nan"))

        scipy_m = types.ModuleType("scipy")
        stats_m = types.ModuleType("scipy.stats")
        stats_m.ks_2samp = ks_2samp
        scipy_m.stats = stats_m
        sys.modules.update({"scipy": scipy_m, "scipy.stats": stats_m})

    if "IPython" not in sys.modules:
        ipy = types.ModuleType("IPython")
        disp = types.ModuleType("IPython.display")
        disp.display = lambda *a, **k: None
        ipy.display = disp
        sys.modules.update({"IPython": ipy, "IPython.display": disp})


def load_reference():
    """Import /root/reference/pandas_dq.py (cached per process)."""
    global _ref_module
    if _ref_module is None:
        _install_stub_modules()
        spec = importlib.util.spec_from_file_location(
            "pandas_dq_reference", REFERENCE_PATH
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        _ref_module = mod
    return _ref_module
