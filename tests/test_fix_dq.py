"""FixDQ fit/transform parity: expected behavior replicated with
pandas following Fix_DQ's exact order (pandas_dq.py:873-1058)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from pandas_dq_spark.operators.fix_dq import FixDQ

from .fixtures import messy_sdf


@pytest.fixture(scope="module")
def fitted(spark):
    sdf, pdf = messy_sdf(spark)
    fx = FixDQ()
    fx.fit(sdf)
    return fx, sdf, pdf


def test_drop_cols(fitted):
    fx, _, pdf = fitted
    st = fx.state
    assert "id_str" in st.id_cols_
    assert "const_col" in st.zero_var_cols_
    # corr_b is later in column order than corr_a -> dropped
    assert "corr_b" in st.drop_corr_cols_
    assert "corr_a" not in st.drop_corr_cols_
    # 85% missing >= 80% threshold -> dropped (pandas_dq.py:892)
    assert "num_mostly_missing" in st.drop_cols_
    for c in ["id_str", "const_col", "corr_b"]:
        assert c in st.drop_cols_


def test_upper_bounds_match_pandas(fitted):
    fx, _, pdf = fitted
    p = 0.87
    for c in ["num_outlier", "num_missing"]:
        q3 = pdf[c].quantile(p)
        q1 = pdf[c].quantile(1 - p)
        exp = q3 + 1.5 * (q3 - q1)
        assert fx.state.upper_bounds_[c] == pytest.approx(exp, rel=1e-12), c


def test_skew_transformers(fitted):
    fx, _, pdf = fitted
    # lognormal positive -> log1p (pandas_dq.py:963-967)
    assert fx.state.col_transformers_["num_skewed_pos"][0] == "log1p"
    # skewed with negatives -> yeo-johnson (pandas_dq.py:974-979)
    assert fx.state.col_transformers_["num_skewed_neg"][0] == "yeo-johnson"
    # inf column: pandas .skew() is NaN -> no transformer
    assert "num_inf" not in fx.state.col_transformers_
    # |skew| <= 1 -> no transformer
    assert "num_missing" not in fx.state.col_transformers_


def test_transform_output(fitted):
    fx, sdf, pdf = fitted
    out = fx.transform(sdf)
    cols = out.columns
    for c in fx.state.drop_cols_:
        assert c not in cols
    opdf = out.toPandas()

    # no missing left in imputed numeric col; fill value 9999 capped to ub
    ub = fx.state.upper_bounds_["num_missing"]
    fillval = min(9999.0, ub)
    n_missing = int(pdf["num_missing"].isnull().sum())
    assert int(opdf["num_missing"].isnull().sum()) == 0
    assert int(np.isclose(opdf["num_missing"], fillval).sum()) >= n_missing

    # cap: nothing above the upper bound
    assert opdf["num_outlier"].max() <= fx.state.upper_bounds_["num_outlier"] + 1e-9

    # inf replaced by the column's upper bound
    assert not np.isinf(opdf["num_inf"]).any()

    # rare categories grouped
    vals = set(opdf["cat_rare"].unique())
    assert "Rare" in vals and "rare_x" not in vals and "rare_y" not in vals

    # log1p applied: compare against pandas chain cap -> log1p
    x = pdf["num_skewed_pos"].copy()
    ubp = fx.state.upper_bounds_["num_skewed_pos"]
    x = np.where(x > ubp, ubp, x)
    exp = np.log1p(x)
    got = np.sort(opdf["num_skewed_pos"].to_numpy())
    assert np.allclose(got, np.sort(exp), rtol=1e-9)


def test_yeo_johnson_standardized(fitted):
    fx, sdf, _ = fitted
    out = fx.transform(sdf).toPandas()
    v = out["num_skewed_neg"]
    # PowerTransformer(standardize=True) analogue: fit-data output is
    # ~N(0,1); the transform data == fit data here (allowing for the
    # capped values shifting the moments slightly)
    assert abs(v.mean()) < 0.2
    assert 0.7 < v.std() < 1.3


def test_rare_recomputed_on_transform_data(spark):
    """The reference recomputes rare sets on the TRANSFORM data, not
    fit state (pandas_dq.py:767-769) — quirk reproduced."""
    import pandas as pd

    # id column keeps rows unique so the dedup step (which also runs in
    # the reference's transform, pandas_dq.py:1032) is a no-op here
    train = pd.DataFrame(
        {"i": range(100), "c": ["a"] * 99 + ["b"]}
    )  # b is 1% -> not < 0.01
    test = pd.DataFrame(
        {"i": range(300), "c": ["a"] * 299 + ["b"]}
    )  # b is 1/300 < 0.01 -> Rare
    fx = FixDQ()
    fx.fit(spark.createDataFrame(train))
    out = fx.transform(spark.createDataFrame(test)).toPandas()
    assert set(out["c"].unique()) == {"a", "Rare"}


def test_quantile_none_skips_cap_but_replaces_inf(spark):
    import pandas as pd

    rng = np.random.default_rng(7)
    vals = rng.normal(10, 2, 500).tolist() + [1000.0, np.inf]
    pdf = pd.DataFrame({"i": range(len(vals)), "f": vals})
    fx = FixDQ(quantile=None)
    sdf = spark.createDataFrame(pdf)
    fx.fit(sdf)
    # bound computed at base quantile 0.99 even when quantile=None
    # (pandas_dq.py:925-937) — needed for infinity replacement
    q = pdf["f"].quantile
    exp_ub = q(0.99) + 1.5 * (q(0.99) - q(0.01))
    assert fx.state.upper_bounds_["f"] == pytest.approx(exp_ub, rel=1e-12)
    out = fx.transform(sdf).toPandas()
    assert out["f"].max() == pytest.approx(1000.0)  # not capped
    assert not np.isinf(out["f"]).any()  # but inf replaced with ub


def test_transform_dedups_rows(spark):
    import pandas as pd

    pdf = pd.DataFrame({"a": [1, 1, 2], "b": ["x", "x", "y"]})
    fx = FixDQ()
    fx.fit(spark.createDataFrame(pdf))
    out = fx.transform(spark.createDataFrame(pdf))
    assert out.count() == 2
