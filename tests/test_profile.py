"""Golden tests: fused profile vs the same statistics computed with
pandas (the reference's substrate) on identical data — SURVEY.md §5.2
strategy 1/2."""

from __future__ import annotations

import math

import numpy as np
import pytest

from pandas_dq_spark.plans.profile import (
    correlation_matrix,
    duplicate_row_count,
    duplicate_row_count_hashed,
    profile,
    quantiles,
    value_counts,
)

from .fixtures import messy_sdf


@pytest.fixture(scope="module")
def messy(spark):
    return messy_sdf(spark)


def test_missing_and_distinct_match_pandas(messy):
    sdf, pdf = messy
    st = profile(sdf)
    assert st.n_rows == len(pdf)
    for c in pdf.columns:
        assert st.columns[c].n_missing == int(pdf[c].isnull().sum()), c
        assert st.columns[c].n_distinct == int(pdf[c].nunique()), c


def test_min_max_match_pandas(messy):
    sdf, pdf = messy
    st = profile(sdf)
    for c in ["num_outlier", "int_plain", "int_year", "num_bool"]:
        assert st.columns[c].min_val == pytest.approx(pdf[c].min())
        assert st.columns[c].max_val == pytest.approx(pdf[c].max())


def test_skewness_matches_pandas_adjusted(messy):
    sdf, pdf = messy
    st = profile(sdf)
    for c in ["num_outlier", "num_skewed_pos", "num_skewed_neg", "num_missing"]:
        assert st.columns[c].skewness == pytest.approx(pdf[c].skew(), rel=1e-9), c


def test_inf_counts(messy):
    sdf, pdf = messy
    st = profile(sdf)
    assert st.columns["num_inf"].n_inf == 7
    assert st.columns["num_outlier"].n_inf == 0


def test_quantiles_match_pandas_linear_interpolation(messy):
    sdf, pdf = messy
    q = quantiles(sdf, ["num_outlier", "num_missing"], [0.25, 0.5, 0.75, 0.87])
    for c in q:
        exp = pdf[c].quantile([0.25, 0.5, 0.75, 0.87]).tolist()
        assert q[c] == pytest.approx(exp, rel=1e-12), c


def test_correlation_matches_pandas(messy):
    sdf, pdf = messy
    cm = correlation_matrix(sdf, ["corr_a", "corr_b", "num_outlier"])
    exp = pdf[["corr_a", "corr_b", "num_outlier"]].corr()
    for (a, b), v in cm.items():
        assert v == pytest.approx(exp.loc[a, b], rel=1e-9), (a, b)
    assert abs(cm[("corr_a", "corr_b")]) > 0.9


def test_duplicate_rows_match_pandas(spark):
    import pandas as pd

    pdf = pd.DataFrame(
        {"a": [1, 1, 2, 2, 3, None, None], "b": ["x", "x", "y", "y", "z", "w", "w"]}
    )
    sdf = spark.createDataFrame(pdf)
    # pandas counts NaN == NaN as duplicates (SURVEY.md §4.3 trap 3)
    assert duplicate_row_count(sdf) == int(pdf.duplicated().sum()) == 3
    assert duplicate_row_count_hashed(sdf) == 3


def test_value_counts_normalize_excludes_nulls(spark):
    import pandas as pd

    pdf = pd.DataFrame({"c": ["a", "a", "b", None, None, None]})
    sdf = spark.createDataFrame(pdf)
    vc = dict(value_counts(sdf, "c", normalize=True))
    # pandas value_counts(normalize=True) denominator excludes NaN
    assert vc["a"] == pytest.approx(2 / 3)
    assert vc["b"] == pytest.approx(1 / 3)


def test_quantiles_bucketed_many_matches_fused_exact(messy):
    # VERDICT r02 item 3: the engine-mode quantile path (range-bucketed,
    # no single-reducer percentile state) must equal the fused exact
    # `percentile` on the messy fixture — incl. NaN columns and the
    # +-inf column (pandas keeps inf in the order statistics)
    from pandas_dq_spark.plans.profile import quantiles_bucketed_many

    sdf, pdf = messy
    cols = [
        "num_missing",
        "num_mostly_missing",
        "num_inf",
        "num_outlier",
        "num_skewed_pos",
        "int_plain",
    ]
    probs = [0.13, 0.25, 0.5, 0.75, 0.87]
    fused = quantiles(sdf, cols, probs)
    bucketed = quantiles_bucketed_many(sdf, cols, probs, n_buckets=32)
    for c in cols:
        for a, b in zip(fused[c], bucketed[c]):
            if math.isnan(a) if isinstance(a, float) else False:
                assert math.isnan(b)
            else:
                assert b == pytest.approx(a, abs=1e-12), c


def test_fixdq_engine_mode_same_state(spark, messy):
    # engine_mode swaps the quantile physical plan only — fitted state
    # (upper bounds, transformers, drop lists) must be identical
    from pandas_dq_spark.operators.fix_dq import FixDQ

    sdf, _ = messy
    a = FixDQ().fit(sdf).state
    b = FixDQ(engine_mode=True).fit(sdf).state
    assert a.drop_cols_ == b.drop_cols_
    assert set(a.upper_bounds_) == set(b.upper_bounds_)
    for c in a.upper_bounds_:
        assert b.upper_bounds_[c] == pytest.approx(a.upper_bounds_[c], abs=1e-9), c
    assert set(a.col_transformers_) == set(b.col_transformers_)


def test_rare_categories_fused_matches_per_column(spark):
    import pandas as pd

    from pandas_dq_spark.plans.profile import rare_categories_fused

    pdf = pd.DataFrame(
        {
            "a": ["x"] * 90 + ["y"] * 8 + ["r1", "r2"],  # r1,r2 rare at 1%... no: 1/100
            "b": [f"v{i % 4}" for i in range(100)],  # none rare
            "f": [1.5] * 97 + [2.5, 3.5, 3.5],
        }
    )
    sdf = spark.createDataFrame(pdf)
    got = rare_categories_fused(sdf, ["a", "b", "f"], threshold=0.02)
    # per-column oracle via the existing value_counts path
    for c in ["a", "b", "f"]:
        vc = value_counts(sdf, c, normalize=True)
        rare = [v for v, freq in vc if freq < 0.02]
        if rare:
            n, vals = got[c]
            assert n == len(rare)
            assert vals == rare  # same order: count desc, first-appearance
        else:
            assert c not in got
    # float values keep their Python type (issue-string parity)
    assert all(isinstance(v, float) for v in got["f"][1])


def test_rare_categories_fused_bounded_driver_collect(spark):
    # VERDICT r02 item 2: a (mis-classified) high-cardinality column
    # must report its exact rare count WITHOUT materializing the rare
    # set on the driver
    from pyspark.sql import functions as F

    from pandas_dq_spark.plans.profile import rare_categories_fused

    n = 100_000
    sdf = spark.range(n).select(
        F.concat(F.lit("u"), F.col("id").cast("string")).alias("hc"),
        (F.col("id") % 3).cast("string").alias("lc"),
    )
    got = rare_categories_fused(sdf, ["hc", "lc"], threshold=0.01)
    n_rare, vals = got["hc"]
    assert n_rare == n  # every value rare — exact count
    assert vals is None  # ...but never collected
    assert "lc" not in got  # 3 values at ~33% each: none rare


def test_string_length_stats(messy):
    sdf, pdf = messy
    st = profile(sdf)
    assert st.columns["id_str"].max_len == 9
    assert st.columns["id_str"].avg_len == pytest.approx(9.0)


def test_quantiles_bucketed_matches_numpy(spark):
    # distributed exact quantile (no single-reducer value multiset)
    # must equal numpy/pandas linear interpolation for any bucket
    # count, incl. ties, NaNs, and boundary-landing values
    import pandas as pd

    from pandas_dq_spark.plans.profile import quantiles_bucketed

    rng = np.random.default_rng(17)
    x = np.concatenate(
        [rng.normal(10, 3, 900), rng.integers(0, 5, 100).astype(float), [0.0, 20.0]]
    )
    pdf = pd.DataFrame({"v": x})
    pdf.loc[rng.choice(len(pdf), 50, replace=False), "v"] = np.nan
    sdf = spark.createDataFrame(pdf)
    probs = [0.0, 0.13, 0.25, 0.5, 0.75, 0.87, 0.99, 1.0]
    exp = pdf["v"].quantile(probs).tolist()
    for nb in (1, 7, 256):
        got = quantiles_bucketed(sdf, "v", probs, n_buckets=nb)
        assert got == pytest.approx(exp, abs=1e-12), nb
    # degenerate: single value / all-null
    one = spark.createDataFrame(pd.DataFrame({"v": [3.5, 3.5, 3.5]}))
    assert quantiles_bucketed(one, "v", [0.25, 0.75]) == [3.5, 3.5]
    nul = spark.createDataFrame(pd.DataFrame({"v": [np.nan, np.nan]}))
    assert quantiles_bucketed(nul, "v", [0.5]) == [None]
    # r6: the driver fast path (limit-collect histogram) and the
    # distributed range-bucketed fallback must agree BIT-FOR-BIT —
    # force the fallback with a tiny cap and compare
    driver_path = quantiles_bucketed(sdf, "v", probs)
    dist_path = quantiles_bucketed(sdf, "v", probs, max_distinct_for_driver=3)
    assert driver_path == dist_path
    assert driver_path == pytest.approx(exp, abs=1e-12)


def test_engine_mode_approx_distinct(messy):
    # engine mode (exact_distinct=False): approx_count_distinct rides
    # the same fused pass; 1% rsd keeps it within a few % of exact
    sdf, pdf = messy
    exact = profile(sdf)
    approx = profile(sdf, exact_distinct=False)
    assert approx.exact is False
    for c in pdf.columns:
        e = exact.columns[c].n_distinct
        a = approx.columns[c].n_distinct
        if e <= 100:
            assert a == e, c  # HLL is exact at tiny cardinalities
        else:
            assert abs(a - e) / e < 0.05, (c, e, a)
    # everything else identical between modes
    for c in pdf.columns:
        assert approx.columns[c].n_missing == exact.columns[c].n_missing
        assert approx.columns[c].min_val == exact.columns[c].min_val


def test_float_nan_counts_as_missing(spark):
    import pandas as pd

    pdf = pd.DataFrame({"f": [1.0, float("nan"), None, 2.0]})
    sdf = spark.createDataFrame(pdf)
    st = profile(sdf)
    assert st.columns["f"].n_missing == 2
    assert st.columns["f"].n_distinct == 2
