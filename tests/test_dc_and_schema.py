"""dc_report, KS operator and DataSchemaChecker tests."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pandas_dq_spark.operators.dc_report import dc_report
from pandas_dq_spark.operators.ks import ks_2samp_arrays, ks_2samp_df
from pandas_dq_spark.operators.schema_checker import DataSchemaChecker


def _ks_exact_reference(x, y):
    """scipy-equivalent exact two-sample KS in numpy (scipy is not in
    the environment; this mirrors ks_2samp's exact D computation)."""
    x, y = np.sort(x), np.sort(y)
    allv = np.concatenate([x, y])
    cdf1 = np.searchsorted(x, allv, side="right") / x.size
    cdf2 = np.searchsorted(y, allv, side="right") / y.size
    return float(np.abs(cdf1 - cdf2).max())


def test_ks_distributed_matches_exact(spark):
    rng = np.random.default_rng(3)
    x = rng.normal(0, 1, 800)
    y = rng.normal(0.4, 1.3, 600)
    d1 = spark.createDataFrame(pd.DataFrame({"v": x}))
    d2 = spark.createDataFrame(pd.DataFrame({"v": y}))
    got = ks_2samp_df(d1, "v", d2, "v")
    exp = _ks_exact_reference(x, y)
    assert got == pytest.approx(exp, abs=1e-12)
    assert ks_2samp_arrays(x, y) == pytest.approx(exp, abs=1e-12)


def test_ks_with_ties(spark):
    x = np.array([1.0, 1.0, 2.0, 2.0, 3.0])
    y = np.array([1.0, 2.0, 2.0, 4.0])
    d1 = spark.createDataFrame(pd.DataFrame({"v": x}))
    d2 = spark.createDataFrame(pd.DataFrame({"v": y}))
    assert ks_2samp_df(d1, "v", d2, "v") == pytest.approx(
        _ks_exact_reference(x, y), abs=1e-12
    )


def test_ks_identical_is_zero(spark):
    x = np.arange(100, dtype=float)
    d = spark.createDataFrame(pd.DataFrame({"v": x}))
    assert ks_2samp_df(d, "v", d, "v") == 0.0


def test_ks_range_buckets_edge_cases(spark):
    # range-bucketed cumsum must be exact for ANY bucket count,
    # including values landing exactly on bucket boundaries, heavy
    # ties, and a single bucket (degenerate = global window)
    rng = np.random.default_rng(5)
    x = np.concatenate([rng.integers(0, 16, 300).astype(float), [0.0, 16.0]])
    y = np.concatenate([rng.integers(0, 16, 200).astype(float) + 0.5, [16.0]])
    d1 = spark.createDataFrame(pd.DataFrame({"v": x}))
    d2 = spark.createDataFrame(pd.DataFrame({"v": y}))
    exp = _ks_exact_reference(x, y)
    for nb in (1, 3, 16, 256):
        got = ks_2samp_df(d1, "v", d2, "v", n_buckets=nb)
        assert got == pytest.approx(exp, abs=1e-12), nb


def test_ks_auto_both_paths_agree(spark):
    # driver-finish path (distinct <= threshold) and the distributed
    # window fallback must both match the exact reference
    from pandas_dq_spark.operators.ks import ks_2samp_auto

    rng = np.random.default_rng(11)
    x = rng.normal(0, 1, 500)
    y = rng.normal(0.3, 1.1, 400)
    d1 = spark.createDataFrame(pd.DataFrame({"v": x}))
    d2 = spark.createDataFrame(pd.DataFrame({"v": y}))
    exp = _ks_exact_reference(x, y)
    assert ks_2samp_auto(d1, "v", d2, "v") == pytest.approx(exp, abs=1e-12)
    # force the distributed path with a tiny driver threshold
    assert ks_2samp_auto(
        d1, "v", d2, "v", max_distinct_for_driver=10
    ) == pytest.approx(exp, abs=1e-12)


def test_ks_many_matches_per_column(spark):
    # one fused job over several columns == per-column exact KS
    from pandas_dq_spark.operators.ks import ks_2samp_many

    rng = np.random.default_rng(13)
    pdf1 = pd.DataFrame(
        {
            "a": rng.normal(0, 1, 400),
            "b": rng.integers(0, 5, 400).astype(float),
            "c": np.full(400, np.nan),
        }
    )
    pdf2 = pd.DataFrame(
        {
            "a": rng.normal(0.5, 1.2, 300),
            "b": rng.integers(1, 6, 300).astype(float),
            "c": rng.normal(0, 1, 300),
        }
    )
    d1 = spark.createDataFrame(pdf1)
    d2 = spark.createDataFrame(pdf2)
    got = ks_2samp_many(d1, d2, ["a", "b", "c"])
    for c in ("a", "b"):
        exp = _ks_exact_reference(pdf1[c].to_numpy(), pdf2[c].to_numpy())
        assert got[c] == pytest.approx(exp, abs=1e-12), c
    assert np.isnan(got["c"])  # one side all-NaN -> nan like scipy dropna


def test_ks_many_high_cardinality_bucketed(spark):
    # VERDICT r02 item 4: a high-distinct column must agree with the
    # scipy-convention oracle through the range-bucketed plan (windows
    # are per (column, bucket), never one task per column), for any
    # bucket count including edge-landing values
    from pyspark.sql import functions as F

    from pandas_dq_spark.operators.ks import ks_2samp_many

    n = 300_000
    # deterministic, ~all-distinct values with different distributions
    d1 = spark.range(n).select(
        (F.col("id") * 0.001 + F.sin(F.col("id"))).alias("x"),
        (F.col("id") % 97).cast("double").alias("y"),
    )
    d2 = spark.range(n // 2).select(
        (F.col("id") * 0.0021 + F.cos(F.col("id"))).alias("x"),
        (F.col("id") % 89).cast("double").alias("y"),
    )
    x1 = np.arange(n) * 0.001 + np.sin(np.arange(n))
    x2 = np.arange(n // 2) * 0.0021 + np.cos(np.arange(n // 2))
    y1 = (np.arange(n) % 97).astype(float)
    y2 = (np.arange(n // 2) % 89).astype(float)
    exp_x = _ks_exact_reference(x1, x2)
    exp_y = _ks_exact_reference(y1, y2)
    for nb in (3, 64):
        got = ks_2samp_many(d1, d2, ["x", "y"], n_buckets=nb)
        assert got["x"] == pytest.approx(exp_x, abs=1e-12), nb
        assert got["y"] == pytest.approx(exp_y, abs=1e-12), nb


def test_dc_report_shapes_and_strings(spark):
    rng = np.random.default_rng(11)
    n = 400
    train = pd.DataFrame(
        {
            "num": rng.normal(0, 1, n),
            "cat": rng.choice(["a", "b"], n),
            "shifted": rng.normal(0, 1, n),
        }
    )
    test = pd.DataFrame(
        {
            "num": rng.normal(0, 1, n),
            "cat": rng.choice(["a", "b", "c"], n),
            "shifted": rng.normal(2.0, 1, n),  # strong drift
        }
    )
    test.loc[:39, "num"] = np.nan  # missing-rate drift
    out = dc_report(
        spark.createDataFrame(train), spark.createDataFrame(test), verbose=0
    )
    assert out.columns == [
        "column_name",
        "dq_issue_train",
        "dq_issue_test",
        "distribution_difference",
    ]
    rows = {r["column_name"]: r for r in out.collect()}
    assert "percentage of missing values of num are different" in (
        rows["num"]["distribution_difference"] or ""
    )
    # float cols report 'NA' unique% -> count_unique=0 -> KS gate passes
    # (reference quirk, pandas_dq.py:1295-1308)
    assert "KS test statistic" in (rows["shifted"]["distribution_difference"] or "")


def test_dc_report_verbose_full(spark):
    pdf = pd.DataFrame({"x": [1.0, 2.0, 3.0] * 10})
    out = dc_report(
        spark.createDataFrame(pdf), spark.createDataFrame(pdf), verbose=1
    )
    assert len(out.columns) == 14
    assert out.count() == 1


def test_schema_checker_reports_and_coerces(spark):
    pdf = pd.DataFrame(
        {
            "name": ["a", "b"],
            "age": [1.5, 2.5],
            "income": [10, 20],
            "when": ["2024-01-01 00:00:00", "2024-02-01 00:00:00"],
        }
    )
    sdf = spark.createDataFrame(pdf)
    chk = DataSchemaChecker(
        {"name": "string", "age": "float32", "income": "float64", "when": "date"}
    )
    chk.fit(sdf)
    out = chk.transform(sdf)
    assert len(chk.error_df_) == 3  # age, income, when mismatch
    err = {r[0]: r for r in chk.error_df_.rows}
    assert err["age"][1] == "float32" and err["age"][2] == "float64"
    assert (
        err["age"][3]
        == "Column 'age' has data type 'float64' but expected 'float32'"
    )
    types = dict(out.dtypes)
    assert types["age"] == "float"
    assert types["income"] == "double"
    assert types["when"] == "timestamp"


def test_schema_checker_column_count_mismatch(spark):
    pdf = pd.DataFrame({"a": [1]})
    with pytest.raises(ValueError, match="number of columns"):
        DataSchemaChecker({"a": "int", "b": "int"}).fit(spark.createDataFrame(pdf))


def test_schema_checker_invalid_dtype(spark):
    pdf = pd.DataFrame({"a": [1]})
    with pytest.raises(ValueError, match="Invalid data type"):
        DataSchemaChecker({"a": "complex128"}).fit(spark.createDataFrame(pdf))


def test_schema_checker_uncoercible_left_unchanged(spark):
    pdf = pd.DataFrame({"a": ["x", "y", "1"]})
    sdf = spark.createDataFrame(pdf)
    chk = DataSchemaChecker({"a": "int64"})
    out = chk.fit(sdf).transform(sdf)
    # cast would fail -> column reported but left unchanged
    # (pandas_dq.py:1192-1193)
    assert dict(out.dtypes)["a"] == "string"
    assert len(chk.error_df_) == 1
