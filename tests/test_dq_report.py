"""dq_report golden tests: expected issue strings computed with pandas
(the reference's substrate) following pandas_dq.py:51-542 line-by-line.
"""

from __future__ import annotations

import numpy as np
import pytest

from pandas_dq_spark.operators.dq_report import GOOD, BAD, build_dq_report

from .fixtures import messy_sdf


@pytest.fixture(scope="module")
def report(spark):
    sdf, pdf = messy_sdf(spark)
    return build_dq_report(sdf), pdf


def test_schema_and_shape(spark, report):
    rep, pdf = report
    sdf_out = rep.to_spark(spark)
    assert sdf_out.count() == len(pdf.columns)
    assert sdf_out.columns == [
        "column_name",
        "data_type",
        "missing_values_pct",
        "unique_values_pct",
        "minimum_value",
        "maximum_value",
        "dq_issue",
    ]


def test_missing_value_string_exact(report):
    rep, pdf = report
    n_missing = int(pdf["num_missing"].isnull().sum())
    expected = f"{n_missing} missing values. Impute them with mean, median, mode, or a constant value such as 123."
    assert expected in rep.issues["num_missing"]
    assert rep.missing_pct["num_missing"] == pytest.approx(
        100 * pdf["num_missing"].isnull().sum() / len(pdf)
    )


def test_unique_pct_truncation_and_na_for_floats(report):
    rep, pdf = report
    assert rep.unique_pct["num_outlier"] == "NA"
    assert rep.unique_pct["cat_rare"] == int(100 * pdf["cat_rare"].nunique() / len(pdf))
    assert rep.unique_pct["id_str"] == 100


def test_rare_category_string_exact(report):
    rep, pdf = report
    vc = pdf["cat_rare"].value_counts(normalize=True)
    rare = vc[vc < 0.01].index.tolist()
    assert len(rare) == 2
    expected = f"{len(rare)} rare categories: {rare}. Group them into a single category or drop the categories."
    assert expected in rep.issues["cat_rare"]


def test_outlier_string_exact(report):
    rep, pdf = report
    col = "num_outlier"
    q1, q3 = pdf[col].quantile(0.25), pdf[col].quantile(0.75)
    iqr = q3 - q1
    lb, ub = q1 - 1.5 * iqr, q3 + 1.5 * iqr
    n_out = int(((pdf[col] < lb) | (pdf[col] > ub)).sum())
    expected = f"Column has {n_out} outliers greater than upper bound ({ub:.2f}) or lower than lower bound({lb:.2f}). Cap them or remove them."
    assert expected in rep.issues[col]


def test_infinite_string_exact(report):
    rep, pdf = report
    expected = "7 infinite values. Replace them with a finite value."
    assert expected in rep.issues["num_inf"]
    assert "columns with infinite values in the dataset" in rep.summary[BAD]


def test_correlation_flags_later_column(report):
    rep, pdf = report
    # corr_b comes after corr_a in column order -> corr_b is flagged
    assert "Column has a high correlation with ['corr_a']" in rep.issues["corr_b"]
    assert "high correlation" not in rep.issues["corr_a"]


def test_id_and_zero_variance(report):
    rep, _ = report
    assert "Possible ID column: drop before modeling step." in rep.issues["id_str"]
    assert (
        "Possible Zero-variance or low information colum: drop before modeling step."
        in rep.issues["const_col"]
    )


def test_min_max_for_missing_and_plain_cols(report):
    rep, pdf = report
    # missing cols that are in number_cols still get min/max via the
    # reference's elif branch (pandas_dq.py:217-218, 225-226) with
    # NaN-skipping aggregates
    assert rep.min_val["num_missing"] == str(pdf["num_missing"].min())
    assert rep.max_val["num_missing"] == str(pdf["num_missing"].max())
    # join-reindex upcast (pandas_dq.py:230): the frame has ineligible
    # (string) columns, so int cells render as float64 strings
    assert rep.min_val["int_plain"] == str(float(pdf["int_plain"].min()))
    assert rep.max_val["int_plain"] == str(float(pdf["int_plain"].max()))
    # a missing col NOT in number_cols stays blank
    assert rep.min_val["num_mostly_missing"] in (
        "",
        str(pdf["num_mostly_missing"].min()),
    )


def test_outliers_not_counted_on_nan(spark):
    import pandas as pd

    # one true outlier + NaNs: reference counts 1, an unguarded Spark
    # predicate would count NaN > ub as TRUE (ADVICE r01, high)
    pdf = pd.DataFrame(
        {
            "v": [1.0, 2.0, 1.5, 2.5, 1.2, 2.2, 1.7, 60.0, np.nan, np.nan],
            "w": list(range(10)),
        }
    )
    rep = build_dq_report(spark.createDataFrame(pdf))
    ref = pdf["v"]
    q1, q3 = ref.quantile(0.25), ref.quantile(0.75)
    lb, ub = q1 - 1.5 * (q3 - q1), q3 + 1.5 * (q3 - q1)
    n_out = int(((ref < lb) | (ref > ub)).sum())
    assert n_out == 1
    assert f"Column has {n_out} outliers" in rep.issues["v"]
    # NaN-skipping min/max populated despite the column being missing
    assert rep.min_val["v"] == str(ref.min())
    assert rep.max_val["v"] == str(ref.max())


def test_no_issue_fill(report):
    rep, _ = report
    assert rep.issues["cat_bool_str"] == "No issue"


def test_target_imbalance(spark):
    sdf, pdf = messy_sdf(spark)
    rep = build_dq_report(sdf, target="target_cls")
    assert (
        rep.issues["target_cls"]
        == "Target column. Appears to have Imbalanced classes. Try balancing classes."
    )
    assert "Imbalanced classes in target variable (target_cls)" in rep.summary[BAD]


def test_good_news_strings(report):
    rep, _ = report
    assert "There are no duplicate rows in this dataset" in rep.summary[GOOD]
    # typo preserved from reference ("datatset", pandas_dq.py:252)
    assert "There are no duplicate columns in this datatset" in rep.summary[GOOD]


def test_duplicate_rows_counted(spark):
    import pandas as pd

    pdf = pd.DataFrame({"a": [1, 1, 2, 3], "b": ["x", "x", "y", "z"]})
    rep = build_dq_report(spark.createDataFrame(pdf))
    assert (
        "There are 1 duplicate rows in the dataset. De-Dup these rows using Fix_DQ."
        in rep.summary[BAD]
    )
    # stats computed on the deduplicated frame
    assert rep.n_rows == 3
