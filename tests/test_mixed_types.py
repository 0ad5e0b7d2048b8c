"""A9 mixed-type analogue (operators/mixed_types.py)."""

from __future__ import annotations

import pandas as pd

from pandas_dq_spark.operators.mixed_types import mixed_type_report


def test_mixed_type_detection(spark):
    pdf = pd.DataFrame(
        {
            "clean_str": ["alpha", "beta", "gamma", "delta"],
            "mixed": ["1", "2.5", "true", "word"],
            "intish": ["1", "2", "3", "-4"],
            "with_null": ["x", None, "y", None],
            "num_col": [1.0, 2.0, 3.0, 4.0],  # non-string: skipped
        }
    )
    out = {
        r["column_name"]: r
        for r in mixed_type_report(spark.createDataFrame(pdf)).collect()
    }
    assert "num_col" not in out
    assert not out["clean_str"]["is_mixed"]
    assert out["mixed"]["is_mixed"] and out["mixed"]["n_classes"] == 4
    assert not out["intish"]["is_mixed"]
    # nulls excluded from classes by default (Fix_DQ semantics, Q4)
    assert not out["with_null"]["is_mixed"]


def test_null_as_class_quirk(spark):
    # dq_report semantics: NaN counts as a type of its own (Q4)
    pdf = pd.DataFrame({"with_null": ["x", None, "y", None]})
    out = mixed_type_report(
        spark.createDataFrame(pdf), count_null_as_class=True
    ).collect()[0]
    # nulls classify as the literal class 'null' -> {str, null} = mixed
    assert out["n_classes"] == 2 and out["is_mixed"]
