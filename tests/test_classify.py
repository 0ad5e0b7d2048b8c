"""classify_columns role assignments on the messy fixture — expected
roles derived by hand from the reference cascade (pandas_dq.py:
1364-1625; quirks documented in operators/classify.py)."""

from __future__ import annotations

import pytest

from pandas_dq_spark.operators.classify import classify_columns

from .fixtures import messy_sdf


@pytest.fixture(scope="module")
def roles(spark):
    sdf, _ = messy_sdf(spark)
    return classify_columns(sdf)


def test_id_detect(roles):
    assert "id_str" in roles["id_vars"]


def test_zero_variance_deleted(roles):
    assert "const_col" in roles["cols_delete"]


def test_mostly_missing_deleted(roles):
    # >= 90% missing deletes (pandas_dq.py:1389); 85% does NOT
    assert "num_mostly_missing" not in roles["cols_delete"]


def test_inf_cols_deleted(roles):
    # classify_columns deletes infinity columns (pandas_dq.py:1390)
    assert "num_inf" in roles["cols_delete"]


def test_bools(roles):
    assert "cat_bool_str" in roles["string_bool_vars"]
    assert "num_bool" in roles["num_bool_vars"]


def test_int_year_becomes_date(roles):
    # ints in [1900, 2050] classify as dates because pd.to_datetime
    # accepts any integer (quirk, pandas_dq.py:1470-1493)
    assert "int_year" in roles["date_vars"]
    assert "int_plain" in roles["int_vars"]


def test_cats_and_floats(roles):
    assert "cat_rare" in roles["cat_vars"]
    assert "factor_col" in roles["cat_vars"]
    for c in ["num_missing", "num_outlier", "corr_a", "corr_b", "num_skewed_pos"]:
        assert c in roles["continuous_vars"], c


def test_float64_low_cardinality_reverts_to_continuous(spark):
    # float64 with 3..15 distinct: marked cat then un-marked by the
    # dtype==float fixup (pandas_dq.py:1546-1560) -> continuous
    import pandas as pd

    pdf = pd.DataFrame({"f": ([1.0, 2.0, 3.0, 4.0] * 50)})
    roles = classify_columns(spark.createDataFrame(pdf))
    assert "f" in roles["continuous_vars"]
    assert "f" not in roles["cat_vars"]


def test_float32_low_cardinality_stays_cat(spark):
    import pandas as pd
    import numpy as np

    pdf = pd.DataFrame({"f": np.array([1.0, 2.0, 3.0, 4.0] * 50, dtype=np.float32)})
    roles = classify_columns(spark.createDataFrame(pdf))
    assert "f" in roles["cat_vars"]


def test_nlp_and_discrete_strings(spark):
    import pandas as pd

    n = 300
    pdf = pd.DataFrame(
        {
            "nlp_text": [f"this is a long unique document number {i} " + "x" * 40 for i in range(n)],
            "discrete_str": [f"medium-length-repeating-string-{i % 120:04d}" for i in range(n)],
        }
    )
    roles = classify_columns(spark.createDataFrame(pdf))
    assert "nlp_text" in roles["nlp_vars"]
    # discrete (mean len >= 30, max < 50), cardinality 120 -> stays discrete
    assert "discrete_str" in roles["discrete_string_vars"]
