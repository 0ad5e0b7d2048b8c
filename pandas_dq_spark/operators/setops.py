"""Set-comparison operators (SURVEY.md §2.7, A18).

``compare_unique`` (pandas_dq.py:611-656) collects unique-value sets;
here the set differences are computed distributed via ``exceptAll`` on
distinct single-column projections — only the (small) differences are
collected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def compare_unique(df1: DataFrame, df2: DataFrame, column: str) -> dict:
    u1 = df1.select(F.col(column).alias("v")).distinct().cache()
    u2 = df2.select(F.col(column).alias("v")).distinct().cache()
    count_1 = u1.count()
    count_2 = u2.count()
    diff_1_2 = [r["v"] for r in u1.exceptAll(u2).collect()]
    diff_2_1 = [r["v"] for r in u2.exceptAll(u1).collect()]
    u1.unpersist()
    u2.unpersist()
    return {
        "unique_count_in_df1": count_1,
        "unique_count_in_df2": count_2,
        "diff_between_df1_df2": diff_1_2,
        "diff_between_df2_df1": diff_2_1,
    }


def left_subtract(l1: list, l2: list) -> list:
    """List difference on names (pandas_dq.py:604-609) — driver-side."""
    return [i for i in l1 if i not in l2]


def find_remove_columns_with_infinity(
    df: DataFrame, remove: bool = False, verbose: int = 0
):
    """``EDA_find_remove_columns_with_infinity`` equivalent
    (pandas_dq.py:1638-1662): list float columns containing +-inf;
    optionally return the DataFrame without them.  One fused agg."""
    from ..plans.profile import col_kind

    float_cols = [
        f.name for f in df.schema.fields if col_kind(f.dataType) == "float"
    ]
    if not float_cols:
        return df if remove else []
    row = (
        df.agg(
            *[
                F.sum(
                    F.col(c).isin(float("inf"), float("-inf")).cast("long")
                ).alias(c)
                for c in float_cols
            ]
        )
        .collect()[0]
        .asDict()
    )
    inf_cols = [c for c in float_cols if (row[c] or 0) > 0]
    if verbose:
        print(f"    there are {len(inf_cols)} columns with infinite values in your data")
    if remove:
        return df.drop(*inf_cols)
    return inf_cols
