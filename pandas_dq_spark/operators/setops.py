"""Set-comparison operators (SURVEY.md §2.7, A18).

``compare_unique`` (pandas_dq.py:611-656) collects unique-value sets;
here the set differences are computed distributed via ``exceptAll`` on
distinct single-column projections — only the (small) differences are
collected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def compare_unique(
    df1: DataFrame, df2: DataFrame, column: str, max_collect: int = 100_000
) -> dict:
    """Set comparison of a column's distinct values (pandas_dq.py:
    611-656 returns the full difference SETS).

    Scale guard (VERDICT r02 item 8): the set differences are computed
    distributed (``exceptAll`` on distinct projections) and their exact
    COUNTS are always returned (``diff_count_df1_df2`` /
    ``diff_count_df2_df1``).  The value lists themselves are collected
    only while a difference stays within ``max_collect`` values —
    above it (e.g. two mostly-disjoint ID columns) the list is ``None``
    and the driver never materializes the set, matching reference
    semantics everywhere the reference itself is usable."""
    u1 = df1.select(F.col(column).alias("v")).distinct().cache()
    u2 = df2.select(F.col(column).alias("v")).distinct().cache()
    try:
        count_1 = u1.count()
        count_2 = u2.count()
        d12 = u1.exceptAll(u2)
        d21 = u2.exceptAll(u1)
        n12 = d12.count()
        n21 = d21.count()
        diff_1_2 = (
            [r["v"] for r in d12.collect()] if n12 <= max_collect else None
        )
        diff_2_1 = (
            [r["v"] for r in d21.collect()] if n21 <= max_collect else None
        )
    finally:
        u1.unpersist()
        u2.unpersist()
    return {
        "unique_count_in_df1": count_1,
        "unique_count_in_df2": count_2,
        "diff_count_df1_df2": n12,
        "diff_count_df2_df1": n21,
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
