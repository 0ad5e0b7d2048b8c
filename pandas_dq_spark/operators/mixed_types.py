"""Mixed-type detection — the Spark analogue of A9 (SURVEY.md §2.4).

The reference detects object columns whose cells hold >1 Python type
via ``applymap(type).nunique()`` (pandas_dq.py:357-358, 981-991).  A
Spark column is single-typed, so the engine-mode analogue classifies
each STRING value into a parse class (int / float / bool / date /
string) with regexes and counts distinct classes per column — a string
column whose values parse into >1 class is 'mixed'.

NaN quirk (Q4): pandas counts NaN as ``float``, so a column with
missing values always shows >=2 types; ``Fix_DQ.fit`` subtracts
missing-only mixes (987) while ``dq_report`` does not (358).  Both
behaviors are offered via ``count_null_as_class``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_INT_RE = r"^[+-]?[0-9]+$"
_FLOAT_RE = r"^[+-]?([0-9]+\.[0-9]*|\.[0-9]+|[0-9]+\.?[0-9]*[eE][+-]?[0-9]+)$"
_BOOL_RE = r"^(?i)(true|false)$"
_DATE_RE = r"^[0-9]{4}-[0-9]{2}-[0-9]{2}([ T][0-9]{2}:[0-9]{2}(:[0-9]{2}(\.[0-9]+)?)?)?$"


def parse_class(c: Column) -> Column:
    """Parse class of a string value: int|float|bool|date|str|null."""
    return (
        F.when(c.isNull(), "null")
        .when(c.rlike(_INT_RE), "int")
        .when(c.rlike(_FLOAT_RE), "float")
        .when(c.rlike(_BOOL_RE), "bool")
        .when(c.rlike(_DATE_RE), "date")
        .otherwise("str")
    )


def mixed_type_report(
    df: DataFrame,
    columns: list[str] | None = None,
    count_null_as_class: bool = False,
) -> DataFrame:
    """One fused agg: per string column, the number of distinct parse
    classes and whether the column is 'mixed' (>1 class).

    Returns (column_name, n_classes, is_mixed)."""
    from ..plans.profile import col_kind

    cols = [
        f.name
        for f in df.schema.fields
        if col_kind(f.dataType) == "string"
        and (columns is None or f.name in columns)
    ]
    aggs = []
    for c in cols:
        cls = parse_class(F.col(c))
        if not count_null_as_class:
            cls = F.when(F.col(c).isNull(), None).otherwise(cls)
        aggs.append(F.count_distinct(cls).alias(c))
    if not aggs:
        return df.sparkSession.createDataFrame(
            [], "column_name string, n_classes bigint, is_mixed boolean"
        )
    row = df.agg(*aggs).collect()[0].asDict()
    rows = [(c, int(row[c] or 0), (row[c] or 0) > 1) for c in cols]
    return df.sparkSession.createDataFrame(
        rows, "column_name string, n_classes bigint, is_mixed boolean"
    )
