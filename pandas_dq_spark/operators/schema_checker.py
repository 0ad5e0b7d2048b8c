"""Distributed ``DataSchemaChecker`` (reference: pandas_dq.py:1064-1195).

``fit`` is pure metadata (StructType comparison — no job).
``transform`` is a single ``select`` of casts; a column whose cast
fails is reported and left unchanged, matching the reference's
try/except skip at pandas_dq.py:1192-1193 (we detect failure with a
``try_cast`` null-delta agg instead of throwing).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.dtypes import (
    friendly_to_pandas_name,
    friendly_to_spark_type,
    pandas_dtype_name,
)

ERROR_SCHEMA = (
    "column string, expected_dtype string, actual_dtype string, "
    "data_dtype_mismatch string"
)


@dataclass
class SchemaErrors:
    rows: list[tuple] = field(default_factory=list)

    def to_spark(self, spark: SparkSession) -> DataFrame:
        return spark.createDataFrame(self.rows, ERROR_SCHEMA)

    def __len__(self) -> int:
        return len(self.rows)


class DataSchemaChecker:
    def __init__(self, schema: dict[str, str]):
        self.schema = schema
        self.translated_schema: dict[str, T.DataType] | None = None
        self.error_df_: SchemaErrors | None = None

    def fit(self, df: DataFrame) -> "DataSchemaChecker":
        if len(df.columns) != len(self.schema):
            # identical message to pandas_dq.py:1110-1111
            raise ValueError(
                "The number of columns in the dataframe does not match the number of columns in the schema"
            )
        self.translated_schema = {
            col: friendly_to_spark_type(dtype) for col, dtype in self.schema.items()
        }
        return self

    def transform(self, df: DataFrame) -> DataFrame:
        if self.translated_schema is None:
            raise RuntimeError("fit must be called before transform")
        errors = SchemaErrors()
        mismatched: list[str] = []
        for col, expected in self.translated_schema.items():
            actual = df.schema[col].dataType
            if actual.simpleString() != expected.simpleString():
                exp_name = friendly_to_pandas_name(self.schema[col])
                act_name = pandas_dtype_name(actual)
                errors.rows.append(
                    (
                        col,
                        exp_name,
                        act_name,
                        "Column '{}' has data type '{}' but expected '{}'".format(
                            col, act_name, exp_name
                        ),
                    )
                )
                mismatched.append(col)
        self.error_df_ = errors

        if not mismatched:
            print("**No Data Schema Errors**")
            return df

        # which casts are safe? one agg of try_cast null-deltas
        probes = []
        for col in mismatched:
            expected = self.translated_schema[col]
            src = F.col(col)
            if isinstance(expected, (T.TimestampType, T.DateType)):
                cast = F.try_to_timestamp(src.cast("string"))
            else:
                cast = src.try_cast(expected)
            probes.append(
                F.sum((cast.isNull() & src.isNotNull()).cast("long")).alias(col)
            )
        fail_counts = df.agg(*probes).collect()[0].asDict()

        exprs = []
        for col in df.columns:
            if col in mismatched:
                expected = self.translated_schema[col]
                if fail_counts[col] and fail_counts[col] > 0:
                    exp_name = friendly_to_pandas_name(self.schema[col])
                    print(
                        f"Converting {col} to {exp_name} is erroring. Please convert it yourself."
                    )
                    exprs.append(F.col(col))
                elif isinstance(expected, (T.TimestampType, T.DateType)):
                    exprs.append(
                        F.try_to_timestamp(F.col(col).cast("string")).alias(col)
                    )
                else:
                    exprs.append(F.col(col).cast(expected).alias(col))
            else:
                exprs.append(F.col(col))
        return df.select(*exprs)

    def fit_transform(self, df: DataFrame) -> DataFrame:
        return self.fit(df).transform(df)
