"""Spark <-> pandas dtype-name bridging.

The reference reports pandas dtype strings in its findings tables
(pandas_dq.py:148-151 ``df.dtypes``) and its schema checker translates
friendly names to pandas dtypes (pandas_dq.py:1116-1140).  We keep the
engine Spark-native but expose the pandas-style names for report parity.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Spark simpleString -> pandas dtype name as pandas would show for the
# same data loaded from parquet.
_SPARK_TO_PANDAS = {
    "tinyint": "int8",
    "smallint": "int16",
    "int": "int32",
    "bigint": "int64",
    "float": "float32",
    "double": "float64",
    "string": "object",
    "boolean": "bool",
    "timestamp": "datetime64[ns]",
    "timestamp_ntz": "datetime64[ns]",
    "date": "datetime64[ns]",
    "binary": "object",
}

# friendly schema-declaration names -> Spark type; mirrors the fixed
# translation table at pandas_dq.py:1116-1140 (DataSchemaChecker.fit).
FRIENDLY_TO_SPARK: dict[str, T.DataType] = {}
for _names, _t in [
    (["string", "object", "category", "str", "text", "NLP", "nlp"], T.StringType()),
    (["boolean", "bool"], T.BooleanType()),
    (["np.int8", "int8"], T.ByteType()),
    (["np.int16", "int16"], T.ShortType()),
    (["int32", "np.int32"], T.IntegerType()),
    (["integer", "int", "int64", "np.int64"], T.LongType()),
    (["date"], T.TimestampType()),
    (["float"], T.DoubleType()),
    (["np.float32", "float32"], T.FloatType()),
    (["np.float64", "float64"], T.DoubleType()),
]:
    for _n in _names:
        FRIENDLY_TO_SPARK[_n] = _t


def pandas_dtype_name(spark_type: T.DataType) -> str:
    return _SPARK_TO_PANDAS.get(spark_type.simpleString(), "object")


def friendly_to_spark_type(name: str) -> T.DataType:
    try:
        return FRIENDLY_TO_SPARK[name]
    except KeyError:
        # identical message shape to pandas_dq.py:1139-1140
        raise ValueError("Invalid data type: {}".format(name)) from None


def friendly_to_pandas_name(name: str) -> str:
    """The pandas dtype string the reference's translation table yields
    (pandas_dq.py:1116-1140) — used in schema error messages."""
    t = friendly_to_spark_type(name)
    if name == "date":
        return "datetime64[ns]"
    if isinstance(t, T.StringType):
        return "object"
    return pandas_dtype_name(t)
