"""Sources & sinks (SURVEY.md §2.1 S1-S8 + WT sinks).

Extension dispatch mirrors pandas_dq.py:80-111; the ``csv_engine``
argument is accepted for API parity but is a no-op — Spark's native
vectorized CSV reader replaces the pandas/polars/pyarrow engines.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def read_any(
    spark: SparkSession,
    path: str,
    csv_engine: str = "pandas",
    on_unsupported: str = "raise",
) -> DataFrame | str:
    """S1-S4 extension dispatch (pandas_dq.py:80-111).

    On an unsupported extension the reference prints and RETURNS THE
    INPUT UNCHANGED (pandas_dq.py:108-111); ``on_unsupported=
    "return_input"`` reproduces that (used by ``dq_report`` for
    fidelity), while the library-level default raises — a path string
    silently flowing on as a DataFrame is a bug factory."""
    ext = os.path.splitext(path)[-1].lower()
    if ext == ".csv":
        return spark.read.csv(path, header=True, inferSchema=True)
    if ext == ".parquet":
        return spark.read.parquet(path)
    if ext in (".feather", ".arrow", ".ftr"):
        # S3: no native Spark source; Arrow-read on the driver then
        # parallelize — acceptable because feather files are single-
        # machine artifacts by construction
        import pyarrow.feather as feather

        tbl = feather.read_table(path)
        return spark.createDataFrame(tbl.to_pandas())
    # byte-identical reference message (pandas_dq.py:109)
    print("    Unsupported file format. Please use CSV, parquet, feather or arrow.")
    if on_unsupported == "return_input":
        return path
    raise ValueError(f"Unsupported file extension: {ext}")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """WT sink: parquet writer with dynamic partition overwrite so a
    resumed run replaces only the partitions it recomputes (the
    Iceberg ``overwritePartitions`` analogue without a catalog)."""
    w = df.write.mode(mode)
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.option("partitionOverwriteMode", "dynamic").parquet(path)


def write_training_shards(
    df,
    path: str,
    docs_per_shard: int = 100_000,
    key_col: str | None = None,
    compression: str = "gzip",
) -> int:
    """Export a prepared corpus as sharded JSONL (the format training
    jobs stream): one JSON object per line, ``ceil(n/docs_per_shard)``
    shards, returns the shard count.

    Sharding is deterministic when ``key_col`` is given — rows are
    hash-assigned by the key, so re-exports place every document in
    the same shard (resumable/verifiable exports); otherwise a plain
    repartition balances rows without a stable assignment.  The
    JSON encoding and the write are one narrow pass after the
    exchange."""
    from pyspark.sql import functions as F

    n = df.count()
    n_shards = max(1, -(-n // docs_per_shard))
    if key_col is not None:
        out = df.repartition(n_shards, F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_shards)))
    else:
        out = df.repartition(n_shards)
    (
        out.select(F.to_json(F.struct(*df.columns)).alias("value"))
        .write.mode("overwrite")
        .option("compression", compression)
        .text(path)
    )
    return n_shards
