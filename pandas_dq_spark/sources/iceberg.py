"""Iceberg catalog wiring for the north-rule pipeline (BASELINE.json:
'over Iceberg tables of Common-Crawl-style web pages').

The public Iceberg-Spark integration is configuration + the DataFrame
`writeTo` API — no code dependency until a write happens, so this
module is usable to BUILD sessions anywhere and degrades explicitly
when `iceberg-spark-runtime` is not on the classpath (it is not
bundled in this test container; tests cover the config surface and the
parquet fallback).

At cluster scale the pipeline's bucketed write maps onto Iceberg as:

    df.writeTo("cat.db.pages").overwritePartitions()

which is the transactional equivalent of the dynamic-partition-
overwrite parquet sink in sources.io.write_partitioned — same
idempotent per-bucket replace semantics the checkpoint/resume logic
relies on (webtext/pipeline.run_pipeline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_conf(
    warehouse: str, catalog: str = "local"
) -> dict[str, str]:
    """The standard HadoopCatalog session configuration (public
    Iceberg quickstart settings)."""
    return {
        "spark.sql.extensions": (
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"
        ),
        f"spark.sql.catalog.{catalog}": "org.apache.iceberg.spark.SparkCatalog",
        f"spark.sql.catalog.{catalog}.type": "hadoop",
        f"spark.sql.catalog.{catalog}.warehouse": warehouse,
    }


def iceberg_available(spark: SparkSession) -> bool:
    """True iff the Iceberg runtime is on the JVM classpath."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


_FILE_EXTS = (".parquet", ".pq", ".csv", ".json", ".orc", ".arrow", ".feather")

_IDENT = __import__("re").compile(r"[A-Za-z_][A-Za-z0-9_]*\Z")


def _is_table_identifier(target: str) -> bool:
    """Only ``catalog.db.table`` — exactly two dots, every segment a
    plain identifier, no known file extension — selects the Iceberg
    sink.  Paths (any separator) and dotted FILENAMES ('out.parquet',
    'out.backup', 'data.v2') are parquet paths (ADVICE r02: a one-dot
    filename must never raise 'Iceberg runtime missing')."""
    if "/" in target or "\\" in target:
        return False
    if target.lower().endswith(_FILE_EXTS):
        return False
    parts = target.split(".")
    return len(parts) == 3 and all(_IDENT.match(p) for p in parts)


def write_pages(
    df: DataFrame,
    target: str,
    partition_cols: list[str] | None = None,
    create: bool = False,
) -> str:
    """Write the pipeline output to ``target``.

    A dotted catalog identifier ('cat.db.table' — no path separator,
    no file extension) selects the Iceberg `writeTo` path —
    `overwritePartitions()` (or `create()` on first write); anything
    else (absolute/relative paths, bare filenames like 'out.parquet')
    is a parquet path and uses the dynamic-partition-overwrite sink.
    Returns which sink ran ('iceberg' | 'parquet') so callers/tests
    can assert the routing.
    """
    if _is_table_identifier(target):
        if not iceberg_available(df.sparkSession):
            raise RuntimeError(
                "Iceberg runtime not on the classpath — add "
                "iceberg-spark-runtime to spark.jars.packages and build "
                "the session with iceberg_conf(); or pass a path sink."
            )
        w = df.writeTo(target)
        if partition_cols:
            from pyspark.sql import functions as F

            w = w.partitionedBy(*[F.col(c) for c in partition_cols])
        if create:
            w.createOrReplace()
        else:
            w.overwritePartitions()
        return "iceberg"
    from .io import write_partitioned

    write_partitioned(df, target, partition_cols)
    return "parquet"
