"""Iceberg source — reference src/duckdb/iceberg.rs:48-89.

The reference registers ``iceberg_scan(path, allow_moved_paths, …)``
with a lazy ``INSTALL/LOAD iceberg`` (src/duckdb/connection.rs:130-142).
Spark's integration is the iceberg-spark-runtime catalog; optional here,
so gated behind MissingDependency.  ``skip_schema_inference`` and
``metadata_compression_codec`` are catalog-level in Spark and accepted
but ignored with a warning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pg_analytics_spark.errors import MissingDependency, fallback_warning
from pg_analytics_spark.sources.base import apply_common


def load(spark: SparkSession, files: list[str], opts: dict) -> DataFrame:
    if len(files) != 1:
        raise MissingDependency("iceberg source takes exactly one table path")
    for k in ("allow_moved_paths", "metadata_compression_codec", "skip_schema_inference"):
        if k in opts:
            fallback_warning(f"iceberg option {k} handled by the Spark catalog; ignored")
    try:
        df = spark.read.format("iceberg").load(files[0])
    except Exception as exc:
        raise MissingDependency(
            "iceberg format requires iceberg-spark-runtime on the classpath; "
            "not available in this environment"
        ) from exc
    return apply_common(df, opts)
