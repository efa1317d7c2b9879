"""Delta Lake source — reference src/duckdb/delta.rs:41-61.

The reference registers ``delta_scan('<path>')`` with options
files/select/preserve_casing.  Spark's native integration is the
``delta`` format from the delta-spark package; it is optional in this
environment so the import is gated (MissingDependency when absent),
mirroring the reference's lazy ``INSTALL/LOAD delta``
(src/duckdb/connection.rs:116-128).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pg_analytics_spark.errors import MissingDependency
from pg_analytics_spark.sources.base import apply_common


def load(spark: SparkSession, files: list[str], opts: dict) -> DataFrame:
    if len(files) != 1:
        raise MissingDependency("delta source takes exactly one table path")
    try:
        df = spark.read.format("delta").load(files[0])
    except Exception as exc:  # delta-spark jars not on classpath here
        raise MissingDependency(
            "delta format requires the delta-spark package on the classpath "
            "(io.delta:delta-spark_2.13); not available in this environment"
        ) from exc
    return apply_common(df, opts)
