"""Source registration: external files → Spark DataFrames/views.

Each module translates the reference's per-format option surface
(reference src/duckdb/{parquet,csv,json,delta,iceberg,spatial}.rs) into
Spark reader options plus post-read transforms.  The shared entry point
is :func:`load_source`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pg_analytics_spark.errors import UnsupportedFormat
from pg_analytics_spark.sources.base import localize_remote
from pg_analytics_spark.sources import csv as _csv
from pg_analytics_spark.sources import delta as _delta
from pg_analytics_spark.sources import iceberg as _iceberg
from pg_analytics_spark.sources import json as _json
from pg_analytics_spark.sources import parquet as _parquet
from pg_analytics_spark.sources import spatial as _spatial
from pg_analytics_spark.sources import avro as _avro
from pg_analytics_spark.sources import rawtext as _rawtext
from pg_analytics_spark.sources import xlsx as _xlsx

_LOADERS = {
    "parquet": _parquet.load,
    "csv": _csv.load,
    "json": _json.load,
    "delta": _delta.load,
    "iceberg": _iceberg.load,
    "spatial": _spatial.load,
    "xlsx": _xlsx.load,
    "avro": _avro.load,
    "text": _rawtext.load,
}


def load_source(
    spark: SparkSession,
    files: str | list[str],
    format: str = "parquet",
    options: dict | None = None,
) -> DataFrame:
    """Load external files with the reference option surface.

    ``files`` accepts a single path/glob, a comma-separated list (the
    reference's ``files`` option splits on commas — src/duckdb/utils.rs:18-31)
    or a Python list.  ``http(s)://`` URLs are fetched to a local cache
    first (base.localize_remote — the reference's httpfs analog).
    """
    fmt = format.lower()
    if fmt not in _LOADERS:
        raise UnsupportedFormat(
            f"format {format!r}; supported: {sorted(_LOADERS)}"
        )
    paths = localize_remote(split_files(files))
    return _LOADERS[fmt](spark, paths, dict(options or {}))


def split_files(files: str | list[str]) -> list[str]:
    """Comma-split semantics of the reference's ``files`` option."""
    if isinstance(files, str):
        return [f.strip() for f in files.split(",") if f.strip()]
    return list(files)


__all__ = ["load_source", "split_files"]
