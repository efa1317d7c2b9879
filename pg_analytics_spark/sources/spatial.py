"""Spatial source — reference src/duckdb/spatial.rs:29-82.

The reference wraps GDAL's ``st_read`` (GeoJSON, XLSX, shapefiles, …)
through DuckDB's spatial extension and returns geometry as WKB when
``keep_wkb`` is set (BinaryType per SURVEY §1.2).

Spark path: GeoJSON is JSON — read natively, keeping the ``geometry``
struct; a full GDAL/Sedona integration is out of scope for this
environment (Sedona jars absent) and gated behind MissingDependency.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pg_analytics_spark.errors import MissingDependency
from pg_analytics_spark.sources.base import _truthy, apply_common


def load(spark: SparkSession, files: list[str], opts: dict) -> DataFrame:
    if all(f.lower().endswith((".geojson", ".json")) for f in files):
        df = spark.read.option("multiLine", "true").json(files)
        # GeoJSON FeatureCollection → one row per feature
        if "features" in df.columns:
            df = df.select(F.explode("features").alias("feature")).select(
                F.col("feature.geometry").alias("geometry"),
                F.col("feature.properties").alias("properties"),
            )
        if _truthy(opts.get("keep_wkb")):
            # WKB encoding requires a geo library (Sedona/shapely); keep the
            # JSON geometry struct and expose its serialized form instead.
            df = df.withColumn("wkb_geometry", F.to_json("geometry").cast("binary"))
        return apply_common(df, opts)
    raise MissingDependency(
        "non-GeoJSON spatial formats require GDAL/Sedona, unavailable here"
    )
