"""Spatial source — reference src/duckdb/spatial.rs:29-82.

The reference wraps GDAL's ``st_read`` (GeoJSON, XLSX, shapefiles, …)
through DuckDB's spatial extension, exposing 9 options
(spatial.rs:29-39).  Spark path and option disposition:

| st_read option        | here                                          |
|-----------------------|-----------------------------------------------|
| files                 | required (positional)                         |
| keep_wkb              | supported — geometry also surfaced serialized |
| spatial_filter_box    | supported — envelope-intersection prefilter   |
|                       | ("minx,miny,maxx,maxy"), GDAL's bbox          |
|                       | semantics, computed with codegen regexp/HOFs  |
| layer                 | rejected (GDAL layer model)                   |
| sequential_layer_scan | rejected (GDAL layer model)                   |
| spatial_filter        | rejected (needs WKB geometry intersection)    |
| open_options          | rejected (GDAL driver passthrough)            |
| allowed_drivers       | rejected (GDAL driver passthrough)            |
| sibling_files         | rejected (GDAL driver passthrough)            |

GeoJSON is JSON — read natively, keeping the ``geometry`` struct; a
full GDAL/Sedona integration is out of scope for this environment
(Sedona jars absent) and gated behind MissingDependency.  WKT/WKB
geometry COLUMNS in ordinary parquet/csv tables are handled by
functions/geo.py (wkt_envelope, wkb_point_xy, …), not this source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pg_analytics_spark.errors import MissingDependency, UnsupportedFormat
from pg_analytics_spark.sources.base import _truthy, apply_common

_GDAL_ONLY = (
    "layer",
    "sequential_layer_scan",
    "spatial_filter",
    "open_options",
    "allowed_drivers",
    "sibling_files",
)


def _parse_box(value) -> tuple[float, float, float, float]:
    if isinstance(value, str):
        parts = [p for p in value.replace(";", ",").split(",") if p.strip()]
    else:
        parts = list(value)
    if len(parts) != 4:
        raise UnsupportedFormat(
            "spatial_filter_box must be 'minx,miny,maxx,maxy', got "
            f"{value!r}"
        )
    return tuple(float(p) for p in parts)  # type: ignore[return-value]


def load(spark: SparkSession, files: list[str], opts: dict) -> DataFrame:
    if all(f.lower().endswith(".gpkg") for f in files):
        # GeoPackage has a real layer model — `layer` is honored there
        from pg_analytics_spark.sources import geopackage as _gpkg

        for k in _GDAL_ONLY:
            if k in opts and k != "layer":
                raise UnsupportedFormat(
                    f"st_read option {k!r} requires the GDAL driver stack "
                    "(reference spatial.rs:29-39), unavailable here"
                )
        return _gpkg.load(spark, files, opts)
    for k in _GDAL_ONLY:
        if k in opts:
            raise UnsupportedFormat(
                f"st_read option {k!r} requires the GDAL driver stack "
                "(reference spatial.rs:29-39), unavailable here"
            )
    if all(f.lower().endswith(".shp") for f in files):
        from pg_analytics_spark.sources import shapefile as _shp

        return _shp.load(spark, files, opts)
    if all(f.lower().endswith((".kml", ".kmz")) for f in files):
        from pg_analytics_spark.sources import kml as _kml

        return _kml.load(spark, files, opts)
    if all(f.lower().endswith(".gml") for f in files):
        from pg_analytics_spark.sources import gml as _gml

        return _gml.load(spark, files, opts)
    if all(f.lower().endswith(".fgb") for f in files):
        from pg_analytics_spark.sources import flatgeobuf as _fgb

        return _fgb.load(spark, files, opts)
    if all(f.lower().endswith(".xlsx") for f in files):
        # GDAL's st_read reads spreadsheets as attribute-only tables;
        # sources/xlsx.py is the dependency-free equivalent
        from pg_analytics_spark.sources import xlsx as _xlsx

        return _xlsx.load(spark, files, opts)
    if all(f.lower().endswith((".geojson", ".json")) for f in files):
        df = spark.read.option("multiLine", "true").json(files)
        # GeoJSON FeatureCollection → one row per feature
        if "features" in df.columns:
            df = df.select(F.explode("features").alias("feature")).select(
                F.col("feature.geometry").alias("geometry"),
                F.col("feature.properties").alias("properties"),
            )
        if "spatial_filter_box" in opts:
            from pg_analytics_spark.functions.geo import (
                envelope_intersects,
                geojson_envelope,
            )

            minx, miny, maxx, maxy = _parse_box(opts["spatial_filter_box"])
            df = df.filter(
                envelope_intersects(
                    geojson_envelope("geometry"), minx, miny, maxx, maxy
                )
            )
        if _truthy(opts.get("keep_wkb")):
            # WKB encoding requires a geo library (Sedona/shapely); keep the
            # JSON geometry struct and expose its serialized form instead.
            df = df.withColumn("wkb_geometry", F.to_json("geometry").cast("binary"))
        return apply_common(df, opts)
    raise MissingDependency(
        "non-GeoJSON spatial formats require GDAL/Sedona, unavailable here"
    )
