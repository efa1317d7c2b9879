"""Geospatial column math without an engine extension.

The reference's spatial support is DuckDB's spatial extension behind
``st_read`` (src/duckdb/spatial.rs:57-82) — file ingestion, which
sources/spatial.py covers for GeoJSON.  This module adds the compute
side as plain double arithmetic (`pyspark.sql.functions` trig), so it
needs no Sedona/extension and the DuckDB oracle can mirror it exactly.

Float caveat: libm trig is not correctly-rounded, so cross-engine
results can differ in the last ulp — consumers round distances (6
decimals ≈ millimeters) before comparing or filtering, same policy as
the cosine-similarity operators.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def haversine_km(lat1, lon1, lat2, lon2) -> Column:
    """Great-circle distance in km (haversine formula, double math)."""
    la1, lo1, la2, lo2 = (F.radians(_c(c)) for c in (lat1, lon1, lat2, lon2))
    dlat = la2 - la1
    dlon = lo2 - lo1
    a = (
        F.sin(dlat / 2) * F.sin(dlat / 2)
        + F.cos(la1) * F.cos(la2) * F.sin(dlon / 2) * F.sin(dlon / 2)
    )
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.sqrt(a))


def in_bbox(lat, lon, south: float, west: float, north: float, east: float) -> Column:
    """Point-in-bounding-box predicate (no antimeridian handling)."""
    return (
        (_c(lat) >= F.lit(south))
        & (_c(lat) <= F.lit(north))
        & (_c(lon) >= F.lit(west))
        & (_c(lon) <= F.lit(east))
    )
