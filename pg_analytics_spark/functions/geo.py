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

import struct as _struct

import pandas as pd
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


# ------------------------------------------------------------------ #
# WKT (text geometry) — codegen-only parse/construct
# ------------------------------------------------------------------ #

_NUM_RE = r"-?[0-9]+(?:\.[0-9]+)?(?:[eE][+-]?[0-9]+)?"


def wkt_point(lon, lat) -> Column:
    """``POINT (lon lat)`` WKT from coordinate columns — string CAST so
    the text matches the oracle engine's double→VARCHAR rendering."""
    return F.concat(
        F.lit("POINT ("),
        _c(lon).cast("string"),
        F.lit(" "),
        _c(lat).cast("string"),
        F.lit(")"),
    )


def wkt_numbers(wkt) -> Column:
    """All numeric tokens of a WKT geometry in order, as array<double>.
    Coordinates alternate x(lon), y(lat) for 2-D geometries of any type
    (POINT/LINESTRING/POLYGON/MULTI*)."""
    return F.transform(
        F.regexp_extract_all(_c(wkt), F.lit(_NUM_RE), F.lit(0)),
        lambda v: v.cast("double"),
    )


def wkt_envelope(wkt) -> Column:
    """Bounding box struct (minx, miny, maxx, maxy) of any 2-D WKT
    geometry — pure codegen (regexp + array HOFs), no geo library."""
    nums = wkt_numbers(wkt)
    xs = F.filter(nums, lambda v, i: i % 2 == F.lit(0))
    ys = F.filter(nums, lambda v, i: i % 2 == F.lit(1))
    return F.struct(
        F.array_min(xs).alias("minx"),
        F.array_min(ys).alias("miny"),
        F.array_max(xs).alias("maxx"),
        F.array_max(ys).alias("maxy"),
    )


def envelope_intersects(
    env: Column, minx: float, miny: float, maxx: float, maxy: float
) -> Column:
    """Envelope-overlap predicate — GDAL's spatial_filter_box semantics
    (bbox intersection prefilter, st_read docs)."""
    return (
        (env["minx"] <= F.lit(maxx))
        & (env["maxx"] >= F.lit(minx))
        & (env["miny"] <= F.lit(maxy))
        & (env["maxy"] >= F.lit(miny))
    )


def geojson_envelope(geometry) -> Column:
    """Bounding box of a GeoJSON geometry STRUCT column (as read by
    sources/spatial.py): flattens the coordinates array to numeric
    tokens — x,y alternate at every nesting depth for 2-D geometries."""
    g = _c(geometry)
    nums = F.transform(
        F.regexp_extract_all(
            F.to_json(g.getField("coordinates")), F.lit(_NUM_RE), F.lit(0)
        ),
        lambda v: v.cast("double"),
    )
    xs = F.filter(nums, lambda v, i: i % 2 == F.lit(0))
    ys = F.filter(nums, lambda v, i: i % 2 == F.lit(1))
    return F.struct(
        F.array_min(xs).alias("minx"),
        F.array_min(ys).alias("miny"),
        F.array_max(xs).alias("maxx"),
        F.array_max(ys).alias("maxy"),
    )


# ------------------------------------------------------------------ #
# WKB (binary geometry) — Arrow-batched decode/encode (Spark has no
# IEEE-754 reinterpret builtin, so binary geometry is the one geo path
# that needs Python; pandas UDFs keep it vectorized)
# ------------------------------------------------------------------ #


def wkb_point_xy(wkb) -> Column:
    """Decode WKB POINT → struct(lon, lat).  Honors the per-value
    byte-order flag; raises on non-point geometry types."""

    @F.pandas_udf("struct<lon:double,lat:double>")
    def _decode(s: pd.Series) -> pd.DataFrame:
        lons, lats = [], []
        for b in s:
            if b is None:
                lons.append(None)
                lats.append(None)
                continue
            order = "<" if b[0] == 1 else ">"
            (gtype,) = _struct.unpack_from(order + "I", b, 1)
            if gtype & 0xFF != 1:
                raise ValueError(f"WKB geometry type {gtype} is not a POINT")
            x, y = _struct.unpack_from(order + "dd", b, 5)
            lons.append(x)
            lats.append(y)
        return pd.DataFrame({"lon": lons, "lat": lats})

    return _decode(_c(wkb))


def to_wkb_point(lon, lat) -> Column:
    """Encode (lon, lat) → little-endian WKB POINT bytes."""

    @F.pandas_udf("binary")
    def _encode(x: pd.Series, y: pd.Series) -> pd.Series:
        out = []
        for xv, yv in zip(x, y):
            if xv is None or yv is None:
                out.append(None)
            else:
                out.append(
                    b"\x01" + _struct.pack("<I", 1) + _struct.pack("<dd", xv, yv)
                )
        return pd.Series(out)

    return _encode(_c(lon), _c(lat))


def point_in_polygon(px, py, xs: list[float], ys: list[float]) -> Column:
    """Ray-cast point-in-polygon as ONE codegen fold — no geo library.

    ``xs``/``ys`` are the polygon ring's vertices (closed implicitly:
    the last vertex connects back to the first).  Standard even-odd
    rule: a horizontal ray from the point crosses an edge when the
    edge's vertices straddle the point's y and the edge's x at that y
    lies right of the point; odd crossing count = inside.  Boundary
    points follow the raw IEEE comparisons (callers pick fixtures off
    edges).  The identical arithmetic expression evaluates in DuckDB
    via a list comprehension (see the geo_point_in_polygon oracle), so
    membership is bit-reproducible cross-engine.
    """
    n = len(xs)
    px_sql = px if isinstance(px, str) else str(px)
    py_sql = py if isinstance(py, str) else str(py)
    terms = []
    for i in range(n):
        j = (i + 1) % n
        x1, y1, x2, y2 = (
            repr(float(xs[i])),
            repr(float(ys[i])),
            repr(float(xs[j])),
            repr(float(ys[j])),
        )
        terms.append(
            f"IF((({y1}D > {py_sql}) != ({y2}D > {py_sql})) AND "
            f"({px_sql} < ({x2}D - {x1}D) * ({py_sql} - {y1}D) / "
            f"({y2}D - {y1}D) + {x1}D), 1, 0)"
        )
    return F.expr("(" + " + ".join(terms) + ") % 2 = 1")


def point_in_polygon_sql(px: str, py: str, xs: list[float], ys: list[float]) -> str:
    """The DuckDB expression computing the SAME even-odd ray cast —
    used by oracles to replay :func:`point_in_polygon` term for term."""
    n = len(xs)
    terms = []
    for i in range(n):
        j = (i + 1) % n
        x1, y1, x2, y2 = (
            repr(float(xs[i])),
            repr(float(ys[i])),
            repr(float(xs[j])),
            repr(float(ys[j])),
        )
        terms.append(
            f"CASE WHEN (({y1} > {py}) != ({y2} > {py})) AND "
            f"({px} < ({x2} - {x1}) * ({py} - {y1}) / "
            f"({y2} - {y1}) + {x1}) THEN 1 ELSE 0 END"
        )
    return "((" + " + ".join(terms) + ") % 2 = 1)"
