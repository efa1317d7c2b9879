"""Driver-side geometry plumbing shared by the shapefile and GeoPackage
readers — a tiny, dependency-free subset of the public WKT/WKB specs
(OGC 06-103r4) covering the 2D types those file formats actually carry.

Geometries are held as plain tuples::

    ("POINT", (x, y))
    ("MULTIPOINT", [(x, y), ...])
    ("LINESTRING", [(x, y), ...])
    ("MULTILINESTRING", [[(x, y), ...], ...])
    ("POLYGON", [ring, ...])          # ring = [(x, y), ...]
    ("MULTIPOLYGON", [[ring, ...], ...])

Only the file-level parse is driver-side (same disposition as the
reference's GDAL path, /root/reference/src/duckdb/spatial.rs:29-82 —
GDAL is equally single-node); rows land in a regular DataFrame so all
downstream compute distributes.
"""

from __future__ import annotations

import struct

from pg_analytics_spark.errors import UnsupportedFormat

_WKB_TYPE = {
    "POINT": 1,
    "LINESTRING": 2,
    "POLYGON": 3,
    "MULTIPOINT": 4,
    "MULTILINESTRING": 5,
    "MULTIPOLYGON": 6,
}
_WKB_NAME = {v: k for k, v in _WKB_TYPE.items()}


def _fmt(x: float) -> str:
    # WKT numbers: integral values print without a trailing .0
    return repr(int(x)) if float(x).is_integer() else repr(float(x))


def _pts(coords) -> str:
    return ", ".join(f"{_fmt(x)} {_fmt(y)}" for x, y in coords)


def to_wkt(geom) -> str:
    kind, body = geom
    if kind == "POINT":
        return f"POINT ({_fmt(body[0])} {_fmt(body[1])})"
    if kind == "MULTIPOINT":
        return f"MULTIPOINT ({_pts(body)})"
    if kind == "LINESTRING":
        return f"LINESTRING ({_pts(body)})"
    if kind == "MULTILINESTRING":
        return "MULTILINESTRING (" + ", ".join(f"({_pts(p)})" for p in body) + ")"
    if kind == "POLYGON":
        return "POLYGON (" + ", ".join(f"({_pts(r)})" for r in body) + ")"
    if kind == "MULTIPOLYGON":
        return (
            "MULTIPOLYGON ("
            + ", ".join(
                "(" + ", ".join(f"({_pts(r)})" for r in poly) + ")" for poly in body
            )
            + ")"
        )
    raise UnsupportedFormat(f"unsupported geometry kind {kind!r}")


def to_wkb(geom) -> bytes:
    """Little-endian ISO WKB."""
    kind, body = geom
    head = struct.pack("<BI", 1, _WKB_TYPE[kind])
    if kind == "POINT":
        return head + struct.pack("<2d", *body)
    if kind in ("LINESTRING", "MULTIPOINT"):
        if kind == "MULTIPOINT":
            pts = b"".join(to_wkb(("POINT", p)) for p in body)
            return head + struct.pack("<I", len(body)) + pts
        return (
            head
            + struct.pack("<I", len(body))
            + b"".join(struct.pack("<2d", *p) for p in body)
        )
    if kind == "POLYGON":
        out = head + struct.pack("<I", len(body))
        for ring in body:
            out += struct.pack("<I", len(ring)) + b"".join(
                struct.pack("<2d", *p) for p in ring
            )
        return out
    if kind in ("MULTILINESTRING", "MULTIPOLYGON"):
        inner = "LINESTRING" if kind == "MULTILINESTRING" else "POLYGON"
        parts = b"".join(to_wkb((inner, p)) for p in body)
        return head + struct.pack("<I", len(body)) + parts
    raise UnsupportedFormat(f"unsupported geometry kind {kind!r}")


def parse_wkb(buf: bytes):
    """Parse 2D WKB (either byte order; ISO Z/M and EWKB flag variants
    are rejected with a clear message — the covered formats write 2D)."""
    geom, _ = _parse_wkb_at(buf, 0)
    return geom


def _parse_wkb_at(buf: bytes, off: int):
    bo = "<" if buf[off] == 1 else ">"
    (wtype,) = struct.unpack_from(f"{bo}I", buf, off + 1)
    off += 5
    if wtype & 0xE0000000 or wtype >= 1000:
        raise UnsupportedFormat(
            f"only 2D WKB is supported (got type code {wtype:#x}; Z/M and "
            "EWKB-flagged geometries are out of scope)"
        )
    kind = _WKB_NAME.get(wtype)
    if kind is None:
        raise UnsupportedFormat(f"unsupported WKB geometry type {wtype}")

    def pt(o):
        return struct.unpack_from(f"{bo}2d", buf, o), o + 16

    if kind == "POINT":
        p, off = pt(off)
        return ("POINT", p), off
    (n,) = struct.unpack_from(f"{bo}I", buf, off)
    off += 4
    if kind == "LINESTRING":
        pts = []
        for _ in range(n):
            p, off = pt(off)
            pts.append(p)
        return ("LINESTRING", pts), off
    if kind == "POLYGON":
        rings = []
        for _ in range(n):
            (m,) = struct.unpack_from(f"{bo}I", buf, off)
            off += 4
            ring = []
            for _ in range(m):
                p, off = pt(off)
                ring.append(p)
            rings.append(ring)
        return ("POLYGON", rings), off
    # MULTI*: n nested full WKB geometries
    parts = []
    for _ in range(n):
        g, off = _parse_wkb_at(buf, off)
        parts.append(g)
    if kind == "MULTIPOINT":
        return ("MULTIPOINT", [g[1] for g in parts]), off
    if kind == "MULTILINESTRING":
        return ("MULTILINESTRING", [g[1] for g in parts]), off
    return ("MULTIPOLYGON", [g[1] for g in parts]), off


def envelope(geom) -> tuple[float, float, float, float]:
    kind, body = geom

    def walk(b):
        if isinstance(b, tuple):
            yield b
        else:
            for item in b:
                yield from walk(item)

    xs_ys = list(walk(body))
    xs = [p[0] for p in xs_ys]
    ys = [p[1] for p in xs_ys]
    return min(xs), min(ys), max(xs), max(ys)


def box_intersects(env, box) -> bool:
    minx, miny, maxx, maxy = env
    bminx, bminy, bmaxx, bmaxy = box
    return not (maxx < bminx or minx > bmaxx or maxy < bminy or miny > bmaxy)
