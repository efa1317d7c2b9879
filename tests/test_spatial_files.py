"""Shapefile and GeoPackage readers (S6 breadth): round trips through
the fixture writers, hand-crafted polyline/polygon records, bbox
pushdown, real-WKB output, and the st_read dispatch."""

from __future__ import annotations

import struct

import pytest

from pg_analytics_spark.errors import UnsupportedFormat
from pg_analytics_spark.sources import load_source
from pg_analytics_spark.sources.geom import (
    envelope,
    parse_wkb,
    to_wkb,
    to_wkt,
)
from pg_analytics_spark.sources.geopackage import write_point_gpkg
from pg_analytics_spark.sources.shapefile import (
    _SHAPE_POLYGON,
    _SHAPE_POLYLINE,
    _read_shp,
    write_point_shapefile,
)

PTS = [(2.35, 48.85), (-0.12, 51.5), (13.4, 52.52), (151.2, -33.87)]
RECS = [("paris", "fr"), ("london", "uk"), ("berlin", "de"), ("sydney", "au")]


def test_geom_wkb_wkt_roundtrip():
    geoms = [
        ("POINT", (1.5, -2.5)),
        ("MULTIPOINT", [(0, 0), (1, 1)]),
        ("LINESTRING", [(0, 0), (1, 1), (2, 0)]),
        ("MULTILINESTRING", [[(0, 0), (1, 1)], [(2, 2), (3, 3)]]),
        ("POLYGON", [[(0, 0), (4, 0), (4, 4), (0, 4), (0, 0)]]),
        (
            "MULTIPOLYGON",
            [[[(0, 0), (1, 0), (1, 1), (0, 0)]], [[(5, 5), (6, 5), (6, 6), (5, 5)]]],
        ),
    ]
    for g in geoms:
        assert parse_wkb(to_wkb(g)) == (
            g
            if g[0] != "MULTIPOINT"
            else ("MULTIPOINT", [(0.0, 0.0), (1.0, 1.0)])
        )
        assert to_wkt(g).startswith(g[0])
    assert to_wkt(("POINT", (1.5, -2.5))) == "POINT (1.5 -2.5)"
    assert envelope(("LINESTRING", [(0, 0), (1, 5), (2, -3)])) == (0, -3, 2, 5)


def test_geom_rejects_z_wkb():
    bad = struct.pack("<BI", 1, 1001) + struct.pack("<3d", 1, 2, 3)
    with pytest.raises(UnsupportedFormat, match="2D"):
        parse_wkb(bad)


def test_shapefile_point_roundtrip(spark, tmp_path):
    shp = write_point_shapefile(
        str(tmp_path / "cities"), PTS, ["name", "cc"], RECS
    )
    df = load_source(spark, shp, "spatial")
    assert df.columns == ["name", "cc", "geometry_wkt"]
    rows = {r["name"]: r for r in df.collect()}
    assert rows["paris"]["geometry_wkt"] == "POINT (2.35 48.85)"
    assert rows["sydney"]["cc"] == "au"
    assert len(rows) == 4


def test_shapefile_bbox_and_wkb(spark, tmp_path):
    shp = write_point_shapefile(
        str(tmp_path / "cities"), PTS, ["name", "cc"], RECS
    )
    df = load_source(
        spark,
        shp,
        "spatial",
        {"spatial_filter_box": "-10,40,20,60", "keep_wkb": True},
    )
    rows = df.collect()
    assert {r["name"] for r in rows} == {"paris", "london", "berlin"}
    # wkb_geometry is REAL little-endian ISO WKB
    wkb = bytes(next(r for r in rows if r["name"] == "paris")["wkb_geometry"])
    assert parse_wkb(wkb) == ("POINT", (2.35, 48.85))


def test_shapefile_polyline_polygon_records(tmp_path):
    """Hand-crafted .shp with a 2-part polyline and a 1-ring polygon."""

    def rec(num, stype, parts, pts):
        content = struct.pack("<i", stype)
        content += struct.pack("<4d", 0, 0, 10, 10)  # bbox
        content += struct.pack("<2i", len(parts), len(pts))
        content += struct.pack(f"<{len(parts)}i", *parts)
        for x, y in pts:
            content += struct.pack("<2d", x, y)
        return struct.pack(">2i", num, len(content) // 2) + content

    body = rec(1, _SHAPE_POLYLINE, [0, 2], [(0, 0), (1, 1), (5, 5), (6, 6)])
    body += rec(2, _SHAPE_POLYGON, [0], [(0, 0), (4, 0), (4, 4), (0, 0)])
    header = (
        struct.pack(">i5i", 9994, 0, 0, 0, 0, 0)
        + struct.pack(">i", (100 + len(body)) // 2)
        + struct.pack("<2i", 1000, _SHAPE_POLYLINE)
        + struct.pack("<8d", 0, 0, 10, 10, 0, 0, 0, 0)
    )
    p = tmp_path / "mixed.shp"
    p.write_bytes(header + body)
    geoms = list(_read_shp(str(p)))
    assert geoms[0] == (
        "MULTILINESTRING",
        [[(0, 0), (1, 1)], [(5, 5), (6, 6)]],
    )
    assert geoms[1] == ("POLYGON", [[(0, 0), (4, 0), (4, 4), (0, 0)]])


def test_gpkg_roundtrip_and_bbox(spark, tmp_path):
    gp = str(tmp_path / "cities.gpkg")
    write_point_gpkg(gp, "cities", PTS, ["name", "cc"], RECS)
    df = load_source(spark, gp, "spatial")
    assert df.columns == ["fid", "name", "cc", "geometry_wkt"]
    assert df.count() == 4
    boxed = load_source(
        spark, gp, "spatial", {"spatial_filter_box": "-10,40,20,60", "keep_wkb": True}
    )
    rows = boxed.collect()
    assert {r["name"] for r in rows} == {"paris", "london", "berlin"}
    wkb = bytes(next(r for r in rows if r["name"] == "berlin")["wkb_geometry"])
    assert parse_wkb(wkb) == ("POINT", (13.4, 52.52))


def test_gpkg_layer_selection(spark, tmp_path):
    gp = str(tmp_path / "multi.gpkg")
    write_point_gpkg(gp, "a", PTS[:2], ["name"], [(r[0],) for r in RECS[:2]])
    # add a second layer into the same file
    import sqlite3

    from pg_analytics_spark.sources.geom import to_wkb as _to_wkb

    con = sqlite3.connect(gp)
    con.execute('CREATE TABLE "b" (fid INTEGER PRIMARY KEY, geom BLOB, name TEXT)')
    con.execute(
        "INSERT INTO gpkg_contents (table_name, data_type, identifier, srs_id)"
        " VALUES ('b', 'features', 'b', 4326)"
    )
    con.execute(
        "INSERT INTO gpkg_geometry_columns VALUES ('b', 'geom', 'POINT', 4326, 0, 0)"
    )
    blob = b"GP\x00\x01" + struct.pack("<i", 4326) + _to_wkb(("POINT", (9.0, 9.0)))
    con.execute('INSERT INTO "b" VALUES (1, ?, ?)', (blob, "nine"))
    con.commit()
    con.close()

    with pytest.raises(UnsupportedFormat, match="multiple feature layers"):
        load_source(spark, gp, "spatial")
    b = load_source(spark, gp, "spatial", {"layer": "b"})
    assert [r["name"] for r in b.collect()] == ["nine"]
    with pytest.raises(UnsupportedFormat, match="not in GeoPackage"):
        load_source(spark, gp, "spatial", {"layer": "zzz"})


def test_spatial_still_rejects_gdal_only_for_shapefile(spark, tmp_path):
    shp = write_point_shapefile(str(tmp_path / "x"), PTS[:1], ["n"], [("a",)])
    with pytest.raises(UnsupportedFormat, match="GDAL"):
        load_source(spark, shp, "spatial", {"layer": "x"})


def test_point_in_polygon_raycast(spark):
    """Even-odd ray cast against a concave polygon: known inside /
    outside / concavity-notch points."""
    from pg_analytics_spark.functions.geo import point_in_polygon

    # concave "C" shape
    xs = [0.0, 10.0, 10.0, 4.0, 4.0, 10.0, 10.0, 0.0]
    ys = [0.0, 0.0, 3.0, 3.0, 7.0, 7.0, 10.0, 10.0]
    cases = [
        (2.0, 5.0, True),    # left limb
        (7.0, 1.5, True),    # bottom arm
        (7.0, 5.0, False),   # inside the notch — concavity matters
        (11.0, 5.0, False),  # right of everything
        (5.0, 8.5, True),    # top arm
        (-1.0, -1.0, False),
    ]
    df = spark.createDataFrame(
        [(i, x, y) for i, (x, y, _) in enumerate(cases)], "i long, x double, y double"
    )
    got = {
        r["i"]: r["inside"]
        for r in df.select(
            "i", point_in_polygon("x", "y", xs, ys).alias("inside")
        ).collect()
    }
    for i, (_, _, want) in enumerate(cases):
        assert got[i] == want, (i, cases[i])


_KML_NS = '<?xml version="1.0" encoding="UTF-8"?>\n<kml xmlns="http://www.opengis.net/kml/2.2"><Document>'


def _kml_doc(body: str) -> str:
    return _KML_NS + body + "</Document></kml>"


def test_kml_point_roundtrip_and_extended_data(spark, tmp_path):
    from pg_analytics_spark.sources.kml import write_point_kml

    p = str(tmp_path / "hubs.kml")
    write_point_kml(
        p, ["paris", "london"], PTS[:2], ["code", "cc"], RECS[:2]
    )
    df = load_source(spark, p, "spatial")
    rows = {r["name"]: r for r in df.collect()}
    assert set(rows) == {"paris", "london"}
    assert rows["paris"]["code"] == "paris" and rows["paris"]["cc"] == "fr"
    assert rows["paris"]["geometry_wkt"] == "POINT (2.35 48.85)"


def test_kml_polygon_multigeometry_and_folders(spark, tmp_path):
    """Placemarks nested in Folders, a Polygon with an inner ring, and
    a homogeneous MultiGeometry all parse; SchemaData attributes too."""
    body = """
    <Folder><name>f1</name>
      <Placemark><name>square</name>
        <ExtendedData><SchemaData schemaUrl="#s">
          <SimpleData name="kind">poly</SimpleData>
        </SchemaData></ExtendedData>
        <Polygon>
          <outerBoundaryIs><LinearRing>
            <coordinates>0,0 4,0 4,4 0,4 0,0</coordinates>
          </LinearRing></outerBoundaryIs>
          <innerBoundaryIs><LinearRing>
            <coordinates>1,1 2,1 2,2 1,1</coordinates>
          </LinearRing></innerBoundaryIs>
        </Polygon>
      </Placemark>
      <Placemark><name>pair</name>
        <MultiGeometry>
          <Point><coordinates>10,10</coordinates></Point>
          <Point><coordinates>11,11</coordinates></Point>
        </MultiGeometry>
      </Placemark>
    </Folder>"""
    p = tmp_path / "mixed.kml"
    p.write_text(_kml_doc(body))
    df = load_source(spark, str(p), "spatial", {"keep_wkb": True})
    rows = {r["name"]: r for r in df.collect()}
    assert rows["square"]["kind"] == "poly"
    assert rows["square"]["geometry_wkt"].startswith("POLYGON ((0 0, 4 0")
    assert "1 1, 2 1" in rows["square"]["geometry_wkt"]  # inner ring kept
    assert rows["pair"]["geometry_wkt"] == "MULTIPOINT (10 10, 11 11)"
    # wkb round-trips through the shared codec
    assert parse_wkb(bytes(rows["pair"]["wkb_geometry"]))[0] == "MULTIPOINT"


def test_kmz_and_bbox_filter(spark, tmp_path):
    import zipfile

    from pg_analytics_spark.sources.kml import write_point_kml

    raw = str(tmp_path / "all.kml")
    write_point_kml(raw, [r[0] for r in RECS], PTS, ["code", "cc"], RECS)
    kmz = str(tmp_path / "all.kmz")
    with zipfile.ZipFile(kmz, "w") as z:
        z.write(raw, "doc.kml")
    # bbox keeps only the european hubs (lon in [-10, 20])
    df = load_source(
        spark, kmz, "spatial", {"spatial_filter_box": "-10,40,20,60"}
    )
    assert {r["name"] for r in df.collect()} == {"paris", "london", "berlin"}
    # full read sees all four
    assert load_source(spark, kmz, "spatial").count() == 4


def test_kml_mixed_multigeometry_rejected(spark, tmp_path):
    body = """
    <Placemark><name>bad</name>
      <MultiGeometry>
        <Point><coordinates>0,0</coordinates></Point>
        <LineString><coordinates>0,0 1,1</coordinates></LineString>
      </MultiGeometry>
    </Placemark>"""
    p = tmp_path / "bad.kml"
    p.write_text(_kml_doc(body))
    with pytest.raises(UnsupportedFormat, match="MultiGeometry"):
        load_source(spark, str(p), "spatial").collect()


# ------------------------------------------------------------------ #
# GML (sources/gml.py)
# ------------------------------------------------------------------ #

_GML_DOC = """<?xml version="1.0" encoding="UTF-8"?>
<ogr:FeatureCollection
    xmlns:gml="http://www.opengis.net/gml"
    xmlns:ogr="http://example.test/ogr">
  <gml:featureMember>
    <ogr:city gml:id="c1">
      <ogr:name>paris</ogr:name>
      <ogr:pop>2100000</ogr:pop>
      <ogr:geom>
        <gml:Point><gml:pos>2.35 48.85</gml:pos></gml:Point>
      </ogr:geom>
    </ogr:city>
  </gml:featureMember>
  <gml:featureMember>
    <ogr:city gml:id="c2">
      <ogr:name>london</ogr:name>
      <ogr:pop>8800000</ogr:pop>
      <ogr:geom>
        <gml:Point><gml:coordinates>-0.12,51.5</gml:coordinates></gml:Point>
      </ogr:geom>
    </ogr:city>
  </gml:featureMember>
  <gml:featureMember>
    <ogr:zone gml:id="z1">
      <ogr:name>square</ogr:name>
      <ogr:geom>
        <gml:Polygon>
          <gml:exterior><gml:LinearRing>
            <gml:posList>0 0 4 0 4 4 0 4 0 0</gml:posList>
          </gml:LinearRing></gml:exterior>
          <gml:interior><gml:LinearRing>
            <gml:posList>1 1 2 1 2 2 1 1</gml:posList>
          </gml:LinearRing></gml:interior>
        </gml:Polygon>
      </ogr:geom>
    </ogr:zone>
  </gml:featureMember>
  <gml:featureMember>
    <ogr:zone gml:id="z2">
      <ogr:name>pair</ogr:name>
      <ogr:geom>
        <gml:MultiPoint>
          <gml:pointMember>
            <gml:Point><gml:pos>10 10</gml:pos></gml:Point>
          </gml:pointMember>
          <gml:pointMember>
            <gml:Point><gml:pos>11 11</gml:pos></gml:Point>
          </gml:pointMember>
        </gml:MultiPoint>
      </ogr:geom>
    </ogr:zone>
  </gml:featureMember>
</ogr:FeatureCollection>
"""


def test_gml_both_coordinate_encodings_and_rings(spark, tmp_path):
    p = tmp_path / "cities.gml"
    p.write_text(_GML_DOC)
    df = load_source(spark, str(p), "spatial")
    rows = {r["gml_id"]: r for r in df.collect()}
    assert set(rows) == {"c1", "c2", "z1", "z2"}
    assert rows["c1"]["geometry_wkt"] == "POINT (2.35 48.85)"
    assert rows["c2"]["geometry_wkt"] == "POINT (-0.12 51.5)"
    assert rows["c1"]["pop"] == "2100000"
    assert rows["z1"]["geometry_wkt"].startswith("POLYGON ((0 0, 4 0")
    assert "(1 1, 2 1, 2 2, 1 1)" in rows["z1"]["geometry_wkt"]
    assert rows["z2"]["geometry_wkt"] == "MULTIPOINT (10 10, 11 11)"


def test_gml_bbox_filter_and_wkb(spark, tmp_path):
    p = tmp_path / "cities.gml"
    p.write_text(_GML_DOC)
    df = load_source(
        spark,
        str(p),
        "spatial",
        {"spatial_filter_box": "-1,45,5,52", "keep_wkb": "true"},
    )
    rows = df.collect()
    assert {r["gml_id"] for r in rows} == {"c1", "c2"}
    import struct as _struct

    wkb = bytes(rows[0]["wkb_geometry"])
    assert wkb[0] == 1 and _struct.unpack("<I", wkb[1:5])[0] == 1  # LE point


def test_gml_srs_dimension_3_drops_z(spark, tmp_path):
    p = tmp_path / "z.gml"
    p.write_text(
        """<fc xmlns:gml="http://www.opengis.net/gml">
        <gml:featureMember><f gml:id="a">
          <g><gml:LineString>
            <gml:posList srsDimension="3">0 0 7 1 1 8</gml:posList>
          </gml:LineString></g>
        </f></gml:featureMember></fc>"""
    )
    df = load_source(spark, str(p), "spatial")
    assert df.collect()[0]["geometry_wkt"] == "LINESTRING (0 0, 1 1)"


# ------------------------------------------------------------------ #
# FlatGeobuf (sources/flatgeobuf.py)
# ------------------------------------------------------------------ #


def _fgb_fixture(tmp_path, name="sites.fgb"):
    from pg_analytics_spark.sources.flatgeobuf import (
        CT_DOUBLE,
        CT_INT,
        CT_STRING,
        write_fgb,
    )

    cols = [("name", CT_STRING), ("pop", CT_INT), ("score", CT_DOUBLE)]
    rows = [
        (["paris", 2100000, 1.5], ("POINT", (2.35, 48.85))),
        (["london", 8800000, 2.25], ("POINT", (-0.12, 51.5))),
        (["square", None, 0.5], ("POLYGON", [
            [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0), (0.0, 0.0)],
            [(1.0, 1.0), (2.0, 1.0), (2.0, 2.0), (1.0, 1.0)],
        ])),
        (["line", 7, 3.0], ("LINESTRING", [(10.0, 10.0), (11.0, 11.0)])),
    ]
    p = str(tmp_path / name)
    write_fgb(p, cols, rows)
    return p


def test_fgb_roundtrip_typed_properties(spark, tmp_path):
    p = _fgb_fixture(tmp_path)
    df = load_source(spark, p, "spatial")
    assert [f.dataType.simpleString() for f in df.schema.fields[:3]] == [
        "string", "int", "double",
    ]
    rows = {r["name"]: r for r in df.collect()}
    assert set(rows) == {"paris", "london", "square", "line"}
    assert rows["paris"]["geometry_wkt"] == "POINT (2.35 48.85)"
    assert rows["paris"]["pop"] == 2100000 and rows["paris"]["score"] == 1.5
    assert rows["square"]["pop"] is None  # absent packed property -> null
    assert rows["square"]["geometry_wkt"].startswith("POLYGON ((0 0, 4 0")
    assert "(1 1, 2 1, 2 2, 1 1)" in rows["square"]["geometry_wkt"]
    assert rows["line"]["geometry_wkt"] == "LINESTRING (10 10, 11 11)"


def test_fgb_bbox_filter_and_wkb(spark, tmp_path):
    p = _fgb_fixture(tmp_path)
    df = load_source(
        spark, p, "spatial",
        {"spatial_filter_box": "-1,45,5,52", "keep_wkb": "1"},
    )
    rows = df.collect()
    assert {r["name"] for r in rows} == {"paris", "london"}
    import struct as _s

    wkb = bytes(rows[0]["wkb_geometry"])
    assert wkb[0] == 1 and _s.unpack("<I", wkb[1:5])[0] == 1


def test_fgb_bad_magic_rejected(spark, tmp_path):
    from pg_analytics_spark.errors import UnsupportedFormat
    from pg_analytics_spark.sources.flatgeobuf import read_fgb

    p = tmp_path / "nope.fgb"
    p.write_bytes(b"GIF89a not a flatgeobuf")
    with pytest.raises(UnsupportedFormat, match="magic"):
        read_fgb(str(p))


def test_fgb_feature_count_mismatch_rejected(spark, tmp_path):
    from pg_analytics_spark.errors import UnsupportedFormat
    from pg_analytics_spark.sources.flatgeobuf import read_fgb

    p = _fgb_fixture(tmp_path)
    raw = open(p, "rb").read()
    # drop the last feature's bytes: header still promises 4
    import struct as _s

    o = 8
    hlen = _s.unpack_from("<I", raw, o)[0]
    o += 4 + hlen
    sizes = []
    while o + 4 <= len(raw):
        flen = _s.unpack_from("<I", raw, o)[0]
        sizes.append((o, flen))
        o += 4 + flen
    trunc = raw[: sizes[-1][0]]
    bad = tmp_path / "trunc.fgb"
    bad.write_bytes(trunc)
    with pytest.raises(UnsupportedFormat, match="promises"):
        read_fgb(str(bad))


def test_fgb_rtree_size_matches_reference_levels():
    """Spec do-while node counting: a single feature still has leaf +
    root (2 nodes = 80 bytes); level sums match ceil-division chains."""
    from pg_analytics_spark.sources.flatgeobuf import _rtree_size

    assert _rtree_size(1, 16) == 2 * 40
    assert _rtree_size(16, 16) == (16 + 1) * 40
    assert _rtree_size(17, 16) == (17 + 2 + 1) * 40
    assert _rtree_size(256, 16) == (256 + 16 + 1) * 40
    assert _rtree_size(257, 16) == (257 + 17 + 2 + 1) * 40


def test_fgb_reader_skips_index_region(spark, tmp_path):
    """A file with index_node_size > 0 must skip exactly the computed
    index bytes before the first feature.  Build one by splicing an
    all-zero index blob of the spec size into a written fixture and
    patching the header's index_node_size field."""
    import struct as _s

    from pg_analytics_spark.sources.flatgeobuf import (
        CT_STRING,
        _rtree_size,
        read_fgb,
        write_fgb,
    )

    p = str(tmp_path / "noindex.fgb")
    rows = [(["a"], ("POINT", (1.0, 2.0))), (["b"], ("POINT", (3.0, 4.0)))]
    write_fgb(p, [("name", CT_STRING)], rows)
    raw = bytearray(open(p, "rb").read())
    o = 8
    hlen = _s.unpack_from("<I", raw, o)[0]
    header = bytes(raw[o + 4 : o + 4 + hlen])
    # patch index_node_size (field 9) from 0 to 16 inside the header
    # flatbuffer via its vtable
    root = _s.unpack_from("<I", header, 0)[0]
    soff = _s.unpack_from("<i", header, root)[0]
    vt = root - soff
    slot = _s.unpack_from("<H", header, vt + 4 + 2 * 9)[0]
    assert slot != 0  # writer emits the field explicitly
    patched = bytearray(header)
    _s.pack_into("<H", patched, root + slot, 16)
    index = b"\0" * _rtree_size(len(rows), 16)
    out = bytes(raw[:o + 4]) + bytes(patched) + index + bytes(
        raw[o + 4 + hlen :]
    )
    p2 = str(tmp_path / "withindex.fgb")
    open(p2, "wb").write(out)
    cols, feats = read_fgb(p2)
    assert [pr[0] for pr, _ in feats] == ["a", "b"]
    assert [g for _, g in feats] == [
        ("POINT", (1.0, 2.0)),
        ("POINT", (3.0, 4.0)),
    ]


def test_gml_geometry_less_feature_keeps_properties(spark, tmp_path):
    """A feature with no geometry keeps its row (NULL geometry, GDAL's
    behavior) — unless a bbox filter is active, which excludes it."""
    p = tmp_path / "nogeo.gml"
    p.write_text(
        """<fc xmlns:gml="http://www.opengis.net/gml">
        <gml:featureMember><f gml:id="a"><name>hasgeo</name>
          <g><gml:Point><gml:pos>1 2</gml:pos></gml:Point></g>
        </f></gml:featureMember>
        <gml:featureMember><f gml:id="b"><name>nogeo</name>
        </f></gml:featureMember></fc>"""
    )
    df = load_source(spark, str(p), "spatial")
    rows = {r["gml_id"]: r for r in df.collect()}
    assert set(rows) == {"a", "b"}
    assert rows["b"]["geometry_wkt"] is None
    assert rows["b"]["name"] == "nogeo"
    boxed = load_source(
        spark, str(p), "spatial", {"spatial_filter_box": "0,0,5,5"}
    )
    assert {r["gml_id"] for r in boxed.collect()} == {"a"}
