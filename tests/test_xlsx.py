"""XLSX source (sources/xlsx.py) — dependency-free SpreadsheetML subset.

The fixture writer below builds real OOXML zip archives with shared
strings, inline strings, booleans, numerics, date-styled cells and
sparse rows — the features GDAL's XLSX driver (the reference's
st_read path for spreadsheets) surfaces as table columns.
"""

from __future__ import annotations

import zipfile

import pytest

from pg_analytics_spark.errors import UnsupportedFormat
from pg_analytics_spark.sources import load_source

_CT = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
</Types>"""

_ROOT_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

_WB_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet2.xml"/>
</Relationships>"""

_WORKBOOK = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
<sheets>
<sheet name="people" sheetId="1" r:id="rId1"/>
<sheet name="extra" sheetId="2" r:id="rId2"/>
</sheets></workbook>"""

# style index 1 → builtin date format 14 (mm-dd-yy)
_STYLES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
<cellXfs count="2">
<xf numFmtId="0" applyNumberFormat="0"/>
<xf numFmtId="14" applyNumberFormat="1"/>
</cellXfs></styleSheet>"""

_SHARED = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="3" uniqueCount="3">
<si><t>id</t></si><si><t>alice</t></si><si><r><t>bo</t></r><r><t>b</t></r></si>
</sst>"""

# header: id(shared) name(inline) score active joined
# row2: 1 alice 9.5 TRUE 2024-01-02 (serial 45293)
# row3 (sparse: score missing): 2 bob _ FALSE 2024-02-03 (serial 45325)
_SHEET1 = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
<row r="1">
<c r="A1" t="s"><v>0</v></c>
<c r="B1" t="inlineStr"><is><t>name</t></is></c>
<c r="C1" t="str"><v>score</v></c>
<c r="D1" t="inlineStr"><is><t>active</t></is></c>
<c r="E1" t="inlineStr"><is><t>joined</t></is></c>
</row>
<row r="2">
<c r="A2"><v>1</v></c>
<c r="B2" t="s"><v>1</v></c>
<c r="C2"><v>9.5</v></c>
<c r="D2" t="b"><v>1</v></c>
<c r="E2" s="1"><v>45293</v></c>
</row>
<row r="3">
<c r="A3"><v>2</v></c>
<c r="B3" t="s"><v>2</v></c>
<c r="D3" t="b"><v>0</v></c>
<c r="E3" s="1"><v>45325</v></c>
</row>
</sheetData></worksheet>"""

_SHEET2 = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
<row r="1"><c r="A1" t="inlineStr"><is><t>k</t></is></c></row>
<row r="2"><c r="A2"><v>42</v></c></row>
</sheetData></worksheet>"""


@pytest.fixture(scope="module")
def xlsx_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("xlsx") / "book.xlsx"
    with zipfile.ZipFile(p, "w") as zf:
        zf.writestr("[Content_Types].xml", _CT)
        zf.writestr("_rels/.rels", _ROOT_RELS)
        zf.writestr("xl/workbook.xml", _WORKBOOK)
        zf.writestr("xl/_rels/workbook.xml.rels", _WB_RELS)
        zf.writestr("xl/styles.xml", _STYLES)
        zf.writestr("xl/sharedStrings.xml", _SHARED)
        zf.writestr("xl/worksheets/sheet1.xml", _SHEET1)
        zf.writestr("xl/worksheets/sheet2.xml", _SHEET2)
    return str(p)


def test_xlsx_typed_read(spark, xlsx_file):
    df = load_source(spark, xlsx_file, "xlsx")
    assert df.columns == ["id", "name", "score", "active", "joined"]
    rows = {r["id"]: r for r in df.collect()}
    assert rows[1]["name"] == "alice"
    assert rows[2]["name"] == "bob"  # rich-text shared string runs
    assert rows[1]["score"] == 9.5
    assert rows[2]["score"] is None  # sparse cell gap preserved
    assert rows[1]["active"] is True and rows[2]["active"] is False
    assert str(rows[1]["joined"]) == "2024-01-02"  # date-styled serial
    assert str(rows[2]["joined"]) == "2024-02-03"


def test_xlsx_sheet_selection_and_header_off(spark, xlsx_file):
    by_name = load_source(spark, xlsx_file, "xlsx", {"sheet": "extra"})
    assert by_name.columns == ["k"]
    assert by_name.collect()[0]["k"] == 42
    by_idx = load_source(spark, xlsx_file, "xlsx", {"sheet": 2})
    assert by_idx.collect()[0]["k"] == 42
    raw = load_source(spark, xlsx_file, "xlsx", {"sheet": 2, "header": False})
    assert raw.columns == ["col0"]
    assert sorted(str(r["col0"]) for r in raw.collect()) == ["42", "k"]
    with pytest.raises(UnsupportedFormat, match="not found"):
        load_source(spark, xlsx_file, "xlsx", {"sheet": "nope"})


def test_xlsx_all_varchar(spark, xlsx_file):
    df = load_source(spark, xlsx_file, "xlsx", {"all_varchar": True})
    assert all(t == "string" for _, t in df.dtypes)
    rows = {r["id"]: r for r in df.collect()}
    assert rows["1"]["joined"] == "2024-01-02"
    assert rows["1"]["active"] == "true"


def test_xlsx_via_spatial_st_read(spark, xlsx_file):
    # the reference reaches spreadsheets through st_read (GDAL XLSX
    # driver); our spatial source routes .xlsx to the same reader
    df = load_source(spark, xlsx_file, "spatial")
    assert df.columns == ["id", "name", "score", "active", "joined"]
    assert df.count() == 2
