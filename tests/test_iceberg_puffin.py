"""Iceberg Puffin statistics (r13): real container bytes, ANALYZE →
statistics metadata entry, ndv exactness below k, re-analyze
replacement, maintenance interplay (orphan sweep keeps live stats,
expire drops expired snapshots' stats with them)."""

from __future__ import annotations

import json
import os
import struct

import pytest

from pg_analytics_spark.errors import UnsupportedFormat
from pg_analytics_spark.sources.iceberg_puffin import (
    MAGIC,
    compute_statistics_iceberg,
    decode_kmv_blob,
    encode_kmv_blob,
    iceberg_statistics,
    kmv_ndv,
    read_puffin,
    write_puffin,
)
from pg_analytics_spark.sources.iceberg_write import (
    expire_iceberg_snapshots,
    remove_orphan_files_iceberg,
    write_iceberg,
)


def test_container_roundtrip_and_layout(tmp_path):
    p = str(tmp_path / "f.stats")
    blobs = [
        {
            "type": "pg-analytics-kmv-v1",
            "fields": [3],
            "snapshot-id": 42,
            "sequence-number": 1,
            "data": encode_kmv_blob(4, [9, 2, 5]),
            "properties": {"ndv": "3.0"},
        },
        {
            "type": "pg-analytics-kmv-v1",
            "fields": [4],
            "snapshot-id": 42,
            "sequence-number": 1,
            "data": encode_kmv_blob(2, [7, 1, 8]),
            "properties": {"ndv": "1.0"},
        },
    ]
    res = write_puffin(p, blobs)
    raw = open(p, "rb").read()
    assert raw[:4] == MAGIC and raw[-4:] == MAGIC
    (payload_len,) = struct.unpack("<i", raw[-12:-8])
    assert res["footer_size"] == 4 + payload_len + 4 + 4 + 4
    assert res["size"] == len(raw)
    meta, out = read_puffin(p)
    assert [bm["fields"] for bm, _ in out] == [[3], [4]]
    # first blob sits right after the leading magic
    assert out[0][0]["offset"] == 4
    k, hashes = decode_kmv_blob(out[0][1])
    assert (k, hashes) == (4, [2, 5, 9])  # sorted on encode
    assert kmv_ndv(4, hashes) == 3.0  # not full → exact count


def test_bad_magic_refused(tmp_path):
    p = str(tmp_path / "junk")
    with open(p, "wb") as fh:
        fh.write(b"NOPE" + b"x" * 40)
    with pytest.raises(UnsupportedFormat, match="magic"):
        read_puffin(p)


@pytest.fixture()
def ice_table(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, i % 37, f"g{i % 5}") for i in range(500)],
        "id long, b long, g string",
    )
    write_iceberg(df, path, mode="overwrite")
    return path


def test_analyze_and_read_back(spark, ice_table):
    res = compute_statistics_iceberg(spark, ice_table, ["id", "b", "g"])
    # below k=256 the estimate is the EXACT distinct count
    assert res["ndv"]["b"] == 37.0 and res["ndv"]["g"] == 5.0
    assert res["ndv"]["id"] > 256  # full sketch → estimate
    out = {
        r["column"]: r
        for r in iceberg_statistics(spark, ice_table).collect()
    }
    assert out["b"]["ndv"] == 37.0 and out["b"]["n_in_sketch"] == 37
    assert out["g"]["ndv"] == 5.0
    assert out["id"]["n_in_sketch"] == 256  # full
    assert all(r["blob_type"] == "pg-analytics-kmv-v1" for r in out.values())
    # the statistics entry is in the CURRENT table metadata, spec shape
    meta_dir = os.path.join(ice_table, "metadata")
    v = int(open(os.path.join(meta_dir, "version-hint.text")).read())
    meta = json.load(
        open(os.path.join(meta_dir, f"v{v}.metadata.json"))
    )
    (entry,) = meta["statistics"]
    assert entry["snapshot-id"] == meta["current-snapshot-id"]
    assert os.path.getsize(entry["statistics-path"]) == entry[
        "file-size-in-bytes"
    ]
    assert {b["type"] for b in entry["blob-metadata"]} == {
        "pg-analytics-kmv-v1"
    }


def test_reanalyze_replaces_and_unknown_column_refused(spark, ice_table):
    compute_statistics_iceberg(spark, ice_table, ["b"])
    compute_statistics_iceberg(spark, ice_table, ["g"])
    out = iceberg_statistics(spark, ice_table).collect()
    assert [r["column"] for r in out] == ["g"]  # replaced, not stacked
    with pytest.raises(UnsupportedFormat, match="unknown column"):
        compute_statistics_iceberg(spark, ice_table, ["nope"])


def test_orphan_sweep_keeps_live_stats(spark, ice_table):
    res = compute_statistics_iceberg(spark, ice_table, ["b"])
    sweep = remove_orphan_files_iceberg(ice_table, older_than_hours=0.0)
    assert os.path.exists(res["statistics_path"])
    assert sweep["files_deleted"] == 0
    assert iceberg_statistics(spark, ice_table).count() == 1


def test_expire_drops_expired_snapshots_stats(spark, ice_table):
    res1 = compute_statistics_iceberg(spark, ice_table, ["b"])
    df2 = spark.createDataFrame([(1000, 99, "gx")], "id long, b long, g string")
    write_iceberg(df2, ice_table, mode="append")
    res2 = compute_statistics_iceberg(spark, ice_table, ["b"])
    assert res2["ndv"]["b"] == 38.0  # 37 + the new value
    expire_iceberg_snapshots(spark, ice_table, retain_last=1)
    assert not os.path.exists(res1["statistics_path"])  # dropped with v1
    assert os.path.exists(res2["statistics_path"])  # current stays
    out = iceberg_statistics(spark, ice_table).collect()
    assert len(out) == 1 and out[0]["ndv"] == 38.0


def test_analyze_statement_and_statistics_table_function(
    spark, ice_table
):
    """SQL surface (r13): `ANALYZE t (cols)` routes to
    compute_statistics_iceberg and `iceberg_statistics('t')` reads
    the Puffin sidecar back as a relation."""
    from pg_analytics_spark.engine import Engine

    eng = Engine(spark=spark)
    eng.attach("t", [ice_table], "iceberg")
    out = eng.sql("ANALYZE t (b, g)").collect()
    assert {r["column"]: r["ndv"] for r in out} == {"b": 37.0, "g": 5.0}
    rel = eng.sql(
        "SELECT column, ndv, n_in_sketch FROM iceberg_statistics('t') "
        "ORDER BY column"
    ).collect()
    assert [(r[0], r[1], r[2]) for r in rel] == [
        ("b", 37.0, 37), ("g", 5.0, 5)
    ]
    # column-less ANALYZE sketches every primitive column
    out2 = eng.sql("ANALYZE t").collect()
    assert {r["column"] for r in out2} == {"id", "b", "g"}


def test_delta_row_ids_table_function(spark, tmp_path):
    from pg_analytics_spark.engine import Engine
    from pg_analytics_spark.sources.delta_write import (
        update_delta,
        write_delta,
    )

    path = str(tmp_path / "rt")
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(6)], "k long, s string"
    ).orderBy("k").coalesce(1)
    write_delta(
        df, path, mode="overwrite",
        configuration={"delta.enableRowTracking": "true"},
    )
    update_delta(spark, path, set_map={"s": "'u'"}, where="k = 4")
    eng = Engine(spark=spark)
    eng.attach("rt", [path], "delta")
    rows = eng.sql(
        "SELECT k, _row_id, _row_commit_version FROM delta_row_ids('rt') "
        "ORDER BY k"
    ).collect()
    assert [(r[0], r[1], r[2]) for r in rows] == [
        (k, k, 1 if k == 4 else 0) for k in range(6)
    ]
