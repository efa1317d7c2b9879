"""Delta SHALLOW CLONE + DESCRIBE DETAIL (r9 verdict #8):
zero-copy metadata forks pinned at the clone version, isolated in
both directions, DV-safe, vacuum-safe
(sources/delta_write.clone_delta / describe_detail_delta)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from pg_analytics_spark.errors import UnsupportedFormat
from pg_analytics_spark.sources import load_source
from pg_analytics_spark.sources.delta_write import (
    clone_delta,
    delete_delta,
    describe_detail_delta,
    vacuum_delta,
    write_delta,
)


def _mk(spark, path):
    df = spark.range(10).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    write_delta(df, path, mode="overwrite")  # v0
    write_delta(
        spark.range(10, 14).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        ),
        path,
        mode="append",
    )  # v1
    return df


def _rows(spark, path):
    return {
        (r["k"], r["v"])
        for r in load_source(spark, path, "delta").collect()
    }


def test_clone_pinned_and_isolated_both_ways(spark, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    _mk(spark, src)
    res = clone_delta(src, dst)
    assert res == {"version": 0, "files": res["files"], "source_version": 1}
    assert _rows(spark, dst) == _rows(spark, src)
    src_before = _rows(spark, src)

    # source evolution does NOT leak into the clone
    write_delta(
        spark.range(100, 103).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        ),
        src,
        mode="append",
    )
    delete_delta(spark, src, "k < 2")
    assert _rows(spark, dst) == src_before

    # DML on the clone copies-on-write into the CLONE dir and never
    # touches a source file
    src_files = {
        os.path.join(r, n)
        for r, _d, ns in os.walk(src)
        for n in ns
        if n.endswith(".parquet") and "_delta_log" not in r
    }
    src_stat = {p: os.stat(p).st_mtime_ns for p in src_files}
    delete_delta(spark, dst, "k >= 12")
    assert _rows(spark, dst) == {
        (k, 2 * k) for k in range(12)
    }
    assert {p: os.stat(p).st_mtime_ns for p in src_files} == src_stat
    # vacuum on the clone walks the clone root only — the dereferenced
    # source files survive
    vacuum_delta(dst, retention_hours=0.0)
    assert all(os.path.isfile(p) for p in src_files)
    assert _rows(spark, dst) == {(k, 2 * k) for k in range(12)}


def test_clone_version_as_of_and_refusals(spark, tmp_path):
    src = str(tmp_path / "src")
    _mk(spark, src)
    dst0 = str(tmp_path / "dst0")
    res = clone_delta(src, dst0, version=0)
    assert res["source_version"] == 0
    assert _rows(spark, dst0) == {(k, 2 * k) for k in range(10)}
    with pytest.raises(UnsupportedFormat, match="already exists"):
        clone_delta(src, dst0)
    with pytest.raises(UnsupportedFormat, match="not a delta table"):
        clone_delta(str(tmp_path / "nope"), str(tmp_path / "dst1"))


def test_clone_carries_deletion_vectors_as_absolute(spark, tmp_path):
    src = str(tmp_path / "src")
    df = spark.range(10).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    write_delta(df, src, mode="overwrite")
    delete_delta(spark, src, "k < 3", dv=True)  # merge-on-read delete
    dst = str(tmp_path / "dst")
    clone_delta(src, dst)
    assert _rows(spark, dst) == {(k, 2 * k) for k in range(3, 10)}
    import json

    with open(os.path.join(dst, "_delta_log/00000000000000000000.json")) as fh:
        dvs = [
            json.loads(ln)["add"].get("deletionVector")
            for ln in fh
            if ln.strip() and "add" in json.loads(ln)
        ]
    assert any(d and d["storageType"] == "p" for d in dvs)


def test_describe_detail_and_sql_statements(spark, tmp_path):
    from pg_analytics_spark.engine import Engine

    src = str(tmp_path / "src")
    _mk(spark, src)
    d = describe_detail_delta(src)
    assert d["format"] == "delta" and d["location"] == src
    assert d["numFiles"] >= 2 and d["sizeInBytes"] > 0
    assert d["partitionColumns"] == []
    assert d["minReaderVersion"] >= 1 and d["minWriterVersion"] >= 2

    eng = Engine(spark=spark)
    eng.attach("t", src, "delta")
    loc = str(tmp_path / "via_sql")
    row = eng.sql(
        f"CREATE TABLE t2 SHALLOW CLONE t LOCATION '{loc}'"
    ).collect()[0]
    assert row["source_version"] == 1 and row["version"] == 0
    assert eng.sql("SELECT COUNT(*) AS n FROM t2").collect()[0]["n"] == 14
    det = eng.sql("DESCRIBE DETAIL t2").collect()[0]
    assert det["format"] == "delta"
    assert det["numFiles"] == row["files"]
    assert det["id"] != describe_detail_delta(src)["id"]  # new table id
    # pinned clone: VERSION AS OF on the source
    loc0 = str(tmp_path / "via_sql0")
    row0 = eng.sql(
        f"CREATE TABLE t0 SHALLOW CLONE t VERSION AS OF 0 LOCATION '{loc0}'"
    ).collect()[0]
    assert row0["source_version"] == 0
    assert eng.sql("SELECT COUNT(*) AS n FROM t0").collect()[0]["n"] == 10


def test_convert_parquet_to_delta_in_place(spark, tmp_path):
    """r10 continuation: zero-copy CONVERT TO DELTA — the directory
    becomes a Delta table in place (no file moves), hive partitions
    must be DECLARED, and post-conversion DML/time-travel work."""
    from pyspark.sql import functions as F

    from pg_analytics_spark.sources.delta_write import (
        convert_parquet_to_delta,
        update_delta,
    )

    # flat layout
    flat = str(tmp_path / "flat")
    df = spark.range(20).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    df.repartition(3).write.parquet(flat)
    before = {
        os.path.join(r, n)
        for r, _d, ns in os.walk(flat)
        for n in ns
        if n.endswith(".parquet")
    }
    res = convert_parquet_to_delta(spark, flat)
    assert res == {"version": 0, "files": 3, "rows": 20}
    # zero-copy: same physical files, byte-identical set
    after = {
        os.path.join(r, n)
        for r, _d, ns in os.walk(flat)
        for n in ns
        if n.endswith(".parquet")
    }
    assert after == before
    assert _rows(spark, flat) == {(k, 2 * k) for k in range(20)}
    # it IS a delta table now: DML + time travel
    delete_delta(spark, flat, "k < 5")
    assert _rows(spark, flat) == {(k, 2 * k) for k in range(5, 20)}
    v0 = load_source(spark, flat, "delta", {"version_as_of": 0})
    assert v0.count() == 20
    update_delta(spark, flat, {"v": "v + 1"}, "k = 5")
    assert (5, 11) in _rows(spark, flat)

    # partitioned: must declare; undeclared refuses; declared works
    part = str(tmp_path / "part")
    df.withColumn("p", (F.col("k") % 2).cast("string")).write.partitionBy(
        "p"
    ).parquet(part)
    with pytest.raises(UnsupportedFormat, match="PARTITIONED BY"):
        convert_parquet_to_delta(spark, part)
    with pytest.raises(UnsupportedFormat, match="not in the hive path"):
        convert_parquet_to_delta(spark, part, partition_by=["nope"])
    res2 = convert_parquet_to_delta(spark, part, partition_by=["p"])
    assert res2["rows"] == 20
    got = {
        (r["k"], r["p"])
        for r in load_source(spark, part, "delta").collect()
    }
    assert got == {(k, str(k % 2)) for k in range(20)}
    # partition pruning works off the converted log's partitionValues
    assert (
        load_source(spark, part, "delta").filter("p = '1'").count() == 10
    )
    with pytest.raises(UnsupportedFormat, match="already a Delta"):
        convert_parquet_to_delta(spark, flat)


def test_convert_sql_statement_and_typed_partition(spark, tmp_path):
    from pg_analytics_spark.engine import Engine
    from pyspark.sql import functions as F

    part = str(tmp_path / "p2")
    spark.range(12).select(
        F.col("id").alias("k"), (F.col("id") % 3).alias("b")
    ).write.partitionBy("b").parquet(part)
    eng = Engine(spark=spark)
    row = eng.sql(
        f"CONVERT TO DELTA parquet.`{part}` PARTITIONED BY (b bigint)"
    ).collect()[0]
    assert row["rows"] == 12 and row["version"] == 0
    out = load_source(spark, part, "delta")
    assert dict(out.dtypes)["b"] == "bigint"  # DECLARED type, not a guess
    assert out.filter("b = 2").count() == 4
