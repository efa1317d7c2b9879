"""Zero-copy ADOPTION into Iceberg (r11): ``add_iceberg_files`` over
hive-parquet layouts and partitioned Delta→Iceberg ``snapshot``
migration — both reference foreign files in place and record identity
partition tuples that the reader projects as constant columns
(reference parity: the runtime's ``add_files`` / ``snapshot``
procedures; hive data files do not CONTAIN their partition columns).

The r10 lesson applies throughout: adopted/foreign files break
writer-private "by construction" invariants, so the battery re-checks
DML, pruning, appends (mixed adopted+native scans), and compaction on
adopted layouts."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from pg_analytics_spark.errors import UnsupportedFormat
from pg_analytics_spark.sources import load_source
from pg_analytics_spark.sources.iceberg_write import (
    add_iceberg_files,
    delete_iceberg,
    snapshot_delta_to_iceberg,
    write_iceberg,
)


def _mk_hive(spark, path: str, n: int = 40):
    """Hive-partitioned parquet: string + int partition dirs, data
    columns only inside the files (partitionBy drops its columns)."""
    df = spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") * 2).alias("v"),
        (F.col("id") % 2).cast("string").alias("p"),
        (F.col("id") % 3).cast("int").alias("b"),
    )
    df.write.mode("overwrite").partitionBy("p", "b").parquet(path)
    return {(k, 2 * k, str(k % 2), k % 3) for k in range(n)}


def _rows(spark, path):
    return {
        tuple(r) for r in load_source(spark, path, "iceberg").collect()
    }


def test_add_files_hive_partitioned_roundtrip(spark, tmp_path):
    src = str(tmp_path / "hive")
    expect = _mk_hive(spark, src)
    dst = str(tmp_path / "ice")
    r = add_iceberg_files(
        spark, src, dst, partition_by=["p string", "b int"]
    )
    assert r["rows"] == 40 and r["files"] >= 6
    got = {
        (x["k"], x["v"], x["p"], x["b"])
        for x in load_source(spark, dst, "iceberg").collect()
    }
    assert got == expect
    # declared int type really lands as int (hive inference would not)
    sch = dict(load_source(spark, dst, "iceberg").dtypes)
    assert sch["b"] == "int" and sch["p"] == "string"
    # zero-copy: no parquet copied under the target
    assert not any(
        n.endswith(".parquet")
        for _r, _d, ns in os.walk(dst)
        for n in ns
    )


def test_add_files_partition_pruning(spark, tmp_path):
    src = str(tmp_path / "hive")
    _mk_hive(spark, src)
    dst = str(tmp_path / "ice")
    add_iceberg_files(spark, src, dst, partition_by=["p string", "b int"])
    out = load_source(
        spark, dst, "iceberg", {"partition_filter": [["p", "=", "1"], ["b", "=", 0]]}
    )
    rows = {(r["k"], r["p"], r["b"]) for r in out.select("k", "p", "b").collect()}
    assert rows == {(k, "1", 0) for k in range(40) if k % 2 == 1 and k % 3 == 0}
    # the probe must SCAN only the matching partition's files
    scanned = [
        f
        for f in out.inputFiles()
        if f.endswith(".parquet")
    ]
    assert scanned and all("p=1" in f and "b=0" in f for f in scanned)


def test_add_files_append_and_delete_after_adoption(spark, tmp_path):
    src = str(tmp_path / "hive")
    expect = _mk_hive(spark, src)
    dst = str(tmp_path / "ice")
    add_iceberg_files(spark, src, dst, partition_by=["p string", "b int"])
    # native append: the new files physically CARRY the partition
    # columns; the mixed scan coalesces adopted constants over them
    extra = spark.createDataFrame(
        [(100, 200, "0", 1), (101, 202, "1", 2)],
        "k long, v long, p string, b int",
    )
    write_iceberg(extra, dst, mode="append", partition_by=["p", "b"])
    assert _rows(spark, dst) == expect | {(100, 200, "0", 1), (101, 202, "1", 2)}
    # DML predicate ON A PARTITION COLUMN must see the projected
    # constants (a raw scan would 3VL-null it and match nothing)
    r = delete_iceberg(spark, dst, "p = '0' AND b = 0")
    assert r["rows_deleted"] == len([k for k in range(40) if k % 2 == 0 and k % 3 == 0])
    assert _rows(spark, dst) == {
        t for t in expect if not (t[2] == "0" and t[3] == 0)
    } | {(100, 200, "0", 1), (101, 202, "1", 2)}
    # time travel to the adoption snapshot still reads everything
    from pg_analytics_spark.sources.iceberg_write import _latest_metadata

    _v, meta = _latest_metadata(os.path.join(dst, "metadata"))
    first = min(meta["snapshots"], key=lambda s: s["sequence-number"])
    got0 = {
        tuple(r)
        for r in load_source(
            spark, dst, "iceberg", {"snapshot_id": first["snapshot-id"]}
        ).collect()
    }
    assert got0 == expect


def test_add_files_compact_materializes_constants(spark, tmp_path):
    """Compaction rewrites adopted files with delete debt — the new
    files must physically CARRY the projected partition values, not
    NULLs (the adopted-file invariant lesson)."""
    from pg_analytics_spark.sources.iceberg_write import compact_iceberg

    src = str(tmp_path / "hive")
    expect = _mk_hive(spark, src)
    dst = str(tmp_path / "ice")
    add_iceberg_files(spark, src, dst, partition_by=["p string", "b int"])
    delete_iceberg(spark, dst, "k % 4 = 1")
    expect = {t for t in expect if t[0] % 4 != 1}
    assert _rows(spark, dst) == expect
    r = compact_iceberg(spark, dst)
    assert r["files_rewritten"] >= 1
    assert _rows(spark, dst) == expect
    out = load_source(spark, dst, "iceberg")
    assert out.filter(F.col("p").isNull() | F.col("b").isNull()).count() == 0


def test_add_files_unpartitioned_and_null_partition(spark, tmp_path):
    # flat dir (no partitions) adopts too
    flat = str(tmp_path / "flat")
    df = spark.range(10).select(F.col("id").alias("k"))
    df.write.mode("overwrite").parquet(flat)
    dst = str(tmp_path / "ice_flat")
    r = add_iceberg_files(spark, flat, dst)
    assert r["rows"] == 10
    assert {x["k"] for x in load_source(spark, dst, "iceberg").collect()} == set(range(10))
    # __HIVE_DEFAULT_PARTITION__ → NULL partition value
    nulls = str(tmp_path / "nulls")
    spark.createDataFrame(
        [(1, "a"), (2, None)], "k long, p string"
    ).write.mode("overwrite").partitionBy("p").parquet(nulls)
    dst2 = str(tmp_path / "ice_nulls")
    add_iceberg_files(spark, nulls, dst2, partition_by=["p"])
    got = {
        (x["k"], x["p"])
        for x in load_source(spark, dst2, "iceberg").collect()
    }
    assert got == {(1, "a"), (2, None)}


def test_add_files_date_partition(spark, tmp_path):
    import datetime as dt

    src = str(tmp_path / "hive")
    spark.createDataFrame(
        [(1, dt.date(2024, 1, 2)), (2, dt.date(2024, 3, 4))],
        "k long, d date",
    ).write.mode("overwrite").partitionBy("d").parquet(src)
    dst = str(tmp_path / "ice")
    add_iceberg_files(spark, src, dst, partition_by=["d date"])
    got = {
        (x["k"], x["d"])
        for x in load_source(spark, dst, "iceberg").collect()
    }
    assert got == {(1, dt.date(2024, 1, 2)), (2, dt.date(2024, 3, 4))}


def test_add_files_refusals(spark, tmp_path):
    src = str(tmp_path / "hive")
    _mk_hive(spark, src)
    # undeclared hive dirs refuse (inference would bake guesses)
    with pytest.raises(UnsupportedFormat, match="declare them"):
        add_iceberg_files(spark, src, str(tmp_path / "x1"))
    # declared column the path does not carry refuses
    with pytest.raises(UnsupportedFormat, match="not in the"):
        add_iceberg_files(
            spark, src, str(tmp_path / "x2"),
            partition_by=["p string", "b int", "zzz int"],
        )
    # unsupported declared type refuses
    with pytest.raises(UnsupportedFormat, match="unsupported"):
        add_iceberg_files(
            spark, src, str(tmp_path / "x3"),
            partition_by=["p timestamp", "b int"],
        )
    # a physically present partition column refuses (two truths)
    phys = str(tmp_path / "phys")
    spark.range(4).select(
        F.col("id").alias("k"), F.lit("a").alias("p")
    ).write.mode("overwrite").parquet(os.path.join(phys, "p=a"))
    with pytest.raises(UnsupportedFormat, match="physically present"):
        add_iceberg_files(spark, phys, str(tmp_path / "x4"), partition_by=["p"])
    # a Delta table refuses (the log is the truth, not the listing)
    from pg_analytics_spark.sources.delta_write import write_delta

    d = str(tmp_path / "d")
    write_delta(spark.range(3).select(F.col("id").alias("k")), d, mode="overwrite")
    with pytest.raises(UnsupportedFormat, match="Delta table"):
        add_iceberg_files(spark, d, str(tmp_path / "x5"))


def test_snapshot_partitioned_delta_roundtrip(spark, tmp_path):
    from pg_analytics_spark.sources.delta_write import (
        delete_delta,
        write_delta,
    )

    src = str(tmp_path / "delta")
    df = spark.range(30).select(
        F.col("id").alias("k"),
        (F.col("id") * 3).alias("v"),
        (F.col("id") % 4).cast("int").alias("b"),
    )
    write_delta(df, src, mode="overwrite", partition_by="b")
    delete_delta(spark, src, "k >= 24")  # active set ≠ all files
    dst = str(tmp_path / "ice")
    r = snapshot_delta_to_iceberg(spark, src, dst)
    assert r["rows"] == 24
    expect = {(k, 3 * k, k % 4) for k in range(24)}
    assert _rows(spark, dst) == expect
    # typed partition column (int, from the Delta schema — not a
    # string guess), pruning works off the migrated tuples
    sch = dict(load_source(spark, dst, "iceberg").dtypes)
    assert sch["b"] == "int"
    out = load_source(spark, dst, "iceberg", {"partition_filter": [["b", "=", 2]]})
    assert {x["k"] for x in out.collect()} == {k for k in range(24) if k % 4 == 2}
    # DML after migration, on the partition column
    r2 = delete_iceberg(spark, dst, "b = 1")
    assert r2["rows_deleted"] == 6
    assert _rows(spark, dst) == {t for t in expect if t[2] != 1}
    # unsupported partition source type still refuses
    ts = str(tmp_path / "ts")
    write_delta(
        spark.range(4).select(
            F.col("id").alias("k"),
            F.col("id").cast("double").alias("p"),
        ),
        ts,
        mode="overwrite",
        partition_by="p",
    )
    with pytest.raises(UnsupportedFormat, match="int/long/string/date"):
        snapshot_delta_to_iceberg(spark, ts, str(tmp_path / "x"))
