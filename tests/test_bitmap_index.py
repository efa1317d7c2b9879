"""Roaring-bitmap secondary index: build / count-from-index /
exact-file-pruned retrieval (operators/bitmap_index.py)."""

from __future__ import annotations

import os

import pytest

from pg_analytics_spark.errors import UnsupportedFormat
from pg_analytics_spark.operators.bitmap_index import (
    bitmap_probe_count,
    bitmap_probe_rows,
    build_bitmap_index,
)


def _table(spark, tmp_path, n_files=4, by_col=None):
    from pyspark.sql import functions as F

    df = spark.range(4000).select(
        F.col("id").alias("k"),
        (F.col("id") % 5).cast("string").alias("cat"),
        (F.col("id") % 7).alias("grp"),
        (F.col("id") * 1.5).alias("v"),
    )
    path = str(tmp_path / "tbl")
    w = (
        df.repartition(n_files, by_col)
        if by_col
        else df.repartition(n_files)
    )
    w.write.parquet(path)
    return df, path


def test_count_and_rows_match_plain_filter(spark, tmp_path):
    from pyspark.sql import functions as F

    df, path = _table(spark, tmp_path)
    idx = str(tmp_path / "idx")
    res = build_bitmap_index(
        spark, path, {"cat": "cat", "grp": "grp % 3"}, idx
    )
    assert res["entries"] > 0
    preds = {"cat": "2", "grp": "1"}
    expected = df.filter(
        (F.col("cat") == "2") & (F.col("grp") % 3 == 1)
    )
    cnt = bitmap_probe_count(spark, idx, preds).collect()[0]
    assert cnt["n_rows"] == expected.count()
    got = sorted(
        r["k"]
        for r in bitmap_probe_rows(spark, idx, preds, ["k"]).collect()
    )
    assert got == sorted(r["k"] for r in expected.select("k").collect())


def test_or_within_column(spark, tmp_path):
    from pyspark.sql import functions as F

    df, path = _table(spark, tmp_path)
    idx = str(tmp_path / "idx")
    build_bitmap_index(spark, path, {"cat": "cat"}, idx)
    cnt = bitmap_probe_count(spark, idx, {"cat": ["1", "3"]}).collect()[0]
    assert cnt["n_rows"] == df.filter(F.col("cat").isin("1", "3")).count()


def test_exact_file_pruning(spark, tmp_path):
    """Partition the data so one cat value lives in few files: the
    probe's read set (n_files) must be the EXACT matched-file count,
    and the retrieval scan must open only those files."""
    _df, path = _table(spark, tmp_path, n_files=5, by_col="cat")
    idx = str(tmp_path / "idx")
    build_bitmap_index(spark, path, {"cat": "cat"}, idx)
    total_files = len(
        [f for f in os.listdir(path) if f.endswith(".parquet")]
    )
    cnt = bitmap_probe_count(spark, idx, {"cat": "2"}).collect()[0]
    assert cnt["n_rows"] == 800
    assert cnt["n_files"] < total_files  # value-clustered layout prunes
    rows = bitmap_probe_rows(spark, idx, {"cat": "2"}, ["k"])
    data_files = {
        f
        for f in rows.inputFiles()
        if "/tbl/" in f.replace(os.sep, "/")
    }
    assert len(data_files) == cnt["n_files"]


def test_empty_probe(spark, tmp_path):
    _df, path = _table(spark, tmp_path)
    idx = str(tmp_path / "idx")
    build_bitmap_index(spark, path, {"cat": "cat"}, idx)
    cnt = bitmap_probe_count(spark, idx, {"cat": "999"}).collect()[0]
    assert cnt["n_rows"] == 0 and cnt["n_files"] == 0
    # zero matches is a normal outcome: empty frame, data schema
    # preserved (r9 ADVICE — was an UnsupportedFormat raise)
    empty = bitmap_probe_rows(spark, idx, {"cat": "999"})
    assert empty.count() == 0
    assert set(empty.columns) == {"k", "cat", "grp", "v"}
    proj = bitmap_probe_rows(spark, idx, {"cat": "999"}, columns=["k"])
    assert proj.columns == ["k"] and proj.count() == 0
    # a missing/empty index stays loud
    os.makedirs(str(tmp_path / "noidx"))
    spark.createDataFrame(
        [], "file string, col string, value string, card long, blob binary"
    ).write.parquet(str(tmp_path / "noidx"), mode="overwrite")
    with pytest.raises(UnsupportedFormat):
        bitmap_probe_rows(spark, str(tmp_path / "noidx"), {"cat": "1"})


def test_nulls_not_indexed_and_missing_column_ands_to_empty(
    spark, tmp_path
):
    from pyspark.sql import functions as F

    df = spark.range(100).select(
        F.col("id").alias("k"),
        F.when(F.col("id") < 50, F.lit(None)).otherwise(
            (F.col("id") % 2).cast("string")
        ).alias("half"),
    )
    path = str(tmp_path / "tbl")
    df.repartition(2).write.parquet(path)
    idx = str(tmp_path / "idx")
    build_bitmap_index(spark, path, {"half": "half"}, idx)
    cnt = bitmap_probe_count(spark, idx, {"half": "1"}).collect()[0]
    assert cnt["n_rows"] == 25  # NULL rows are not indexed


def test_positions_across_roaring_container_boundary(spark, tmp_path):
    """One file with > 2^16 rows: positions span multiple 16-bit
    roaring containers; the codec round-trip must stay exact."""
    from pyspark.sql import functions as F

    df = spark.range(200_000).select(
        F.col("id").alias("k"),
        (F.col("id") % 2).cast("string").alias("par"),
    )
    path = str(tmp_path / "tbl")
    df.coalesce(1).write.parquet(path)
    idx = str(tmp_path / "idx")
    build_bitmap_index(spark, path, {"par": "par"}, idx)
    cnt = bitmap_probe_count(spark, idx, {"par": "1"}).collect()[0]
    assert cnt["n_rows"] == 100_000
    got = bitmap_probe_rows(spark, idx, {"par": "1"}, ["k"])
    assert got.agg({"k": "max"}).collect()[0][0] == 199_999
