"""Iceberg changelog scan: snapshot-derived insert/delete images
(sources/iceberg_changelog.py)."""

from __future__ import annotations

import pytest

from pg_analytics_spark.errors import UnsupportedFormat
from pg_analytics_spark.sources.iceberg_changelog import iceberg_changelog
from pg_analytics_spark.sources.iceberg_write import (
    alter_iceberg,
    compact_iceberg,
    delete_iceberg,
    equality_delete_iceberg,
    update_iceberg,
    upsert_iceberg_eq,
    write_iceberg,
)


def _mk(spark, path):
    from pyspark.sql import functions as F

    write_iceberg(
        spark.range(10).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        ),
        path,
        mode="overwrite",
    )


def _agg(ch):
    from pyspark.sql import functions as F

    return {
        (r["_sequence_number"], r["_change_type"]): r["n"]
        for r in ch.groupBy("_sequence_number", "_change_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }


def test_full_lifecycle_counts(spark, tmp_path):
    from pyspark.sql import functions as F

    path = str(tmp_path / "t")
    _mk(spark, path)  # seq1
    update_iceberg(spark, path, {"v": "v + 100"}, "k < 3")  # seq2
    delete_iceberg(spark, path, "k >= 8")  # seq3
    write_iceberg(
        spark.range(20, 22).select(
            F.col("id").alias("k"), F.col("id").alias("v")
        ),
        path,
        mode="append",
    )  # seq4
    equality_delete_iceberg(
        spark, path, spark.createDataFrame([(5,)], "k bigint"), ["k"]
    )  # seq5
    compact_iceberg(spark, path)  # seq6: replace, skipped
    ch = iceberg_changelog(spark, path)
    assert _agg(ch) == {
        (1, "insert"): 10,
        (2, "delete"): 3,
        (2, "insert"): 3,
        (3, "delete"): 2,
        (4, "insert"): 2,
        (5, "delete"): 1,
    }
    pre = {
        r["k"]: r["v"]
        for r in ch.filter(
            "_sequence_number=2 AND _change_type='delete'"
        ).collect()
    }
    assert pre == {0: 0, 1: 2, 2: 4}


def test_seq_range_and_overwrite_replace(spark, tmp_path):
    from pyspark.sql import functions as F

    path = str(tmp_path / "t")
    _mk(spark, path)  # seq1
    write_iceberg(
        spark.range(3).select(
            F.col("id").alias("k"), F.col("id").alias("v")
        ),
        path,
        mode="overwrite",
    )  # seq2: logical replace -> 10 deletes + 3 inserts
    ch = iceberg_changelog(spark, path, from_seq=2, to_seq=2)
    assert _agg(ch) == {(2, "delete"): 10, (2, "insert"): 3}


def test_eq_upsert_changelog(spark, tmp_path):
    """upsert_iceberg_eq commits eq-deletes + new data in ONE
    snapshot: the changelog shows delete(old image) + insert(new) for
    updated keys and insert-only for fresh keys."""
    from pyspark.sql import functions as F

    path = str(tmp_path / "t")
    _mk(spark, path)  # seq1: k 0..9, v=2k
    src = spark.createDataFrame([(1, 777), (42, 4242)], "k bigint, v bigint")
    upsert_iceberg_eq(spark, path, src, ["k"])  # seq2
    ch = iceberg_changelog(spark, path, from_seq=2)
    rows = {
        (r["_change_type"], r["k"], r["v"]) for r in ch.collect()
    }
    assert rows == {
        ("delete", 1, 2),
        ("insert", 1, 777),
        ("insert", 42, 4242),
    }


def test_changelog_survives_rename(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, path)
    update_iceberg(spark, path, {"v": "v + 1"}, "k = 0")  # seq2
    alter_iceberg(path, rename=("v", "val"))
    ch = iceberg_changelog(spark, path)
    assert "val" in ch.columns and "v" not in ch.columns
    post = {
        r["k"]: r["val"]
        for r in ch.filter(
            "_sequence_number=2 AND _change_type='insert'"
        ).collect()
    }
    assert post == {0: 1}


def test_empty_and_errors(spark, tmp_path):
    path = str(tmp_path / "t")
    with pytest.raises(UnsupportedFormat):
        iceberg_changelog(spark, str(tmp_path / "missing"))
    _mk(spark, path)
    ch = iceberg_changelog(spark, path, from_seq=99, to_seq=99)
    assert ch.count() == 0
    assert "_change_type" in ch.columns
