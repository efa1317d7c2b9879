"""Per-file Bloom skip index (r13): no false negatives ever, pruning
on hash-clustered layouts where zone maps cannot prune, exact results
via the typed residual predicate, deterministic hashing."""

from __future__ import annotations

import pytest

from pg_analytics_spark.errors import UnsupportedFormat
from pg_analytics_spark.operators.bloom_index import (
    _positions,
    bloom_candidate_files,
    bloom_probe_rows,
    build_bloom_index,
)


@pytest.fixture()
def hashed_table(spark, tmp_path):
    """8 files hash-clustered on k: every file spans the full k RANGE
    (min/max useless) but each k value lives in exactly one file."""
    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, i % 997, f"v{i}") for i in range(4000)],
        "id long, k long, s string",
    )
    df.repartition(8, "k").write.parquet(path)
    return path


def test_probe_matches_direct_filter(spark, tmp_path, hashed_table):
    idx = str(tmp_path / "idx")
    res = build_bloom_index(spark, hashed_table, ["k"], idx)
    assert res["entries"] == 8
    got = {
        (r["id"], r["k"], r["s"])
        for r in bloom_probe_rows(
            spark, idx, "k", [37, 911, 423]
        ).collect()
    }
    want = {
        (r["id"], r["k"], r["s"])
        for r in spark.read.parquet(hashed_table)
        .filter("k in (37, 911, 423)")
        .collect()
    }
    assert got == want and got


def test_no_false_negatives_and_pruning(spark, tmp_path, hashed_table):
    idx = str(tmp_path / "idx")
    build_bloom_index(spark, hashed_table, ["k"], idx)
    # every present value's owning file is ALWAYS a candidate
    rows = (
        spark.read.parquet(hashed_table)
        .selectExpr(
            "k",
            "regexp_replace(_metadata.file_path, '^file:/+', '/') AS f",
        )
        .distinct()
        .collect()
    )
    owner = {}
    for r in rows:
        owner.setdefault(r["k"], set()).add(r["f"])
    for kval in (0, 1, 996, 500):
        cand, total = bloom_candidate_files(spark, idx, "k", [kval])
        assert owner[kval] <= set(cand)  # no false negative
        assert len(cand) < total  # and it actually prunes
    # an absent value prunes to (almost) nothing
    cand, total = bloom_candidate_files(spark, idx, "k", [10_000_000])
    assert len(cand) < total


def test_absent_value_empty_frame_keeps_schema(
    spark, tmp_path, hashed_table
):
    idx = str(tmp_path / "idx")
    build_bloom_index(spark, hashed_table, ["k"], idx, m_bits=1 << 16)
    out = bloom_probe_rows(spark, idx, "k", [10_000_000])
    assert out.count() == 0
    assert set(out.columns) == {"id", "k", "s"}


def test_string_column_and_multi_col_index(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, f"user-{i % 131}") for i in range(2000)],
        "id long, u string",
    )
    df.repartition(6, "u").write.parquet(path)
    idx = str(tmp_path / "idx")
    res = build_bloom_index(spark, path, ["u", "id"], idx)
    assert res["entries"] == 12  # 6 files x 2 cols
    got = {
        (r["id"], r["u"])
        for r in bloom_probe_rows(spark, idx, "u", ["user-7"]).collect()
    }
    assert got == {(i, "user-7") for i in range(7, 2000, 131)}
    cand, total = bloom_candidate_files(spark, idx, "u", ["user-7"])
    assert len(cand) < total == 6


def test_positions_deterministic_and_validation(spark, tmp_path):
    assert _positions("abc", 1 << 16, 7) == _positions("abc", 1 << 16, 7)
    assert _positions("abc", 1 << 16, 7) != _positions("abd", 1 << 16, 7)
    with pytest.raises(UnsupportedFormat, match="no columns"):
        build_bloom_index(spark, str(tmp_path), [], str(tmp_path / "i"))
    with pytest.raises(UnsupportedFormat, match="power of two"):
        build_bloom_index(
            spark, str(tmp_path), ["k"], str(tmp_path / "i"), m_bits=1000
        )
    path = str(tmp_path / "t")
    spark.range(10).write.parquet(path)
    idx = str(tmp_path / "idx")
    build_bloom_index(spark, path, ["id"], idx)
    with pytest.raises(UnsupportedFormat, match="no column"):
        bloom_candidate_files(spark, idx, "nope", [1])
