"""Delta CHECK constraints (protocol writer feature
``checkConstraints``): ALTER ADD/DROP CONSTRAINT, protocol bump to
minWriterVersion 3, and enforcement on EVERY write path — append,
overwrite, UPDATE rewrite, MERGE output
(sources/delta_write.alter_delta_constraints / _check_constraints)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from pg_analytics_spark.errors import UnsupportedFormat
from pg_analytics_spark.sources import load_source
from pg_analytics_spark.sources.delta_write import (
    _latest_protocol,
    alter_delta_constraints,
    merge_delta,
    update_delta,
    write_delta,
)


def _mk(spark, path):
    df = spark.range(10).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    write_delta(df, path, mode="overwrite")
    return df


def test_add_validates_existing_and_bumps_protocol(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, path)
    # a constraint the current data violates is refused
    with pytest.raises(UnsupportedFormat, match="violated by 5 row"):
        alter_delta_constraints(path, add=("v_big", "v >= 10"), spark=spark)
    r = alter_delta_constraints(path, add=("v_pos", "v >= 0"), spark=spark)
    assert r["operation"] == "ADD CONSTRAINT"
    proto = _latest_protocol(os.path.join(path, "_delta_log"))
    assert proto["minWriterVersion"] >= 3
    with pytest.raises(UnsupportedFormat, match="already exists"):
        alter_delta_constraints(path, add=("v_pos", "v >= 0"), spark=spark)


def test_enforced_on_every_write_path(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, path)
    alter_delta_constraints(path, add=("v_pos", "v >= 0"), spark=spark)
    bad = spark.createDataFrame([(100, -2)], "k long, v long")
    n_before = load_source(spark, path, "delta").count()
    # append
    with pytest.raises(UnsupportedFormat, match="v_pos"):
        write_delta(bad, path, mode="append")
    # overwrite
    with pytest.raises(UnsupportedFormat, match="v_pos"):
        write_delta(bad, path, mode="overwrite")
    # UPDATE rewrite
    with pytest.raises(UnsupportedFormat, match="v_pos"):
        update_delta(spark, path, {"v": "v - 100"}, "k < 3")
    # merge-on-read (DV) UPDATE stages only updated row images —
    # still enforced
    with pytest.raises(UnsupportedFormat, match="v_pos"):
        update_delta(spark, path, {"v": "v - 100"}, "k < 3", dv=True)
    # MERGE output
    with pytest.raises(UnsupportedFormat, match="v_pos"):
        merge_delta(
            bad,
            path,
            "t.k = s.k",
            [
                {"when": "not_matched", "action": "insert",
                 "values": "all", "condition": None},
            ],
        )
    # nothing was committed or staged by any refused write
    out = load_source(spark, path, "delta")
    assert out.count() == n_before and out.filter("v < 0").count() == 0
    # NULL passes (SQL CHECK semantics) and valid rows write fine
    write_delta(
        spark.createDataFrame([(200, None)], "k long, v long"),
        path,
        mode="append",
    )
    write_delta(
        spark.createDataFrame([(201, 7)], "k long, v long"),
        path,
        mode="append",
    )
    assert load_source(spark, path, "delta").count() == n_before + 2
    # after DROP the write goes through
    alter_delta_constraints(path, drop="v_pos")
    write_delta(bad, path, mode="append")
    assert load_source(spark, path, "delta").filter("v < 0").count() == 1
    with pytest.raises(UnsupportedFormat, match="does not exist"):
        alter_delta_constraints(path, drop="v_pos")


def test_engine_sql_statements(spark, tmp_path):
    from pg_analytics_spark.engine import Engine

    path = str(tmp_path / "t")
    _mk(spark, path)
    eng = Engine(spark=spark)
    eng.attach("t", [path], "delta")
    r = eng.sql(
        "ALTER TABLE t ADD CONSTRAINT v_pos CHECK (v >= 0 AND v < 1000)"
    ).collect()[0]
    assert r["operation"] == "ADD CONSTRAINT" and r["name"] == "v_pos"
    # surfaced through SHOW TBLPROPERTIES
    props = {
        row["key"]: row["value"]
        for row in eng.sql("SHOW TBLPROPERTIES t").collect()
    }
    assert props["delta.constraints.v_pos"] == "v >= 0 AND v < 1000"
    with pytest.raises(UnsupportedFormat, match="v_pos"):
        eng.sql("INSERT INTO t VALUES (100, -5)")
    r2 = eng.sql("ALTER TABLE t DROP CONSTRAINT v_pos").collect()[0]
    assert r2["operation"] == "DROP CONSTRAINT"
    eng.sql("INSERT INTO t VALUES (100, -5)")
    assert eng.sql(
        "SELECT COUNT(*) AS n FROM t WHERE v = -5"
    ).collect()[0]["n"] == 1
