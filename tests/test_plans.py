"""Plan assertions — the reference's EXPLAIN test style (reference
tests/tests/explain.rs; qual-pushdown assertion scan.rs:396-404) mapped
to Catalyst physical plans.  These tests are the §4 scale contract:
pushdown/pruning/broadcast must actually appear in the plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from pg_analytics_spark.plans import (
    pushed_filters,
    read_schema_columns,
    uses_broadcast_join,
    wholestage_codegen_spans,
)
from pg_analytics_spark.workload.core_sql import q1_pricing_summary, q5_local_supplier

from .conftest import SF_DIR


def test_predicate_pushdown_reaches_scan(spark):
    df = spark.table("lineitem").filter(F.col("l_quantity") > 45.0).select(
        "l_orderkey"
    )
    filters = pushed_filters(df)
    assert any("l_quantity" in f for f in filters), filters


def test_column_pruning(spark):
    df = spark.table("lineitem").select("l_orderkey", "l_quantity")
    cols = set(read_schema_columns(df))
    assert cols == {"l_orderkey", "l_quantity"}, cols


def test_q1_prunes_to_needed_columns(spark):
    df = q1_pricing_summary(spark, SF_DIR)
    cols = set(read_schema_columns(df))
    assert "l_partkey" not in cols and "l_suppkey" not in cols
    assert {"l_returnflag", "l_linestatus", "l_quantity"} <= cols


def test_q5_broadcasts_dimensions(spark):
    assert uses_broadcast_join(q5_local_supplier(spark, SF_DIR))


def test_q1_single_codegen_pipeline(spark):
    # scan+filter+partial-agg must fuse into whole-stage codegen
    assert wholestage_codegen_spans(q1_pricing_summary(spark, SF_DIR)) >= 1


def test_limit_not_full_sort(spark):
    # top-N must plan as TakeOrderedAndProject, not global sort + limit
    df = (
        spark.table("orders")
        .orderBy(F.desc("o_totalprice"))
        .limit(5)
    )
    from pg_analytics_spark.plans import explain_formatted

    assert "TakeOrderedAndProject" in explain_formatted(df)
