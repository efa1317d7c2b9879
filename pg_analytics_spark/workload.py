"""Workload registry: every implemented operator as (Spark query, oracle SQL).

This is the project's §2-coverage ledger.  Each entry pairs a Spark
implementation (DataFrame API or Spark SQL) with the ANSI-SQL oracle
DuckDB executes over the same parquet files; the driver hash-compares
the two at sf0.01 (BASELINE.md t2 gate).

Float determinism contract
--------------------------
SUM/AVG over doubles is order-dependent; Spark's partial aggregation
and DuckDB's sequential scan would differ in the last bits.  Every
money/quantity aggregate therefore sums in DECIMAL (exact, associative
→ bit-identical in both engines) and casts the final value to DOUBLE,
and both sides compute derived per-row expressions with identical
parenthesization so the IEEE ops match 1:1.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pg_analytics_spark.sources import load_source

# --------------------------------------------------------------------- #
# registry plumbing
# --------------------------------------------------------------------- #


@dataclass
class QueryDef:
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None → non-SQL-expressible, rows-only check
    doc: str = ""


REGISTRY: dict[str, QueryDef] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    def deco(fn):
        REGISTRY[name] = QueryDef(fn, oracle, doc)
        return fn

    return deco


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table through the engine's source layer
    (handles TIMESTAMP(NANOS) repair for `events`)."""
    return load_source(spark, f"{sf_dir}/{name}.parquet", "parquet")


def _dec(col, p=28, s=6):
    """Exact-sum staging cast (see module docstring)."""
    return F.col(col).cast(f"decimal({p},{s})") if isinstance(col, str) else col.cast(
        f"decimal({p},{s})"
    )


# --------------------------------------------------------------------- #
# Q1 — pricing summary (flagship; TPC-H Q1 shape over lineitem)
# --------------------------------------------------------------------- #


@register(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(10,2)) * CAST(1 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(10,2)) * CAST(1 - l_discount AS DECIMAL(4,2)) * CAST(1 + l_tax AS DECIMAL(4,2))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    doc="Scan+filter+group-agg; the reference's delegated-aggregate surface "
    "(SURVEY §2.2; reference README.md:113-117 COUNT demo generalized). "
    "Money products are computed in exact decimal arithmetic (each 2-decimal "
    "factor cast to a narrow decimal first) so Spark and the oracle agree "
    "bit-for-bit; casting the double *product* instead would hit "
    "HALF_UP-vs-half-even tie divergence.",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(10,2)")
    one_minus_disc = (F.lit(1) - F.col("l_discount")).cast("decimal(4,2)")
    one_plus_tax = (F.lit(1) + F.col("l_tax")).cast("decimal(4,2)")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(price * one_minus_disc).cast("double").alias("sum_disc_price"),
            F.sum(price * one_minus_disc * one_plus_tax)
            .cast("double")
            .alias("sum_charge"),
            (F.sum(_dec("l_quantity")).cast("double") / F.count("*")).alias("avg_qty"),
            (F.sum(_dec("l_extendedprice")).cast("double") / F.count("*")).alias(
                "avg_price"
            ),
            (F.sum(_dec("l_discount")).cast("double") / F.count("*")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --------------------------------------------------------------------- #
# count_star — the reference's flagship demo (README.md:98-118)
# --------------------------------------------------------------------- #


@register(
    "count_star",
    oracle="SELECT COUNT(*) AS n FROM lineitem",
    doc="Scalar aggregate / UNGROUPED_AGGREGATE (reference tests/tests/scan.rs:67-68).",
)
def count_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "lineitem").agg(F.count("*").alias("n"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: qd.spark for name, qd in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: qd.oracle for name, qd in REGISTRY.items() if qd.oracle}
