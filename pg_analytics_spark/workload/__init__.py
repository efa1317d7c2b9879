"""Workload package: the engine's §2-coverage ledger.

Submodules register queries into base.REGISTRY on import:
    core_sql — the reference's delegated SQL surface (SURVEY §2.2)
    tpch     — TPC-H-derived decision-support shapes (q4/q6/q10/...)
    llm      — LLM-data-pipeline operators (dedup/similarity/text)
    temporal — as-of join / banded range join over events
    stream   — event-stream analytics (batch twins of streaming ops)
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pg_analytics_spark.workload.base import REGISTRY, QueryDef, table

# Import for side effect: each registers its queries.
from pg_analytics_spark.workload import core_sql  # noqa: E402,F401
from pg_analytics_spark.workload import tpch  # noqa: E402,F401
from pg_analytics_spark.workload import llm  # noqa: E402,F401
from pg_analytics_spark.workload import temporal  # noqa: E402,F401
from pg_analytics_spark.workload import stream  # noqa: E402,F401
from pg_analytics_spark.workload import sketch  # noqa: E402,F401
from pg_analytics_spark.workload.core_sql import q1_pricing_summary  # noqa: F401


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: qd.spark for name, qd in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: qd.oracle for name, qd in REGISTRY.items() if qd.oracle}


__all__ = ["REGISTRY", "QueryDef", "queries", "oracle_sql", "table"]
