"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship query over /root/testdata/sf0.001.
queries()      — every implemented operator from SURVEY.md §2
                 (delegates to pg_analytics_spark.workload.REGISTRY).
oracle_sql()   — matching DuckDB oracle SQL per query.
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

if "/root/repo" not in sys.path:
    sys.path.insert(0, "/root/repo")

from pg_analytics_spark import workload


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return workload.q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return workload.queries()


def oracle_sql() -> dict[str, str]:
    return workload.oracle_sql()
