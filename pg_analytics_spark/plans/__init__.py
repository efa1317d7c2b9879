"""Plan inspection utilities (SURVEY §4, §5 plan-assertion test style)."""

from pg_analytics_spark.plans.inspect import (
    explain_formatted,
    pushed_filters,
    read_schema_columns,
    scan_reads_only,
    uses_broadcast_join,
    wholestage_codegen_spans,
)
from pg_analytics_spark.plans.lint import iter_plan_nodes, lint_plan

__all__ = [
    "explain_formatted",
    "iter_plan_nodes",
    "lint_plan",
    "pushed_filters",
    "read_schema_columns",
    "scan_reads_only",
    "uses_broadcast_join",
    "wholestage_codegen_spans",
]
