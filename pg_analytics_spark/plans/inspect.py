"""Physical-plan inspection: the Spark analog of the reference's EXPLAIN
assertions (reference tests/tests/explain.rs:175-328 matches plan text
line-by-line; tests/tests/scan.rs:396-404 asserts qual pushdown).

These helpers parse ``EXPLAIN FORMATTED`` output so tests can assert
that Catalyst actually did what §4 claims is automatic: filters reach
the parquet scan (PushedFilters), projection prunes the read schema
(ReadSchema), small dims broadcast, operators stay inside whole-stage
codegen.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_formatted(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters pushed into the parquet scan (empty = nothing pushed)."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", explain_formatted(df)):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns the parquet scan actually reads (column pruning check)."""
    cols: list[str] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", explain_formatted(df)):
        for field in m.group(1).split(","):
            name = field.split(":")[0].strip()
            if name:
                cols.append(name)
    return cols


def scan_reads_only(df: DataFrame, expected: set[str]) -> bool:
    return set(read_schema_columns(df)) <= expected


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_formatted(df)


def wholestage_codegen_spans(df: DataFrame, finalize: bool = True) -> int:
    """Number of WholeStageCodegen spans (wider = fewer interpreter gaps).

    Formatted mode annotates nodes with ``[codegen id : N]``; distinct N
    counts the fused pipelines.  Under AQE the annotations only exist on
    the *final* adaptive plan, so ``finalize`` executes the frame first.
    """
    if finalize:
        # collect(), not count(): count() builds a *new* plan, leaving
        # this frame's adaptive plan unfinalized (no codegen annotations)
        df.collect()
    return len(set(re.findall(r"codegen id : (\d+)", explain_formatted(df))))
