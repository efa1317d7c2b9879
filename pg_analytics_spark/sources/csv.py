"""CSV source — reference option surface from src/duckdb/csv.rs:26-286.

The reference exposes 32 ``read_csv`` options; mapping to Spark's CSV
reader (options not natively expressible are emulated or warn+ignore):

| reference            | Spark                                            |
|----------------------|--------------------------------------------------|
| delim                | sep                                              |
| quote / escape       | quote / escape                                   |
| header               | header                                           |
| columns {name:type}  | explicit schema (DDL string)                     |
| names [..]           | rename after read                                |
| types/dtypes         | per-column cast after read                       |
| nullstr              | nullValue (first) — Spark takes a single token   |
| compression          | codec inferred from extension (Spark auto)       |
| dateformat           | dateFormat                                       |
| timestampformat      | timestampFormat                                  |
| sample_size          | samplingRatio (approximated) for inference       |
| skip                 | SINGLE file only: deterministic text pre-pass    |
|                      | (zipWithIndex line numbers) drops N physical     |
|                      | lines before the header; >1 file → raises        |
|                      | UnsupportedFormat (per-file line skipping is     |
|                      | not expressible across a multi-file scan)        |
| max_line_size        | maxCharsPerColumn (approx.: DuckDB bounds the    |
|                      | LINE, Spark bounds each COLUMN — both reject     |
|                      | runaway unquoted fields, the option's purpose)   |
| new_line             | lineSep                                          |
| ignore_errors        | mode=DROPMALFORMED                               |
| all_varchar          | inferSchema=false (all string)                   |
| auto_detect          | inferSchema                                      |
| auto_type_candidates | post-inference: columns whose inferred type is   |
|                      | outside the candidate set fall back to VARCHAR   |
|                      | (always a candidate in DuckDB, csv.rs:44-48)     |
| normalize_names      | lowercase + [^a-z0-9_]→_ rename                  |
| null_padding         | Spark pads missing trailing columns natively     |
| parallel             | accepted no-op (Spark reads are always           |
|                      | parallel); parallel=false warns — single-        |
|                      | threaded reads are not expressible               |
| decimal_separator    | locale-dependent — warn unless '.'               |
| allow_quoted_nulls   | emulated post-read (quoted empty → null off)     |
| force_not_null       | post-read coalesce('')                           |
| filename / hive_* /  | shared transforms (sources.base) / partition     |
| union_by_name        |   discovery / mergeSchema analog for CSV         |
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pg_analytics_spark.errors import fallback_warning
from pg_analytics_spark.sources.base import _truthy, apply_common


def _columns_to_ddl(columns: dict) -> str:
    """User-declared columns use DuckDB/Postgres type names (reference
    csv.rs `columns` option); translate through the D2 rewriter so e.g.
    bare `varchar`/`text`/`hugeint` parse."""
    from pg_analytics_spark.types import duckdb_type_to_spark

    return ", ".join(
        f"{name} {duckdb_type_to_spark(typ).simpleString()}"
        for name, typ in dict(columns).items()
    )

_DIRECT = {
    "delim": "sep",
    "sep": "sep",
    "quote": "quote",
    "escape": "escape",
    "dateformat": "dateFormat",
    "timestampformat": "timestampFormat",
    "new_line": "lineSep",
    "max_line_size": "maxCharsPerColumn",
    "comment": "comment",
    "encoding": "encoding",
}


def load(spark: SparkSession, files: list[str], opts: dict) -> DataFrame:
    reader_opts: dict[str, str] = {}
    for ref_key, spark_key in _DIRECT.items():
        if ref_key in opts:
            reader_opts[spark_key] = str(opts[ref_key])

    reader_opts["header"] = "true" if _truthy(opts.get("header", True)) else "false"

    nullstr = opts.get("nullstr")
    if nullstr:
        if isinstance(nullstr, (list, tuple)):
            if len(nullstr) > 1:
                fallback_warning("csv nullstr: Spark supports one token; using first")
            nullstr = nullstr[0]
        reader_opts["nullValue"] = str(nullstr)

    schema_ddl = None
    columns = opts.get("columns")
    if columns:
        schema_ddl = _columns_to_ddl(columns)
    elif _truthy(opts.get("all_varchar")):
        reader_opts["inferSchema"] = "false"
    elif _truthy(opts.get("auto_detect", True)):
        reader_opts["inferSchema"] = "true"
        if "sample_size" in opts:
            # DuckDB sample_size is rows; Spark samplingRatio is a fraction.
            # -1 means "all rows" in the reference (csv.rs:83-85).
            n = int(opts["sample_size"])
            reader_opts["samplingRatio"] = "1.0" if n < 0 else str(min(1.0, n / 20480))

    if _truthy(opts.get("ignore_errors")):
        reader_opts["mode"] = "DROPMALFORMED"

    if "parallel" in opts and not _truthy(opts.get("parallel", True)):
        fallback_warning(
            "csv parallel=false ignored: Spark reads are always parallel"
        )

    if opts.get("decimal_separator", ".") != ".":
        fallback_warning("csv decimal_separator other than '.' not supported; ignored")

    reader = spark.read.options(**reader_opts)
    skip_n = int(opts.get("skip", 0))
    if skip_n > 0:
        # DuckDB's skip=N drops N PHYSICAL lines before the header.
        # Spark 4 CSV has no skipRows, and DataFrame offset() is order-
        # nondeterministic across files/partitions — so: exactly one
        # file, read as text, exact line numbers via zipWithIndex
        # (contiguous indices in partition order = file-offset order for
        # a single file), drop the first N, parse the remainder.
        import glob as _g

        real: list[str] = []
        for pat in files:
            real.extend(sorted(_g.glob(pat)) or [pat])
        if len(real) != 1:
            from pg_analytics_spark.errors import UnsupportedFormat

            raise UnsupportedFormat(
                "csv skip=N supports exactly one input file (physical "
                f"line skipping is per-file); got {len(real)} files"
            )
        body = (
            spark.read.text(real[0])
            .rdd.zipWithIndex()
            .filter(lambda t: t[1] >= skip_n)
            .map(lambda t: t[0].value)
        )
        df = reader.csv(body, schema=schema_ddl)
    else:
        df = reader.csv(files, schema=schema_ddl)

    candidates = opts.get("auto_type_candidates")
    if candidates:
        # DuckDB restricts which types inference may PRODUCE (VARCHAR is
        # always allowed, csv.rs:44-48).  Spark's inference can't be
        # restricted, so emulate post-hoc: keep columns whose inferred
        # type is a candidate; widen integrals/fractionals to a same-
        # family candidate when one exists; otherwise fall back VARCHAR.
        from pg_analytics_spark.types import duckdb_type_to_spark

        allowed = {
            duckdb_type_to_spark(str(t)).simpleString() for t in candidates
        } | {"string"}
        _int_rank = ["tinyint", "smallint", "int", "bigint"]
        _frac_rank = ["float", "double"]

        def _widen(typ: str) -> str:
            for rank in (_int_rank, _frac_rank):
                if typ in rank:
                    for wider in rank[rank.index(typ):]:
                        if wider in allowed:
                            return wider
            return "string"

        for name, typ in df.dtypes:
            if typ not in allowed:
                df = df.withColumn(name, F.col(name).cast(_widen(typ)))

    names = opts.get("names")
    if names:
        for old, new in zip(df.columns, list(names)):
            df = df.withColumnRenamed(old, new)
    types = opts.get("types") or opts.get("dtypes")
    if types:
        if isinstance(types, dict):
            for name, typ in types.items():
                df = df.withColumn(name, F.col(name).cast(typ))
        else:  # positional list
            for name, typ in zip(df.columns, list(types)):
                df = df.withColumn(name, F.col(name).cast(typ))
    if _truthy(opts.get("normalize_names")):
        for old in df.columns:
            new = re.sub(r"[^0-9a-z_]", "_", old.strip().lower())
            if new != old:
                df = df.withColumnRenamed(old, new)
    force_not_null = opts.get("force_not_null")
    if force_not_null:
        for name in list(force_not_null):
            df = df.withColumn(name, F.coalesce(F.col(name), F.lit("")))
    return apply_common(df, opts)
