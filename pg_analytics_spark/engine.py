"""Engine — the single-session analytics entry point.

The reference's architecture is: register foreign tables as DuckDB
views at DDL time (src/fdw/trigger.rs:27-192), then push whole SELECTs
to the embedded engine (src/hooks/executor.rs:30-97) with utility
statements (EXPLAIN / PREPARE / CREATE VIEW) intercepted
(src/hooks/utility.rs:45-152).  Here all of that collapses into one
SparkSession:

    eng = Engine()
    eng.attach("trips", files="/data/*.parquet", format="parquet")
    eng.sql("SELECT COUNT(*) FROM trips").show()

which reproduces the reference's flagship demo (README.md:98-118).
"""

from __future__ import annotations

import re as _re
import time
from collections.abc import Iterable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from pg_analytics_spark import types as _types
from pg_analytics_spark.dialect import (
    expand_columns_macro,
    extract_table_functions,
    rewrite_pg,
)
from pg_analytics_spark.errors import EngineError
from pg_analytics_spark.session import get_spark
from pg_analytics_spark.sources import load_source, split_files
from pg_analytics_spark.sources.secrets import apply_secret


#: DuckDB `COPY (query) TO 'path' [(FORMAT fmt ...)]` — the COPY text a
#: reference user sends through duckdb_execute
_COPY_RE = _re.compile(
    r"^COPY\s*\((?P<q>.+)\)\s*TO\s*'(?P<path>[^']+)'"
    r"\s*(?:\(\s*FORMAT\s+(?P<fmt>\w+)[^)]*\))?\s*;?\s*$",
    _re.IGNORECASE | _re.DOTALL,
)

#: DuckDB `COPY tbl FROM 'file' (FORMAT csv, HEADER)` — the read half
#: of the COPY surface: load + append through the INSERT path (full
#: type coercion + null-introduction checks apply).
_COPY_FROM_RE = _re.compile(
    r"^COPY\s+(?P<name>[A-Za-z_]\w*)\s+FROM\s+'(?P<path>[^']+)'"
    r"\s*(?:\(\s*(?P<opts>[^)]*)\))?\s*;?\s*$",
    _re.IGNORECASE,
)

#: CTAS into the native lakehouse writers — Spark's catalog handles
#: `USING parquet` itself, but `USING delta|iceberg` would need the
#: runtime jars; this text form routes to Engine.materialize instead.
_CTAS_LAKE_RE = _re.compile(
    r"^CREATE\s+(?P<replace>OR\s+REPLACE\s+)?TABLE\s+(?P<name>[A-Za-z_][\w]*)\s+"
    r"USING\s+(?P<fmt>delta|iceberg)\s+"
    r"(?:PARTITIONED\s+BY\s*\(\s*(?P<parts>(?:[^()]|\([^()]*\))+)\)\s+)?"
    r"LOCATION\s+'(?P<path>[^']+)'\s+AS\s+(?P<q>.+?);?\s*$",
    _re.IGNORECASE | _re.DOTALL,
)


#: DuckDB `CREATE [OR REPLACE] SECRET [name] ( TYPE t, KEY 'v', … )`
#: statement text — the exact SQL the reference GENERATES from user
#: mappings (src/duckdb/secret.rs) — routed to Engine.add_secret.
#: The reference's OWN DDL surface (README.md:100-117,
#: tests/tests/fixtures/arrow.rs:295-320): CREATE EXTENSION / FOREIGN
#: DATA WRAPPER / SERVER / USER MAPPING / FOREIGN TABLE — accepted as
#: statement text so a reference user's setup script runs unchanged.
_CREATE_EXTENSION_RE = _re.compile(
    r"^CREATE\s+EXTENSION\s+(?:IF\s+NOT\s+EXISTS\s+)?"
    r"(?P<name>[A-Za-z_]\w*)\s*(?:CASCADE\s*)?;?\s*$",
    _re.IGNORECASE,
)

_CREATE_FDW_RE = _re.compile(
    r"^CREATE\s+FOREIGN\s+DATA\s+WRAPPER\s+(?P<w>[A-Za-z_]\w*)"
    r"(?:\s+HANDLER\s+[\w.]+)?(?:\s+VALIDATOR\s+[\w.]+)?\s*;?\s*$",
    _re.IGNORECASE,
)

_CREATE_SERVER_RE = _re.compile(
    r"^CREATE\s+SERVER\s+(?:IF\s+NOT\s+EXISTS\s+)?(?P<s>[A-Za-z_]\w*)\s+"
    r"FOREIGN\s+DATA\s+WRAPPER\s+(?P<w>[A-Za-z_]\w*)"
    r"(?:\s+OPTIONS\s*\((?P<opts>.*)\))?\s*;?\s*$",
    _re.IGNORECASE | _re.DOTALL,
)

_CREATE_USER_MAPPING_RE = _re.compile(
    r"^CREATE\s+USER\s+MAPPING\s+(?:IF\s+NOT\s+EXISTS\s+)?FOR\s+\S+\s+"
    r"SERVER\s+(?P<s>[A-Za-z_]\w*)"
    r"(?:\s+OPTIONS\s*\((?P<opts>.*)\))?\s*;?\s*$",
    _re.IGNORECASE | _re.DOTALL,
)

_CREATE_FOREIGN_TABLE_RE = _re.compile(
    r"^CREATE\s+FOREIGN\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?"
    r'(?P<name>"[^"]+"|[\w.]+)\s*\((?P<cols>.*?)\)\s*'
    r"SERVER\s+(?P<srv>[A-Za-z_]\w*)"
    r"(?:\s+OPTIONS\s*\((?P<opts>.*)\))?\s*;?\s*$",
    _re.IGNORECASE | _re.DOTALL,
)

_DROP_FOREIGN_TABLE_RE = _re.compile(
    r"^DROP\s+FOREIGN\s+TABLE\s+(?:IF\s+EXISTS\s+)?"
    r'(?P<name>"[^"]+"|[\w.]+)\s*(?:CASCADE\s*)?;?\s*$',
    _re.IGNORECASE,
)

_SECRET_RE = _re.compile(
    r"^CREATE\s+(?:OR\s+REPLACE\s+)?(?:PERSISTENT\s+|TEMPORARY\s+)?"
    r"SECRET(?:\s+(?P<name>[A-Za-z_]\w*))?\s*\((?P<body>.+)\)\s*;?\s*$",
    _re.IGNORECASE | _re.DOTALL,
)

#: DuckDB `CREATE [OR REPLACE] MACRO name(a, b) AS expr` (scalar) and
#: `AS TABLE query` (table) — stored SQL-template expansions.
_MACRO_RE = _re.compile(
    r"^CREATE\s+(?:OR\s+REPLACE\s+)?(?:TEMP(?:ORARY)?\s+)?MACRO\s+"
    r"(?P<name>[A-Za-z_]\w*)\s*\((?P<params>[^)]*)\)\s*AS\s+"
    r"(?P<table>TABLE\s+)?(?P<body>.+?);?\s*$",
    _re.IGNORECASE | _re.DOTALL,
)

#: `CREATE [OR REPLACE] TEMP TABLE t AS <query>` — DuckDB's session-
#: scoped materialized table: the SELECT snapshots NOW (localCheckpoint
#: — later changes to inputs don't leak in) and registers as a view.
_CREATE_TEMP_TABLE_RE = _re.compile(
    r"^CREATE\s+(?P<replace>OR\s+REPLACE\s+)?TEMP(?:ORARY)?\s+TABLE\s+"
    r"(?P<name>[A-Za-z_]\w*)\s+AS\s+(?P<q>.+?);?\s*$",
    _re.IGNORECASE | _re.DOTALL,
)

_DROP_TABLE_RE = _re.compile(
    r"^DROP\s+TABLE\s+(?P<ifex>IF\s+EXISTS\s+)?(?P<name>[A-Za-z_]\w*)\s*;?\s*$",
    _re.IGNORECASE,
)

_DROP_MACRO_RE = _re.compile(
    r"^DROP\s+MACRO\s+(?P<ifex>IF\s+EXISTS\s+)?(?P<name>[A-Za-z_]\w*)\s*;?\s*$",
    _re.IGNORECASE,
)

#: `INSERT INTO <attached delta/iceberg table> SELECT …` — appends
#: through the native protocol writers (Spark's own INSERT would need
#: the runtime jars for these formats).
_INSERT_LAKE_RE = _re.compile(
    r"^INSERT\s+INTO\s+(?P<name>[A-Za-z_]\w*)\s*"
    r"(?:\(\s*(?P<cols>[A-Za-z_][\w\s,]*)\)\s*)?"
    r"(?:(?P<byname>BY\s+NAME)\s+)?"
    r"(?P<q>(?:SELECT|WITH|FROM|VALUES)\b.+?);?\s*$",
    _re.IGNORECASE | _re.DOTALL,
)

#: `MERGE INTO <attached delta table> …` — copy-on-write upsert
#: through the native protocol writer (sources/delta_write.merge_delta).
#: `INSERT INTO t … ON CONFLICT (keys) DO NOTHING|DO UPDATE SET …` plus
#: the `INSERT OR REPLACE|IGNORE` shorthands — upsert statements routed
#: onto the native MERGE writer (attached delta tables), loud otherwise.
_INSERT_CONFLICT_RE = _re.compile(
    r"^INSERT\s+(?:OR\s+(?P<orq>REPLACE|IGNORE)\s+)?INTO\s+"
    r"(?P<name>[A-Za-z_]\w*)\s*"
    r"(?:\(\s*(?P<cols>[A-Za-z_][\w\s,]*)\)\s*)?"
    r"(?:(?P<byname>BY\s+NAME)\s+)?"
    r"(?P<q>(?:SELECT|WITH|FROM|VALUES)\b.+?)"
    r"(?:\s+ON\s+CONFLICT\s*"
    r"(?:\(\s*(?P<ckeys>[A-Za-z_][\w\s,]*)\)\s*)?"
    r"DO\s+(?:(?P<nothing>NOTHING)|UPDATE\s+SET\s+(?P<setlist>.+?)))?"
    r";?\s*$",
    _re.IGNORECASE | _re.DOTALL,
)


_MERGE_LAKE_RE = _re.compile(
    r"^MERGE\s+INTO\s+(?P<name>[A-Za-z_]\w*)"
    r"(?:\s+AS)?(?:\s+(?P<talias>(?!USING\b)[A-Za-z_]\w*))?\s+"
    r"USING\s+(?P<rest>.+)$",
    _re.IGNORECASE | _re.DOTALL,
)

#: `UPDATE <tbl> SET …` / `DELETE FROM <tbl> …` — routed to the native
#: Delta copy-on-write writer for attached delta tables, loud
#: UnsupportedDialect otherwise (the reference FDW is read-only; its
#: README roadmap lists UPDATE as unimplemented — additive scope).
_UPDATE_STMT_RE = _re.compile(
    r"^UPDATE\s+(?P<name>[A-Za-z_][\w.]*)\s+SET\s+(?P<rest>.+?);?\s*$",
    _re.IGNORECASE | _re.DOTALL,
)
_DELETE_STMT_RE = _re.compile(
    r"^DELETE\s+FROM\s+(?P<name>[A-Za-z_][\w.]*)"
    r"(?:\s+WHERE\s+(?P<where>.+?))?;?\s*$",
    _re.IGNORECASE | _re.DOTALL,
)
#: `VACUUM <attached delta table> [RETAIN n HOURS]` — Delta's physical
#: cleanup of unreferenced data files through the native writer.
_VACUUM_STMT_RE = _re.compile(
    r"^VACUUM\s+(?P<name>[A-Za-z_][\w.]*)"
    r"(?:\s+RETAIN\s+(?P<hours>\d+(?:\.\d+)?)\s+HOURS?)?;?\s*$",
    _re.IGNORECASE,
)

#: `SHOW TBLPROPERTIES <attached lake table>` — the property map as
#: (key, value) rows, from Delta configuration / Iceberg properties.
_SHOW_PROPS_RE = _re.compile(
    r"^SHOW\s+TBLPROPERTIES\s+(?P<name>[A-Za-z_][\w.]*);?\s*$",
    _re.IGNORECASE,
)

_DESCRIBE_RE = _re.compile(
    r"^DESC(?:RIBE)?\s+(?!EXTENDED\b|FORMATTED\b|HISTORY\b|QUERY\b"
    r"|FUNCTION\b|DATABASE\b|NAMESPACE\b|SCHEMA\b|CATALOG\b)"
    r"(?:TABLE\s+)?(?P<body>.+?);?\s*$",
    _re.IGNORECASE | _re.DOTALL,
)

_DESCRIBE_HISTORY_RE = _re.compile(
    r"^DESC(?:RIBE)?\s+HISTORY\s+(?P<name>[A-Za-z_][\w.]*);?\s*$",
    _re.IGNORECASE,
)

_DESCRIBE_DETAIL_RE = _re.compile(
    r"^DESC(?:RIBE)?\s+DETAIL\s+(?P<name>[A-Za-z_][\w.]*);?\s*$",
    _re.IGNORECASE,
)

_CONVERT_DELTA_RE = _re.compile(
    r"^CONVERT\s+TO\s+DELTA\s+(?:parquet\.)?[`']?(?P<path>[^`';)]+)[`']?"
    r"(?:\s+PARTITIONED\s+BY\s*\((?P<parts>[^)]*)\))?;?\s*$",
    _re.IGNORECASE,
)

_CALL_PROC_RE = _re.compile(
    r"^CALL\s+(?:[A-Za-z_][\w]*\.)?(?:system\.)?"
    r"(?P<proc>rewrite_manifests|remove_orphan_files|expire_snapshots)"
    r"\s*\(\s*'(?P<name>[^']+)'\s*(?:,\s*(?P<arg>\d+)\s*)?\);?\s*$",
    _re.IGNORECASE,
)

_SHALLOW_CLONE_RE = _re.compile(
    r"^CREATE\s+TABLE\s+(?P<target>[A-Za-z_][\w.]*)\s+SHALLOW\s+CLONE\s+"
    r"(?P<source>[A-Za-z_][\w.]*)"
    r"(?:\s+VERSION\s+AS\s+OF\s+(?P<version>\d+))?"
    r"\s+LOCATION\s+'(?P<location>[^']+)';?\s*$",
    _re.IGNORECASE,
)

_RESTORE_STMT_RE = _re.compile(
    r"^RESTORE\s+(?:TABLE\s+)?(?P<name>[A-Za-z_][\w.]*)\s+TO\s+VERSION\s+"
    r"AS\s+OF\s+(?P<version>\d+);?\s*$",
    _re.IGNORECASE,
)

_OPTIMIZE_STMT_RE = _re.compile(
    r"^OPTIMIZE\s+(?P<name>[A-Za-z_][\w.]*)"
    r"(?:\s+ZORDER\s+BY\s*\(?\s*(?P<cols>[\w\s,]+?)\s*\)?)?;?\s*$",
    _re.IGNORECASE,
)

#: `ANALYZE <attached iceberg table> [(c1, c2, …)]` — the runtime's
#: compute_table_stats: per-column KMV distinct sketches into a
#: Puffin statistics file + the metadata `statistics` entry.
_ANALYZE_STMT_RE = _re.compile(
    r"^ANALYZE\s+(?P<name>[A-Za-z_][\w.]*)"
    r"(?:\s*\(\s*(?P<cols>[\w\s,]+?)\s*\))?;?\s*$",
    _re.IGNORECASE,
)

#: `ALTER TABLE <attached lake table> SET TBLPROPERTIES ('k'='v', …)`
#: / `UNSET TBLPROPERTIES ('k', …)` — table-property updates through
#: the native writers (metadata-only commits on both formats).
_ALTER_PROPS_RE = _re.compile(
    r"^ALTER\s+TABLE\s+(?P<name>[A-Za-z_][\w.]*)\s+"
    r"(?P<verb>SET|UNSET)\s+TBLPROPERTIES\s*\((?P<body>[^)]*)\)\s*;?\s*$",
    _re.IGNORECASE,
)

#: `ALTER TABLE <attached delta table> ADD CONSTRAINT n CHECK (expr) |
#: DROP CONSTRAINT n` — CHECK constraints through the native writer
#: (protocol writer feature, enforced on every write path).
_ALTER_CONSTRAINT_RE = _re.compile(
    r"^ALTER\s+TABLE\s+(?P<name>[A-Za-z_][\w.]*)\s+(?:"
    r"ADD\s+CONSTRAINT\s+(?P<add_name>[A-Za-z_]\w*)\s+"
    r"CHECK\s*\((?P<expr>.+)\)"
    r"|DROP\s+CONSTRAINT\s+(?P<drop_name>[A-Za-z_]\w*)"
    r")\s*;?\s*$",
    _re.IGNORECASE | _re.DOTALL,
)

#: `ALTER TABLE <attached iceberg table> CREATE TAG/BRANCH name
#: [AS OF VERSION <snapshot_id>] | DROP TAG/BRANCH name` — snapshot
#: refs (v2 `refs` map) through the native writer.
_ALTER_REF_RE = _re.compile(
    r"^ALTER\s+TABLE\s+(?P<name>[A-Za-z_][\w.]*)\s+(?:"
    r"CREATE\s+(?P<ctype>TAG|BRANCH)\s+(?P<cname>[A-Za-z_]\w*)"
    r"(?:\s+AS\s+OF\s+VERSION\s+(?P<sid>\d+))?"
    r"|DROP\s+(?:TAG|BRANCH)\s+(?P<dname>[A-Za-z_]\w*)"
    r")\s*;?\s*$",
    _re.IGNORECASE,
)

#: `ALTER TABLE <attached iceberg table> REPLACE PARTITION BY
#: (transform, …)` — partition evolution: a pure-metadata default-spec
#: flip (sources/iceberg_write.alter_iceberg_partition).
_ALTER_PART_RE = _re.compile(
    r"^ALTER\s+TABLE\s+(?P<name>[A-Za-z_][\w.]*)\s+REPLACE\s+"
    r"PARTITION\s+BY\s*\((?P<body>[^;]*)\)\s*;?\s*$",
    _re.IGNORECASE,
)

#: `ALTER TABLE <attached lake table> ADD COLUMN c type | RENAME
#: COLUMN a TO b | DROP COLUMN c` — schema evolution through the
#: native writers (metadata-only commits on both formats).
_ALTER_STMT_RE = _re.compile(
    r"^ALTER\s+TABLE\s+(?P<name>[A-Za-z_][\w.]*)\s+(?:"
    r"ADD\s+COLUMN\s+(?P<add_col>[A-Za-z_]\w*)\s+(?P<add_type>[^;]+?)"
    r"|RENAME\s+COLUMN\s+(?P<ren_old>[A-Za-z_]\w*)\s+TO\s+"
    r"(?P<ren_new>[A-Za-z_]\w*)"
    r"|DROP\s+COLUMN\s+(?P<drop_col>[A-Za-z_]\w*)"
    r");?\s*$",
    _re.IGNORECASE,
)

#: DuckDB `PRAGMA name[('arg')]` statement text — table_info/version/
#: database_list supported, everything else rejected with guidance.
_PRAGMA_RE = _re.compile(
    r"^PRAGMA\s+(?P<name>\w+)"
    r"(?:\s*\(\s*'(?P<arg>[^']*)'\s*\))?;?\s*$",
    _re.IGNORECASE,
)

#: DuckDB `SUMMARIZE tbl` / `SUMMARIZE SELECT …` statement text —
#: routes to Engine.summarize (one-job per-column profile).
_SUMMARIZE_RE = _re.compile(
    r"^SUMMARIZE\s+(?P<q>.+?);?\s*$", _re.IGNORECASE | _re.DOTALL
)

#: DuckDB `PIVOT tbl ON col USING agg(x) [AS a][, …] [GROUP BY …]
#: [ORDER BY …]` statement text — DuckDB discovers the pivot values
#: dynamically; Spark's PIVOT clause needs them as literals, so the
#: handler runs one tiny DISTINCT job first (see Engine.sql).
_PIVOT_RE = _re.compile(
    r"^PIVOT\s+(?P<src>[A-Za-z_]\w*)\s+ON\s+(?P<on>[A-Za-z_]\w*)\s+"
    r"USING\s+(?P<aggs>.+?)"
    r"(?:\s+GROUP\s+BY\s+(?P<grp>.+?))?"
    r"(?:\s+ORDER\s+BY\s+(?P<ord>.+?))?\s*;?\s*$",
    _re.IGNORECASE | _re.DOTALL,
)

#: DuckDB `UNPIVOT tbl ON c1, c2, … INTO NAME n VALUE v` statement —
#: static rewrite to Spark's UNPIVOT clause (same row/column output).
_UNPIVOT_RE = _re.compile(
    r"^UNPIVOT\s+(?P<src>[A-Za-z_]\w*)\s+ON\s+(?P<cols>[\w\s,]+?)\s+"
    r"INTO\s+NAME\s+(?P<name>[A-Za-z_]\w*)\s+VALUE\s+(?P<val>[A-Za-z_]\w*)"
    r"(?:\s+ORDER\s+BY\s+(?P<ord>.+?))?\s*;?\s*$",
    _re.IGNORECASE | _re.DOTALL,
)


@dataclass
class _Attachment:
    name: str
    files: list[str]
    format: str
    options: dict
    columns: dict | None


@dataclass
class _Prepared:
    """A prepared statement: cached SQL + the database it was planned in.

    The reference re-plans a prepared statement when search_path changes
    (src/hooks/utility/prepare.rs:40-46, 70-79); we re-resolve when the
    current catalog database changed.
    """

    sql: str
    database: str
    df: DataFrame = field(repr=False, default=None)
    #: LATERAL-rewrite alternative for ASOF statements — the same
    #: analysis-failure fallback Engine.sql applies (flat column
    #: namespace when the union+window struct routing cannot resolve)
    alt_sql: str | None = None


class Engine:
    """PySpark-native analytics engine with the pg_analytics surface."""

    def __init__(self, spark: SparkSession | None = None, **session_kwargs):
        self.spark = spark or get_spark(**session_kwargs)
        self._attachments: dict[str, _Attachment] = {}
        self._prepared: dict[str, _Prepared] = {}
        self._macros: dict[str, tuple[list[str], str, bool]] = {}
        self._temp_tables: dict[str, DataFrame] = {}
        #: FDW DDL state: wrapper → format, server → (format, options)
        self._wrappers: dict[str, str] = {}
        self._servers: dict[str, tuple[str, dict]] = {}
        self._fs_view_seq = 0  # monotonic glob()-view ids

    # ------------------------------------------------------------------ #
    # Source registration (CREATE FOREIGN TABLE analog)
    # ------------------------------------------------------------------ #

    def attach(
        self,
        name: str,
        files: str | list[str],
        format: str = "parquet",
        options: dict | None = None,
        columns: dict | None = None,
    ) -> DataFrame:
        """Register external files as a queryable table (idempotent).

        Mirrors CREATE FOREIGN TABLE → DuckDB view registration
        (reference src/fdw/base.rs:216-260) including idempotent
        re-attach (view_exists check, src/duckdb/connection.rs:238-247;
        stale-view drop, src/fdw/trigger.rs:139-143):
        ``createOrReplaceTempView`` is naturally last-writer-wins.

        ``columns`` declares types as in CREATE FOREIGN TABLE's column
        list; omitted → auto schema inference, the event-trigger path
        (src/fdw/trigger.rs:27-192).  Declared types apply the
        permissive numeric-cast matrix (src/schema/cell.rs:754-757).
        """
        df = load_source(self.spark, files, format, options)
        if columns:
            df = _types.normalize_columns(df, columns)
        df.createOrReplaceTempView(name)
        self._attachments[name] = _Attachment(
            name, split_files(files), format, dict(options or {}), columns
        )
        return df

    def detach(self, name: str) -> None:
        self.spark.catalog.dropTempView(name)
        self._attachments.pop(name, None)

    def attach_dir(self, sf_dir: str, tables: Iterable[str] | None = None) -> None:
        """Attach every ``<table>.parquet`` under a directory."""
        import glob
        import os

        if tables is None:
            tables = [
                os.path.splitext(os.path.basename(p))[0]
                for p in sorted(glob.glob(os.path.join(sf_dir, "*.parquet")))
            ]
        for t in tables:
            self.attach(t, os.path.join(sf_dir, f"{t}.parquet"))

    # ------------------------------------------------------------------ #
    # Query execution (executor-hook analog — but there is one engine)
    # ------------------------------------------------------------------ #

    def sql(self, query: str, args: dict | None = None) -> DataFrame:
        """Execute SQL.  Named parameters via ``:name`` (Spark 4 native),
        the analog of the reference's ``$1`` parameterized queries
        (tests/tests/scan.rs:579-592).

        Accepts the reference's Postgres dialect: ``::json``/``::jsonb``
        casts and ``->``/``->>`` chains (tests/tests/json.rs:294-312)
        are rewritten to Spark SQL by :mod:`pg_analytics_spark.dialect`
        before execution; plain Spark SQL passes through untouched.

        DuckDB table functions work inline — ``FROM read_parquet('…')``
        / ``read_csv`` / ``delta_scan`` / ``iceberg_scan`` / ``st_read``
        and bare ``FROM 'file.parquet'`` targets (the SQL the reference
        generates for its views, src/duckdb/*.rs create_view) are
        registered through the source layer as temp views on the fly,
        so their full option surface (hive partitioning, DV/column
        mapping, time travel, …) applies.
        """
        m = _MACRO_RE.match(query.strip())
        if m:
            return self._create_macro_statement(m)
        m = _DROP_MACRO_RE.match(query.strip())
        if m:
            name = m.group("name").lower()
            if name not in self._macros and not m.group("ifex"):
                raise EngineError(f"macro {name!r} does not exist")
            self._macros.pop(name, None)
            return self.spark.createDataFrame([(name,)], "dropped string")
        if self._macros:
            query = self._expand_macros(query)
        q_strip = query.strip()
        if _re.match(r"^CREATE\s+(EXTENSION|FOREIGN|SERVER|USER)\b",
                     q_strip, _re.IGNORECASE) or _re.match(
                     r"^DROP\s+FOREIGN\b", q_strip, _re.IGNORECASE):
            out = self._fdw_ddl_statement(q_strip)
            if out is not None:
                return out
        m = _CREATE_TEMP_TABLE_RE.match(query.strip())
        if m:
            return self._create_temp_table_statement(m)
        m = _DROP_TABLE_RE.match(query.strip())
        if m and (
            m.group("name").lower() in self._temp_tables
            or m.group("name") in self._attachments
        ):
            return self._drop_table_statement(m)
        m = _SECRET_RE.match(query.strip())
        if m:
            return self._create_secret_statement(m)
        m = _INSERT_CONFLICT_RE.match(query.strip())
        if m and (
            m.group("orq") or m.group("nothing") or m.group("setlist")
        ):
            return self._insert_conflict_statement(m)
        m = _INSERT_LAKE_RE.match(query.strip())
        if m and self._attachments.get(m.group("name")) is not None and (
            self._attachments[m.group("name")].format in ("delta", "iceberg")
        ):
            return self._insert_lake_statement(m)
        m = _MERGE_LAKE_RE.match(query.strip())
        if m and self._attachments.get(m.group("name")) is not None and (
            self._attachments[m.group("name")].format in ("delta", "iceberg")
        ):
            return self._merge_lake_statement(m)
        m = _UPDATE_STMT_RE.match(query.strip())
        if m:
            return self._update_lake_statement(m)
        m = _DELETE_STMT_RE.match(query.strip())
        if m:
            return self._delete_lake_statement(m)
        m = _VACUUM_STMT_RE.match(query.strip())
        if m:
            return self._vacuum_statement(m)
        m = _DESCRIBE_HISTORY_RE.match(query.strip())
        if m:
            return self._describe_history_statement(m)
        m = _DESCRIBE_DETAIL_RE.match(query.strip())
        if m:
            return self._describe_detail_statement(m)
        m = _SHALLOW_CLONE_RE.match(query.strip())
        if m:
            return self._shallow_clone_statement(m)
        m = _CALL_PROC_RE.match(query.strip())
        if m:
            return self._call_procedure_statement(m)
        m = _CONVERT_DELTA_RE.match(query.strip())
        if m:
            return self._convert_delta_statement(m)
        m = _DESCRIBE_RE.match(query.strip())
        if m:
            return self._describe_statement(m)
        m = _RESTORE_STMT_RE.match(query.strip())
        if m:
            return self._restore_statement(m)
        m = _OPTIMIZE_STMT_RE.match(query.strip())
        if m:
            return self._optimize_statement(m)
        m = _ANALYZE_STMT_RE.match(query.strip())
        if m and self._attachments.get(m.group("name")) is not None and (
            self._attachments[m.group("name")].format == "iceberg"
        ):
            return self._analyze_statement(m)
        m = _SHOW_PROPS_RE.match(query.strip())
        if m:
            return self._show_props_statement(m)
        m = _ALTER_PROPS_RE.match(query.strip())
        if m:
            return self._alter_props_statement(m)
        m = _ALTER_CONSTRAINT_RE.match(query.strip())
        if m:
            return self._alter_constraint_statement(m)
        m = _ALTER_REF_RE.match(query.strip())
        if m:
            return self._alter_ref_statement(m)
        m = _ALTER_PART_RE.match(query.strip())
        if m:
            return self._alter_partition_statement(m)
        m = _ALTER_STMT_RE.match(query.strip())
        if m:
            return self._alter_statement(m)
        m = _PRAGMA_RE.match(query.strip())
        if m:
            return self._pragma_statement(m)
        ubn = self._try_union_by_name(query)
        if ubn is not None:
            return ubn
        query = self._expand_time_travel(query)
        query = self._expand_fs_table_functions(query)
        if _re.match(r"^(UPDATE|DELETE)\b", query.strip(), _re.IGNORECASE):
            # loud-or-green: a DML form the routers above don't parse
            # (DELETE … USING, UPDATE … FROM) must not surface Spark's
            # raw TABLE_OPERATION error
            from pg_analytics_spark.dialect import UnsupportedDialect

            raise UnsupportedDialect(
                "UPDATE/DELETE: only `UPDATE <tbl> SET col = expr[, …] "
                "[WHERE cond]` and `DELETE FROM <tbl> [WHERE cond]` "
                "statement forms are supported (on attached delta "
                "tables); rewrite USING/FROM joins as subqueries in "
                "the WHERE clause"
            )
        m = _SUMMARIZE_RE.match(query.strip())
        if m:
            # DuckDB `SUMMARIZE …` statement text, verbatim
            return self.summarize(m.group("q"))
        m = _PIVOT_RE.match(query.strip())
        if m:
            return self._pivot_statement(m)
        m = _UNPIVOT_RE.match(query.strip())
        if m:
            # DuckDB UNPIVOT statement → Spark's UNPIVOT clause.  Both
            # exclude NULL values by default; column order matches
            # (other cols, name, value).
            q = (
                f"SELECT * FROM {m.group('src')} "
                f"UNPIVOT ({m.group('val')} FOR {m.group('name')} "
                f"IN ({m.group('cols')}))"
            )
            if m.group("ord"):
                q += f" ORDER BY {m.group('ord')}"
            return self.spark.sql(rewrite_pg(q))
        m = _COPY_FROM_RE.match(query.strip())
        if m and "(" not in m.group("name"):
            return self._copy_from_statement(m)
        m = _COPY_RE.match(query.strip())
        if m:
            # DuckDB `COPY (query) TO 'path' (FORMAT x)` text, verbatim
            fmt = (m.group("fmt") or "").lower()
            if not fmt:
                p = m.group("path").lower()
                fmt = "csv" if p.endswith(".csv") else (
                    "json" if p.endswith((".json", ".ndjson")) else "parquet"
                )
            n = self.copy_to(m.group("q"), m.group("path"), format=fmt)
            return self.spark.createDataFrame([(n,)], "count bigint")
        m = _CTAS_LAKE_RE.match(query.strip())
        if m:
            # CREATE TABLE … USING delta|iceberg LOCATION '…' AS SELECT …
            # → the native protocol writers (the catalog would demand
            # the runtime jars); the table attaches under its name.
            # Plain CREATE on an existing target fails loudly — only
            # OR REPLACE authorizes a logical overwrite (SQL semantics).
            import os as _os

            fmt = m.group("fmt").lower()
            target = m.group("path")
            marker = _os.path.join(
                target, "_delta_log" if fmt == "delta" else "metadata"
            )
            if not m.group("replace") and _os.path.isdir(marker):
                raise EngineError(
                    f"table location {target!r} already holds a {fmt} "
                    "table; use CREATE OR REPLACE TABLE to overwrite"
                )
            parts = m.group("parts")
            # depth-aware split: transform specs carry their own
            # commas — PARTITIONED BY (month(d), bucket(4, k))
            part_list = None
            if parts:
                part_list, cur, depth = [], "", 0
                for ch in parts:
                    if ch == "(":
                        depth += 1
                    elif ch == ")":
                        depth -= 1
                    if ch == "," and depth == 0:
                        part_list.append(cur.strip())
                        cur = ""
                    else:
                        cur += ch
                part_list.append(cur.strip())
                part_list = [p for p in part_list if p]
            return self.materialize(
                m.group("name"),
                m.group("q"),
                path=target,
                format=fmt,
                partition_by=part_list,
            )
        try:
            return self._sql_rewritten(rewrite_pg(query), args)
        except Exception as exc:
            # ASOF union+window routing exposes each side as a struct
            # namespace; an outer query that references columns
            # UNQUALIFIED fails analysis there — retry on the
            # correlated-LATERAL compatibility rewrite, which exposes
            # flat columns (DuckDB-equivalent resolution).
            from pyspark.errors import AnalysisException, ParseException

            if isinstance(exc, AnalysisException) and _re.search(
                r"\basof\s+(left\s+)?join\b", query, _re.IGNORECASE
            ):
                return self._sql_rewritten(
                    rewrite_pg(query, asof_union=False), args
                )
            # DuckDB trailing-comma tolerance before a clause keyword
            # (`SELECT a, FROM t`): ambiguous on the first pass —
            # `window` etc. are valid non-reserved column names — so
            # the comma is removed ONLY after the statement failed to
            # parse as written (r7 ADVICE: no valid reading existed).
            comma_error = isinstance(exc, ParseException) or (
                # Spark's dedicated SELECT-list trailing-comma error —
                # unambiguous, unlike a generic AnalysisException
                isinstance(exc, AnalysisException)
                and "TRAILING_COMMA" in str(exc)
            )
            if comma_error and _re.search(
                r",\s*(from|where|group|order|having|limit|offset"
                r"|union|except|intersect|qualify|window)\b",
                query,
                _re.IGNORECASE,
            ):
                return self._sql_rewritten(
                    rewrite_pg(query, keyword_commas=True), args
                )
            raise

    def _sql_rewritten(self, query: str, args):
        query, tf_views = extract_table_functions(query)
        for name, files, fmt, opts in tf_views:
            load_source(self.spark, files, fmt, opts).createOrReplaceTempView(
                name
            )
        query = expand_columns_macro(
            query, lambda t: self.spark.table(t).columns
        )
        if args:
            return self.spark.sql(query, args=args)
        return self.spark.sql(query)

    def execute_raw(self, statement: str):
        """Escape hatch, analog of ``duckdb_execute`` (src/api/duckdb.rs:26-29)."""
        return self.spark.sql(statement)

    @staticmethod
    def _pivot_agg_columns(aggs: str, src: str, on: str) -> tuple[str, list]:
        """(rewritten aggs, operand columns) for the PIVOT handler.

        * strips ONLY the source-table qualifier (``src.col`` → ``col``
          — the qualifier dies with the generated subquery); struct
          field access (``info.price`` where ``info`` is a column)
          keeps its dots and contributes its ROOT as the operand;
        * operand columns = identifiers feeding the aggregates, minus
          function names, aliases, and pg-cast type names.
        """
        from pg_analytics_spark.dialect import _KEYWORDS, _tokenize

        toks = _tokenize(aggs)

        def _nxt(i):
            j = i + 1
            while j < len(toks) and toks[j][0] in ("ws", "comment"):
                j += 1
            return toks[j] if j < len(toks) else (None, None)

        def _prv(i):
            j = i - 1
            while j >= 0 and toks[j][0] in ("ws", "comment"):
                j -= 1
            return toks[j] if j >= 0 else (None, None), j

        operands: list[str] = []
        for i, (kind, text) in enumerate(toks):
            if kind != "word" or text.lower() in _KEYWORDS:
                continue
            nk, nt = _nxt(i)
            (pk, pt), pj = _prv(i)
            if nt == "(":
                continue  # function name
            if pt and pk == "word" and pt.lower() == "as":
                continue  # alias
            if pk == "cast":
                continue  # pg-cast type name
            if nt == ".":
                # qualified path root: the table qualifier is NOT an
                # operand; a struct column IS
                if text.lower() != src.lower() and text not in operands:
                    operands.append(text)
                continue
            if pt == ".":
                # word after a dot: only the table-qualified form
                # projects by its bare name (struct fields ride their
                # root)
                (_qk, qt), _ = _prv(pj)
                if (
                    qt
                    and qt.lower() == src.lower()
                    and text not in operands
                    and text != on
                ):
                    operands.append(text)
                continue
            if text not in operands and text != on:
                operands.append(text)
        # strip ONLY `src.` qualifiers from the aggs text
        out_t = []
        i2 = 0
        while i2 < len(toks):
            kind, text = toks[i2]
            j2 = i2 + 1
            while j2 < len(toks) and toks[j2][0] in ("ws", "comment"):
                j2 += 1
            if (
                kind == "word"
                and text.lower() == src.lower()
                and j2 < len(toks)
                and toks[j2] == ("op", ".")
            ):
                i2 = j2 + 1  # drop `src` and its dot
                continue
            out_t.append(toks[i2])
            i2 += 1
        return "".join(t for _, t in out_t), operands

    def _pivot_statement(self, m) -> DataFrame:
        """DuckDB ``PIVOT src ON col USING aggs [GROUP BY …] [ORDER BY
        …]`` → Spark's PIVOT clause.  DuckDB discovers the pivot
        columns from the data; Spark wants literals, so one tiny
        DISTINCT job collects them first (sorted — DuckDB's column
        order) and NULL values are excluded (DuckDB's behavior).
        Multi-agg aliases produce the same ``{value}_{alias}`` column
        names in both engines.
        """
        from pg_analytics_spark.dialect import _KEYWORDS, _tokenize

        src, on, aggs = m.group("src"), m.group("on"), m.group("aggs").strip()
        grp, order = m.group("grp"), m.group("ord")
        vals = [
            r[0]
            for r in self.spark.sql(
                f"SELECT DISTINCT {on} FROM {src} "
                f"WHERE {on} IS NOT NULL ORDER BY {on}"
            ).collect()
        ]
        if not vals:
            raise EngineError(f"PIVOT: no non-null values in {src}.{on}")

        def _lit(v) -> str:
            # typed SQL literals: a bare str(date) would parse as
            # integer arithmetic (2024-01-05 == 2018)
            import datetime as _dt

            if isinstance(v, bool):
                return "TRUE" if v else "FALSE"
            if isinstance(v, str):
                return "'" + v.replace("'", "''") + "'"
            if isinstance(v, _dt.datetime):
                return f"TIMESTAMP '{v.isoformat(sep=' ')}'"
            if isinstance(v, _dt.date):
                return f"DATE '{v.isoformat()}'"
            return str(v)

        lits = ", ".join(_lit(v) for v in vals)
        if grp:
            # project to GROUP BY cols + pivot col + agg operands so
            # Spark's implicit group-by (all non-pivot columns) matches
            # the statement's explicit one
            aggs, operands = self._pivot_agg_columns(aggs, src, on)
            grp_cols = [g.strip() for g in grp.split(",")]
            proj_cols = list(grp_cols)
            for c in [on] + operands:
                if c == on and c in grp_cols:
                    continue
                if c in grp_cols:
                    # a GROUP BY column also feeds an aggregate: Spark's
                    # PIVOT consumes agg operands, so give the agg its
                    # own aliased copy and keep the original grouping
                    alias = f"__pv_{c}"
                    proj_cols.append(f"{c} AS {alias}")
                    aggs = "".join(
                        alias if k == "word" and t == c else t
                        for k, t in _tokenize(aggs)
                    )
                elif c not in proj_cols:
                    proj_cols.append(c)
            proj = ", ".join(proj_cols)
        else:
            # implicit group-by keeps every other column; the source
            # qualifier still dies with the subquery, so strip it
            aggs, _ = self._pivot_agg_columns(aggs, src, on)
            proj = "*"
        q = (
            f"SELECT * FROM (SELECT {proj} FROM {src}) "
            f"PIVOT ({aggs} FOR {on} IN ({lits}))"
        )
        if order:
            q += f" ORDER BY {order}"
        # the aggs/order came from user text: give them the dialect shim
        return self.spark.sql(rewrite_pg(q))

    # ------------------------------------------------------------------ #
    # Views (U2 — CREATE VIEW pushdown, src/hooks/utility/view.rs:31-98)
    # ------------------------------------------------------------------ #

    def create_view(self, name: str, query: str) -> None:
        self.sql(query).createOrReplaceTempView(name)

    # ------------------------------------------------------------------ #
    # Materialization (CTAS — the reference's only write path,
    # tests/tests/scan.rs:314-333) with the physical-layout levers the
    # 100 TB design leans on (SCALE.md: partition pruning, bucketed
    # shuffle-free joins).
    # ------------------------------------------------------------------ #

    def materialize(
        self,
        name: str,
        query: str,
        path: str | None = None,
        format: str = "parquet",
        mode: str = "overwrite",
        partition_by: str | list[str] | None = None,
        bucket_by: tuple[int, str | list[str]] | None = None,
        sort_by: str | list[str] | None = None,
        cluster_by: str | list[str] | tuple[int, str | list[str]] | None = None,
        options: dict | None = None,
    ) -> DataFrame:
        """CREATE TABLE AS SELECT.

        With ``path``: writes files there (optionally hive-partitioned
        by ``partition_by``) and re-attaches them under ``name`` — the
        external-table path; downstream queries get file-level partition
        pruning.  Without ``path``: saves a managed table, where
        ``bucket_by=(n, cols)`` + ``sort_by`` lay the data out for
        shuffle-free co-located joins on the bucket key.

        ``cluster_by`` (cols, or ``(n, cols)`` to pin the file count)
        range-partitions + sorts rows by the given columns before
        writing (either path), so each file/row-group owns a disjoint
        key range: parquet min/max statistics then prune scans on
        those columns — the zone-map lever that makes selective range
        queries cheap at 100 TB without hive partitioning's small-file
        explosion on high-cardinality keys.
        Returns the materialized table's DataFrame.
        """
        df = self.sql(query)
        as_list = lambda v: [v] if isinstance(v, str) else list(v)  # noqa: E731
        if cluster_by:
            # (n, cols) pins the file count (AQE otherwise coalesces
            # small range shuffles); bare cols let AQE pick
            if (
                isinstance(cluster_by, tuple)
                and len(cluster_by) == 2
                and isinstance(cluster_by[0], int)
            ):
                n, ccols = cluster_by[0], as_list(cluster_by[1])
                df = df.repartitionByRange(n, *ccols)
            else:
                ccols = as_list(cluster_by)
                df = df.repartitionByRange(*ccols)
            df = df.sortWithinPartitions(*ccols)
        if path is not None:
            if bucket_by:
                raise ValueError(
                    "bucket_by requires a managed table (omit path): Spark "
                    "bucketing metadata lives in the catalog"
                )
            if format == "delta" and not _probe_delta():
                # no delta-spark jar → the zero-dependency protocol
                # writer (sources/delta_write.py); round-trips through
                # the native replay reader and standard Delta clients
                from pg_analytics_spark.sources.delta_write import write_delta

                write_delta(
                    df, path, mode=mode, partition_by=partition_by,
                    options=options,
                )
            elif format == "iceberg" and not _probe_iceberg():
                from pg_analytics_spark.sources.iceberg_write import (
                    write_iceberg,
                )

                write_iceberg(
                    df, path, mode=mode, partition_by=partition_by,
                    options=options,
                )
            else:
                writer = df.write.format(format).mode(mode)
                if options:
                    writer = writer.options(**options)
                if partition_by:
                    writer = writer.partitionBy(*as_list(partition_by))
                writer.save(path)
            self.attach(name, files=path, format=format)
        else:
            writer = df.write.mode(mode)
            if options:
                writer = writer.options(**options)
            if partition_by:
                writer = writer.partitionBy(*as_list(partition_by))
            if bucket_by:
                n, cols = bucket_by
                writer = writer.bucketBy(int(n), *as_list(cols))
                if sort_by:
                    writer = writer.sortBy(*as_list(sort_by))
            writer.saveAsTable(name)
        return self.spark.table(name)

    def compact(
        self,
        path: str,
        target_file_mb: int = 128,
        partition_by: str | list[str] | None = None,
        format: str = "parquet",
    ) -> dict:
        """Rewrite a small-file dataset into ~target_file_mb files —
        the maintenance op every streaming/incremental sink needs (each
        micro-batch append leaves small files; scan cost at 100 TB is
        driven by file count as much as bytes).

        Un-partitioned data repartitions to ceil(bytes/target); with
        ``partition_by``, rows hash-route by the partition columns so
        each hive partition is written by one task → one file per
        partition dir.  The rewrite goes to a temp sibling directory
        and swaps in via rename, so a concurrent reader sees either the
        old or the new layout, never a half-written mix.
        Returns {files_before, files_after, bytes}.

        ``format="delta"`` routes to the log-aware compaction
        (sources/delta_write.compact_delta): a directory swap would
        orphan the transaction log, so compaction is committed as one
        overwrite (history stays time-travelable); the return dict
        additionally carries the commit ``version``.  The layout comes
        from the table's own metaData — a ``partition_by`` argument is
        rejected rather than silently ignored.
        """
        import math

        if format == "delta":
            if partition_by:
                raise ValueError(
                    "compact(format='delta') takes the partition layout "
                    "from the table's metaData; partition_by is not "
                    "applicable"
                )
            from pg_analytics_spark.sources.delta_write import compact_delta

            return compact_delta(self.spark, path, target_file_mb)
        import os
        import shutil
        import uuid

        df = load_source(self.spark, path, format)
        files = [
            f[5:] if f.startswith("file:") else f for f in df.inputFiles()
        ]
        total = sum(os.path.getsize(f) for f in files if os.path.exists(f))
        n_before = len(files)
        tmp = os.path.join(
            os.path.dirname(path.rstrip("/")),
            f"_compact-{uuid.uuid4().hex}",
        )
        as_list = lambda v: [v] if isinstance(v, str) else list(v)  # noqa: E731
        writer_df = df
        if partition_by:
            cols = as_list(partition_by)
            n = max(
                1, math.ceil(total / (target_file_mb * 1024 * 1024))
            )
            writer_df = df.repartition(n, *cols)
            writer_df.write.format(format).mode("overwrite").partitionBy(
                *cols
            ).save(tmp)
        else:
            n = max(1, math.ceil(total / (target_file_mb * 1024 * 1024)))
            writer_df = df.repartition(n)
            writer_df.write.format(format).mode("overwrite").save(tmp)
        old = os.path.join(
            os.path.dirname(path.rstrip("/")), f"_old-{uuid.uuid4().hex}"
        )
        os.replace(path.rstrip("/"), old)
        os.replace(tmp, path.rstrip("/"))
        shutil.rmtree(old, ignore_errors=True)
        out = load_source(self.spark, path, format)
        n_after = len(out.inputFiles())
        return {
            "files_before": n_before,
            "files_after": n_after,
            "bytes": total,
        }

    # ------------------------------------------------------------------ #
    # EXPLAIN (U1 — src/hooks/utility/explain.rs:39-96)
    # ------------------------------------------------------------------ #

    def explain(self, query: str, style: str = "formatted", analyze: bool = False) -> str:
        """Styles like the reference (explain.rs:39-96): 'pg' prints the
        one-line scan summary; 'duckdb' renders the physical plan as the
        box art DuckDB's own EXPLAIN prints; 'formatted'/'extended'/
        'cost'/'codegen' pass through to Spark's EXPLAIN modes.
        ``analyze`` times an actual execution (explain.rs:59-68).
        """
        out = []
        if style in ("pg", "simple"):
            out.append(f"Spark Scan: {query.strip()}")
        elif style == "duckdb":
            plan = self.spark.sql(f"EXPLAIN {query}").collect()[0][0]
            out.append(_box_art(plan))
        else:
            mode = {"formatted": "formatted",
                    "extended": "extended", "cost": "cost",
                    "codegen": "codegen"}.get(style, "formatted")
            plan = self.spark.sql(f"EXPLAIN {mode.upper()} {query}").collect()[0][0]
            out.append(plan)
        if analyze:
            t0 = time.perf_counter()
            n = self.spark.sql(query).count()
            ms = (time.perf_counter() - t0) * 1000
            out.append(f"Execution Time: {ms:.3f} ms ({n} rows)")
        return "\n".join(out)

    # ------------------------------------------------------------------ #
    # PREPARE / EXECUTE / DEALLOCATE (U3 — utility/prepare.rs:27-119)
    # ------------------------------------------------------------------ #

    def prepare(self, name: str, query: str) -> None:
        alt = None
        if _re.search(r"\basof\s+(left\s+)?join\b", query, _re.IGNORECASE):
            # keep the LATERAL rewrite as the analysis-failure
            # fallback, same as Engine.sql's retry
            alt = rewrite_pg(query, asof_union=False)
        self._prepared[name] = _Prepared(
            rewrite_pg(query), self.spark.catalog.currentDatabase(),
            alt_sql=alt,
        )

    def execute(self, name: str, params: dict | None = None) -> DataFrame:
        if name not in self._prepared:
            raise EngineError(f"prepared statement {name!r} does not exist")
        p = self._prepared[name]
        current_db = self.spark.catalog.currentDatabase()
        if p.df is None or p.database != current_db:
            p.database = current_db  # replan on search_path change
            p.df = None

        def _run(sql: str):
            return (
                self.spark.sql(sql, args=params)
                if params
                else self.spark.sql(sql)
            )

        if params or p.df is None:
            try:
                df = _run(p.sql)
            except Exception as exc:
                from pyspark.errors import AnalysisException, ParseException

                if p.alt_sql is None or not isinstance(
                    exc, (AnalysisException, ParseException)
                ):
                    raise
                try:
                    df = _run(p.alt_sql)
                except Exception:
                    # transient failure (missing view/param) — surface
                    # the ORIGINAL error, keep the routed SQL so a
                    # later execute() retries the one-shuffle plan
                    raise exc
                p.sql = p.alt_sql  # pin only a PROVEN-working rewrite
                p.alt_sql = None
            if params:
                return df
            p.df = df
        return p.df

    def deallocate(self, name: str | None = None) -> None:
        """DEALLOCATE name | ALL (prepare.rs:110-119)."""
        if name is None:
            self._prepared.clear()
        else:
            self._prepared.pop(name, None)

    # ------------------------------------------------------------------ #
    # Introspection (A2/A4/A5 — src/api/*.rs)
    # ------------------------------------------------------------------ #

    def settings(self) -> DataFrame:
        """Engine settings table (analog of duckdb_settings, api/duckdb.rs:32-66)."""
        return self.spark.sql("SET -v").select("key", "value", "meaning")

    def set(self, key: str, value) -> None:
        self.spark.conf.set(key, str(value))

    def describe(self, name: str) -> DataFrame:
        """DESCRIBE a registered table (the reference's auto-inference
        DESCRIBE, src/fdw/trigger.rs:103-137)."""
        return self.spark.sql(f"DESCRIBE TABLE {name}")

    def schema(self, name: str):
        return self.spark.table(name).schema

    def parquet_schema(self, files: str | list[str]):
        """Physical parquet metadata rows (api/parquet.rs:51-111): one row
        per column with file/name/type/repetition-level info via PyArrow."""
        import pyarrow.parquet as pq

        rows = []
        for path in split_files(files):
            import glob as _g

            for f in sorted(_g.glob(path)) or [path]:
                meta = pq.ParquetFile(f)
                sch = meta.schema  # physical schema
                for i in range(len(sch)):
                    c = sch.column(i)
                    rows.append(
                        {
                            "file_name": f,
                            "name": c.name,
                            "type": str(c.physical_type),
                            "converted_type": str(c.converted_type),
                            "logical_type": str(c.logical_type),
                            "max_definition_level": c.max_definition_level,
                            "max_repetition_level": c.max_repetition_level,
                            "num_rows": meta.metadata.num_rows,
                            "num_row_groups": meta.metadata.num_row_groups,
                        }
                    )
        return self.spark.createDataFrame(rows)

    def parquet_describe(self, files: str | list[str]) -> DataFrame:
        """Logical describe (api/parquet.rs:113-190): column_name/column_type."""
        df = load_source(self.spark, files, "parquet", {})
        return self.spark.createDataFrame(
            [
                {"column_name": f.name, "column_type": f.dataType.simpleString()}
                for f in df.schema.fields
            ]
        )

    def sniff_csv(self, files: str | list[str], sample_size: int = 20480) -> dict:
        """CSV dialect detection (api/csv.rs:39-95) — returns the same
        11-field shape as DuckDB's sniff_csv."""
        import csv as _csv
        import glob as _g

        path = None
        for pattern in split_files(files):
            hits = sorted(_g.glob(pattern)) or [pattern]
            if hits:
                path = hits[0]
                break
        with open(path, newline="") as fh:
            sample = fh.read(max(sample_size, 4096))
        sniffer = _csv.Sniffer()
        dialect = sniffer.sniff(sample)
        has_header = sniffer.has_header(sample)
        first_line = sample.splitlines()[0] if sample else ""
        names = next(_csv.reader([first_line], dialect)) if first_line else []
        probe = (
            self.spark.read.option("header", str(has_header).lower())
            .option("inferSchema", "true")
            .option("sep", dialect.delimiter)
            .csv(path)
        )
        columns = [
            {"name": n if has_header else f.name, "type": f.dataType.simpleString()}
            for n, f in zip(names if has_header else probe.columns, probe.schema.fields)
        ]
        return {
            "delimiter": dialect.delimiter,
            "quote": dialect.quotechar,
            "escape": dialect.escapechar or dialect.quotechar,
            "new_line_delimiter": dialect.lineterminator.replace("\r\n", "\\r\\n"),
            "skip_rows": 0,
            "has_header": has_header,
            "columns": columns,
            "date_format": None,
            "timestamp_format": None,
            "user_arguments": f"sample_size={sample_size}",
            "prompt": None,
        }

    def extensions(self) -> DataFrame:
        """Loaded-integration report (analog of duckdb_extensions,
        api/duckdb.rs:68-124): name / loaded / description."""
        rows = []
        for name, probe, desc in (
            ("parquet", lambda: True, "parquet read (native)"),
            ("csv", lambda: True, "csv read (native)"),
            ("json", lambda: True, "json read (native)"),
            ("delta", _probe_delta, "Delta Lake via delta-spark"),
            ("iceberg", _probe_iceberg, "Iceberg via iceberg-spark-runtime"),
        ):
            try:
                loaded = bool(probe())
            except Exception:
                loaded = False
            rows.append({"extension_name": name, "loaded": loaded, "description": desc})
        return self.spark.createDataFrame(rows)

    # ------------------------------------------------------------------ #
    # Credentials (S7 — src/duckdb/secret.rs)
    # ------------------------------------------------------------------ #

    def _insert_lake_statement(self, m) -> DataFrame:
        """``INSERT INTO <attached delta/iceberg table> SELECT …`` —
        one append commit through the native protocol writer (the
        writers' full append semantics apply: null-fill of missing
        nullable columns, loud type-mismatch/new-column errors), then
        the attachment refreshes so subsequent queries see the new
        snapshot.  Returns a one-row (count) relation like COPY."""
        att = self._attachments[m.group("name")]
        target = att.files[0]
        df = self.sql(m.group("q"))
        # SQL INSERT binds columns by POSITION and coerces to the
        # table's types (a VALUES literal is int where the table is
        # long, etc.); a column list binds positionally to the NAMED
        # columns, `BY NAME` binds by the query's OWN column names —
        # unmentioned table columns NULL-fill (DuckDB semantics).
        from pyspark.sql import functions as F

        tbl_schema = self.spark.table(att.name).schema
        by_lower = {f.name.lower(): f.name for f in tbl_schema.fields}
        named: list[str] | None = None  # query-col order → table names
        if m.group("byname"):
            unknown = [c for c in df.columns if c.lower() not in by_lower]
            if unknown:
                raise EngineError(
                    f"INSERT INTO {att.name} BY NAME: query column(s) "
                    f"{unknown} not in table "
                    f"({[f.name for f in tbl_schema.fields]})"
                )
            named = [by_lower[c.lower()] for c in df.columns]
        elif m.group("cols"):
            cols = [c.strip() for c in m.group("cols").split(",") if c.strip()]
            unknown = [c for c in cols if c.lower() not in by_lower]
            if unknown:
                raise EngineError(
                    f"INSERT INTO {att.name} ({', '.join(cols)}): "
                    f"column(s) {unknown} not in table"
                )
            if len(cols) != len(df.columns):
                raise EngineError(
                    f"INSERT INTO {att.name}: column list names "
                    f"{len(cols)} columns, query has {len(df.columns)}"
                )
            named = [by_lower[c.lower()] for c in cols]
        if named is not None:
            if len(set(named)) != len(named):
                raise EngineError(
                    f"INSERT INTO {att.name}: duplicate target column"
                )
            src = df.toDF(*named)
            # unmentioned columns NULL-fill; the writers reject
            # non-nullable gaps downstream
            for f in tbl_schema.fields:
                if f.name not in named:
                    src = src.withColumn(
                        f.name, F.lit(None).cast(f.dataType)
                    )
            src = src.select(*[f.name for f in tbl_schema.fields])
        else:
            if len(df.columns) != len(tbl_schema.fields):
                raise EngineError(
                    f"INSERT INTO {att.name}: query has "
                    f"{len(df.columns)} columns, table has "
                    f"{len(tbl_schema.fields)} "
                    f"({[f.name for f in tbl_schema.fields]})"
                )
            src = df.toDF(*[f.name for f in tbl_schema.fields])
        # try_cast + a null-introduction check: a value the target type
        # cannot represent (e.g. 'abc' into BIGINT) must ERROR like
        # standard INSERT / DuckDB, not silently become NULL (plain
        # non-ANSI cast would).  One extra aggregate job over the
        # persisted SELECT result — the query itself runs once.
        casted = src.select(
            *[
                F.col(f.name).try_cast(f.dataType).alias(f.name)
                for f in tbl_schema.fields
            ],
            *[
                (
                    F.col(f.name).isNotNull()
                    & F.col(f.name).try_cast(f.dataType).isNull()
                ).alias(f"__bad_{i}")
                for i, f in enumerate(tbl_schema.fields)
            ],
        ).persist()
        try:
            bad = casted.agg(
                *[
                    F.sum(F.col(f"__bad_{i}").cast("int")).alias(f"b{i}")
                    for i in range(len(tbl_schema.fields))
                ]
            ).first()
            for i, f in enumerate(tbl_schema.fields):
                if (bad[f"b{i}"] or 0) > 0:
                    raise EngineError(
                        f"INSERT INTO {att.name}: {bad[f'b{i}']} value(s) "
                        f"cannot be cast to {f.name} "
                        f"{f.dataType.simpleString()}"
                    )
            return self._insert_lake_write(
                att, target, casted.select(*[f.name for f in tbl_schema.fields])
            )
        finally:
            casted.unpersist()

    def _insert_lake_write(self, att, target: str, df: DataFrame) -> DataFrame:
        if att.format == "delta":
            from pg_analytics_spark.sources.delta_write import write_delta

            res = write_delta(df, target, mode="append")
        else:
            from pg_analytics_spark.sources.iceberg_write import write_iceberg

            res = write_iceberg(df, target, mode="append")
        # refresh the temp view onto the new snapshot
        self.attach(
            att.name, att.files, att.format, att.options, att.columns
        )
        return self.spark.createDataFrame(
            [(int(res.get("rows", 0)),)], "count bigint"
        )

    #: FDW wrapper-name stem → engine source format
    _WRAPPER_FORMATS = {
        "parquet": "parquet",
        "csv": "csv",
        "json": "json",
        "delta": "delta",
        "iceberg": "iceberg",
        "spatial": "spatial",
    }

    def _parse_ddl_options(self, text: str | None) -> dict:
        """Postgres ``OPTIONS (key 'value', …)`` body → dict (quoted
        values unescaped; bare words kept verbatim)."""
        from pg_analytics_spark.dialect import _tokenize

        opts: dict = {}
        if not text:
            return opts
        key: str | None = None
        for kind, tok in _tokenize(text):
            if kind in ("ws", "comment"):
                continue
            if tok == ",":
                key = None
                continue
            if key is None:
                if kind != "word":
                    raise EngineError(
                        f"OPTIONS: expected an option name, got {tok!r}"
                    )
                key = tok.lower()
            else:
                opts[key] = (
                    tok[1:-1].replace("''", "'")
                    if kind == "string"
                    else tok
                )
        return opts

    def _fdw_ddl_statement(self, q: str) -> DataFrame | None:
        """The reference's own setup DDL, accepted verbatim
        (README.md:100-117; tests/tests/fixtures/arrow.rs:295-320):

        * ``CREATE EXTENSION pg_analytics`` — no-op acknowledgement
        * ``CREATE FOREIGN DATA WRAPPER <fmt>_wrapper HANDLER … `` —
          registers the wrapper name → source format
        * ``CREATE SERVER s FOREIGN DATA WRAPPER w [OPTIONS …]``
        * ``CREATE USER MAPPING FOR u SERVER s [OPTIONS (type 'S3',
          …)]`` — credential options feed the same secret store the
          reference's user mappings compile into (secret.rs:24-217)
        * ``CREATE FOREIGN TABLE t ([cols]) SERVER s OPTIONS (files
          '…', …)`` — attaches through the source layer: empty column
          list = auto schema inference (the trigger.rs path), declared
          pg-typed columns apply the cast matrix
        * ``DROP FOREIGN TABLE t`` — detaches

        Returns None when the text is none of these (the caller falls
        through to the other statement forms)."""
        m = _CREATE_EXTENSION_RE.match(q)
        if m:
            return self.spark.createDataFrame(
                [(m.group("name"),)], "extension string"
            )
        m = _CREATE_FDW_RE.match(q)
        if m:
            w = m.group("w").lower()
            stem = w[:-8] if w.endswith("_wrapper") else w
            if stem not in self._WRAPPER_FORMATS:
                raise EngineError(
                    f"CREATE FOREIGN DATA WRAPPER {w}: unknown wrapper "
                    f"(supported: {sorted(self._WRAPPER_FORMATS)}, "
                    "conventionally named <format>_wrapper)"
                )
            self._wrappers[w] = self._WRAPPER_FORMATS[stem]
            return self.spark.createDataFrame([(w,)], "wrapper string")
        m = _CREATE_SERVER_RE.match(q)
        if m:
            w = m.group("w").lower()
            fmt = self._wrappers.get(w)
            if fmt is None:
                stem = w[:-8] if w.endswith("_wrapper") else w
                fmt = self._WRAPPER_FORMATS.get(stem)
            if fmt is None:
                raise EngineError(
                    f"CREATE SERVER: unknown foreign data wrapper "
                    f"{m.group('w')!r} — CREATE FOREIGN DATA WRAPPER "
                    "first (or use the <format>_wrapper naming)"
                )
            self._servers[m.group("s").lower()] = (
                fmt,
                self._parse_ddl_options(m.group("opts")),
            )
            return self.spark.createDataFrame(
                [(m.group("s"), fmt)], "server string, format string"
            )
        m = _CREATE_USER_MAPPING_RE.match(q)
        if m:
            srv = m.group("s").lower()
            if srv not in self._servers:
                raise EngineError(
                    f"CREATE USER MAPPING: unknown server {srv!r}"
                )
            opts = self._parse_ddl_options(m.group("opts"))
            if opts:
                # same vocabulary the reference compiles user mappings
                # into DuckDB secrets with (secret.rs) → secret store
                stype = str(opts.pop("type", "s3")).lower()
                self.add_secret(stype, {k: str(v) for k, v in opts.items()})
            return self.spark.createDataFrame(
                [(srv, len(opts))], "server string, n_options int"
            )
        m = _CREATE_FOREIGN_TABLE_RE.match(q)
        if m:
            srv = m.group("srv").lower()
            if srv not in self._servers:
                raise EngineError(
                    f"CREATE FOREIGN TABLE: unknown server {srv!r} — "
                    "CREATE SERVER first"
                )
            fmt, srv_opts = self._servers[srv]
            name = m.group("name").strip('"').split(".")[-1]
            opts = dict(srv_opts)
            opts.update(self._parse_ddl_options(m.group("opts")))
            files_opt = opts.pop("files", None)
            if files_opt is None:
                raise EngineError(
                    f"CREATE FOREIGN TABLE {name}: OPTIONS must name "
                    "files '…' (the reference's required option)"
                )
            files = [f.strip() for f in str(files_opt).split(",") if f.strip()]
            columns = self._parse_foreign_columns(m.group("cols"))
            self.attach(
                name, files, fmt, opts or None, columns or None
            )
            return self.spark.createDataFrame(
                [(name, fmt, len(files))],
                "table string, format string, n_files int",
            )
        m = _DROP_FOREIGN_TABLE_RE.match(q)
        if m:
            name = m.group("name").strip('"').split(".")[-1]
            if name in self._attachments:
                self.detach(name)
            elif "IF" not in q.upper():
                raise EngineError(
                    f"DROP FOREIGN TABLE: {name!r} is not attached"
                )
            return self.spark.createDataFrame([(name,)], "dropped string")
        return None

    @staticmethod
    def _parse_foreign_columns(cols_text: str) -> dict[str, str]:
        """``"Name" TYPE, other_col DOUBLE PRECISION, …`` → ordered
        {name: pg_type} (empty text → auto inference).  Line comments
        are stripped (the reference's own fixtures carry them);
        constraint noise (NOT NULL / DEFAULT …) is dropped."""
        body = "\n".join(
            ln.split("--", 1)[0] for ln in (cols_text or "").splitlines()
        ).strip()
        if not body:
            return {}
        out: dict[str, str] = {}
        depth, start, parts = 0, 0, []
        for i, ch in enumerate(body):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif ch == "," and depth == 0:
                parts.append(body[start:i])
                start = i + 1
        parts.append(body[start:])
        for p in parts:
            p = p.strip()
            if not p:
                continue
            if p.startswith('"'):
                end = p.index('"', 1)
                name, rest = p[1:end], p[end + 1 :]
            else:
                mm = _re.match(r"[\w]+", p)
                if not mm:
                    raise EngineError(
                        f"CREATE FOREIGN TABLE: bad column entry {p!r}"
                    )
                name, rest = mm.group(0), p[mm.end():]
            typ = _re.split(
                r"\b(?:NOT\s+NULL|DEFAULT|CHECK|COLLATE)\b",
                rest,
                flags=_re.IGNORECASE,
            )[0].strip()
            if not typ:
                raise EngineError(
                    f"CREATE FOREIGN TABLE: column {name!r} lacks a type"
                )
            out[name] = typ
        return out

    def _create_temp_table_statement(self, m) -> DataFrame:
        """``CREATE [OR REPLACE] TEMP TABLE t AS <query>`` — DuckDB's
        session-scoped materialized table.  The SELECT runs through the
        full dialect shim and SNAPSHOTS immediately (localCheckpoint,
        eager): later changes to the inputs never leak into the table,
        unlike a view.  Plain CREATE on an existing temp table fails
        loudly; OR REPLACE swaps it (SQL semantics)."""
        name = m.group("name")
        if not m.group("replace") and name.lower() in self._temp_tables:
            raise EngineError(
                f"temp table {name!r} already exists; use CREATE OR "
                "REPLACE TEMP TABLE to overwrite"
            )
        snap = self.sql(m.group("q")).localCheckpoint(eager=True)
        snap.createOrReplaceTempView(name)
        self._temp_tables[name.lower()] = snap
        return self.spark.createDataFrame([(name,)], "created string")

    def _drop_table_statement(self, m) -> DataFrame:
        """``DROP TABLE [IF EXISTS] t`` for engine temp tables (only
        statements that can refer to one route here — unknown names
        without IF EXISTS fall through to Spark's catalog)."""
        name = m.group("name").lower()
        if name in self._temp_tables:
            self._temp_tables.pop(name)
            self.spark.catalog.dropTempView(m.group("name"))
            return self.spark.createDataFrame(
                [(m.group("name"),)], "dropped string"
            )
        # only attachments can reach here — refuse rather than guess
        raise EngineError(
            f"DROP TABLE {m.group('name')}: this is an ATTACHED source "
            "(DROP would not delete the external files) — use detach, "
            "or drop the files explicitly"
        )

    def _insert_conflict_statement(self, m) -> DataFrame:
        """``INSERT INTO <attached delta table> … ON CONFLICT (keys)
        DO NOTHING | DO UPDATE SET …`` — the upsert shorthand, routed
        onto the native MERGE writer: DO NOTHING inserts only the
        non-conflicting rows (anti-join), DO UPDATE updates matched
        rows (``EXCLUDED.col`` = the proposed row, bare columns = the
        existing row, DuckDB/Postgres semantics) and inserts the rest —
        ONE commit either way.  Loud ``UnsupportedDialect`` guidance
        for everything the lake attachment cannot express: OR
        REPLACE/IGNORE (no declared PRIMARY KEY to infer the conflict
        target from), a missing conflict-target column list, non-lake
        targets, and duplicate conflict keys within the source (row-
        at-a-time upsert order is undefined on a distributed engine).
        """
        from pyspark.sql import functions as F

        import functools

        from pg_analytics_spark.dialect import UnsupportedDialect, _tokenize

        name = m.group("name")
        construct = (
            f"INSERT OR {m.group('orq').upper()}"
            if m.group("orq")
            else "INSERT … ON CONFLICT"
        )
        att = self._attachments.get(name)
        if att is None:
            raise UnsupportedDialect(
                f"{construct}: {name} is not an attached table — upsert "
                "statements route through the native lake writers "
                "(Engine.attach a delta table first)"
            )
        if att.format == "delta":
            from pg_analytics_spark.sources.delta_write import (
                merge_delta as merge_fn,
            )
        elif att.format == "iceberg":
            from pg_analytics_spark.sources.iceberg_write import (
                merge_iceberg as merge_fn,
            )
        else:
            raise UnsupportedDialect(
                f"{construct}: {name} is {att.format}; upsert routing "
                "supports delta (copy-on-write) and iceberg "
                "(merge-on-read) attachments"
            )
        if m.group("orq"):
            alt = (
                "DO UPDATE SET col = EXCLUDED.col, …"
                if m.group("orq").upper() == "REPLACE"
                else "DO NOTHING"
            )
            raise UnsupportedDialect(
                f"{construct}: attached lake tables declare no PRIMARY "
                "KEY to infer the conflict target from — write INSERT "
                f"INTO {name} … ON CONFLICT (key_cols) {alt}"
            )
        if m.group("cols") or m.group("byname"):
            raise UnsupportedDialect(
                "INSERT … ON CONFLICT: column-list/BY NAME binding is "
                "not supported together with a conflict clause — "
                "project the SELECT to the table's full column list"
            )
        keys = [
            c.strip() for c in (m.group("ckeys") or "").split(",") if c.strip()
        ]
        if not keys:
            raise UnsupportedDialect(
                "ON CONFLICT: an explicit conflict target (col, …) is "
                "required — lake attachments declare no unique "
                "constraints to infer it from"
            )
        tbl_schema = self.spark.table(att.name).schema
        by_lower = {f.name.lower(): f.name for f in tbl_schema.fields}
        unknown = [k for k in keys if k.lower() not in by_lower]
        if unknown:
            raise EngineError(
                f"ON CONFLICT: column(s) {unknown} not in table "
                f"({[f.name for f in tbl_schema.fields]})"
            )
        keys = [by_lower[k.lower()] for k in keys]
        df = self.sql(m.group("q"))
        if len(df.columns) != len(tbl_schema.fields):
            raise EngineError(
                f"INSERT INTO {att.name}: query has {len(df.columns)} "
                f"columns, table has {len(tbl_schema.fields)} "
                f"({[f.name for f in tbl_schema.fields]})"
            )
        src = df.toDF(*[f.name for f in tbl_schema.fields])
        # positional INSERT coercion with the null-introduction check
        # (same contract as _insert_lake_statement)
        casted = src.select(
            *[
                F.col(f.name).try_cast(f.dataType).alias(f.name)
                for f in tbl_schema.fields
            ],
            *[
                (
                    F.col(f.name).isNotNull()
                    & F.col(f.name).try_cast(f.dataType).isNull()
                ).alias(f"__bad_{i}")
                for i, f in enumerate(tbl_schema.fields)
            ],
        ).persist()
        try:
            # ONE validation job: per-column null-introduction counts
            # AND the duplicate-conflict-key probe (count vs distinct
            # over the key tuple) ride the same aggregate
            bad = casted.agg(
                *[
                    F.sum(F.col(f"__bad_{i}").cast("int")).alias(f"b{i}")
                    for i in range(len(tbl_schema.fields))
                ],
                F.count(
                    F.when(
                        functools.reduce(
                            lambda a, b: a & b,
                            [F.col(k).isNotNull() for k in keys],
                        ),
                        F.lit(1),
                    )
                ).alias("__nk"),
                F.countDistinct(*[F.col(k) for k in keys]).alias("__ndk"),
            ).first()
            for i, f in enumerate(tbl_schema.fields):
                if (bad[f"b{i}"] or 0) > 0:
                    raise EngineError(
                        f"INSERT INTO {att.name}: {bad[f'b{i}']} value(s) "
                        f"cannot be cast to {f.name} "
                        f"{f.dataType.simpleString()}"
                    )
            # NULL-keyed rows never conflict (SQL 3VL), so both
            # counters cover exactly the fully-non-NULL key tuples:
            # strictly more rows than distinct tuples == a collision
            if (bad["__nk"] or 0) > (bad["__ndk"] or 0):
                raise EngineError(
                    "ON CONFLICT: the inserted rows contain duplicate "
                    f"conflict key(s) {keys} — deduplicate the SELECT "
                    "first (row-at-a-time upsert order is undefined on "
                    "a distributed engine)"
                )
            source = casted.select(*[f.name for f in tbl_schema.fields])
            on_cond = " AND ".join(f"t.{k} = s.{k}" for k in keys)
            clauses: list[dict] = []
            if m.group("setlist"):
                clauses.append(
                    {
                        "when": "matched",
                        "action": "update",
                        "set": self._conflict_set_map(
                            m.group("setlist"), tbl_schema
                        ),
                        "condition": None,
                    }
                )
            clauses.append(
                {
                    "when": "not_matched",
                    "action": "insert",
                    "values": "all",
                    "condition": None,
                }
            )
            res = merge_fn(
                source, att.files[0], on_cond, clauses,
                target_alias="t", source_alias="s",
            )
        finally:
            casted.unpersist()
        self.attach(
            att.name, att.files, att.format, att.options, att.columns
        )
        return self.spark.createDataFrame(
            [
                (
                    int(res["rows_written"]),
                    int(res["files_added"]),
                    int(res["files_removed"]),
                    int(res["version"]),
                )
            ],
            "rows_written bigint, files_added int, files_removed int, "
            "version int",
        )

    def _conflict_set_map(self, setlist: str, tbl_schema) -> dict:
        """Parse ``col = expr, …`` with DuckDB ON CONFLICT namespaces:
        ``EXCLUDED.col`` → the proposed row (source alias), bare table
        columns → the existing row (target alias)."""
        from pg_analytics_spark.dialect import _depths, _tokenize

        tbl_lower = {f.name.lower(): f.name for f in tbl_schema.fields}
        tokens = _tokenize(setlist)
        depths = _depths(tokens)
        assigns, start = [], 0
        for i, (kind, text) in enumerate(tokens):
            if text == "," and depths[i] == 0:
                assigns.append(tokens[start:i])
                start = i + 1
        assigns.append(tokens[start:])
        set_map: dict[str, str] = {}
        for a in assigns:
            eq_at = next(
                (i for i, (k, t) in enumerate(a) if t == "="), None
            )
            if eq_at is None:
                raise EngineError(
                    "ON CONFLICT DO UPDATE SET: expected col = expr, got "
                    + "".join(t for _, t in a)[:60]
                )
            col = "".join(t for _, t in a[:eq_at]).strip().split(".")[-1]
            if col.lower() not in tbl_lower:
                raise EngineError(
                    f"ON CONFLICT DO UPDATE SET: unknown column {col!r}"
                )
            expr = a[eq_at + 1 :]
            out, i = [], 0
            while i < len(expr):
                kind, text = expr[i]
                low = text.lower()
                if kind == "word" and low == "excluded":
                    # EXCLUDED . col  →  s.col
                    j = i + 1
                    while j < len(expr) and expr[j][0] in ("ws", "comment"):
                        j += 1
                    if (
                        j + 1 < len(expr)
                        and expr[j][1] == "."
                        and expr[j + 1][0] == "word"
                    ):
                        out.append(("word", f"s.{expr[j + 1][1]}"))
                        i = j + 2
                        continue
                if (
                    kind == "word"
                    and low in tbl_lower
                    and not (out and out[-1][1] == ".")
                ):
                    # bare target-column reference → existing row
                    nxt = i + 1
                    while nxt < len(expr) and expr[nxt][0] in (
                        "ws", "comment",
                    ):
                        nxt += 1
                    if nxt >= len(expr) or expr[nxt][1] not in ("(", "."):
                        out.append(("word", f"t.{tbl_lower[low]}"))
                        i += 1
                        continue
                out.append((kind, text))
                i += 1
            set_map[tbl_lower[col.lower()]] = "".join(
                t for _, t in out
            ).strip()
        return set_map

    def _merge_lake_statement(self, m) -> DataFrame:
        """``MERGE INTO <attached delta table> [AS] t USING <rel> [AS] s
        ON <cond> WHEN [NOT] MATCHED [AND c] THEN UPDATE SET …/DELETE/
        INSERT */(cols) VALUES (…)`` — copy-on-write upsert through the
        native writer (sources/delta_write.merge_delta: one inner join
        finds touched files, only those rewrite, inserts anti-join;
        first matching clause wins, ambiguous multi-match errors).
        Returns a one-row metrics relation and refreshes the
        attachment onto the new snapshot."""
        from pg_analytics_spark.dialect import (
            _depths,
            _next_code,
            _tokenize,
        )
        att = self._attachments[m.group("name")]
        if att.format == "delta":
            from pg_analytics_spark.sources.delta_write import (
                merge_delta as merge_fn,
            )
        elif att.format == "iceberg":
            from pg_analytics_spark.sources.iceberg_write import (
                merge_iceberg as merge_fn,  # same clause contract
            )
        else:
            raise EngineError(
                f"MERGE INTO: {att.name} is {att.format}; the native "
                "MERGE writers support delta (copy-on-write) and "
                "iceberg (merge-on-read) tables"
            )
        talias = m.group("talias") or m.group("name")
        rest = m.group("rest").strip()
        # ---- USING relation: (subquery) | dotted name, then alias ----
        if rest.startswith("("):
            depth, i = 0, 0
            while i < len(rest):
                if rest[i] == "(":
                    depth += 1
                elif rest[i] == ")":
                    depth -= 1
                    if depth == 0:
                        break
                i += 1
            if depth != 0:
                raise EngineError("MERGE USING: unbalanced parentheses")
            rel_text, tail = rest[: i + 1], rest[i + 1 :]
        else:
            mm = _re.match(r"[\w.]+", rest)
            if not mm:
                raise EngineError("MERGE USING: expected a relation")
            rel_text, tail = mm.group(0), rest[mm.end():]
        mm = _re.match(
            r"\s*(?:AS\s+)?(?P<salias>(?!ON\b)[A-Za-z_]\w*)?\s*ON\s+",
            tail,
            _re.IGNORECASE,
        )
        if not mm:
            raise EngineError("MERGE: expected ON <condition>")
        salias = mm.group("salias") or (
            rel_text.split(".")[-1] if not rel_text.startswith("(") else None
        )
        if not salias:
            raise EngineError("MERGE USING (subquery) needs an alias")
        tail = tail[mm.end():]
        # ---- split ON condition from the WHEN clause list -----------
        wm = _re.search(
            r"\bWHEN\s+(?:NOT\s+)?MATCHED\b", tail, _re.IGNORECASE
        )
        if not wm:
            raise EngineError("MERGE: expected at least one WHEN clause")
        on_cond = tail[: wm.start()].strip()
        clause_text = tail[wm.start():].rstrip("; \n\t")
        starts = list(
            _re.finditer(
                r"\bWHEN\s+(?P<not>NOT\s+)?MATCHED\b",
                clause_text,
                _re.IGNORECASE,
            )
        )
        clauses: list[dict] = []
        for idx, sm in enumerate(starts):
            seg_end = (
                starts[idx + 1].start()
                if idx + 1 < len(starts)
                else len(clause_text)
            )
            seg = clause_text[sm.end(): seg_end].strip()
            cm = _re.match(
                r"(?:AND\s+(?P<cond>.+?)\s+)?THEN\s+(?P<act>.+)$",
                seg,
                _re.IGNORECASE | _re.DOTALL,
            )
            if not cm:
                raise EngineError(f"MERGE: cannot parse clause: WHEN …{seg}")
            cond, act = cm.group("cond"), cm.group("act").strip()
            is_not = bool(sm.group("not"))
            if is_not:
                im = _re.match(
                    r"INSERT\s+(?:(?P<star>\*)|\((?P<cols>[^)]*)\)\s*"
                    r"VALUES\s*\((?P<vals>.+)\))\s*$",
                    act,
                    _re.IGNORECASE | _re.DOTALL,
                )
                if not im:
                    raise EngineError(
                        "MERGE WHEN NOT MATCHED supports INSERT * or "
                        f"INSERT (cols) VALUES (exprs); got: {act[:60]}"
                    )
                if im.group("star"):
                    values = "all"
                else:
                    cols = [
                        c.strip() for c in im.group("cols").split(",")
                    ]
                    toks = _tokenize(im.group("vals"))
                    depths = _depths(toks)
                    exprs, cur = [], []
                    for x, tk in enumerate(toks):
                        if tk == ("op", ",") and depths[x] == 0:
                            exprs.append("".join(t for _, t in cur).strip())
                            cur = []
                        else:
                            cur.append(tk)
                    exprs.append("".join(t for _, t in cur).strip())
                    if len(cols) != len(exprs):
                        raise EngineError(
                            f"MERGE INSERT: {len(cols)} column(s) but "
                            f"{len(exprs)} value(s)"
                        )
                    values = dict(zip(cols, exprs))
                clauses.append(
                    {
                        "when": "not_matched",
                        "action": "insert",
                        "values": values,
                        "condition": cond,
                    }
                )
            elif _re.match(r"DELETE\s*$", act, _re.IGNORECASE):
                clauses.append(
                    {"when": "matched", "action": "delete", "condition": cond}
                )
            else:
                um = _re.match(
                    r"UPDATE\s+SET\s+(?P<sets>.+)$",
                    act,
                    _re.IGNORECASE | _re.DOTALL,
                )
                if not um:
                    raise EngineError(
                        "MERGE WHEN MATCHED supports UPDATE SET … or "
                        f"DELETE; got: {act[:60]}"
                    )
                toks = _tokenize(um.group("sets"))
                depths = _depths(toks)
                assigns, cur = [], []
                for x, tk in enumerate(toks):
                    if tk == ("op", ",") and depths[x] == 0:
                        assigns.append(cur)
                        cur = []
                    else:
                        cur.append(tk)
                assigns.append(cur)
                set_map = {}
                for a in assigns:
                    ad = _depths(a)
                    eq_at = next(
                        (
                            x
                            for x, tk in enumerate(a)
                            if tk == ("op", "=") and ad[x] == 0
                        ),
                        None,
                    )
                    if eq_at is None:
                        raise EngineError(
                            "MERGE UPDATE SET: expected col = expr, got "
                            + "".join(t for _, t in a)[:60]
                        )
                    col = "".join(t for _, t in a[:eq_at]).strip()
                    expr = "".join(t for _, t in a[eq_at + 1:]).strip()
                    # the assignment target may be written qualified
                    col = col.split(".")[-1]
                    set_map[col] = expr
                clauses.append(
                    {
                        "when": "matched",
                        "action": "update",
                        "set": set_map,
                        "condition": cond,
                    }
                )
        source_df = self.sql(f"SELECT * FROM {rel_text} __merge_src")
        res = merge_fn(
            source_df,
            att.files[0],
            on_cond,
            clauses,
            target_alias=talias,
            source_alias=salias,
        )
        self.attach(
            att.name, att.files, att.format, att.options, att.columns
        )
        return self.spark.createDataFrame(
            [
                (
                    int(res["rows_written"]),
                    int(res["files_added"]),
                    int(res["files_removed"]),
                    int(res["version"]),
                )
            ],
            "rows_written bigint, files_added int, files_removed int, "
            "version int",
        )

    def _dml_delta_attachment(
        self, name: str, construct: str, formats: tuple = ("delta",)
    ):
        """Resolve the target of UPDATE/DELETE/VACUUM statement text to
        an attached lake table of an allowed format, or raise a loud
        UnsupportedDialect naming the construct (never Spark's raw
        TABLE_OPERATION error) — the same loud-or-green convention as
        POSITIONAL JOIN."""
        from pg_analytics_spark.dialect import UnsupportedDialect

        att = self._attachments.get(name.split(".")[-1]) or (
            self._attachments.get(name)
        )
        if att is None:
            raise UnsupportedDialect(
                f"{construct}: {name!r} is not an attached table — the "
                "engine's relations are read-only views except attached "
                "delta/iceberg tables, which support DML through the "
                "native writers"
            )
        if att.format not in formats:
            raise UnsupportedDialect(
                f"{construct}: {att.name} is a {att.format} attachment; "
                f"the native writers support {construct} on "
                f"{'/'.join(formats)} tables only"
            )
        return att

    def _update_lake_statement(self, m) -> DataFrame:
        """``UPDATE <attached delta table> SET col = expr[, …]
        [WHERE cond]`` — copy-on-write through the native writer
        (sources/delta_write.update_delta): one per-file aggregate
        finds touched files, only those rewrite, NULL-predicate rows
        keep their old values (SQL three-valued logic).  Returns a
        one-row metrics relation and refreshes the attachment."""
        from pg_analytics_spark.dialect import _depths, _tokenize
        from pg_analytics_spark.sources.delta_write import update_delta

        att = self._dml_delta_attachment(
            m.group("name"), "UPDATE", formats=("delta", "iceberg")
        )
        rest = m.group("rest")
        toks = _tokenize(rest)
        depths = _depths(toks)
        where_at = next(
            (
                i
                for i, (k, t) in enumerate(toks)
                if k == "word" and t.upper() == "WHERE" and depths[i] == 0
            ),
            None,
        )
        if where_at is None:
            sets_toks, where = toks, None
        else:
            sets_toks = toks[:where_at]
            where = "".join(t for _, t in toks[where_at + 1:]).strip()
        assigns, cur = [], []
        for i, tk in enumerate(sets_toks):
            if tk == ("op", ",") and depths[i] == 0:
                assigns.append(cur)
                cur = []
            else:
                cur.append((i, tk))
        assigns.append(cur)
        set_map: dict[str, str] = {}
        for a in assigns:
            eq_at = next(
                (
                    j
                    for j, (i, tk) in enumerate(a)
                    if tk == ("op", "=") and depths[i] == 0
                ),
                None,
            )
            if eq_at is None:
                raise EngineError(
                    "UPDATE SET: expected col = expr, got "
                    + "".join(t for _i, (_k, t) in a)[:60]
                )
            col = "".join(t for _, (_k, t) in a[:eq_at]).strip()
            expr = "".join(t for _, (_k, t) in a[eq_at + 1:]).strip()
            set_map[col.split(".")[-1]] = expr
        if att.format == "iceberg":
            from pg_analytics_spark.sources.iceberg_write import (
                update_iceberg,
            )

            res = update_iceberg(self.spark, att.files[0], set_map, where)
            self.attach(
                att.name, att.files, att.format, att.options, att.columns
            )
            return self.spark.createDataFrame(
                [(int(res["rows_updated"]), int(res["version"]))],
                "rows_updated bigint, version int",
            )
        res = update_delta(self.spark, att.files[0], set_map, where)
        self.attach(att.name, att.files, att.format, att.options, att.columns)
        return self._dml_metrics(res)

    def _delete_lake_statement(self, m) -> DataFrame:
        """``DELETE FROM <attached delta|iceberg table> [WHERE cond]``
        — NULL-predicate rows survive (SQL three-valued logic) on both
        writers.  Delta: COPY-ON-WRITE (fully-matching files drop via
        pure removes, partial files rewrite survivors, no WHERE
        truncates metadata-only).  Iceberg: MERGE-ON-READ (v2
        position-delete files + a content=1 manifest — O(matched rows)
        commit, readers pay the anti-join) — the two halves of the
        write-amplification trade, each on the format whose protocol
        favors it."""
        att = self._dml_delta_attachment(
            m.group("name"), "DELETE", formats=("delta", "iceberg")
        )
        if att.format == "iceberg":
            from pg_analytics_spark.sources.iceberg_write import (
                delete_iceberg,
            )

            res = delete_iceberg(self.spark, att.files[0], m.group("where"))
            self.attach(
                att.name, att.files, att.format, att.options, att.columns
            )
            return self.spark.createDataFrame(
                [(int(res["rows_deleted"]), int(res["version"]))],
                "rows_deleted bigint, version int",
            )
        from pg_analytics_spark.sources.delta_write import delete_delta

        res = delete_delta(self.spark, att.files[0], m.group("where"))
        self.attach(att.name, att.files, att.format, att.options, att.columns)
        return self._dml_metrics(res)

    def _pragma_statement(self, m) -> DataFrame:
        """DuckDB ``PRAGMA`` statements the reference's tooling may
        emit: ``table_info('t')`` (sqlite-shaped column listing from
        the live schema), ``version``, ``database_list``,
        ``show_tables``.  Anything else raises UnsupportedDialect with
        guidance (Engine.settings/set cover the config pragmas)."""
        from pg_analytics_spark.dialect import UnsupportedDialect

        name = m.group("name").lower()
        arg = m.group("arg")
        if name == "table_info":
            if not arg:
                raise UnsupportedDialect("PRAGMA table_info needs a table name")
            schema = self.spark.table(arg).schema
            return self.spark.createDataFrame(
                [
                    (
                        i,
                        f.name,
                        f.dataType.simpleString().upper(),
                        not f.nullable,
                        None,
                        False,
                    )
                    for i, f in enumerate(schema.fields)
                ],
                "cid int, name string, type string, notnull boolean, "
                "dflt_value string, pk boolean",
            )
        if name == "version":
            return self.spark.createDataFrame(
                [(f"pg_analytics_spark (Spark {self.spark.version})", "")],
                "library_version string, source_id string",
            )
        if name == "database_list":
            return self.spark.createDataFrame(
                [(0, "memory", "")], "seq int, name string, file string"
            )
        if name == "show_tables":
            return self.sql("SHOW TABLES")
        raise UnsupportedDialect(
            f"PRAGMA {name}: supported pragmas are table_info('t'), "
            "version, database_list, show_tables; engine settings go "
            "through Engine.settings()/set()"
        )

    def _expand_fs_table_functions(self, query: str) -> str:
        """Relation-position ``glob('pattern')``, ``duckdb_tables()``
        and ``table_changes('t', v_lo[, v_hi])`` — table functions
        whose result is driver-state (filesystem match list,
        attachment catalog, a Delta change feed), so each call
        materializes a temp view and the statement text references
        it.  Token-level (strings/comments never false-match); no-op
        when none of the names appears."""
        low = query.lower()
        if (
            "glob" not in low
            and "duckdb_tables" not in low
            and "table_changes" not in low
            and "iceberg_" not in low
            and "delta_row_ids" not in low
        ):
            return query
        from pg_analytics_spark.dialect import (
            _comma_in_from_list,
            _depths,
            _next_code,
            _prev_code,
            _tokenize,
        )

        toks = _tokenize(query)
        depths = _depths(toks)
        out = []
        i = 0
        changed = False
        while i < len(toks):
            kind, text = toks[i]
            lowt = text.lower() if kind == "word" else ""
            if lowt in (
                "glob",
                "duckdb_tables",
                "table_changes",
                "iceberg_snapshots",
                "iceberg_manifests",
                "iceberg_files",
                "iceberg_refs",
                "iceberg_statistics",
                "delta_row_ids",
            ):
                p = _prev_code(toks, i)
                # a SELECT-list comma must NOT trigger relation
                # expansion (r7 ADVICE) — only FROM-list commas do
                rel_pos = p < 0 or (
                    toks[p] == ("op", ",")
                    and _comma_in_from_list(toks, depths, p)
                ) or (
                    toks[p][0] == "word"
                    and toks[p][1].lower() in ("from", "join")
                )
                n = _next_code(toks, i)
                if rel_pos and n < len(toks) and toks[n] == ("op", "("):
                    d, j = 0, n
                    while j < len(toks):
                        if toks[j] == ("op", "("):
                            d += 1
                        elif toks[j] == ("op", ")"):
                            d -= 1
                            if d == 0:
                                break
                        j += 1
                    args = "".join(t for _, t in toks[n + 1: j]).strip()
                    if lowt == "table_changes":
                        from pg_analytics_spark.dialect import (
                            UnsupportedDialect,
                        )
                        from pg_analytics_spark.sources.delta_cdf import (
                            read_table_changes,
                        )

                        parts = [a.strip() for a in args.split(",")]
                        if len(parts) not in (2, 3):
                            raise UnsupportedDialect(
                                "table_changes('table', start_version"
                                "[, end_version]) — got "
                                f"table_changes({args})"
                            )
                        att = self._dml_delta_attachment(
                            parts[0].strip("'\""), "table_changes"
                        )
                        def _bound(p):
                            p = p.strip()
                            # quoted → timestamp bound (delta-spark's
                            # startingTimestamp/endingTimestamp forms)
                            if p[:1] in "'\"":
                                return p.strip("'\"")
                            return int(p)

                        df = read_table_changes(
                            self.spark,
                            att.files[0],
                            _bound(parts[1]),
                            _bound(parts[2]) if len(parts) == 3 else None,
                        )
                        self._fs_view_seq += 1
                        view = f"__table_changes_{self._fs_view_seq}"
                    elif lowt in (
                        "iceberg_snapshots",
                        "iceberg_manifests",
                        "iceberg_files",
                        "iceberg_refs",
                        "iceberg_statistics",
                    ):
                        # metadata tables (parity with the runtime's
                        # t.snapshots/t.files/t.manifests and DuckDB's
                        # iceberg_snapshots function; statistics reads
                        # the Puffin sidecars back relationally)
                        from pg_analytics_spark.sources import (
                            iceberg_meta as _imeta,
                        )
                        from pg_analytics_spark.sources import (
                            iceberg_puffin as _ipuf,
                        )

                        att = self._dml_delta_attachment(
                            args.strip().strip("'\""),
                            lowt,
                            formats=("iceberg",),
                        )
                        mod = (
                            _ipuf
                            if lowt == "iceberg_statistics"
                            else _imeta
                        )
                        df = getattr(mod, lowt)(
                            self.spark, att.files[0]
                        )
                        self._fs_view_seq += 1
                        view = f"__{lowt}_{self._fs_view_seq}"
                    elif lowt == "delta_row_ids":
                        # the row-tracking read surface: the table
                        # plus _row_id/_row_commit_version
                        from pg_analytics_spark.sources.delta_rowtracking import (  # noqa: E501
                            with_current_row_ids,
                        )

                        att = self._dml_delta_attachment(
                            args.strip().strip("'\""),
                            lowt,
                            formats=("delta",),
                        )
                        df = with_current_row_ids(
                            self.spark, att.files[0]
                        )
                        self._fs_view_seq += 1
                        view = f"__{lowt}_{self._fs_view_seq}"
                    elif lowt == "glob":
                        import glob as _glob

                        pat = args.strip("'\"")
                        rows = [(f,) for f in sorted(_glob.glob(pat))]
                        df = self.spark.createDataFrame(
                            rows, "file string"
                        ) if rows else self.spark.createDataFrame(
                            [], "file string"
                        )
                        # per-expansion monotonic id — hash-derived
                        # names can collide across distinct patterns
                        # in one statement (r7 ADVICE)
                        self._fs_view_seq += 1
                        view = f"__glob_{self._fs_view_seq}"
                    else:
                        rows = [
                            (
                                "memory",
                                "main",
                                a.name,
                                False,
                                len(a.columns or []) or len(
                                    self.spark.table(a.name).columns
                                ),
                            )
                            for a in self._attachments.values()
                        ]
                        df = self.spark.createDataFrame(
                            rows,
                            "database_name string, schema_name string, "
                            "table_name string, temporary boolean, "
                            "column_count long",
                        )
                        view = "__duckdb_tables"
                    df.createOrReplaceTempView(view)
                    out.append(("word", view))
                    i = j + 1
                    changed = True
                    continue
            out.append(toks[i])
            i += 1
        return "".join(t for _, t in out) if changed else query

    def _expand_time_travel(self, query: str) -> str:
        """Delta-SQL time-travel syntax on attached lake tables:
        ``<tbl> VERSION AS OF <n>`` and ``<tbl> TIMESTAMP AS OF
        '<ts>'`` rewrite to temp views over the native readers'
        version_as_of / timestamp_as_of (delta) or snapshot_id /
        as_of_timestamp_ms (iceberg) options — the SQL face of the
        time travel the replay readers already do.  Token-level;
        loud UnsupportedDialect when the name is an attachment of a
        non-time-travelable format; text untouched when the name is
        not an attachment (Spark then raises its own error)."""
        if not _re.search(
            r"\b(VERSION|TIMESTAMP)\s+AS\s+OF\b", query, _re.IGNORECASE
        ):
            return query
        from pg_analytics_spark.dialect import (
            UnsupportedDialect,
            _next_code,
            _tokenize,
        )
        from pg_analytics_spark.sources import load_source

        by_lower = {n.lower(): n for n in self._attachments}
        toks = _tokenize(query)
        out = []
        i = 0
        changed = False
        while i < len(toks):
            kind, text = toks[i]
            if kind == "word" and text.lower() in by_lower:
                text = by_lower[text.lower()]  # canonical attachment name
                j1 = _next_code(toks, i)
                j2 = _next_code(toks, j1) if j1 < len(toks) else len(toks)
                j3 = _next_code(toks, j2) if j2 < len(toks) else len(toks)
                j4 = _next_code(toks, j3) if j3 < len(toks) else len(toks)
                words = []
                for j in (j1, j2, j3):
                    words.append(
                        toks[j][1].upper()
                        if j < len(toks) and toks[j][0] == "word"
                        else None
                    )
                mode = None
                if words[:3] == ["VERSION", "AS", "OF"]:
                    mode = "version"
                elif words[:3] == ["TIMESTAMP", "AS", "OF"]:
                    mode = "timestamp"
                if mode and j4 < len(toks):
                    att = self._attachments[text]
                    if att.format not in ("delta", "iceberg"):
                        raise UnsupportedDialect(
                            f"VERSION/TIMESTAMP AS OF: {text} is a "
                            f"{att.format} attachment — time travel "
                            "needs a delta or iceberg table"
                        )
                    val = toks[j4][1]
                    if mode == "version":
                        if val[:1] in "'\"":
                            # VERSION AS OF '<name>': a named snapshot
                            # ref (iceberg tag/branch)
                            if att.format != "iceberg":
                                raise UnsupportedDialect(
                                    "VERSION AS OF '<name>': named "
                                    "refs are an iceberg feature"
                                )
                            opts = {"ref": val.strip("'\"")}
                        else:
                            n = int(val)
                            opts = (
                                {"version_as_of": n}
                                if att.format == "delta"
                                else {"snapshot_id": n}
                            )
                    else:
                        ts = val.strip("'\"")
                        if att.format == "delta":
                            opts = {"timestamp_as_of": ts}
                        else:
                            import datetime as _dt

                            ms = int(
                                _dt.datetime.fromisoformat(ts).timestamp()
                                * 1000
                            )
                            opts = {"as_of_timestamp_ms": ms}
                    self._fs_view_seq += 1
                    view = f"__tt_{text}_{self._fs_view_seq}"
                    load_source(
                        self.spark, att.files, att.format,
                        {**(att.options or {}), **opts},
                    ).createOrReplaceTempView(view)
                    out.append(("word", view))
                    i = j4 + 1
                    changed = True
                    continue
            out.append(toks[i])
            i += 1
        return "".join(t for _, t in out) if changed else query

    def _try_union_by_name(self, query: str) -> DataFrame | None:
        """DuckDB ``q1 UNION [ALL] BY NAME q2 [ORDER BY …] [LIMIT …]``
        — Spark SQL has no BY NAME syntax, but the DataFrame API has
        its exact semantics: columns matched by NAME, names missing on
        one side fill with NULL (unionByName allowMissingColumns),
        result column order = first appearance.  Token-level detection
        at paren depth 0 (strings/comments/subqueries never
        false-match); segments execute through Engine.sql recursively
        (so each side keeps the full dialect surface), and a trailing
        top-level ORDER BY/LIMIT applies to the WHOLE union (the SQL
        grammar rule).

        ALL depth-0 set operators split — not just the BY NAME ones —
        and the chain folds LEFT-ASSOCIATIVELY with SQL dedup rules
        (UNION/EXCEPT dedup, ALL variants keep): ``a UNION BY NAME b
        EXCEPT c`` executes as ``(a ∪ b) − c``, never ``a ∪ (b − c)``.
        INTERSECT binds TIGHTER than UNION/EXCEPT in both engines, so
        a depth-0 INTERSECT co-occurring with BY NAME raises
        UnsupportedDialect (parenthesize) instead of silently folding
        at the wrong precedence."""
        if not _re.search(r"\bBY\s+NAME\b", query, _re.IGNORECASE):
            return None  # fast reject — token scan only when plausible
        from pg_analytics_spark.dialect import (
            UnsupportedDialect,
            _depths,
            _next_code,
            _prev_code,
            _tokenize,
        )

        toks = _tokenize(query)
        depths = _depths(toks)
        all_toks, all_depths = toks, depths  # pre-CTE-strip, for the
        # nested-BY-NAME loudness check below
        # a leading WITH clause scopes over the WHOLE set expression —
        # carry it as a prefix into every segment so CTE names resolve
        # on both sides of the split
        prefix = ""
        first = _next_code(toks, -1)
        if (
            first < len(toks)
            and toks[first][0] == "word"
            and toks[first][1].upper() == "WITH"
        ):
            i = first
            end_defs = None
            while True:
                name_i = _next_code(toks, i)
                as_i = _next_code(toks, name_i)
                par_i = _next_code(toks, as_i)
                if (
                    par_i >= len(toks)
                    or toks[as_i][0] != "word"
                    or toks[as_i][1].upper() != "AS"
                    or toks[par_i] != ("op", "(")
                ):
                    break  # not a recognizable CTE list — no prefix
                d = 0
                j = par_i
                while j < len(toks):
                    if toks[j] == ("op", "("):
                        d += 1
                    elif toks[j] == ("op", ")"):
                        d -= 1
                        if d == 0:
                            break
                    j += 1
                nxt = _next_code(toks, j)
                if nxt < len(toks) and toks[nxt] == ("op", ","):
                    i = nxt
                    continue
                end_defs = j
                break
            if end_defs is not None:
                prefix = "".join(t for _, t in toks[: end_defs + 1]) + " "
                toks = toks[end_defs + 1:]
                depths = _depths(toks)
        splits = []  # (start_tok, end_tok, op, all_flag, by_name)
        any_by_name = False
        has_intersect = False
        i = 0
        while i < len(toks):
            k, t = toks[i]
            u = t.upper() if k == "word" else ""
            if u in ("UNION", "EXCEPT", "INTERSECT") and depths[i] == 0:
                # `SELECT * EXCEPT(col)` (Spark 3.4+) is not a set op —
                # its previous code token is `*`
                p = _prev_code(toks, i)
                if u == "EXCEPT" and p >= 0 and toks[p] == ("op", "*"):
                    i += 1
                    continue
                end = i
                j = _next_code(toks, i)
                all_flag = False
                if (
                    j < len(toks)
                    and toks[j][0] == "word"
                    and toks[j][1].upper() == "ALL"
                ):
                    all_flag = True
                    end = j
                    j = _next_code(toks, j)
                by_name = False
                if (
                    j < len(toks)
                    and toks[j][0] == "word"
                    and toks[j][1].upper() == "BY"
                ):
                    j2 = _next_code(toks, j)
                    if (
                        j2 < len(toks)
                        and toks[j2][0] == "word"
                        and toks[j2][1].upper() == "NAME"
                    ):
                        by_name = True
                        end = j2
                if by_name and u != "UNION":
                    raise UnsupportedDialect(
                        f"{u} BY NAME is not supported — only UNION "
                        "[ALL] BY NAME; align columns explicitly"
                    )
                any_by_name = any_by_name or by_name
                has_intersect = has_intersect or u == "INTERSECT"
                splits.append((i, end, u, all_flag, by_name))
                i = end + 1
                continue
            i += 1
        if not any_by_name:
            # a BY NAME buried INSIDE a subquery/CTE (depth > 0) has no
            # depth-0 split to route through — fail with guidance, not
            # Spark's raw parse error (loud-or-green)
            for idx, (k, t) in enumerate(all_toks):
                if (
                    k == "word"
                    and t.upper() == "BY"
                    and all_depths[idx] > 0
                ):
                    nx = _next_code(all_toks, idx)
                    pv = _prev_code(all_toks, idx)
                    if (
                        nx < len(all_toks)
                        and all_toks[nx][0] == "word"
                        and all_toks[nx][1].upper() == "NAME"
                        and pv >= 0
                        and all_toks[pv][0] == "word"
                        and all_toks[pv][1].upper() in ("UNION", "ALL")
                    ):
                        raise UnsupportedDialect(
                            "UNION BY NAME inside a subquery or CTE "
                            "definition: the rewrite routes top-level "
                            "set expressions only — hoist the BY NAME "
                            "union to the top level, or attach each "
                            "side as its own relation first"
                        )
            return None  # no BY NAME anywhere — Spark SQL handles it
        if has_intersect:
            raise UnsupportedDialect(
                "INTERSECT mixed with UNION BY NAME at the top level: "
                "INTERSECT binds tighter than UNION — parenthesize the "
                "INTERSECT side explicitly"
            )
        segs: list[tuple[str, str, bool, bool]] = []
        prev = 0
        for s, e, op, af, bn in splits:
            segs.append(
                ("".join(t for _, t in toks[prev:s]).strip(), op, af, bn)
            )
            prev = e + 1
        last = toks[prev:]
        last_depths = _depths(last)
        # trailing top-level ORDER BY / LIMIT / OFFSET belongs to the
        # whole union
        cut = None
        for x, (k, t) in enumerate(last):
            if (
                k == "word"
                and last_depths[x] == 0
                and t.upper() in ("ORDER", "LIMIT", "OFFSET")
            ):
                cut = x
                break
        if cut is None:
            last_text = "".join(t for _, t in last).strip().rstrip("; \n")
            suffix = ""
        else:
            last_text = "".join(t for _, t in last[:cut]).strip()
            suffix = "".join(t for _, t in last[cut:]).strip().rstrip("; \n")

        def _run(seg: str) -> DataFrame:
            seg = seg.strip()
            if seg.startswith("(") and seg.endswith(")"):
                inner_toks = _tokenize(seg)
                inner_d = _depths(inner_toks)
                # strip only a paren pair wrapping the WHOLE segment
                if all(
                    d >= 1
                    for j, d in enumerate(inner_d[1:-1], start=1)
                    if inner_toks[j][0] not in ("ws", "comment")
                ):
                    seg = seg[1:-1].strip()
            return self.sql(seg)

        acc = _run(prefix + segs[0][0])
        ops = [(op, af, bn) for _, op, af, bn in segs]
        rest = [t for t, _, _, _ in segs[1:]] + [last_text]
        for (op, af, bn), seg in zip(ops, rest):
            side = _run(prefix + seg)
            if op == "UNION" and bn:
                acc = acc.unionByName(side, allowMissingColumns=True)
                if not af:
                    acc = acc.dropDuplicates()
            elif op == "UNION":
                acc = acc.union(side)
                if not af:
                    acc = acc.dropDuplicates()
            else:  # EXCEPT — left-associative, SQL dedup rule
                acc = acc.exceptAll(side) if af else acc.subtract(side)
        if suffix:
            name = f"__union_by_name_{id(acc) & 0xFFFF:x}"
            acc.createOrReplaceTempView(name)
            return self.sql(f"SELECT * FROM {name} {suffix}")
        return acc

    def _vacuum_statement(self, m) -> DataFrame:
        """``VACUUM <attached delta table> [RETAIN n HOURS]`` —
        physical deletion of data files unreferenced by the current
        version and older than the retention window (default 168h,
        Delta's 7 days), through sources/delta_write.vacuum_delta.
        The log is never touched.  Returns one metrics row."""
        from pg_analytics_spark.sources.delta_write import vacuum_delta

        att = self._dml_delta_attachment(m.group("name"), "VACUUM")
        hours = float(m.group("hours")) if m.group("hours") else 168.0
        res = vacuum_delta(att.files[0], retention_hours=hours)
        return self.spark.createDataFrame(
            [(int(res["files_deleted"]), int(res["bytes_deleted"]))],
            "files_deleted bigint, bytes_deleted bigint",
        )

    def _copy_from_statement(self, m) -> DataFrame:
        """DuckDB ``COPY <attached lake table> FROM '<file>' [(FORMAT
        csv|parquet|json[, HEADER][, DELIMITER 'c'])]`` — load through
        the source layer and append via the INSERT BY NAME path for
        header-carrying formats (column names bind), positionally for
        headerless CSV.  The INSERT path's full coercion +
        null-introduction checks apply; the attachment refreshes to
        the new snapshot.  Returns a one-row count relation."""
        from pg_analytics_spark.sources import load_source

        att = self._dml_delta_attachment(
            m.group("name"), "COPY FROM", formats=("delta", "iceberg")
        )
        path = m.group("path")
        opt_text = (m.group("opts") or "").strip()
        fmt = None
        src_opts: dict = {}
        by_name = True
        if opt_text:
            for part in opt_text.split(","):
                kv = part.strip().split(None, 1)
                if not kv:
                    continue
                k = kv[0].lower()
                v = kv[1].strip().strip("'\"") if len(kv) > 1 else None
                if k == "format":
                    fmt = (v or "").lower()
                elif k == "header":
                    src_opts["header"] = (
                        "false" if v and v.lower() in ("0", "false") else "true"
                    )
                elif k in ("delimiter", "delim", "sep"):
                    src_opts["sep"] = v
        if fmt is None:
            low = path.lower()
            fmt = (
                "csv" if low.endswith((".csv", ".csv.gz", ".tsv")) else
                "json" if low.endswith((".json", ".ndjson", ".jsonl")) else
                "parquet"
            )
        if fmt == "csv":
            if "header" not in src_opts:
                src_opts["header"] = "true"  # DuckDB auto-detects; assume
            by_name = src_opts["header"] == "true"
            src_opts.setdefault("inferSchema", "true")
        df = load_source(self.spark, [path], fmt, src_opts or None)
        self._fs_view_seq += 1
        view = f"__copy_src_{self._fs_view_seq}"
        df.createOrReplaceTempView(view)
        stmt = (
            f"INSERT INTO {att.name} BY NAME SELECT * FROM {view}"
            if by_name
            else f"INSERT INTO {att.name} SELECT * FROM {view}"
        )
        return self.sql(stmt)

    def _describe_history_statement(self, m) -> DataFrame:
        """Delta-SQL ``DESCRIBE HISTORY <tbl>`` on attached lake
        tables: one row per version, newest first — (version,
        timestamp, operation, operationParameters) from the Delta
        log's commitInfo actions (mtime fallback for commits without
        one) or the Iceberg metadata's snapshot list.  The discovery
        companion to ``VERSION AS OF``."""
        import datetime as _dt
        import json as _json
        import os as _os

        att = self._dml_delta_attachment(
            m.group("name"), "DESCRIBE HISTORY", formats=("delta", "iceberg")
        )
        rows = []
        if att.format == "delta":
            log_dir = _os.path.join(att.files[0], "_delta_log")
            for f in sorted(_os.listdir(log_dir)):
                if not (f.endswith(".json") and f[:20].isdigit()):
                    continue
                v = int(f[:20])
                ts_ms = int(_os.path.getmtime(_os.path.join(log_dir, f)) * 1000)
                op, params = None, None
                with open(_os.path.join(log_dir, f)) as fh:
                    for line in fh:
                        if not line.strip():
                            continue
                        ci = _json.loads(line).get("commitInfo")
                        if ci:
                            ts_ms = int(ci.get("timestamp", ts_ms))
                            op = ci.get("operation")
                            params = _json.dumps(
                                ci.get("operationParameters") or {},
                                sort_keys=True,
                            )
                            break
                rows.append((v, ts_ms, op, params))
        else:
            from pg_analytics_spark.sources.iceberg_write import (
                _latest_metadata,
            )

            _v, meta = _latest_metadata(
                _os.path.join(att.files[0], "metadata")
            )
            for s in meta.get("snapshots", []):
                rows.append(
                    (
                        int(s["snapshot-id"]),
                        int(s["timestamp-ms"]),
                        (s.get("summary") or {}).get("operation"),
                        _json.dumps(
                            {
                                k: v
                                for k, v in (s.get("summary") or {}).items()
                                if k != "operation"
                            },
                            sort_keys=True,
                        ),
                    )
                )
        rows.sort(key=lambda r: -r[0] if att.format == "delta" else -r[1])
        return self.spark.createDataFrame(
            [
                (
                    v,
                    _dt.datetime.utcfromtimestamp(ts / 1000.0),
                    op,
                    params,
                )
                for v, ts, op, params in rows
            ],
            "version bigint, timestamp timestamp, operation string, "
            "operationParameters string",
        )

    def _describe_detail_statement(self, m) -> DataFrame:
        """Delta-SQL ``DESCRIBE DETAIL <tbl>`` on attached delta
        tables: the one-row summary (format, id, location, times,
        partition columns, numFiles, sizeInBytes, properties,
        protocol versions) from one metadata-sized log replay —
        the introspection companion of DESCRIBE HISTORY."""
        import datetime as _dt
        import json as _json

        from pg_analytics_spark.sources.delta_write import (
            describe_detail_delta,
        )

        att = self._dml_delta_attachment(
            m.group("name"), "DESCRIBE DETAIL", formats=("delta",)
        )
        d = describe_detail_delta(att.files[0])
        to_ts = (
            lambda ms: _dt.datetime.utcfromtimestamp(ms / 1000.0)
            if ms is not None
            else None
        )
        return self.spark.createDataFrame(
            [
                (
                    d["format"],
                    d["id"],
                    d["location"],
                    to_ts(d["createdAt"]),
                    to_ts(d["lastModified"]),
                    d["partitionColumns"],
                    d["numFiles"],
                    d["sizeInBytes"],
                    _json.dumps(d["properties"], sort_keys=True),
                    d["minReaderVersion"],
                    d["minWriterVersion"],
                )
            ],
            "format string, id string, location string, "
            "createdAt timestamp, lastModified timestamp, "
            "partitionColumns array<string>, numFiles bigint, "
            "sizeInBytes bigint, properties string, "
            "minReaderVersion int, minWriterVersion int",
        )

    def _alter_ref_statement(self, m) -> DataFrame:
        """``ALTER TABLE t CREATE TAG|BRANCH name [AS OF VERSION
        <snapshot_id>]`` / ``DROP TAG|BRANCH name`` on attached
        iceberg tables — snapshot refs (iceberg_write.
        alter_iceberg_refs); read back with ``t VERSION AS OF
        '<name>'``."""
        from pg_analytics_spark.sources.iceberg_write import (
            alter_iceberg_refs,
        )

        att = self._dml_delta_attachment(
            m.group("name"), "CREATE/DROP TAG|BRANCH",
            formats=("iceberg",),
        )
        if m.group("dname"):
            r = alter_iceberg_refs(att.files[0], drop=m.group("dname"))
        else:
            kw = (
                {"tag": m.group("cname")}
                if m.group("ctype").upper() == "TAG"
                else {"branch": m.group("cname")}
            )
            sid = m.group("sid")
            r = alter_iceberg_refs(
                att.files[0],
                snapshot_id=int(sid) if sid else None,
                **kw,
            )
        return self.spark.createDataFrame(
            [(r["name"], r["type"], int(r["snapshot_id"]), int(r["version"]))],
            "name string, type string, snapshot_id bigint, version bigint",
        )

    def _alter_constraint_statement(self, m) -> DataFrame:
        """``ALTER TABLE t ADD CONSTRAINT n CHECK (expr)`` /
        ``DROP CONSTRAINT n`` on attached delta tables — the protocol's
        checkConstraints writer feature (delta_write.
        alter_delta_constraints): ADD validates every existing row,
        stores delta.constraints.<n>, bumps minWriterVersion to 3;
        every subsequent write path enforces it."""
        from pg_analytics_spark.sources.delta_write import (
            alter_delta_constraints,
        )

        att = self._dml_delta_attachment(
            m.group("name"), "ADD/DROP CONSTRAINT", formats=("delta",)
        )
        if m.group("add_name"):
            r = alter_delta_constraints(
                att.files[0],
                add=(m.group("add_name"), m.group("expr").strip()),
                spark=self.spark,
            )
        else:
            r = alter_delta_constraints(
                att.files[0], drop=m.group("drop_name")
            )
        return self.spark.createDataFrame(
            [(r["operation"], r["name"], int(r["version"]))],
            "operation string, name string, version bigint",
        )

    def _convert_delta_statement(self, m) -> DataFrame:
        """``CONVERT TO DELTA [parquet.]`/path` [PARTITIONED BY (col
        type, …)]`` — in-place zero-copy conversion of a parquet
        directory (delta_write.convert_parquet_to_delta); one metrics
        row."""
        from pg_analytics_spark.sources.delta_write import (
            convert_parquet_to_delta,
        )

        parts = m.group("parts")
        decls = (
            [p.strip() for p in parts.split(",") if p.strip()]
            if parts
            else None
        )
        r = convert_parquet_to_delta(
            self.spark, m.group("path").strip(), partition_by=decls
        )
        return self.spark.createDataFrame(
            [(int(r["files"]), int(r["rows"]), int(r["version"]))],
            "files bigint, rows bigint, version bigint",
        )

    def _call_procedure_statement(self, m) -> DataFrame:
        """Iceberg maintenance procedures in the Spark-runtime CALL
        shape (``CALL [catalog.][system.]rewrite_manifests('t')``,
        ``remove_orphan_files('t')``, ``expire_snapshots('t'[, n])``)
        — routed to the native writer's maintenance actions; one
        metrics row each."""
        proc = m.group("proc").lower()
        att = self._dml_delta_attachment(
            m.group("name"), f"CALL {proc}", formats=("iceberg",)
        )
        path = att.files[0]
        if proc == "rewrite_manifests":
            from pg_analytics_spark.sources.iceberg_write import (
                rewrite_manifests_iceberg,
            )

            r = rewrite_manifests_iceberg(path)
            return self.spark.createDataFrame(
                [
                    (
                        int(r["manifests_before"]),
                        int(r["manifests_after"]),
                        int(r["version"]),
                    )
                ],
                "manifests_before bigint, manifests_after bigint, "
                "version bigint",
            )
        if proc == "remove_orphan_files":
            from pg_analytics_spark.sources.iceberg_write import (
                remove_orphan_files_iceberg,
            )

            hours = float(m.group("arg")) if m.group("arg") else 72.0
            r = remove_orphan_files_iceberg(path, older_than_hours=hours)
            return self.spark.createDataFrame(
                [
                    (
                        int(r["files_deleted"]),
                        int(r["bytes_deleted"]),
                        int(r["files_kept"]),
                    )
                ],
                "files_deleted bigint, bytes_deleted bigint, "
                "files_kept bigint",
            )
        from pg_analytics_spark.sources.iceberg_write import (
            expire_iceberg_snapshots,
        )

        keep = int(m.group("arg")) if m.group("arg") else 1
        r = expire_iceberg_snapshots(self.spark, path, retain_last=keep)
        self.attach(att.name, att.files, att.format, att.options, att.columns)
        return self.spark.createDataFrame(
            [
                (
                    int(r["snapshots_expired"]),
                    int(r["files_deleted"]),
                    int(r["version"]),
                )
            ],
            "snapshots_expired bigint, files_deleted bigint, version bigint",
        )

    def _shallow_clone_statement(self, m) -> DataFrame:
        """``CREATE TABLE t2 SHALLOW CLONE t1 [VERSION AS OF n]
        LOCATION 'path'`` — a zero-copy metadata fork of an attached
        delta table (sources/delta_write.clone_delta), attached under
        the new name.  Returns one metrics row."""
        from pg_analytics_spark.sources.delta_write import clone_delta

        att = self._dml_delta_attachment(
            m.group("source"), "SHALLOW CLONE", formats=("delta",)
        )
        version = m.group("version")
        res = clone_delta(
            att.files[0],
            m.group("location"),
            int(version) if version is not None else None,
        )
        self.attach(m.group("target"), [m.group("location")], "delta")
        return self.spark.createDataFrame(
            [
                (
                    int(res["source_version"]),
                    int(res["files"]),
                    int(res["version"]),
                )
            ],
            "source_version bigint, files bigint, version bigint",
        )

    def _describe_statement(self, m) -> DataFrame:
        """DuckDB ``DESCRIBE <tbl>`` / ``DESCRIBE <query>`` — one row
        per column in DuckDB's shape (column_name, column_type, null,
        key, default, extra); the query form describes the RESULT
        schema without executing the query (Spark's analysis phase
        only).  Spark's own EXTENDED/FORMATTED/HISTORY forms pass
        through untouched."""
        body = m.group("body").strip()
        if _re.match(r"^(SELECT|WITH|FROM|VALUES)\b", body, _re.IGNORECASE):
            schema = self.sql(body).schema
        else:
            schema = self.spark.table(body).schema
        return self.spark.createDataFrame(
            [
                (
                    f.name,
                    f.dataType.simpleString().upper(),
                    "YES" if f.nullable else "NO",
                    None,
                    None,
                    None,
                )
                for f in schema.fields
            ],
            "column_name string, column_type string, null string, "
            "key string, default string, extra string",
        )

    def _restore_statement(self, m) -> DataFrame:
        """``RESTORE [TABLE] <attached lake table> TO VERSION AS OF n``
        — Delta: a new commit reverting the active file set (and
        schema) to version n's (sources/delta_write.restore_delta);
        Iceberg: rollback_to_snapshot, pure metadata (n is the
        snapshot id).  History is preserved either way: restore is
        itself a version.  Returns one metrics row."""
        att = self._dml_delta_attachment(
            m.group("name"), "RESTORE", formats=("delta", "iceberg")
        )
        if att.format == "iceberg":
            from pg_analytics_spark.sources.iceberg_write import (
                rollback_iceberg,
            )

            res_i = rollback_iceberg(
                self.spark, att.files[0], int(m.group("version"))
            )
            self.attach(
                att.name, att.files, att.format, att.options, att.columns
            )
            return self.spark.createDataFrame(
                [(int(res_i["rolled_back_to"]), int(res_i["version"]))],
                "rolled_back_to bigint, version int",
            )
        from pg_analytics_spark.sources.delta_write import restore_delta

        res = restore_delta(
            self.spark, att.files[0], int(m.group("version"))
        )
        self.attach(att.name, att.files, att.format, att.options, att.columns)
        return self.spark.createDataFrame(
            [
                (
                    int(res["restored_to"]),
                    int(res["files_removed"]),
                    int(res["files_readded"]),
                    int(res["version"]),
                )
            ],
            "restored_to int, files_removed int, files_readded int, "
            "version int",
        )

    def _show_props_statement(self, m) -> DataFrame:
        """``SHOW TBLPROPERTIES t`` on attached delta/iceberg tables —
        (key, value) rows from the Delta metaData configuration or the
        Iceberg metadata properties map, ordered by key."""
        import os

        att = self._dml_delta_attachment(
            m.group("name"), "SHOW TBLPROPERTIES",
            formats=("delta", "iceberg"),
        )
        if att.format == "iceberg":
            from pg_analytics_spark.sources.iceberg_write import (
                _latest_metadata,
            )

            _v, meta_i = _latest_metadata(
                os.path.join(att.files[0], "metadata")
            )
            props = dict((meta_i or {}).get("properties") or {})
        else:
            from pg_analytics_spark.sources.delta import _replay_log

            _a, meta_d = _replay_log(
                os.path.join(att.files[0], "_delta_log")
            )
            props = dict((meta_d or {}).get("configuration") or {})
        rows = sorted((str(k), str(v)) for k, v in props.items())
        if not rows:
            return self.spark.createDataFrame([], "key string, value string")
        return self.spark.createDataFrame(rows, "key string, value string")

    def _alter_props_statement(self, m) -> DataFrame:
        """``ALTER TABLE t SET TBLPROPERTIES ('k'='v', …)`` / ``UNSET
        TBLPROPERTIES ('k', …)`` on attached delta/iceberg tables —
        metadata-only commits through the native writers (Delta:
        configuration, the delta-spark property contract — e.g.
        delta.enableDeletionVectors flips DML to merge-on-read;
        Iceberg: the properties map).  Returns one metrics row."""
        from pg_analytics_spark.dialect import UnsupportedDialect

        att = self._dml_delta_attachment(
            m.group("name"), "ALTER TABLE", formats=("delta", "iceberg")
        )
        body = m.group("body")
        items = [
            s.strip() for s in _re.split(r",(?=(?:[^']*'[^']*')*[^']*$)", body)
            if s.strip()
        ]
        set_props: dict[str, str] = {}
        unset_props: list[str] = []
        unset = m.group("verb").upper() == "UNSET"
        for it in items:
            if unset:
                unset_props.append(it.strip("'\""))
                continue
            kv = _re.match(
                r"^'(?P<k>[^']+)'\s*=\s*'(?P<v>[^']*)'$", it
            ) or _re.match(
                r'^"(?P<k>[^"]+)"\s*=\s*"(?P<v>[^"]*)"$', it
            )
            if not kv:
                raise UnsupportedDialect(
                    f"SET TBLPROPERTIES: expected 'key' = 'value', got "
                    f"{it!r}"
                )
            set_props[kv.group("k")] = kv.group("v")
        if att.format == "iceberg":
            from pg_analytics_spark.sources.iceberg_write import (
                alter_iceberg_properties,
            )

            res = alter_iceberg_properties(
                att.files[0],
                set_props or None,
                unset_props or None,
            )
        else:
            from pg_analytics_spark.sources.delta_write import (
                alter_delta_properties,
            )

            res = alter_delta_properties(
                att.files[0],
                set_props or None,
                unset_props or None,
            )
        self.attach(att.name, att.files, att.format, att.options, att.columns)
        return self.spark.createDataFrame(
            [(m.group("verb").upper(), int(res["version"]))],
            "operation string, version int",
        )

    def _alter_partition_statement(self, m) -> DataFrame:
        """``ALTER TABLE t REPLACE PARTITION BY (month(d), bucket(4,
        k), …)`` — Iceberg partition evolution as one metadata
        version; empty parens evolve to unpartitioned.  Old files
        keep their spec (per-manifest pruning); only the statement's
        table format is iceberg — Delta has no spec evolution."""
        att = self._dml_delta_attachment(
            m.group("name"), "REPLACE PARTITION BY", formats=("iceberg",)
        )
        from pg_analytics_spark.sources.iceberg_write import (
            alter_iceberg_partition,
        )

        body = m.group("body").strip()
        # split on commas NOT inside transform parens: bucket(4, g)
        parts = [
            p.strip()
            for p in _re.split(r",(?![^(]*\))", body)
            if p.strip()
        ] if body else []
        res = alter_iceberg_partition(att.files[0], parts)
        self.attach(att.name, att.files, att.format, att.options, att.columns)
        return self.spark.createDataFrame(
            [(int(res["spec_id"]), int(res["version"]))],
            "spec_id int, version int",
        )

    def _alter_statement(self, m) -> DataFrame:
        """``ALTER TABLE <attached lake table> ADD COLUMN c type |
        RENAME COLUMN a TO b | DROP COLUMN c`` — schema evolution as a
        metadata-only commit through the native writers
        (sources/delta_write.alter_delta: column-mapping upgrade on
        first rename/drop; sources/iceberg_write.alter_iceberg:
        field-id evolution + name-mapping).  The attachment re-reads
        so the next query sees the evolved schema.  Returns one
        metrics row."""
        att = self._dml_delta_attachment(
            m.group("name"), "ALTER TABLE", formats=("delta", "iceberg")
        )
        kw: dict = {}
        if m.group("add_col"):
            kw["add"] = (m.group("add_col"), m.group("add_type").strip())
        elif m.group("ren_old"):
            kw["rename"] = (m.group("ren_old"), m.group("ren_new"))
        else:
            kw["drop"] = m.group("drop_col")
        if att.format == "iceberg":
            from pg_analytics_spark.sources.iceberg_write import (
                alter_iceberg,
            )

            res = alter_iceberg(att.files[0], **kw)
        else:
            from pg_analytics_spark.sources.delta_write import alter_delta

            res = alter_delta(att.files[0], **kw)
        self.attach(att.name, att.files, att.format, att.options, att.columns)
        return self.spark.createDataFrame(
            [(str(res["operation"]), int(res["version"]))],
            "operation string, version int",
        )

    def _optimize_statement(self, m) -> DataFrame:
        """``OPTIMIZE <attached delta table> [ZORDER BY (c1, c2)]`` —
        bin-packing compaction (optionally Morton-clustered on the
        named columns) committed as one overwrite version, through
        sources/delta_write.compact_delta.  Returns one metrics row."""
        from pg_analytics_spark.sources.delta_write import compact_delta

        att = self._dml_delta_attachment(m.group("name"), "OPTIMIZE")
        cols = [
            c.strip()
            for c in (m.group("cols") or "").split(",")
            if c.strip()
        ]
        res = compact_delta(
            self.spark, att.files[0], zorder_by=cols or None
        )
        self.attach(att.name, att.files, att.format, att.options, att.columns)
        return self.spark.createDataFrame(
            [
                (
                    int(res["files_before"]),
                    int(res["files_after"]),
                    int(res["bytes"]),
                    int(res["version"]),
                )
            ],
            "files_before int, files_after int, bytes bigint, version int",
        )

    def _analyze_statement(self, m) -> DataFrame:
        """``ANALYZE <attached iceberg table> [(c1, c2, …)]`` — the
        runtime's compute_table_stats analog: KMV distinct sketches
        per column into a real Puffin statistics file, the metadata
        ``statistics`` entry committed put-if-absent
        (sources/iceberg_puffin.compute_statistics_iceberg).  Columns
        default to every top-level primitive column.  Returns the
        statistics relation (what ``iceberg_statistics('t')`` reads
        back)."""
        from pg_analytics_spark.sources.iceberg_puffin import (
            compute_statistics_iceberg,
            iceberg_statistics,
        )

        att = self._dml_delta_attachment(
            m.group("name"), "ANALYZE", formats=("iceberg",)
        )
        cols = [
            c.strip()
            for c in (m.group("cols") or "").split(",")
            if c.strip()
        ]
        if not cols:
            from pg_analytics_spark.sources import load_source

            df = load_source(self.spark, att.files[0], "iceberg")
            cols = [
                f.name
                for f in df.schema.fields
                if f.dataType.typeName()
                in ("long", "integer", "short", "string", "date",
                    "double", "float", "decimal", "boolean")
            ]
        compute_statistics_iceberg(self.spark, att.files[0], cols)
        self.attach(att.name, att.files, att.format, att.options, att.columns)
        return iceberg_statistics(self.spark, att.files[0])

    def _dml_metrics(self, res: dict) -> DataFrame:
        return self.spark.createDataFrame(
            [
                (
                    int(res["rows_written"]),
                    int(res["files_added"]),
                    int(res["files_removed"]),
                    int(res["version"]),
                )
            ],
            "rows_written bigint, files_added int, files_removed int, "
            "version int",
        )

    def _create_macro_statement(self, m) -> DataFrame:
        """DuckDB ``CREATE MACRO name(a, b) AS a + b`` (scalar) and
        ``… AS TABLE SELECT …`` (table) — stored as SQL templates;
        later queries expand ``name(x, y)`` to the parenthesized body
        with arguments substituted (token-level, so strings/comments
        never false-match).  Table macros expand only in relation
        position (FROM/JOIN/comma) as ``(query) name`` — a trailing
        user alias takes precedence.  DuckDB semantics: macro
        expansion happens at bind time, which is exactly a text
        template; default-valued parameters are rejected with a clear
        message rather than mis-expanded."""
        params = [
            p.strip()
            for p in (m.group("params") or "").split(",")
            if p.strip()
        ]
        for p in params:
            if not _re.fullmatch(r"[A-Za-z_]\w*", p):
                raise EngineError(
                    f"macro parameter {p!r} unsupported — plain "
                    "positional parameters only (no defaults)"
                )
        name = m.group("name").lower()
        from pg_analytics_spark.dialect import _KEYWORDS

        if name in _KEYWORDS:
            # DuckDB rejects reserved macro names at CREATE time too —
            # expansion matches every `word(` occurrence, so a macro
            # named `over`/`exists` would corrupt unrelated statements
            raise EngineError(
                f"macro name {name!r} is a reserved SQL keyword"
            )
        self._macros[name] = (
            params, m.group("body").strip(), bool(m.group("table"))
        )
        return self.spark.createDataFrame(
            [(name, len(params))], "macro string, n_params int"
        )

    def _expand_macros(self, query: str) -> str:
        """Expand stored macros in ``query`` (token-level, innermost
        calls first via fixpoint iteration, depth-capped so a
        self-recursive macro errors instead of hanging)."""
        from pg_analytics_spark.dialect import (
            _KEYWORDS,
            _next_code,
            _prev_code,
            _tokenize,
        )

        for _round in range(10):
            tokens = _tokenize(query)
            out: list = []
            i, n = 0, len(tokens)
            changed = False
            while i < n:
                kind, text = tokens[i]
                mac = (
                    self._macros.get(text.lower())
                    if kind == "word"
                    else None
                )
                if mac is not None:
                    # `other.keyed(x)` is a qualified call to a
                    # DIFFERENT function that merely shares the macro's
                    # name — expanding it would produce `other.((x)+1)`
                    pidx = _prev_code(out, len(out))
                    if pidx >= 0 and out[pidx] == ("op", "."):
                        mac = None
                if mac is None:
                    out.append(tokens[i])
                    i += 1
                    continue
                j = _next_code(tokens, i)
                if j >= n or tokens[j] != ("op", "("):
                    out.append(tokens[i])
                    i += 1
                    continue
                # collect depth-aware comma-separated argument texts
                params, body, is_table = mac
                depth, brackets, args, cur = 0, 0, [], []
                k = j
                while k < n:
                    tk = tokens[k]
                    if tk == ("op", "("):
                        depth += 1
                        if depth > 1:
                            cur.append(tk)
                    elif tk == ("op", ")"):
                        depth -= 1
                        if depth == 0:
                            break
                        cur.append(tk)
                    elif tk[0] == "op" and tk[1] in ("[", "{"):
                        brackets += 1
                        cur.append(tk)
                    elif tk[0] == "op" and tk[1] in ("]", "}"):
                        brackets -= 1
                        cur.append(tk)
                    elif tk == ("op", ",") and depth == 1 and brackets == 0:
                        args.append(cur)
                        cur = []
                    else:
                        cur.append(tk)
                    k += 1
                if k >= n:
                    out.append(tokens[i])
                    i += 1
                    continue
                args.append(cur)
                arg_texts = [
                    "".join(t for _, t in a).strip() for a in args
                ]
                if arg_texts == [""]:
                    arg_texts = []
                if len(arg_texts) != len(params):
                    raise EngineError(
                        f"macro {text!r} expects {len(params)} "
                        f"argument(s), got {len(arg_texts)}"
                    )
                sub = {
                    p.lower(): f"({a})" for p, a in zip(params, arg_texts)
                }
                body_out = []
                for bk, bt in _tokenize(body):
                    if bk == "word" and bt.lower() in sub:
                        body_out.append(("word", sub[bt.lower()]))
                    else:
                        body_out.append((bk, bt))
                expanded = "(" + "".join(t for _, t in body_out) + ")"
                if is_table:
                    # relation position only (FROM/JOIN/comma); the
                    # expansion is a subquery named like the macro —
                    # unless the statement supplies its own alias next
                    pidx = _prev_code(out, len(out))
                    in_from = pidx >= 0 and (
                        (
                            out[pidx][0] == "word"
                            and out[pidx][1].lower() in ("from", "join")
                        )
                        or out[pidx] == ("op", ",")
                    )
                    if not in_from:
                        raise EngineError(
                            f"table macro {text!r} used outside a FROM/"
                            "JOIN relation position"
                        )
                    nxt = _next_code(tokens, k)
                    has_alias = nxt < n and (
                        tokens[nxt][0] == "qident"
                        or (
                            tokens[nxt][0] == "word"
                            and (
                                tokens[nxt][1].lower() == "as"
                                or tokens[nxt][1].lower() not in _KEYWORDS
                            )
                        )
                    )
                    out.append(
                        ("word", expanded if has_alias else f"{expanded} {text}")
                    )
                else:
                    out.append(("word", expanded))
                i = k + 1
                changed = True
            query = "".join(t for _, t in out)
            if not changed:
                return query
        raise EngineError(
            "macro expansion did not terminate (recursive macro?)"
        )

    def _create_secret_statement(self, m) -> DataFrame:
        """DuckDB ``CREATE SECRET ( TYPE s3, KEY_ID 'k', … )`` text —
        the statements the reference generates from Postgres user
        mappings (src/duckdb/secret.rs:24-217) — parsed into
        :meth:`add_secret`.  ``SCOPE 's3://bucket/…'`` becomes the
        per-bucket scoping; keys are the reference's 22-option
        vocabulary, lowercased.  Returns the applied Hadoop conf pairs
        as a (key, value) DataFrame (inspectable, like DuckDB's own
        ``CREATE SECRET`` result)."""
        from pg_analytics_spark.dialect import _tokenize

        opts: dict = {}
        key: str | None = None
        for kind, text in _tokenize(m.group("body")):
            if kind in ("ws", "comment"):
                continue
            if kind == "op" and text == ",":
                key = None
                continue
            if key is None:
                if kind != "word":
                    raise EngineError(
                        f"CREATE SECRET: expected option name, got {text!r}"
                    )
                key = text.lower()
            else:
                if kind == "string":
                    opts[key] = text[1:-1].replace("''", "'")
                else:
                    opts[key] = text
                # keep `key` until the comma: multi-token values
                # (TYPE S3 — a bare word) end at the separator anyway
        secret_type = str(opts.pop("type", "s3"))
        scope = opts.pop("scope", None)
        bucket = None
        if scope:
            b = str(scope)
            for pre in ("s3://", "r2://", "gs://", "gcs://", "az://"):
                if b.lower().startswith(pre):
                    b = b[len(pre):]
                    break
            bucket = b.split("/", 1)[0] or None
        applied = self.add_secret(secret_type, opts, bucket=bucket)
        return self.spark.createDataFrame(
            sorted(applied.items()), "key string, value string"
        )

    def add_secret(
        self, secret_type: str, options: dict, bucket: str | None = None
    ) -> dict[str, str]:
        return apply_secret(self.spark, secret_type, options, bucket)

    # ------------------------------------------------------------------ #
    # Result iteration (E2/E3 — Arrow→tuple sink and batched FDW
    # iter_scan, src/hooks/query.rs:134-194, src/fdw/base.rs:125-178)
    # ------------------------------------------------------------------ #

    def fetch(self, query: str, args: dict | None = None):
        """Run SQL and return all rows (the full-pushdown sink path,
        E2).  Arrow-accelerated under the hood for pandas interchange;
        use :meth:`iter_rows` for results larger than driver memory."""
        return self.sql(query, args).collect()

    def iter_rows(self, query: str, args: dict | None = None):
        """Run SQL and stream rows lazily, one executor partition at a
        time — the analog of the reference's batched ``iter_scan``
        cursor (E3): the driver holds one batch, never the full result.
        """
        return self.sql(query, args).toLocalIterator()

    def summarize(self, table_or_query: str) -> DataFrame:
        """DuckDB SUMMARIZE analog (reachable through duckdb_execute in
        the reference): per-column min/max/approx_unique/avg/std/
        quartiles/count/null% in ONE aggregate job.  Accepts a table
        name or any SELECT."""
        q = table_or_query.strip()
        df = (
            self.sql(q)
            if _re.match(r"(select|with|from)\b", q, _re.IGNORECASE)
            else self.spark.table(q)
        )
        return _summarize(self.spark, df)

    def copy_to(
        self,
        query: str,
        path: str,
        format: str = "parquet",
        options: dict | None = None,
        single_file: bool = False,
    ) -> int:
        """DuckDB ``COPY (query) TO 'path' (FORMAT ...)`` analog
        (reachable through duckdb_execute in the reference): write a
        query result to parquet/csv/json/avro files (avro via the
        dependency-free distributed container sink).  ``single_file``
        coalesces to one output file (DuckDB's default shape) — leave
        False at scale so every executor writes its own split.
        Returns the row count written.

        ONE execution: the count rides the write job as an observed
        metric (``Observation``), so the query never runs twice and the
        reported count is from the exact execution that produced the
        files — a re-executed non-deterministic query (sampling, rand)
        could otherwise report a count disagreeing with the rows
        written."""
        from pyspark.sql import Observation
        from pyspark.sql import functions as F

        fmt = format.lower()
        if fmt not in ("parquet", "csv", "json", "avro"):
            raise EngineError(f"copy_to format {format!r} not supported")
        df = self.sql(query)
        if fmt == "avro":
            # distributed per-partition container files via the
            # dependency-free writer (sources/avro.write_avro_dir);
            # the count comes from the executors' per-file sums
            from pg_analytics_spark.sources.avro import write_avro_dir

            out = df.coalesce(1) if single_file else df
            return write_avro_dir(
                out, path, codec=(options or {}).get("codec", "null")
            )
        obs = Observation()
        df = df.observe(obs, F.count(F.lit(1)).alias("n"))
        out = df.coalesce(1) if single_file else df
        writer = out.write.mode("overwrite").options(**(options or {}))
        if fmt == "csv" and (options is None or "header" not in options):
            writer = writer.option("header", True)
        getattr(writer, fmt)(path)
        return obs.get["n"]

    def fetch_arrow(self, query: str, args: dict | None = None):
        """Run SQL and return a ``pyarrow.Table`` — the direct analog of
        the reference's Arrow interchange unit (RecordBatches streamed
        from DuckDB to Postgres, src/duckdb/connection.rs:176-229 /
        src/hooks/query.rs:134-194).  Spark 4's native ``toArrow`` keeps
        the transfer columnar end to end; downstream pandas/polars/
        DuckDB consumers take the table zero-copy."""
        return self.sql(query, args).toArrow()

    def iter_arrow(
        self, query: str, args: dict | None = None, batch_rows: int = 65536
    ):
        """Stream the result as ``pyarrow.RecordBatch``es with bounded
        driver memory — the batched Arrow cursor (the reference's
        RecordBatch loop).

        Columnar END TO END: executors re-slice their Arrow batches to
        ``batch_rows`` and ship each slice as one IPC-stream payload
        (``mapInArrow``); the driver walks the payloads through the
        lazy partition iterator and deserializes — no per-row Python
        conversion anywhere.  At most one executor partition's payloads
        are driver-resident.  Micro-bench (local[32], 600k-row
        6-column lineitem scan at sf0.1, end-to-end including the
        scan): 7.9s vs 16.0s for the previous
        ``toLocalIterator``+``Row.asDict``+``from_pylist`` per-row hop
        — 2× overall, with the gap entirely in the conversion.  Use
        :meth:`fetch_arrow` when the whole result fits in driver
        memory."""
        import pyarrow as pa

        df = self.sql(query, args)

        def _ipc_chunks(batches):
            acc: list = []
            rows = 0

            def _flush():
                nonlocal acc, rows
                tbl = pa.Table.from_batches(acc).combine_chunks()
                acc, rows = [], 0
                for off in range(0, max(tbl.num_rows, 1), batch_rows):
                    sl = tbl.slice(off, batch_rows)
                    sink = pa.BufferOutputStream()
                    with pa.ipc.new_stream(sink, tbl.schema) as w:
                        w.write_table(sl)
                    yield pa.RecordBatch.from_arrays(
                        [pa.array([sink.getvalue().to_pybytes()], pa.binary())],
                        names=["ipc"],
                    )

            for batch in batches:
                acc.append(batch)
                rows += batch.num_rows
                if rows >= batch_rows:
                    yield from _flush()
            if acc:
                yield from _flush()

        shipped = df.mapInArrow(_ipc_chunks, "ipc binary")

        # Driver-side re-batching is columnar too (Table concat/slice,
        # no row materialization): partition boundaries must not leak
        # into batch sizes — every yielded batch is exactly batch_rows
        # except the last.
        acc: list = []
        rows = 0
        for row in shipped.toLocalIterator():
            with pa.ipc.open_stream(pa.BufferReader(row["ipc"])) as reader:
                for batch in reader:
                    if not batch.num_rows:
                        continue
                    acc.append(batch)
                    rows += batch.num_rows
                    while rows >= batch_rows:
                        tbl = pa.Table.from_batches(acc).combine_chunks()
                        head = tbl.slice(0, batch_rows)
                        rest = tbl.slice(batch_rows)
                        yield head.to_batches(max_chunksize=batch_rows)[0]
                        acc = rest.to_batches() if rest.num_rows else []
                        rows = rest.num_rows
        if rows:
            tbl = pa.Table.from_batches(acc).combine_chunks()
            for b in tbl.to_batches(max_chunksize=batch_rows):
                yield b

    # ------------------------------------------------------------------ #
    # Namespace (C2 — search_path sync, src/hooks/query.rs:81-117):
    # attached names live in the session's temp-view namespace, which
    # shadows catalog databases; ``use`` switches the catalog database
    # for managed tables (materialize without path).
    # ------------------------------------------------------------------ #

    def use(self, database: str) -> None:
        self.spark.catalog.setCurrentDatabase(database)

    def current_database(self) -> str:
        return self.spark.catalog.currentDatabase()

    # ------------------------------------------------------------------ #
    # Interrupts (C1 — the reference's signal listener calls
    # conn.interrupt(), src/duckdb/connection.rs:32-110)
    # ------------------------------------------------------------------ #

    def cancel_all(self) -> None:
        """Cancel every running Spark job on this session — the analog
        of DuckDB ``conn.interrupt()``."""
        self.spark.sparkContext.cancelAllJobs()

    def install_interrupt_handler(self, signals=None) -> None:
        """Route SIGINT/SIGTERM (by default) to :meth:`cancel_all`, then
        re-raise the default behavior for SIGTERM — mirroring the
        reference's listener thread (connection.rs:57-64).  Call once
        from long-running drivers; safe to call repeatedly.
        """
        import signal as _signal

        sigs = signals or (_signal.SIGINT, _signal.SIGTERM)
        for s in sigs:
            prev = _signal.getsignal(s)

            def _handler(signum, frame, _prev=prev):
                self.cancel_all()
                if callable(_prev):
                    _prev(signum, frame)

            _signal.signal(s, _handler)


def _probe_delta() -> bool:
    import importlib.util

    return importlib.util.find_spec("delta") is not None


def _probe_iceberg() -> bool:
    return False  # no iceberg runtime in this environment


def _box_art(plan: str) -> str:
    """Render a Spark physical-plan string as the box art DuckDB's own
    EXPLAIN prints (reference explain.rs:70-80 returns DuckDB's output
    verbatim; this is the cosmetic-parity equivalent for Spark plans).

    Each operator becomes a bordered box; children hang beneath their
    parent connected by a vertical bar, with a sibling's subtree
    indented under its join — the same single-column layout DuckDB uses
    for linear chains, and an indented column per extra child.
    """
    nodes: list[tuple[int, str]] = []  # (depth, label)
    for raw in plan.splitlines():
        line = raw.rstrip()
        if not line or line.startswith(("==", "(")):
            continue
        # physical plans draw trees with ':-'/'+-' at 3 chars per level
        m = _re.match(r"^(?P<tree>[\s:+*-]*)\s*(?P<rest>[A-Za-z].*)$", line)
        if not m:
            continue
        tree = m.group("tree")
        depth = (len(tree.replace("*", "").rstrip())) // 3
        rest = m.group("rest")
        head = rest.split("(", 1)[0].split("[", 1)[0].split(",", 1)[0].strip()
        # operator name = leading tokens without '=' (drops flag text
        # like "isFinalPlan=false" from the title row)
        toks = []
        for t in head.split():
            if "=" in t:
                break
            toks.append(t)
        name = "_".join(toks) if toks else head
        if not name:
            continue
        label = name.upper()
        detail = rest[len(head):].strip(" ([")
        detail = detail[:24].rstrip(",] )")
        nodes.append((depth, label if not detail else f"{label}|{detail}"))
    if not nodes:
        return plan
    # DuckDB draws linear chains in ONE column; only extra children of a
    # branching node (joins, unions) start an indented column.  Column =
    # number of branching ancestors.
    n_children = [0] * len(nodes)
    parent = [None] * len(nodes)
    for i, (d, _) in enumerate(nodes):
        for j in range(i - 1, -1, -1):
            if nodes[j][0] == d - 1:
                parent[i] = j
                n_children[j] += 1
                break
    cols = [0] * len(nodes)
    for i in range(len(nodes)):
        p = parent[i]
        if p is None:
            cols[i] = 0
        else:
            bump = 1 if n_children[p] > 1 else 0
            cols[i] = cols[p] + bump
    width = max(
        (max(len(p) for p in lbl.split("|")) for _, lbl in nodes), default=20
    ) + 4
    width = max(width, 22)
    out: list[str] = []
    for i, (_, lbl) in enumerate(nodes):
        pad = "   " * cols[i]
        parts = lbl.split("|")
        out.append(pad + "┌" + "─" * width + "┐")
        for p in parts:
            out.append(pad + "│" + p.center(width) + "│")
        out.append(pad + "└" + "─" * width + "┘")
        if i + 1 < len(nodes):
            out.append("   " * cols[i + 1] + " " * (width // 2 + 1) + "│")
    return "\n".join(out)


def _summarize(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Build the SUMMARIZE result: one row per column with min/max/
    approx_unique/avg/std/q25/q50/q75/count/null_percentage — the same
    profile DuckDB's SUMMARIZE prints.  One aggregate job computes
    every statistic (column-parallel exprs, no per-column scans)."""
    import pyspark.sql.functions as F2

    aggs = []
    numeric = {"tinyint", "smallint", "int", "bigint", "float", "double"}
    for f in df.schema.fields:
        c, t = f.name, f.dataType.simpleString()
        is_num = t in numeric or t.startswith("decimal")
        aggs += [
            F2.min(c).cast("string").alias(f"{c}!min"),
            F2.max(c).cast("string").alias(f"{c}!max"),
            F2.approx_count_distinct(c).alias(f"{c}!approx_unique"),
            (
                F2.avg(F2.col(c).cast("double")) if is_num else F2.lit(None)
            ).alias(f"{c}!avg"),
            (
                F2.stddev(F2.col(c).cast("double")) if is_num else F2.lit(None)
            ).alias(f"{c}!std"),
            (
                F2.percentile_approx(F2.col(c).cast("double"), [0.25, 0.5, 0.75])
                if is_num
                else F2.lit(None).cast("array<double>")
            ).alias(f"{c}!q"),
            F2.count(c).alias(f"{c}!count"),
            F2.count(F2.when(F2.col(c).isNull(), 1)).alias(f"{c}!nulls"),
        ]
    row = df.agg(*aggs).collect()[0]
    out = []
    total = None
    for f in df.schema.fields:
        c = f.name
        cnt = row[f"{c}!count"] + row[f"{c}!nulls"]
        total = cnt if total is None else total
        q = row[f"{c}!q"] or [None, None, None]
        out.append(
            (
                c,
                f.dataType.simpleString(),
                row[f"{c}!min"],
                row[f"{c}!max"],
                row[f"{c}!approx_unique"],
                None if row[f"{c}!avg"] is None else float(row[f"{c}!avg"]),
                None if row[f"{c}!std"] is None else float(row[f"{c}!std"]),
                q[0],
                q[1],
                q[2],
                total,
                round(100.0 * row[f"{c}!nulls"] / total, 2) if total else 0.0,
            )
        )
    return spark.createDataFrame(
        out,
        "column_name string, column_type string, min string, max string, "
        "approx_unique long, avg double, std double, q25 double, q50 double, "
        "q75 double, count long, null_percentage double",
    )
