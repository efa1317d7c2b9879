"""Parquet source — reference option surface from src/duckdb/parquet.rs:28-119.

Option mapping (reference → Spark):

| reference option       | Spark realization                                  |
|------------------------|----------------------------------------------------|
| files (required)       | paths argument (comma-split list / globs)          |
| binary_as_string       | post-cast binary→string columns                    |
| filename               | _metadata.file_path pseudo-column                  |
| file_row_number        | _metadata.row_index pseudo-column                  |
| hive_partitioning      | automatic partition discovery (on by default; when |
|                        | explicitly false we load with basePath stripped)   |
| hive_types / autocast  | partition column cast map                          |
| union_by_name          | mergeSchema=true                                   |
| select                 | post-read projection                               |
| preserve_casing        | spark.sql.caseSensitive (engine-level)             |

Additionally this module repairs parquet TIMESTAMP(NANOS) columns:
Spark's vectorized reader rejects them (PARQUET_TYPE_ILLEGAL), so the
session sets ``spark.sql.legacy.parquet.nanosAsLong`` and we convert
the surfaced long back to a µs-precision timestamp here — the same
ns→µs truncation the reference performs in its Arrow→Postgres
conversion (src/schema/cell.rs:1234-1319).
"""

from __future__ import annotations

import pyarrow.parquet as _pq
import pyarrow.types as _pat
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pg_analytics_spark.sources.base import _truthy, apply_common

#: (file fingerprints, reader-shape flags) → inferred read schema.
#: Spark runs a 1-task footer-inference JOB on every spark.read.parquet
#: whose schema isn't supplied — measured as one whole job per registry
#: query (round-7 job probe: the first job of EVERY row was
#: 'parquet …, 1 task').  A repeated read of the SAME immutable files
#: (fingerprinted by mtime_ns+size, like the codebook caches) reuses
#: the schema Spark itself inferred on the first read, eliminating
#: that job.  Single plain files only — globs, dirs and partitioned
#: layouts keep full inference (their schema depends on listing).
_SCHEMA_CACHE: dict = {}


def _file_fingerprint(files: list[str]):
    import os as _os

    fps = []
    for p in files:
        if any(ch in p for ch in "*?[") or not _os.path.isfile(p):
            return None
        st = _os.stat(p)
        fps.append((p, st.st_mtime_ns, st.st_size))
    return tuple(fps)


def load(spark: SparkSession, files: list[str], opts: dict) -> DataFrame:
    # Detect TIMESTAMP(NANOS) columns *before* reading: Spark rejects them
    # outright unless nanosAsLong is set, and the conf is runtime-settable,
    # so sessions we didn't build (e.g. the driver's) work too.
    ns_cols = _nano_columns(files)
    if ns_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    reader = spark.read
    merge = _truthy(opts.get("union_by_name"))
    if merge:
        reader = reader.option("mergeSchema", "true")
    recurse = "hive_partitioning" in opts and not _truthy(
        opts["hive_partitioning"]
    )
    if recurse:
        # Spark discovers hive partitions automatically; disabling means
        # "do not treat key=value dirs as columns" → read leaf files with
        # recursiveFileLookup, which skips partition inference.
        reader = reader.option("recursiveFileLookup", "true")
    fp = _file_fingerprint(files)
    key = (fp, merge, recurse, bool(ns_cols)) if fp else None
    cached = _SCHEMA_CACHE.get(key) if key else None
    if cached is not None:
        reader = reader.schema(cached)
    df = reader.parquet(*files)
    if key and cached is None:
        paths = tuple(p for p, _m, _s in fp)
        for k in [
            k
            for k in _SCHEMA_CACHE
            if tuple(p for p, _m, _s in k[0]) == paths and k != key
        ]:
            del _SCHEMA_CACHE[k]
        _SCHEMA_CACHE[key] = df.schema
    df = _restore_nanos(df, ns_cols)
    if _truthy(opts.get("binary_as_string")):
        for f in df.schema.fields:
            if f.dataType.typeName() == "binary":
                df = df.withColumn(f.name, F.col(f.name).cast("string"))
    hive_types = opts.get("hive_types")
    if hive_types:
        for col, typ in dict(hive_types).items():
            df = df.withColumn(col, F.col(col).cast(typ))
    return apply_common(df, opts)


def _restore_nanos(df: DataFrame, ns_cols: list[str]) -> DataFrame:
    """Convert nanosAsLong-surfaced columns back to TIMESTAMP_NTZ (µs)."""
    for c in ns_cols:
        if c in df.columns and dict(df.dtypes)[c] == "bigint":
            # integer `div`, not `/`: ns values (~1.7e18) exceed double's
            # 2^53 mantissa, and DuckDB/the reference truncate ns→µs.
            df = df.withColumn(
                c,
                F.timestamp_micros(F.expr(f"`{c}` div 1000")).cast("timestamp_ntz"),
            )
    return df


def _nano_columns(files: list[str]) -> list[str]:
    """Find TIMESTAMP(NANOS) columns by reading one parquet footer
    (driver-side, O(KB)) — cheap even for 100k-file datasets because
    only the first match of the first glob is opened."""
    import glob as _glob

    for pattern in files:
        for path in sorted(_glob.glob(pattern)) or [pattern]:
            try:
                schema = _pq.ParquetFile(path).schema_arrow
            except Exception:
                continue
            return [
                f.name
                for f in schema
                if _pat.is_timestamp(f.type) and f.type.unit == "ns"
            ]
    return []
