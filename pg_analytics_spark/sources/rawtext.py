"""Raw-text file source — DuckDB ``read_text`` analog.

DuckDB's ``read_text('glob')`` surfaces whole files as rows
(filename, content, size, last_modified); the reference reaches it
through its delegated SQL surface like every other table function
(/root/reference/src/hooks/executor.rs:71).  Spark realization:
``binaryFile`` (a real distributed FileFormat — files split across
executors, unlike wholeTextFiles' pair-RDD shim), decoded to UTF-8.

Columns: ``filename`` (path, ``file:`` scheme stripped to match
DuckDB's echo-what-you-passed), ``content`` (string), ``size``
(bigint).  ``last_modified`` is surfaced only with
``with_last_modified`` — mtimes are environment-dependent, so the
default shape stays value-comparable across engines.

Scale: one file per row; the 100 TB corpus-ingest shape is many small
docs per file (parquet/jsonl), but raw-text landing zones are the
first hop of every scraped corpus and this reads them distributed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pg_analytics_spark.sources.base import _truthy, apply_common


def load(spark: SparkSession, files: list[str], opts: dict) -> DataFrame:
    df = spark.read.format("binaryFile").load(files)
    out = df.select(
        F.regexp_replace(F.col("path"), "^file:/{0,2}", "/").alias("filename"),
        F.col("content").cast("string").alias("content"),
        F.col("length").alias("size"),
        *(
            [F.col("modificationTime").alias("last_modified")]
            if _truthy(opts.get("with_last_modified"))
            else []
        ),
    )
    return apply_common(out, opts)
