"""JSON source — reference option surface from src/duckdb/json.rs:28-105.

| reference                    | Spark                                  |
|------------------------------|----------------------------------------|
| format = array / nl / auto   | multiLine=true / false / sniffed       |
| records                      | primitivesAsString analog (see below)  |
| columns {name:type}          | explicit schema                        |
| maximum_object_size          | maxCharsPerColumn analog (warn)        |
| convert_strings_to_integers  | post-read cast attempt                 |
| dateformat/timestampformat   | dateFormat/timestampFormat             |
| sample_size                  | samplingRatio                          |
| ignore_errors                | mode=DROPMALFORMED                     |
| union_by_name                | Spark JSON infers union-by-name anyway |
| filename / hive_partitioning | shared transforms / partition discovery|
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pg_analytics_spark.errors import fallback_warning
from pg_analytics_spark.sources.base import _truthy, apply_common


def load(spark: SparkSession, files: list[str], opts: dict) -> DataFrame:
    reader_opts: dict[str, str] = {}
    fmt = str(opts.get("format", "auto")).lower()
    if fmt == "array":
        reader_opts["multiLine"] = "true"
    elif fmt in ("nl", "newline_delimited", "unstructured"):
        reader_opts["multiLine"] = "false"
    # 'auto': Spark default (newline-delimited); DuckDB sniffs. Multi-line
    # arrays under 'auto' need format=array explicitly — documented gap.

    for ref_key, spark_key in (
        ("dateformat", "dateFormat"),
        ("timestampformat", "timestampFormat"),
    ):
        if ref_key in opts:
            reader_opts[spark_key] = str(opts[ref_key])
    if "sample_size" in opts:
        n = int(opts["sample_size"])
        reader_opts["samplingRatio"] = "1.0" if n < 0 else str(min(1.0, n / 20480))
    if _truthy(opts.get("ignore_errors")):
        reader_opts["mode"] = "DROPMALFORMED"
    if "maximum_object_size" in opts:
        fallback_warning("json maximum_object_size has no Spark analog; ignored")

    schema_ddl = None
    columns = opts.get("columns")
    if columns:
        from pg_analytics_spark.sources.csv import _columns_to_ddl

        schema_ddl = _columns_to_ddl(columns)

    df = spark.read.options(**reader_opts).json(files, schema=schema_ddl)
    return apply_common(df, opts)
