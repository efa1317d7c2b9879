"""Unit tests for the DDL type rewriter (reference trigger.rs:195-263
widenings).  The struct/map/unknown cases fall through to Spark's DDL
parser, which needs the active session fixture."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from pg_analytics_spark.types import duckdb_type_to_spark


@pytest.mark.parametrize(
    "name,expected",
    [
        ("TINYINT", T.ShortType()),           # widened
        ("utinyint", T.ShortType()),
        ("USMALLINT", T.IntegerType()),
        ("UINTEGER", T.LongType()),
        ("UBIGINT", T.DecimalType(20, 0)),
        ("HUGEINT", T.DecimalType(38, 0)),
        ("decimal(12,2)", T.DecimalType(12, 2)),
        ("NUMERIC( 7 , 3 )", T.DecimalType(7, 3)),
        ("numeric", T.DecimalType(38, 18)),
        ("varchar(40)", T.StringType()),
        ("BLOB", T.BinaryType()),             # no string degradation
        ("TIME", T.StringType()),             # no Spark TimeType
        ("timestamp_ns", T.TimestampNTZType()),
        ("timestamptz", T.TimestampType()),
        ("UUID", T.StringType()),
        ("geometry", T.BinaryType()),
        ("INTEGER[]", T.ArrayType(T.IntegerType())),
        ("text[]", T.ArrayType(T.StringType())),
        # Spark-native fallbacks the reference had to degrade/reject
        ("struct<a: int, b: string>",
         T.StructType([T.StructField("a", T.IntegerType()),
                       T.StructField("b", T.StringType())])),
        ("map<string, int>", T.MapType(T.StringType(), T.IntegerType())),
    ],
)
def test_ddl_rewrites(name, expected, spark):
    assert duckdb_type_to_spark(name) == expected


def test_unknown_type_raises(spark):
    with pytest.raises(Exception):
        duckdb_type_to_spark("no_such_type")
