"""pg_analytics_spark — a PySpark-native lakehouse analytics engine.

A from-scratch re-expression of the capability surface of
paradedb/pg_analytics (a Postgres extension embedding DuckDB; see
/root/reference) on top of Apache Spark.  Where the reference routes
SQL text to an embedded DuckDB (reference src/hooks/executor.rs:30-97),
this engine routes everything through one SparkSession: external files
are registered as Spark SQL temp views with the same option surface
(reference src/duckdb/{parquet,csv,json,delta,iceberg}.rs) and every
query — joins, aggregates, windows — is planned by Catalyst and
executed by Tungsten.

Public API:
    Engine            — session wrapper: attach / sql / explain / prepare / ...
    get_spark         — tuned local SparkSession builder
"""

from pg_analytics_spark.engine import Engine
from pg_analytics_spark.session import get_spark

__version__ = "0.1.0"
__all__ = ["Engine", "get_spark", "__version__"]
