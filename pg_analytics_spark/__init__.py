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


def _register_pickle_by_value() -> None:
    """Ship this package's UDF closures by value, not by reference.

    Python workers inherit the driver process's environment, not its
    ``sys.path`` mutations — a driver that did ``sys.path.insert`` to
    import us (the benchmark driver does exactly that) would hand
    workers a closure referencing ``pg_analytics_spark.…`` they cannot
    import.  Registering the package with pyspark's vendored
    cloudpickle makes every function defined here serialize
    self-contained; registration of the top package covers all
    submodules (cloudpickle walks parent packages).
    """
    import sys

    try:
        from pyspark import cloudpickle
    except ImportError:  # plain-cloudpickle fallback outside pyspark
        import cloudpickle  # type: ignore[no-redef]
    cloudpickle.register_pickle_by_value(sys.modules[__name__])


_register_pickle_by_value()

__version__ = "0.1.0"
__all__ = ["Engine", "get_spark", "__version__"]
