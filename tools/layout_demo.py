"""Layout demonstration: shuffle join vs bucketed co-located join.

Usage: python tools/layout_demo.py [sf_dir] [n_buckets] [n_iters]

Materializes orders and lineitem as bucketed managed tables on
o_orderkey/l_orderkey (the recurring join key of q3/q10/q18), then
measures the orders⋈lineitem join aggregation:

  (a) plain parquet inputs  — Catalyst shuffles BOTH sides per query;
  (b) bucketed tables       — zero join-side Exchange nodes; the
                              one-time shuffle was paid at write time.

Broadcast is disabled for the measurement (at 100 TB neither side
broadcasts); timings are medians over n_iters runs of fresh plans.
The point at scale: a fact table joined on the same key by many
queries should be bucketed once at ingest, not shuffled per query.
"""

from __future__ import annotations

import shutil
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from pg_analytics_spark import get_spark
from pg_analytics_spark.sources import load_source


def _join_agg(o, l):
    return (
        o.join(l, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("l_extendedprice").cast("decimal(28,6)"))
            .cast("double")
            .alias("rev"),
        )
    )


def _time(fn, iters):
    walls = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        walls.append(time.perf_counter() - t0)
    return statistics.median(walls)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_buckets = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    spark = get_spark("layout-demo")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    o = load_source(spark, f"{sf_dir}/orders.parquet", "parquet")
    l = load_source(spark, f"{sf_dir}/lineitem.parquet", "parquet")

    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("orders_lb", "lineitem_lb"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{wh}/{t}", ignore_errors=True)
    t0 = time.perf_counter()
    o.write.bucketBy(n_buckets, "o_orderkey").sortBy("o_orderkey").saveAsTable(
        "orders_lb"
    )
    l.write.bucketBy(n_buckets, "l_orderkey").sortBy("l_orderkey").saveAsTable(
        "lineitem_lb"
    )
    write_cost = time.perf_counter() - t0

    plain = _time(lambda: _join_agg(o, l), iters)
    bucketed = _time(
        lambda: _join_agg(spark.table("orders_lb"), spark.table("lineitem_lb")),
        iters,
    )

    from pg_analytics_spark.plans import explain_formatted
    import re

    plan = explain_formatted(
        _join_agg(spark.table("orders_lb"), spark.table("lineitem_lb"))
    )
    join_section = plan.split("HashAggregate")[0]
    n_join_exchanges = len(re.findall(r"\(\d+\) Exchange", join_section))

    print(
        f"plain shuffle join:     {plain:6.2f}s median of {iters}\n"
        f"bucketed join:          {bucketed:6.2f}s median of {iters} "
        f"({n_join_exchanges} join-side exchanges)\n"
        f"one-time bucketed write: {write_cost:5.2f}s "
        f"(amortized across every future join on the key)"
    )
    for t in ("orders_lb", "lineitem_lb"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


if __name__ == "__main__":
    main()
