"""Skew demonstration: plain shuffle join vs salted_join on a
pathologically skewed fact table (one key owns half the rows).

Usage: python tools/skew_demo.py [n_rows] [n_salts]

Prints wall-clock for (a) plain join with AQE skew handling OFF —
the worst case a mis-configured cluster hits, (b) plain join with AQE
ON, (c) salted_join.  Synthesizes data in-memory (testdata keys are
uniform, so the hot key must be manufactured).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from pg_analytics_spark import get_spark
from pg_analytics_spark.operators.skew import salted_join


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    n_salts = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    spark = get_spark("skew-demo")
    spark.sparkContext.setLogLevel("ERROR")

    # fact: half the rows on key 0, rest uniform over 10k keys
    fact = spark.range(n).select(
        F.when(F.col("id") % 2 == 0, F.lit(0))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(10_000)))
        .alias("k"),
        (F.col("id") % 1000).cast("double").alias("v"),
    )
    dim = spark.range(10_000).select(
        F.col("id").alias("k"), F.concat(F.lit("g"), (F.col("id") % 7)).alias("grp")
    )

    def run(tag: str, df):
        t0 = time.perf_counter()
        df.groupBy("grp").agg(F.sum("v").alias("s"), F.count("*").alias("c")).write \
            .format("noop").mode("overwrite").save()
        print(f"{tag:28s} {time.perf_counter() - t0:7.2f}s", flush=True)

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    run("plain join (AQE off)", fact.join(dim, "k"))
    run("salted join (AQE off)", salted_join(fact, dim, on="k", n_salts=n_salts))
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    run("plain join (AQE skew on)", fact.join(dim, "k"))
    spark.stop()


if __name__ == "__main__":
    main()
