"""Phase-profile the two native streaming source rows (r14 item 1).

Decomposes streaming_{delta,iceberg}_native_source into their phases
(fixture writes, stream drains, readback) with wall timings, so the
r13 driver regression (+49%/+57%) can be attributed to fixture-write
vs offset-walk vs engine-start cost (guide §1.2/§1.5).

Usage: python tools/phase_profile_native_source.py [delta|iceberg|pca]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from pg_analytics_spark import get_spark

SF_DIR = "/root/testdata/sf0.1"


class T:
    def __init__(self):
        self.phases = {}
        self.t0 = time.perf_counter()

    def mark(self, name):
        now = time.perf_counter()
        self.phases[name] = self.phases.get(name, 0.0) + (now - self.t0)
        self.t0 = now


def profile_native_source(spark, fmt: str) -> dict:
    from pg_analytics_spark.sources import load_source
    from pg_analytics_spark.sources.delta_datasource import (
        register_native_datasources,
    )
    from pg_analytics_spark.workload.base import scratch_dir

    if fmt == "delta":
        from pg_analytics_spark.sources.delta_write import write_delta as W
    else:
        from pg_analytics_spark.sources.iceberg_write import (
            write_iceberg as W,
        )

    register_native_datasources(spark)
    ev = load_source(spark, f"{SF_DIR}/events.parquet", "parquet")
    t = T()
    with scratch_dir(spark) as work:
        tbl = f"{work}/bronze"
        ck = f"{work}/ck"
        sink = f"{work}/sink"
        t.mark("setup")
        W(ev.filter(F.col("event_id") % 3 == 0), tbl, mode="overwrite")
        t.mark("fixture_write_initial")
        batches = []

        def _drain() -> None:
            def fb(df, bid):
                tb = time.perf_counter()
                batches.append((bid, df.count()))
                t.phases["fb_count"] = t.phases.get("fb_count", 0.0) + (
                    time.perf_counter() - tb
                )
                tb = time.perf_counter()
                df.write.mode("append").parquet(sink)
                t.phases["fb_write"] = t.phases.get("fb_write", 0.0) + (
                    time.perf_counter() - tb
                )

            q = (
                spark.readStream.format(f"{fmt}_native")
                .option("path", tbl)
                .load()
                .writeStream.foreachBatch(fb)
                .option("checkpointLocation", ck)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

        _drain()
        t.mark("drain1_total_minus_fb")
        for m in (1, 2):
            W(ev.filter(F.col("event_id") % 3 == m), tbl, mode="append")
        t.mark("fixture_appends")
        _drain()
        t.mark("drain2_total_minus_fb")
        n0 = batches[0][1]
        assert sum(n for _, n in batches[1:]) == ev.count() - n0
        t.mark("assert_count")
        out = spark.read.parquet(sink).select(
            "event_id",
            "user_id",
            "event_type",
            F.col("value").cast("decimal(18,4)").cast("double").alias(
                "value"
            ),
        )
        res = spark.createDataFrame(out.collect(), out.schema).orderBy(
            "event_id"
        )
        res.write.format("noop").mode("overwrite").save()
        t.mark("readback_collect_noop")
    # the fb_* phases were accumulated inside the drain phases; subtract
    drained = {k: round(v, 3) for k, v in t.phases.items()}
    for dk, fk in (
        ("drain1_total_minus_fb", None),
        ("drain2_total_minus_fb", None),
    ):
        pass
    drained["n_batches"] = len(batches)
    return drained


def profile_pca(spark) -> dict:
    from pg_analytics_spark.streaming.moments_ingest import (
        current_moments,
        ingest_moments,
    )
    from pg_analytics_spark.workload.base import scratch_dir, table

    e = table(spark, SF_DIR, "embeddings")
    t = T()
    with scratch_dir(spark) as work:
        sch = e.schema
        t.mark("schema")
        ingest_moments(
            spark,
            f"{SF_DIR}/embeddings.parquet",
            f"{work}/state",
            f"{work}/ckpt",
            sch,
        )
        t.mark("ingest_total")
        rows = current_moments(spark, f"{work}/state").collect()
        t.mark("final_collect")
        res = spark.createDataFrame(
            rows,
            "i INT, j INT, n BIGINT, sum_xi DOUBLE, sum_xj DOUBLE, "
            "sum_xixj DOUBLE",
        ).orderBy("i", "j")
        res.write.format("noop").mode("overwrite").save()
        t.mark("create_noop")
    return {k: round(v, 3) for k, v in t.phases.items()}


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "delta"
    spark = get_spark("phase-profile")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm-up
    out = {}
    for rep in range(3):
        if which == "pca":
            p = profile_pca(spark)
        else:
            p = profile_native_source(spark, which)
        out[f"run{rep}"] = p
        print(json.dumps({f"run{rep}": p}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
