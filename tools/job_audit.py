"""Jobs-per-query audit: run each bench query once (warm) and report
how many Spark JOBS (actions) it launched plus its wall — the direct
measurement of the per-job scheduling constant the next-17 residuals
are attributed to.  A query whose callable triggers k>1 actions pays
k scheduling constants at interactive scale; folding those into one
action is the fix the round-5 verdict asked to quantify.

Usage: python tools/job_audit.py [sf_dir] [q1,q2,...]
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pg_analytics_spark import get_spark
from pg_analytics_spark.workload import REGISTRY


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    if len(sys.argv) > 2:
        names = sys.argv[2].split(",")
    else:
        from bench import HEADLINE_NEXT
        names = [n for n in HEADLINE_NEXT]
    spark = get_spark("job-audit")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    st = spark.sparkContext.statusTracker()
    from pg_analytics_spark.operators.dedup import release_sketch_caches

    for name in names:
        qd = REGISTRY.get(name)
        if qd is None:
            continue
        # warm once, then measure
        qd.spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
        release_sketch_caches()
        before = set(st.getJobIdsForGroup(None) or [])
        t0 = time.perf_counter()
        qd.spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        after = set(st.getJobIdsForGroup(None) or [])
        njobs = len(after - before)
        release_sketch_caches()
        print(f"{name:32s} jobs={njobs:3d} wall={wall:.3f}")


if __name__ == "__main__":
    main()
