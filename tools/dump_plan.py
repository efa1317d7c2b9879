"""Dump `.explain("formatted")` for registry rows to files.

Usage: python tools/dump_plan.py <out_dir> <suffix> q1[,q2,...] [sf_dir]

Writes <out_dir>/<query>_<suffix>.txt for each query — the judge's
plan-evidence convention (plans/rNN/<query>_{before,after}.txt).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pg_analytics_spark import get_spark
from pg_analytics_spark.workload import REGISTRY


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3].split(",")
    sf_dir = sys.argv[4] if len(sys.argv) > 4 else "/root/testdata/sf0.1"
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump-plan")
    for name in names:
        df = REGISTRY[name].spark(spark, sf_dir)
        txt = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"{path}: {len(txt.splitlines())} lines", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
