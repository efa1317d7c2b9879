"""FULL vanilla driver-sim: the seal convention from rounds 9-11.

Simulates the external driver faithfully — clean cwd (/tmp), a
VANILLA SparkSession (none of session.py's tuned confs), one pass
over EVERY registry row at sf0.01 with a DuckDB oracle row-count
compare.  This is NOT redundant with tools/check.py: the untuned
session + foreign cwd is what exposes executor/plan-worker closures
whose lazy package imports die off the driver's sys.path (the
round-8 class of bug; round-11 added Spark's data-source workers as
a second such surface).

Usage: python tools/driver_sim.py [sf_dir]   (writes one line per row)
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    os.chdir("/tmp")
    sys.path.insert(0, REPO)
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as E

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-sim")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs, osql = E.queries(), E.oracle_sql()
    print(f"entry rows: {len(E.entry(spark).collect())}", flush=True)
    bad = 0
    for name, fn in qs.items():
        t0 = time.perf_counter()
        try:
            n = len(fn(spark, sf_dir).collect())
        except Exception as exc:  # noqa: BLE001 — report, keep going
            print(f"BAD  {name}  SPARK ERROR: {exc}", flush=True)
            bad += 1
            continue
        if name in osql:
            m = len(con.execute(osql[name]).fetchall())
            ok = n == m
        else:
            m, ok = None, "rows-only"
        if ok is False:
            bad += 1
        print(
            f"{'BAD ' if ok is False else 'ok  '} {name} n={n} m={m} "
            f"({time.perf_counter() - t0:.1f}s)",
            flush=True,
        )
    print(f"DONE rows={len(qs)} BAD={bad}", flush=True)


if __name__ == "__main__":
    main()
