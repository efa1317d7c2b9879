"""Local replica of the driver's correctness gate.

Runs every workload REGISTRY entry on Spark and on DuckDB (oracle SQL
over the same parquet) and compares row count, schema (sorted column
names) and EXACT values (floats bit-for-bit — the driver hashes values,
so near-equality is not enough).

Usage: python tools/check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb

from pg_analytics_spark import get_spark
from pg_analytics_spark.workload import REGISTRY

TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()


def norm_cell(v):
    import datetime as dt
    import math
    from decimal import Decimal

    if isinstance(v, Decimal):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v.hex()  # exact bit comparison
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return tuple(norm_cell(x) for x in v)
    return v


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i].lower())
    # (is_null, value) per cell so rows with NULLs sort deterministically
    return sorted(
        tuple((r[i] is None, norm_cell(r[i])) for i in order) for r in rows
    )


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    failures, passes = [], []
    for name, qd in REGISTRY.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            df = qd.spark(spark, sf_dir)
            s_rows = [tuple(r) for r in df.collect()]
            s_cols = list(df.columns)
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {type(e).__name__}: {e}"))
            continue
        if not qd.oracle:
            passes.append((name, f"rows-only n={len(s_rows)}", time.perf_counter() - t0))
            continue
        try:
            cur = con.execute(qd.oracle)
            o_cols = [d[0] for d in cur.description]
            o_rows = cur.fetchall()
        except Exception as e:
            failures.append((name, f"ORACLE ERROR: {type(e).__name__}: {e}"))
            continue
        if sorted(c.lower() for c in s_cols) != sorted(c.lower() for c in o_cols):
            failures.append((name, f"COLUMNS: spark={s_cols} oracle={o_cols}"))
            continue
        if len(s_rows) != len(o_rows):
            failures.append((name, f"ROWCOUNT: spark={len(s_rows)} oracle={len(o_rows)}"))
            continue
        ns, no = norm_rows(s_cols, s_rows), norm_rows(o_cols, o_rows)
        if ns != no:
            diff = next(
                (i, a, b) for i, (a, b) in enumerate(zip(ns, no)) if a != b
            )
            failures.append((name, f"VALUES differ at sorted-row {diff[0]}:\n  spark : {diff[1]}\n  oracle: {diff[2]}"))
            continue
        passes.append((name, f"OK n={len(s_rows)}", time.perf_counter() - t0))
    for name, msg, dt_ in passes:
        print(f"PASS {name:32s} {msg} ({dt_:.1f}s)")
    for name, msg in failures:
        print(f"FAIL {name:32s} {msg}")
    print(f"\n{len(passes)} passed, {len(failures)} failed")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
