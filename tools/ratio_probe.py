"""Spark-vs-DuckDB ratio probe at a replicated corpus scale.

Round-5's verdict flagged the frozen-33/next-17 queries whose wall is
>2x their DuckDB oracle at sf0.1 absolutes (all <=1.6s absolute) and
asked for PROOF that the gap is Spark's per-job scheduling constant —
i.e. that the ratio COLLAPSES when the same query runs on 10x the
data in both engines — rather than a real plan deficiency.

This tool materializes a ``mult``-times replicated sf0.1 corpus ON
DISK (so both engines read identical parquet), runs each target query
through the REGISTRY callable on Spark and the SAME registry oracle
SQL on DuckDB at 1x and at ``mult``x, and prints the ratio table for
SCALE.md.

Replication keeps per-copy semantics honest (the scale_probe.py
convention): every copy offsets its join keys (order/cust/supp/part/
doc/vec) by a disjoint span so joins never cross copies and
candidate/duplicate density stays CONSTANT as the corpus grows;
documents get a per-copy text suffix and embeddings a per-copy dim-0
perturbation so near-dup and ANN candidate sets do not explode.
nation/region are dimensions and stay fixed.

Also runs the exact-vs-fast PCA A/B (verdict item 2): the explode
based decimal-exact ``embed_pca_moments`` against the mapInArrow
production path ``embed_pca_moments_fast`` at both scales.

Usage: python tools/ratio_probe.py [mult] [--runs N] [--queries a,b]
Writes JSON to tools/ratio_probe_out.json and prints a markdown table.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb
from pyspark.sql import functions as F

from pg_analytics_spark import get_spark
from pg_analytics_spark.sources import load_source
from pg_analytics_spark.workload import REGISTRY

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_ROOT = os.environ.get("SPARK_GRAFT_SCALE_DIR", "/tmp/pg_spark_scale")

TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()

#: per-copy key offsets: (table, column, span).  Spans are disjoint
#: per key FAMILY (the same family must shift identically everywhere
#: it appears, or per-copy joins would miss).
_KEY_SPANS = {
    "orderkey": 1_000_000_000,
    "custkey": 100_000_000,
    "suppkey": 10_000_000,
    "partkey": 100_000_000,
    "doc_id": 10_000_000,
    "vec_id": 10_000_000,
    "event_id": 1_000_000_000,
    "user_id": 100_000_000,
}

_SHIFT_COLS = {
    "lineitem": ["l_orderkey:orderkey", "l_suppkey:suppkey", "l_partkey:partkey"],
    "orders": ["o_orderkey:orderkey", "o_custkey:custkey"],
    "customer": ["c_custkey:custkey"],
    "supplier": ["s_suppkey:suppkey"],
    "part": ["p_partkey:partkey"],
    "documents": ["doc_id:doc_id"],
    "embeddings": ["vec_id:vec_id"],
    "events": ["event_id:event_id", "user_id:user_id"],
}

DEFAULT_QUERIES = [
    "stats_moments",
    "sim_knn_join",
    "q21_suppliers_kept_waiting",
    "q5_local_supplier",
    "q1_pricing_summary",
    "basket_part_pairs",
    "q7_volume_shipping",
    "dedup_clusters",
    "embed_quantize_int8",
    "chunk_documents",
    "stats_quantile_hist",
    "sim_ann_lsh_pruned",
]


def _one_copy(df, tname: str, i: int):
    for spec in _SHIFT_COLS.get(tname, []):
        col, fam = spec.split(":")
        span = _KEY_SPANS[fam]
        typ = dict(df.dtypes)[col]
        df = df.withColumn(
            col, (F.col(col) + F.lit(i * span)).cast(typ)
        )
    if tname == "documents" and i > 0:
        # per-copy perturbation: cross-copy rows are NOT duplicates,
        # so duplicate density stays constant (the honest dedup axis)
        df = df.withColumn("text", F.concat(F.col("text"), F.lit(f" c{i}")))
    if tname == "embeddings" and i > 0:
        df = df.withColumn(
            "embedding",
            F.expr(
                "transform(embedding, (x, j) -> "
                f"IF(j = 0, cast(x + {i * 0.37} AS float), x))"
            ),
        )
    return df


def build_corpus(spark, mult: int) -> str:
    out = f"{OUT_ROOT}{mult}"
    marker = os.path.join(out, f"_BUILT_{mult}")
    if os.path.exists(marker):
        return out
    os.makedirs(out, exist_ok=True)
    for t in TABLES:
        base = load_source(spark, f"{SF_DIR}/{t}.parquet", "parquet")
        if t in ("region", "nation"):
            big = base  # dimensions stay fixed
        else:
            parts = [_one_copy(base, t, i) for i in range(mult)]
            big = parts[0]
            for p in parts[1:]:
                big = big.unionByName(p)
        dest = os.path.join(out, f"{t}.parquet")
        big.write.mode("overwrite").parquet(dest)
        print(f"built {t}", file=sys.stderr)
    with open(marker, "w") as fh:
        fh.write(str(mult))
    return out


def _duck_con(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')"
        )
    return con


def _spark_wall(spark, name: str, sf_dir: str, runs: int) -> float:
    from pg_analytics_spark.operators.dedup import release_sketch_caches

    qd = REGISTRY[name]
    walls = []
    for _ in range(runs):
        t0 = time.perf_counter()
        qd.spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
        walls.append(time.perf_counter() - t0)
    release_sketch_caches()
    return statistics.median(walls)


def _duck_wall(con, name: str, runs: int) -> float | None:
    qd = REGISTRY[name]
    if not qd.oracle:
        return None
    walls = []
    for _ in range(runs):
        t0 = time.perf_counter()
        con.execute(qd.oracle).fetchall()
        walls.append(time.perf_counter() - t0)
    return statistics.median(walls)


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    mult = int(args[0]) if args else 10
    runs = 3
    queries = list(DEFAULT_QUERIES)
    for a in sys.argv[1:]:
        if a.startswith("--runs"):
            runs = int(a.split("=", 1)[1])
        elif a.startswith("--queries"):
            queries = a.split("=", 1)[1].split(",")

    spark = get_spark("ratio-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warm-up

    big_dir = build_corpus(spark, mult)
    results: dict[str, dict] = {}

    con1 = _duck_con(SF_DIR)
    conN = _duck_con(big_dir)
    for name in queries:
        if name not in REGISTRY:
            print(f"skip unknown {name}", file=sys.stderr)
            continue
        r: dict = {}
        r["spark_1x"] = round(_spark_wall(spark, name, SF_DIR, runs), 3)
        r["spark_Nx"] = round(_spark_wall(spark, name, big_dir, runs), 3)
        d1 = _duck_wall(con1, name, runs)
        dN = _duck_wall(conN, name, runs)
        r["duck_1x"] = round(d1, 3) if d1 is not None else None
        r["duck_Nx"] = round(dN, 3) if dN is not None else None
        if d1:
            r["ratio_1x"] = round(r["spark_1x"] / d1, 2)
        if dN:
            r["ratio_Nx"] = round(r["spark_Nx"] / dN, 2)
        results[name] = r
        print(f"{name}: {r}", file=sys.stderr)

    # exact-vs-fast PCA A/B (Spark only; the fast path has no oracle)
    ab = {}
    for nm in ("embed_pca_moments", "embed_pca_moments_fast"):
        ab[nm + "_1x"] = round(_spark_wall(spark, nm, SF_DIR, runs), 3)
        ab[nm + f"_{mult}x"] = round(
            _spark_wall(spark, nm, big_dir, max(1, runs - 1)), 3
        )
    print(f"pca_ab: {ab}", file=sys.stderr)

    payload = {
        "mult": mult,
        "runs": runs,
        "sf_dir": SF_DIR,
        "queries": results,
        "pca_ab": ab,
    }
    out_json = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "ratio_probe_out.json"
    )
    with open(out_json, "w") as fh:
        json.dump(payload, fh, indent=1)

    # markdown for SCALE.md
    print(f"\n| query | spark 1x | duck 1x | ratio 1x | spark {mult}x "
          f"| duck {mult}x | ratio {mult}x |")
    print("|---|---|---|---|---|---|---|")
    for name, r in results.items():
        print(
            f"| {name} | {r['spark_1x']} | {r['duck_1x']} | "
            f"{r.get('ratio_1x', '—')} | {r['spark_Nx']} | {r['duck_Nx']} | "
            f"{r.get('ratio_Nx', '—')} |"
        )
    print(json.dumps(payload, separators=(",", ":")))


if __name__ == "__main__":
    main()
