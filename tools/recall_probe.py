"""ANN recall probe: measure recall@k of the approximate similarity
tiers (hyperplane LSH, IVF probed cells) against exact brute force on
the sf0.1 embeddings — the evidence behind each tier's recall/latency
claim in SCALE.md.

Usage: python tools/recall_probe.py [n_queries] [k]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from pg_analytics_spark import get_spark
from pg_analytics_spark.operators.similarity import (
    brute_force_topk,
    ivf_ann_topk,
    lsh_ann_topk,
)
from pg_analytics_spark.sources import load_source


def main() -> None:
    n_queries = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark("recall-probe")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_source(
        spark, "/root/testdata/sf0.1/embeddings.parquet", "parquet"
    ).persist()
    n = emb.count()
    stride = max(1, n // n_queries)
    qrows = (
        emb.filter(F.col("vec_id") % stride == 0)
        .limit(n_queries)
        .select("vec_id", "embedding")
        .collect()
    )
    print(f"corpus={n} queries={len(qrows)} k={k}")
    methods = {
        "lsh r=0": lambda qv: lsh_ann_topk(
            emb, "embedding", "vec_id", qv, k=k
        ),
        "lsh r=1": lambda qv: lsh_ann_topk(
            emb, "embedding", "vec_id", qv, k=k, probe_radius=1
        ),
        "lsh r=2": lambda qv: lsh_ann_topk(
            emb, "embedding", "vec_id", qv, k=k, probe_radius=2
        ),
        "ivf p=2": lambda qv: ivf_ann_topk(
            emb, "embedding", "vec_id", qv, k=k
        ),
        "ivf p=4": lambda qv: ivf_ann_topk(
            emb, "embedding", "vec_id", qv, k=k, n_probes=4
        ),
    }
    stats = {m: [] for m in methods}
    walls = dict.fromkeys(["exact", *methods], 0.0)
    for q in qrows:
        qv = q["embedding"]
        t0 = time.perf_counter()
        truth = {
            r["vec_id"]
            for r in brute_force_topk(emb, "embedding", "vec_id", qv, k=k)
            .collect()
        }
        walls["exact"] += time.perf_counter() - t0
        for m, fn in methods.items():
            t0 = time.perf_counter()
            got = {r["vec_id"] for r in fn(qv).collect()}
            walls[m] += time.perf_counter() - t0
            stats[m].append(len(got & truth) / len(truth))
    for m in methods:
        rs = stats[m]
        print(
            f"{m}: mean recall@{k} {sum(rs) / len(rs):.3f}  "
            f"min {min(rs):.3f}  wall/query {walls[m] / len(rs):.2f}s "
            f"(exact {walls['exact'] / len(rs):.2f}s)"
        )
    emb.unpersist()


if __name__ == "__main__":
    main()
