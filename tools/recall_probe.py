"""ANN recall probe: measure recall@k of the approximate similarity
tiers (hyperplane LSH, IVF probed cells) against exact brute force —
the evidence behind each tier's recall/latency claim in SCALE.md.

Two corpora:

* default — the sf0.1 embeddings fixture.  These vectors are
  near-random (uniform i.i.d. components), so EVERY bucketing method's
  recall ceiling is low: neighbors at cosine ~0.8 of a random query
  are themselves nearly random, and no locality structure exists for
  the hash/cell layout to exploit.  This mode measures the dial's
  monotonicity, not its ceiling.
* ``--gmm`` — a seeded Gaussian-mixture corpus (clusters with small
  intra-cluster noise, the structure real embedding corpora have).
  This is where the recall claim is substantiated: neighbors share a
  cluster, clusters land in few buckets/cells, and the probe dial
  reaches useful recall.

Usage: python tools/recall_probe.py [n_queries] [k] [--gmm]
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


def gmm_corpus(spark, n=20000, dim=64, n_clusters=32, sigma=0.15, seed=11):
    """Seeded Gaussian-mixture embedding corpus: unit-norm cluster
    centers, N(0, sigma²) per-component noise, L2-normalized rows —
    the locality structure real (text/image) embedding corpora have."""
    import numpy as np

    rng = np.random.RandomState(seed)
    centers = rng.randn(n_clusters, dim)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.randint(0, n_clusters, size=n)
    vecs = centers[labels] + sigma * rng.randn(n, dim)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    rows = [
        (i, [float(x) for x in vecs[i]]) for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    use_gmm = "--gmm" in sys.argv
    n_queries = int(args[0]) if len(args) > 0 else 20
    k = int(args[1]) if len(args) > 1 else 10
    spark = get_spark("recall-probe")
    spark.sparkContext.setLogLevel("ERROR")
    if use_gmm:
        emb = gmm_corpus(spark).persist()
    else:
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
        "ivf p=1": lambda qv: ivf_ann_topk(
            emb, "embedding", "vec_id", qv, k=k, n_probes=1
        ),
        "ivf p=2": lambda qv: ivf_ann_topk(
            emb, "embedding", "vec_id", qv, k=k
        ),
        "ivf p=3": lambda qv: ivf_ann_topk(
            emb, "embedding", "vec_id", qv, k=k, n_probes=3
        ),
        "ivf p=4": lambda qv: ivf_ann_topk(
            emb, "embedding", "vec_id", qv, k=k, n_probes=4
        ),
    }
    if use_gmm:
        from pg_analytics_spark.operators.similarity import train_ivf_centroids

        dim = len(emb.select("embedding").first()[0])
        trained = train_ivf_centroids(emb, "embedding", dim, n_cells=8, n_iters=3)
        methods["ivf-trained p=1"] = lambda qv: ivf_ann_topk(
            emb, "embedding", "vec_id", qv, k=k, n_probes=1, centroids=trained
        )
        methods["ivf-trained p=2"] = lambda qv: ivf_ann_topk(
            emb, "embedding", "vec_id", qv, k=k, n_probes=2, centroids=trained
        )
    if "--int8" in sys.argv:
        # recall through scalar int8 quantization — the SAME grid the
        # embed_quantize_int8 query benchmarks (shared helpers in
        # functions/vectors.py, so probe and operator cannot drift):
        # exact search over the DEQUANTIZED corpus isolates the
        # quantization loss; ivf-over-int8 is the coarse-probe shape.
        from pg_analytics_spark.functions.vectors import (
            INT8_DEQUANT_FRAGMENT,
            int8_stats_arrays,
        )

        ev, arrs = int8_stats_arrays(emb, "embedding")
        dq_expr = (
            "transform(arrays_zip(ev, mns, mxs), x -> "
            "CASE WHEN x.mxs = x.mns THEN x.ev ELSE "
            f"{INT8_DEQUANT_FRAGMENT} END)"
        )
        dq = (
            ev.crossJoin(F.broadcast(arrs))
            .select("vec_id", F.expr(dq_expr).alias("embedding"))
            .persist()
        )
        dq.count()
        methods["int8 exact"] = lambda qv: brute_force_topk(
            dq, "embedding", "vec_id", qv, k=k
        )
        methods["int8 ivf p=2"] = lambda qv: ivf_ann_topk(
            dq, "embedding", "vec_id", qv, k=k, n_probes=2
        )
    if "--pq" in sys.argv:
        # product quantization: trained codebooks, ADC-only vs the
        # ADC->exact-re-rank production shape.  ADC approximates the
        # DOT product; on L2-normalized corpora (--gmm) dot == cosine,
        # so the exact-truth comparison is metric-clean there.
        from pg_analytics_spark.operators.similarity import (
            pq_adc_topk,
            pq_topk_rerank,
            train_pq_codebooks,
        )

        dim = len(emb.select("embedding").first()[0])
        books = train_pq_codebooks(
            emb, "embedding", dim, m_subs=8, n_codes=16, n_iters=3
        )
        methods["pq adc (8x16)"] = lambda qv: pq_adc_topk(
            emb, "embedding", "vec_id", qv, books, k=k
        )
        methods["pq adc+rerank C=100"] = lambda qv: pq_topk_rerank(
            emb, "embedding", "vec_id", qv, books, k=k, n_candidates=100
        )
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
