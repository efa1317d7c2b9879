"""Scaling probe: run the heavy operators at 1x and ~10x the sf0.1
corpus and report the wall-clock growth factor.

Usage: python tools/scale_probe.py [multiplier]

A sub-linear-to-linear factor (≤ ~multiplier) means the operator's
cost is driven by per-row work; a super-linear factor exposes a
quadratic candidate explosion or a skew cliff that the 100 TB design
must not have.  The 10x corpus is synthesized by unioning shifted-id
copies of documents/embeddings/customer, so duplicates-per-doc (and
hence candidate density) stays constant — the honest scaling axis for
dedup: corpus grows, near-dup rate doesn't.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from pg_analytics_spark import get_spark
from pg_analytics_spark.operators.dedup import (
    embedding_neardup_pairs_lsh,
    embedding_semantic_pairs,
    exact_dedup,
    minhash_lsh_pairs,
    release_sketch_caches,
    simhash_pairs,
)
from pg_analytics_spark.sources import load_source


def _xcopies(df, id_col: str, mult: int, text_col: str | None = None):
    """mult shifted-id copies; text perturbed per copy so cross-copy
    rows are not global duplicates."""
    span = 10_000_000
    parts = []
    for i in range(mult):
        d = df.withColumn(id_col, F.col(id_col) + F.lit(i * span))
        if text_col and i > 0:
            d = d.withColumn(
                text_col, F.concat(F.col(text_col), F.lit(f" c{i}"))
            )
        parts.append(d)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _wall(fn) -> float:
    t0 = time.perf_counter()
    fn().write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def _bloom_case(history, probe_docs):
    """Build the filter over `history`, probe a fixed shard against it."""
    from pg_analytics_spark.operators.dedup import bloom_bits, bloom_probe
    from pg_analytics_spark.streaming.bloom_ingest import (
        M_BITS,
        NUM_HASHES,
        _chunk_hashes,
    )

    bits = bloom_bits(
        _chunk_hashes(history), "h32", m_bits=M_BITS, num_hashes=NUM_HASHES
    )
    return bloom_probe(
        _chunk_hashes(probe_docs), "h32", bits, ["doc_id", "ci"],
        m_bits=M_BITS, num_hashes=NUM_HASHES,
    )


def main() -> None:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    sf = "/root/testdata/sf0.1"
    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_source(spark, f"{sf}/documents.parquet", "parquet").select(
        "doc_id", "text"
    )
    docs_big = _xcopies(docs, "doc_id", mult, "text").persist()
    cust = load_source(spark, f"{sf}/customer.parquet", "parquet").select(
        "c_custkey", "c_nationkey", "c_name"
    )
    emb = load_source(spark, f"{sf}/embeddings.parquet", "parquet").select(
        "vec_id", "embedding"
    )
    # perturb dim 0 per copy so copies land in different LSH buckets —
    # keeps candidate density constant as the corpus grows (the honest
    # axis, mirroring the text perturbation above)
    emb_parts = [emb]
    for i in range(1, mult):
        emb_parts.append(
            emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * 10_000_000))
            .withColumn(
                "embedding",
                F.expr(
                    "transform(embedding, (x, j) -> "
                    f"IF(j = 0, cast(x + {i * 0.37} AS float), x))"
                ),
            )
        )
    emb_big = emb_parts[0]
    for p in emb_parts[1:]:
        emb_big = emb_big.unionByName(p)
    emb_big = emb_big.persist()
    print(f"docs 1x={docs.count()} {mult}x={docs_big.count()}")

    cases = {
        "dedup_exact": (
            lambda: exact_dedup(docs, "text", "doc_id"),
            lambda: exact_dedup(docs_big, "text", "doc_id"),
        ),
        "dedup_minhash_lsh": (
            lambda: minhash_lsh_pairs(docs, "text", "doc_id", shingle_k=9),
            lambda: minhash_lsh_pairs(docs_big, "text", "doc_id", shingle_k=9),
        ),
        "dedup_simhash": (
            lambda: simhash_pairs(docs, "text", "doc_id"),
            lambda: simhash_pairs(docs_big, "text", "doc_id"),
        ),
        # fixed bits_per_band: buckets are constant, so in-bucket
        # candidate pairs grow quadratically with the corpus — the
        # scaled row adds log2(mult)≈3 bits (buckets ×8) to keep
        # expected bucket size constant, the operating rule at scale.
        "dedup_embedding_lsh(8 bits)": (
            lambda: embedding_neardup_pairs_lsh(
                emb, "embedding", "vec_id", dim=64, threshold=0.99
            ),
            lambda: embedding_neardup_pairs_lsh(
                emb_big, "embedding", "vec_id", dim=64, threshold=0.99
            ),
        ),
        "dedup_embedding_lsh(scaled)": (
            lambda: embedding_neardup_pairs_lsh(
                emb, "embedding", "vec_id", dim=64, threshold=0.99
            ),
            lambda: embedding_neardup_pairs_lsh(
                emb_big, "embedding", "vec_id", dim=64, threshold=0.99,
                bits_per_band=11,
            ),
        ),
        # same scaled-bits run through the NARROW re-join dataflow
        # (carry_vectors=False): pits the one-wide-shuffle carry shape
        # against banded-longs + two vector re-joins at growing corpus
        # size — the trade documented in embedding_neardup_pairs_lsh.
        "dedup_embedding_lsh(rejoin)": (
            lambda: embedding_neardup_pairs_lsh(
                emb, "embedding", "vec_id", dim=64, threshold=0.99,
                carry_vectors=False,
            ),
            lambda: embedding_neardup_pairs_lsh(
                emb_big, "embedding", "vec_id", dim=64, threshold=0.99,
                bits_per_band=11, carry_vectors=False,
            ),
        ),
        # bloom: HISTORY grows mult×, probe shard stays fixed — the
        # continuous-ingest axis.  Near-flat factor expected: the probe
        # cost is per-shard; only the filter build scans the history.
        "dedup_bloom_probe": (
            lambda: _bloom_case(docs, docs.limit(500)),
            lambda: _bloom_case(docs_big, docs.limit(500)),
        ),
        # semantic: the per-cell quadratic is the risk axis.  With a
        # FIXED codebook the factor degrades toward mult²/n_cells (each
        # cell grows mult×); the operating rule is CELLS OF BOUNDED
        # SIZE — n_cells scales with the corpus, so the 10× run uses
        # 10× the cells and the factor should return to ~linear.  Both
        # are measured: the fixed-codebook row demonstrates the cliff,
        # the scaled row demonstrates the dial.
        "dedup_semantic(8 cells)": (
            lambda: embedding_semantic_pairs(
                emb, "embedding", "vec_id", threshold=0.99, n_cells=8
            ),
            lambda: embedding_semantic_pairs(
                emb_big, "embedding", "vec_id", threshold=0.99, n_cells=8
            ),
        ),
        "dedup_semantic(scaled)": (
            lambda: embedding_semantic_pairs(
                emb, "embedding", "vec_id", threshold=0.99, n_cells=8
            ),
            lambda: embedding_semantic_pairs(
                emb_big, "embedding", "vec_id", threshold=0.99, n_cells=8 * mult
            ),
        ),
    }
    for name, (one, big) in cases.items():
        w1 = _wall(one)
        wN = _wall(big)
        release_sketch_caches()
        print(
            f"{name:22s} 1x {w1:6.2f}s   {mult}x {wN:7.2f}s   "
            f"factor {wN / w1:5.2f} (linear would be ~{mult})"
        )
    docs_big.unpersist()
    emb_big.unpersist()


if __name__ == "__main__":
    main()
