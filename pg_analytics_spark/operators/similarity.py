"""Similarity search over embedding columns.

brute_force_topk — exact cosine top-k, one scan + TakeOrdered; the
correctness baseline and still the right plan when the query side is a
handful of vectors (broadcast, no shuffle of the corpus).

lsh_ann_topk — random-hyperplane LSH: deterministic seeded planes →
sign-bit signature → candidates share a signature prefix bucket →
exact re-rank within candidates.  At 100 TB the bucket join replaces
the full scan; recall is tunable via (n_planes, prefix_bits, n_probes).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pg_analytics_spark.functions.vectors import cosine_similarity


def _query_lit(query_vec) -> F.Column:
    return F.array(*[F.lit(float(x)) for x in query_vec])


def brute_force_topk(
    df: DataFrame, vec_col: str, id_col: str, query_vec, k: int = 10
) -> DataFrame:
    """Exact cosine top-k for one query vector.

    Output: (id_col, sim) rounded to 6, ordered by (sim desc, id) —
    fully deterministic including ties.  Plan: scan + per-row fold +
    TakeOrderedAndProject (no shuffle).
    """
    sim = F.round(cosine_similarity(vec_col, _query_lit(query_vec)), 6)
    return (
        df.select(F.col(id_col), sim.alias("sim"))
        .orderBy(F.desc("sim"), F.asc(id_col))
        .limit(k)
    )


def hyperplanes(dim: int, n_planes: int = 16, seed: int = 42) -> np.ndarray:
    """Deterministic Gaussian hyperplanes for sign-bit LSH."""
    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dim)


def signature_col(vec_col: str, planes: np.ndarray) -> F.Column:
    """Sign-bit signature as a long (bit p set ⇔ dot(vec, plane_p) >= 0)."""
    bits = []
    for p, plane in enumerate(planes):
        dot = F.aggregate(
            F.zip_with(
                F.col(vec_col),
                F.array(*[F.lit(float(w)) for w in plane]),
                lambda x, w: x.cast("double") * w,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(
            F.when(dot >= 0, F.shiftleft(F.lit(1).cast("long"), p)).otherwise(
                F.lit(0).cast("long")
            )
        )
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def lsh_ann_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query_vec,
    k: int = 10,
    n_planes: int = 16,
    prefix_bits: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: hyperplane-bucket the corpus, rank only the
    query's bucket (prefix of the signature).  Same output shape as
    brute_force_topk; approximate (recall asserted in tests, not vs the
    SQL oracle).
    """
    dim = len(query_vec)
    planes = hyperplanes(dim, n_planes, seed)
    # Sequential left-to-right fold, NOT np.dot: BLAS may reorder the
    # summation, and a near-zero dot whose sign flips in the last bit
    # would put the query in a different bucket than the engines' own
    # sequential folds (Spark F.aggregate / DuckDB list_sum) compute.
    q = [float(x) for x in query_vec]
    q_sig = 0
    for p, plane in enumerate(planes):
        acc = 0.0
        for x, w in zip(q, plane):
            acc += x * float(w)
        if acc >= 0.0:
            q_sig |= 1 << p
    mask = (1 << prefix_bits) - 1
    bucket = signature_col(vec_col, planes).bitwiseAND(F.lit(mask).cast("long"))
    sim = F.round(cosine_similarity(vec_col, _query_lit(query_vec)), 6)
    return (
        df.withColumn("_bucket", bucket)
        .filter(F.col("_bucket") == (q_sig & mask))
        .select(F.col(id_col), sim.alias("sim"))
        .orderBy(F.desc("sim"), F.asc(id_col))
        .limit(k)
    )
