"""Distributed PCA for embedding compression — the classic
dimensionality-reduction step of a large-scale training-data pipeline
(whitening / low-rank projection before ANN indexing or clustering).

Dataflow, and why it scales to 100 TB:

1. ``embedding_moments`` — the ONLY distributed pass: per-dimension
   sufficient statistics ``(n, Σxᵢ, Σxⱼ, Σxᵢxⱼ)`` for the upper
   triangle (i ≤ j).  One double-posexplode (d(d+1)/2 terms per row)
   into ONE hash aggregate with map-side partial combine — shuffle
   volume is d² rows TOTAL (independent of corpus size), the same
   sufficient-statistics collapse the sketch operators use.  Sums are
   decimal-staged (workload/base convention), so the statistics are
   bit-identical cross-engine and order-independent — the
   ``embed_pca_moments`` registry row value-checks them against
   DuckDB at the gate.  The PRODUCTION twin ``embedding_moments_fast``
   replaces the explode (n·d(d+1)/2 generated rows) with a mapInArrow
   per-partition fp64 outer-product (BLAS ``X.T @ X``) under the same
   ONE-shuffle contract — near-equal, not bit-exact (pinned by test +
   the SCALE.md A/B); ``pca_top_components(..., exact=False)`` routes
   through it.
2. ``pca_top_components`` — driver-side eigendecomposition of the d×d
   covariance assembled from the moments (numpy ``eigh``; d×d is
   KILOBYTES — this is the part that is not and should not be
   distributed), descending eigenvalue order, deterministic sign
   convention (first nonzero component positive).
3. ``pca_project`` — map-only projection: per row, k sequential-fold
   dot products against broadcast component literals (the
   ``dot_product`` left-fold convention).  NO shuffle — plan-asserted
   in tests/test_plans.py.

Reference scope note: the reference engine (paradedb/pg_analytics) has
no vector operators; this module is part of the additive LLM-pipeline
scope (BASELINE.json north star) beside the IVF/PQ/quantization family
in operators/similarity.py and functions/vectors.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def embedding_moments(df: DataFrame, vec_col: str) -> DataFrame:
    """Upper-triangle second-moment sufficient statistics.

    Returns one row per (i, j), 1-based, i ≤ j:
    ``(i, j, n, sum_xi, sum_xj, sum_xixj)`` decimal-staged and
    surfaced as double — bit-identical cross-engine for any row
    order, which is what lets the gate value-check a *floating-point*
    covariance pipeline.
    """
    return finalize_moments(embedding_moment_partials(df, vec_col))


def embedding_moment_partials(df: DataFrame, vec_col: str) -> DataFrame:
    """The MERGEABLE decimal form of :func:`embedding_moments`
    (schema ``MOMENT_PARTIAL_SCHEMA``): exact decimal sums, so
    union + re-sum over any split of the corpus — batches, shards,
    micro-batches — equals the single-pass build bit-for-bit
    (streaming/moments_ingest.py is that twin)."""
    # cross-engine float rule (workload/base): cast FACTORS (not the
    # product) to a narrow decimal — the decimal×decimal product is
    # exact, so the sum is order-independent and bit-identical; a
    # double product cast to decimal rounds differently per engine
    fdec = "decimal(18,9)"
    # ONE generate + ONE hash aggregate (3 decimal sums + count) — the
    # A/B in SCALE.md's round-5 note: splitting the first moments into
    # a separate d-group aggregate joined back measured ~40% SLOWER
    # (extra stages cost more than the extra in-agg decimal sums), and
    # a nested-transform upper-triangle generate lost to posexplode's
    # generate-then-filter despite halving the discarded rows
    pairs = (
        df.select(F.col(vec_col).alias("_v"))
        .select(F.posexplode("_v").alias("_i0", "_xi"), "_v")
        .select(
            (F.col("_i0") + 1).alias("i"),
            F.col("_xi").cast("double").alias("_xi"),
            F.posexplode("_v").alias("_j0", "_xj"),
        )
        .select(
            "i",
            (F.col("_j0") + 1).alias("j"),
            "_xi",
            F.col("_xj").cast("double").alias("_xj"),
        )
        .filter(F.col("j") >= F.col("i"))
    )
    return pairs.groupBy("i", "j").agg(
        # count NON-NULL pairs (not count(*)): a NULL vector element
        # is skipped by the sums, so counting it would silently skew
        # the covariance — with this definition a NULL element makes
        # per-cell counts disagree and pca_top_components raises
        F.count(F.when(
            F.col("_xi").isNotNull() & F.col("_xj").isNotNull(), 1
        )).alias("n"),
        F.sum(F.col("_xi").cast(fdec)).cast("decimal(38,9)").alias("sxi"),
        F.sum(F.col("_xj").cast(fdec)).cast("decimal(38,9)").alias("sxj"),
        F.sum(F.col("_xi").cast(fdec) * F.col("_xj").cast(fdec))
        .cast("decimal(38,18)")
        .alias("sxx"),
    )


#: mergeable-state schema of the DECIMAL partials — exact decimal
#: addition makes union+re-sum bit-identical to a single-pass build
#: for ANY batch split (the streaming twin's contract)
MOMENT_PARTIAL_SCHEMA = (
    "i INT, j INT, n BIGINT, "
    "sxi DECIMAL(38,9), sxj DECIMAL(38,9), sxx DECIMAL(38,18)"
)


def embedding_moments_fast(df: DataFrame, vec_col: str) -> DataFrame:
    """The PRODUCTION covariance pass: per-partition fp64 outer-product
    accumulation via ``mapInArrow`` — same relation shape and the same
    ONE-shuffle contract as :func:`embedding_moments`, without the
    explode's n·d(d+1)/2 generated rows.

    Each partition streams its Arrow batches into a running
    ``(n, Σx, XᵀX)`` (numpy BLAS ``X.T @ X``) and emits ONE upper
    triangle — d(d+1)/2 rows — so the shuffle carries
    ``numPartitions × d(d+1)/2`` rows regardless of corpus size, and
    the per-row cost is a vectorized BLAS update instead of d²/2
    exploded aggregate inputs.  Tradeoff vs the exact path: float
    addition is order-dependent, so the sums are NOT bit-identical
    cross-engine (within ~1e-12 relative of the decimal-exact build —
    pinned by a near-equality test); use :func:`embedding_moments`
    when the gate needs value-exact moments, this path when the corpus
    is large (SCALE.md carries the A/B: the crossover is well below
    sf0.1×10).

    NULL elements and ragged vectors raise a named error, mirroring
    the exact path's uniform-count check.
    """
    out_schema = (
        "i INT, j INT, n BIGINT, "
        "sum_xi DOUBLE, sum_xj DOUBLE, sum_xixj DOUBLE"
    )

    def _accumulate(batches):
        # EXECUTOR closure: no package imports — a vanilla driver ships
        # this by value and the workers may not have the repo on their
        # sys.path (round-8 driver-sim find).  ValueError crosses the
        # Py4J boundary as a PythonException either way.
        import numpy as np
        import pyarrow as pa

        EngineError = ValueError

        d, n, s1, s2 = None, 0, None, None
        for b in batches:
            lst = b.column(0)
            if len(lst) == 0:
                continue
            if lst.null_count:
                raise EngineError(
                    "embedding_moments_fast: NULL vectors in input"
                )
            lens = np.asarray(lst.value_lengths())
            if d is None:
                d = int(lens[0])
            if not np.all(lens == d):
                raise EngineError(
                    "embedding_moments_fast: ragged vectors (lengths "
                    f"{int(lens.min())}..{int(lens.max())}) — pad or "
                    "filter to a fixed dimension before PCA"
                )
            flat = lst.flatten()
            if flat.null_count:
                raise EngineError(
                    "embedding_moments_fast: NULL vector elements"
                )
            x = np.asarray(flat, dtype=np.float64).reshape(len(lst), d)
            if s1 is None:
                s1 = np.zeros(d)
                s2 = np.zeros((d, d))
            n += x.shape[0]
            s1 += x.sum(axis=0)
            s2 += x.T @ x
        if n == 0:
            return
        iu, ju = np.triu_indices(d)
        yield pa.RecordBatch.from_pydict(
            {
                "i": pa.array(iu + 1, pa.int32()),
                "j": pa.array(ju + 1, pa.int32()),
                "n": pa.array(np.full(len(iu), n), pa.int64()),
                "sum_xi": pa.array(s1[iu], pa.float64()),
                "sum_xj": pa.array(s1[ju], pa.float64()),
                "sum_xixj": pa.array(s2[iu, ju], pa.float64()),
            }
        )

    partials = df.select(F.col(vec_col).alias("v")).mapInArrow(
        _accumulate, out_schema
    )
    return (
        partials.groupBy("i", "j")
        .agg(
            F.sum("n").alias("n"),
            F.sum("sum_xi").alias("sum_xi"),
            F.sum("sum_xj").alias("sum_xj"),
            F.sum("sum_xixj").alias("sum_xixj"),
        )
        .orderBy("i", "j")
    )


def finalize_moments(partials: DataFrame) -> DataFrame:
    """DECIMAL partials → the gate's double-surfaced moment relation.
    Kept separate so the streaming twin merges exact decimals across
    micro-batches and finalizes ONCE, identically to the batch path."""
    return partials.select(
        "i",
        "j",
        "n",
        F.col("sxi").cast("double").alias("sum_xi"),
        F.col("sxj").cast("double").alias("sum_xj"),
        # VARCHAR bridge (workload/base module rule): the scale-18
        # product sum's unscaled value exceeds 2^53, where DuckDB's
        # int128->double double-rounds; decimal->string->double is
        # correctly rounded in both engines
        F.col("sxx").cast("string").cast("double").alias("sum_xixj"),
    ).orderBy("i", "j")


def pca_top_components(
    df: DataFrame, vec_col: str, k: int, exact: bool = True
):
    """Top-``k`` principal components of the (mean-centered) corpus.

    ``exact=False`` computes the moments via
    :func:`embedding_moments_fast` (the mapInArrow production path) —
    same result to float precision, much cheaper past ~10⁵ rows.

    Driver-side ``numpy.linalg.eigh`` over the d×d covariance
    assembled from :func:`embedding_moments` — the d² statistics are
    the output of the single distributed pass; the eigensolve itself
    is O(d³) on KILOBYTES and belongs on the driver (same disposition
    as the k-means/PQ codebook trainers).  Returns
    ``(components, eigenvalues, mean)``: components is a (k, d) numpy
    array, rows orthonormal, descending eigenvalue, each row
    sign-fixed so its first nonzero entry is positive (deterministic
    across LAPACK builds).
    """
    import numpy as np

    moments = (
        embedding_moments(df, vec_col)
        if exact
        else embedding_moments_fast(df, vec_col)
    )
    return _components_from_moment_rows(np, moments.collect(), k)


def _components_from_moment_rows(np, rows, k: int):
    from pg_analytics_spark.errors import EngineError

    if not rows:
        raise EngineError(
            "pca_top_components: the moments relation is empty — the "
            "input has no vectors (or the vector column is all NULL)"
        )
    counts = {r["n"] for r in rows}
    if len(counts) != 1:
        # ragged dimensions or NULL elements give per-cell counts that
        # differ; dividing by any single n would be silently wrong
        raise EngineError(
            "pca_top_components: moment cells disagree on the row "
            f"count (min {min(counts)}, max {max(counts)}) — vectors "
            "are ragged or contain NULL elements; clean the corpus "
            "(filter/pad to a fixed dimension) before PCA"
        )
    d = max(r["j"] for r in rows)
    n = rows[0]["n"]
    s1 = np.zeros(d)
    s2 = np.zeros((d, d))
    for r in rows:
        i, j = r["i"] - 1, r["j"] - 1
        s1[i] = r["sum_xi"]
        s1[j] = r["sum_xj"]
        s2[i, j] = s2[j, i] = r["sum_xixj"]
    mean = s1 / n
    cov = s2 / n - np.outer(mean, mean)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T
    for r in range(comps.shape[0]):
        nz = np.flatnonzero(np.abs(comps[r]) > 1e-12)
        if len(nz) and comps[r, nz[0]] < 0:
            comps[r] = -comps[r]
    return comps, vals[order], mean


def pca_project(
    df: DataFrame, vec_col: str, components, mean=None,
    out_col: str = "projected",
) -> DataFrame:
    """Map-only projection of ``vec_col`` onto ``components`` (k, d)
    after subtracting ``mean`` (when given): appends ``out_col`` as
    ``array<double>`` of length k.  Each coordinate is one sequential
    left-fold dot (the ``dot_product`` convention) against component
    LITERALS — broadcast by codegen, no shuffle, no Python.
    """
    k = len(components)
    coords = []
    for r in range(k):
        comp = [float(x) for x in components[r]]
        if mean is not None:
            # Σ cᵢ·(xᵢ - mᵢ) = Σ cᵢxᵢ - Σ cᵢmᵢ : fold once over x,
            # subtract the constant (exact same float tree per row)
            const = 0.0
            for c, m in zip(comp, [float(m) for m in mean]):
                const += c * m
        else:
            const = 0.0
        arr = "array(" + ", ".join(f"{c!r}D" for c in comp) + ")"
        coords.append(
            F.expr(
                f"aggregate(zip_with({vec_col}, {arr}, "
                "(x, c) -> cast(x AS double) * c), 0.0D, "
                "(acc, t) -> acc + t)"
            )
            - F.lit(const)
        )
    return df.withColumn(out_col, F.array(*coords))


def rademacher_signs(k: int, d: int, seed: int = 7) -> list[list[float]]:
    """Seeded ±1 Johnson-Lindenstrauss projection matrix (k, d) from
    the repo's md5 convention — data-independent and deterministic, so
    BOTH the Spark expression and the DuckDB oracle SQL embed the
    identical literals (the seeded-centroid pattern)."""
    import hashlib

    return [
        [
            1.0
            if int(
                hashlib.md5(f"rp:{seed}:{r}:{j}".encode()).hexdigest()[:8],
                16,
            )
            % 2
            == 0
            else -1.0
            for j in range(d)
        ]
        for r in range(k)
    ]


def random_projection(
    df: DataFrame,
    vec_col: str,
    k: int,
    d: int,
    seed: int = 7,
    round_to: int | None = 6,
    prefix: str = "rp_",
) -> DataFrame:
    """Johnson-Lindenstrauss sketch: project onto k seeded Rademacher
    rows scaled by 1/sqrt(k) — the training-pass-free alternative to
    PCA when even the one moments pass is too much (distance-
    preserving w.h.p. by the JL lemma).  MAP-ONLY: k sequential-fold
    dots against sign literals, no shuffle, no Python — the same
    plan contract as pca_project.  Appends flat ``rp_0 … rp_{k-1}``
    double columns (rounded for the cross-engine gate when
    ``round_to`` is set)."""
    import math

    signs = rademacher_signs(k, d, seed)
    scale = math.sqrt(float(k))
    cols = []
    for r in range(k):
        arr = "array(" + ", ".join(f"{s!r}D" for s in signs[r]) + ")"
        e = (
            F.expr(
                f"aggregate(zip_with({vec_col}, {arr}, "
                "(x, c) -> cast(x AS double) * c), 0.0D, "
                "(acc, t) -> acc + t)"
            )
            / F.lit(scale)
        )
        if round_to is not None:
            e = F.round(e, round_to)
        cols.append(e.alias(f"{prefix}{r}"))
    return df.select("*", *cols)
