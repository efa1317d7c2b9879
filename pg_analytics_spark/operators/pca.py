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
    (streaming/moments_ingest.py is that twin).

    r13 optimization (guide §2.3 "aggregate before you shuffle" +
    §4.2 "vectorized native code per Arrow batch"): the
    posexplode build generated ``n·d(d+1)/2`` rows into the hash
    aggregate — 41.6M decimal aggregate inputs at sf0.1 — purely to
    compute per-cell exact sums.  This path now runs per-partition in
    ``mapInArrow`` on EXACT INTEGER arithmetic (each element is
    Spark's own ``cast(double AS decimal(18,9))`` as a scaled int;
    the Gram matrix accumulates via 20-bit limb splits whose fp64
    BLAS chunk-products are exactly representable, so every sum is
    an exact Python int) and ships ``numPartitions × d(d+1)/2``
    partial rows into the same final merge aggregate.  Bit-for-bit
    equality with the exploded build — including NULL elements,
    ragged vectors, NaN (decimal NULL), and HALF_UP shortest-repr
    rounding at the .5 boundary — is pinned by
    ``tests/test_operators.py::test_moment_partials_arrow_equals_exploded``;
    the exploded reference build is kept below as
    :func:`embedding_moment_partials_exploded`.
    """
    return merge_moment_partials(
        embedding_moment_partials_raw(df, vec_col)
    )


def embedding_moment_partials_raw(df: DataFrame, vec_col: str) -> DataFrame:
    """The per-task kernel output BEFORE the merge aggregate —
    ``numPartitions × d(d+1)/2`` rows of ``MOMENT_PARTIAL_SCHEMA``.
    Exposed so the streaming twin can union these with its state and
    pay ONE merge aggregate per micro-batch instead of two (decimal
    sums are exact, so any grouping of the same partial rows produces
    bit-identical totals)."""
    return df.select(F.col(vec_col).alias("_v")).mapInArrow(
        _moment_batches_exact(), MOMENT_PARTIAL_SCHEMA
    )


def merge_moment_partials(partials: DataFrame) -> DataFrame:
    """The exact decimal merge aggregate over any set of partial rows
    (task partials, micro-batch state, or both unioned)."""
    return partials.groupBy("i", "j").agg(
        F.sum("n").alias("n"),
        F.sum("sxi").cast("decimal(38,9)").alias("sxi"),
        F.sum("sxj").cast("decimal(38,9)").alias("sxj"),
        F.sum("sxx").cast("decimal(38,18)").alias("sxx"),
    )


def _moment_batches_exact():
    """Build the mapInArrow kernel: exact-integer moment partials per
    task.  Returned as a NESTED closure so Spark pickles it BY VALUE —
    a vanilla driver's workers lack the repo sys.path, so a
    module-level function (pickled by reference) would die on import
    (the round-8 driver-sim rule).

    EXECUTOR closure — stdlib + numpy + pyarrow only.  Mirrors Spark
    semantics exactly:

    * element → ``cast(double AS decimal(18,9))``: HALF_UP rounding of
      the SHORTEST-REPR decimal string (BigDecimal.valueOf), NaN/inf →
      NULL, overflow → raises (ANSI);
    * ``n`` counts pairs where both elements are present & non-null;
    * a sum over zero non-null inputs is NULL, and a cell exists iff
      some row's vector covers both positions (posexplode semantics).
    """

    def _kernel(batches):
        import numpy as np
        import pyarrow as pa
        from decimal import Decimal, ROUND_HALF_UP

        NINE = Decimal("1E-9")

        def _exact_scale(x: float):
            if x != x or x in (float("inf"), float("-inf")):
                return None
            q = Decimal(repr(x)).quantize(NINE, rounding=ROUND_HALF_UP)
            iv = int(q.scaleb(9))
            if abs(iv) >= 10**18:
                # ANSI cast overflow raises (NaN/inf are NULL, overflow is
                # an error) — mirror Spark exactly
                raise ValueError(
                    f"{x!r} cannot be represented as Decimal(18, 9)"
                )
            return iv

        # clean-path accumulators (single fixed dim; Python ints = exact)
        d_clean = None
        n_clean = 0
        S = None                 # Σ q_i per dim (python ints)
        SXX = None               # Σ q_i q_j (object ndarray, python ints)
        # degenerate-path accumulators keyed (i0, j0) — ragged / null /
        # NaN / huge-magnitude batches take this exact row-loop
        deg_n = {}
        deg_sxi = {}
        deg_sxj = {}
        deg_sxx = {}
        deg_sxi_cnt = {}
        deg_sxj_cnt = {}
        deg_sxx_cnt = {}
        deg_pair = {}

        CHUNK = 4096
        QMAX = 2**33  # clean-path |scaled| bound → per-limb products 2^40

        def _clean_rows(x):
            # x: (m, d) float64, no element nulls, all |x|*1e9 < 2^33
            nonlocal n_clean, S, SXX
            m, d = x.shape
            t = x * 1e9
            q = np.rint(t)
            # near the .5 boundary the float product can round differently
            # from the shortest-repr decimal — resolve those exactly
            frac = np.abs(t - np.floor(t) - 0.5)
            risky = frac < 1e-5
            qi = q.astype(np.int64)
            if risky.any():
                for r, c in np.argwhere(risky):
                    qi[r, c] = _exact_scale(float(x[r, c]))
            if S is None:
                S = [0] * d
                SXX = np.zeros((d, d), dtype=object)
            hi = qi >> np.int64(20)
            lo = qi - (hi << np.int64(20))
            hf = hi.astype(np.float64)
            lf = lo.astype(np.float64)
            for s in range(0, m, CHUNK):
                e = min(s + CHUNK, m)
                H, L = hf[s:e], lf[s:e]
                hh = H.T @ H
                hl = H.T @ L
                ll = L.T @ L
                # exact in fp64: |limb| < 2^20, products < 2^40, chunk
                # sums < 2^40 * 4096 = 2^52 < 2^53
                SXX += (
                    hh.astype(np.int64).astype(object) * (1 << 40)
                    + (hl + hl.T).astype(np.int64).astype(object) * (1 << 20)
                    + ll.astype(np.int64).astype(object)
                )
            for k, v in enumerate(qi.sum(axis=0, dtype=np.int64)):
                S[k] += int(v)
            n_clean += m

        def _degenerate_rows(rows):
            for vec in rows:
                if vec is None:
                    continue  # posexplode of a NULL array emits nothing
                L = len(vec)
                qs = [None if v is None else _exact_scale(v) for v in vec]
                nn = [v is not None for v in vec]
                for i0 in range(L):
                    qi0 = qs[i0]
                    for j0 in range(i0, L):
                        key = (i0, j0)
                        deg_pair[key] = deg_pair.get(key, 0) + 1
                        if nn[i0] and nn[j0]:
                            deg_n[key] = deg_n.get(key, 0) + 1
                        if qi0 is not None:
                            deg_sxi[key] = deg_sxi.get(key, 0) + qi0
                            deg_sxi_cnt[key] = deg_sxi_cnt.get(key, 0) + 1
                        if qs[j0] is not None:
                            deg_sxj[key] = deg_sxj.get(key, 0) + qs[j0]
                            deg_sxj_cnt[key] = deg_sxj_cnt.get(key, 0) + 1
                            if qi0 is not None:
                                deg_sxx[key] = (
                                    deg_sxx.get(key, 0) + qi0 * qs[j0]
                                )
                                deg_sxx_cnt[key] = (
                                    deg_sxx_cnt.get(key, 0) + 1
                                )

        for b in batches:
            ch = b.column(0)
            if len(ch) == 0:
                continue
            lens = ch.value_lengths().to_numpy(zero_copy_only=False)
            flat = ch.flatten()
            rect = (
                ch.null_count == 0
                and flat.null_count == 0
                and lens.size > 0
                and np.all(lens == lens[0])
                and lens[0] > 0
            )
            if rect:
                d = int(lens[0])
                x = np.asarray(flat, dtype=np.float64).reshape(len(ch), d)
                ok = np.isfinite(x).all() and (
                    np.abs(x).max() * 1e9 < QMAX - 2
                )
                if ok and (d_clean is None or d_clean == d):
                    d_clean = d
                    _clean_rows(x)
                    continue
            _degenerate_rows(ch.to_pylist())

        if not n_clean and not deg_pair:
            return

        cells = set(deg_pair)
        if n_clean:
            for i0 in range(d_clean):
                for j0 in range(i0, d_clean):
                    cells.add((i0, j0))
        ii, jj, nn_, sxi_, sxj_, sxx_ = [], [], [], [], [], []
        for (i0, j0) in sorted(cells):
            n_c = deg_n.get((i0, j0), 0)
            sxi_c = deg_sxi.get((i0, j0), 0)
            sxj_c = deg_sxj.get((i0, j0), 0)
            sxx_c = deg_sxx.get((i0, j0), 0)
            sxi_cnt = deg_sxi_cnt.get((i0, j0), 0)
            sxj_cnt = deg_sxj_cnt.get((i0, j0), 0)
            sxx_cnt = deg_sxx_cnt.get((i0, j0), 0)
            if n_clean and j0 < d_clean:
                n_c += n_clean
                sxi_c += S[i0]
                sxj_c += S[j0]
                sxx_c += int(SXX[i0][j0])
                sxi_cnt += n_clean
                sxj_cnt += n_clean
                sxx_cnt += n_clean
            ii.append(i0 + 1)
            jj.append(j0 + 1)
            nn_.append(n_c)
            sxi_.append(Decimal(sxi_c).scaleb(-9) if sxi_cnt else None)
            sxj_.append(Decimal(sxj_c).scaleb(-9) if sxj_cnt else None)
            sxx_.append(Decimal(sxx_c).scaleb(-18) if sxx_cnt else None)
        yield pa.RecordBatch.from_pydict(
            {
                "i": pa.array(ii, pa.int32()),
                "j": pa.array(jj, pa.int32()),
                "n": pa.array(nn_, pa.int64()),
                "sxi": pa.array(sxi_, pa.decimal128(38, 9)),
                "sxj": pa.array(sxj_, pa.decimal128(38, 9)),
                "sxx": pa.array(sxx_, pa.decimal128(38, 18)),
            }
        )

    return _kernel


def embedding_moment_partials_exploded(
    df: DataFrame, vec_col: str
) -> DataFrame:
    """REFERENCE build of the decimal moment partials (the shape that
    shipped rounds 5–12): double-posexplode into one hash aggregate.
    Kept as the semantic oracle for the mapInArrow fast path — the
    equality test runs both and compares bit-for-bit."""
    # cross-engine float rule (workload/base): cast FACTORS (not the
    # product) to a narrow decimal — the decimal×decimal product is
    # exact, so the sum is order-independent and bit-identical; a
    # double product cast to decimal rounds differently per engine
    fdec = "decimal(18,9)"
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
