"""Mergeable sketch operators: Count-Min, HyperLogLog, fixed-bin
histograms.

Why these three: at 100 TB the questions "how often does this token
appear", "how many distinct keys are there", and "what is p99" are all
answered with ONE map-side-combinable aggregation if the per-partition
state is a *mergeable sketch* — counters, register maxima, and bin
counts respectively.  Each operator here materializes the sketch as a
small RELATION (not an opaque blob), so sketches built on different
shards/days union + re-aggregate into the global sketch — the
hierarchical-rollup shape the reference's analytics users expect
(reference analog: DuckDB's approx_count_distinct / approx_quantile
surfaced through pg_analytics' delegated SQL,
/root/reference/src/hooks/executor.rs:71 — but those are NOT
cross-engine reproducible, while everything here is).

Cross-engine exactness: all three sketches are ORDER-INDEPENDENT pure
integer (or dyadic-rational) aggregations over the shared md5-derived
hash family (functions/hashing.py), so the DuckDB oracle replicates
them bit-for-bit — the same property that makes the Bloom and MinHash
pipelines oracle-checkable (operators/dedup.py).

Scale notes (100 TB):
* cms_build — explode(depth slots) feeds a partial hash-agg that
  collapses to ≤ depth·width rows per task BEFORE the one shuffle;
  the sketch itself is tiny (depth·width counters) and broadcastable.
* hll_build — partial max per (bucket) collapses to ≤ 2^p rows per
  task; one shuffle of ≤ 2^p rows per partition.
* hist_build — partial count per bin; ≤ n_bins rows shuffle.
All three probe/estimate steps broadcast the sketch, never the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pg_analytics_spark.functions.hashing import MINHASH_COEFFS, MINHASH_P

# --------------------------------------------------------------------- #
# Count-Min sketch
# --------------------------------------------------------------------- #


def _cms_col_sql(h: str, i: int, width: int) -> str:
    """SQL for hash-row i's column of a 32-bit item hash expression
    `h`: affine map over the shared md5-derived family reduced mod
    width.  All intermediates < 2^62 — exact BIGINT in Spark and
    DuckDB (which errors on overflow rather than wrapping)."""
    a, b = MINHASH_COEFFS[i]
    return f"((({a} * {h} + {b}) % {MINHASH_P}) % {width})"


def cms_slots_sql(h: str, depth: int, width: int) -> str:
    """SQL array<struct<r:int,c:bigint>> of an item's depth counter
    slots; shared verbatim between the Spark build and the DuckDB
    oracle (which uses the same affine coefficients)."""
    entries = ", ".join(
        f"struct({i} AS r, CAST({_cms_col_sql(h, i, width)} AS BIGINT) AS c)"
        for i in range(depth)
    )
    return f"array({entries})"


def cms_build(
    items: DataFrame,
    hash_col: str,
    *,
    depth: int = 4,
    width: int = 512,
    weight_col: str | None = None,
) -> DataFrame:
    """Distributed Count-Min sketch build over an item-hash column.

    `hash_col` must hold 32-bit non-negative item hashes as BIGINT
    (first 32 bits of md5 — `functions.hashing.shingle_hash32`).
    Returns the sketch as a relation (r:int, c:bigint, cnt:bigint)
    with at most depth·width rows; absent (r, c) pairs are
    implicitly-zero counters.

    Scale (100 TB): the ONLY shuffle is the final hash-agg on (r, c),
    and partial aggregation collapses each task's contribution to
    ≤ depth·width rows first — the sketch never grows with the data.
    Two sketches built on disjoint shards merge by summing counters
    (union + re-agg), the property `tests/test_sketches.py` pins.
    """
    if depth > len(MINHASH_COEFFS):
        raise ValueError(f"depth > {len(MINHASH_COEFFS)} not supported")
    w = f"CAST({weight_col} AS BIGINT)" if weight_col else "CAST(1 AS BIGINT)"
    slots = cms_slots_sql(hash_col, depth, width)
    return (
        items.selectExpr(f"explode({slots}) AS slot", f"{w} AS w")
        .groupBy(F.col("slot.r").alias("r"), F.col("slot.c").alias("c"))
        .agg(F.sum("w").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    queries: DataFrame,
    hash_col: str,
    *,
    depth: int = 4,
    width: int = 512,
) -> DataFrame:
    """Point-frequency estimates for `queries` (any relation with the
    same 32-bit `hash_col`): est = min over the depth rows of the
    item's counters.  One-sided error: est >= true count always;
    overestimates by at most ~2n/width with prob 1 - 2^-depth.

    Plan: explode the query's depth slots, LEFT join the (tiny,
    broadcast) sketch, min per query row — the corpus is never
    rescanned.  Output: one row per DISTINCT combination of the query
    columns + `cms_est` (the grouped estimate collapses duplicate
    query rows; probe with a key column when multiplicity matters).
    """
    slots = cms_slots_sql(hash_col, depth, width)
    qcols = queries.columns
    exploded = queries.selectExpr("*", f"explode({slots}) AS slot").select(
        *qcols, F.col("slot.r").alias("r"), F.col("slot.c").alias("c")
    )
    joined = exploded.join(F.broadcast(sketch), ["r", "c"], "left").withColumn(
        "cnt", F.coalesce(F.col("cnt"), F.lit(0).cast("bigint"))
    )
    return joined.groupBy(*qcols).agg(F.min("cnt").alias("cms_est"))


# --------------------------------------------------------------------- #
# HyperLogLog registers
# --------------------------------------------------------------------- #


def hll_rho_sql(rem: str, rem_bits: int) -> str:
    """SQL for the HLL register value rho = position of the first set
    bit of `rem` counted from the MSB of its rem_bits window (+1), i.e.
    leading-zero-count + 1.  Uses length(bin(x)) = floor(log2 x)+1 —
    pure integer, identical in Spark and DuckDB (both have bin()).
    rem = 0 → all rem_bits are zero → rho = rem_bits + 1."""
    return (
        f"CAST(IF({rem} = 0, {rem_bits + 1}, "
        f"{rem_bits} + 1 - length(bin({rem}))) AS INT)"
    )


def hll_build(items: DataFrame, hash_col: str, *, precision: int = 8) -> DataFrame:
    """Distributed HyperLogLog register build: bucket = top `precision`
    bits of the 32-bit item hash, register = max over the bucket's
    items of (leading zeros of the remaining bits + 1).

    Returns (bucket:bigint, rho:int) with at most 2^precision rows;
    absent buckets are implicitly rho = 0.  MAX is idempotent and
    order-independent → the sketch is mergeable (union + re-max) and
    bit-identical cross-engine.  Scale: partial max collapses each
    task to ≤ 2^p rows before the one shuffle.
    """
    if not 4 <= precision <= 16:
        raise ValueError("precision must be in [4, 16]")
    rem_bits = 32 - precision
    bucket = f"({hash_col} div {1 << rem_bits})"
    rem = f"({hash_col} % {1 << rem_bits})"
    return (
        items.selectExpr(
            f"CAST({bucket} AS BIGINT) AS bucket",
            f"{hll_rho_sql(rem, rem_bits)} AS rho",
        )
        .groupBy("bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_alpha_m2(precision: int) -> float:
    """alpha_m · m² for the raw HLL estimate — computed ONCE in Python
    and injected as the same literal into the Spark plan and the DuckDB
    oracle, so the estimate's single float division is the only
    rounding step and both engines agree bit-for-bit."""
    m = 1 << precision
    if precision == 4:
        alpha = 0.673
    elif precision == 5:
        alpha = 0.697
    elif precision == 6:
        alpha = 0.709
    else:
        alpha = 0.7213 / (1 + 1.079 / m)
    return alpha * m * m


def hll_estimate(
    registers: DataFrame, *, precision: int = 8, small_range_lc: bool = False
) -> DataFrame:
    """Raw HLL cardinality estimate from a register relation.

    est = alpha_m·m² / Z where Z = Σ_buckets 2^-rho (absent buckets
    contribute 2^0 = 1).  2^-rho is built as 1/CAST(1<<rho AS DOUBLE):
    an exact dyadic rational, so Z's sum is EXACT (≤ 33 mantissa bits
    at p=8) and order-independent — the one inexact operation is the
    final division, identical in both engines.

    The raw estimator is accurate in the n >> 2.5m regime; callers in
    the oracle-gated registry stay there.  ``small_range_lc=True``
    adds the standard linear-counting column ``lc_est`` = m·ln(m/V)
    (V = empty buckets) — the right estimate when most buckets are
    empty, but ln() is transcendental and thus OUTSIDE the bit-exact
    cross-engine contract (tests assert its accuracy, oracles don't
    hash it).

    Output: one row (m, nonzero_buckets, z_round, hll_est[, lc_est]).
    """
    m = 1 << precision
    am2 = hll_alpha_m2(precision)
    agg = registers.agg(
        F.count("*").alias("nonzero_buckets"),
        F.sum(
            F.expr("1.0D / CAST(SHIFTLEFT(CAST(1 AS BIGINT), rho) AS DOUBLE)")
        ).alias("z_present"),
    )
    est = agg.select(
        F.lit(m).cast("bigint").alias("m"),
        F.col("nonzero_buckets").cast("bigint").alias("nonzero_buckets"),
        (F.col("z_present") + (F.lit(m) - F.col("nonzero_buckets")).cast("double")).alias(
            "z"
        ),
    ).select(
        "m",
        "nonzero_buckets",
        F.round("z", 6).alias("z_round"),
        F.round(F.lit(am2) / F.col("z"), 4).alias("hll_est"),
    )
    if small_range_lc:
        est = est.withColumn(
            "lc_est",
            F.when(
                F.col("nonzero_buckets") < m,
                F.round(
                    F.lit(float(m))
                    * F.log(
                        F.lit(float(m))
                        / (F.lit(m) - F.col("nonzero_buckets")).cast("double")
                    ),
                    4,
                ),
            ),
        )
    return est


# --------------------------------------------------------------------- #
# Fixed-bin histogram → quantile estimation
# --------------------------------------------------------------------- #


def hist_build(
    df: DataFrame,
    int_col: str,
    *,
    lo: int,
    hi: int,
    n_bins: int = 32,
) -> DataFrame:
    """Equi-width histogram over an INTEGER-valued expression (scale
    decimals to cents first — integer binning is exact cross-engine,
    float binning is not).  [lo, hi] inclusive; values outside clamp to
    the edge bins.  Returns (bin:int, cnt:bigint), absent bins
    implicitly zero.

    bin = clamp((x - lo) * n_bins div (hi - lo + 1)) — pure BIGINT
    arithmetic ((hi-lo+1)·n_bins must stay < 2^63; callers keep cents
    ranges ≪ 2^40 so this holds by orders of magnitude).

    Scale: the mergeable-histogram shape — partial per-bin counts
    collapse each task to ≤ n_bins rows before the single shuffle, and
    per-shard histograms union+sum into the global one.  This is how
    p99 gets computed over 100 TB in one pass.
    """
    span = hi - lo + 1
    bin_expr = (
        f"CAST(GREATEST(0, LEAST({n_bins - 1}, "
        f"(CAST({int_col} AS BIGINT) - {lo}) * {n_bins} div {span})) AS INT)"
    )
    return (
        df.selectExpr(f"{bin_expr} AS bin")
        .groupBy("bin")
        .agg(F.count("*").alias("cnt"))
    )


def hist_quantile_est_sql(*, lo: int, hi: int, n_bins: int) -> str:
    """SQL estimating a quantile by linear interpolation inside its bin
    — over columns (q:double, bin, cnt, total, cum_before).  Shared
    VERBATIM between the Spark plan and the DuckDB oracle so the float
    steps agree bit-for-bit: rank = q·total (one multiply), frac =
    (rank − cum_before)/cnt (one subtract + divide), est = bin_lo +
    frac·bin_width (one multiply + add).  Every input is
    integer-exact; every op is a single correctly-rounded IEEE double
    operation in a FIXED association, so both engines produce the same
    bits.  Bin width floors to an integer in PYTHON (callers pick
    span % n_bins == 0 layouts when exact edges matter), keeping the
    fragment dialect-neutral — no div/// operator divergence."""
    span = hi - lo + 1
    bw = span // n_bins
    rank = "(q * CAST(total AS DOUBLE))"
    bin_lo = f"CAST({lo} + bin * {bw} AS DOUBLE)"
    bin_w = f"CAST({bw} AS DOUBLE)"
    frac = f"(({rank} - CAST(cum_before AS DOUBLE)) / CAST(cnt AS DOUBLE))"
    return f"({bin_lo} + {frac} * {bin_w})"


def hist_quantiles(
    hist: DataFrame,
    *,
    lo: int,
    hi: int,
    n_bins: int,
    qs: list[float],
) -> DataFrame:
    """Quantile estimates from a histogram relation (bin, cnt):
    for each q, the estimate interpolates inside the first bin whose
    cumulative count reaches rank = q·total.

    Output (q:double, est:double), ordered by q.  The histogram is
    tiny (≤ n_bins rows) so the cumulative window and the quantile
    cross join are driver-scale work; the ONLY big-data pass was
    hist_build's single shuffle.
    """
    from pyspark.sql import Window

    # explicit zero-count bins carry no rank information and would
    # create a spurious cum_before = 0 row for the q = 0 arm below.
    # The histogram is ≤ n_bins rows BY CONTRACT — collapse it to one
    # partition up front so the cumulative window and the final sort
    # run without single-partition Exchanges or a range-sampling job
    # (the r6 job audit billed 5 jobs to what is one data pass +
    # 32-row arithmetic; at scale the one data pass is hist_build's)
    hist = hist.filter(F.col("cnt") > 0).coalesce(1)
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = (
        hist.withColumn("cum", F.sum("cnt").over(w))
        .withColumn("cum_before", F.col("cum") - F.col("cnt"))
        .withColumn("total", F.sum("cnt").over(Window.partitionBy()))
    )
    qdf = hist.sparkSession.createDataFrame(
        [(float(q),) for q in qs], "q double"
    )
    est = hist_quantile_est_sql(lo=lo, hi=hi, n_bins=n_bins)
    return (
        cum.crossJoin(F.broadcast(qdf))
        .filter(
            (F.expr("q * CAST(total AS DOUBLE)") <= F.col("cum").cast("double"))
            & (
                # rank > cum_before selects the bracketing bin; the
                # cum_before = 0 arm keeps q = 0.0 from silently
                # dropping (rank 0 still belongs to the first
                # populated bin — only that bin has cum_before = 0)
                (
                    F.expr("q * CAST(total AS DOUBLE)")
                    > F.col("cum_before").cast("double")
                )
                | (F.col("cum_before") == 0)
            )
        )
        .selectExpr("q", f"round({est}, 6) AS est")
        # |qs|-row relation already in ONE partition: a partition-local
        # sort is a total order, no rangepartitioning sample pass
        .sortWithinPartitions("q")
    )


def hll_build_grouped(
    items: DataFrame,
    hash_col: str,
    group_cols: list[str],
    *,
    precision: int = 8,
) -> DataFrame:
    """Per-group HLL registers: (group_cols…, bucket, rho) with at most
    2^precision rows PER GROUP.  The per-day/per-tenant distinct
    sketch — group sketches re-max into coarser rollups (day→month→
    total) without touching data, the rollup-tree property
    `tests/test_sketches.py` pins."""
    if not 4 <= precision <= 16:
        raise ValueError("precision must be in [4, 16]")
    rem_bits = 32 - precision
    bucket = f"CAST(({hash_col} div {1 << rem_bits}) AS BIGINT)"
    rem = f"({hash_col} % {1 << rem_bits})"
    return (
        items.selectExpr(
            *group_cols,
            f"{bucket} AS bucket",
            f"{hll_rho_sql(rem, rem_bits)} AS rho",
        )
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate_grouped(
    registers: DataFrame,
    group_cols: list[str],
    *,
    precision: int = 8,
) -> DataFrame:
    """Raw HLL estimate per group from grouped registers — the same
    exact-dyadic Z sum + single division as hll_estimate, one row per
    group (group_cols…, nonzero_buckets, hll_est)."""
    m = 1 << precision
    am2 = hll_alpha_m2(precision)
    agg = registers.groupBy(*group_cols).agg(
        F.count("*").alias("nonzero_buckets"),
        F.sum(
            F.expr("1.0D / CAST(SHIFTLEFT(CAST(1 AS BIGINT), rho) AS DOUBLE)")
        ).alias("z_present"),
    )
    return agg.select(
        *group_cols,
        F.col("nonzero_buckets").cast("bigint").alias("nonzero_buckets"),
        F.round(
            F.lit(am2)
            / (
                F.col("z_present")
                + (F.lit(m) - F.col("nonzero_buckets")).cast("double")
            ),
            4,
        ).alias("hll_est"),
    )


# --------------------------------------------------------------------- #
# KMV / bottom-k theta sketch
# --------------------------------------------------------------------- #

#: the KMV hash domain — shingle_hash60 values are uniform in [0, 2^60)
KMV_DOMAIN = 1 << 60


def kmv_build_grouped(
    df: DataFrame, hash_col: str, group_cols: list[str], *, k: int = 256
) -> DataFrame:
    """Bottom-k (KMV / theta) distinct sketch per group: the k smallest
    DISTINCT 60-bit hashes, with their rank.  Columns: group_cols…,
    ``h`` (hash), ``rn`` (1-based rank within the group).

    Unlike HLL, a KMV sketch supports SET DIFFERENCE and INTERSECTION
    estimates (:func:`kmv_overlap`): below the pairwise threshold
    θ = min(kth_a, kth_b) each sketch holds the COMPLETE distinct-hash
    set of its stream, so sample-level set algebra is exact and scales
    by 1/θ (Beyer et al., "On Synopses for Distinct-Value Estimation
    Under Multiset Operations", SIGMOD'07).

    Scale: the ``row_number ≤ k`` filter compiles to Spark's
    WindowGroupLimit — each map task keeps only its local bottom-k
    BEFORE the shuffle, so the exchange carries ≤ k·partitions rows
    per group regardless of corpus size (plan-asserted in
    tests/test_plans.py)."""
    from pyspark.sql import Window

    w = Window.partitionBy(*group_cols).orderBy("h")
    return (
        df.select(*group_cols, F.col(hash_col).alias("h"))
        .distinct()
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
    )


def kmv_estimate_grouped(
    sketch: DataFrame, group_cols: list[str], *, k: int = 256
) -> DataFrame:
    """Distinct-count estimate per group from a KMV sketch: exact when
    the sketch is not full (every distinct hash is present), else the
    unbiased (k-1) / u_k with u_k = kth_hash / 2^60 — computed as ONE
    double division of a precomputed constant, bit-stable
    cross-engine.  Columns: group_cols…, n_in_sketch, kth, kmv_est."""
    num = float((k - 1) * KMV_DOMAIN)  # exact: (k-1) * 2^60 ≤ 2^70 < 2^1024
    agg = sketch.groupBy(*group_cols).agg(
        F.count("*").cast("bigint").alias("n_in_sketch"),
        F.max(F.when(F.col("rn") == k, F.col("h"))).alias("kth"),
    )
    return agg.select(
        *group_cols,
        "n_in_sketch",
        "kth",
        F.round(
            F.when(
                F.col("n_in_sketch") < k, F.col("n_in_sketch").cast("double")
            ).otherwise(F.lit(num) / F.col("kth").cast("double")),
            4,
        ).alias("kmv_est"),
    )


def kmv_overlap(
    sketch: DataFrame, group_cols: list[str], a_key, b_key, *, k: int = 256
) -> DataFrame:
    """Set-algebra estimates between two KMV sketches identified by
    ``group_cols == a_key`` / ``b_key``: intersection, A−B difference,
    and Jaccard.  θ = min(kth_a, kth_b, 2^60) (2^60 when a sketch is
    not full — it then holds its whole stream); below θ both sketches
    are complete distinct-hash sets, so the joined sample counts scale
    by 2^60/θ.  Returns ONE row: est_intersection, est_a_only,
    est_jaccard (all ROUND(…, 4) doubles).

    The two sketches together are ≤ 2k rows, so the set algebra runs
    on ONE sketch-sized collect (the codebook convention) — the
    relational formulation paid ~20 broadcast-build jobs for the same
    integers (round-8 job audit).  Only INTEGER counts come from
    Python; the float estimate expressions stay Spark-side literals,
    preserving the Spark↔DuckDB rounding parity the gate relies on."""
    assert len(group_cols) == 1, "kmv_overlap expects exactly one group col"
    key = group_cols[0]
    rows = sketch.select(key, "h", "rn").collect()
    a = {r["h"]: r["rn"] for r in rows if r[key] == a_key}
    b = {r["h"]: r["rn"] for r in rows if r[key] == b_key}
    kth_a = next((h for h, rn in a.items() if rn == k), None)
    kth_b = next((h for h, rn in b.items() if rn == k), None)
    theta = min(kth_a or KMV_DOMAIN, kth_b or KMV_DOMAIN)
    a_below = {h for h in a if h < theta}
    n_inter = len(a_below & b.keys())
    n_a_only = len(a_below) - n_inter
    n_b_below = sum(1 for h in b if h < theta)
    scale = F.lit(float(KMV_DOMAIN)) / F.lit(theta).cast("double")
    spark = sketch.sparkSession
    return spark.range(1).select(
        F.round(F.lit(n_inter).cast("double") * scale, 4).alias(
            "est_intersection"
        ),
        F.round(F.lit(n_a_only).cast("double") * scale, 4).alias(
            "est_a_only"
        ),
        F.round(
            F.lit(n_inter).cast("double")
            / F.lit(n_a_only + n_b_below).cast("double"),
            4,
        ).alias("est_jaccard"),
    )
