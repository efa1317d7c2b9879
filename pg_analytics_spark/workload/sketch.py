"""Sketch-based approximate analytics queries (operators/sketches.py)
under the value-exact oracle gate.

Each sketch is an order-independent integer (or exact-dyadic)
aggregation over the shared md5 hash family, so the DuckDB oracle
replicates the ENTIRE approximate pipeline bit-for-bit — estimates
included — the same property the Bloom/MinHash oracles rely on.
Reference analog: the delegated approx aggregates
(/root/reference/src/hooks/executor.rs:71 routes approx_count_distinct
etc. to DuckDB); these sketches are the mergeable, shard-unionable
versions a 100 TB rollup tree needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pg_analytics_spark.functions import text as X
from pg_analytics_spark.functions.hashing import (
    MINHASH_COEFFS,
    MINHASH_P,
    shingle_hash32,
)
from pg_analytics_spark.operators.sketches import (
    cms_build,
    cms_estimate,
    hist_build,
    hist_quantile_est_sql,
    hist_quantiles,
    hll_alpha_m2,
    hll_build,
    hll_estimate,
)
from pg_analytics_spark.workload.base import register, scratch_dir, table
from pg_analytics_spark.workload.llm import _TOKS

_H32 = "(('0x' || substr(md5(tok), 1, 8))::BIGINT)"

_CMS_DEPTH, _CMS_WIDTH = 4, 512


def _cms_col_duck(i: int, w: int) -> str:
    a, b = MINHASH_COEFFS[i]
    return f"((({a} * h32 + {b}) % {MINHASH_P}) % {w})"


def _cms_oracle() -> str:
    pairs = "\n      UNION ALL ".join(
        f"SELECT {i} AS r, {_cms_col_duck(i, _CMS_WIDTH)} AS c FROM h"
        for i in range(_CMS_DEPTH)
    )
    qcase = " ".join(
        f"WHEN {i} THEN {_cms_col_duck(i, _CMS_WIDTH)}" for i in range(_CMS_DEPTH)
    )
    return f"""
    WITH tok AS (SELECT unnest({_TOKS}) AS tok FROM documents),
    h AS (SELECT {_H32} AS h32 FROM tok),
    pairs AS (
      {pairs}
    ),
    cms AS (SELECT r, c, COUNT(*)::BIGINT AS cnt FROM pairs GROUP BY r, c),
    exact AS (
      SELECT tok, COUNT(*)::BIGINT AS exact_cnt, {_H32} AS h32
      FROM tok GROUP BY tok ORDER BY exact_cnt DESC, tok LIMIT 40
    ),
    qslots AS (
      SELECT tok, exact_cnt, d.r, CASE d.r {qcase} END AS c
      FROM exact, (VALUES (0), (1), (2), (3)) d(r)
    )
    SELECT q.tok, q.exact_cnt, MIN(s.cnt) AS cms_est
    FROM qslots q JOIN cms s ON q.r = s.r AND q.c = s.c
    GROUP BY q.tok, q.exact_cnt
    ORDER BY exact_cnt DESC, tok
    """


@register(
    "sketch_count_min_words",
    oracle=_cms_oracle(),
    doc="Count-Min sketch word frequencies: one depth×width counter "
    "matrix built in a single map-side-combinable shuffle, then "
    "point estimates (min over depth counters) for the top-40 exact "
    "tokens — est >= exact always (one-sided error), equality when no "
    "collision.  The DuckDB oracle rebuilds the identical sketch from "
    "the shared md5-affine family, so even the COLLISIONS match "
    "bit-for-bit.  Scale: the sketch is ~2k counters regardless of "
    "corpus size; shard sketches merge by counter addition "
    "(tests/test_sketches.py pins mergeability).",
)
def sketch_count_min_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pg_analytics_spark.operators.dedup import _persist_sketch

    d = table(spark, sf_dir, "documents")
    tok = d.select(F.explode(X.tokens(F.lower("text"))).alias("tok"))
    # ONE corpus pass: collapse the token stream to vocabulary-sized
    # (tok, cnt) first — CMS counters are sums, so building the sketch
    # WEIGHTED from the counted vocabulary equals building it from the
    # raw stream (the cms_build weight_col contract), and the exact
    # top-40 arm reads the same counted relation instead of
    # re-scanning + re-tokenizing documents (r6 job audit: 5 jobs /
    # 2 scans).  At 100 TB the persisted relation is |vocabulary|,
    # never |corpus|.
    counts = _persist_sketch(
        tok.groupBy("tok").agg(F.count("*").alias("exact_cnt"))
    )
    hashed = counts.select(
        shingle_hash32(F.col("tok")).alias("h32"), "exact_cnt"
    )
    sketch = cms_build(
        hashed, "h32", depth=_CMS_DEPTH, width=_CMS_WIDTH,
        weight_col="exact_cnt",
    )
    exact = (
        counts.orderBy(F.desc("exact_cnt"), "tok")
        .limit(40)
        .withColumn("h32", shingle_hash32(F.col("tok")))
    )
    est = cms_estimate(sketch, exact, "h32", depth=_CMS_DEPTH, width=_CMS_WIDTH)
    return est.select("tok", "exact_cnt", "cms_est").orderBy(
        F.desc("exact_cnt"), "tok"
    )


_HLL_P = 8


def _hll_oracle() -> str:
    m = 1 << _HLL_P
    rem_bits = 32 - _HLL_P
    am2 = hll_alpha_m2(_HLL_P)
    return f"""
    WITH keys AS (SELECT l_orderkey::VARCHAR AS tok FROM lineitem),
    h AS (SELECT {_H32} AS h32 FROM keys),
    slots AS (
      SELECT h32 // {1 << rem_bits} AS bucket,
             CASE WHEN h32 % {1 << rem_bits} = 0 THEN {rem_bits + 1}
                  ELSE {rem_bits} + 1 - length(bin(h32 % {1 << rem_bits}))
             END AS rho
      FROM h
    ),
    regs AS (SELECT bucket, MAX(rho) AS rho FROM slots GROUP BY bucket),
    agg AS (
      SELECT COUNT(*)::BIGINT AS nonzero_buckets,
             SUM(1.0 / CAST((1::BIGINT << rho) AS DOUBLE)) AS z_present
      FROM regs
    ),
    est AS (
      SELECT {m}::BIGINT AS m, nonzero_buckets,
             (z_present + CAST({m} - nonzero_buckets AS DOUBLE)) AS z
      FROM agg
    )
    SELECT m, nonzero_buckets, ROUND(z, 6) AS z_round,
           ROUND(CAST('{am2!r}' AS DOUBLE) / z, 4) AS hll_est,
           (SELECT COUNT(DISTINCT tok)::BIGINT FROM keys) AS exact_distinct
    FROM est
    """


@register(
    "sketch_hll_distinct",
    oracle=_hll_oracle(),
    doc="HyperLogLog distinct-orderkey estimate from a 256-register "
    "sketch: bucket = top-8 hash bits, register = max leading-zero "
    "run (+1) of the rest.  MAX is idempotent/order-independent and "
    "2^-rho sums are exact dyadic rationals, so the raw estimator's "
    "single float division is reproduced bit-for-bit by the oracle — "
    "an oracle-checkable approximate distinct count (the raw "
    "estimator's valid n >> 2.5m regime; small-range linear counting "
    "is the small_range_lc option, tested outside the bit-exact "
    "gate).  Scale: the mergeable-distinct shape (union + re-max "
    "across shards/days); exact COUNT(DISTINCT) beside it shows the "
    "error (~2-6% at p=8).",
)
def sketch_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pg_analytics_spark.operators.dedup import _persist_sketch

    li = table(spark, sf_dir, "lineitem").selectExpr(
        "CAST(l_orderkey AS STRING) AS tok"
    )
    # ONE corpus scan AND one downstream pass: the exact arm needs
    # DISTINCT tok anyway, and HLL registers are max-idempotent — regs
    # over the distinct relation equal regs over the raw stream (r6 job
    # audit: 7 jobs / 2 scans → one scan).  r13 folds the remaining two
    # arms into one: the 256-row register shuffle carries a per-bucket
    # COUNT beside MAX(rho), so SUM(cnt) in the final 1-row aggregate
    # IS the exact distinct count — no second aggregate over the cached
    # relation, no crossJoin/broadcast job.
    from pg_analytics_spark.operators.sketches import hll_rho_sql

    dt = _persist_sketch(li.distinct())
    rem_bits = 32 - _HLL_P
    m = 1 << _HLL_P
    rem = f"(h32 % {1 << rem_bits})"
    slots = dt.select(
        shingle_hash32(F.col("tok")).alias("h32")
    ).selectExpr(
        f"CAST(h32 div {1 << rem_bits} AS BIGINT) AS bucket",
        f"{hll_rho_sql(rem, rem_bits)} AS rho",
    )
    regs = slots.groupBy("bucket").agg(
        F.max("rho").alias("rho"), F.count("*").alias("cnt")
    )
    agg = regs.agg(
        F.count("*").alias("nonzero_buckets"),
        F.sum(
            F.expr("1.0D / CAST(SHIFTLEFT(CAST(1 AS BIGINT), rho) AS DOUBLE)")
        ).alias("z_present"),
        F.sum("cnt").alias("exact_distinct"),
    )
    return agg.select(
        F.lit(m).cast("bigint").alias("m"),
        F.col("nonzero_buckets").cast("bigint").alias("nonzero_buckets"),
        (
            F.col("z_present")
            + (F.lit(m) - F.col("nonzero_buckets")).cast("double")
        ).alias("z"),
        "exact_distinct",
    ).select(
        "m",
        "nonzero_buckets",
        F.round("z", 6).alias("z_round"),
        F.round(F.lit(hll_alpha_m2(_HLL_P)) / F.col("z"), 4).alias(
            "hll_est"
        ),
        F.col("exact_distinct").cast("bigint").alias("exact_distinct"),
    )


# histogram layout for l_extendedprice in CENTS: [0, 11_059_200) in 32
# equal 345_600-cent bins — span chosen divisible by n_bins so the bin
# edges are exact integers.
_H_LO, _H_HI, _H_BINS = 0, 11_059_199, 32
_CENTS = "CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)"


def _hist_oracle_core() -> str:
    span = _H_HI - _H_LO + 1
    return f"""
    raw AS (SELECT {_CENTS} AS cents FROM lineitem),
    hist AS (
      SELECT CAST(GREATEST(0, LEAST({_H_BINS - 1},
               (cents - {_H_LO}) * {_H_BINS} // {span})) AS INT) AS bin,
             COUNT(*)::BIGINT AS cnt
      FROM raw GROUP BY 1
    )"""


@register(
    "stats_hist_extendedprice",
    oracle=f"""
    WITH {_hist_oracle_core()}
    SELECT bin, ({_H_LO} + bin * {(_H_HI - _H_LO + 1) // _H_BINS})::BIGINT AS bin_lo,
           cnt
    FROM hist ORDER BY bin
    """,
    doc="Mergeable equi-width histogram of l_extendedprice (cents): "
    "pure-BIGINT binning (decimal-staged cents, no float edges), one "
    "map-side-combinable shuffle of <= 32 rows per task.  The shape "
    "that computes distributions over 100 TB in one pass — per-shard "
    "histograms union+sum into the global one.",
)
def stats_hist_extendedprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").selectExpr(f"{_CENTS} AS cents")
    h = hist_build(li, "cents", lo=_H_LO, hi=_H_HI, n_bins=_H_BINS)
    bw = (_H_HI - _H_LO + 1) // _H_BINS
    return h.selectExpr(
        "bin", f"CAST({_H_LO} + bin * {bw} AS BIGINT) AS bin_lo", "cnt"
    ).orderBy("bin")


@register(
    "stats_quantile_hist",
    oracle=f"""
    WITH {_hist_oracle_core()},
    cum AS (
      SELECT bin, cnt,
             SUM(cnt) OVER (ORDER BY bin) AS cum,
             SUM(cnt) OVER (ORDER BY bin) - cnt AS cum_before,
             SUM(cnt) OVER () AS total
      FROM hist
    )
    SELECT q, ROUND({hist_quantile_est_sql(lo=_H_LO, hi=_H_HI, n_bins=_H_BINS)}, 6) AS est
    FROM cum,
         (VALUES (CAST('0.5' AS DOUBLE)), (CAST('0.9' AS DOUBLE)),
                 (CAST('0.99' AS DOUBLE))) qs(q)
    WHERE q * CAST(total AS DOUBLE) <= CAST(cum AS DOUBLE)
      AND (q * CAST(total AS DOUBLE) > CAST(cum_before AS DOUBLE)
           OR cum_before = 0)
    ORDER BY q
    """,
    doc="Histogram-interpolated quantiles (p50/p90/p99 of extended "
    "price in cents): rank located in the cumulative bin counts, "
    "linear interpolation inside the bin — the fixed float-op "
    "sequence is shared VERBATIM with the oracle "
    "(operators/sketches.hist_quantile_est_sql), so the approximate "
    "quantiles are value-exact cross-engine.  Scale: the single "
    "data pass is hist_build's; everything after is <= 32-row work.  "
    "This is how p99 latency/price is computed over 100 TB without a "
    "global sort.",
)
def stats_quantile_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").selectExpr(f"{_CENTS} AS cents")
    h = hist_build(li, "cents", lo=_H_LO, hi=_H_HI, n_bins=_H_BINS)
    return hist_quantiles(
        h, lo=_H_LO, hi=_H_HI, n_bins=_H_BINS, qs=[0.5, 0.9, 0.99]
    )


def _hll_tok_oracle() -> str:
    """Batch-SQL twin of the streaming sketch state over document
    tokens: exact token count (== CMS row-0 counter sum) + HLL raw
    estimate, same fragments as _hll_oracle."""
    m = 1 << _HLL_P
    rem_bits = 32 - _HLL_P
    am2 = hll_alpha_m2(_HLL_P)
    return f"""
    WITH tok AS (SELECT unnest({_TOKS}) AS tok FROM documents),
    h AS (SELECT {_H32} AS h32 FROM tok),
    slots AS (
      SELECT h32 // {1 << rem_bits} AS bucket,
             CASE WHEN h32 % {1 << rem_bits} = 0 THEN {rem_bits + 1}
                  ELSE {rem_bits} + 1 - length(bin(h32 % {1 << rem_bits}))
             END AS rho
      FROM h
    ),
    regs AS (SELECT bucket, MAX(rho) AS rho FROM slots GROUP BY bucket),
    agg AS (
      SELECT COUNT(*)::BIGINT AS nonzero_buckets,
             SUM(1.0 / CAST((1::BIGINT << rho) AS DOUBLE)) AS z_present
      FROM regs
    )
    SELECT (SELECT COUNT(*)::BIGINT FROM tok) AS total_tokens,
           nonzero_buckets,
           ROUND(CAST('{am2!r}' AS DOUBLE)
                 / (z_present + CAST({m} - nonzero_buckets AS DOUBLE)), 4)
             AS hll_est
    FROM agg
    """


@register(
    "streaming_sketch_ingest",
    oracle=_hll_tok_oracle(),
    doc="Sketch maintenance on the REAL streaming path "
    "(streaming/sketch_ingest.py: readStream → per-batch CMS/HLL "
    "partials → union+re-agg state swap → monitoring row per batch) "
    "under the value-exact gate: after the availableNow drain the "
    "final state's exact token total (CMS row-0 counter sum) and raw "
    "HLL estimate must equal the batch sketches bit-for-bit — "
    "mergeability makes the streaming twin exact for any batch "
    "order/count (the forced multi-batch case is pinned in "
    "tests/test_streaming.py).",
)
def streaming_sketch_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from pg_analytics_spark.streaming.sketch_ingest import ingest_sketches

    docs = table(spark, sf_dir, "documents")
    with scratch_dir(spark) as work:
        ingest_sketches(
            spark,
            f"{sf_dir}/documents.parquet",
            f"{work}/state",
            f"{work}/monitor",
            f"{work}/ckpt",
            docs.schema,
        )
        last = (
            spark.read.parquet(f"{work}/monitor")
            .orderBy(F.desc("batch_id"))
            .limit(1)
            .collect()[0]
        )
    return spark.createDataFrame(
        [
            (
                int(last["total_tokens"]),
                int(last["nonzero_buckets"]),
                float(last["hll_est"]),
            )
        ],
        "total_tokens BIGINT, nonzero_buckets BIGINT, hll_est DOUBLE",
    )


def _hll_daily_oracle() -> str:
    m = 1 << _HLL_P
    rem_bits = 32 - _HLL_P
    am2 = hll_alpha_m2(_HLL_P)
    h32 = "(('0x' || substr(md5(user_id::VARCHAR), 1, 8))::BIGINT)"
    return f"""
    WITH ev AS (SELECT CAST(ts AS DATE) AS day, user_id, {h32} AS h32 FROM events),
    slots AS (
      SELECT day, h32 // {1 << rem_bits} AS bucket,
             CASE WHEN h32 % {1 << rem_bits} = 0 THEN {rem_bits + 1}
                  ELSE {rem_bits} + 1 - length(bin(h32 % {1 << rem_bits}))
             END AS rho
      FROM ev
    ),
    regs AS (SELECT day, bucket, MAX(rho) AS rho FROM slots GROUP BY day, bucket),
    agg AS (
      SELECT day, COUNT(*)::BIGINT AS nonzero_buckets,
             SUM(1.0 / CAST((1::BIGINT << rho) AS DOUBLE)) AS z_present
      FROM regs GROUP BY day
    ),
    exact AS (
      SELECT day, COUNT(DISTINCT user_id)::BIGINT AS exact_distinct
      FROM ev GROUP BY day
    )
    SELECT a.day, e.exact_distinct, a.nonzero_buckets,
           ROUND(CAST('{am2!r}' AS DOUBLE)
                 / (a.z_present + CAST({m} - a.nonzero_buckets AS DOUBLE)), 4)
             AS hll_est
    FROM agg a JOIN exact e USING (day)
    ORDER BY day
    """


@register(
    "sketch_hll_daily_users",
    oracle=_hll_daily_oracle(),
    doc="Per-day distinct-user HLL — the sketch-per-group rollup-tree "
    "shape: one (day, bucket) register relation answers every day's "
    "distinct count, and re-maxing day registers rolls up to "
    "week/month/total WITHOUT re-touching events "
    "(tests/test_sketches.py pins rollup == direct-build).  Estimates "
    "are value-exact cross-engine (exact-dyadic Z + one division), "
    "exact COUNT(DISTINCT) beside them shows the per-day error.  "
    "Scale: the shuffle carries <= days × 2^p register rows — the "
    "daily-active-users query over 100 TB of events in one pass.",
)
def sketch_hll_daily_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pg_analytics_spark.operators.sketches import (
        hll_build_grouped,
        hll_estimate_grouped,
    )

    ev = table(spark, sf_dir, "events").select(
        F.col("ts").cast("date").alias("day"),
        "user_id",
        shingle_hash32(F.col("user_id").cast("string")).alias("h32"),
    )
    regs = hll_build_grouped(ev, "h32", ["day"], precision=_HLL_P)
    est = hll_estimate_grouped(regs, ["day"], precision=_HLL_P)
    exact = ev.groupBy("day").agg(
        F.count_distinct("user_id").alias("exact_distinct")
    )
    return (
        est.join(exact, "day")
        .select("day", "exact_distinct", "nonzero_buckets", "hll_est")
        .orderBy("day")
    )


def _hll_overlap_oracle() -> str:
    m = 1 << _HLL_P
    rem_bits = 32 - _HLL_P
    am2 = hll_alpha_m2(_HLL_P)
    h32 = "(('0x' || substr(md5(user_id::VARCHAR), 1, 8))::BIGINT)"
    est = (
        f"ROUND(CAST('{am2!r}' AS DOUBLE) / (z_present + "
        f"CAST({m} - nonzero_buckets AS DOUBLE)), 4)"
    )
    return f"""
    WITH ev AS (
      SELECT CASE WHEN event_type = 'click' THEN 'a' ELSE 'b' END AS cohort,
             user_id, {h32} AS h32
      FROM events WHERE event_type IN ('click', 'purchase')
    ),
    slots AS (
      SELECT cohort, h32 // {1 << rem_bits} AS bucket,
             CASE WHEN h32 % {1 << rem_bits} = 0 THEN {rem_bits + 1}
                  ELSE {rem_bits} + 1 - length(bin(h32 % {1 << rem_bits}))
             END AS rho
      FROM ev
    ),
    regs AS (
      SELECT cohort, bucket, MAX(rho) AS rho FROM slots GROUP BY 1, 2
    ),
    uregs AS (SELECT bucket, MAX(rho) AS rho FROM regs GROUP BY bucket),
    per AS (
      SELECT cohort, COUNT(*)::BIGINT AS nonzero_buckets,
             SUM(1.0 / CAST((1::BIGINT << rho) AS DOUBLE)) AS z_present
      FROM regs GROUP BY cohort
    ),
    uni AS (
      SELECT COUNT(*)::BIGINT AS nonzero_buckets,
             SUM(1.0 / CAST((1::BIGINT << rho) AS DOUBLE)) AS z_present
      FROM uregs
    ),
    ests AS (
      SELECT MAX(CASE WHEN cohort = 'a' THEN e END) AS est_a,
             MAX(CASE WHEN cohort = 'b' THEN e END) AS est_b
      FROM (SELECT cohort, {est} AS e FROM per)
    ),
    uest AS (SELECT {est} AS est_union FROM uni),
    exact AS (
      SELECT COUNT(DISTINCT CASE WHEN cohort = 'a' THEN user_id END)::BIGINT
               AS exact_a,
             COUNT(DISTINCT CASE WHEN cohort = 'b' THEN user_id END)::BIGINT
               AS exact_b,
             COUNT(DISTINCT user_id)::BIGINT AS exact_union
      FROM ev
    ),
    exact_i AS (
      SELECT COUNT(*)::BIGINT AS exact_overlap FROM (
        SELECT user_id FROM ev WHERE cohort = 'a'
        INTERSECT
        SELECT user_id FROM ev WHERE cohort = 'b'
      )
    )
    SELECT exact_a, exact_b, exact_union, exact_overlap,
           est_a, est_b, est_union,
           ROUND(est_a + est_b - est_union, 4) AS est_overlap
    FROM ests, uest, exact, exact_i
    """


@register(
    "sketch_hll_overlap",
    oracle=_hll_overlap_oracle(),
    doc="HLL SET OPERATIONS — audience overlap without re-touching "
    "events: per-cohort registers (clickers vs purchasers), union by "
    "RE-MAXING the two register sets (exact for HLL — the union "
    "sketch equals the sketch of the unioned stream), intersection "
    "by inclusion-exclusion est_a + est_b - est_union (the standard "
    "estimator; no sketch intersects exactly).  All three estimates "
    "and the overlap are value-exact cross-engine (exact-dyadic Z, "
    "one division each, one fixed-order subtraction); the exact "
    "counts sit beside them showing the error.  Scale: cohort "
    "registers are 2^p rows each — the 'how many buyers also "
    "clicked' question over 100 TB of events in one pass, composable "
    "to any number of cohorts.",
)
def sketch_hll_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pg_analytics_spark.operators.sketches import (
        hll_build_grouped,
        hll_estimate_grouped,
    )

    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    ).select(
        F.when(F.col("event_type") == "click", "a").otherwise("b").alias(
            "cohort"
        ),
        "user_id",
        shingle_hash32(F.col("user_id").cast("string")).alias("h32"),
    )
    regs = hll_build_grouped(ev, "h32", ["cohort"], precision=_HLL_P)
    from pg_analytics_spark.operators.dedup import _persist_sketch

    regs = _persist_sketch(regs)
    per = hll_estimate_grouped(regs, ["cohort"], precision=_HLL_P)
    uregs = regs.groupBy("bucket").agg(F.max("rho").alias("rho"))
    uni = hll_estimate(uregs, precision=_HLL_P)
    ests = per.groupBy().agg(
        F.max(F.when(F.col("cohort") == "a", F.col("hll_est"))).alias("est_a"),
        F.max(F.when(F.col("cohort") == "b", F.col("hll_est"))).alias("est_b"),
    )
    exact = ev.groupBy().agg(
        F.count_distinct(
            F.when(F.col("cohort") == "a", F.col("user_id"))
        ).alias("exact_a"),
        F.count_distinct(
            F.when(F.col("cohort") == "b", F.col("user_id"))
        ).alias("exact_b"),
        F.count_distinct("user_id").alias("exact_union"),
    )
    a_users = ev.filter("cohort = 'a'").select("user_id").distinct()
    b_users = ev.filter("cohort = 'b'").select("user_id").distinct()
    exact_i = a_users.join(b_users, "user_id").agg(
        F.count("*").alias("exact_overlap")
    )
    return (
        exact.crossJoin(F.broadcast(exact_i))
        .crossJoin(F.broadcast(ests))
        .crossJoin(F.broadcast(uni.select(F.col("hll_est").alias("est_union"))))
        .select(
            "exact_a", "exact_b", "exact_union", "exact_overlap",
            "est_a", "est_b", "est_union",
            F.round(
                F.col("est_a") + F.col("est_b") - F.col("est_union"), 4
            ).alias("est_overlap"),
        )
    )


# --------------------------------------------------------------------- #
# KMV / bottom-k theta sketch — distinct + set DIFFERENCE estimates
# --------------------------------------------------------------------- #

_KMV_K = 256
_KMV_D_INT = 1 << 60
_KMV_D = repr(float(_KMV_D_INT))  # 2^60 — exactly representable
_KMV_NUM = repr(float((_KMV_K - 1) * _KMV_D_INT))  # (k-1)·2^60, exact
_KMV_H = "(('0x' || substr(md5(user_id::VARCHAR), 1, 15))::BIGINT)"


def _kmv_oracle() -> str:
    k = _KMV_K
    return f"""
    WITH ev AS (
      SELECT CASE WHEN event_type = 'click' THEN 'a' ELSE 'b' END AS cohort,
             user_id
      FROM events WHERE event_type IN ('click', 'purchase')
    ),
    hs AS (SELECT DISTINCT cohort, {_KMV_H} AS h FROM ev),
    sk AS (
      SELECT cohort, h,
             row_number() OVER (PARTITION BY cohort ORDER BY h) AS rn
      FROM hs QUALIFY rn <= {k}
    ),
    per AS (
      SELECT cohort, COUNT(*)::BIGINT AS n_in,
             MAX(CASE WHEN rn = {k} THEN h END) AS kth
      FROM sk GROUP BY cohort
    ),
    ests AS (
      SELECT MAX(CASE WHEN cohort = 'a' THEN e END) AS est_a,
             MAX(CASE WHEN cohort = 'b' THEN e END) AS est_b
      FROM (
        SELECT cohort,
               ROUND(CASE WHEN n_in < {k} THEN n_in::DOUBLE
                          ELSE CAST({_KMV_NUM} AS DOUBLE) / kth::DOUBLE
                     END, 4) AS e
        FROM per
      )
    ),
    th AS (
      SELECT LEAST(
        COALESCE(MAX(CASE WHEN cohort = 'a' AND rn = {k} THEN h END),
                 {_KMV_D_INT}),
        COALESCE(MAX(CASE WHEN cohort = 'b' AND rn = {k} THEN h END),
                 {_KMV_D_INT})) AS theta
      FROM sk
    ),
    ab AS (
      SELECT COUNT(CASE WHEN b.h IS NOT NULL THEN 1 END)::BIGINT AS n_inter,
             COUNT(CASE WHEN b.h IS NULL THEN 1 END)::BIGINT AS n_a_only
      FROM (SELECT h FROM sk WHERE cohort = 'a') a
      LEFT JOIN (SELECT h FROM sk WHERE cohort = 'b') b USING (h)
      CROSS JOIN th
      WHERE a.h < theta
    ),
    bb AS (
      SELECT COUNT(*)::BIGINT AS n_b_below
      FROM sk CROSS JOIN th WHERE cohort = 'b' AND h < theta
    ),
    exact AS (
      SELECT COUNT(DISTINCT CASE WHEN cohort = 'a' THEN user_id END)::BIGINT
               AS exact_a,
             COUNT(DISTINCT CASE WHEN cohort = 'b' THEN user_id END)::BIGINT
               AS exact_b
      FROM ev
    ),
    exact_ao AS (
      SELECT COUNT(*)::BIGINT AS exact_a_only FROM (
        SELECT user_id FROM ev WHERE cohort = 'a'
        EXCEPT
        SELECT user_id FROM ev WHERE cohort = 'b'
      )
    )
    SELECT exact_a, exact_b, exact_a_only, est_a, est_b,
           ROUND(n_inter::DOUBLE *
                 (CAST({_KMV_D} AS DOUBLE) / theta::DOUBLE), 4)
             AS est_intersection,
           ROUND(n_a_only::DOUBLE *
                 (CAST({_KMV_D} AS DOUBLE) / theta::DOUBLE), 4)
             AS est_a_only,
           ROUND(n_inter::DOUBLE /
                 (n_inter + n_a_only + n_b_below - n_inter)::DOUBLE, 4)
             AS est_jaccard
    FROM exact, exact_ao, ests, th, ab, bb
    """


@register(
    "sketch_kmv_distinct_diff",
    oracle=_kmv_oracle(),
    doc="KMV / bottom-k theta sketch — the mergeable distinct sketch "
    "that supports SET DIFFERENCE, which HLL structurally cannot: "
    "below θ = min(kth_a, kth_b) each sketch holds the COMPLETE "
    "distinct-hash set of its stream, so intersection / A−B / "
    "Jaccard are sample counts scaled by 2^60/θ (Beyer et al., "
    "SIGMOD'07).  Clickers-vs-purchasers over events: estimates AND "
    "exact counts side by side, all value-exact cross-engine (md5 "
    "bottom-k is order-free; one constant division each).  Scale: "
    "row_number≤k compiles to WindowGroupLimit — map tasks keep only "
    "their local bottom-k BEFORE the shuffle (plan-asserted), the "
    "overlap algebra runs on ≤ k-row broadcast relations.",
)
def sketch_kmv_distinct_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pg_analytics_spark.functions.hashing import shingle_hash60
    from pg_analytics_spark.operators.dedup import _persist_sketch
    from pg_analytics_spark.operators.sketches import (
        kmv_build_grouped,
        kmv_estimate_grouped,
        kmv_overlap,
    )

    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    ).select(
        F.when(F.col("event_type") == "click", "a").otherwise("b").alias(
            "cohort"
        ),
        "user_id",
    )
    hdf = ev.select(
        "cohort", shingle_hash60(F.col("user_id").cast("string")).alias("h60")
    )
    sk = _persist_sketch(kmv_build_grouped(hdf, "h60", ["cohort"], k=_KMV_K))
    per = kmv_estimate_grouped(sk, ["cohort"], k=_KMV_K)
    ests = per.groupBy().agg(
        F.max(F.when(F.col("cohort") == "a", F.col("kmv_est"))).alias("est_a"),
        F.max(F.when(F.col("cohort") == "b", F.col("kmv_est"))).alias("est_b"),
    )
    ov = kmv_overlap(sk, ["cohort"], "a", "b", k=_KMV_K)
    # exact counts in ONE aggregation pipeline (per-user cohort flags
    # → three conditional counts) — the count_distinct + anti-join
    # formulation paid extra shuffles and broadcast jobs (r8 audit)
    flags = ev.groupBy("user_id").agg(
        F.max(F.col("cohort") == "a").alias("in_a"),
        F.max(F.col("cohort") == "b").alias("in_b"),
    )
    exact = flags.agg(
        F.count_if("in_a").alias("exact_a"),
        F.count_if("in_b").alias("exact_b"),
        F.count_if(F.col("in_a") & ~F.col("in_b")).alias("exact_a_only"),
    )
    return (
        exact.crossJoin(F.broadcast(ests))
        .crossJoin(F.broadcast(ov))
        .select(
            "exact_a", "exact_b", "exact_a_only", "est_a", "est_b",
            "est_intersection", "est_a_only", "est_jaccard",
        )
    )
