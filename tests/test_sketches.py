"""Sketch operators (operators/sketches.py): mergeability — the
property that makes each sketch a 100 TB rollup primitive — plus the
estimators' error-direction guarantees.

Oracle-side value exactness is covered by the registry gate
(workload/sketch.py entries in tools/check.py); these tests pin the
algebraic properties the gate can't see.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pg_analytics_spark.functions.hashing import shingle_hash32
from pg_analytics_spark.operators.sketches import (
    cms_build,
    cms_estimate,
    hist_build,
    hist_quantiles,
    hll_build,
    hll_estimate,
)
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def tokens(spark):
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    return (
        d.select(
            "doc_id",
            F.explode(
                F.filter(F.split(F.lower("text"), r"\s+"), lambda x: x != "")
            ).alias("tok"),
        )
        .select("doc_id", "tok", shingle_hash32(F.col("tok")).alias("h32"))
        .cache()
    )


def test_cms_never_underestimates(spark, tokens):
    sketch = cms_build(tokens.select("h32"), "h32", depth=4, width=256)
    exact = (
        tokens.groupBy("tok")
        .agg(F.count("*").alias("exact"), F.first("h32").alias("h32"))
    )
    est = cms_estimate(sketch, exact, "h32", depth=4, width=256)
    bad = est.filter(F.col("cms_est") < F.col("exact")).count()
    assert bad == 0  # one-sided error: est >= exact for EVERY item


def test_cms_merges_by_counter_addition(spark, tokens):
    """CMS(shard A) + CMS(shard B) == CMS(A ∪ B): counters are sums."""
    a = tokens.filter(F.col("doc_id") % 2 == 0).select("h32")
    b = tokens.filter(F.col("doc_id") % 2 == 1).select("h32")
    whole = cms_build(tokens.select("h32"), "h32", depth=3, width=128)
    merged = (
        cms_build(a, "h32", depth=3, width=128)
        .unionByName(cms_build(b, "h32", depth=3, width=128))
        .groupBy("r", "c")
        .agg(F.sum("cnt").alias("cnt"))
    )
    assert sorted(map(tuple, whole.collect())) == sorted(
        map(tuple, merged.collect())
    )


def test_hll_merges_by_register_max(spark, tokens):
    a = tokens.filter(F.col("doc_id") % 2 == 0).select("h32")
    b = tokens.filter(F.col("doc_id") % 2 == 1).select("h32")
    whole = hll_build(tokens.select("h32"), "h32", precision=6)
    merged = (
        hll_build(a, "h32", precision=6)
        .unionByName(hll_build(b, "h32", precision=6))
        .groupBy("bucket")
        .agg(F.max("rho").alias("rho"))
    )
    assert sorted(map(tuple, whole.collect())) == sorted(
        map(tuple, merged.collect())
    )


def test_hll_estimate_within_expected_error(spark):
    """Raw HLL at m=64 over ~1.5k distinct orderkeys (n >> 2.5m, the
    raw estimator's valid regime): relative error ~1.04/sqrt(64) = 13%,
    allow ~2 sigma.  Duplicates must not move the estimate."""
    keys = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        shingle_hash32(F.col("l_orderkey").cast("string")).alias("h32")
    )
    est = hll_estimate(hll_build(keys, "h32", precision=6), precision=6)
    n_exact = keys.distinct().count()
    n_est = est.collect()[0]["hll_est"]
    assert abs(n_est - n_exact) / n_exact < 0.30
    doubled = hll_estimate(
        hll_build(keys.unionByName(keys), "h32", precision=6), precision=6
    )
    assert doubled.collect()[0]["hll_est"] == n_est


def test_hll_small_range_linear_counting(spark, tokens):
    """The 31-distinct-token corpus is the small-range regime where the
    raw estimator badly overestimates; the linear-counting column must
    recover the true cardinality (classic V-empty-buckets estimator)."""
    n_exact = tokens.select("tok").distinct().count()
    est = hll_estimate(
        hll_build(tokens.select("h32"), "h32", precision=8),
        precision=8,
        small_range_lc=True,
    ).collect()[0]
    assert est["hll_est"] > 2 * n_exact  # raw is wrong here, by design
    assert abs(est["lc_est"] - n_exact) / n_exact < 0.15


def test_hist_merges_by_count_addition(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").selectExpr(
        "CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS cents",
        "l_orderkey",
    )
    kw = dict(lo=0, hi=11_059_199, n_bins=32)
    whole = hist_build(li, "cents", **kw)
    merged = (
        hist_build(li.filter("l_orderkey % 2 = 0"), "cents", **kw)
        .unionByName(hist_build(li.filter("l_orderkey % 2 = 1"), "cents", **kw))
        .groupBy("bin")
        .agg(F.sum("cnt").alias("cnt"))
    )
    assert sorted(map(tuple, whole.collect())) == sorted(
        map(tuple, merged.collect())
    )


def test_hist_quantiles_bracket_exact(spark):
    """Histogram p50/p99 must land within one bin width of the exact
    percentile (linear interpolation cannot leave the bracketing bin)."""
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").selectExpr(
        "CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS cents"
    )
    kw = dict(lo=0, hi=11_059_199, n_bins=32)
    bw = (kw["hi"] - kw["lo"] + 1) // kw["n_bins"]
    h = hist_build(li, "cents", **kw)
    ests = {
        r["q"]: r["est"]
        for r in hist_quantiles(h, qs=[0.5, 0.99], **kw).collect()
    }
    exact = li.selectExpr(
        "percentile(cents, 0.5) AS p50", "percentile(cents, 0.99) AS p99"
    ).collect()[0]
    assert abs(ests[0.5] - exact["p50"]) <= bw
    assert abs(ests[0.99] - exact["p99"]) <= bw


def test_cms_out_of_vocabulary_estimates_from_zero_counters(spark, tokens):
    """An item never inserted can still collide, but with width >>
    distinct items its min-counter should hit an absent (=0) slot."""
    sketch = cms_build(tokens.select("h32"), "h32", depth=4, width=1 << 16)
    probe = spark.range(1).select(
        shingle_hash32(F.lit("zzz-never-in-corpus")).alias("h32")
    )
    est = cms_estimate(sketch, probe, "h32", depth=4, width=1 << 16)
    assert est.collect()[0]["cms_est"] == 0


def test_hll_grouped_rollup_equals_direct_build(spark):
    """Day-level registers re-maxed across days == registers built
    directly on the whole corpus: the rollup-tree property that lets
    day→month→total distinct counts come from sketches alone."""
    from pg_analytics_spark.operators.sketches import hll_build_grouped

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").selectExpr(
        "CAST(ts AS DATE) AS day",
        "CAST(conv(substr(md5(CAST(user_id AS STRING)), 1, 8), 16, 10) AS BIGINT) AS h32",
    )
    daily = hll_build_grouped(ev, "h32", ["day"], precision=6)
    rolled = daily.groupBy("bucket").agg(F.max("rho").alias("rho"))
    direct = hll_build(ev.select("h32"), "h32", precision=6)
    assert sorted(map(tuple, rolled.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_hist_quantiles_q_zero_returns_first_bin(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").selectExpr(
        "CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS cents"
    )
    kw = dict(lo=0, hi=11_059_199, n_bins=32)
    h = hist_build(li, "cents", **kw)
    ests = {r["q"]: r["est"] for r in hist_quantiles(h, qs=[0.0, 0.5], **kw).collect()}
    assert 0.0 in ests and 0.5 in ests  # q=0 no longer silently absent
    assert ests[0.0] <= ests[0.5]


def test_kmv_estimate_exact_when_not_full_and_bounded_when_full(spark):
    """KMV: sketch-not-full → estimate IS the exact distinct count;
    full sketch → (k-1)/u_k lands within the theoretical relative
    error (~1/sqrt(k-2), generously doubled here)."""
    from pg_analytics_spark.functions.hashing import shingle_hash60
    from pg_analytics_spark.operators.sketches import (
        kmv_build_grouped,
        kmv_estimate_grouped,
    )

    df = spark.range(5000).select(
        F.when(F.col("id") < 100, "small").otherwise("big").alias("g"),
        shingle_hash60(F.col("id").cast("string")).alias("h60"),
    )
    sk = kmv_build_grouped(df, "h60", ["g"], k=256)
    est = {r["g"]: r for r in kmv_estimate_grouped(sk, ["g"], k=256).collect()}
    assert est["small"]["kmv_est"] == 100.0  # not full → exact
    assert est["small"]["kth"] is None
    big = est["big"]["kmv_est"]
    assert abs(big - 4900) / 4900 < 2 / (254 ** 0.5)


def test_kmv_overlap_set_algebra(spark):
    """Intersection / A-only / Jaccard estimates from two KMV
    sketches track the exact values; with BOTH sketches not full the
    estimates are EXACT (θ = 2^60 covers the whole stream)."""
    from pg_analytics_spark.functions.hashing import shingle_hash60
    from pg_analytics_spark.operators.sketches import (
        kmv_build_grouped,
        kmv_overlap,
    )

    # a = 0..149, b = 100..249 → inter 50, a_only 100, union 250
    rows = [("a", i) for i in range(150)] + [("b", i) for i in range(100, 250)]
    df = spark.createDataFrame(rows, "g string, id long").select(
        "g", shingle_hash60(F.col("id").cast("string")).alias("h60")
    )
    sk = kmv_build_grouped(df, "h60", ["g"], k=256)
    row = kmv_overlap(sk, ["g"], "a", "b", k=256).collect()[0]
    assert row["est_intersection"] == 50.0
    assert row["est_a_only"] == 100.0
    assert row["est_jaccard"] == round(50 / 250, 4)


def test_kmv_union_merge_equals_direct_build(spark):
    """Bottom-k of the union == bottom-k of the merged sketches: the
    mergeability law a 100 TB rollup tree needs."""
    from pg_analytics_spark.functions.hashing import shingle_hash60
    from pg_analytics_spark.operators.sketches import kmv_build_grouped

    df = spark.range(3000).select(
        (F.col("id") % 2).alias("g"),
        shingle_hash60(F.col("id").cast("string")).alias("h60"),
    )
    per = kmv_build_grouped(df, "h60", ["g"], k=64)
    merged = kmv_build_grouped(
        per.select(F.lit(1).alias("u"), F.col("h").alias("h60")),
        "h60", ["u"], k=64,
    ).select("h", "rn")
    direct = kmv_build_grouped(
        df.select(F.lit(1).alias("u"), "h60"), "h60", ["u"], k=64
    ).select("h", "rn")
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )
