"""int8 coarse-probe + fp re-rank ANN (operators/similarity.
int8_adc_rerank_topk): recall vs the exact baseline, integer-exact
coarse scores, degenerate-dimension handling, plan shape."""

from __future__ import annotations

import pytest

from pg_analytics_spark.operators.similarity import (
    brute_force_topk,
    int8_adc_rerank_topk,
)


def _codebook(spark, df):
    from pg_analytics_spark.functions.vectors import int8_stats_lists

    return int8_stats_lists(df, "embedding")


def test_rerank_topk_matches_bruteforce_top1(spark):
    """The top hit (the query vector itself, sim 1.0) must survive
    quantization; shortlist recall vs exact top-10 should be high on
    the fixture corpus."""
    emb = spark.table("embeddings")
    qvec = emb.filter("vec_id = 0").select("embedding").first()[0]
    mns, mxs = _codebook(spark, emb)
    got = int8_adc_rerank_topk(
        emb, "embedding", "vec_id", qvec, mns, mxs, shortlist=50, k=10
    ).collect()
    exact = brute_force_topk(emb, "embedding", "vec_id", qvec, k=10).collect()
    assert got[0]["vec_id"] == 0 and got[0]["sim"] == 1.0
    got_ids = {r["vec_id"] for r in got}
    exact_ids = {r["vec_id"] for r in exact}
    # re-ranked sims are the EXACT cosine — any overlap agrees exactly
    exact_sim = {r["vec_id"]: r["sim"] for r in exact}
    for r in got:
        if r["vec_id"] in exact_sim:
            assert r["sim"] == exact_sim[r["vec_id"]]
    assert len(got_ids & exact_ids) >= 7  # shortlist recall on fixture


def test_coarse_approximates_true_dot(spark):
    """Reconstruction-ADC: the coarse score of the query against
    itself approximates its true squared norm within the grid's
    reconstruction error."""
    emb = spark.table("embeddings")
    qvec = emb.filter("vec_id = 0").select("embedding").first()[0]
    mns, mxs = _codebook(spark, emb)
    rows = int8_adc_rerank_topk(
        emb, "embedding", "vec_id", qvec, mns, mxs, shortlist=5, k=5
    ).collect()
    self_row = [r for r in rows if r["vec_id"] == 0][0]
    true_sq = sum(float(v) * float(v) for v in qvec)
    # per-dim reconstruction error <= step/2 = (mx-mn)/510
    bound = sum(
        abs(float(q)) * (mx - mn) / 510.0 * 2.5 + ((mx - mn) / 510.0) ** 2
        for q, mn, mx in zip(qvec, mns, mxs)
    )
    assert abs(self_row["coarse"] - true_sq) <= bound


def test_degenerate_dimension_contributes_zero(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 5.0]), (1, [2.0, 5.0]), (2, [3.0, 5.0])],
        "vec_id bigint, embedding array<double>",
    )
    # dim 1 is constant -> mn == mx -> reconstructs to the constant 5
    rows = int8_adc_rerank_topk(
        df, "embedding", "vec_id", [1.0, 5.0],
        mns=[1.0, 5.0], mxs=[3.0, 5.0], shortlist=3, k=3,
    ).collect()
    # coarse(v) = deq(v0) * 1.0 + 5 * 5, deq on the 255-step grid
    # (2.0 snaps to code round(127.5) = 128 -> 1 + 128/255*2)
    def deq(v):
        return 1.0 + round((v - 1.0) / 2.0 * 255) / 255.0 * 2.0

    got = {r["vec_id"]: r["coarse"] for r in rows}
    for vid, v in ((0, 1.0), (1, 2.0), (2, 3.0)):
        assert abs(got[vid] - (deq(v) * 1.0 + 25.0)) < 1e-6
    # re-rank still orders by exact cosine
    assert rows[0]["vec_id"] == 0 and rows[0]["sim"] == 1.0


def test_rerank_plan_no_shuffle_before_takeordered(spark):
    """Coarse stage is scan -> codegen fold -> TakeOrdered: no
    Exchange before the shortlist materializes (the int8 column scan
    at 100 TB must not shuffle the corpus)."""
    emb = spark.table("embeddings")
    qvec = emb.filter("vec_id = 0").select("embedding").first()[0]
    from pg_analytics_spark.functions.vectors import int8_stats_lists

    mns, mxs = int8_stats_lists(emb, "embedding")
    df = int8_adc_rerank_topk(
        emb, "embedding", "vec_id", qvec, mns, mxs, shortlist=50, k=10
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrdered" in plan, plan
    assert "Exchange" not in plan, plan
    assert "Join" not in plan, plan
