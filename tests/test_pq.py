"""Product quantization (operators/similarity.py PQ section): code
validity, the training-improves-quantization contract, and ADC recall
against the exact inner-product ranking.

The oracle gate (sim_ann_pq_topk) pins cross-engine value exactness of
the seeded-codebook pipeline; these tests pin what the gate can't —
that training helps and that the compressed scan ranks usefully.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from pg_analytics_spark.operators.similarity import (
    pq_adc_topk,
    pq_encode,
    pq_seed_codebooks,
    pq_topk_rerank,
    train_pq_codebooks,
)
from tests.conftest import SF_DIR

M_SUBS, N_CODES, DIM = 4, 8, 64


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


def _recon_mse(emb, books) -> float:
    """Mean squared reconstruction error of the PQ encoding — computed
    IN Spark (decode = centroid lookup per subspace) so no vector ever
    reaches the driver."""
    sub_dim = DIM // M_SUBS
    codes = pq_encode(emb, "embedding", "vec_id", books)
    joined = emb.join(codes, "vec_id")
    terms = []
    for m in range(M_SUBS):
        cents = ", ".join(
            "array(" + ", ".join(f"{float(w)!r}D" for w in c) + ")"
            for c in books[m]
        )
        sub = f"slice(embedding, {m * sub_dim + 1}, {sub_dim})"
        recon = f"element_at(array({cents}), element_at(codes, {m + 1}))"
        terms.append(
            f"aggregate(zip_with({sub}, {recon}, "
            "(x, w) -> (cast(x AS double) - w) * (cast(x AS double) - w)), "
            "0.0D, (acc, x) -> acc + x)"
        )
    err = " + ".join(f"({t})" for t in terms)
    return joined.selectExpr(f"avg(({err}) / {DIM}) AS mse").collect()[0]["mse"]


def test_pq_codes_shape_and_range(emb):
    codes = pq_encode(emb, "embedding", "vec_id", pq_seed_codebooks(DIM, M_SUBS, N_CODES))
    stats = codes.selectExpr(
        "min(size(codes)) AS lo_n",
        "max(size(codes)) AS hi_n",
        "min(array_min(codes)) AS lo",
        "max(array_max(codes)) AS hi",
    ).collect()[0]
    assert stats["lo_n"] == stats["hi_n"] == M_SUBS
    assert stats["lo"] >= 1 and stats["hi"] <= N_CODES


def test_pq_training_reduces_reconstruction_error(emb):
    seeded = pq_seed_codebooks(DIM, M_SUBS, N_CODES)
    trained = train_pq_codebooks(
        emb, "embedding", DIM, m_subs=M_SUBS, n_codes=N_CODES, n_iters=3
    )
    mse_seeded = _recon_mse(emb, seeded)
    mse_trained = _recon_mse(emb, trained)
    assert mse_trained < mse_seeded * 0.8  # Lloyd's must cut error >20%


def test_pq_adc_recall_improves_with_training(emb):
    """ADC top-10 vs the exact inner-product top-10, at the finer
    8-sub × 16-code config (8 bytes/vector, still 32x smaller than
    fp32).  Near-random 64-dim noise is the recall WORST case for any
    compressed scan (SCALE.md's recall tables); pinned contracts:
    training is monotone (trained >= seeded), the trained ADC-only
    overlap clears a floor (measured 0.3), and the production
    ADC->exact-re-rank shape recovers most of the rest (measured 0.8
    at C=100).  The C dial is the recall/scan-volume trade."""
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    ws = ", ".join(f"{float(x)!r}D" for x in qvec)
    exact = set(
        r["vec_id"]
        for r in emb.selectExpr(
            "vec_id",
            f"aggregate(zip_with(embedding, array({ws}), "
            "(x, w) -> cast(x AS double) * w), 0.0D, (acc, x) -> acc + x) AS dot",
        )
        .orderBy(F.desc("dot"), "vec_id")
        .limit(10)
        .collect()
    )

    def recall(books):
        got = set(
            r["vec_id"]
            for r in pq_adc_topk(
                emb, "embedding", "vec_id", qvec, books, k=10
            ).collect()
        )
        return len(got & exact) / 10

    seeded = recall(pq_seed_codebooks(DIM, 8, 16))
    trained_books = train_pq_codebooks(
        emb, "embedding", DIM, m_subs=8, n_codes=16, n_iters=3
    )
    trained = recall(trained_books)
    assert trained >= seeded
    assert trained >= 0.2

    reranked = set(
        r["vec_id"]
        for r in pq_topk_rerank(
            emb, "embedding", "vec_id", qvec, trained_books, k=10,
            n_candidates=100,
        ).collect()
    )
    assert len(reranked & exact) / 10 >= 0.6


def test_pq_encode_is_deterministic(emb):
    books = pq_seed_codebooks(DIM, M_SUBS, N_CODES)
    a = sorted(map(tuple, pq_encode(emb, "embedding", "vec_id", books).collect()))
    b = sorted(map(tuple, pq_encode(emb, "embedding", "vec_id", books).collect()))
    assert a == b


def test_ivfpq_composition_recall_and_containment(emb, spark):
    """IVF+PQ: probing MORE cells (coverage dial) must not lose recall
    vs fewer cells at the same C, and full-probe IVF+PQ at large C
    approaches the pure re-rank result."""
    from pg_analytics_spark.operators.similarity import (
        ivfpq_topk,
        train_ivf_centroids,
    )

    qvec = emb.filter(F.col("vec_id") == 1).select("embedding").collect()[0][0]
    cents = train_ivf_centroids(emb, "embedding", DIM, n_cells=8, n_iters=2)
    books = train_pq_codebooks(
        emb, "embedding", DIM, m_subs=8, n_codes=16, n_iters=2
    )
    ws = ", ".join(f"{float(x)!r}D" for x in qvec)
    exact = set(
        r["vec_id"]
        for r in emb.selectExpr(
            "vec_id",
            f"aggregate(zip_with(embedding, array({ws}), "
            "(x, w) -> cast(x AS double) * w), 0.0D, (acc, x) -> acc + x) AS dot",
        )
        .orderBy(F.desc("dot"), "vec_id")
        .limit(10)
        .collect()
    )

    def recall(n_probes, C):
        got = set(
            r["vec_id"]
            for r in ivfpq_topk(
                emb, "embedding", "vec_id", qvec,
                centroids=cents, codebooks=books,
                k=10, n_probes=n_probes, n_candidates=C,
            ).collect()
        )
        return len(got & exact) / 10

    r2 = recall(2, 100)
    r8 = recall(8, 100)
    assert r8 >= r2  # probing every cell can only help at fixed C
    # full probe + large C must equal the plain ADC re-rank
    full = recall(8, 200)
    rerank = set(
        r["vec_id"]
        for r in pq_topk_rerank(
            emb, "embedding", "vec_id", qvec, books, k=10, n_candidates=200
        ).collect()
    )
    assert full == len(rerank & exact) / 10
