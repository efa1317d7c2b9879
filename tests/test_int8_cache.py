"""int8 codebook cache invalidation + non-finite stats rejection
(round-6 verdict #4 / ADVICE low: _INT8_STATS was keyed only by
sf_dir — a regenerated corpus silently reused the stale codebook, and
all-NULL/NaN dimensions formatted into invalid SQL literals)."""

from __future__ import annotations

import os

import pytest

from pg_analytics_spark.errors import EngineError


def _write_embeddings(spark, sf_dir, scale):
    df = spark.createDataFrame(
        [(i, [float(i) * scale, 1.0 * scale]) for i in range(8)],
        "vec_id bigint, embedding array<float>",
    )
    tgt = os.path.join(sf_dir, "embeddings.parquet")
    tmp = os.path.join(sf_dir, "_emb_stage")
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
    os.replace(os.path.join(tmp, part), tgt)
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    return tgt


def test_stale_corpus_invalidates_codebook(spark, tmp_path):
    from pg_analytics_spark.workload import REGISTRY
    from pg_analytics_spark.workload.llm import _INT8_STATS

    sf_dir = str(tmp_path)
    tgt = _write_embeddings(spark, sf_dir, scale=1.0)
    REGISTRY["embed_quantize_int8"].spark(spark, sf_dir).collect()
    key1 = [k for k in _INT8_STATS if k[0] == sf_dir]
    assert len(key1) == 1
    mns1, _ = _INT8_STATS[key1[0]]

    # regenerate the corpus in-process with different values; force a
    # distinct mtime so the fingerprint must do the work
    _write_embeddings(spark, sf_dir, scale=10.0)
    st = os.stat(tgt)
    os.utime(tgt, ns=(st.st_atime_ns, st.st_mtime_ns + 1_000_000_000))
    REGISTRY["embed_quantize_int8"].spark(spark, sf_dir).collect()
    key2 = [k for k in _INT8_STATS if k[0] == sf_dir]
    # superseded fingerprint evicted, ONE live entry, retrained values
    assert len(key2) == 1 and key2[0] != key1[0]
    mns2, _ = _INT8_STATS[key2[0]]
    assert mns2 != mns1


def test_non_finite_codebook_rejected(spark):
    from pg_analytics_spark.functions.vectors import int8_stats_lists

    df = spark.createDataFrame(
        [(0, [1.0, float("nan")]), (1, [2.0, 3.0])],
        "vec_id bigint, embedding array<double>",
    )
    with pytest.raises(EngineError, match="non-finite.*dimension"):
        int8_stats_lists(df, "embedding")


def test_all_null_dimension_rejected(spark):
    from pg_analytics_spark.functions.vectors import int8_stats_lists

    df = spark.createDataFrame(
        [(0, [1.0, None]), (1, [2.0, None])],
        "vec_id bigint, embedding array<double>",
    )
    with pytest.raises(EngineError, match="NULL"):
        int8_stats_lists(df, "embedding")
