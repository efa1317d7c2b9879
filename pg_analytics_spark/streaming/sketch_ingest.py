"""Continuous-ingest sketch maintenance: Count-Min + HyperLogLog
across micro-batches.

The batch sketches (operators/sketches.py) are MERGEABLE — counters
sum, registers max — which makes the streaming twin exact by
construction: merging each micro-batch's sketch into the state gives
bit-for-bit the sketch a single batch build over all arrived data
would produce, for ANY batch order or count.  `tests/test_sketches.py`
pins mergeability; `tests/test_streaming.py` pins this streaming
equivalence through a forced multi-batch (maxFilesPerTrigger=1) drain.

Per micro-batch of documents:
1. tokenize + hash (the same md5-affine family as everything else);
2. union the batch's CMS/HLL partials into the state relations
   (re-agg: SUM counters / MAX registers);
3. atomically swap the tiny state parquet (same write-to-temp + rename
   pattern as streaming/bloom_ingest.py);
4. append one monitoring row per batch: cumulative token count (the
   CMS row-0 counter sum — exact) and the current HLL raw
   distinct-token estimate.

This is the production "corpus dashboard" shape: at 100 TB/day the
state stays depth·width + 2^p rows, each batch costs one
sketch-capacity shuffle, and the frequency/distinct questions are
answerable at any moment without touching history.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pg_analytics_spark.functions.hashing import shingle_hash32
from pg_analytics_spark.streaming.state_swap import (
    commit_state,
    current_snapshot,
)
from pg_analytics_spark.operators.sketches import (
    cms_build,
    hll_build,
    hll_estimate,
)

#: sketch geometry shared by every batch (must not change mid-stream)
CMS_DEPTH, CMS_WIDTH = 4, 512
HLL_P = 8


def _token_hashes(docs: DataFrame) -> DataFrame:
    # the SHARED tokenizer (functions/text.py): the streaming state
    # must equal the batch sketches bit-for-bit, so both sides go
    # through one tokenization definition
    from pg_analytics_spark.functions.text import tokens

    return docs.select(
        F.explode(tokens(F.lower("text"))).alias("tok")
    ).select(shingle_hash32(F.col("tok")).alias("h32"))


def _read_state(spark: SparkSession, state_dir: str, name: str, schema: str):
    cur = current_snapshot(state_dir, name)
    if cur is not None:
        return spark.read.parquet(cur)
    return spark.createDataFrame([], schema)


def _write_state(df: DataFrame, state_dir: str, name: str) -> None:
    commit_state(df, state_dir, name)


def process_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    state_dir: str,
    out_dir: str,
    batch_id: int,
) -> None:
    hashes = _token_hashes(batch_df).persist()
    try:
        cms_state = _read_state(
            spark, state_dir, "cms", "r INT, c BIGINT, cnt BIGINT"
        )
        hll_state = _read_state(
            spark, state_dir, "hll", "bucket BIGINT, rho INT"
        )
        cms_merged = (
            cms_state.unionByName(
                cms_build(hashes, "h32", depth=CMS_DEPTH, width=CMS_WIDTH)
            )
            .groupBy("r", "c")
            .agg(F.sum("cnt").alias("cnt"))
        )
        hll_merged = (
            hll_state.unionByName(hll_build(hashes, "h32", precision=HLL_P))
            .groupBy("bucket")
            .agg(F.max("rho").alias("rho"))
        )
        # state must be fully materialized BEFORE the rename swaps the
        # directory it was read from
        cms_rows = cms_merged.collect()
        hll_rows = hll_merged.collect()
        cms_new = spark.createDataFrame(cms_rows, "r INT, c BIGINT, cnt BIGINT")
        hll_new = spark.createDataFrame(hll_rows, "bucket BIGINT, rho INT")
        _write_state(cms_new, state_dir, "cms")
        _write_state(hll_new, state_dir, "hll")
        total = sum(r["cnt"] for r in cms_rows if r["r"] == 0)
        est = hll_estimate(hll_new, precision=HLL_P).collect()[0]
        # an all-empty state (empty first batch) legitimately has no
        # estimate yet — record the row with a null estimate
        hll_val = None if est["hll_est"] is None else float(est["hll_est"])
        spark.createDataFrame(
            [
                (
                    int(batch_id),
                    int(total),
                    int(est["nonzero_buckets"]),
                    hll_val,
                )
            ],
            "batch_id BIGINT, total_tokens BIGINT, "
            "nonzero_buckets BIGINT, hll_est DOUBLE",
        ).write.mode("append").parquet(out_dir)
    finally:
        hashes.unpersist()


def ingest_sketches(
    spark: SparkSession,
    source: str,
    state_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    schema,
    max_files_per_trigger: int | None = None,
) -> None:
    """One availableNow increment: fold every unseen file into the
    CMS/HLL state, emitting one monitoring row per micro-batch."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    if source.endswith(".parquet") and not os.path.isdir(source):
        # file streams want a directory: glob down to the single file
        reader = reader.option("pathGlobFilter", os.path.basename(source))
        source = os.path.dirname(source)
    stream = reader.parquet(source)

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        process_batch(spark, batch_df, state_dir, out_dir, batch_id)

    q = (
        stream.writeStream.foreachBatch(apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
