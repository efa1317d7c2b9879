"""Continuous-ingest dedup: a Bloom filter maintained across
micro-batches.

The batch operators (operators/dedup.bloom_bits/bloom_probe) build a
(word, bits) relation from a history corpus and probe new shards
against it.  This module runs that shape under Structured Streaming:
each micro-batch of documents

1. PROBES the filter state accumulated from all PRIOR batches — docs
   whose every chunk is possibly-seen get ``bloom_hit`` (candidate
   duplicates; no false negatives at chunk level);
2. MERGES its own chunk bits into the state (union + bit_or re-agg) so
   later batches see them.

Probe-before-merge makes the semantics deterministic and exactly equal
to the batch operator run with "all earlier batches" as history — the
equivalence `tests/test_streaming.py` asserts.

State is a tiny parquet relation (≤ m_bits/32 rows, a few thousand)
rewritten atomically per batch via write-to-temp + rename: the classic
small-state foreachBatch maintenance pattern.  At 100 TB the state is
STILL a few thousand rows — that is the whole point of the Bloom
shape; the corpus never re-joins itself.  (A Delta MERGE on (word)
would be the multi-writer answer; single-writer rename is exact here.)
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pg_analytics_spark.operators.dedup import bloom_bits, bloom_probe
from pg_analytics_spark.streaming.state_swap import (
    commit_state,
    current_snapshot,
)

#: filter geometry shared by every batch (must not change mid-stream)
M_BITS = 1 << 19
NUM_HASHES = 7


def _chunk_hashes(docs: DataFrame) -> DataFrame:
    """(doc_id, ci, h32) — 10-token chunk fingerprints, the same
    chunking as the batch dedup_span_chunks/dedup_bloom_incremental."""
    toks = docs.select(
        "doc_id",
        F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != "").alias(
            "_t"
        ),
    ).filter(F.size("_t") > 0)
    fps = F.transform(
        F.sequence(
            F.lit(0), ((F.size("_t") + F.lit(9)) / F.lit(10)).cast("int") - 1
        ),
        lambda i: F.md5(F.concat_ws(" ", F.slice("_t", i * 10 + 1, 10))),
    )
    return toks.select(
        "doc_id", F.posexplode(fps).alias("ci", "fp")
    ).selectExpr(
        "doc_id", "ci",
        "CAST(conv(substr(fp, 1, 8), 16, 10) AS BIGINT) AS h32",
    )


def _read_state(spark: SparkSession, state_dir: str) -> DataFrame | None:
    cur = current_snapshot(state_dir, "bits")
    if cur is None:
        return None
    return spark.read.parquet(cur)


def _write_state(bits: DataFrame, state_dir: str) -> None:
    commit_state(bits, state_dir, "bits")


def process_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    state_dir: str,
    out_dir: str,
) -> None:
    """One micro-batch: probe docs against the accumulated filter,
    append per-doc hit counts to out_dir, merge the batch's bits in."""
    chunks = _chunk_hashes(batch_df)
    # the batch relation feeds probe + merge: materialize it once
    chunks = chunks.persist()
    try:
        state = _read_state(spark, state_dir)
        if state is None:
            schema = "word INT, bits BIGINT"
            state = spark.createDataFrame([], schema)
        hits = bloom_probe(
            chunks, "h32", state, ["doc_id", "ci"],
            m_bits=M_BITS, num_hashes=NUM_HASHES,
        )
        per_doc = hits.groupBy("doc_id").agg(
            F.count("*").alias("n_chunks"),
            F.sum(F.col("bloom_hit").cast("int")).alias("n_bloom_hits"),
        )
        per_doc.write.mode("append").parquet(out_dir)
        new_bits = bloom_bits(
            chunks, "h32", m_bits=M_BITS, num_hashes=NUM_HASHES
        )
        merged = (
            state.unionByName(new_bits)
            .groupBy("word")
            .agg(F.expr("bit_or(bits)").alias("bits"))
        )
        # state must be fully materialized BEFORE the rename swaps the
        # directory it was read from
        merged = merged.localCheckpoint(eager=True)
        _write_state(merged, state_dir)
    finally:
        chunks.unpersist()


def run_bloom_ingest(
    spark: SparkSession,
    input_dir: str,
    state_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    schema=None,
) -> None:
    """Drive the maintenance loop with an AvailableNow file stream —
    swap the source for Kafka and the trigger for processingTime in
    production; process_batch is source-agnostic."""
    if schema is None:
        schema = (
            "doc_id BIGINT, text STRING, lang STRING, source STRING, "
            "n_chars BIGINT"
        )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda bdf, _id: process_batch(spark, bdf, state_dir, out_dir)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
