"""Streaming corpus ingest: the pre-training curation chain as a
continuously-running pipeline.

readStream over a documents directory → stateless curation filters
(token band + composite quality, the same functions/text.py primitives
as the batch chain) → exact dedup inside foreachBatch (min-id
representative per fingerprint within the batch, fingerprint anti-join
against everything already ingested) → append parquet sink.

Equivalence contract (asserted by test_streaming.py AND the
`streaming_corpus_ingest` oracle row): after draining a fixed corpus,
the curated table equals the batch `corpus_curation` result exactly.
Filter-then-dedup commutes with the batch's dedup-then-filter because
the fingerprint is the normalized text — every member of a fingerprint
group shares the same tokens, quality, and therefore filter outcome.

Scale: the curation filters are a narrow map on the stream; the
anti-join probes only the ingested FINGERPRINT column (at 100 TB swap
the parquet read of `_fp` for the Bloom filter state of
streaming/bloom_ingest.py — same dataflow, constant-size state).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pg_analytics_spark.functions.text import (
    fingerprint,
    quality_score,
    token_count,
)


def curated_stream(spark: SparkSession, path: str, schema) -> DataFrame:
    """File-source document stream with the curation filters applied."""
    reader = spark.readStream.schema(schema)
    if path.endswith(".parquet") and not os.path.isdir(path):
        reader = reader.option("pathGlobFilter", os.path.basename(path))
        path = os.path.dirname(path)
    return (
        reader.parquet(path)
        .withColumn("n_tokens", token_count("text"))
        .withColumn("quality", quality_score("text"))
        .filter(
            (F.col("n_tokens") >= 5)
            & (F.col("n_tokens") <= 2000)
            & (F.col("quality") >= 0.5)
        )
        .withColumn("_fp", fingerprint("text"))
    )


def _upsert(out_dir: str):
    def apply(batch_df: DataFrame, batch_id: int) -> None:
        # min-id representative per fingerprint within the batch
        # (deterministic, unlike dropDuplicates' arbitrary survivor)
        batch_df = (
            batch_df.withColumn(
                "_r",
                F.row_number().over(Window.partitionBy("_fp").orderBy("doc_id")),
            )
            .filter("_r = 1")
            .drop("_r")
        )
        try:
            seen = batch_df.sparkSession.read.parquet(out_dir).select("_fp")
            batch_df = batch_df.join(seen, "_fp", "left_anti")
        except Exception:
            pass  # first batch: sink empty
        batch_df.write.mode("append").parquet(out_dir)

    return apply


def ingest_corpus(
    spark: SparkSession, source: str, out_dir: str, checkpoint_dir: str, schema
) -> None:
    """One availableNow increment: curate + dedup every file the
    checkpoint hasn't seen into the append-only curated table."""
    q = (
        curated_stream(spark, source, schema)
        .writeStream.foreachBatch(_upsert(out_dir))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
