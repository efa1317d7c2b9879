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

Cross-batch survivor semantics — FIRST ARRIVAL WINS: within a
micro-batch the min-doc_id representative is kept (deterministic);
across batches the first-arriving fingerprint's representative is
final, because the sink is append-only parquet and streaming appends
cannot be retracted.  This equals the batch twin's global MIN(doc_id)
whenever the drain lands in one micro-batch (the availableNow fixture
shape) or files arrive in doc_id order; under out-of-order multi-batch
arrival the representative may differ by doc_id while the DEDUPED SET
of fingerprints is identical.  For exact min-id semantics across
batches use ``sink="delta"``: the native Delta writer
(sources/delta_write.py) merges every batch with replace-on-smaller-id
resolution, equal to the batch result for any arrival order.

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


def curated_stream(
    spark: SparkSession, path: str, schema, options: dict | None = None
) -> DataFrame:
    """File-source document stream with the curation filters applied.
    ``options`` forwards file-source reader options (e.g.
    ``maxFilesPerTrigger``)."""
    reader = spark.readStream.schema(schema)
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
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


def _sink_has_data(out_dir: str) -> bool:
    """True once the append sink holds at least one parquet file —
    an empty dir (or a dir with only _SUCCESS markers) would make
    spark.read fail schema inference just like a missing one."""
    if not os.path.isdir(out_dir):
        return False
    for root, _dirs, names in os.walk(out_dir):
        if any(n.endswith(".parquet") for n in names):
            return True
    return False


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
        # First-batch probe by DIRECTORY, not by read-and-catch: a
        # spark.read.parquet on the missing sink throws inside this
        # micro-batch's SQLExecution, and the FAILED lazy analysis
        # stays attached to the execution-end event — any registered
        # QueryExecutionListener (e.g. the Observation API's global
        # ObservationManager) that later forces qe.observedMetrics
        # re-raises it and logs an ExecutionListenerBus ERROR
        # (round-6 verdict #3; reproduced, the "drain" was innocent).
        # Local-FS existence is the correct probe for this sink; any
        # real read failure then surfaces loudly — silently skipping
        # the anti-join would append duplicates.
        if _sink_has_data(out_dir):
            seen = batch_df.sparkSession.read.parquet(out_dir).select("_fp")
            batch_df = batch_df.join(seen, "_fp", "left_anti")
        batch_df.write.mode("append").parquet(out_dir)

    return apply


def _merge_delta(out_dir: str):
    """Delta-sink upsert with EXACT global min-id semantics: each batch
    merges against the current table state and the per-fingerprint
    MIN(doc_id) wins regardless of arrival order — the replace-on-
    smaller-id resolution the append-only parquet sink cannot express.
    Realized as read-current + union + re-resolve + one overwrite
    commit (full-rewrite merge; a file-level MERGE needs matched-file
    rewrite plumbing, same result).  Old versions stay
    time-travelable."""
    def apply(batch_df: DataFrame, batch_id: int) -> None:
        from pg_analytics_spark.sources import load_source
        from pg_analytics_spark.sources.delta_write import write_delta

        import os

        spark = batch_df.sparkSession
        if os.path.isdir(os.path.join(out_dir, "_delta_log")):
            current = load_source(spark, out_dir, "delta")
            merged = current.unionByName(batch_df)
        else:
            merged = batch_df
        resolved = (
            merged.withColumn(
                "_r",
                F.row_number().over(Window.partitionBy("_fp").orderBy("doc_id")),
            )
            .filter("_r = 1")
            .drop("_r")
        )
        write_delta(resolved, out_dir, mode="overwrite")

    return apply


def ingest_corpus(
    spark: SparkSession,
    source: str,
    out_dir: str,
    checkpoint_dir: str,
    schema,
    sink: str = "parquet",
) -> None:
    """One availableNow increment: curate + dedup every file the
    checkpoint hasn't seen into the curated table.

    ``sink="parquet"`` — append-only files, first-arrival-wins across
    batches (module docstring).  ``sink="delta"`` — the native Delta
    writer merges each batch with replace-on-smaller-id resolution, so
    the final table equals the batch `corpus_curation` result for ANY
    batch order/count (asserted by the shuffled multi-batch test)."""
    upsert = _merge_delta(out_dir) if sink == "delta" else _upsert(out_dir)
    q = (
        curated_stream(spark, source, schema)
        .writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
