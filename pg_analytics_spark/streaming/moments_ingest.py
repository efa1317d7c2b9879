"""Continuous-ingest covariance maintenance: the PCA sufficient
statistics (operators/pca.py) kept up to date across micro-batches.

The moment partials are MERGEABLE — exact decimal sums — so the
streaming twin is exact by construction: union + re-sum of each
micro-batch's partials equals the single-pass batch build bit-for-bit
for ANY batch order or count (the same argument as the CMS/HLL twin
in streaming/sketch_ingest.py, whose state-swap pattern this module
reuses).  At 100 TB/day of embeddings the state stays d(d+1)/2 rows
and each batch costs one d²-group shuffle; the current covariance (and
therefore refreshed PCA components via ``pca_top_components``-style
finalization) is answerable at any moment without touching history.

``streaming_pca_moments`` runs the real incremental path under the
value-exact gate: the drained state, finalized, must equal the batch
``embed_pca_moments`` relation — SAME oracle SQL.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from pg_analytics_spark.operators.pca import (
    MOMENT_PARTIAL_SCHEMA,
    embedding_moment_partials_raw,
    finalize_moments,
    merge_moment_partials,
)
from pg_analytics_spark.streaming.state_swap import (
    commit_state,
    current_snapshot,
)


def _read_state(spark: SparkSession, state_dir: str) -> DataFrame:
    cur = current_snapshot(state_dir, "moments")
    if cur is not None:
        return spark.read.parquet(cur)
    return spark.createDataFrame([], MOMENT_PARTIAL_SCHEMA)


def _write_state(df: DataFrame, state_dir: str) -> None:
    commit_state(df, state_dir, "moments")


def process_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    vec_col: str,
    state_dir: str,
    batch_id: int,
) -> None:
    """Merge one micro-batch's decimal partials into the state
    (union + re-sum — exact; decimal sums are associative, so ONE
    merge aggregate over (state ∪ raw task partials) equals the old
    two-stage group-then-regroup bit-for-bit).

    r14 optimization (guide §2.2 — don't pay two KB-scale exchanges
    per micro-batch): the raw kernel partials union straight into the
    state merge (one shuffle instead of two), and the merged state
    writes directly from the same job — ``commit_state`` writes a NEW
    snapshot dir and swaps the pointer only afterwards, so the write
    job safely reads the old snapshot it is superseding (no collect +
    re-upload round trip)."""
    partials = embedding_moment_partials_raw(batch_df, vec_col)
    merged = merge_moment_partials(
        _read_state(spark, state_dir).unionByName(partials)
    )
    _write_state(merged, state_dir)


def ingest_moments(
    spark: SparkSession,
    source: str,
    state_dir: str,
    checkpoint_dir: str,
    schema,
    vec_col: str = "embedding",
    max_files_per_trigger: int | None = None,
) -> None:
    """One availableNow increment: fold every unseen embedding file
    into the covariance-moment state."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    if source.endswith(".parquet") and not os.path.isdir(source):
        reader = reader.option("pathGlobFilter", os.path.basename(source))
        source = os.path.dirname(source)
    stream = reader.parquet(source)

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        process_batch(spark, batch_df, vec_col, state_dir, batch_id)

    q = (
        stream.writeStream.foreachBatch(apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def current_moments(spark: SparkSession, state_dir: str) -> DataFrame:
    """The finalized moment relation from the live state — the exact
    relation the batch ``embedding_moments`` would produce over all
    arrived data."""
    return finalize_moments(_read_state(spark, state_dir))
