"""Streaming CDC apply: a change stream upserted into a NATIVE Delta
table by conditional MERGE per micro-batch — the bronze→silver hop of
every lakehouse pipeline, realized end-to-end on this repo's own
writers (rollup.py's docstring promised "swap the parquet upsert for a
Delta MERGE when available"; merge_delta made it available).

Mechanism: file-source stream of events → per micro-batch, reduce to
the LATEST change per key (argmax by (ts, event_id) — one max-of-
struct aggregate, no window) → ``merge_delta`` with

    WHEN MATCHED AND s is NEWER THEN UPDATE …
    WHEN NOT MATCHED THEN INSERT …

The newer-than condition is what makes the applied state INDEPENDENT
of batch boundaries and arrival order: an out-of-order micro-batch
carrying older changes matches but fails the condition and is a
no-op, so ANY file split — including adversarial reorderings —
converges to the same table (unit-pinned in tests/test_streaming.py
by applying batches out of order).  Unconditional upsert (what naive
foreachBatch examples do) silently loses this property.

Scale: per-trigger work is O(new files) for the reduction plus ONE
copy-on-write merge commit touching only files that contain matched
keys; the table never rewrites wholesale.  At 100 TB/day the same
dataflow runs with the trigger interval and
``spark.sql.shuffle.partitions`` sized to the per-trigger volume.

Reference analog: the reference is a read-only FDW — continuous
ingestion + upsert is additive scope (its README roadmap lists
INSERT/UPDATE as unimplemented); the semantics here follow the public
Delta MERGE contract.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pg_analytics_spark.streaming.events import read_event_stream

#: upsert key and the change-ordering columns
CDC_KEY = "user_id"
PROFILE_COLS = [
    "user_id", "last_ts", "last_event_id", "last_type", "last_value",
]


def latest_per_key(batch_df: DataFrame) -> DataFrame:
    """Reduce a change batch to the newest row per key: ONE max-of-
    struct aggregate (struct comparison orders by (ts, event_id) —
    total, deterministic), no window, map-side combinable."""
    top = F.max(
        F.struct(
            F.col("ts").alias("ts"),
            F.col("event_id").alias("event_id"),
            F.col("event_type").alias("event_type"),
            F.col("value").alias("value"),
        )
    ).alias("top")
    return (
        batch_df.groupBy(CDC_KEY)
        .agg(top)
        .select(
            CDC_KEY,
            F.col("top.ts").alias("last_ts"),
            F.col("top.event_id").alias("last_event_id"),
            F.col("top.event_type").alias("last_type"),
            F.col("top.value").alias("last_value"),
        )
    )


#: s strictly newer than t on (last_ts, last_event_id)
_NEWER = (
    "s.last_ts > t.last_ts OR "
    "(s.last_ts = t.last_ts AND s.last_event_id > t.last_event_id)"
)


def apply_cdc_batch(batch_df: DataFrame, table_dir: str) -> None:
    """Apply ONE change batch to the Delta table (create on first)."""
    from pg_analytics_spark.sources.delta_write import (
        merge_delta,
        write_delta,
    )

    latest = latest_per_key(batch_df)
    if not os.path.isdir(os.path.join(table_dir, "_delta_log")):
        write_delta(latest, table_dir, mode="overwrite")
        return
    merge_delta(
        latest,
        table_dir,
        f"t.{CDC_KEY} = s.{CDC_KEY}",
        [
            {
                "when": "matched",
                "action": "update",
                "set": "all",
                "condition": _NEWER,
            },
            {
                "when": "not_matched",
                "action": "insert",
                "values": "all",
                "condition": None,
            },
        ],
    )


def maintain_cdc_table(
    spark: SparkSession,
    source: str,
    table_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
) -> None:
    """One availableNow increment: merge every unseen file's changes
    into the Delta profile table."""
    opts = (
        {"maxFilesPerTrigger": str(max_files_per_trigger)}
        if max_files_per_trigger
        else None
    )
    ev = read_event_stream(spark, source, opts)

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        apply_cdc_batch(batch_df, table_dir)

    q = (
        ev.writeStream.outputMode("append")
        .foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def apply_cdc_batch_iceberg(batch_df: DataFrame, table_dir: str) -> None:
    """Apply ONE change batch to a native ICEBERG table as a single
    equality-delete row-delta snapshot (create the table on first).

    The Iceberg twin of ``apply_cdc_batch``: where the Delta path runs
    a conditional MERGE (a join of the batch against the target), this
    commits ``upsert_iceberg_eq`` — an eq-delete file on the batch's
    keys plus the batch's rows, both at the snapshot's sequence number
    S, with NO target read at any point.  Per-trigger cost is
    O(change set) regardless of table size — the property that keeps
    per-micro-batch CDC viable on a 100 TB table.

    Contract difference, by design: eq-delete upsert is LAST-WRITER-
    WINS, so micro-batches must arrive time-ordered (the changelog
    contract — true of CDF feeds and per-key-partitioned Kafka
    topics; the file source's (mtime, path) order in tests).  A feed
    that can deliver out-of-order change batches needs the Delta
    twin's newer-than conditional MERGE instead.  Replaying the SAME
    batch after a crash is idempotent: the eq-delete erases the
    replayed keys' previous images and re-adds identical rows, so a
    restart from the checkpoint converges (pinned in
    tests/test_streaming.py)."""
    from pg_analytics_spark.sources.iceberg_write import (
        upsert_iceberg_eq,
        write_iceberg,
    )

    latest = latest_per_key(batch_df)
    if not os.path.isdir(os.path.join(table_dir, "metadata")):
        write_iceberg(latest.coalesce(1), table_dir, mode="overwrite")
        return
    upsert_iceberg_eq(
        batch_df.sparkSession, table_dir, latest, [CDC_KEY]
    )


def maintain_cdc_table_iceberg(
    spark: SparkSession,
    source: str,
    table_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
) -> None:
    """One availableNow increment: apply every unseen file's changes
    to the Iceberg profile table, one row-delta snapshot per
    micro-batch."""
    opts = (
        {"maxFilesPerTrigger": str(max_files_per_trigger)}
        if max_files_per_trigger
        else None
    )
    ev = read_event_stream(spark, source, opts)

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        apply_cdc_batch_iceberg(batch_df, table_dir)

    q = (
        ev.writeStream.outputMode("append")
        .foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def maintain_append_table(
    spark: SparkSession,
    source: str,
    table_dir: str,
    checkpoint_dir: str,
    app_id: str,
    max_files_per_trigger: int | None = None,
) -> None:
    """Exactly-once streaming APPEND into a native Delta table via
    protocol ``txn`` (SetTransaction) actions — the Delta-native
    idempotence mechanism (delta-spark's `txnAppId`/`txnVersion`):
    each micro-batch appends with ``txn=(app_id, batch_id)``; on a
    crash-replay the recorded watermark makes the duplicate batch
    commit NOTHING, so the sink is exactly-once at the TABLE level
    even though foreachBatch is at-least-once.  Unlike the CDC twins
    (which need a key and an upsert), this covers the plain
    append-only ingest every bronze layer starts with."""
    opts = (
        {"maxFilesPerTrigger": str(max_files_per_trigger)}
        if max_files_per_trigger
        else None
    )
    ev = read_event_stream(spark, source, opts)

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        from pg_analytics_spark.sources.delta_write import write_delta

        write_delta(
            batch_df, table_dir, mode="append", txn=(app_id, batch_id)
        )

    q = (
        ev.writeStream.outputMode("append")
        .foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def maintain_append_table_iceberg(
    spark: SparkSession,
    source: str,
    table_dir: str,
    checkpoint_dir: str,
    app_id: str,
    branch: str | None = None,
    max_files_per_trigger: int | None = None,
) -> None:
    """Exactly-once streaming APPEND into a native ICEBERG table —
    the Iceberg twin of :func:`maintain_append_table`, using the
    snapshot-summary epoch watermark (``write_iceberg(txn=…)``, the
    mechanism Iceberg's own Spark streaming sink records as
    app-id/epoch-id summary properties): a crash-replayed micro-batch
    finds its epoch already recorded and commits NOTHING.

    ``branch`` composes this with WRITE-AUDIT-PUBLISH: every
    micro-batch lands on the named branch while plain readers keep
    seeing main untouched; after the audit passes,
    ``fast_forward_iceberg`` publishes the whole ingest as one
    metadata move.  Because refs are retention roots, a concurrent
    ``expire_snapshots`` cannot reclaim the staged commits — and the
    epoch watermark is scanned across ALL snapshots, so idempotence
    holds for branch-staged epochs too.  The table must already exist
    when a branch is targeted (branch writes keep main at the
    pre-ingest head).
    """
    opts = (
        {"maxFilesPerTrigger": str(max_files_per_trigger)}
        if max_files_per_trigger
        else None
    )
    ev = read_event_stream(spark, source, opts)

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        from pg_analytics_spark.sources.iceberg_write import write_iceberg

        write_iceberg(
            batch_df,
            table_dir,
            mode="append",
            branch=branch,
            txn=(app_id, batch_id),
        )

    q = (
        ev.writeStream.outputMode("append")
        .foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
