"""Structured Streaming tests: drive each streaming operator with an
AvailableNow trigger over the events parquet and reconcile with the
batch twin (workload/stream.py) — the incremental execution path is
real, only the trigger is bounded."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from pg_analytics_spark.streaming.events import (
    read_event_stream,
    stream_hourly_counts,
    stream_sessionize,
    stream_stateful_user_profile,
)
from pg_analytics_spark.workload.stream import (
    events_hourly_window,
    events_user_activity,
)

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def event_stream(spark):
    return read_event_stream(spark, f"{SF_DIR}/events.parquet")


def _drain(df, name: str, mode: str) -> None:
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            df.writeStream.format("memory")
            .queryName(name)
            .outputMode(mode)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()


def test_stream_hourly_matches_batch(spark, event_stream):
    _drain(stream_hourly_counts(event_stream), "t_hourly", "complete")
    got = {
        (r["window_start"], r["event_type"]): r["n"]
        for r in spark.table("t_hourly").collect()
    }
    want = {
        (r["window_start"], r["event_type"]): r["n"]
        for r in events_hourly_window(spark, SF_DIR).collect()
    }
    assert got == want


def test_stream_sessionize_covers_all_events(spark, event_stream):
    _drain(stream_sessionize(event_stream), "t_sessions", "complete")
    sessions = spark.table("t_sessions")
    total = sessions.agg(F.sum("n_events")).collect()[0][0]
    n_events = spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    assert total == n_events
    # session windows respect the gap: end-start spans at least one event
    bad = sessions.filter(F.col("session_end") < F.col("session_start")).count()
    assert bad == 0


def test_stream_stateful_profile_matches_batch(spark, event_stream):
    _drain(stream_stateful_user_profile(event_stream), "t_profiles", "update")
    # last update per user wins
    prof = (
        spark.table("t_profiles")
        .groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"))
    )
    got = {r["user_id"]: r["n_events"] for r in prof.collect()}
    want = {
        r["user_id"]: r["n_events"]
        for r in events_user_activity(spark, SF_DIR).collect()
    }
    assert got == want


def test_stream_stream_interval_join_matches_batch(spark, event_stream):
    from pg_analytics_spark.streaming.events import stream_click_purchase_join
    from pg_analytics_spark.workload.base import table

    _drain(stream_click_purchase_join(event_stream), "ssj", "append")
    got = {
        (r["purchase_id"], r["click_id"])
        for r in spark.table("ssj").collect()
    }
    ev = table(spark, SF_DIR, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user_id"),
        F.col("ts").alias("click_ts"),
    )
    expected = {
        (r["purchase_id"], r["click_id"])
        for r in p.join(
            c,
            F.expr(
                "p_user_id = c_user_id AND "
                "click_ts >= purchase_ts - INTERVAL 30 MINUTES AND "
                "click_ts < purchase_ts"
            ),
        ).collect()
    }
    assert got == expected and len(expected) > 0


def test_stream_dedup_within_watermark(spark, event_stream):
    from pg_analytics_spark.streaming.events import stream_dedup
    from pg_analytics_spark.workload.base import table

    _drain(stream_dedup(event_stream), "sdd", "append")
    rows = spark.table("sdd").collect()
    keys = {(r["user_id"], r["event_type"]) for r in rows}
    # one survivor per key, and every key survives
    assert len(rows) == len(keys)
    ev = table(spark, SF_DIR, "events")
    expected_keys = {
        (r["user_id"], r["event_type"])
        for r in ev.select("user_id", "event_type").distinct().collect()
    }
    assert keys == expected_keys


def test_stream_directory_source_probes_ts_unit(spark, tmp_path):
    """A DIRECTORY of event files (the normal file-stream shape) must
    probe the timestamp unit from a member file — ParquetFile(dir)
    raises, and a silent µs fallback misreads TIMESTAMP(NANOS) fixtures
    (every ts lands in January 1970)."""
    import shutil

    src = tmp_path / "events_dir"
    src.mkdir()
    shutil.copy(f"{SF_DIR}/events.parquet", src / "part-0.parquet")

    stream = read_event_stream(spark, str(src))
    _drain(stream_hourly_counts(stream), "t_hourly_dir", "complete")
    got = {
        (r["window_start"], r["event_type"]): r["n"]
        for r in spark.table("t_hourly_dir").collect()
    }
    want = {
        (r["window_start"], r["event_type"]): r["n"]
        for r in events_hourly_window(spark, SF_DIR).collect()
    }
    assert got == want
    # sanity: no 1970 artifacts — window starts live in the fixture era
    assert all(k[0].year > 1990 for k in got)


def test_incremental_rollup_maintenance(spark, tmp_path):
    """Two incremental runs: the second processes ONLY the new file and
    the rollup still equals the batch aggregate over everything."""
    import shutil

    from pg_analytics_spark.streaming.rollup import maintain_hourly_rollup
    from pg_analytics_spark.workload.base import table

    src = tmp_path / "src"
    src.mkdir()
    shutil.copy(f"{SF_DIR}/events.parquet", src / "a.parquet")
    rollup = str(tmp_path / "rollup")
    ckpt = str(tmp_path / "ckpt")

    maintain_hourly_rollup(spark, str(src), rollup, ckpt)
    first = spark.read.parquet(rollup)
    ev = table(spark, SF_DIR, "events")
    batch1 = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )
    got1 = {(r["window_start"], r["event_type"]): r["n"] for r in first.collect()}
    exp1 = {(r["window_start"], r["event_type"]): r["n"] for r in batch1.collect()}
    assert got1 == exp1

    # incremental append must carry ADVANCING event time — re-feeding
    # old timestamps is late data beyond the watermark and is rightly
    # dropped.  Shift the copy 30 days forward, unit-agnostic: raw ns
    # longs when the fixture is TIMESTAMP(NANOS) read via nanosAsLong,
    # an INTERVAL otherwise.
    raw = spark.read.parquet(f"{SF_DIR}/events.parquet")
    if dict(raw.dtypes)["ts"] == "bigint":
        shift = F.col("ts") + F.lit(30 * 86400 * 10**9)
    else:
        shift = F.col("ts") + F.expr("INTERVAL 30 DAYS")
    shifted = raw.withColumn("ts", shift)
    shifted.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "b_stage"))
    import glob

    shutil.copy(
        glob.glob(str(tmp_path / "b_stage" / "*.parquet"))[0], src / "b.parquet"
    )
    maintain_hourly_rollup(spark, str(src), rollup, ckpt)
    second = spark.read.parquet(rollup)
    got2 = {(r["window_start"], r["event_type"]): r["n"] for r in second.collect()}
    import datetime as dt

    shifted_exp = {
        (k[0] + dt.timedelta(days=30), k[1]): v for k, v in exp1.items()
    }
    assert got2 == {**exp1, **shifted_exp}


def test_multi_microbatch_state_handoff(spark, tmp_path):
    """Rate-limited drain (maxFilesPerTrigger=1 over a 3-file events
    dir): the stateful profile and the stream-stream join must carry
    state ACROSS micro-batches — >1 micro-batch actually executes, and
    the results still equal the batch twins.  (The availableNow
    fixtures elsewhere mostly drain in one batch; this pins the
    cross-batch handoff.)"""
    import glob as _glob
    import shutil

    from pg_analytics_spark.streaming.events import (
        EVENT_SCHEMA,
        stream_click_purchase_join,
    )
    from pg_analytics_spark.workload.base import table

    # three files split by TIME terciles (event time must advance
    # batch-to-batch or the watermark marks later files late); every
    # user appears in every tercile, so per-user state and join state
    # MUST survive across batches to reproduce the batch answer
    ev = table(spark, SF_DIR, "events")
    from pyspark.sql import Window as W

    ranked = ev.withColumn(
        "_t3", F.ntile(3).over(W.orderBy("ts", "event_id"))
    )
    src = tmp_path / "ev_multi"
    src.mkdir()
    for i in range(1, 4):
        part = ranked.filter(F.col("_t3") == i).drop("_t3")
        stage = tmp_path / f"stage{i}"
        part.coalesce(1).write.parquet(str(stage))
        shutil.copy(
            _glob.glob(str(stage / "*.parquet"))[0], src / f"{i:05d}.parquet"
        )

    def _drain_limited(df, name, mode):
        with tempfile.TemporaryDirectory() as ckpt:
            q = (
                df.writeStream.format("memory")
                .queryName(name)
                .outputMode(mode)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            return q.lastProgress["batchId"] + 1 if q.lastProgress else 0

    # maxFilesPerTrigger applies at the SOURCE: rebuild the reader with
    # the option so each micro-batch ingests exactly one file
    limited = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .withColumn("ts", F.to_timestamp("ts"))
    )

    n_batches = _drain_limited(
        stream_stateful_user_profile(limited), "mb_profiles", "update"
    )
    assert n_batches >= 3, f"expected >=3 micro-batches, got {n_batches}"
    prof = (
        spark.table("mb_profiles")
        .groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"))
    )
    got = {r["user_id"]: r["n_events"] for r in prof.collect()}
    want = {
        r["user_id"]: r["n_events"]
        for r in events_user_activity(spark, SF_DIR).collect()
    }
    assert got == want

    limited2 = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .withColumn("ts", F.to_timestamp("ts"))
    )
    n_batches2 = _drain_limited(
        stream_click_purchase_join(limited2), "mb_ssj", "append"
    )
    assert n_batches2 >= 3
    got_pairs = {
        (r["purchase_id"], r["click_id"])
        for r in spark.table("mb_ssj").collect()
    }
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user_id"),
        F.col("ts").alias("click_ts"),
    )
    want_pairs = {
        (r["purchase_id"], r["click_id"])
        for r in p.join(
            c,
            F.expr(
                "p_user_id = c_user_id AND "
                "click_ts >= purchase_ts - INTERVAL 30 MINUTES AND "
                "click_ts < purchase_ts"
            ),
        ).collect()
    }
    assert got_pairs == want_pairs and len(want_pairs) > 0


def test_streaming_corpus_ingest_matches_batch_curation(spark, tmp_path):
    """End-to-end streaming ingest of a document corpus through
    streaming/corpus_ingest.py (readStream → curation filters →
    per-batch fingerprint dedup + anti-join vs the ingested set →
    append sink): the final curated table must equal the batch
    corpus_curation result — the streaming twin of the pre-training
    filter chain.  (Also guarded value-exactly by the
    streaming_corpus_ingest oracle row.)"""
    import shutil

    from pg_analytics_spark.sources import load_source
    from pg_analytics_spark.streaming.corpus_ingest import ingest_corpus
    from .conftest import SF_DIR

    src_dir = str(tmp_path / "docs_src")
    out_dir = str(tmp_path / "curated")
    ckpt = str(tmp_path / "ckpt")
    docs = load_source(spark, f"{SF_DIR}/documents.parquet", "parquet")
    docs.write.parquet(src_dir)

    ingest_corpus(spark, src_dir, out_dir, ckpt, docs.schema)

    got = spark.read.parquet(out_dir)
    from pg_analytics_spark.workload import REGISTRY

    want = REGISTRY["corpus_curation"].spark(spark, SF_DIR)
    # same curated doc set. Batch keeps min-id per fingerprint; the
    # stream keeps the min-id within each batch and first-batch-wins
    # across batches — with availableNow over one directory they agree.
    got_ids = sorted(r["doc_id"] for r in got.collect())
    want_ids = sorted(r["doc_id"] for r in want.collect())
    assert got_ids == want_ids
    shutil.rmtree(ckpt, ignore_errors=True)


def test_streaming_corpus_ingest_delta_exact_across_batches(spark, tmp_path):
    """Delta-sink ingest with REVERSED arrival order and one file per
    micro-batch: the per-fingerprint min-doc_id resolution must still
    equal the batch corpus_curation EXACTLY (representatives included)
    — the semantics the append-only parquet sink cannot give across
    batches."""
    import glob as _glob
    import os
    import shutil
    import time

    from pg_analytics_spark.sources import load_source
    from pg_analytics_spark.streaming.corpus_ingest import _merge_delta
    from pg_analytics_spark.workload import REGISTRY

    docs = load_source(spark, f"{SF_DIR}/documents.parquet", "parquet")
    src = tmp_path / "docs_rev"
    src.mkdir()
    # two halves, HIGH doc_ids arriving FIRST (reversed order): the
    # append sink would keep the high-id representative; delta must not
    half = docs.approxQuantile("doc_id", [0.5], 0.0)[0]
    for i, part in enumerate(
        (docs.filter(F.col("doc_id") > half), docs.filter(F.col("doc_id") <= half))
    ):
        stage = tmp_path / f"rs{i}"
        part.coalesce(1).write.parquet(str(stage))
        shutil.copy(
            _glob.glob(str(stage / "*.parquet"))[0], src / f"{i:05d}.parquet"
        )
        time.sleep(1.1)  # distinct mtimes → deterministic file order

    out = str(tmp_path / "curated_delta")
    ckpt = str(tmp_path / "ckpt_delta")
    limited = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    # re-apply the curation chain on the limited reader
    from pg_analytics_spark.functions.text import (
        fingerprint,
        quality_score,
        token_count,
    )

    limited = (
        limited.withColumn("n_tokens", token_count("text"))
        .withColumn("quality", quality_score("text"))
        .filter(
            (F.col("n_tokens") >= 5)
            & (F.col("n_tokens") <= 2000)
            & (F.col("quality") >= 0.5)
        )
        .withColumn("_fp", fingerprint("text"))
    )
    q = (
        limited.writeStream.foreachBatch(_merge_delta(out))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert q.lastProgress["batchId"] + 1 >= 2  # really multi-batch

    got = load_source(spark, out, "delta")
    want = REGISTRY["corpus_curation"].spark(spark, SF_DIR)
    got_ids = sorted(r["doc_id"] for r in got.collect())
    want_ids = sorted(r["doc_id"] for r in want.collect())
    # EXACT representative set, not just fingerprint set
    assert got_ids == want_ids
    assert os.path.isdir(os.path.join(out, "_delta_log"))


def test_streaming_bloom_ingest_matches_batch(spark, tmp_path):
    """Two micro-batches: the second batch's probe counts must equal
    the batch operator run with batch 1 as history (probe-before-merge
    semantics), and batch 1 must see an empty filter."""
    import os
    import time

    from pg_analytics_spark.operators.dedup import bloom_bits, bloom_probe
    from pg_analytics_spark.streaming.bloom_ingest import (
        M_BITS,
        NUM_HASHES,
        _chunk_hashes,
        run_bloom_ingest,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    b1 = docs.filter(F.col("source") != "src0")
    b2 = docs.filter(F.col("source") == "src0")
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    b1.coalesce(1).toPandas().to_parquet(f"{in_dir}/00000.parquet")
    time.sleep(1.1)  # distinct mtimes → deterministic file order
    b2.coalesce(1).toPandas().to_parquet(f"{in_dir}/00001.parquet")

    state = str(tmp_path / "state")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    run_bloom_ingest(spark, in_dir, state, out, ckpt)

    got = {
        r["doc_id"]: (r["n_chunks"], r["n_bloom_hits"])
        for r in spark.read.parquet(out)
        .join(b2.select("doc_id"), "doc_id")
        .collect()
    }
    # batch twin: probe b2 against b1's filter
    hist_bits = bloom_bits(
        _chunk_hashes(b1), "h32", m_bits=M_BITS, num_hashes=NUM_HASHES
    )
    chunks2 = _chunk_hashes(b2)
    want = {
        r["doc_id"]: (r["n_chunks"], r["n_bloom_hits"])
        for r in bloom_probe(
            chunks2, "h32", hist_bits, ["doc_id", "ci"],
            m_bits=M_BITS, num_hashes=NUM_HASHES,
        )
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum(F.col("bloom_hit").cast("int")).alias("n_bloom_hits"),
        )
        .collect()
    }
    assert got == want
    assert sum(h for _, h in got.values()) > 0  # real cross-batch hits
    # batch 1 probed an empty filter: zero hits
    b1_hits = (
        spark.read.parquet(out)
        .join(b1.select("doc_id"), "doc_id")
        .agg(F.sum("n_bloom_hits"))
        .collect()[0][0]
    )
    assert b1_hits == 0


def test_streaming_sketch_ingest_equals_batch_sketches(spark, tmp_path):
    """CMS/HLL maintained across a FORCED multi-batch drain
    (maxFilesPerTrigger=1 over a 3-file corpus) must equal the batch
    sketches over the whole corpus bit-for-bit — mergeability makes
    the streaming twin exact for any batch order/count."""
    from pyspark.sql import functions as F

    from pg_analytics_spark.functions.hashing import shingle_hash32
    from pg_analytics_spark.operators.sketches import cms_build, hll_build
    from pg_analytics_spark.sources import load_source
    from pg_analytics_spark.streaming.sketch_ingest import (
        CMS_DEPTH,
        CMS_WIDTH,
        HLL_P,
        ingest_sketches,
    )
    from .conftest import SF_DIR

    src_dir = str(tmp_path / "docs_src")
    state_dir = str(tmp_path / "state")
    out_dir = str(tmp_path / "monitor")
    ckpt = str(tmp_path / "ckpt")
    docs = load_source(spark, f"{SF_DIR}/documents.parquet", "parquet")
    # three guaranteed-nonempty files -> three micro-batches at
    # maxFilesPerTrigger=1 (repartition(3, key) can hash two thirds
    # into one partition and leave an empty file)
    for i in range(3):
        docs.filter(F.col("doc_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(src_dir)

    ingest_sketches(
        spark, src_dir, state_dir, out_dir, ckpt, docs.schema,
        max_files_per_trigger=1,
    )

    monitor = spark.read.parquet(out_dir).orderBy("batch_id").collect()
    assert len(monitor) >= 3  # the drain really ran multi-batch

    tok = docs.select(
        F.explode(
            F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != "")
        ).alias("tok")
    )
    hashes = tok.select(shingle_hash32(F.col("tok")).alias("h32"))
    want_cms = sorted(
        map(tuple, cms_build(hashes, "h32", depth=CMS_DEPTH, width=CMS_WIDTH).collect())
    )
    want_hll = sorted(
        map(tuple, hll_build(hashes, "h32", precision=HLL_P).collect())
    )
    from pg_analytics_spark.streaming.state_swap import current_snapshot

    got_cms = sorted(
        map(
            tuple,
            spark.read.parquet(current_snapshot(state_dir, "cms")).collect(),
        )
    )
    got_hll = sorted(
        map(
            tuple,
            spark.read.parquet(current_snapshot(state_dir, "hll")).collect(),
        )
    )
    assert got_cms == want_cms
    assert got_hll == want_hll

    # monitoring: cumulative token count is EXACT (CMS row-0 sum) and
    # monotone across batches
    totals = [r["total_tokens"] for r in monitor]
    assert totals == sorted(totals)
    assert totals[-1] == tok.count()


def test_rollup_crash_and_restart_from_checkpoint(spark, tmp_path):
    """Failure-recovery proof (r4 verdict item 9): a micro-batch whose
    foreachBatch RAISES after applying its effect is uncommitted — the
    restarted query (same checkpoint dir) replays it (idempotent
    upsert) and drains the rest, while batch 1's committed file is NOT
    reprocessed.  Final rollup must equal the batch aggregate exactly
    — exactly-once at the effect level across a crash."""
    import glob as _glob
    import shutil

    from pg_analytics_spark.sources import load_source
    from pg_analytics_spark.streaming.events import read_event_stream
    from pg_analytics_spark.streaming.rollup import (
        _upsert,
        hourly_rollup_stream,
        maintain_hourly_rollup,
    )
    from pg_analytics_spark.workload.base import table

    # three TIME-SPLIT thirds so later files never carry late data
    ev_all = table(spark, SF_DIR, "events")
    lo, hi = ev_all.agg(
        F.min("ts").alias("a"), F.max("ts").alias("b")
    ).collect()[0]
    cuts = [
        lo + (hi - lo) * 1 / 3,
        lo + (hi - lo) * 2 / 3,
    ]
    src = tmp_path / "src"
    src.mkdir()
    parts = [
        ev_all.filter(F.col("ts") <= F.lit(cuts[0])),
        ev_all.filter(
            (F.col("ts") > F.lit(cuts[0])) & (F.col("ts") <= F.lit(cuts[1]))
        ),
        ev_all.filter(F.col("ts") > F.lit(cuts[1])),
    ]
    counts = []
    for idx, p in enumerate(parts):
        stage = tmp_path / f"stage{idx}"
        p.coalesce(1).write.parquet(str(stage))
        # file-source processes in mtime/name order; name them in order
        shutil.copy(
            _glob.glob(str(stage / "*.parquet"))[0],
            src / f"{idx:03d}.parquet",
        )
        counts.append(p.count())
    rollup = str(tmp_path / "rollup")
    ckpt = str(tmp_path / "ckpt")

    # ---- run 1: crash AFTER batch 2's upsert ran but BEFORE commit
    calls = {"n": 0}
    real = _upsert(rollup)

    def crashing(batch_df, batch_id):
        real(batch_df, batch_id)
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("injected crash after batch-2 effect")

    ev = read_event_stream(
        spark, str(src), options={"maxFilesPerTrigger": 1}
    )
    q = (
        hourly_rollup_stream(ev)
        .writeStream.outputMode("update")
        .foreachBatch(crashing)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    import pytest as _pytest

    with _pytest.raises(Exception, match="injected crash"):
        q.awaitTermination()
    assert calls["n"] == 2  # batch 1 committed, batch 2 effect applied

    # ---- run 2: same checkpoint — replays batch 2, drains batch 3
    maintain_hourly_rollup(spark, str(src), rollup, ckpt)

    got = {
        (r["window_start"], r["event_type"]): (r["n"], r["total_value"])
        for r in spark.read.parquet(rollup).collect()
    }
    batch_twin = (
        ev_all.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,4)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )
    want = {
        (r["window_start"], r["event_type"]): (r["n"], r["total_value"])
        for r in batch_twin.collect()
    }
    assert got == want


def test_corpus_ingest_stop_and_restart_from_checkpoint(spark, tmp_path):
    """Restart-from-checkpoint for the corpus-ingest chain: drain half
    the files, STOP, add the rest, restart with the SAME checkpoint —
    committed files are not reprocessed and the final Delta table
    equals the batch corpus_curation twin exactly."""
    import shutil

    from pg_analytics_spark.sources import load_source
    from pg_analytics_spark.streaming.corpus_ingest import ingest_corpus
    from pg_analytics_spark.workload import REGISTRY

    docs = load_source(spark, f"{SF_DIR}/documents.parquet", "parquet")
    half1 = docs.filter("doc_id % 2 = 0")
    half2 = docs.filter("doc_id % 2 = 1")
    src = tmp_path / "docs_src"
    src.mkdir()
    out = str(tmp_path / "curated_delta")
    ckpt = str(tmp_path / "ckpt")

    import glob as _glob

    stage1 = tmp_path / "s1"
    half1.coalesce(1).write.parquet(str(stage1))
    shutil.copy(_glob.glob(str(stage1 / "*.parquet"))[0], src / "000.parquet")
    ingest_corpus(spark, str(src), out, ckpt, docs.schema, sink="delta")
    n_after_1 = load_source(spark, out, "delta").count()

    stage2 = tmp_path / "s2"
    half2.coalesce(1).write.parquet(str(stage2))
    shutil.copy(_glob.glob(str(stage2 / "*.parquet"))[0], src / "001.parquet")
    ingest_corpus(spark, str(src), out, ckpt, docs.schema, sink="delta")

    got = load_source(spark, out, "delta")
    want = REGISTRY["corpus_curation"].spark(spark, SF_DIR)
    got_ids = sorted(r["doc_id"] for r in got.collect())
    want_ids = sorted(r["doc_id"] for r in want.collect())
    assert got_ids == want_ids
    # exactly-once at the source: run 2's checkpoint only saw file 001
    # (if 000 were reprocessed, the min-id merge would still be exact,
    # so ALSO assert via the commit count: one delta commit per run)
    import os as _os

    commits = [
        f for f in _os.listdir(f"{out}/_delta_log") if f.endswith(".json")
    ]
    assert len(commits) == 2, commits
    assert n_after_1 < len(got_ids)


def test_streaming_moments_equal_batch_across_forced_batches(spark, tmp_path):
    """Covariance-moment maintenance across a FORCED multi-batch drain
    (maxFilesPerTrigger=1 over a 3-file corpus) must equal the batch
    moments over the whole corpus bit-for-bit — exact decimal
    mergeability, the same contract as the CMS/HLL twin."""
    import glob as _glob
    import shutil

    from pg_analytics_spark.operators.pca import embedding_moments
    from pg_analytics_spark.sources import load_source
    from pg_analytics_spark.streaming.moments_ingest import (
        current_moments,
        ingest_moments,
    )

    e = load_source(spark, f"{SF_DIR}/embeddings.parquet", "parquet")
    src = tmp_path / "emb_src"
    src.mkdir()
    for idx in range(3):
        stage = tmp_path / f"s{idx}"
        e.filter(F.col("vec_id") % 3 == idx).coalesce(1).write.parquet(
            str(stage)
        )
        shutil.copy(
            _glob.glob(str(stage / "*.parquet"))[0],
            src / f"{idx:03d}.parquet",
        )
    state = str(tmp_path / "state")
    ingest_moments(
        spark, str(src), state, str(tmp_path / "ckpt"), e.schema,
        max_files_per_trigger=1,
    )
    got = sorted(map(tuple, current_moments(spark, state).collect()))
    want = sorted(map(tuple, embedding_moments(e, "embedding").collect()))
    assert got == want  # bit-for-bit incl. the double-surfaced sums


def test_state_swap_pointer_commit_is_crash_safe(spark, tmp_path, monkeypatch):
    """ADVICE r5 (medium): the old two-rename swap had a window where a
    crash deleted ALL accumulated state.  The pointer protocol's only
    commit point is one atomic os.replace of the pointer file — a crash
    anywhere before it must leave the previous snapshot fully readable."""
    import os as _os

    from pg_analytics_spark.streaming import state_swap

    sd = str(tmp_path / "state")
    df1 = spark.createDataFrame([(1, 10)], "k INT, v INT")
    state_swap.commit_state(df1, sd, "moments")
    cur1 = state_swap.current_snapshot(sd, "moments")
    assert [tuple(r) for r in spark.read.parquet(cur1).collect()] == [(1, 10)]

    # inject a crash AFTER snapshot 2's parquet is written but BEFORE
    # the pointer swap (the exact window the old layout lost state in)
    real_replace = _os.replace

    def boom(srcp, dstp):
        if str(dstp).endswith(".CURRENT"):
            raise OSError("injected crash before pointer swap")
        return real_replace(srcp, dstp)

    monkeypatch.setattr(_os, "replace", boom)
    df2 = spark.createDataFrame([(2, 20)], "k INT, v INT")
    try:
        state_swap.commit_state(df2, sd, "moments")
        raise AssertionError("injected crash did not fire")
    except OSError:
        pass
    monkeypatch.setattr(_os, "replace", real_replace)

    # prior state intact; the uncommitted batch would simply replay
    cur = state_swap.current_snapshot(sd, "moments")
    assert cur == cur1
    assert [tuple(r) for r in spark.read.parquet(cur).collect()] == [(1, 10)]

    # a successful commit then supersedes AND garbage-collects the
    # orphan snapshot from the crashed attempt
    state_swap.commit_state(df2, sd, "moments")
    cur2 = state_swap.current_snapshot(sd, "moments")
    assert [tuple(r) for r in spark.read.parquet(cur2).collect()] == [(2, 20)]
    snaps = [
        e for e in _os.listdir(sd)
        if e.startswith("moments-") and _os.path.isdir(_os.path.join(sd, e))
    ]
    assert snaps == [_os.path.basename(cur2)]


def test_state_swap_reads_legacy_layout_then_migrates(spark, tmp_path):
    """State dirs written by the old two-rename layout (a plain
    `<name>/` dir, no pointer) must keep working: read falls back to
    the legacy dir; the next commit migrates to the pointer protocol
    and GCs the legacy dir."""
    import os as _os

    from pg_analytics_spark.streaming import state_swap

    sd = str(tmp_path / "state")
    legacy = _os.path.join(sd, "bits")
    spark.createDataFrame([(7, 70)], "k INT, v INT").coalesce(1).write.parquet(
        legacy
    )
    assert state_swap.current_snapshot(sd, "bits") == legacy
    state_swap.commit_state(
        spark.createDataFrame([(8, 80)], "k INT, v INT"), sd, "bits"
    )
    cur = state_swap.current_snapshot(sd, "bits")
    assert cur != legacy and not _os.path.isdir(legacy)
    assert [tuple(r) for r in spark.read.parquet(cur).collect()] == [(8, 80)]


def test_sink_probe_detects_data_without_spark_read():
    """First-batch sink probe is a filesystem check, NOT a
    spark.read-and-catch: a failed read's poisoned lazy QueryExecution
    would later re-raise inside any registered QueryExecutionListener
    (round-6 verdict #3 — ExecutionListenerBus ERROR)."""
    import os
    import tempfile

    from pg_analytics_spark.streaming.corpus_ingest import _sink_has_data

    with tempfile.TemporaryDirectory() as d:
        missing = os.path.join(d, "nope")
        assert not _sink_has_data(missing)
        os.makedirs(missing)
        assert not _sink_has_data(missing)  # empty dir
        open(os.path.join(missing, "_SUCCESS"), "w").close()
        assert not _sink_has_data(missing)  # marker only
        sub = os.path.join(missing, "part=1")
        os.makedirs(sub)
        open(os.path.join(sub, "x.parquet"), "w").close()
        assert _sink_has_data(missing)  # nested parquet counts


def test_cdc_upsert_multibatch_equals_batch_argmax(spark, tmp_path):
    """streaming/cdc_upsert.py forced through ≥3 micro-batches
    (maxFilesPerTrigger=1 over time-terciled files): the merged Delta
    table must equal the batch per-user argmax — cross-batch MERGE
    state is the table itself."""
    import glob as _glob
    import shutil

    from pg_analytics_spark.sources import load_source
    from pg_analytics_spark.streaming.cdc_upsert import maintain_cdc_table
    from pg_analytics_spark.workload.base import table
    from pyspark.sql import Window as W

    ev = table(spark, SF_DIR, "events").filter(F.col("user_id") < 40)
    ranked = ev.withColumn(
        "_t3", F.ntile(3).over(W.orderBy("ts", "event_id"))
    )
    src = tmp_path / "ev_cdc"
    src.mkdir()
    for i in range(1, 4):
        part = ranked.filter(F.col("_t3") == i).drop("_t3")
        stage = tmp_path / f"cdc_stage{i}"
        part.coalesce(1).write.parquet(str(stage))
        shutil.copy(
            _glob.glob(str(stage / "*.parquet"))[0], src / f"{i:05d}.parquet"
        )
    tbl = str(tmp_path / "profiles_delta")
    maintain_cdc_table(
        spark, str(src), tbl, str(tmp_path / "cdc_ckpt"),
        max_files_per_trigger=1,
    )
    got = {
        r["user_id"]: (r["last_ts"], r["last_event_id"], r["last_value"])
        for r in load_source(spark, tbl, "delta").collect()
    }
    expect = {
        r["user_id"]: (r["ts"], r["event_id"], r["value"])
        for r in ev.withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("user_id").orderBy(
                    F.desc("ts"), F.desc("event_id")
                )
            ),
        )
        .filter("rn = 1")
        .collect()
    }
    assert got == expect


def test_iceberg_cdc_multibatch_and_crash_replay(spark, tmp_path):
    """maintain_cdc_table_iceberg through 3 TIME-ORDERED micro-batches
    (the eq-upsert changelog contract): one row-delta snapshot per
    batch, final table == batch per-user argmax.  Then crash-recovery:
    a batch whose foreachBatch RAISES after the snapshot committed is
    checkpoint-uncommitted — the restarted query replays it, and the
    replay is IDEMPOTENT (eq-delete erases the replayed keys' previous
    images and re-adds identical rows), so the table still equals the
    argmax — exactly-once at the value level across a crash."""
    import glob as _glob
    import shutil

    from pg_analytics_spark.sources import load_source
    from pg_analytics_spark.sources.iceberg_write import (
        _latest_metadata,
    )
    from pg_analytics_spark.streaming.cdc_upsert import (
        apply_cdc_batch_iceberg,
        maintain_cdc_table_iceberg,
    )
    from pg_analytics_spark.streaming.events import read_event_stream
    from pg_analytics_spark.workload.base import table
    from pyspark.sql import Window as W

    ev = table(spark, SF_DIR, "events").filter(F.col("user_id") < 40)
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    span = hi - lo
    cuts = (lo + span / 3, lo + 2 * span / 3)
    parts = [
        ev.filter(F.col("ts") < F.lit(cuts[0])),
        ev.filter(
            (F.col("ts") >= F.lit(cuts[0])) & (F.col("ts") < F.lit(cuts[1]))
        ),
        ev.filter(F.col("ts") >= F.lit(cuts[1])),
    ]
    src = tmp_path / "ev_ice_cdc"
    src.mkdir()
    for i, part in enumerate(parts):
        stage = tmp_path / f"ice_cdc_stage{i}"
        part.coalesce(1).write.parquet(str(stage))
        shutil.copy(
            _glob.glob(str(stage / "*.parquet"))[0],
            src / f"{i:05d}.parquet",
        )
    expect = {
        r["user_id"]: (r["ts"], r["event_id"], r["value"])
        for r in ev.withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("user_id").orderBy(
                    F.desc("ts"), F.desc("event_id")
                )
            ),
        )
        .filter("rn = 1")
        .collect()
    }

    def _got(tbl):
        return {
            r["user_id"]: (r["last_ts"], r["last_event_id"], r["last_value"])
            for r in load_source(spark, tbl, "iceberg").collect()
        }

    # ---- plain 3-batch drain
    tbl = str(tmp_path / "profiles_ice")
    maintain_cdc_table_iceberg(
        spark, str(src), tbl, str(tmp_path / "ice_ckpt"),
        max_files_per_trigger=1,
    )
    assert _got(tbl) == expect
    import os as _os

    def _n_snapshots(t):
        return len(
            _latest_metadata(_os.path.join(t, "metadata"))[1]["snapshots"]
        )

    assert _n_snapshots(tbl) == 3  # one snapshot per micro-batch

    # ---- crash after batch 2's effect, restart from checkpoint
    tbl2 = str(tmp_path / "profiles_ice_crash")
    ckpt2 = str(tmp_path / "ice_ckpt_crash")
    calls = {"n": 0}

    def crashing(batch_df, batch_id):
        apply_cdc_batch_iceberg(batch_df, tbl2)
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("injected crash after batch-2 effect")

    import pytest as _pytest

    ev_s = read_event_stream(
        spark, str(src), options={"maxFilesPerTrigger": 1}
    )
    q = (
        ev_s.writeStream.outputMode("append")
        .foreachBatch(crashing)
        .option("checkpointLocation", ckpt2)
        .trigger(availableNow=True)
        .start()
    )
    with _pytest.raises(Exception, match="injected crash"):
        q.awaitTermination()
    maintain_cdc_table_iceberg(
        spark, str(src), tbl2, ckpt2, max_files_per_trigger=1
    )
    assert _got(tbl2) == expect
    # batch 2 applied twice (crash) + batches 1, 3 once = 4 snapshots
    assert _n_snapshots(tbl2) == 4


def test_iceberg_cdc_duplicate_keys_in_batch_refused(spark, tmp_path):
    """upsert_iceberg_eq refuses an unreduced batch (two changes for
    one key would land duplicate rows at the same sequence) — the
    apply path must reduce via latest_per_key first, which it does."""
    from pg_analytics_spark.sources.iceberg_write import (
        upsert_iceberg_eq,
        write_iceberg,
    )
    from pg_analytics_spark.errors import UnsupportedFormat
    import pytest as _pytest

    sch = "user_id long, last_ts string, last_event_id long"
    base = spark.createDataFrame([(1, "2024-01-01", 1)], sch)
    tbl = str(tmp_path / "dup")
    write_iceberg(base, tbl)
    dup = spark.createDataFrame(
        [(1, "2024-01-02", 2), (1, "2024-01-03", 3)], sch
    )
    with _pytest.raises(UnsupportedFormat, match="duplicate keys"):
        upsert_iceberg_eq(spark, tbl, dup, ["user_id"])


def test_cdc_upsert_out_of_order_batches_converge(spark, tmp_path):
    """The NEWER-THAN merge condition: applying an out-of-order batch
    of OLDER changes is a no-op — arrival order cannot corrupt the
    table (the property unconditional foreachBatch upserts lack)."""
    from pg_analytics_spark.sources import load_source
    from pg_analytics_spark.streaming.cdc_upsert import apply_cdc_batch

    sch = (
        "event_id long, ts string, user_id long, "
        "event_type string, value double"
    )
    newer = spark.createDataFrame(
        [(100, "2024-01-02 10:00:00", 1, "purchase", 9.0),
         (101, "2024-01-02 11:00:00", 2, "view", 5.0)],
        sch,
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    older = spark.createDataFrame(
        [(50, "2024-01-01 10:00:00", 1, "click", 1.0),   # older → no-op
         (51, "2024-01-01 11:00:00", 3, "click", 3.0)],  # new key → insert
        sch,
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    tbl = str(tmp_path / "cdc_ooo")
    apply_cdc_batch(newer, tbl)   # batch 2 arrives FIRST
    apply_cdc_batch(older, tbl)   # then the older batch
    got = {
        r["user_id"]: (r["last_event_id"], r["last_type"])
        for r in load_source(spark, tbl, "delta").collect()
    }
    assert got == {
        1: (100, "purchase"),  # older change did NOT overwrite
        2: (101, "view"),
        3: (51, "click"),      # unseen key inserted
    }


def test_cdc_upsert_tie_ts_breaks_on_event_id(spark, tmp_path):
    from pg_analytics_spark.sources import load_source
    from pg_analytics_spark.streaming.cdc_upsert import apply_cdc_batch

    sch = (
        "event_id long, ts string, user_id long, "
        "event_type string, value double"
    )
    ts = "2024-03-01 00:00:00"
    b1 = spark.createDataFrame(
        [(7, ts, 1, "a", 1.0)], sch
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    b2 = spark.createDataFrame(
        [(9, ts, 1, "b", 2.0), (8, ts, 1, "c", 3.0)], sch
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    tbl = str(tmp_path / "cdc_tie")
    apply_cdc_batch(b1, tbl)
    apply_cdc_batch(b2, tbl)  # batch reduces to event_id 9, then upserts
    [(eid, typ)] = [
        (r["last_event_id"], r["last_type"])
        for r in load_source(spark, tbl, "delta").collect()
    ]
    assert (eid, typ) == (9, "b")


def test_txn_append_sink_exactly_once_across_crash(spark, tmp_path):
    """r10: the SetTransaction append sink — a batch whose effect ran
    but whose checkpoint commit didn't (injected crash) is REPLAYED by
    the restart, and the txn watermark makes the replay commit
    nothing: table rows == source rows exactly, no dedup key needed."""
    import glob as _glob
    import shutil

    from pg_analytics_spark.sources import load_source
    from pg_analytics_spark.sources.delta_write import write_delta
    from pg_analytics_spark.streaming.cdc_upsert import (
        maintain_append_table,
    )
    from pg_analytics_spark.streaming.events import read_event_stream
    from pg_analytics_spark.workload.base import table

    ev = table(spark, SF_DIR, "events").filter(F.col("user_id") < 30)
    src = tmp_path / "ev_txn"
    src.mkdir()
    from pyspark.sql import Window as _W

    thirds = ev.withColumn("_b", F.ntile(3).over(_W.orderBy("event_id")))
    for i in range(1, 4):
        stage = tmp_path / f"txn_stage{i}"
        thirds.filter(F.col("_b") == i).drop("_b").coalesce(1).write.parquet(
            str(stage)
        )
        shutil.copy(
            _glob.glob(str(stage / "*.parquet"))[0],
            src / f"{i:05d}.parquet",
        )
    tbl = str(tmp_path / "bronze")
    ckpt = str(tmp_path / "txn_ckpt")

    calls = {"n": 0}

    def crashing(batch_df, batch_id):
        write_delta(
            batch_df, tbl, mode="append", txn=("bronze-ingest", batch_id)
        )
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("injected crash after batch-2 effect")

    import pytest as _pytest

    ev_s = read_event_stream(spark, str(src), options={"maxFilesPerTrigger": 1})
    q = (
        ev_s.writeStream.outputMode("append")
        .foreachBatch(crashing)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    with _pytest.raises(Exception, match="injected crash"):
        q.awaitTermination()
    # restart: batch 2 replays but its txn watermark skips the append
    maintain_append_table(
        spark, str(src), tbl, ckpt, "bronze-ingest",
        max_files_per_trigger=1,
    )
    got = load_source(spark, tbl, "delta")
    assert got.count() == ev.count()  # exactly-once, no duplicates
    assert got.select("event_id").distinct().count() == ev.count()
