"""The iceberg_native Python DataSource: batch + streaming reads of
the native Iceberg v2 writer's tables through Spark 4's DataSource
API — planning is pure-Python manifest replay, workers read with
pyarrow only.

Streaming mirrors the Iceberg runtime's streaming read: main-lineage
append snapshots ordered by sequence number; overwrite/delete
snapshots refuse unless the runtime's skip options are set;
WAP-branch-staged commits stay invisible until fast-forward publish.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pg_analytics_spark.sources import load_source
from pg_analytics_spark.sources.iceberg_write import (
    delete_iceberg,
    fast_forward_iceberg,
    upsert_iceberg_eq,
    write_iceberg,
)


@pytest.fixture()
def ds(spark):
    from pg_analytics_spark.sources.delta_datasource import (
        register_native_datasources,
    )

    register_native_datasources(spark)
    return spark


def _mk(spark, a, b):
    return spark.createDataFrame(
        [(i, float(i)) for i in range(a, b)], "id bigint, v double"
    )


def test_batch_scan_with_pos_and_eq_deletes(ds, tmp_path):
    d = str(tmp_path / "t")
    df = ds.createDataFrame(
        [(i, f"g{i % 3}", float(i)) for i in range(30)],
        "id bigint, p string, v double",
    )
    write_iceberg(df, d, mode="overwrite")
    delete_iceberg(ds, d, "id < 5")  # position deletes
    src = ds.createDataFrame(
        [(7, "gX", -7.0), (100, "gN", 100.0)],
        "id bigint, p string, v double",
    )
    upsert_iceberg_eq(ds, d, src, ["id"])  # eq delete + re-add
    out = ds.read.format("iceberg_native").option("path", d).load()
    ref = load_source(ds, d, "iceberg")
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, ref.select(*out.columns).collect())
    )
    rows = {r["id"]: r["v"] for r in out.collect()}
    assert rows[7] == -7.0 and rows[100] == 100.0 and 0 not in rows


def test_batch_snapshot_id_time_travel(ds, tmp_path):
    d = str(tmp_path / "t")
    r0 = write_iceberg(_mk(ds, 0, 10), d, mode="overwrite")
    write_iceberg(_mk(ds, 10, 15), d, mode="append")
    old = (
        ds.read.format("iceberg_native")
        .option("path", d)
        .option("snapshot_id", r0["snapshot_id"])
        .load()
    )
    assert old.count() == 10
    cur = ds.read.format("iceberg_native").option("path", d).load()
    assert cur.count() == 15


def _run_stream(spark, d, ck, acc, **opts):
    reader = spark.readStream.format("iceberg_native").option("path", d)
    for k, v in opts.items():
        reader = reader.option(k, v)

    def fb(df, bid):
        acc.append((bid, sorted(r["id"] for r in df.collect())))

    q = (
        reader.load()
        .writeStream.foreachBatch(fb)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_stream_initial_then_incremental_appends(ds, tmp_path):
    d, ck = str(tmp_path / "t"), str(tmp_path / "ck")
    write_iceberg(_mk(ds, 0, 10), d, mode="overwrite")
    acc: list = []
    _run_stream(ds, d, ck, acc)
    assert acc[0][1] == list(range(10))
    write_iceberg(_mk(ds, 10, 13), d, mode="append")
    write_iceberg(_mk(ds, 13, 15), d, mode="append")
    _run_stream(ds, d, ck, acc)
    assert acc[-1][1] == list(range(10, 15))


def test_stream_wap_branch_invisible_until_publish(ds, tmp_path):
    d, ck = str(tmp_path / "t"), str(tmp_path / "ck")
    write_iceberg(_mk(ds, 0, 5), d, mode="overwrite")
    acc: list = []
    _run_stream(ds, d, ck, acc)
    write_iceberg(_mk(ds, 90, 95), d, mode="append", branch="audit")
    _run_stream(ds, d, ck, acc)
    # staged-only commit: nothing to consume
    assert len(acc) == 1 or acc[-1][1] == acc[0][1]
    n_before = len(acc)
    fast_forward_iceberg(d, "audit")
    _run_stream(ds, d, ck, acc)
    assert len(acc) > n_before and acc[-1][1] == list(range(90, 95))


def test_stream_refuses_delete_unless_skipped(ds, tmp_path):
    d, ck = str(tmp_path / "t"), str(tmp_path / "ck")
    write_iceberg(_mk(ds, 0, 10), d, mode="overwrite")
    acc: list = []
    _run_stream(ds, d, ck, acc)
    delete_iceberg(ds, d, "id = 0")
    with pytest.raises(Exception, match="APPENDs only"):
        _run_stream(ds, d, ck, acc)
    _run_stream(
        ds, d, ck, acc, **{"streaming-skip-delete-snapshots": "true"}
    )
    write_iceberg(_mk(ds, 10, 12), d, mode="append")
    _run_stream(
        ds, d, ck, acc, **{"streaming-skip-delete-snapshots": "true"}
    )
    assert acc[-1][1] == [10, 11]


class TestWriter:
    """The iceberg_native WRITER half: tasks stage parquet under
    <table>/data/ with Appendix-D bounds from their own footers; the
    driver publishes one v2 snapshot (commit_iceberg_data_files).
    The streaming sink records (app id, epoch id) in the snapshot
    summary — the watermark write_iceberg's txn shares — so replays
    publish nothing."""

    def test_create_append_overwrite_time_travel(self, ds, tmp_path):
        d = str(tmp_path / "t")
        _mk(ds, 0, 10).write.format("iceberg_native").mode(
            "overwrite"
        ).option("path", d).save()
        assert load_source(ds, d, "iceberg").count() == 10
        _mk(ds, 10, 15).write.format("iceberg_native").mode(
            "append"
        ).option("path", d).save()
        got = sorted(
            r["id"] for r in load_source(ds, d, "iceberg").collect()
        )
        assert got == list(range(15))
        _mk(ds, 0, 3).write.format("iceberg_native").mode(
            "overwrite"
        ).option("path", d).save()
        assert load_source(ds, d, "iceberg").count() == 3
        # prior snapshots still time-travel (order by sequence number)
        import json as _json

        from pg_analytics_spark.sources.iceberg import (
            _latest_metadata_file,
        )

        meta = _json.load(open(_latest_metadata_file(d)))
        snaps = sorted(
            meta["snapshots"], key=lambda s: s["sequence-number"]
        )
        old = load_source(
            ds, d, "iceberg", {"snapshot_id": snaps[1]["snapshot-id"]}
        )
        assert old.count() == 15

    def test_bounds_feed_file_skipping(self, ds, tmp_path):
        d = str(tmp_path / "t")
        _mk(ds, 0, 100).repartitionByRange(4, "id").write.format(
            "iceberg_native"
        ).mode("overwrite").option("path", d).save()
        out = load_source(
            ds, d, "iceberg", {"partition_filter": [("id", "<", 10)]}
        )
        # bounds-pruned: fewer input files than the full scan
        full = load_source(ds, d, "iceberg")
        assert out.count() == 10
        assert len(out.inputFiles()) < len(full.inputFiles())

    def test_append_schema_mismatch_refused(self, ds, tmp_path):
        d = str(tmp_path / "t")
        _mk(ds, 0, 5).write.format("iceberg_native").mode(
            "overwrite"
        ).option("path", d).save()
        bad = ds.createDataFrame([(1, "x")], "id bigint, s string")
        with pytest.raises(Exception, match="schema mismatch"):
            bad.write.format("iceberg_native").mode("append").option(
                "path", d
            ).save()

    def test_stream_sink_exactly_once_replay(self, ds, tmp_path):
        src, d = str(tmp_path / "src"), str(tmp_path / "t")
        _mk(ds, 0, 20).write.parquet(src)

        def run(ck):
            q = (
                ds.readStream.schema("id bigint, v double")
                .parquet(src)
                .writeStream.format("iceberg_native")
                .option("path", d)
                .option("txnAppId", "ice-sink-test")
                .option("checkpointLocation", ck)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

        run(str(tmp_path / "ck"))
        assert load_source(ds, d, "iceberg").count() == 20
        run(str(tmp_path / "ck2"))  # lost checkpoint → replayed epoch
        assert load_source(ds, d, "iceberg").count() == 20


def test_stream_rate_limit_max_snapshots_per_trigger(ds, tmp_path):
    """maxSnapshotsPerTrigger bounds how many main-lineage snapshots
    latestOffset advances per trigger (reader-protocol level)."""
    from pg_analytics_spark.sources.iceberg_datasource import (
        _IceStreamReader,
    )

    d = str(tmp_path / "t")
    write_iceberg(_mk(ds, 0, 4), d, mode="overwrite")  # seq 1
    r = _IceStreamReader(d, {"maxsnapshotspertrigger": "1"})
    r._schema_struct = (
        ds.read.format("iceberg_native").option("path", d).load().schema
    )
    o0 = r.initialOffset()
    e1 = r.latestOffset()  # baseline: whole
    assert e1["seq"] == 1
    assert r.partitions(o0, e1)
    write_iceberg(_mk(ds, 4, 5), d, mode="append")  # seq 2
    write_iceberg(_mk(ds, 5, 6), d, mode="append")  # seq 3
    e2 = r.latestOffset()
    assert e2["seq"] == 2  # capped at ONE snapshot
    n = sum(
        b.num_rows for p in r.partitions(e1, e2) for b in r.read(p)
    )
    assert n == 1
    e3 = r.latestOffset()
    assert e3["seq"] == 3


def test_writer_identity_partitioned_roundtrip(ds, tmp_path):
    """partitionBy (identity) writes: one staged file per distinct
    tuple per task, source columns STAY in the files, the typed tuple
    rides the manifest entry — so the reader's partition_filter
    prunes at the manifest level; appends must match the spec."""
    d = str(tmp_path / "t")
    df = ds.createDataFrame(
        [(i, f"g{i % 3}", float(i)) for i in range(30)],
        "id bigint, p string, v double",
    )
    df.repartition(2, "p").write.format("iceberg_native").mode(
        "overwrite"
    ).option("path", d).option("partitionBy", "p").save()
    back = load_source(ds, d, "iceberg")
    assert back.count() == 30
    assert {r["p"] for r in back.collect()} == {"g0", "g1", "g2"}
    # manifest-level pruning via the identity tuple
    pruned = load_source(
        ds, d, "iceberg", {"partition_filter": [("p", "=", "g1")]}
    )
    assert pruned.count() == 10
    assert len(pruned.inputFiles()) < len(back.inputFiles())
    # spec-matched append works; a mismatch refuses
    df.limit(3).repartition(1).write.format("iceberg_native").mode(
        "append"
    ).option("path", d).option("partitionBy", "p").save()
    assert load_source(ds, d, "iceberg").count() == 33
    with pytest.raises(Exception, match="partition mismatch"):
        df.limit(1).write.format("iceberg_native").mode("append").option(
            "path", d
        ).save()


def test_batch_pushfilters_prunes_transforms_and_bounds(ds, tmp_path):
    """r12: iceberg_native pushFilters — parity with delta_native's
    pruning through the table's own transform-aware machinery.  A
    day-partitioned table prunes on date ranges at plan time; an
    identity string partition prunes on equality; and column BOUNDS
    prune files even on non-partition columns.  Planner-level
    partition counts assert the pruning; DataFrame results pin
    values."""
    import datetime as _dt

    from pyspark.sql.datasource import (
        EqualTo,
        GreaterThanOrEqual,
        LessThan,
    )

    from pg_analytics_spark.sources.iceberg_datasource import (
        _IceBatchReader,
    )
    d = str(tmp_path / "t")
    rows = [
        (i, _dt.date(2024, 1, 1 + i % 8), f"g{i % 3}", float(i))
        for i in range(48)
    ]
    df = ds.createDataFrame(
        rows, "id bigint, day date, g string, v double"
    )
    write_iceberg(
        df.coalesce(1), d, mode="overwrite", partition_by=["days(day)", "g"]
    )

    def planned(*filters):
        r = _IceBatchReader(d, None)
        r._schema_struct = df.schema
        list(r.pushFilters(list(filters)))
        return len(r.partitions())

    total = planned()
    assert total == 24  # 8 days x 3 groups
    # the monotonic-transform rule keeps the boundary day on BOTH
    # sides (conservative: correct for timestamp sources at any
    # granularity), so [Jan 3, Jan 5) keeps days {3, 4, 5} x 3 groups
    assert (
        planned(
            GreaterThanOrEqual(("day",), _dt.date(2024, 1, 3)),
            LessThan(("day",), _dt.date(2024, 1, 5)),
        )
        == 9
    )
    assert planned(EqualTo(("g",), "g1")) == 8
    # column-bounds pruning on a NON-partition column: id is written
    # in partition-sorted files, each covering a narrow id range
    assert planned(GreaterThanOrEqual(("id",), 46)) < total
    # end-to-end values under the same predicates
    out = (
        ds.read.format("iceberg_native")
        .option("path", d)
        .load()
        .filter(
            (F.col("day") >= "2024-01-03") & (F.col("day") < "2024-01-05")
        )
    )
    assert sorted(r["id"] for r in out.collect()) == [
        i for i in range(48) if 2 <= i % 8 < 4
    ]
    out2 = (
        ds.read.format("iceberg_native")
        .option("path", d)
        .load()
        .filter(F.col("g") == "g1")
    )
    assert sorted(r["id"] for r in out2.collect()) == [
        i for i in range(48) if i % 3 == 1
    ]


def test_batch_ref_reads_tag_and_branch(ds, tmp_path):
    """The DataFrame reader's `ref` option on the DataSource: a tag
    pins its snapshot, a branch reads its head; unknown refs and
    ref+snapshot_id combinations refuse."""
    from pg_analytics_spark.sources.iceberg_write import (
        alter_iceberg_refs,
        write_iceberg,
    )

    d = str(tmp_path / "t")
    write_iceberg(_mk(ds, 0, 5), d, mode="overwrite")
    alter_iceberg_refs(d, tag="v1")
    write_iceberg(_mk(ds, 5, 9), d, mode="append")
    write_iceberg(_mk(ds, 9, 12), d, mode="append", branch="audit")
    tag = (
        ds.read.format("iceberg_native")
        .option("path", d)
        .option("ref", "v1")
        .load()
    )
    assert sorted(r["id"] for r in tag.collect()) == list(range(5))
    br = (
        ds.read.format("iceberg_native")
        .option("path", d)
        .option("ref", "audit")
        .load()
    )
    assert sorted(r["id"] for r in br.collect()) == list(range(12))
    head = ds.read.format("iceberg_native").option("path", d).load()
    assert sorted(r["id"] for r in head.collect()) == list(range(9))
    with pytest.raises(Exception, match="not found"):
        (
            ds.read.format("iceberg_native")
            .option("path", d)
            .option("ref", "nope")
            .load()
            .collect()
        )


def test_stream_max_files_per_micro_batch_subsnapshot_offsets(
    ds, tmp_path
):
    """The runtime's streaming-max-files-per-micro-batch: tail
    snapshots drain at most N added files per trigger with
    sub-snapshot {"seq", "index"} offsets splitting a multi-file
    append across micro-batches; an end-to-end availableNow run then
    proves nothing is lost or duplicated with the option set."""
    from pg_analytics_spark.sources.iceberg_datasource import (
        _IceStreamReader,
    )

    d, ck = str(tmp_path / "t"), str(tmp_path / "ck")
    write_iceberg(_mk(ds, 0, 4).coalesce(1), d, mode="overwrite")
    r = _IceStreamReader(d, {"streaming-max-files-per-micro-batch": "2"})
    r._schema_struct = _mk(ds, 0, 1).schema
    assert r.initialOffset() == {"seq": -1}
    o1 = r.latestOffset()
    assert o1 == {"seq": 1, "index": -1}  # baseline whole
    assert len(r.partitions({"seq": -1}, o1)) == 1
    # backlog: a 3-file append then a 2-file append
    write_iceberg(_mk(ds, 4, 10).repartition(3), d, mode="append")
    write_iceberg(_mk(ds, 10, 14).repartition(2), d, mode="append")
    walk = [o1]
    files = []
    while True:
        nxt = r.latestOffset()
        if nxt == walk[-1]:
            break
        files.extend(
            p.file_path for p in r.partitions(walk[-1], nxt)
        )
        walk.append(nxt)
    assert walk[1:] == [
        {"seq": 2, "index": 2},
        {"seq": 3, "index": 1},
        {"seq": 3, "index": -1},
    ]
    assert len(files) == 5 and len(set(files)) == 5
    # restart path: a FRESH reader resuming from a PARTIAL offset,
    # JSON-roundtripped the way Spark persists offsets, plans exactly
    # the unconsumed slice
    import json as _json

    r2 = _IceStreamReader(d, {"streaming-max-files-per-micro-batch": "2"})
    r2._schema_struct = _mk(ds, 0, 1).schema
    start = _json.loads(_json.dumps({"seq": 3, "index": 1}))
    end = _json.loads(_json.dumps({"seq": 3, "index": -1}))
    resumed = r2.partitions(start, end)
    assert [p.file_path for p in resumed] == files[4:]
    # end-to-end under the option: no loss, no duplicates
    acc: list = []
    _run_stream(
        ds, d, ck, acc, **{"streaming-max-files-per-micro-batch": "2"}
    )
    assert sorted(i for _b, batch in acc for i in batch) == list(
        range(14)
    )
    write_iceberg(_mk(ds, 14, 16).coalesce(1), d, mode="append")
    _run_stream(
        ds, d, ck, acc, **{"streaming-max-files-per-micro-batch": "2"}
    )
    assert acc[-1][1] == [14, 15]


def test_writer_transform_partitioned_roundtrip(ds, tmp_path):
    """r12: the DataSource writer accepts TRANSFORM partition specs —
    days(ts) + bucket(4, k) — computing partition values in pure
    Python with the reader's reference semantics (transform_value),
    so the minted spec prunes exactly like write_iceberg's.  Batch
    write + read-back values + partition_filter pruning + a
    streaming sink into the day-partitioned table."""
    import datetime as _dt

    d = str(tmp_path / "t")
    rows = [
        (
            i,
            _dt.datetime(2024, 3, 1 + i % 4, 6 + i % 12, 0, 0),
            f"k{i % 6}",
            float(i),
        )
        for i in range(48)
    ]
    df = ds.createDataFrame(
        rows, "id bigint, ts timestamp_ntz, k string, v double"
    )
    (
        df.coalesce(1)
        .write.format("iceberg_native")
        .mode("overwrite")
        .option("path", d)
        .option("partitionBy", "days(ts), bucket(4, k)")
        .save()
    )
    import json as _json

    from pg_analytics_spark.sources.iceberg import _latest_metadata_file

    meta = _json.load(open(_latest_metadata_file(d)))
    spec = meta["partition-specs"][0]["fields"]
    assert [f["transform"] for f in spec] == ["day", "bucket[4]"]
    back = load_source(ds, d, "iceberg")
    assert sorted(r["id"] for r in back.collect()) == list(range(48))
    # day pruning: one of four days
    pruned = load_source(
        ds,
        d,
        "iceberg",
        {"partition_filter": [["ts", ">=", "2024-03-02 00:00:00"],
                              ["ts", "<", "2024-03-03 00:00:00"]]},
    )
    n_all, n_day = len(back.inputFiles()), len(pruned.inputFiles())
    assert 0 < n_day < n_all
    assert sorted(r["id"] for r in pruned.collect()) == [
        i for i in range(48) if i % 4 == 1
    ]
    # appends through the STREAMING sink respect the same spec
    src = str(tmp_path / "src")
    more = ds.createDataFrame(
        [
            (100 + j, _dt.datetime(2024, 3, 9, 12, 0, 0), "k0", 1.0)
            for j in range(4)
        ],
        "id bigint, ts timestamp_ntz, k string, v double",
    )
    more.write.parquet(src)
    q = (
        ds.readStream.schema("id bigint, ts timestamp_ntz, k string, v double")
        .parquet(src)
        .writeStream.format("iceberg_native")
        .option("path", d)
        .option("partitionBy", "days(ts), bucket(4, k)")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert load_source(ds, d, "iceberg").count() == 52
    march9 = load_source(
        ds,
        d,
        "iceberg",
        {"partition_filter": [["ts", ">=", "2024-03-09 00:00:00"]]},
    )
    assert sorted(r["id"] for r in march9.collect()) == [100, 101, 102, 103]
    # spec mismatch refuses
    import pytest as _pytest

    with _pytest.raises(Exception, match="partition mismatch"):
        (
            more.write.format("iceberg_native")
            .mode("append")
            .option("path", d)
            .option("partitionBy", "days(ts)")
            .save()
        )


def test_stream_schema_pinned_through_evolution_until_restart(
    ds, tmp_path
):
    """The Iceberg runtime's streaming contract (r13, the counterpart
    of delta_native's refuse-and-restart): a stream is PINNED to the
    schema it started with — an ADD-COLUMN evolution mid-lineage does
    NOT fail the stream, its appended files simply project to the
    bound schema (field-id resolution drops the unseen column) — and
    a restarted stream binds the evolved schema, null-filling
    pre-evolution files."""
    from pg_analytics_spark.sources.iceberg_datasource import (
        _IceStreamReader,
    )

    d, ck = str(tmp_path / "t"), str(tmp_path / "ck")
    write_iceberg(_mk(ds, 0, 6), d, mode="overwrite")
    acc: list = []
    _run_stream(ds, d, ck, acc)
    assert acc[-1][1] == list(range(6))  # baseline
    # live reader bound to the 2-column schema meets the evolved
    # append: partitions() must plan it (no refusal), projecting away
    # the new column
    live = _IceStreamReader(d, {})
    live._schema_struct = _mk(ds, 0, 1).schema  # the pre-evolution bind
    start = live.latestOffset()
    evolved = ds.createDataFrame(
        [(10, 10.0, "x"), (11, 11.0, "y")],
        "id bigint, v double, tag string",
    )
    write_iceberg(
        evolved, d, mode="append", options={"mergeSchema": "true"}
    )
    end = live.latestOffset()
    parts = live.partitions(start, end)
    assert parts, "evolved append must stream under the pinned schema"
    # restart: the evolved schema binds; old checkpoints resume and
    # the new column arrives (pre-evolution rows already consumed)
    tags: list = []
    reader = ds.readStream.format("iceberg_native").option("path", d)

    def fb(df, bid):
        tags.append({r["id"]: r["tag"] for r in df.collect()})

    q = (
        reader.load()
        .writeStream.foreachBatch(fb)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert tags and tags[-1] == {10: "x", 11: "y"}
