"""Physical-layout scale levers: hive partition pruning and bucketed
(shuffle-free) joins.

These are the two layout tools the 100 TB design leans on (SCALE.md):
a date/tenant-partitioned lake prunes files before the scan, and
bucketing both sides of a recurring join on its key removes the
per-query shuffle entirely.  Neither is exercised by the single-file
testdata, so these tests build small partitioned/bucketed copies and
assert the PLAN (PartitionFilters, absence of Exchange) — the property
that actually transfers to a cluster.
"""

from __future__ import annotations

import os
import re

import pytest
from pyspark.sql import functions as F

from pg_analytics_spark.plans import explain_formatted
from pg_analytics_spark.sources import load_source

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def part_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("events_by_day"))
    ev = load_source(spark, f"{SF_DIR}/events.parquet", "parquet")
    (
        ev.withColumn("event_date", F.to_date("ts"))
        .write.partitionBy("event_date")
        .mode("overwrite")
        .parquet(d)
    )
    return d


def test_partition_pruning_reaches_scan(spark, part_dir):
    df = spark.read.parquet(part_dir).filter(
        F.col("event_date") == "2024-01-03"
    )
    plan = explain_formatted(df)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "event_date" in m.group(1), plan
    # the partition predicate must NOT appear as a data filter
    assert "PushedFilters: [IsNotNull(event_date)" not in plan


def _scanned_files(df) -> int:
    """numFiles metric of the executed scan node (post-pruning)."""
    df.collect()
    plan = df._jdf.queryExecution().executedPlan()

    def walk(node):
        name = node.nodeName()
        if "Scan" in name:
            metrics = node.metrics()
            it = metrics.iterator()
            while it.hasNext():
                kv = it.next()
                if kv._1() == "numFiles":
                    return int(kv._2().value())
        n = node.children().size()
        for i in range(n):
            got = walk(node.children().apply(i))
            if got is not None:
                return got
        return None

    return walk(plan)


def test_partition_pruning_reads_fewer_files(spark, part_dir):
    total_days = (
        spark.read.parquet(part_dir).select("event_date").distinct().count()
    )
    assert total_days > 1
    n = _scanned_files(
        spark.read.parquet(part_dir).filter(F.col("event_date") == "2024-01-03")
    )
    n_all = _scanned_files(spark.read.parquet(part_dir))
    assert n is not None and n_all is not None
    assert 0 < n < n_all


def test_bucketed_join_has_no_exchange(spark):
    o = load_source(spark, f"{SF_DIR}/orders.parquet", "parquet")
    l = load_source(spark, f"{SF_DIR}/lineitem.parquet", "parquet")
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    # a crashed earlier run can leave orphaned managed-table dirs that
    # DROP TABLE (no catalog entry) won't clean
    import shutil

    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("orders_b", "lineitem_b"):
        shutil.rmtree(os.path.join(wh, t), ignore_errors=True)
    (
        o.write.bucketBy(4, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .saveAsTable("orders_b")
    )
    (
        l.write.bucketBy(4, "l_orderkey")
        .sortBy("l_orderkey")
        .mode("overwrite")
        .saveAsTable("lineitem_b")
    )
    # at sf0.001 Catalyst would broadcast the tiny table — force the
    # sort-merge path the bucketing exists for (at scale neither side
    # broadcasts and SMJ is what Catalyst picks on its own)
    joined = (
        spark.table("orders_b")
        .hint("merge")
        .join(
            spark.table("lineitem_b"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
    )
    # co-located bucketed join: the join itself must not shuffle — the
    # only exchange allowed is the final tiny aggregation on priority
    plan = explain_formatted(joined)
    join_section = plan.split("HashAggregate")[0]
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
    n_exchanges = len(re.findall(r"\(\d+\) Exchange", join_section))
    assert n_exchanges == 0, join_section
    # and it still answers correctly
    n = joined.agg(F.sum("n")).collect()[0][0]
    assert n == l.count()
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_ivf_layout_probe_prunes_files(spark, tmp_path):
    """The 100×-scale ANN story end-to-end: corpus materialized
    hive-partitioned by IVF cell, probe reads ONLY the probed cells'
    files (PartitionFilters at the scan, numFiles = n_probes of
    n_cells), and the answer equals the scan-time ivf_ann_topk."""
    from pg_analytics_spark.operators.similarity import (
        ivf_ann_topk,
        ivf_ann_topk_pruned,
        ivf_layout,
    )

    emb = load_source(spark, f"{SF_DIR}/embeddings.parquet", "parquet")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    layout = str(tmp_path / "ivf_layout")
    ivf_layout(emb, "embedding", "vec_id", layout)

    pruned = ivf_ann_topk_pruned(
        spark, layout, "embedding", "vec_id", qvec, k=10, n_probes=2
    )
    plan = explain_formatted(pruned)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "cell" in m.group(1), plan

    n_cells_on_disk = (
        spark.read.parquet(layout).select("cell").distinct().count()
    )
    assert n_cells_on_disk == 8  # every seeded cell is populated
    n_probed = _scanned_files(
        ivf_ann_topk_pruned(
            spark, layout, "embedding", "vec_id", qvec, k=10, n_probes=2
        )
    )
    n_all = _scanned_files(spark.read.parquet(layout))
    # one file per cell (repartition-by-cell write) → exactly the
    # probed share of files is opened
    assert n_all == 8 and n_probed == 2, (n_probed, n_all)

    got = [(r["vec_id"], r["sim"]) for r in pruned.collect()]
    want = [
        (r["vec_id"], r["sim"])
        for r in ivf_ann_topk(
            emb, "embedding", "vec_id", qvec, k=10, n_probes=2
        ).collect()
    ]
    assert got == want


def test_lsh_layout_multiprobe_prunes_files(spark, tmp_path):
    """Multi-probe LSH over the bucket layout: probing radius widens
    the partition list, never rewrites the layout — numFiles scales
    with the probe set, and results match the scan-time operator."""
    from pg_analytics_spark.operators.similarity import (
        lsh_ann_topk,
        lsh_ann_topk_pruned,
        lsh_layout,
    )

    emb = load_source(spark, f"{SF_DIR}/embeddings.parquet", "parquet")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    layout = str(tmp_path / "lsh_layout")
    lsh_layout(emb, "embedding", "vec_id", layout)

    n_all = _scanned_files(spark.read.parquet(layout))
    n_r0 = _scanned_files(
        lsh_ann_topk_pruned(spark, layout, "embedding", "vec_id", qvec)
    )
    n_r1 = _scanned_files(
        lsh_ann_topk_pruned(
            spark, layout, "embedding", "vec_id", qvec, probe_radius=1
        )
    )
    # r=0 probes exactly one bucket; r=1 probes ≤ 9 (some of the 8
    # neighbor buckets may be empty on a small corpus); both prune
    assert n_r0 >= 1 and n_r0 <= 2
    assert n_r0 <= n_r1 <= min(9, n_all)
    assert n_r1 < n_all

    got = [
        (r["vec_id"], r["sim"])
        for r in lsh_ann_topk_pruned(
            spark, layout, "embedding", "vec_id", qvec, probe_radius=1
        ).collect()
    ]
    want = [
        (r["vec_id"], r["sim"])
        for r in lsh_ann_topk(
            emb, "embedding", "vec_id", qvec, probe_radius=1
        ).collect()
    ]
    assert got == want


def test_layout_cache_sees_subdir_rebuild(spark, tmp_path):
    """r7 ADVICE: a rebuild that swaps parquet files INSIDE existing
    partition subdirs (top-level listing unchanged) must invalidate
    the cached layout relation — the fingerprint folds in immediate
    subdirectory mtimes."""
    import os
    import time

    from pg_analytics_spark.operators.similarity import _open_layout

    layout = str(tmp_path / "lay")
    df = spark.createDataFrame(
        [(i, i % 2) for i in range(10)], "id int, bucket int"
    )
    df.write.partitionBy("bucket").parquet(layout)
    first = _open_layout(spark, layout)
    assert _open_layout(spark, layout) is first  # unchanged → cached
    # swap the files inside one partition dir without touching the
    # top-level listing
    sub = os.path.join(layout, "bucket=0")
    time.sleep(0.01)  # mtime_ns tick
    for name in os.listdir(sub):
        if name.endswith(".parquet"):
            os.unlink(os.path.join(sub, name))
    spark.createDataFrame([(100,)], "id int").coalesce(1).write.mode(
        "append"
    ).parquet(sub)
    reopened = _open_layout(spark, layout)
    assert reopened is not first
    assert 100 in {r["id"] for r in reopened.collect()}


def test_materialize_cluster_by_disjoint_file_ranges(spark, tmp_path):
    """cluster_by range-partitions + sorts the write so parquet
    min/max stats become zone maps: per-file key ranges must be
    pairwise disjoint (verified from the actual footers)."""
    import pyarrow.parquet as pq

    from pg_analytics_spark.engine import Engine

    eng = Engine(spark=spark)
    spark.range(0, 100_000).selectExpr(
        "CAST(hash(id) % 100000 AS BIGINT) AS k", "id AS v"
    ).createOrReplaceTempView("zm_src")
    path = str(tmp_path / "clustered")
    df = eng.materialize(
        "zm_tbl", "SELECT * FROM zm_src", path=path, cluster_by=(8, "k")
    )
    assert df.count() == 100_000
    ranges = []
    for f in [
        p[5:] if p.startswith("file:") else p for p in df.inputFiles()
    ]:
        md = pq.ParquetFile(f).metadata
        col = {
            md.row_group(0).column(i).path_in_schema: i
            for i in range(md.row_group(0).num_columns)
        }["k"]
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(col).statistics
            mins.append(st.min)
            maxs.append(st.max)
        ranges.append((min(mins), max(maxs)))
    ranges.sort()
    assert len(ranges) > 1  # clustering actually split the data
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, f"overlapping file ranges {hi1} > {lo2}"


def test_zorder_layout_skips_files_and_matches_full_scan(spark, tmp_path):
    """Z-order layout: a selective box query on EITHER clustered
    column (or both) reads a strict subset of the files, and pruned
    results equal the full-scan filter exactly."""
    from pg_analytics_spark.operators.zorder import (
        zorder_layout,
        zorder_pruned_scan,
    )

    layout = str(tmp_path / "z")
    df = spark.range(20_000).select(
        F.col("id"),
        (F.col("id") % 997).alias("x"),
        ((F.col("id") * 7919) % 1009).alias("y"),
    )
    idx = zorder_layout(df, ["x", "y"], layout, n_files=16, bits=8)
    n_total = len(idx["files"])
    assert n_total >= 8

    ranges = {"x": (100, 150), "y": (200, 260)}
    pruned = zorder_pruned_scan(spark, layout, ranges)
    n_read = _scanned_files(pruned)
    assert n_read < n_total / 2, (n_read, n_total)

    full = df.filter(
        (F.col("x") >= 100) & (F.col("x") <= 150)
        & (F.col("y") >= 200) & (F.col("y") <= 260)
    )
    got = sorted(r["id"] for r in pruned.collect())
    want = sorted(r["id"] for r in full.collect())
    assert got == want and len(got) > 0

    # single-column predicate also prunes (the z-order property a
    # plain sort on x would give y for free never has)
    one = zorder_pruned_scan(spark, layout, {"y": (0, 60)})
    assert _scanned_files(one) < n_total
    assert sorted(r["id"] for r in one.collect()) == sorted(
        r["id"] for r in df.filter("y BETWEEN 0 AND 60").collect()
    )

    # empty-overlap box → zero files, empty result, schema intact
    none = zorder_pruned_scan(spark, layout, {"x": (5000, 6000)})
    assert none.count() == 0
    assert set(none.columns) == {"id", "x", "y"}


def test_zorder_guards_and_edge_cases(spark, tmp_path):
    import pytest as _pytest

    from pg_analytics_spark.operators.zorder import (
        zorder_layout,
        zorder_pruned_scan,
    )

    df = spark.range(100).selectExpr(
        "id", "CAST(id AS STRING) AS s", "7 AS const"
    )
    # string clustering column is a loud error, not silent nulls
    with _pytest.raises(ValueError, match="string"):
        zorder_layout(df, ["id", "s"], str(tmp_path / "bad"))
    # a CONSTANT column degenerates gracefully (one bin) — layout
    # still correct, pruning on the varying column still works
    layout = str(tmp_path / "c")
    zorder_layout(df, ["id", "const"], layout, n_files=4)
    got = zorder_pruned_scan(spark, layout, {"id": (10, 19)})
    assert sorted(r["id"] for r in got.collect()) == list(range(10, 20))
