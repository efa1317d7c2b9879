"""Z-order (Morton) clustering layout + min/max file skipping.

The lakehouse answer to multi-column range queries at 100 TB: cluster
the table ONCE along the Morton curve of the filter columns, record
per-file min/max stats, and every later box query prunes to the few
files whose ranges overlap — the mechanism behind Delta's ``OPTIMIZE
ZORDER BY`` and Iceberg's sort-order file skipping, built here from
first principles on plain parquet (interleave expression → one
range-repartition → footer-stats sidecar).

Why z-order and not a plain sort: a single-column sort clusters ONE
column perfectly and the others not at all; bit-interleave gives every
participating column locality ~2^-k of the key range per k prefix
bits, so selective predicates on ANY subset of the clustered columns
skip most files.

Reference analog: the reference exposes parquet scans only
(/root/reference/src/duckdb/parquet.rs:24-80 option surface) and
delegates layout to whatever wrote the files — this operator is the
writer side a 100 TB deployment needs.

Scale shape: the rank-bin boundaries come from approxQuantile (a
sample-based driver-side list — the same mechanism
repartitionByRange's RangePartitioner uses), binning and interleaving
are pure per-row expressions (no shuffle), and the ONE shuffle is the
range-repartition that physically clusters the data.  The sidecar
index is file-list-sized; pruning is a driver-side overlap test plus
a parquet scan of only the surviving files, with the residual
predicate re-applied for exactness (skipping is a superset filter,
never a semantics change).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_INDEX_NAME = "_zorder_index.json"


def zorder_bin_expr(col: str, bounds: list[float]):
    """Quantile-bin a column against literal boundaries: the bin is
    the count of boundaries ≤ value — a HOF over a literal array.
    CAUTION: Spark executes higher-order-function lambdas INTERPRETED
    (no codegen), so this is O(len(bounds)) interpreted evals per row
    — measured 56s for a 2×255-boundary bin over sf0.1 lineitem.
    Kept for tiny boundary lists; the layout builders use
    :func:`zorder_bins` (ml.Bucketizer — compiled binary search)."""
    arr = ", ".join(repr(float(b)) for b in bounds)
    return F.expr(
        f"size(filter(array({arr}), b -> CAST({col} AS DOUBLE) >= b))"
    ).cast("long")


def zorder_bins(
    df: DataFrame, cols: list[str], *, bits: int = 8,
    rel_err: float = 0.001,
) -> tuple[DataFrame, list[str]]:
    """Quantile-bin every clustering column into [0, 2^bits) via
    approxQuantile boundaries + ``pyspark.ml.feature.Bucketizer`` —
    a COMPILED binary search per row (the literal-array HOF bin is
    interpreted and ~50× slower at sf0.1).  Returns (df with
    ``__zb_<col>`` long bins appended, bin column names).  NULL/NaN
    values land in Bucketizer's overflow bucket (≥ 2^bits), whose low
    bits are zero — they cluster together at the curve origin."""
    from pyspark.ml.feature import Bucketizer

    numeric = {
        "byte", "short", "integer", "long", "float", "double",
        "decimal", "date", "timestamp", "timestamp_ntz",
    }
    for c in cols:
        t = df.schema[c].dataType.typeName()
        if t.split("(")[0] not in numeric:
            raise ValueError(
                f"zorder: column {c!r} has type {t} — clustering needs "
                "a numeric/date/timestamp column (strings would cast "
                "to NULL and cluster nothing); hash or dictionary-"
                "encode the column first"
            )
    n_bounds = (1 << bits) - 1
    probs = [(i + 1) / (n_bounds + 1) for i in range(n_bounds)]
    out = df
    for c in cols:
        t = df.schema[c].dataType.typeName()
        src = (
            F.col(c).cast("timestamp").cast("double")  # epoch seconds
            if t in ("date", "timestamp", "timestamp_ntz")
            else F.col(c).cast("double")
        )
        out = out.withColumn(f"__zd_{c}", src)
    bin_cols = []
    for c in cols:
        bounds = out.stat.approxQuantile(f"__zd_{c}", probs, rel_err)
        splits = (
            [float("-inf")] + sorted(set(bounds)) + [float("inf")]
        )
        out = Bucketizer(
            splits=splits,
            inputCol=f"__zd_{c}",
            outputCol=f"__zbd_{c}",
            handleInvalid="keep",
        ).transform(out)
        out = out.withColumn(
            f"__zb_{c}", F.col(f"__zbd_{c}").cast("long")
        ).drop(f"__zd_{c}", f"__zbd_{c}")
        bin_cols.append(f"__zb_{c}")
    return out, bin_cols


def zorder_key_expr(bin_cols: list[str], bits: int):
    """Morton interleave of pre-binned columns (each in [0, 2^bits)):
    key bit j·n+i is bit j of column i — one wide integer expression,
    whole-stage codegen, no Python."""
    n = len(bin_cols)
    terms = [
        f"(shiftleft(shiftright({c}, {j}) & 1, {j * n + i}))"
        for j in range(bits)
        for i, c in enumerate(bin_cols)
    ]
    return F.expr(" + ".join(terms)).cast("long")


def zorder_layout(
    df: DataFrame,
    cols: list[str],
    out_path: str,
    *,
    n_files: int = 16,
    bits: int = 8,
) -> dict:
    """Materialize ``df`` clustered along the z-order curve of
    ``cols`` into ``n_files`` parquet files plus a min/max sidecar
    index.  Returns the index dict.

    Pipeline: approxQuantile boundaries per column (sample-sized
    driver list) → per-row bin + Morton-interleave expressions →
    ``repartitionByRange(n_files, zkey)`` (the one shuffle) →
    ``sortWithinPartitions(zkey)`` so row groups inside each file are
    tight too → footer-stats walk builds the per-file min/max index.
    """
    binned, bin_cols = zorder_bins(df, cols, bits=bits)
    zkey = zorder_key_expr(bin_cols, bits)
    clustered = (
        binned.withColumn("__zkey", zkey)
        .repartitionByRange(n_files, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey", *bin_cols)
    )
    clustered.write.mode("overwrite").parquet(out_path)
    index = _build_minmax_index(out_path, cols)
    tmp = os.path.join(out_path, f".{_INDEX_NAME}.tmp")
    with open(tmp, "w") as fh:
        json.dump(index, fh)
    os.replace(tmp, os.path.join(out_path, _INDEX_NAME))
    return index


def _build_minmax_index(path: str, cols: list[str]) -> dict:
    """Per-file min/max of ``cols`` from parquet FOOTER statistics —
    no data read, one driver-side pass over the file list (the same
    stats Delta's data-skipping log records at write time)."""
    import pyarrow.parquet as pq

    files: dict[str, dict[str, list]] = {}
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, name)).metadata
        col_idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        stats: dict[str, list] = {}
        for c in cols:
            lo = hi = None
            for rg in range(md.num_row_groups):
                s = md.row_group(rg).column(col_idx[c]).statistics
                if s is None or not s.has_min_max:
                    lo, hi = None, None
                    break
                lo = s.min if lo is None else min(lo, s.min)
                hi = s.max if hi is None else max(hi, s.max)
            if lo is None:
                continue  # no stats → file can never be skipped on c
            lo = lo.item() if hasattr(lo, "item") else lo
            hi = hi.item() if hasattr(hi, "item") else hi
            if not isinstance(lo, (int, float)) or not isinstance(
                hi, (int, float)
            ):
                # non-JSON-scalar stats (dates decode as objects) —
                # skip the entry; the file is kept conservatively
                continue
            stats[c] = [lo, hi]
        files[name] = stats
    return {"cols": cols, "files": files}


def zorder_pruned_scan(
    spark: SparkSession,
    layout_path: str,
    ranges: dict[str, tuple],
) -> DataFrame:
    """Box query over a z-order layout: keep only files whose min/max
    envelope overlaps EVERY requested [lo, hi] range (a file with no
    stats for a column is conservatively kept), scan just those, and
    re-apply the exact predicate — pruning is a superset filter, so
    results are identical to a full scan, independent of layout
    quality."""
    with open(os.path.join(layout_path, _INDEX_NAME)) as fh:
        index = json.load(fh)
    keep = []
    for name, stats in index["files"].items():
        ok = True
        for c, (lo, hi) in ranges.items():
            s = stats.get(c)
            if s is not None and (s[1] < lo or s[0] > hi):
                ok = False
                break
        if ok:
            keep.append(os.path.join(layout_path, name))
    if not keep:
        schema = spark.read.parquet(layout_path).schema
        return spark.createDataFrame([], schema)
    df = spark.read.parquet(*keep)
    for c, (lo, hi) in ranges.items():
        df = df.filter((F.col(c) >= lo) & (F.col(c) <= hi))
    return df
