"""Per-file Bloom-filter skip index over parquet files.

The memory-light file-skipping tier next to the EXACT roaring index
(operators/bitmap_index.py): one Bloom filter per (data file, indexed
column), a few KB each regardless of cardinality.  Where the bitmap
index is for low-cardinality columns (one bitmap per distinct value),
the Bloom index is for HIGH-cardinality point lookups — user ids,
order keys, document hashes — on layouts where min/max zone maps
cannot prune at all (hash-clustered files all span the full value
range).  A point probe tests k bit positions per file and scans only
the files that MAY contain the value; false positives cost extra I/O,
never wrong answers (the probe re-applies the exact predicate), and
false negatives are impossible — the classic split-block-bloom
contract parquet's ColumnIndex/bloom pages and Delta's bloom-filter
index implement (both public formats; this sidecar is the same idea
kept engine-portable).

Scale shape: the build is ONE scan — values hash per Arrow batch on
executors, per-(file, column) filters OR together in a tiny
aggregate; the sidecar is O(files × m_bits/8) bytes (8 KB per file
at the default 2^16 bits — a 100 TB table of 1 GB files carries a
~1 GB index, driver- or executor-cacheable).  The probe is
file-list-sized metadata work (the same order as a manifest prune)
followed by a scan of only the surviving files with the exact
predicate re-applied.

Reference scope: the reference's DuckDB core reads parquet bloom
pages when present; a buildable engine-side bloom sidecar is additive
parity-plus for frozen-corpus point sweeps (dedup id lookups,
per-user replays) at 100 TB.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pg_analytics_spark.errors import UnsupportedFormat

#: repo root, pickled BY VALUE into executor closures (the round-8
#: driver-sim rule — vanilla drivers' workers lack the driver's
#: sys.path).
_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

_INDEX_SCHEMA = (
    "file string, col string, n_values long, m_bits long, k int, "
    "blob binary"
)


def _positions(value: str, m_bits: int, k: int) -> list[int]:
    """k bit positions for a value's STRING form: blake2b-128 split
    into two 64-bit halves, double-hashed (h1 + i*h2 mod m) — the
    standard Kirsch–Mitzenmacher construction; deterministic across
    processes (no PYTHONHASHSEED dependence)."""
    import hashlib

    d = hashlib.blake2b(value.encode("utf-8"), digest_size=16).digest()
    h1 = int.from_bytes(d[:8], "little")
    h2 = int.from_bytes(d[8:], "little") | 1  # odd → full period
    return [(h1 + i * h2) % m_bits for i in range(k)]


def _file_expr() -> F.Column:
    return F.regexp_replace(
        F.col("_metadata.file_path"), "^file:/+", "/"
    ).alias("_file")


def build_bloom_index(
    spark: SparkSession,
    table_path: str,
    cols: list[str],
    index_dir: str,
    *,
    m_bits: int = 1 << 16,
    k: int = 7,
) -> dict:
    """Build the sidecar for ``table_path`` at ``index_dir``: one
    Bloom filter per (data file, column).  Values index by their
    STRING form (NULLs are not indexed — IS NULL probes belong to
    zone maps/stats).  Returns {"files", "entries"}."""
    if not cols:
        raise UnsupportedFormat("build_bloom_index: no columns given")
    if m_bits < 64 or m_bits & (m_bits - 1):
        raise UnsupportedFormat(
            f"build_bloom_index: m_bits must be a power of two >= 64, "
            f"got {m_bits}"
        )
    scan = spark.read.parquet(table_path).select(
        _file_expr(),
        *[F.col(c).cast("string").alias(c) for c in cols],
    )
    stack_args = ", ".join(f"'{c}', `{c}`" for c in cols)
    stacked = scan.selectExpr(
        "_file", f"stack({len(cols)}, {stack_args}) AS (col, value)"
    ).filter(F.col("value").isNotNull())

    repo_root = _REPO_ROOT
    mb, kk = int(m_bits), int(k)

    def _encode(key, pdf):
        import sys

        if repo_root not in sys.path:  # vanilla-driver worker fallback
            sys.path.insert(0, repo_root)
        import numpy as np
        import pandas as pd

        from pg_analytics_spark.operators.bloom_index import _positions

        bits = np.zeros(mb, dtype=bool)
        vals = pd.unique(pdf["value"])
        for v in vals:
            bits[_positions(str(v), mb, kk)] = True
        return pd.DataFrame(
            {
                "file": [key[0]],
                "col": [key[1]],
                "n_values": [len(vals)],
                "m_bits": [mb],
                "k": [kk],
                "blob": [np.packbits(bits).tobytes()],
            }
        )

    encoded = stacked.groupBy("_file", "col").applyInPandas(
        _encode, _INDEX_SCHEMA
    )
    encoded.write.mode("overwrite").parquet(index_dir)
    import glob as _glob

    n_files = len(
        _glob.glob(os.path.join(table_path, "*.parquet"))
    ) or (1 if os.path.isfile(table_path) else 0)
    n_entries = spark.read.parquet(index_dir).count()
    return {"files": n_files, "entries": n_entries}


def bloom_candidate_files(
    spark: SparkSession, index_dir: str, col: str, values: list
) -> tuple[list[str], int]:
    """Files whose filter MAY contain ANY of ``values`` (OR
    semantics).  Returns (candidates, n_indexed_files).  Driver-side
    metadata work: O(files) KB-scale blobs, the same order a manifest
    prune pays — never data-sized."""
    rows = (
        spark.read.parquet(index_dir)
        .filter(F.col("col") == col)
        .select("file", "m_bits", "k", "blob")
        .collect()
    )
    if not rows:
        raise UnsupportedFormat(
            f"bloom index at {index_dir} has no column {col!r}"
        )
    import numpy as np

    cand = []
    for r in rows:
        bits = np.unpackbits(
            np.frombuffer(bytes(r["blob"]), dtype=np.uint8)
        ).astype(bool)
        for v in values:
            if bits[_positions(str(v), int(r["m_bits"]), int(r["k"]))].all():
                cand.append(r["file"])
                break
    return sorted(cand), len(rows)


def bloom_probe_rows(
    spark: SparkSession,
    index_dir: str,
    col: str,
    values: list,
    columns: list[str] | None = None,
) -> DataFrame:
    """Point-lookup rows: scan ONLY the candidate files and re-apply
    the EXACT predicate — bloom false positives cost I/O, never
    correctness; false negatives cannot happen (every present value's
    bits are set).  Zero candidates returns an empty frame with the
    data schema (a normal query outcome, not an error)."""
    cand, _total = bloom_candidate_files(spark, index_dir, col, values)
    if not cand:
        any_file = (
            spark.read.parquet(index_dir)
            .select("file")
            .limit(1)
            .collect()
        )
        if not any_file:
            raise UnsupportedFormat(f"empty bloom index at {index_dir}")
        empty = (
            spark.read.parquet(any_file[0]["file"]).limit(0)
        )
        return empty.select(*columns) if columns else empty
    # residual = the user's TYPED predicate — pushes to parquet row
    # groups inside the surviving files (the string form was only the
    # index's hashing domain)
    out = spark.read.parquet(*cand).filter(F.col(col).isin(values))
    return out.select(*columns) if columns else out
