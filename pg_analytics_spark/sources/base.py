"""Shared post-read transforms for all source formats.

The reference appends pseudo-columns and projections inside the DuckDB
view SQL it generates (e.g. ``filename=true`` adds a filename column to
``read_parquet`` — src/duckdb/parquet.rs:67-80; ``select`` wraps the
scan in a projection — src/duckdb/csv.rs:280-285).  In Spark these are
post-read DataFrame transforms; Catalyst folds them into the scan, so
there is no extra pass over the data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def apply_common(df: DataFrame, opts: dict) -> DataFrame:
    """Options shared across formats: filename, file_row_number, select.

    * ``filename`` → hidden ``_metadata.file_path`` (reference:
      parquet.rs:67-69, csv.rs:141-143, json.rs:74-76).
    * ``file_row_number`` → ``_metadata.row_index`` (parquet.rs:70-72).
      Spark's row index is per-file, matching DuckDB's semantics.
    * ``select`` → projection list applied after the scan
      (csv.rs:280-285, parquet.rs:100-105); Catalyst prunes the
      scan columns accordingly.
    """
    if _truthy(opts.get("filename")):
        df = df.withColumn("filename", F.col("_metadata.file_path"))
    if _truthy(opts.get("file_row_number")):
        df = df.withColumn("file_row_number", F.col("_metadata.row_index"))
    select = opts.get("select")
    if select:
        cols: list[str | Column]
        if isinstance(select, str):
            cols = [c.strip() for c in select.split(",")]
        else:
            cols = list(select)
        df = df.select(*[F.expr(c) if isinstance(c, str) else c for c in cols])
    return df


def _truthy(v) -> bool:
    if isinstance(v, bool):
        return v
    if v is None:
        return False
    return str(v).strip().lower() in {"true", "1", "yes", "on"}


def pop_keys(opts: dict, keys: list[str]) -> dict:
    """Remove and return a sub-dict of ``keys`` from ``opts`` (mutates)."""
    out = {}
    for k in keys:
        if k in opts:
            out[k] = opts.pop(k)
    return out


def hf_to_https(url: str) -> str:
    """``hf://`` path → huggingface.co resolve URL (public scheme the
    reference reads via DuckDB httpfs, README.md:44-53).

    ``hf://datasets/org/name[@rev]/path`` →
    ``https://huggingface.co/datasets/org/name/resolve/rev/path``
    (rev defaults to ``main``); same for ``hf://org/name/path`` model
    repos without the ``datasets/`` prefix.
    """
    rest = url[len("hf://") :]
    kind = ""
    if rest.startswith(("datasets/", "spaces/")):
        kind, rest = rest.split("/", 1)
        kind += "/"
    parts = rest.split("/")
    if len(parts) < 3:
        raise ValueError(f"hf:// path needs org/name/file: {url!r}")
    org, name, path = parts[0], parts[1], "/".join(parts[2:])
    rev = "main"
    if "@" in name:
        name, rev = name.split("@", 1)
    return f"https://huggingface.co/{kind}{org}/{name}/resolve/{rev}/{path}"


def localize_remote(files: list[str]) -> list[str]:
    """Fetch ``http(s)://`` inputs to a local cache, pass others through.

    The reference reads HTTP(S) URLs via DuckDB's httpfs extension
    (README.md:98-118 demo; secrets/connection plumbing
    src/duckdb/connection.rs:46-49).  Spark has no HTTP Hadoop
    filesystem, so the engine downloads once to a content-addressed
    cache (md5 of URL) and scans the local copy — the same
    single-node convenience path httpfs provides.  Files are assumed
    immutable (lake semantics): a cached copy is reused.

    Scale note: this is a driver-side convenience for ad-hoc remote
    files.  Cluster-scale data belongs on an object store with a real
    Hadoop connector (s3a/gs/abfs — see sources/secrets.py), where
    every executor reads its own split; an HTTP URL has no splits.
    """
    import hashlib
    import os
    import tempfile
    import urllib.request

    out = []
    for f in files:
        if f.startswith("hf://"):
            f = hf_to_https(f)
        if not f.startswith(("http://", "https://")):
            out.append(f)
            continue
        cache_dir = os.path.join(
            tempfile.gettempdir(), "pg_analytics_spark_http_cache"
        )
        os.makedirs(cache_dir, exist_ok=True)
        suffix = os.path.splitext(f.split("?")[0])[1] or ".bin"
        local = os.path.join(
            cache_dir, hashlib.md5(f.encode()).hexdigest() + suffix
        )
        if not os.path.exists(local):
            tmp = local + ".part"
            with urllib.request.urlopen(f) as resp, open(tmp, "wb") as fh:
                while True:
                    chunk = resp.read(1 << 20)
                    if not chunk:
                        break
                    fh.write(chunk)
            os.replace(tmp, local)  # atomic: no torn cache on crash
        out.append(local)
    return out
