"""Vectorized partition staging for the Python DataSource writers.

Two task-side hot loops used to run row-at-a-time Python: applying an
Iceberg partition transform to the source column (``_tvalue`` with a
bounded dict cache — fine for clustered ``days(ts)``, a pure-Python
per-row loop for ``bucket(N, high_cardinality_id)``), and splitting a
record batch into per-partition-tuple groups (a Python list of key
tuples plus one O(rows) mask comprehension PER distinct tuple).  At
100 TB ingest rates both loops sit on the critical path of every
executor task, so this module replaces them with Arrow compute:

- :func:`transform_array` — the vectorized twin of
  ``iceberg_prune.transform_value`` (the READER's reference
  semantics).  Temporal transforms are integer arithmetic on the
  array's epoch representation (``day(ts)`` = micros // 86.4e9 after
  a tz-normalizing cast — Arrow stores tz-aware timestamps as UTC
  instants, so casting to naive ``timestamp[us]`` IS the
  ``astimezone(utc).replace(tzinfo=None)`` the scalar path performs);
  ``truncate[w]`` on strings is ``utf8_slice_codeunits`` (codepoint
  slicing, same as Python ``str[:w]``); ``truncate[w]`` on ints is
  floor arithmetic in numpy (numpy ``%`` floors toward -inf like
  Python's, unlike Arrow's truncating integer divide).  ``bucket[N]``
  and any future transform fall back to dictionary-encoding the
  column and murmur3-hashing only the DISTINCT values through the
  scalar ``transform_value`` — the same per-batch-distinct trick the
  write path's pandas bucket UDF uses — then a C-side ``take`` maps
  them back, so a clustered column costs O(distinct) Python calls and
  even a worst-case unique column costs one dict-encode plus one
  Python call per row with zero per-row interpreter dispatch in the
  grouping that follows.
- :func:`group_take` — distinct-tuple grouping via Arrow's hash
  group-by (``list`` aggregation over a row-index column), replacing
  the per-tuple Python mask loop.  Yields ``(key_tuple, row_indices)``
  sorted by stringified key for deterministic file ordering; callers
  ``table.take(indices)`` per group.

Parity with the scalar path is pinned property-style in
``tests/test_properties.py::test_transform_array_matches_scalar``;
the write→read agreement tests (``test_iceberg_datasource.py``) are
unchanged because the reader still prunes with ``transform_value``.

Reference scope: the reference writes no lake formats (read-only FDW,
src/fdw/handler.rs); this backs the repo's parity-plus native writers.
"""

from __future__ import annotations

from typing import Any, Iterator


def transform_array(transform: str, arr, src_type: str):
    """Vectorized ``transform_value`` over an Arrow (chunked) array.

    Returns a plain ``pyarrow.Array`` aligned with ``arr``; nulls map
    to nulls (the scalar path's ``None -> None``).
    """
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if transform == "identity":
        return arr
    if transform.startswith("truncate["):
        w = int(transform[9:-1])
        if src_type in ("int", "long"):
            return _floor_truncate(arr, w)
        if src_type == "string":
            import pyarrow.compute as pc

            return pc.utf8_slice_codeunits(arr, 0, w)
        return _via_distinct(transform, arr, src_type)
    if transform in ("year", "month", "day", "hour"):
        return _temporal_transform(transform, arr, src_type)
    # bucket[N] and anything the spec adds later: per-batch-distinct
    return _via_distinct(transform, arr, src_type)


def _floor_truncate(arr, w: int):
    """``v - (v mod w)`` with mod flooring toward -inf (Iceberg spec;
    Python/numpy semantics, NOT Arrow's truncating integer ops)."""
    import numpy as np
    import pyarrow as pa

    vals = arr.cast(pa.int64()).fill_null(0).to_numpy(
        zero_copy_only=False
    )
    out = vals - (vals % np.int64(w))
    return pa.array(out, type=pa.int64(), mask=_null_mask(arr))


def _temporal_transform(transform: str, arr, src_type: str):
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    if src_type == "date":
        days = arr.cast(pa.int32())
        if transform == "day":
            return days.cast(pa.int64())
        if transform in ("year", "month"):
            y = pc.subtract(pc.year(arr), 1970)
            if transform == "year":
                return y.cast(pa.int64())
            return pc.add(
                pc.multiply(y, 12), pc.subtract(pc.month(arr), 1)
            ).cast(pa.int64())
        return _via_distinct(transform, arr, src_type)  # hour(date): n/a
    if src_type.startswith("timestamp"):
        # tz-aware -> naive cast keeps the UTC instant (Arrow stores
        # epoch micros), matching the scalar path's astimezone(utc)
        naive = arr.cast(pa.timestamp("us"))
        if transform in ("day", "hour"):
            us = naive.cast(pa.int64()).fill_null(0).to_numpy(
                zero_copy_only=False
            )
            div = 86_400_000_000 if transform == "day" else 3_600_000_000
            out = us // np.int64(div)  # numpy // floors (pre-epoch ok)
            return pa.array(out, type=pa.int64(), mask=_null_mask(arr))
        y = pc.subtract(pc.year(naive), 1970)
        if transform == "year":
            return y.cast(pa.int64())
        return pc.add(
            pc.multiply(y, 12), pc.subtract(pc.month(naive), 1)
        ).cast(pa.int64())
    return _via_distinct(transform, arr, src_type)


def _null_mask(arr):
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    if arr.null_count == 0:
        return None
    return pc.is_null(arr).to_numpy(zero_copy_only=False).astype(
        np.bool_
    )


def _via_distinct(transform: str, arr, src_type: str):
    """Dictionary-encode, run the scalar reference transform over the
    DISTINCT values only, map back with a C-side take.  Null source
    rows get null dictionary indices, so take yields null — same as
    the scalar path's ``None -> None``."""
    import pyarrow as pa

    from pg_analytics_spark.sources.iceberg_prune import transform_value

    enc = arr.dictionary_encode()
    mapped = [
        transform_value(transform, v, src_type)
        for v in enc.dictionary.to_pylist()
    ]
    if not mapped:
        return pa.nulls(len(arr))
    return pa.array(mapped).take(enc.indices)


#: global per-task cap on buffered Arrow bytes across ALL partition
#: accumulators in a write task (r14; guide §5 spill risk): the
#: per-tuple flush threshold alone lets a task holding the allowed 256
#: tuples accumulate tuples × threshold bytes (~16 GB at 64 MB) before
#: any flush.  Crossing the cap flushes the LARGEST accumulator first —
#: large row groups are preserved for the hot tuples, cold tuples keep
#: buffering.  Env-overridable for cluster memory profiles; the default
#: bounds a task at 256 MB of buffered payload regardless of fan-out.
import os as _os

TASK_BUFFER_CAP = int(
    _os.environ.get("SPARK_GRAFT_WRITER_BUFFER_CAP", str(256 << 20))
)


class BoundedGroupBuffer:
    """Per-key accumulate-and-flush of Arrow tables with BOTH a per-key
    flush threshold (large row groups, guide §6.2) and a global cap on
    total buffered bytes (guide §5).  ``flush_fn(key, table)`` receives
    the concatenated buffered slices for one key; callers own writer
    management inside it.  ``max_buffered`` records the high-water mark
    of total buffered bytes (instrumentation for the bound's test)."""

    def __init__(self, flush_fn, key_flush_bytes: int,
                 total_cap_bytes: int | None = None) -> None:
        self._flush_fn = flush_fn
        self._key_flush = int(key_flush_bytes)
        self._cap = int(
            TASK_BUFFER_CAP if total_cap_bytes is None else total_cap_bytes
        )
        self._acc: dict = {}
        self._nbytes: dict = {}
        self._total = 0
        self.max_buffered = 0

    def add(self, key, table) -> None:
        self._acc.setdefault(key, []).append(table)
        b = table.nbytes
        self._nbytes[key] = self._nbytes.get(key, 0) + b
        self._total += b
        if self._total > self.max_buffered:
            self.max_buffered = self._total
        if self._nbytes[key] >= self._key_flush:
            self.flush(key)
        while self._total >= self._cap and self._nbytes:
            self.flush(max(self._nbytes, key=self._nbytes.get))

    def flush(self, key) -> None:
        import pyarrow as pa

        tabs = self._acc.pop(key, None)
        self._total -= self._nbytes.pop(key, 0)
        if not tabs:
            return
        t = tabs[0] if len(tabs) == 1 else pa.concat_tables(tabs)
        self._flush_fn(key, t)

    def close(self) -> None:
        for key in list(self._acc):
            self.flush(key)


def group_take(
    key_arrays: list, num_rows: int
) -> Iterator[tuple[tuple, Any]]:
    """Yield ``(key_tuple, row_indices: pa.Int64Array)`` per distinct
    key tuple via Arrow's hash group-by — no per-row Python, no
    per-tuple O(rows) mask pass.  Tuples are Python-native values
    (``to_pylist`` of the per-group key row); iteration order is
    sorted by stringified tuple for deterministic file naming."""
    import numpy as np
    import pyarrow as pa

    if num_rows == 0:
        return
    names = [f"__k{i}" for i in range(len(key_arrays))]
    kt = pa.table(
        dict(
            zip(names, key_arrays),
            __idx=pa.array(np.arange(num_rows, dtype=np.int64)),
        )
    )
    agg = kt.group_by(names).aggregate([("__idx", "list")])
    keys = list(zip(*(agg[n].to_pylist() for n in names)))
    idx_col = agg["__idx_list"].combine_chunks()
    order = sorted(
        range(len(keys)), key=lambda j: tuple(map(str, keys[j]))
    )
    for j in order:
        yield keys[j], idx_col[j].values
