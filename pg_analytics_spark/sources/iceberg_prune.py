"""Transform-aware manifest pruning for the Iceberg metadata fallback.

Iceberg manifests record each data file's partition tuple under the
table's partition spec (spec: https://iceberg.apache.org/spec/#partitioning).
The runtime prunes files by evaluating query predicates against those
tuples through the spec's transforms; this module reproduces that for
the fallback reader: given a conjunctive predicate on SOURCE columns,
decide per data file whether it MAY contain matching rows.

Supported transforms: identity, bucket[N] (murmur3_x86_32 over the
spec's byte encodings), truncate[W] (int + string), year, month, day,
hour, void.  Unknown transforms or un-prunable (transform, op)
combinations keep the file — pruning is always a may-match superset,
never a correctness decision (the engine re-applies the predicate to
rows after the scan).

Scale note: this is driver-side KB-scale metadata work — the entire
point is that at 100 TB the engine opens only the manifest avro files
(not the data) to discard partitions, exactly like the runtime's
partition pruning.
"""

from __future__ import annotations

import datetime as dt
import json
import struct
from typing import Any

_EPOCH = dt.date(1970, 1, 1)

#: ops accepted in a partition_filter triple [col, op, value]
_OPS = {"=", "==", "<", "<=", ">", ">=", "in"}


def parse_partition_filter(raw) -> list[tuple[str, str, Any]]:
    """Normalize the option value: a list of [col, op, value] triples
    (ANDed), or its JSON encoding."""
    if raw is None:
        return []
    if isinstance(raw, str):
        raw = json.loads(raw)
    out = []
    for t in raw:
        col, op, val = t[0], str(t[1]), t[2]
        if op not in _OPS:
            raise ValueError(f"partition_filter op {op!r} not in {sorted(_OPS)}")
        out.append((col, "=" if op == "==" else op, val))
    return out


# ------------------------------------------------------------------ #
# murmur3_x86_32 — the spec's bucket hash (seed 0)
# ------------------------------------------------------------------ #


def murmur3_x86_32(data: bytes, seed: int = 0) -> int:
    """Public murmur3 32-bit x86 variant, as required by the Iceberg
    spec's bucket transform (spec §appendix-b-32-bit-hash-requirements).
    Returns a SIGNED 32-bit int (Java semantics)."""
    c1, c2 = 0xCC9E2D51, 0x1B873593
    h = seed & 0xFFFFFFFF
    n = len(data)
    nblocks = n // 4
    for i in range(nblocks):
        k = struct.unpack_from("<I", data, i * 4)[0]
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
        h = ((h << 13) | (h >> 19)) & 0xFFFFFFFF
        h = (h * 5 + 0xE6546B64) & 0xFFFFFFFF
    k = 0
    tail = data[nblocks * 4 :]
    if len(tail) >= 3:
        k ^= tail[2] << 16
    if len(tail) >= 2:
        k ^= tail[1] << 8
    if len(tail) >= 1:
        k ^= tail[0]
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
    h ^= n
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & 0xFFFFFFFF
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & 0xFFFFFFFF
    h ^= h >> 16
    return h - (1 << 32) if h >= (1 << 31) else h


def _bucket_bytes(value: Any, src_type: str) -> bytes:
    """Spec byte encodings hashed by bucket[N] (spec §bucket-transform-details):
    int/long/date/time/timestamp hash as 8-byte little-endian long;
    strings as UTF-8."""
    t = src_type
    if t in ("int", "long"):
        return struct.pack("<q", int(value))
    if t == "date":
        return struct.pack("<q", _days(value))
    if t.startswith("timestamp"):
        return struct.pack("<q", _micros(value))
    if t == "string":
        return str(value).encode("utf-8")
    raise _Unprunable()


class _Unprunable(Exception):
    """Raised when a (transform, op, type) combination can't prune —
    the caller keeps the file."""


def _days(value) -> int:
    if isinstance(value, int):
        return value
    if isinstance(value, dt.date) and not isinstance(value, dt.datetime):
        return (value - _EPOCH).days
    return (dt.date.fromisoformat(str(value)) - _EPOCH).days


def _micros(value) -> int:
    if isinstance(value, int):
        return value
    if isinstance(value, dt.datetime):
        d = value
    else:
        d = dt.datetime.fromisoformat(str(value))
    if d.tzinfo is not None:
        d = d.astimezone(dt.timezone.utc).replace(tzinfo=None)
    # exact integer micros from the timedelta's normalized components
    # (days may be negative, seconds/microseconds are 0..n) — the old
    # int(total_seconds())*1e6 + d.microsecond was wrong for pre-epoch
    # fractional seconds (truncation toward zero + a positive field)
    delta = d - dt.datetime(1970, 1, 1)
    return (
        delta.days * 86_400 + delta.seconds
    ) * 1_000_000 + delta.microseconds


def transform_value(transform: str, value: Any, src_type: str) -> Any:
    """Apply an Iceberg partition transform to a literal."""
    if transform == "identity":
        return value
    if transform.startswith("bucket["):
        n = int(transform[7:-1])
        return (murmur3_x86_32(_bucket_bytes(value, src_type)) & 0x7FFFFFFF) % n
    if transform.startswith("truncate["):
        w = int(transform[9:-1])
        if src_type in ("int", "long"):
            v = int(value)
            return v - (v % w)  # floor toward -inf, matches spec
        if src_type == "string":
            return str(value)[:w]
        raise _Unprunable()
    if transform == "year":
        return _as_dateish(value, src_type).year - 1970
    if transform == "month":
        d = _as_dateish(value, src_type)
        return (d.year - 1970) * 12 + (d.month - 1)
    if transform == "day":
        if src_type == "date":
            return _days(value)
        return _micros(value) // 86_400_000_000
    if transform == "hour":
        return _micros(value) // 3_600_000_000
    raise _Unprunable()


def _as_dateish(value, src_type):
    if src_type == "date":
        if isinstance(value, dt.date) and not isinstance(value, dt.datetime):
            return value
        return dt.date.fromisoformat(str(value))
    return _ts_parts(value)


def _ts_parts(value) -> dt.datetime:
    if isinstance(value, dt.datetime):
        d = value
    else:
        d = dt.datetime.fromisoformat(str(value))
    if d.tzinfo is not None:
        d = d.astimezone(dt.timezone.utc).replace(tzinfo=None)
    return d


#: transforms that preserve source ordering — range predicates stay
#: prunable through them (spec: bucket does NOT, void maps all to null)
_MONOTONIC = ("identity", "truncate[", "year", "month", "day", "hour")


def file_may_match(
    partition: dict | None,
    spec_fields: list[dict],
    schema_types: dict[int, str],
    predicate: list[tuple[str, str, Any]],
) -> bool:
    """Conjunction semantics: the file survives unless some predicate
    term is provably false for its partition tuple."""
    if not predicate or not spec_fields or partition is None:
        return True
    for col, op, val in predicate:
        for f in spec_fields:
            if f.get("_source_name") != col:
                continue
            pname = f["name"]
            if pname not in partition:
                continue
            pval = partition[pname]
            if pval is None:
                continue  # null partition: only IS NULL could prune; keep
            transform = f.get("transform", "identity")
            src_type = schema_types.get(f.get("source-id"), "")
            try:
                if not _term_may_match(transform, op, val, pval, src_type):
                    return False
            except (_Unprunable, ValueError, TypeError):
                continue
    return True


def _term_may_match(transform, op, val, pval, src_type) -> bool:
    if transform == "void":
        return True
    if op == "in":
        if not isinstance(val, (list, tuple)):
            raise _Unprunable()
        return any(
            _term_may_match(transform, "=", v, pval, src_type) for v in val
        )
    if transform == "identity" and isinstance(val, str):
        # type the (string) filter literal like the source column so it
        # compares against the TYPED partition value — without this an
        # identity-int partition compared "1" == 1 and UNSAFELY pruned
        # every file (r13 find: latent since the typed-tuple writer
        # landed; exposed by test_direct_write_empty_and_partitioned_
        # contracts)
        try:
            if src_type in ("int", "long"):
                val = int(val)
            elif src_type in ("float", "double"):
                val = float(val)
            elif src_type == "date":
                val = dt.date.fromisoformat(val)
            elif src_type.startswith("timestamp"):
                val = dt.datetime.fromisoformat(val)
        except ValueError:
            raise _Unprunable()
    tv = transform_value(transform, val, src_type)
    pv = _norm_pval(pval, transform, src_type)
    if op == "=":
        return pv == tv
    if transform.startswith("bucket["):
        return True  # bucket is not order-preserving; ranges unprunable
    if not any(transform.startswith(m) for m in _MONOTONIC):
        return True
    # order-preserving transform T: source s in file => T(s) == pv, and
    # T monotonic => (s < val => T(s) <= T(val)), so:
    if op == "<":
        return pv <= tv
    if op == "<=":
        return pv <= tv
    if op == ">":
        return pv >= tv
    if op == ">=":
        return pv >= tv
    return True


def _norm_pval(pval, transform, src_type):
    """Partition values deserialized from avro may surface dates as
    days-int or date, timestamps as micros-int — normalize to the
    representation transform_value produces."""
    if transform == "identity":
        if src_type == "date" and isinstance(pval, int):
            return _EPOCH + dt.timedelta(days=pval)
        if src_type.startswith("timestamp") and isinstance(pval, int):
            return dt.datetime(1970, 1, 1) + dt.timedelta(microseconds=pval)
        if isinstance(pval, (dt.date, dt.datetime)):
            return pval
        return pval
    return pval


def schema_field_types(meta: dict) -> tuple[dict[int, str], dict[int, str]]:
    """(field-id → type name, field-id → field name) from the current
    table schema (v2 `schemas`+`current-schema-id`, v1 `schema`)."""
    schema = None
    if "schemas" in meta:
        cur = meta.get("current-schema-id")
        for s in meta["schemas"]:
            if s.get("schema-id") == cur:
                schema = s
                break
        if schema is None and meta["schemas"]:
            schema = meta["schemas"][-1]
    if schema is None:
        schema = meta.get("schema") or {}
    types: dict[int, str] = {}
    names: dict[int, str] = {}
    for f in schema.get("fields", []):
        t = f.get("type")
        types[f["id"]] = t if isinstance(t, str) else str(t)
        names[f["id"]] = f["name"]
    return types, names


def spec_fields_for(meta: dict, spec_id: int, names: dict[int, str]) -> list[dict]:
    """Partition-spec fields for spec_id, annotated with the source
    column NAME (what user predicates reference)."""
    fields = None
    for s in meta.get("partition-specs", []):
        if s.get("spec-id") == spec_id:
            fields = s.get("fields")
            break
    if fields is None:
        fields = meta.get("partition-spec")  # v1 layout
    if not fields:
        return []
    out = []
    for f in fields:
        g = dict(f)
        g["_source_name"] = names.get(f.get("source-id"))
        out.append(g)
    return out


# ------------------------------------------------------------------ #
# Column-bounds file skipping (spec: data_file.lower_bounds /
# upper_bounds, values in Appendix-D single-value binary encoding)
# ------------------------------------------------------------------ #

def _decode_bound(raw: bytes, ice_type: str):
    """Appendix-D single-value binary → Python value for the primitive
    types bounds carry.  Unknown types → None (no pruning on them)."""
    if raw is None:
        return None
    b = bytes(raw)
    try:
        if ice_type in ("int", "date"):
            return struct.unpack("<i", b)[0]
        if ice_type == "long" or ice_type.startswith("timestamp"):
            return struct.unpack("<q", b)[0]
        if ice_type == "float":
            return struct.unpack("<f", b)[0]
        if ice_type == "double":
            return struct.unpack("<d", b)[0]
        if ice_type == "string":
            return b.decode("utf-8")
    except (struct.error, UnicodeDecodeError):
        return None
    return None


def _bounds_map(raw) -> dict[int, bytes]:
    """Manifest bounds arrive either as an Avro k/v-pair array
    (the spec's map<int, binary> encoding) or as a plain dict."""
    if raw is None:
        return {}
    if isinstance(raw, dict):
        out = {}
        for k, v in raw.items():
            try:
                out[int(k)] = v
            except (TypeError, ValueError):
                continue
        return out
    return {
        int(kv["key"]): kv["value"]
        for kv in raw
        if isinstance(kv, dict) and "key" in kv
    }


def file_bounds_may_match(
    data_file: dict,
    field_ids: dict[str, int],
    field_types: dict[int, str],
    predicate: list[tuple[str, str, Any]],
) -> bool:
    """Data skipping on column min/max bounds: the file survives unless
    some predicate term is provably false for its [lower, upper] range.
    Files without bounds for a column always survive (skipping must be
    safe); `in` lists prune only when EVERY member misses the range."""
    if not predicate:
        return True
    lowers = _bounds_map(data_file.get("lower_bounds"))
    uppers = _bounds_map(data_file.get("upper_bounds"))
    if not lowers and not uppers:
        return True
    for col, op, val in predicate:
        fid = field_ids.get(col)
        if fid is None:
            continue
        t = field_types.get(fid)
        if t is None:
            continue
        lo = _decode_bound(lowers.get(fid), t)
        hi = _decode_bound(uppers.get(fid), t)
        if lo is None and hi is None:
            continue

        def _typed(v):
            # bounds decode as int days/micros for date/timestamp and
            # as numerics for int/long/float/double — type the string
            # filter literal to match (r13: untyped literals made every
            # numeric bound comparison a no-op TypeError keep)
            if not isinstance(v, str):
                return v
            if t in ("int", "long"):
                return int(v)
            if t in ("float", "double"):
                return float(v)
            if t == "date":
                return _days(v)
            if t.startswith("timestamp"):
                return _micros(v)
            return v

        def _term_possible(term_op, v) -> bool:
            try:
                v = _typed(v)
            except ValueError:
                return True
            try:
                if term_op == "=":
                    return not (
                        (lo is not None and v < lo) or (hi is not None and v > hi)
                    )
                if term_op == "<":
                    return lo is None or lo < v
                if term_op == "<=":
                    return lo is None or lo <= v
                if term_op == ">":
                    return hi is None or hi > v
                if term_op == ">=":
                    return hi is None or hi >= v
            except TypeError:
                return True
            return True

        if op == "in":
            # Each member is an equality probe against [lo, hi]; the file
            # is skippable only when every member misses the range.
            if not any(_term_possible("=", v) for v in list(val)):
                return False
        elif not _term_possible(op, val):
            return False
    return True
