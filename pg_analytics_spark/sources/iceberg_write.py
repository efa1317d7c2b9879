"""Zero-dependency Apache Iceberg WRITER (format-version 2,
unpartitioned).

The reference only reads Iceberg (`iceberg_scan`, src/duckdb/
iceberg.rs); this closes the write loop with the public spec and the
repo's own Avro container writer (sources/avro.py): parquet data files
plus `metadata/` — versioned metadata JSON, an Avro manifest list per
snapshot, Avro manifests whose data_file entries carry record counts
and Appendix-D–encoded column bounds (the exact shape
sources/iceberg_prune.py's data skipping consumes), and
`version-hint.text` for catalog-less discovery.

* ``overwrite`` — new snapshot whose manifest list references ONLY the
  new manifest (prior files unreferenced; prior snapshots stay in the
  metadata for time travel).
* ``append``    — new snapshot whose manifest list carries the prior
  snapshot's manifests plus the new one.

Field ids are assigned 1..n on table creation and REUSED on append
(resolved by name against the current schema).  Append schema
semantics mirror the Delta writer: missing OPTIONAL columns
null-fill, overlapping columns must keep their type, and NEW columns
require the ``mergeSchema`` option — they get FRESH field ids past
last-column-id and a bumped schema id, so id-based readers surface
nulls for them in pre-evolution files (the spec's add-column rule).
Data files are written by executors; only
the O(files) manifest/metadata construction is driver-side, the same
disposition as every Iceberg writer.  Single-writer by design (no
catalog/commit-race arbitration — same scope note as
sources/delta_write.py).
"""

from __future__ import annotations

import json
import os
import shutil
import struct
import uuid

from pyspark.sql import DataFrame

from pg_analytics_spark.errors import UnsupportedFormat
from pg_analytics_spark.sources.avro import read_container, write_container
from pg_analytics_spark.sources.delta_write import _truthy_opt

#: Spark typeName → Iceberg primitive type (inverse of the reader map)
_SPARK_TO_ICE = {
    "boolean": "boolean",
    "integer": "int",
    "short": "int",
    "byte": "int",
    "long": "long",
    "float": "float",
    "double": "double",
    "date": "date",
    "timestamp_ntz": "timestamp",
    "timestamp": "timestamptz",
    "string": "string",
    "binary": "binary",
}

_MANIFEST_LIST_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string"},
        {"name": "manifest_length", "type": "long"},
        {"name": "partition_spec_id", "type": "int"},
        {"name": "content", "type": "int"},
        {"name": "sequence_number", "type": ["null", "long"]},
        {"name": "added_snapshot_id", "type": "long"},
    ],
}

_KV = lambda n: {  # noqa: E731
    "type": "array",
    "items": {
        "type": "record",
        "name": n,
        "fields": [
            {"name": "key", "type": "int"},
            {"name": "value", "type": "bytes"},
        ],
    },
}

#: Avro type for an Iceberg partition-source type (identity transform)
_ICE_TO_AVRO = {
    "int": "int",
    "long": "long",
    "string": "string",
    "date": "int",  # days since epoch
}


def _manifest_entry_schema(part_fields: list[dict]) -> dict:
    """Manifest-entry Avro schema; data_file gains a `partition` record
    when the table is partitioned (field names = spec field names)."""
    df_fields = [
        {"name": "content", "type": "int"},
        {"name": "file_path", "type": "string"},
        {"name": "file_format", "type": "string"},
        {"name": "record_count", "type": "long"},
        {"name": "file_size_in_bytes", "type": "long"},
        {"name": "lower_bounds", "type": ["null", _KV("kvl")]},
        {"name": "upper_bounds", "type": ["null", _KV("kvu")]},
    ]
    if part_fields:
        df_fields.insert(
            1,
            {
                "name": "partition",
                "type": {
                    "type": "record",
                    "name": "rp",
                    "fields": [
                        {
                            "name": f["name"],
                            "type": ["null", _ICE_TO_AVRO[f["_ice_type"]]],
                        }
                        for f in part_fields
                    ],
                },
            },
        )
    return {
        "type": "record",
        "name": "manifest_entry",
        "fields": [
            {"name": "status", "type": "int"},
            {"name": "snapshot_id", "type": ["null", "long"]},
            {
                "name": "data_file",
                "type": {"type": "record", "name": "r2", "fields": df_fields},
            },
        ],
    }


def _ice_type(spark_field) -> str:
    t = spark_field.dataType
    name = t.typeName()
    if name in _SPARK_TO_ICE:
        return _SPARK_TO_ICE[name]
    if name == "decimal":
        return f"decimal({t.precision}, {t.scale})"
    raise UnsupportedFormat(
        f"iceberg writer: unsupported column type {name!r} "
        f"({spark_field.name}); nested types need a real Iceberg runtime"
    )


def _encode_bound(v, ice_type: str) -> bytes | None:
    """Appendix-D single-value binary encoding (the reader's
    _decode_bound inverse) for the bound-carrying primitives."""
    import datetime as dt

    try:
        if ice_type == "int":
            return struct.pack("<i", int(v))
        if ice_type == "date":
            if isinstance(v, dt.date):
                v = (v - dt.date(1970, 1, 1)).days
            return struct.pack("<i", int(v))
        if ice_type == "long":
            return struct.pack("<q", int(v))
        if ice_type.startswith("timestamp"):
            if isinstance(v, dt.datetime):
                epoch = dt.datetime(1970, 1, 1, tzinfo=v.tzinfo)
                v = int((v - epoch).total_seconds() * 1_000_000)
            return struct.pack("<q", int(v))
        if ice_type == "float":
            return struct.pack("<f", float(v))
        if ice_type == "double":
            return struct.pack("<d", float(v))
        if ice_type == "string":
            return str(v).encode("utf-8")
    except (TypeError, ValueError, OverflowError):
        return None
    return None


def _file_bounds(path: str, fields: list[dict]) -> tuple[list, list, int]:
    """(lower_bounds kv, upper_bounds kv, num_rows) from the parquet
    footer, Appendix-D encoded per field id.  Loud on an unreadable
    footer — the manifest's record_count requires it anyway."""
    from pg_analytics_spark.sources.footer_stats import footer_minmax

    bounds, num_rows = footer_minmax(path)
    lowers, uppers = [], []
    for f in fields:
        if f["name"] not in bounds or not isinstance(f["type"], str):
            continue
        lo, hi = bounds[f["name"]]
        blo = _encode_bound(lo, f["type"])
        bhi = _encode_bound(hi, f["type"])
        if blo is not None and bhi is not None:
            lowers.append({"key": f["id"], "value": blo})
            uppers.append({"key": f["id"], "value": bhi})
    return lowers, uppers, num_rows


def _partition_tuple(rel_dir: str, part_fields: list[dict]) -> dict:
    """Typed partition tuple from the staging dir path (`_p0=v/...`),
    keyed by the spec field NAME (what the reader's pruning reads)."""
    import datetime as dt
    from urllib.parse import unquote

    raw: dict[int, str] = {}
    for seg in rel_dir.split(os.sep):
        if "=" in seg:
            k, _, v = seg.partition("=")
            if k.startswith("_p") and k[2:].isdigit():
                raw[int(k[2:])] = unquote(v)
    out = {}
    for i, pf in enumerate(part_fields):
        v = raw.get(i)
        if v is None or v == "__HIVE_DEFAULT_PARTITION__":
            out[pf["name"]] = None
            continue
        t = pf["_ice_type"]
        if t in ("int", "long"):
            out[pf["name"]] = int(v)
        elif t == "date":
            out[pf["name"]] = (
                dt.date.fromisoformat(v) - dt.date(1970, 1, 1)
            ).days
        else:
            out[pf["name"]] = v
    return out


def _latest_metadata(meta_dir: str) -> tuple[int, dict | None]:
    if not os.path.isdir(meta_dir):
        return 0, None
    versions = [
        int(f[1:].split(".")[0])
        for f in os.listdir(meta_dir)
        if f.startswith("v") and f.endswith(".metadata.json")
        and f[1:].split(".")[0].isdigit()
    ]
    if not versions:
        return 0, None
    v = max(versions)
    with open(os.path.join(meta_dir, f"v{v}.metadata.json")) as fh:
        return v, json.load(fh)


def write_iceberg(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: str | list[str] | None = None,
    options: dict | None = None,
) -> dict:
    """Write ``df`` as one Iceberg v2 snapshot at ``path``.

    ``partition_by`` (identity transforms only — int/long/string/date
    sources) records each file's partition tuple in the manifest, so
    the reader's ``partition_filter`` prunes at the MANIFEST level;
    data files keep the partition column (the write stages through a
    duplicated column, since Spark's partitionBy drops the dir column
    from the files while Iceberg identity partitioning keeps it).
    On append the existing spec is reused; a different partition_by is
    rejected.  Returns {"snapshot_id": id, "files": n, "rows": n}.
    """
    import time as _time

    if mode not in ("overwrite", "append"):
        raise UnsupportedFormat(f"iceberg write mode {mode!r}")
    # None = inherit the table's spec; [] = explicitly unpartitioned
    explicit_parts = partition_by is not None
    part_cols = (
        [partition_by] if isinstance(partition_by, str)
        else list(partition_by or [])
    )
    meta_dir = os.path.join(path, "metadata")
    data_dir = os.path.join(path, "data")
    prev_version, prev_meta = _latest_metadata(meta_dir)
    schema_id = 0
    prev_schemas: list[dict] = []
    if prev_meta is None:
        mode = "overwrite"
        fields = [
            {"id": i + 1, "name": f.name, "type": _ice_type(f), "required": False}
            for i, f in enumerate(df.schema.fields)
        ]
    else:
        prev_schemas = list(prev_meta.get("schemas", []))
        schema_id = prev_meta.get("current-schema-id", 0)
        cur_schema = next(
            s for s in prev_schemas if s.get("schema-id") == schema_id
        )
        fields = cur_schema["fields"]
        # compare (name, type) SHAPE — a same-name type change is a
        # schema change too (names-only comparison would write string
        # data under a long-typed metadata entry: silent corruption)
        have = {(f["name"], f["type"]) for f in fields}
        want = {(f.name, _ice_type(f)) for f in df.schema.fields}
        if have != want:
            if mode == "append":
                # delta-writer-symmetric append semantics: missing
                # OPTIONAL table columns null-fill; overlapping names
                # must keep their type; NEW columns need mergeSchema
                # and evolve the schema with FRESH field ids (old data
                # files simply lack the id — id-based readers surface
                # nulls, the spec's add-column rule)
                from pyspark.sql import functions as F

                from pg_analytics_spark.sources.iceberg import (
                    _ice_to_spark_type,
                )

                df_types = {f.name: _ice_type(f) for f in df.schema.fields}
                cols = []
                for tf in fields:
                    name = tf["name"]
                    if name in df_types:
                        if df_types[name] != tf["type"]:
                            raise UnsupportedFormat(
                                f"iceberg append type mismatch on "
                                f"{name!r}: table has {tf['type']}, "
                                f"dataframe has {df_types[name]}"
                            )
                        cols.append(F.col(name))
                    elif tf.get("required"):
                        raise UnsupportedFormat(
                            f"iceberg append missing REQUIRED column "
                            f"{name!r}"
                        )
                    else:
                        spark_t = _ice_to_spark_type(tf["type"])
                        if spark_t is None:
                            raise UnsupportedFormat(
                                f"iceberg append cannot null-fill "
                                f"{name!r} ({tf['type']})"
                            )
                        cols.append(
                            F.lit(None).cast(spark_t).alias(name)
                        )
                table_names = {f["name"] for f in fields}
                new_sfields = [
                    f for f in df.schema.fields
                    if f.name not in table_names
                ]
                if new_sfields and not _truthy_opt(
                    (options or {}).get("mergeSchema")
                ):
                    raise UnsupportedFormat(
                        "iceberg append has new columns "
                        f"{[f.name for f in new_sfields]} — pass "
                        "options={'mergeSchema': 'true'} to evolve the "
                        "table schema, or drop them"
                    )
                if new_sfields:
                    next_id = prev_meta.get(
                        "last-column-id", max(f["id"] for f in fields)
                    )
                    fields = list(fields)
                    for f in new_sfields:
                        next_id += 1
                        fields.append(
                            {
                                "id": next_id,
                                "name": f.name,
                                "type": _ice_type(f),
                                "required": False,
                            }
                        )
                        cols.append(F.col(f.name))
                    schema_id = (
                        max(s.get("schema-id", 0) for s in prev_schemas)
                        + 1
                    )
                df = df.select(*cols)
            else:
                # overwrite is a logical replace: evolve per the spec's
                # rule — reuse the field id ONLY for a same-name column
                # of the SAME type (a type change is drop+add: new id,
                # since id-based readers would otherwise bind old
                # data/bounds to the new type); fresh ids come from
                # last-column-id, which stays MONOTONIC across drops so
                # dropped ids are never reused.  NOTE the fallback
                # reader conforms ALL snapshots to the CURRENT schema,
                # so time travel across a shape-changing overwrite
                # reads old files through the new schema (adds surface
                # as NULLs) — documented reader limitation.
                prev_ids = {(f["name"], f["type"]): f["id"] for f in fields}
                next_id = prev_meta.get(
                    "last-column-id", max(f["id"] for f in fields)
                )
                new_fields = []
                for f in df.schema.fields:
                    key = (f.name, _ice_type(f))
                    if key in prev_ids:
                        fid_ = prev_ids[key]
                    else:
                        next_id += 1
                        fid_ = next_id
                    new_fields.append(
                        {
                            "id": fid_,
                            "name": f.name,
                            "type": _ice_type(f),
                            "required": False,
                        }
                    )
                fields = new_fields
                schema_id = (
                    max(s.get("schema-id", 0) for s in prev_schemas) + 1
                )

    fid = {f["name"]: f["id"] for f in fields}
    ftype = {f["name"]: f["type"] for f in fields}
    part_fields: list[dict] = []
    if prev_meta is not None:
        prev_spec = next(
            (
                s
                for s in prev_meta.get("partition-specs", [])
                if s.get("spec-id") == prev_meta.get("default-spec-id", 0)
            ),
            {"fields": []},
        )
        id_to_name = {f["id"]: f["name"] for f in fields}
        prev_part_cols = []
        missing_sources = []
        for pf in prev_spec.get("fields", []):
            name = id_to_name.get(pf["source-id"])
            if name is None:
                missing_sources.append(pf.get("name", pf["source-id"]))
            else:
                prev_part_cols.append(name)
        if mode == "append" and explicit_parts and part_cols != prev_part_cols:
            raise UnsupportedFormat(
                f"iceberg append partition mismatch: table spec is "
                f"{prev_part_cols}, requested {part_cols}"
            )
        if not explicit_parts:
            if missing_sources:
                # the overwrite evolved away (or retyped) a partition
                # source column; inheriting the spec is impossible —
                # demand an explicit choice instead of dying obscurely
                raise UnsupportedFormat(
                    f"overwrite drops/retypes partition source column(s) "
                    f"{missing_sources}; pass partition_by explicitly "
                    "(e.g. partition_by=[] for an unpartitioned rewrite)"
                )
            part_cols = prev_part_cols
    for i, c in enumerate(part_cols):
        t = ftype.get(c)
        if t not in _ICE_TO_AVRO:
            raise UnsupportedFormat(
                f"iceberg identity partitioning on {c!r} ({t}) unsupported"
                " — int/long/string/date sources only"
            )
        part_fields.append(
            {
                "source-id": fid[c],
                "field-id": 1000 + i,
                "name": c,
                "transform": "identity",
                "_ice_type": t,
            }
        )

    # ---- partition-spec identity: specs are IMMUTABLE per the spec —
    # changing the partitioning mints a new spec-id so old snapshots'
    # manifests keep decoding against the spec they were written with
    spec_fields_public = [
        {k: v for k, v in pf.items() if not k.startswith("_")}
        for pf in part_fields
    ]
    prev_specs = list((prev_meta or {}).get("partition-specs", []))
    spec_id = None
    for s in prev_specs:
        if s.get("fields", []) == spec_fields_public:
            spec_id = s["spec-id"]
            break
    if spec_id is None:
        spec_id = (
            max((s.get("spec-id", 0) for s in prev_specs), default=-1) + 1
        )
        partition_specs = prev_specs + [
            {"spec-id": spec_id, "fields": spec_fields_public}
        ]
    else:
        partition_specs = prev_specs or [
            {"spec-id": spec_id, "fields": spec_fields_public}
        ]

    # ---- data files (distributed write, then move under data/)
    staging = os.path.join(
        os.path.dirname(path.rstrip("/")) or ".",
        f"_ice_stage-{uuid.uuid4().hex}",
    )
    out_df = df
    if part_cols:
        # stage via DUPLICATED dir columns: partitionBy drops its
        # columns from the files, but Iceberg identity partitioning
        # keeps them in the data — the copies only name the dirs
        from pyspark.sql import functions as F

        dir_cols = [f"_p{i}" for i in range(len(part_cols))]
        for dc, c in zip(dir_cols, part_cols):
            out_df = out_df.withColumn(dc, F.col(c))
        writer = out_df.write.mode("overwrite")
        fwd = {k: v for k, v in (options or {}).items() if k != "mergeSchema"}
        if fwd:
            writer = writer.options(**fwd)
        writer.partitionBy(*dir_cols).parquet(staging)
    else:
        writer = out_df.write.mode("overwrite")
        fwd = {k: v for k, v in (options or {}).items() if k != "mergeSchema"}
        if fwd:
            writer = writer.options(**fwd)
        writer.parquet(staging)
    os.makedirs(data_dir, exist_ok=True)
    entries = []
    n_rows = 0
    snapshot_id = int(uuid.uuid4().int % (1 << 62)) + 1
    for root, _dirs, names in os.walk(staging):
        for name in sorted(names):
            if not name.endswith(".parquet"):
                continue
            src = os.path.join(root, name)
            rel_dir = os.path.relpath(root, staging)
            dst = os.path.join(
                data_dir, f"{snapshot_id}-{uuid.uuid4().hex}.parquet"
            )
            os.replace(src, dst)
            lowers, uppers, rows = _file_bounds(dst, fields)
            n_rows += rows
            data_file = {
                "content": 0,
                "file_path": dst,
                "file_format": "PARQUET",
                "record_count": rows,
                "file_size_in_bytes": os.path.getsize(dst),
                "lower_bounds": lowers or None,
                "upper_bounds": uppers or None,
            }
            if part_fields:
                data_file["partition"] = _partition_tuple(
                    rel_dir, part_fields
                )
            entries.append(
                {
                    "status": 1,
                    "snapshot_id": snapshot_id,
                    "data_file": data_file,
                }
            )
    shutil.rmtree(staging, ignore_errors=True)

    os.makedirs(meta_dir, exist_ok=True)
    seq = (prev_meta or {}).get("last-sequence-number", 0) + 1
    manifest = os.path.join(meta_dir, f"man-{snapshot_id}.avro")
    write_container(_manifest_entry_schema(part_fields), entries, manifest)
    mf_entries = [
        {
            "manifest_path": manifest,
            "manifest_length": os.path.getsize(manifest),
            "partition_spec_id": spec_id,
            "content": 0,
            "sequence_number": seq,
            "added_snapshot_id": snapshot_id,
        }
    ]
    if mode == "append" and prev_meta is not None:
        prev_snap = next(
            s
            for s in prev_meta["snapshots"]
            if s["snapshot-id"] == prev_meta["current-snapshot-id"]
        )
        _schema, prev_list = read_container(prev_snap["manifest-list"])
        mf_entries = list(prev_list) + mf_entries
    mlist = os.path.join(meta_dir, f"snap-{snapshot_id}.avro")
    write_container(_MANIFEST_LIST_SCHEMA, mf_entries, mlist)

    now_ms = int(_time.time() * 1000)
    snapshots = list((prev_meta or {}).get("snapshots", []))
    snapshots.append(
        {
            "snapshot-id": snapshot_id,
            "manifest-list": mlist,
            "timestamp-ms": now_ms,
            "sequence-number": seq,
            "summary": {"operation": mode},
        }
    )
    log = list((prev_meta or {}).get("snapshot-log", []))
    log.append({"snapshot-id": snapshot_id, "timestamp-ms": now_ms})
    meta = {
        "format-version": 2,
        "table-uuid": (prev_meta or {}).get("table-uuid", str(uuid.uuid4())),
        "location": path,
        "last-sequence-number": seq,
        # MONOTONIC across drops: a dropped column's id must never be
        # reused by a later add (id-based readers would bind the old
        # column's data/bounds to the new one)
        "last-column-id": max(
            (prev_meta or {}).get("last-column-id", 0),
            max(f["id"] for f in fields),
        ),
        "current-snapshot-id": snapshot_id,
        "current-schema-id": schema_id,
        "schemas": (
            [s for s in prev_schemas if s.get("schema-id") != schema_id]
            + [{"schema-id": schema_id, "fields": fields}]
        ),
        "partition-specs": partition_specs,
        "default-spec-id": spec_id,
        "snapshots": snapshots,
        "snapshot-log": log,
    }
    version = prev_version + 1
    meta_path = os.path.join(meta_dir, f"v{version}.metadata.json")
    tmp = meta_path + f".tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
    os.replace(tmp, meta_path)
    hint_tmp = os.path.join(meta_dir, f".hint-{uuid.uuid4().hex}")
    with open(hint_tmp, "w") as fh:
        fh.write(str(version))
    os.replace(hint_tmp, os.path.join(meta_dir, "version-hint.text"))
    return {"snapshot_id": snapshot_id, "files": len(entries), "rows": n_rows}
