"""Iceberg v3 DELETION VECTORS — Puffin-stored roaring bitmaps that
replace position-delete files in format-version 3 tables.

Public surface mirrored (Iceberg table spec v3 §position-deletes +
Puffin blob type ``deletion-vector-v1``; the runtime writes these
from Iceberg 1.8's DML): each data file carries AT MOST ONE deletion
vector, stored as a blob inside a Puffin file and referenced from a
``content=1`` delete-manifest entry whose ``file_path`` names the
Puffin file with ``file_format=PUFFIN``, plus the v3 entry fields
``referenced_data_file`` (the data file the DV applies to),
``content_offset`` and ``content_size_in_bytes`` (the blob's span
inside the Puffin file).  A new DV for a file SUPERSEDES the old one
in the same snapshot (the union is rewritten; two live DVs for one
file are illegal).

Blob layout (the spec adopts Delta's deletion-vector framing so the
two formats share one wire shape): 4-byte big-endian length of
(magic + bitmap), magic bytes ``D1 81 C5 94``, the portable 64-bit
roaring bitmap serialization (sources/delta_dv.py's codec — shared
with the Delta DV path and the roaring secondary index), then a
4-byte big-endian CRC-32 of (magic + bitmap).

Scale shape: DV blobs are KB-scale for millions of deleted rows;
planning decodes them driver-side (or in Spark's sessionless
data-source worker) into the same (file, position) anti-join /
per-partition roaring payloads the v2 position-delete path already
uses — readers pay one metadata-sized decode, never a data-sized
shuffle.
"""

from __future__ import annotations

import os
import struct
import zlib

from pg_analytics_spark.errors import UnsupportedFormat

#: the spec's deletion-vector blob magic (little-endian on disk).
DV_MAGIC = b"\xd1\x81\xc5\x94"
BLOB_TYPE_DV = "deletion-vector-v1"


def encode_dv_blob(positions: list[int]) -> bytes:
    """Serialize sorted row positions as one deletion-vector-v1 blob
    (length + magic + portable roaring + crc)."""
    from pg_analytics_spark.sources.delta_dv import encode_roaring_array

    bitmap = encode_roaring_array(sorted(set(int(p) for p in positions)))
    body = DV_MAGIC + bitmap
    return (
        struct.pack(">i", len(body))
        + body
        + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)
    )


def decode_dv_blob(blob: bytes) -> list[int]:
    """Inverse of :func:`encode_dv_blob` — validates length, magic and
    CRC before decoding the bitmap."""
    from pg_analytics_spark.sources.delta_dv import decode_roaring_array

    (body_len,) = struct.unpack(">i", blob[:4])
    body = blob[4 : 4 + body_len]
    if body[:4] != DV_MAGIC:
        raise UnsupportedFormat(
            "deletion-vector blob has bad magic "
            f"{body[:4]!r} (expected {DV_MAGIC!r})"
        )
    (crc,) = struct.unpack(">I", blob[4 + body_len : 8 + body_len])
    if crc != (zlib.crc32(body) & 0xFFFFFFFF):
        raise UnsupportedFormat("deletion-vector blob failed its CRC check")
    return decode_roaring_array(body[4:])


def read_dv_positions(
    puffin_path: str, offset: int, size: int
) -> list[int]:
    """Deleted positions from one DV blob at (offset, size) inside a
    Puffin file — the manifest entry's content_offset /
    content_size_in_bytes coordinates."""
    with open(puffin_path, "rb") as fh:
        fh.seek(int(offset))
        blob = fh.read(int(size))
    if len(blob) != int(size):
        raise UnsupportedFormat(
            f"deletion vector at {puffin_path}:{offset} truncated "
            f"({len(blob)} of {size} bytes)"
        )
    return decode_dv_blob(blob)


def write_dv_puffin(
    path: str, dvs: dict[str, list[int]], snapshot_id: int, seq: int
) -> dict[str, tuple[int, int, int]]:
    """One Puffin file holding one deletion-vector-v1 blob per data
    file.  Returns referenced_data_file → (content_offset,
    content_size_in_bytes, cardinality)."""
    from pg_analytics_spark.sources.iceberg_puffin import write_puffin

    blobs = []
    cards: dict[str, int] = {}
    for data_file in sorted(dvs):
        positions = sorted(set(int(p) for p in dvs[data_file]))
        cards[data_file] = len(positions)
        blobs.append(
            {
                "type": BLOB_TYPE_DV,
                "fields": [2147483546],  # the spec's _deleted_rows id
                "snapshot-id": snapshot_id,
                "sequence-number": seq,
                "data": encode_dv_blob(positions),
                "properties": {
                    "referenced-data-file": data_file,
                    "cardinality": str(len(positions)),
                },
            }
        )
    res = write_puffin(path, blobs)
    out: dict[str, tuple[int, int, int]] = {}
    for bm in res["blob_metadata"]:
        ref = bm["properties"]["referenced-data-file"]
        out[ref] = (int(bm["offset"]), int(bm["length"]), cards[ref])
    return out


def dv_positions_map(
    dv_entries: list[tuple[str, int, int, str]]
) -> dict[str, list[int]]:
    """referenced data file → deleted positions, decoded from a plan's
    DV entry list [(puffin_path, offset, size, referenced_file)].
    Metadata-sized work."""
    out: dict[str, list[int]] = {}
    for puffin_path, offset, size, ref in dv_entries:
        out[os.path.abspath(ref)] = read_dv_positions(
            puffin_path, offset, size
        )
    return out
