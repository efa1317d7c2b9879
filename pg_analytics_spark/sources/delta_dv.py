"""Delta Lake deletion-vector decoding — pure Python, public formats.

The reference reads DV tables through duckdb-delta's kernel
(/root/reference/src/duckdb/delta.rs delegates to ``delta_scan``, whose
kernel applies DVs).  Here the decode chain is implemented from the
published specs so the native log replay (delta.py) can apply DVs
without delta-spark:

* Delta protocol, "Deletion Vectors" (delta.io PROTOCOL.md):
  descriptor {storageType: u|i|p, pathOrInlineDv, offset, sizeInBytes,
  cardinality}; on-disk blob = [size int32 BE][data][CRC-32 int32 BE];
  ``u`` paths are ``<prefix?><Z85(uuid16)>`` naming
  ``deletion_vector_<uuid>.bin``; ``i`` inlines Z85(data) directly.
* ``data`` = RoaringBitmapArray "portable" serialization: magic
  1681511377 int32 LE, number-of-32-bit-bitmaps int64 LE, then each
  bitmap in the standard 32-bit roaring format — its array index is
  the high 32 bits of the member values.
* 32-bit roaring standard format (RoaringFormatSpec): cookie 12347
  (run containers present, container count in the cookie's high 16
  bits, run-flag bitset) or 12346 (+ explicit count, no runs);
  per-container (key16, cardinality-1) headers; optional offsets;
  array (int16 values) / bitmap (8 KiB) / run (int16 pairs) payloads.
* Z85 (ZeroMQ RFC 32): 5 chars → 4 bytes, big-endian base-85.

The decoded result is the sorted list of deleted row indices for one
data file — exactly the parquet ``_metadata.row_index`` domain, so
application is the same distributed anti-join the Iceberg fallback
uses.  Driver-side bound: decoding materializes one file's deleted
positions (descriptor ``cardinality``); production-scale tables with
huge DVs should distribute blob decode per file (mapInPandas over
descriptors) — same algorithm, different placement.
"""

from __future__ import annotations

import os
import struct
import zlib

from pg_analytics_spark.errors import MissingDependency

ROARING_MAGIC = 1681511377
_SERIAL_COOKIE = 12347
_SERIAL_COOKIE_NO_RUN = 12346
_NO_OFFSET_THRESHOLD = 4

_Z85_ALPHABET = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_DECODE = {c: i for i, c in enumerate(_Z85_ALPHABET)}


def z85_decode(text: str) -> bytes:
    if len(text) % 5:
        raise MissingDependency(
            f"Z85 payload length {len(text)} is not a multiple of 5"
        )
    out = bytearray()
    for i in range(0, len(text), 5):
        acc = 0
        for ch in text[i : i + 5]:
            try:
                acc = acc * 85 + _Z85_DECODE[ch]
            except KeyError:
                raise MissingDependency(f"invalid Z85 character {ch!r}")
        out += acc.to_bytes(4, "big")
    return bytes(out)


def z85_encode(data: bytes) -> str:
    """Z85 with zero-padding to 4-byte alignment (the Delta convention
    for inline DVs — the descriptor's sizeInBytes trims the pad)."""
    if len(data) % 4:
        data = data + b"\x00" * (4 - len(data) % 4)
    out = []
    for i in range(0, len(data), 4):
        acc = int.from_bytes(data[i : i + 4], "big")
        chunk = []
        for _ in range(5):
            acc, rem = divmod(acc, 85)
            chunk.append(_Z85_ALPHABET[rem])
        out += reversed(chunk)
    return "".join(out)


# ------------------------------------------------------------------ #
# Roaring decode
# ------------------------------------------------------------------ #


def _read_bitmap32(buf: bytes, pos: int) -> tuple[list[int], int]:
    """Standard 32-bit roaring deserialization → (sorted values, new pos)."""
    (cookie,) = struct.unpack_from("<i", buf, pos)
    if (cookie & 0xFFFF) == _SERIAL_COOKIE:
        n_containers = (cookie >> 16) + 1
        pos += 4
        run_flags = buf[pos : pos + (n_containers + 7) // 8]
        pos += (n_containers + 7) // 8
    elif cookie == _SERIAL_COOKIE_NO_RUN:
        (n_containers,) = struct.unpack_from("<i", buf, pos + 4)
        run_flags = b"\x00" * ((n_containers + 7) // 8)
        pos += 8
    else:
        raise MissingDependency(
            f"unknown roaring cookie {cookie} — not a serialized bitmap"
        )
    keys, cards = [], []
    for i in range(n_containers):
        k, c = struct.unpack_from("<HH", buf, pos)
        keys.append(k)
        cards.append(c + 1)
        pos += 4
    has_offsets = cookie == _SERIAL_COOKIE_NO_RUN or (
        n_containers >= _NO_OFFSET_THRESHOLD
    )
    if has_offsets:
        pos += 4 * n_containers  # offsets are a seek aid; we read linearly
    values: list[int] = []
    for i in range(n_containers):
        base = keys[i] << 16
        is_run = bool(run_flags[i // 8] & (1 << (i % 8)))
        if is_run:
            (n_runs,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            for _ in range(n_runs):
                start, length = struct.unpack_from("<HH", buf, pos)
                pos += 4
                values.extend(range(base + start, base + start + length + 1))
        elif cards[i] <= 4096:
            vals = struct.unpack_from(f"<{cards[i]}H", buf, pos)
            pos += 2 * cards[i]
            values.extend(base + v for v in vals)
        else:
            words = struct.unpack_from("<1024Q", buf, pos)
            pos += 8192
            for wi, w in enumerate(words):
                while w:
                    low = w & -w
                    values.append(base + (wi << 6) + low.bit_length() - 1)
                    w ^= low
    return values, pos


def decode_roaring_array(data: bytes) -> list[int]:
    """RoaringBitmapArray 'portable' → sorted 64-bit member list."""
    if len(data) < 12:
        raise MissingDependency("deletion vector payload too short")
    (magic,) = struct.unpack_from("<i", data, 0)
    if magic != ROARING_MAGIC:
        raise MissingDependency(
            f"deletion vector magic {magic} != {ROARING_MAGIC}"
        )
    (n_bitmaps,) = struct.unpack_from("<q", data, 4)
    pos = 12
    out: list[int] = []
    for idx in range(n_bitmaps):
        vals, pos = _read_bitmap32(data, pos)
        out.extend((idx << 32) | v for v in vals)
    return sorted(out)


# ------------------------------------------------------------------ #
# Descriptor resolution
# ------------------------------------------------------------------ #


def _dv_file_path(table_path: str, descriptor: dict) -> str:
    st = descriptor["storageType"]
    p = descriptor["pathOrInlineDv"]
    if st == "p":
        return p[5:] if p.startswith("file:") else p
    # 'u': optional random prefix + Z85-encoded 16-byte UUID
    prefix, encoded = p[:-20], p[-20:]
    import uuid as _uuid

    u = _uuid.UUID(bytes=z85_decode(encoded))
    name = f"deletion_vector_{u}.bin"
    return os.path.join(table_path, prefix, name) if prefix else os.path.join(
        table_path, name
    )


def dv_blob(table_path: str, descriptor: dict) -> bytes:
    """Resolve a deletionVector descriptor → the raw portable
    RoaringBitmapArray bytes (CRC-verified for file storage) WITHOUT
    decoding.  This is the payload a scan task should ship: KB-scale
    even for millions of deleted rows, where the decoded ``list[int]``
    pickles to megabytes per task."""
    st = descriptor.get("storageType")
    if st == "i":
        data = z85_decode(descriptor["pathOrInlineDv"])
        size = descriptor.get("sizeInBytes")
        if size is not None:
            data = data[:size]  # trim Z85 alignment padding
    elif st in ("u", "p"):
        path = _dv_file_path(table_path, descriptor)
        if not os.path.isfile(path):
            raise MissingDependency(f"deletion vector file missing: {path}")
        with open(path, "rb") as fh:
            blob = fh.read()
        offset = descriptor.get("offset")
        if offset is None:
            # no offset: single-DV file, blob follows the 1-byte version
            offset = 1
        (size,) = struct.unpack_from(">i", blob, offset)
        data = blob[offset + 4 : offset + 4 + size]
        (crc,) = struct.unpack_from(">I", blob, offset + 4 + size)
        if zlib.crc32(data) & 0xFFFFFFFF != crc:
            raise MissingDependency(
                f"deletion vector checksum mismatch in {path}"
            )
    else:
        raise MissingDependency(
            f"unknown deletionVector storageType {st!r}"
        )
    return data


def dv_deleted_rows(table_path: str, descriptor: dict) -> list[int]:
    """Resolve a deletionVector descriptor → sorted deleted row indices."""
    rows = decode_roaring_array(dv_blob(table_path, descriptor))
    card = descriptor.get("cardinality")
    if card is not None and card != len(rows):
        raise MissingDependency(
            f"deletion vector cardinality {card} != decoded {len(rows)}"
        )
    return rows


# ------------------------------------------------------------------ #
# Test/fixture support: minimal writer (array containers only) so the
# reader round-trips without delta-spark in the environment
# ------------------------------------------------------------------ #


def encode_roaring_array(values: list[int]) -> bytes:
    """Serialize 64-bit values in the portable RoaringBitmapArray form
    (array containers, or bitmap containers above 4096 cardinality —
    matching how the reader distinguishes them; the READER additionally
    handles run containers)."""
    by_high: dict[int, dict[int, list[int]]] = {}
    for v in sorted(set(values)):
        hi32, lo32 = v >> 32, v & 0xFFFFFFFF
        by_high.setdefault(hi32, {}).setdefault(lo32 >> 16, []).append(
            lo32 & 0xFFFF
        )
    n_bitmaps = (max(by_high) + 1) if by_high else 0
    out = struct.pack("<i", ROARING_MAGIC) + struct.pack("<q", n_bitmaps)
    for idx in range(n_bitmaps):
        containers = by_high.get(idx, {0: []})
        keys = sorted(containers)
        body = struct.pack("<ii", _SERIAL_COOKIE_NO_RUN, len(keys))
        for k in keys:
            body += struct.pack("<HH", k, max(len(containers[k]) - 1, 0))
        offset = len(body) + 4 * len(keys)
        for k in keys:
            body += struct.pack("<i", offset)
            offset += 8192 if len(containers[k]) > 4096 else 2 * len(containers[k])
        for k in keys:
            vals = containers[k]
            if len(vals) > 4096:
                words = [0] * 1024
                for v in vals:
                    words[v >> 6] |= 1 << (v & 63)
                body += struct.pack("<1024Q", *words)
            else:
                body += struct.pack(f"<{len(vals)}H", *vals)
        out += body
    return out


def write_dv_file(path: str, data: bytes, with_version_byte: bool = True) -> int:
    """Write one DV blob ([size BE][data][crc BE]) and return its offset."""
    with open(path, "wb") as fh:
        if with_version_byte:
            fh.write(b"\x01")
        offset = fh.tell()
        fh.write(struct.pack(">i", len(data)))
        fh.write(data)
        fh.write(struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF))
    return offset
