"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design: image/audio/video payloads travel as ``binary`` columns with a
metadata struct (modality, byte_len, content_hash).  Decode /
feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` passes — the Spark-side plumbing (schema, batching,
partition sizing) is real and tested; the codec call itself is stubbed
behind ``decoder=`` because no image/audio libraries exist in this
container.  The deterministic fake decoder derives pseudo-metadata from
the md5 of the payload so tests are reproducible.

Scale notes: payload columns dominate I/O — always project them out
before shuffles (`with_media_meta` keeps metadata separable), and size
``spark.sql.files.maxPartitionBytes`` so a batch of payloads fits in
executor memory.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODE_SCHEMA = (
    "id long, modality string, byte_len int, content_hash string, "
    "width int, height int, n_frames int, ok boolean"
)


def with_media_meta(df: DataFrame, blob_col: str, modality: str) -> DataFrame:
    """Attach the typed metadata struct for an opaque payload column."""
    return df.withColumn(
        "media_meta",
        F.struct(
            F.lit(modality).alias("modality"),
            F.octet_length(F.col(blob_col)).alias("byte_len"),
            F.md5(F.col(blob_col)).alias("content_hash"),
        ),
    )


def fake_decode(blob: bytes, modality: str) -> dict:
    """Deterministic stand-in for a real codec: pseudo width/height/
    frame-count derived from the payload hash."""
    h = hashlib.md5(blob).digest()
    return {
        "width": 64 + h[0] % 192,
        "height": 64 + h[1] % 192,
        "n_frames": 1 if modality == "image" else 1 + h[2] % 128,
        "ok": True,
    }


def real_decode(blob: bytes, modality: str) -> dict:
    """The genuine codec hook — unavailable in this environment."""
    raise NotImplementedError(
        "image/audio decoding requires codec libraries (PIL/av/librosa) "
        "not present in this container; pass decoder=fake_decode"
    )


def decode_media(
    df: DataFrame,
    blob_col: str,
    id_col: str,
    modality: str = "image",
    decoder: Callable[[bytes, str], dict] = fake_decode,
) -> DataFrame:
    """Arrow-batched decode pass over a payload column via mapInPandas.

    Output schema is fixed (DECODE_SCHEMA); the per-batch loop is the
    only Python in the pipeline and is Arrow-vectorized at the
    transport layer.
    """

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _id, blob in zip(pdf[id_col], pdf[blob_col]):
                payload = bytes(blob) if blob is not None else b""
                meta = decoder(payload, modality)
                out.append(
                    {
                        "id": _id,
                        "modality": modality,
                        "byte_len": len(payload),
                        "content_hash": hashlib.md5(payload).hexdigest(),
                        **meta,
                    }
                )
            yield pd.DataFrame(out)

    return df.select(id_col, blob_col).mapInPandas(_decode, DECODE_SCHEMA)
