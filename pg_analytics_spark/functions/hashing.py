"""Hashing primitives for near-duplicate detection.

MinHash uses md5 as the hash family — md5(seed || '|' || shingle) with
the *lexicographically minimal hex digest* as the signature component.
md5 produces identical hex in Spark and DuckDB, which makes the whole
MinHash+LSH pipeline oracle-checkable cross-engine (a property no
engine-specific hash like xxhash64 has).  SimHash uses xxhash64
(Spark-native, 10×+ faster) since sketches are engine-internal.

Scale notes (100 TB): signatures/bands are computed per-row in
whole-stage codegen; the LSH candidate step is an equi-join on
(band_index, band_hash) — a plain shuffle join on a high-cardinality
key, no cross product anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def minhash_signature(shingles, num_hashes: int = 12) -> Column:
    """array<string> minhash signature: element i is
    min(md5(i || '|' || s) for s in shingles)."""
    return F.array(
        *[
            F.array_min(
                F.transform(
                    _c(shingles), lambda s, i=i: F.md5(F.concat(F.lit(f"{i}|"), s).cast("binary"))
                )
            )
            for i in range(num_hashes)
        ]
    )


def band_hashes(signature, bands: int, rows_per_band: int) -> Column:
    """array<struct<band:int, h:string>> LSH band keys: band b hashes
    signature[b*r : (b+1)*r] with md5.

    The signature expression is bound ONCE via a single-element
    ``transform`` lambda: lambda variables are computed values, so the
    b×r ``element_at`` references don't re-evaluate the (expensive)
    signature — Catalyst has no cross-reference CSE here and would
    otherwise compute it bands×rows times.
    """

    def _bands(sig: Column) -> Column:
        entries = []
        for b in range(bands):
            parts = [
                F.element_at(sig, b * rows_per_band + j + 1)
                for j in range(rows_per_band)
            ]
            h = F.md5(F.concat_ws("|", *parts).cast("binary"))
            entries.append(F.struct(F.lit(b).alias("band"), h.alias("h")))
        return F.array(*entries)

    bound = F.transform(F.array(_c(signature)), _bands)
    return F.flatten(bound)


#: 2^j as signed 64-bit values (j=63 wraps to Long.MIN_VALUE — correct
#: two's-complement bit 63).
_POW2 = [(1 << j) if j < 63 else -(1 << 63) for j in range(64)]


def simhash64(tokens_col) -> Column:
    """64-bit SimHash over a token array.

    Per token: h = xxhash64(token); bit j contributes +1 if set else -1.
    The per-row fold keeps a 64-slot accumulator array and runs entirely
    in codegen (aggregate + zip_with), no Python.  Bit positions are
    Python-int literals (shiftleft/shiftright only take literal counts).
    """
    toks = _c(tokens_col)
    counts = F.aggregate(
        toks,
        F.array_repeat(F.lit(0).cast("long"), 64),
        lambda acc, t: F.zip_with(acc, _bit_contributions(t), lambda a, b: a + b),
    )
    # sign bits → integer: Σ 2^j over bits with count >= 0
    pow2 = F.array(*[F.lit(p).cast("long") for p in _POW2])
    return F.aggregate(
        F.zip_with(
            counts,
            pow2,
            lambda cnt, p: F.when(cnt >= 0, p).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _bit_contributions(token: Column) -> Column:
    h = F.xxhash64(token)
    return F.array(
        *[
            F.when(
                F.shiftright(h, j).bitwiseAND(F.lit(1).cast("long")) == 1,
                F.lit(1).cast("long"),
            ).otherwise(F.lit(-1).cast("long"))
            for j in range(64)
        ]
    )


def hamming64(a, b) -> Column:
    """Hamming distance between two 64-bit simhashes (bit_count of XOR)."""
    return F.bit_count(_c(a).bitwiseXOR(_c(b)))
