"""Temporal join operators Spark lacks as built-ins: as-of join and
banded range join.

Neither exists in the reference (batch-only SQL delegation), but both
are table-stakes for event/time-series analytics at scale; DuckDB (the
oracle engine) ships ASOF JOIN natively, which gives us an exact
cross-engine check.

asof_join — sort-merge formulation: union both sides with a marker,
one window pass per key carries the latest right row forward.  ONE
shuffle + ONE sort, no inequality join, no row explosion — the plan a
1000-executor cluster wants.  (The naive alternative — theta-join on
key AND ts<=ts then max-per-left-row — shuffles |matches| rows, which
is quadratic per hot key.)

banded_range_join — interval predicate r_ts ∈ [l_ts+lower, l_ts+upper)
turned into an equi-join on (key, time_bucket): right rows land in one
bucket, left rows probe the few buckets their window spans, the exact
interval filter runs after the join.  Candidate volume is bounded by
bucket width ≈ window width, never |left|×|right| per key.

All interval math is exact integer microseconds (unix_micros; session
TZ is UTC so NTZ→TZ is lossless) — float seconds would risk one-ULP
boundary flips vs the oracle's integer timestamp arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _us(col) -> F.Column:
    """Exact epoch microseconds of a timestamp[_ntz] column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))


def _bucket(us: F.Column, width_us: int) -> F.Column:
    # (x - x%w)/w : exact for positive epochs — the subtraction makes
    # the numerator divisible, so the double division is error-free.
    return ((us - us % width_us) / width_us).cast("long")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """Backward as-of join: each left row picks the right row with the
    greatest right_ts <= left_ts for the same `on` key (DuckDB
    `ASOF LEFT JOIN ... ON l.key = r.key AND l.ts >= r.ts` semantics —
    left rows without a match keep NULL right columns).

    `right_cols` are the right-side payload columns to carry (default:
    all except the key).  Ties at equal (key, ts) resolve to the last
    right row in right_ts order — with unique (key, ts) on the right
    the result is fully deterministic.

    `tolerance_seconds` additionally voids matches older than
    left_ts - tolerance (pandas merge_asof-style), keeping the left row
    with NULLs.

    All right payload columns (plus the matched right_ts) travel as ONE
    struct carried by a single last(ignorenulls=True) — per-column
    carries would silently substitute an OLDER right row's value
    wherever the matched row holds a genuine NULL, mixing columns
    across rows and diverging from ASOF JOIN semantics.
    """
    from pyspark.sql.types import StructField, StructType

    if right_cols is None:
        right_cols = [c for c in right.columns if c != on]

    l_struct_t = StructType(
        [StructField(c, left.schema[c].dataType) for c in left.columns]
    )
    r_struct_t = StructType(
        [StructField("_mts", right.schema[right_ts].dataType)]
        + [StructField(f"_r_{c}", right.schema[c].dataType) for c in right_cols]
    )
    l_marked = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
        F.lit(None).cast(r_struct_t).alias("_rrow"),
    )
    r_marked = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        F.lit(None).cast(l_struct_t).alias("_lrow"),
        F.struct(
            F.col(right_ts).alias("_mts"),
            *[F.col(c).alias(f"_r_{c}") for c in right_cols],
        ).alias("_rrow"),
    )
    # marker orders right (0) before left (1) at equal ts → "<=" match.
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_is_left")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    picked = (
        l_marked.unionByName(r_marked)
        .select(
            "_k",
            "_ts",
            "_is_left",
            "_lrow",
            F.last("_rrow", ignorenulls=True).over(w).alias("_rpick"),
        )
        .filter(F.col("_is_left") == 1)
    )
    if tolerance_seconds is not None:
        tol_us = int(tolerance_seconds * 1_000_000)
        stale = F.col("_rpick").isNull() | (
            _us("_ts") - _us(F.col("_rpick._mts")) > F.lit(tol_us)
        )
        picked = picked.select(
            "_lrow",
            F.when(stale, F.lit(None).cast(r_struct_t))
            .otherwise(F.col("_rpick"))
            .alias("_rpick"),
        )
    return picked.select(
        *[F.col(f"_lrow.{c}").alias(c) for c in left.columns],
        *[F.col(f"_rpick._r_{c}").alias(c) for c in right_cols],
    )


def banded_range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    lower_seconds: float,
    upper_seconds: float,
    right_cols: list[str] | None = None,
    how: str = "left",
) -> DataFrame:
    """Range join: left × right rows of the same `on` key with
    right_ts in [left_ts + lower, left_ts + upper) — as an equi-join on
    (key, time bucket) plus an exact interval filter.

    Bucket width = window width; each right row maps to ONE bucket and
    each left row probes the two buckets its window can span, so
    candidate volume stays linear in the true match count.  how='left'
    re-attaches left rows with zero matches (NULL right columns), like
    the SQL LEFT JOIN the oracle runs.

    Output: left columns + `_match_<right_ts>` + `_match_<col>` for
    each right payload column.
    """
    if right_cols is None:
        right_cols = [c for c in right.columns if c != on]
    lower_us = int(lower_seconds * 1_000_000)
    upper_us = int(upper_seconds * 1_000_000)
    width_us = (upper_us - lower_us) or 1

    l_b = left.select(
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
        F.col(on).alias("_k"),
        _us(left_ts).alias("_lus"),
        F.explode(
            F.sequence(
                _bucket(_us(left_ts) + F.lit(lower_us), width_us),
                _bucket(_us(left_ts) + F.lit(upper_us), width_us),
            )
        ).alias("_bucket"),
    )
    r_b = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_rts"),
        _us(right_ts).alias("_rus"),
        _bucket(_us(right_ts), width_us).alias("_bucket"),
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
    )
    in_range = (F.col("_rus") >= F.col("_lus") + F.lit(lower_us)) & (
        F.col("_rus") < F.col("_lus") + F.lit(upper_us)
    )
    matched = l_b.join(r_b, ["_k", "_bucket"], "inner").filter(in_range)
    if how == "inner":
        out = matched
    elif how == "left":
        # the explode duplicated left rows per probed bucket — rebuild
        # the distinct unmatched left rows and union them back with
        # NULL right columns (typed casts: ANSI union rejects untyped
        # NULL columns).
        matched_keys = matched.select("_lrow").distinct()
        missing = (
            left.select(F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"))
            .join(matched_keys, "_lrow", "left_anti")
            .select(
                "_lrow",
                F.lit(None).cast(right.schema[right_ts].dataType).alias("_rts"),
                *[
                    F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}")
                    for c in right_cols
                ],
            )
        )
        out = matched.select(
            "_lrow", "_rts", *[f"_r_{c}" for c in right_cols]
        ).unionByName(missing)
    else:
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    return out.select(
        *[F.col(f"_lrow.{c}").alias(c) for c in left.columns],
        F.col("_rts").alias(f"_match_{right_ts}"),
        *[F.col(f"_r_{c}").alias(f"_match_{c}") for c in right_cols],
    )
