"""Vector math over ``array<float>`` embedding columns — JVM-side only.

Dot products fold left-to-right in float64 via ``aggregate`` +
``zip_with`` (no Python round trip, whole-stage codegen).  Determinism
note: a left fold has a fixed summation order, so results are
reproducible run-to-run and machine-to-machine — unlike a parallel
reduction.  Cross-engine (DuckDB oracle) agreement additionally
requires rounding displayed similarities (~1e-16 fold-order noise);
DuckDB's native list_cosine_similarity computes in float32 and is NOT
comparable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot_product(a, b) -> Column:
    """Σ aᵢ·bᵢ in float64 (left fold)."""
    prods = F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a) -> Column:
    return F.sqrt(
        F.aggregate(
            _c(a),
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def cosine_similarity(a, b) -> Column:
    """dot(a,b) / (‖a‖·‖b‖) in float64."""
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))


# ------------------------------------------------------------------ #
# Scalar int8 quantization grid — ONE definition shared by the
# embed_quantize_int8 query (workload/llm.py) and the recall probe
# (tools/recall_probe.py): the grid must never drift between the
# benchmarked operator and the recall evidence.
# ------------------------------------------------------------------ #

#: dequantized value of zip-struct element `x` (fields ev/mns/mxs):
#: snap to the 255-step per-dimension [min, max] grid.
INT8_DEQUANT_FRAGMENT = (
    "x.mns + round((x.ev - x.mns) / (x.mxs - x.mns) * 255) "
    "/ 255.0D * (x.mxs - x.mns)"
)


def int8_stats_lists(df, vec_col: str) -> tuple[list, list]:
    """Per-dimension ``([min…], [max…])`` of the corpus as PYTHON
    lists — the int8 grid's codebook.  One aggregate job: the explode
    collapses map-side (min/max partials), the shuffle carries d rows,
    the collect transfers d rows of two doubles (codebook-sized, same
    disposition as the k-means/PQ trainers).  Callers embed these as
    literals so the quantization query itself is a pure scan→map —
    no broadcast exchange, no extra jobs."""
    stats = (
        df.select(
            F.posexplode(
                F.expr(f"transform({vec_col}, x -> cast(x AS double))")
            ).alias("pos", "v")
        )
        .groupBy("pos")
        .agg(F.min("v").alias("mn"), F.max("v").alias("mx"))
        .orderBy("pos")
        .collect()
    )
    mns = [r["mn"] for r in stats]
    mxs = [r["mx"] for r in stats]
    import math

    for side, vals in (("min", mns), ("max", mxs)):
        bad = [
            i
            for i, v in enumerate(vals)
            if v is None or not math.isfinite(v)
        ]
        if bad:
            # embedding these as SQL literals would produce NoneD/nanD
            # — invalid SQL; fail loudly with the dimensions named
            from pg_analytics_spark.errors import EngineError

            raise EngineError(
                f"int8 codebook: non-finite/NULL {side} at dimension(s) "
                f"{bad[:8]}{'…' if len(bad) > 8 else ''} — the corpus "
                "has all-NULL or NaN/Inf embedding dimensions"
            )
    return mns, mxs


def int8_stats_arrays(df, vec_col: str):
    """(df + `ev` double-array column, one-row (mns, mxs) stats frame)
    — the per-dimension [min, max] arrays the grid is built from; the
    stats frame is one broadcastable row."""
    ev = df.withColumn(
        "ev", F.expr(f"transform({vec_col}, x -> cast(x AS double))")
    )
    stats = (
        ev.select(F.posexplode("ev").alias("pos", "v"))
        .groupBy("pos")
        .agg(F.min("v").alias("mn"), F.max("v").alias("mx"))
    )
    arrs = stats.groupBy().agg(
        F.expr(
            "transform(array_sort(collect_list(struct(pos, mn))), s -> s.mn)"
        ).alias("mns"),
        F.expr(
            "transform(array_sort(collect_list(struct(pos, mx))), s -> s.mx)"
        ).alias("mxs"),
    )
    return ev, arrs
