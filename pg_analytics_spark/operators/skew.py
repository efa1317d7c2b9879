"""Explicit skew mitigation: salted join and salted two-stage
aggregation.

AQE's skew-join splitting (on in session.py) handles moderate skew at
runtime; these operators are for the pathological case — a handful of
keys owning a double-digit percentage of a 100 TB fact table — where
you know the skew up front and want the plan, not the runtime, to
spread it.

salted_join: fact side gets a deterministic salt in [0, n); the dim
side is replicated n× with every salt value; the join key becomes
(key, salt), so one hot key's rows land on n different reducers.
Results are exactly a plain inner join (each fact row matches exactly
the one replica with its salt).

salted_aggregate: two-stage — partial aggregate on (key, salt), final
aggregate on key.  Spark's hash aggregation already does map-side
partials; the explicit salted stage matters when the per-key state is
heavy (collect_list/distinct-style) and one reducer would otherwise
hold a hot key's entire state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, key: str, n_salts: int, salt_col: str = "_salt") -> DataFrame:
    """Deterministic salt in [0, n_salts): hash of the FULL row, so a
    hot key's rows spread across salts (hashing only the key would give
    every row of that key the same salt — no spread) while reruns and
    task retries salt identically (rand()/monotonically_increasing_id
    depend on partition layout and break retry determinism)."""
    return df.withColumn(
        salt_col,
        F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts)).cast(
            "int"
        ),
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    n_salts: int = 8,
) -> DataFrame:
    """Inner equi-join with a salted key: exact same rows as
    ``fact.join(dim, on)``, but a hot key's rows spread over n_salts
    reducers.  The dim side is replicated n_salts× (explode over the
    salt range) — use only when dim is small enough that n×|dim|
    still beats one overloaded reducer, and broadcast is impossible
    (e.g. dim too big to broadcast but far smaller than fact)."""
    salted_fact = with_salt(fact, on, n_salts)
    salted_dim = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("_salt", F.col("_salt").cast("int"))
    out = salted_fact.join(salted_dim, [on, "_salt"], "inner").drop("_salt")
    return out


def salted_aggregate(
    df: DataFrame,
    key: str,
    agg_cols: dict[str, tuple[Column, Column]],
    n_salts: int = 8,
) -> DataFrame:
    """Two-stage aggregation: partial on (key, salt), final on key.

    agg_cols maps output name → (partial_agg_expr, final_agg_expr),
    where the final expr references the partial's column name, e.g.
    ``{"n": (F.count("*"), F.sum("n")), "mx": (F.max("v"), F.max("mx"))}``.
    Only decomposable aggregates (sum/count/min/max/...) are valid.
    """
    partial = (
        with_salt(df, key, n_salts)
        .groupBy(key, "_salt")
        .agg(*[expr.alias(name) for name, (expr, _) in agg_cols.items()])
    )
    return partial.groupBy(key).agg(
        *[final.alias(name) for name, (_, final) in agg_cols.items()]
    )
