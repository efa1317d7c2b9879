"""Property-based tests: random inputs vs naive Python reference
implementations (hypothesis).  Few examples per property — each round
trips through Spark — but each example is adversarially shrunk.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pg_analytics_spark.operators.temporal import asof_join, banded_range_join

_EPOCH = dt.datetime(2024, 1, 1)


def _ts(seconds: int) -> dt.datetime:
    return _EPOCH + dt.timedelta(seconds=seconds)


@st.composite
def temporal_case(draw):
    keys = ["k1", "k2"]
    # unique (key, ts) on the right keeps as-of matches deterministic
    left = [
        (i, draw(st.sampled_from(keys)), s)
        for i, s in enumerate(
            sorted(draw(st.sets(st.integers(0, 500), min_size=1, max_size=12)))
        )
    ]
    right = [
        (100 + j, draw(st.sampled_from(keys)), s, float(j))
        for j, s in enumerate(
            sorted(draw(st.sets(st.integers(0, 500), min_size=1, max_size=12)))
        )
    ]
    return left, right


_SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


@given(case=temporal_case())
@_SETTINGS
def test_asof_join_matches_naive(spark, case):
    left_rows, right_rows = case
    left = spark.createDataFrame(
        [(i, k, _ts(s)) for i, k, s in left_rows],
        "lid long, k string, lts timestamp_ntz",
    )
    right = spark.createDataFrame(
        [(j, k, _ts(s), v) for j, k, s, v in right_rows],
        "rid long, k string, rts timestamp_ntz, v double",
    )
    got = {
        r["lid"]: r["rid"]
        for r in asof_join(
            left, right, on="k", left_ts="lts", right_ts="rts",
            right_cols=["rid", "v"],
        ).collect()
    }
    for i, k, s in left_rows:
        cands = [(rs, j) for j, rk, rs, _ in right_rows if rk == k and rs <= s]
        expected = max(cands)[1] if cands else None
        assert got[i] == expected, (i, k, s, cands)


@given(case=temporal_case())
@_SETTINGS
def test_range_join_matches_naive(spark, case):
    left_rows, right_rows = case
    left = spark.createDataFrame(
        [(i, k, _ts(s)) for i, k, s in left_rows],
        "lid long, k string, lts timestamp_ntz",
    )
    right = spark.createDataFrame(
        [(j, k, _ts(s), v) for j, k, s, v in right_rows],
        "rid long, k string, rts timestamp_ntz, v double",
    )
    out = banded_range_join(
        left, right, on="k", left_ts="lts", right_ts="rts",
        lower_seconds=-60.0, upper_seconds=0.0, how="inner",
    ).collect()
    got = {(r["lid"], r["_match_rid"]) for r in out}
    expected = {
        (i, j)
        for i, k, s in left_rows
        for j, rk, rs, _ in right_rows
        if rk == k and s - 60 <= rs < s
    }
    assert got == expected
