"""Edge-case tests for the temporal join operators (the oracle covers
the happy path at sf0.001 via the registry test)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from pg_analytics_spark.operators.temporal import asof_join, banded_range_join


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, "u", _ts("2024-01-01T10:00:00")),
            (2, "u", _ts("2024-01-01T11:00:00")),
            (3, "v", _ts("2024-01-01T09:00:00")),  # no right rows for v at all
        ],
        "lid long, k string, lts timestamp_ntz",
    )
    right = spark.createDataFrame(
        [
            (10, "u", _ts("2024-01-01T09:59:00"), 1.0),
            (11, "u", _ts("2024-01-01T10:00:00"), 2.0),  # ties lts of lid=1
            (12, "u", _ts("2024-01-01T10:59:59"), 3.0),
        ],
        "rid long, k string, rts timestamp_ntz, v double",
    )
    return left, right


def test_asof_backward_picks_latest_at_or_before(spark):
    left, right = _frames(spark)
    out = {
        r["lid"]: r["rid"]
        for r in asof_join(
            left, right, on="k", left_ts="lts", right_ts="rts",
            right_cols=["rid", "rts", "v"],
        ).collect()
    }
    assert out[1] == 11  # equal timestamp matches (<= semantics)
    assert out[2] == 12
    assert out[3] is None  # key with no right rows keeps NULLs


def test_asof_tolerance_voids_stale_matches(spark):
    left, right = _frames(spark)
    out = {
        r["lid"]: r["rid"]
        for r in asof_join(
            left, right, on="k", left_ts="lts", right_ts="rts",
            right_cols=["rid"], tolerance_seconds=1.0,
        ).collect()
    }
    assert out[1] == 11  # 0s old: kept
    assert out[2] == 12  # 1s old: kept (boundary inclusive)
    assert out[3] is None


def test_range_join_inner_and_left(spark):
    left, right = _frames(spark)
    inner = banded_range_join(
        left, right, on="k", left_ts="lts", right_ts="rts",
        lower_seconds=-120.0, upper_seconds=0.0, how="inner",
    )
    pairs = {(r["lid"], r["_match_rid"]) for r in inner.collect()}
    # lid=1 window [09:58, 10:00): rid=10 only (rid=11 excluded: rts == lts)
    # lid=2 window [10:58, 11:00): rid=12
    assert pairs == {(1, 10), (2, 12)}

    left_out = banded_range_join(
        left, right, on="k", left_ts="lts", right_ts="rts",
        lower_seconds=-120.0, upper_seconds=0.0, how="left",
    )
    rows = left_out.collect()
    assert len(rows) == 3
    assert {r["lid"] for r in rows} == {1, 2, 3}
    null_match = [r for r in rows if r["lid"] == 3][0]
    assert null_match["_match_rid"] is None


def test_range_join_spans_bucket_boundary(spark):
    # right row 119s before left, in the adjacent 120s bucket — the
    # two-bucket probe must still find it.
    left = spark.createDataFrame(
        [(1, "u", _ts("2024-01-01T10:02:01"))],
        "lid long, k string, lts timestamp_ntz",
    )
    right = spark.createDataFrame(
        [(10, "u", _ts("2024-01-01T10:00:02"), 1.0)],
        "rid long, k string, rts timestamp_ntz, v double",
    )
    out = banded_range_join(
        left, right, on="k", left_ts="lts", right_ts="rts",
        lower_seconds=-120.0, upper_seconds=0.0, how="inner",
    ).collect()
    assert [(r["lid"], r["_match_rid"]) for r in out] == [(1, 10)]


def test_asof_null_payload_not_backfilled_from_older_row(spark):
    """The matched right row's genuine NULLs must survive: per-column
    last(ignorenulls) carries would substitute the older row's value
    (ADVICE r1) — the struct carry keeps all columns from one row."""
    import datetime as dt

    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)  # noqa: E731
    left = spark.createDataFrame([("k", t(10))], ["key", "lts"])
    right = spark.createDataFrame(
        [("k", t(1), "old_a", "old_b"), ("k", t(5), None, "new_b")],
        ["key", "rts", "a", "b"],
    )
    row = asof_join(left, right, "key", "lts", "rts").collect()[0]
    # matched row is t(5): a is genuinely NULL there, not 'old_a'
    assert row.b == "new_b"
    assert row.a is None
