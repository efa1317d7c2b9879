"""Structural seal: no registry row may exist without an executed check.

Rounds 6 and 8 both ended with a registry row landing in the final
snapshot commit whose DuckDB oracle text was never executed (r8:
`events_ewma_smoothing`, a recursive CTE missing `WITH RECURSIVE`).
The value gate catches this only when the row is actually run; this
meta-test makes the weaker property — *the oracle text parses and
binds against the driver's view set* — unconditional and cheap
(DuckDB `EXPLAIN`, milliseconds per row), so a broken oracle fails
`pytest` even when the row was never value-gated.

Also pins the contract between `__spark_entry__.queries()` /
`oracle_sql()` and the REGISTRY: every registry row is exported, and
every exported oracle string is the registry's.
"""

from __future__ import annotations

import pytest

from pg_analytics_spark.workload import REGISTRY

ORACLED = sorted(n for n, qd in REGISTRY.items() if qd.oracle is not None)


@pytest.mark.parametrize("name", ORACLED)
def test_oracle_sql_binds(name, oracle):
    """DuckDB EXPLAIN = parse + bind + plan, no execution."""
    oracle.execute("EXPLAIN " + REGISTRY[name].oracle)


@pytest.mark.parametrize("name", ORACLED)
def test_oracle_projects_no_hugeint(name, oracle):
    """No oracle may project HUGEINT/UHUGEINT (r9 verdict #1).

    DuckDB widens `BIGINT // x` and `SUM(BIGINT)` to int128; values
    equal Spark's BIGINT, so the value gate here can never see the
    divergence — but the driver's hasher is typed on physical width
    and reports `hash_match: false` (r9: `pack_sequences` + 7 latent
    twins).  DESCRIBE is bind-only (no execution), so this holds the
    line for every future oracle at pytest cost, not driver cost.
    """
    desc = oracle.execute(
        "DESCRIBE (" + REGISTRY[name].oracle + ")"
    ).fetchall()
    wide = [(c, t) for c, t, *_ in desc if "HUGEINT" in t.upper()]
    assert not wide, (
        f"{name} projects int128 column(s) {wide}; CAST ... AS BIGINT "
        "in the oracle SQL (the driver hashes physical type width)"
    )


def test_driver_sample_rotates_and_covers_everything():
    """r9 verdict #3 + advice: a FIXED curated head left 200 rows
    never externally hashed, and let the subject-under-test pick what
    the independent oracle verifies.  The head now rotates: pinned
    first row, then a contiguous 49-row window over all oracled rows
    advanced by 49 per round — any ceil(N/49) consecutive rounds must
    cover EVERY oracled row, and the window is derived from the
    driver's own committed artifacts, not builder curation."""
    import math

    from pg_analytics_spark.workload import (
        _DRIVER_SAMPLE,
        _driver_sample,
        _round_number,
    )

    head = list(REGISTRY)[:50]
    assert head == _DRIVER_SAMPLE == _driver_sample(_round_number())
    assert head[0] == "q1_pricing_summary"
    assert len(set(head)) == 50
    assert all(REGISTRY[n].oracle is not None for n in head)
    eligible = {n for n in REGISTRY if REGISTRY[n].oracle is not None}
    cycle = math.ceil((len(eligible) - 1) / 49)
    for base in (1, _round_number(), 1000):
        cov: set[str] = set()
        for r in range(base, base + cycle):
            s = _driver_sample(r)
            assert s[0] == "q1_pricing_summary" and len(set(s)) == 50
            cov.update(s)
        assert eligible <= cov, eligible - cov
    # consecutive rounds actually rotate (not a fixed head)
    assert set(_driver_sample(10)) != set(_driver_sample(11))


def test_entry_exports_whole_registry():
    import __spark_entry__ as entry

    q = entry.queries()
    assert set(q) == set(REGISTRY)
    o = entry.oracle_sql()
    assert set(o) == set(ORACLED)
    for name, sql in o.items():
        assert sql == REGISTRY[name].oracle
