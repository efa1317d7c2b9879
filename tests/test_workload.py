"""Every workload REGISTRY entry vs the DuckDB oracle at sf0.001.

This mirrors the driver's t2 gate (BASELINE.md) and the reference's
DuckDB-as-oracle test style (reference tests/tests/scan.rs:243-312).
"""

from __future__ import annotations

import pytest

from pg_analytics_spark.workload import REGISTRY

from .conftest import SF_DIR, assert_df_matches_oracle


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(name, spark, oracle):
    qd = REGISTRY[name]
    df = qd.spark(spark, SF_DIR)
    if qd.oracle is None:
        assert df.count() >= 0  # rows-only check, like the driver's weak gate
        return
    assert_df_matches_oracle(df, oracle, qd.oracle, float_tol=0.0)
