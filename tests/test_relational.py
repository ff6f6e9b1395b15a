"""Relational coverage queries: Spark ≡ DuckDB oracle on TPC-H-ish tables."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL, compare_frames, register_duck_views

from real_time_fraud_detection_lakehouse_spark.core.catalog import TESTDATA_TABLES, table
from real_time_fraud_detection_lakehouse_spark.plans.relational import RELATIONAL


@pytest.fixture(scope="module")
def frames(spark):
    return {name: table(spark, SF_SMALL, name) for name in TESTDATA_TABLES}


ORACLED = {k: v for k, v in RELATIONAL.items() if v[1] is not None}


@pytest.mark.parametrize("name", sorted(ORACLED))
def test_relational_matches_oracle(name, spark, duck, frames):
    register_duck_views(duck, SF_SMALL)
    builder, oracle = RELATIONAL[name]
    compare_frames(builder(frames), duck.sql(oracle))


def test_approx_distinct_tracks_exact(spark, frames):
    exact = {
        r["event_type"]: r["distinct_users"]
        for r in RELATIONAL["q_distinct_users"][0](frames).collect()
    }
    approx = {
        r["event_type"]: r["approx_distinct_users"]
        for r in RELATIONAL["q_distinct_users_approx"][0](frames).collect()
    }
    assert exact.keys() == approx.keys()
    for k, ex in exact.items():
        assert abs(approx[k] - ex) <= max(2, ex * 0.05), (k, ex, approx[k])
