"""Relational coverage queries: Spark ≡ DuckDB oracle on TPC-H-ish tables."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL, compare_frames, register_duck_views

from real_time_fraud_detection_lakehouse_spark.core.catalog import TESTDATA_TABLES, table
from real_time_fraud_detection_lakehouse_spark.plans.relational import RELATIONAL


@pytest.fixture(scope="module")
def frames(spark):
    return {name: table(spark, SF_SMALL, name) for name in TESTDATA_TABLES}


@pytest.mark.parametrize("name", sorted(RELATIONAL))
def test_relational_matches_oracle(name, spark, duck, frames):
    register_duck_views(duck, SF_SMALL)
    builder, oracle = RELATIONAL[name]
    compare_frames(builder(frames), duck.sql(oracle))
