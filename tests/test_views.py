"""Every analytics view / dashboard query: Spark builder ≡ DuckDB oracle."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL, compare_frames, register_duck_views

from real_time_fraud_detection_lakehouse_spark.plans.dashboards import DASHBOARDS
from real_time_fraud_detection_lakehouse_spark.plans.gold import gold_frames, gold_prelude
from real_time_fraud_detection_lakehouse_spark.plans.views import VIEWS

ALL = {**VIEWS, **DASHBOARDS}


@pytest.fixture(scope="module")
def frames(spark):
    g = gold_frames(spark, SF_SMALL)
    g["silver"] = g["silver"].cache()
    g["fact"] = g["fact"].cache()
    return g


@pytest.mark.parametrize("name", sorted(ALL))
def test_view_matches_oracle(name, spark, duck, frames):
    register_duck_views(duck, SF_SMALL)
    builder, oracle = ALL[name]
    sdf = builder(frames)
    rel = duck.sql(f"{gold_prelude()} {oracle}")
    compare_frames(sdf, rel)
