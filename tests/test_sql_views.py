"""Spark-SQL view surface ≡ DataFrame builders (same rows, bit-for-bit)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL

from real_time_fraud_detection_lakehouse_spark.plans.gold import gold_frames
from real_time_fraud_detection_lakehouse_spark.plans.sql_views import (
    SPARK_SQL_VIEWS,
    register_analytics_views,
)
from real_time_fraud_detection_lakehouse_spark.plans.views import VIEWS


@pytest.fixture(scope="module")
def registered(spark):
    names = register_analytics_views(spark, SF_SMALL)
    return set(names)


@pytest.mark.parametrize("name", sorted(SPARK_SQL_VIEWS))
def test_sql_view_equals_dataframe_builder(name, spark, registered):
    assert name in registered
    sql_rows = sorted(map(tuple, spark.sql(f"SELECT * FROM {name}").collect()), key=repr)
    df_rows = sorted(
        map(tuple, VIEWS[name][0](gold_frames(spark, SF_SMALL)).collect()), key=repr
    )
    assert sql_rows == df_rows


def test_sql_surface_is_queryable(spark, registered):
    # the reference's "chatbot asks SQL" flow: ad-hoc SQL over views
    top = spark.sql(
        "SELECT state, fraud_rate FROM state_summary ORDER BY fraud_rate DESC, state LIMIT 5"
    ).collect()
    assert len(top) == 5
    tables = {r["viewName"] for r in spark.sql("SHOW VIEWS").collect()}
    assert {"daily_summary", "state_summary", "fact_transactions"} <= tables
