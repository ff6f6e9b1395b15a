"""Lock-step check: transactions_df (Spark) ≡ TRANSACTIONS_CTE (DuckDB)."""

from __future__ import annotations

from tests.conftest import SF_SMALL, compare_frames, register_duck_views

from real_time_fraud_detection_lakehouse_spark.sources.transactions import (
    TRANSACTIONS_CTE,
    transactions_df,
)


def test_transactions_mapping_matches_oracle(spark, duck):
    register_duck_views(duck, SF_SMALL)
    sdf = transactions_df(spark, SF_SMALL)
    rel = duck.sql(f"WITH transactions AS ({TRANSACTIONS_CTE}) SELECT * FROM transactions")
    compare_frames(sdf, rel)


def test_transactions_fixture_coverage(spark):
    df = transactions_df(spark, SF_SMALL).cache()
    assert df.filter("amt = 0").count() > 0
    assert df.filter("amt > 1000").count() > 0
    assert df.filter("merch_lat IS NULL").count() > 0
    assert df.filter("gender IS NULL").count() > 0
    n = df.count()
    frauds = df.filter("is_fraud = 1").count()
    assert 0 < frauds < n * 0.2
    df.unpersist()
