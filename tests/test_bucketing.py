"""Bucketed co-located joins: writing both join sides bucketed on the
key removes the shuffle entirely — the ARCHITECTURE.md claim
("at petabyte scale you'd bucket both tables by orderkey at write
time to delete that shuffle"), proven executable."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL

from real_time_fraud_detection_lakehouse_spark.core.catalog import table


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    table(spark, SF_SMALL, "orders").write.bucketBy(8, "o_orderkey").sortBy(
        "o_orderkey"
    ).mode("overwrite").saveAsTable("b_orders")
    table(spark, SF_SMALL, "lineitem").write.bucketBy(8, "l_orderkey").sortBy(
        "l_orderkey"
    ).mode("overwrite").saveAsTable("b_lineitem")
    yield
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    # at testdata scale Spark prefers broadcast (which also avoids a
    # shuffle); disable it to demonstrate the bucketed sort-merge path
    # a petabyte-sized pair of tables would take
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = spark.table("b_orders")
        l = spark.table("b_lineitem")
        joined = l.join(o, F.col("o_orderkey") == F.col("l_orderkey")).select(
            "o_orderkey", "l_quantity", "o_totalprice"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        assert "Exchange hashpartitioning" not in plan, plan  # shuffle deleted
        assert "Bucketed: true" in plan, plan
        raw = (
            table(spark, SF_SMALL, "lineitem")
            .join(
                table(spark, SF_SMALL, "orders"),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .count()
        )
        assert joined.count() == raw
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
