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


def test_show_tables_surface(spark, duck):
    """SHOW TABLES scoped to the engine surface matches the declared
    SQL_SURFACE constant (and its DuckDB oracle)."""
    from real_time_fraud_detection_lakehouse_spark.plans.introspection import (
        SHOW_TABLES_SQL,
        SQL_SURFACE,
        sql_show_tables,
    )
    from tests.conftest import compare_frames

    got = sql_show_tables(spark, SF_SMALL)
    assert sorted(r["table_name"] for r in got.collect()) == SQL_SURFACE
    compare_frames(got, duck.sql(SHOW_TABLES_SQL), check_types=False)


def test_describe_fact_matches_runtime_schema(spark, duck):
    """DESCRIBE output == the fact DataFrame's actual dtypes == the
    pinned FACT_CONTRACT (schema-drift tripwire), and the catalog's
    listColumns metadata agrees."""
    from real_time_fraud_detection_lakehouse_spark.plans.introspection import (
        DESCRIBE_FACT_SQL,
        FACT_CONTRACT,
        sql_describe_fact,
    )
    from tests.conftest import compare_frames

    desc = sql_describe_fact(spark, SF_SMALL)
    rows = [(r["column_name"], r["data_type"]) for r in desc.collect()]
    assert rows == FACT_CONTRACT
    fact = gold_frames(spark, SF_SMALL)["fact"]
    assert fact.dtypes == FACT_CONTRACT
    cat_cols = [c.name for c in spark.catalog.listColumns("fact_transactions")]
    assert cat_cols == [c for c, _ in FACT_CONTRACT]
    compare_frames(desc, duck.sql(DESCRIBE_FACT_SQL), check_types=False)


def test_published_views_pin_one_group_and_survive_concurrent_publish(spark, tmp_path):
    """Round-10 verdict #3: the snapshot store's S10 step. Views
    registered over a published group read ONE manifest-pinned set:
    a concurrent publish of different data never tears or shifts what
    they resolve mid-query (versions are immutable, publishes
    append-only); re-registering flips atomically to the new group."""
    import threading

    from real_time_fraud_detection_lakehouse_spark.plans.gold import publish_gold
    from real_time_fraud_detection_lakehouse_spark.plans.sql_views import (
        register_published_views,
    )
    from real_time_fraud_detection_lakehouse_spark.sources.snapshots import (
        publish_tables,
        read_published,
    )

    root = str(tmp_path / "store")
    publish_gold(spark, SF_SMALL, root)
    assert register_published_views(spark, root) == 1
    probe = "SELECT COUNT(*) AS n, SUM(total_transactions) AS s FROM daily_summary"
    before = spark.sql(probe).collect()[0]

    # rival publisher commits a DIFFERENT group (fact truncated to 100
    # rows) while we keep querying the registered views
    def rival() -> None:
        g1 = read_published(spark, root, 1)
        publish_tables({**g1, "fact": g1["fact"].limit(100)}, root)

    t = threading.Thread(target=rival)
    t.start()
    seen = []
    while t.is_alive():
        seen.append(spark.sql(probe).collect()[0])
    t.join()
    seen.append(spark.sql(probe).collect()[0])
    assert all(row == before for row in seen)  # pinned: never torn, never shifted

    # re-register → atomically the NEW group (and pinning group 1 still works)
    assert register_published_views(spark, root) == 2
    after = spark.sql(probe).collect()[0]
    assert after != before and after["n"] <= before["n"]
    assert register_published_views(spark, root, group_version=1) == 1
    assert spark.sql(probe).collect()[0] == before


def test_sql_published_daily_summary_equals_live_view(spark, tmp_path):
    """The published-group SQL path must round-trip the medallion
    bit-exactly: publish → register → spark.sql equals the live
    gold_frames daily_summary (the shared driver oracle's claim)."""
    from real_time_fraud_detection_lakehouse_spark.plans.gold import (
        gold_frames,
        publish_gold,
    )
    from real_time_fraud_detection_lakehouse_spark.plans.sql_views import (
        register_published_views,
    )

    root = str(tmp_path / "store2")
    publish_gold(spark, SF_SMALL, root)
    register_published_views(spark, root)
    pub = sorted(
        map(tuple, spark.sql("SELECT * FROM daily_summary").collect()), key=repr
    )
    live = sorted(
        map(tuple, VIEWS["daily_summary"][0](gold_frames(spark, SF_SMALL)).collect()),
        key=repr,
    )
    assert pub == live
