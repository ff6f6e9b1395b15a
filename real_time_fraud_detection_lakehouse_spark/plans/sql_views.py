"""The analytics views as *Spark SQL* DDL — the dialect surface the
reference's users actually type (Trino SQL at
`/root/reference/sql/gold_layer_views_delta.sql`, ported 1:1: YEAR/
MONTH/DAY, CAST AS DOUBLE, CASE WHEN, HAVING, ORDER/LIMIT all exist
in Spark SQL).

:func:`register_analytics_views` materializes the medallion as temp
views (``fact_transactions``, ``dim_customer``, ``dim_time``, …) and
creates each analytics view with ``CREATE OR REPLACE TEMPORARY
VIEW`` — after which ``spark.sql("SELECT * FROM daily_summary")``
works exactly like the reference's Trino session. The SQL text is
deliberately the deterministic variant (floor-rounding, tiebreakers)
so SQL-surface results equal the DataFrame builders bit-for-bit —
asserted in tests/test_sql_views.py.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from real_time_fraud_detection_lakehouse_spark.plans.gold import gold_frames


def _r4(expr: str) -> str:
    # 10000.0D: the D suffix forces a double literal — bare 10000.0 is
    # a DECIMAL literal in Spark SQL (unlike the DataFrame API's lit)
    return f"(FLOOR(({expr}) * 10000.0D + 0.5D) / 10000.0D)"


_FRAUDS = "CAST(SUM(CASE WHEN is_fraud = 1 THEN 1 ELSE 0 END) AS BIGINT)"
_RATE = "CAST(SUM(CASE WHEN is_fraud = 1 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)"

#: Spark-SQL SELECT per view (names match plans.views.VIEWS).
SPARK_SQL_VIEWS: dict[str, str] = {
    "daily_summary": f"""
        SELECT
          YEAR(transaction_timestamp) AS year,
          MONTH(transaction_timestamp) AS month,
          DAY(transaction_timestamp) AS day,
          DATE(transaction_timestamp) AS report_date,
          COUNT(*) AS total_transactions,
          {_FRAUDS} AS fraud_transactions,
          CAST(SUM(CASE WHEN is_fraud = 0 THEN 1 ELSE 0 END) AS BIGINT) AS normal_transactions,
          {_r4('AVG(transaction_amount)')} AS avg_transaction_amount,
          MAX(transaction_amount) AS max_transaction_amount,
          MIN(transaction_amount) AS min_transaction_amount,
          {_r4('SUM(transaction_amount)')} AS total_amount,
          {_r4('SUM(CASE WHEN is_fraud = 1 THEN transaction_amount ELSE 0 END)')} AS fraud_amount,
          {_r4('AVG(CASE WHEN distance_km >= 0 THEN distance_km END)')} AS avg_distance,
          MAX(CASE WHEN distance_km >= 0 THEN distance_km END) AS max_distance,
          {_RATE} AS fraud_rate,
          {_r4('''CASE WHEN SUM(CASE WHEN is_fraud = 1 THEN 1 ELSE 0 END) > 0
                 THEN SUM(CASE WHEN is_fraud = 1 THEN transaction_amount ELSE 0 END)
                      / SUM(CASE WHEN is_fraud = 1 THEN 1 ELSE 0 END)
                 ELSE 0 END''')} AS avg_fraud_amount
        FROM fact_transactions
        GROUP BY 1, 2, 3, 4
    """,
    "hourly_summary": f"""
        SELECT
          YEAR(transaction_timestamp) AS year,
          MONTH(transaction_timestamp) AS month,
          DAY(transaction_timestamp) AS day,
          transaction_hour AS hour,
          COUNT(*) AS total_transactions,
          {_FRAUDS} AS fraud_transactions,
          {_r4('AVG(transaction_amount)')} AS avg_amount,
          {_r4('AVG(CASE WHEN distance_km >= 0 THEN distance_km END)')} AS avg_distance,
          {_RATE} AS fraud_rate
        FROM fact_transactions
        GROUP BY 1, 2, 3, 4
    """,
    "state_summary": f"""
        SELECT
          c.customer_state AS state,
          COUNT(*) AS total_transactions,
          {_FRAUDS} AS fraud_transactions,
          {_r4('AVG(f.transaction_amount)')} AS avg_amount,
          {_r4('AVG(CASE WHEN f.distance_km >= 0 THEN f.distance_km END)')} AS avg_distance,
          {_RATE} AS fraud_rate
        FROM fact_transactions f
        JOIN dim_customer c ON f.customer_key = c.customer_key
        GROUP BY c.customer_state
    """,
    "category_summary": f"""
        SELECT
          transaction_category AS category,
          COUNT(*) AS total_transactions,
          {_FRAUDS} AS fraud_transactions,
          {_r4('AVG(transaction_amount)')} AS avg_amount,
          {_RATE} AS fraud_rate
        FROM fact_transactions
        GROUP BY transaction_category
    """,
    "amount_summary": f"""
        SELECT
          amount_bin AS amount_range,
          COUNT(*) AS total_transactions,
          {_FRAUDS} AS fraud_transactions,
          {_r4('AVG(transaction_amount)')} AS avg_amount,
          {_RATE} AS fraud_rate
        FROM fact_transactions
        GROUP BY amount_bin
    """,
    "fraud_patterns": f"""
        SELECT
          amount_bin AS amount_range,
          COUNT(*) AS fraud_count,
          {_r4('AVG(transaction_amount)')} AS avg_fraud_amount,
          {_r4('AVG(CASE WHEN distance_km >= 0 THEN distance_km END)')} AS avg_fraud_distance,
          AVG(transaction_hour) AS avg_hour,
          CAST(SUM(CASE WHEN is_weekend_transaction = 1 THEN 1 ELSE 0 END) AS BIGINT) AS weekend_frauds
        FROM fact_transactions
        WHERE is_fraud = 1
        GROUP BY amount_bin
    """,
    "merchant_analysis": f"""
        SELECT * FROM (
          SELECT
            merchant,
            transaction_category AS merchant_category,
            COUNT(*) AS total_transactions,
            {_FRAUDS} AS fraud_transactions,
            {_r4('AVG(transaction_amount)')} AS avg_amount,
            {_RATE} AS fraud_rate
          FROM fact_transactions
          GROUP BY merchant, transaction_category
          HAVING COUNT(*) > 10
        ) ORDER BY fraud_rate DESC, merchant ASC, merchant_category ASC LIMIT 100
    """,
    "time_period_analysis": f"""
        SELECT
          t.time_period,
          t.is_weekend,
          COUNT(*) AS total_transactions,
          {_FRAUDS} AS fraud_transactions,
          {_r4('AVG(f.transaction_amount)')} AS avg_amount,
          {_RATE} AS fraud_rate
        FROM fact_transactions f
        JOIN dim_time t ON f.time_key = t.time_key
        GROUP BY t.time_period, t.is_weekend
    """,
}


def register_analytics_views(spark: SparkSession, sf_dir: str | None = None) -> list[str]:
    """Register base tables + analytics views in the session catalog.
    Returns the view names. After this, the whole reference SQL
    surface is one ``spark.sql(...)`` away."""
    frames = gold_frames(spark, sf_dir)
    frames["fact"].createOrReplaceTempView("fact_transactions")
    frames["dim_customer"].createOrReplaceTempView("dim_customer")
    frames["dim_merchant"].createOrReplaceTempView("dim_merchant")
    frames["dim_time"].createOrReplaceTempView("dim_time")
    frames["dim_location"].createOrReplaceTempView("dim_location")
    frames["silver"].createOrReplaceTempView("silver_transactions")
    for name, select in SPARK_SQL_VIEWS.items():
        spark.sql(f"CREATE OR REPLACE TEMPORARY VIEW {name} AS {select}")
    return list(SPARK_SQL_VIEWS)


#: published-group table name → the catalog name the SQL views expect
_PUBLISHED_TO_VIEW = {
    "fact": "fact_transactions",
    "dim_customer": "dim_customer",
    "dim_merchant": "dim_merchant",
    "dim_time": "dim_time",
    "dim_location": "dim_location",
}


def register_published_views(
    spark: SparkSession, root: str, group_version: int | None = None
) -> int:
    """Register a PUBLISHED gold group (``plans/gold.publish_gold``
    store) plus the analytics views in the session catalog — the S10
    catalog-registration step for the snapshot store, the analog of
    the reference registering its gold Delta tables so the SQL surface
    can query them (`reference/spark/app/register_tables_to_hive.py:44-89`).

    The registered tables are pinned by ONE manifest (latest, or
    ``group_version`` = the multi-table ``VERSION AS OF``), so every
    ``spark.sql`` against the views reads a CONSISTENT group: versions
    are immutable and publishes append-only, which means a concurrent
    publish can never tear or shift what these views resolve — readers
    flip only when re-registered (tests/test_sql_views.py). Returns
    the pinned group version."""
    from real_time_fraud_detection_lakehouse_spark.sources.snapshots import (
        _latest_group,
        read_published,
    )

    if group_version is None:
        group_version = _latest_group(root)
    frames = read_published(spark, root, group_version)
    for published, view_name in _PUBLISHED_TO_VIEW.items():
        frames[published].createOrReplaceTempView(view_name)
    for name, select in SPARK_SQL_VIEWS.items():
        spark.sql(f"CREATE OR REPLACE TEMPORARY VIEW {name} AS {select}")
    return group_version
