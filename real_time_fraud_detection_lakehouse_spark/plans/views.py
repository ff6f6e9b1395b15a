"""Analytics surface: the reference's 9 gold views
(`/root/reference/sql/gold_layer_views_delta.sql:18-236`) and 14
dashboard queries (`/root/reference/sql/dashboard_charts.sql:11-178`)
as Spark DataFrame builders, each with its DuckDB-oracle SQL twin.

Registry shape: ``VIEWS[name] = (builder, oracle_select)`` where
``builder(gold)`` takes a dict of gold DataFrames (fact, dim_customer,
dim_time) and ``oracle_select`` is a SELECT referencing the CTEs from
:func:`plans.gold.gold_prelude`.

Determinism deviations from the reference (documented, applied on BOTH
engines so results stay comparable):

- ``ORDER BY … LIMIT k`` gets a deterministic tiebreaker column (the
  reference relies on arbitrary tie order).
- ``latest_metrics`` filters on the dataset's max date instead of
  CURRENT_DATE (the synthetic clock).
- double-valued aggregates over double inputs are rounded with the
  deterministic floor-rounding (dround, 4 digits) because FP addition
  order differs between engines; aggregates over ints and min/max are
  exact and stay unrounded.

Scale notes: every query is a hash aggregate over a small group count
→ map-side partial aggregation does nearly all the work; the two
joins (state_summary, time_period_analysis) broadcast the dim side.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from real_time_fraud_detection_lakehouse_spark.sources.transactions import dround, dround_sql

Builder = Callable[[dict[str, DataFrame]], DataFrame]

VIEWS: dict[str, tuple[Builder, str]] = {}


def _register(name: str, sql: str):
    def deco(fn: Builder) -> Builder:
        VIEWS[name] = (fn, sql)
        return fn

    return deco


def _frauds() -> F.Column:
    return F.sum(F.when(F.col("is_fraud") == 1, 1).otherwise(0)).cast("long")


def _fraud_rate() -> F.Column:
    return _frauds().cast("double") / F.count("*")


_FRAUDS = "CAST(SUM(CASE WHEN is_fraud = 1 THEN 1 ELSE 0 END) AS BIGINT)"
_RATE = "CAST(SUM(CASE WHEN is_fraud = 1 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)"


def _r4(col: F.Column) -> F.Column:
    return dround(col, 4)


def _r4s(expr: str) -> str:
    return dround_sql(expr, 4)


# ---------------------------------------------------------------------------
# 1. daily_summary (gold_layer_views_delta.sql:18-57)
# ---------------------------------------------------------------------------
@_register(
    "daily_summary",
    f"""
    SELECT
      CAST(year(transaction_timestamp) AS INTEGER) AS year,
      CAST(month(transaction_timestamp) AS INTEGER) AS month,
      CAST(day(transaction_timestamp) AS INTEGER) AS day,
      CAST(transaction_timestamp AS DATE) AS report_date,
      COUNT(*) AS total_transactions,
      {_FRAUDS} AS fraud_transactions,
      CAST(SUM(CASE WHEN is_fraud = 0 THEN 1 ELSE 0 END) AS BIGINT) AS normal_transactions,
      {_r4s('AVG(transaction_amount)')} AS avg_transaction_amount,
      MAX(transaction_amount) AS max_transaction_amount,
      MIN(transaction_amount) AS min_transaction_amount,
      {_r4s('SUM(transaction_amount)')} AS total_amount,
      {_r4s('SUM(CASE WHEN is_fraud = 1 THEN transaction_amount ELSE 0 END)')} AS fraud_amount,
      {_r4s('AVG(CASE WHEN distance_km >= 0 THEN distance_km END)')} AS avg_distance,
      MAX(CASE WHEN distance_km >= 0 THEN distance_km END) AS max_distance,
      {_RATE} AS fraud_rate,
      {_r4s('''CASE WHEN SUM(CASE WHEN is_fraud = 1 THEN 1 ELSE 0 END) > 0
             THEN SUM(CASE WHEN is_fraud = 1 THEN transaction_amount ELSE 0 END)
                  / SUM(CASE WHEN is_fraud = 1 THEN 1 ELSE 0 END)
             ELSE 0 END''')} AS avg_fraud_amount
    FROM fact_transactions
    GROUP BY 1, 2, 3, 4
    """,
)
def daily_summary(g: dict[str, DataFrame]) -> DataFrame:
    f = g["fact"]
    ts = F.col("transaction_timestamp")
    amt = F.col("transaction_amount")
    dist = F.col("distance_km")
    frauds = _frauds()
    fraud_amt = F.sum(F.when(F.col("is_fraud") == 1, amt).otherwise(0.0))
    return f.groupBy(
        F.year(ts).alias("year"),
        F.month(ts).alias("month"),
        F.dayofmonth(ts).alias("day"),
        F.to_date(ts).alias("report_date"),
    ).agg(
        F.count("*").alias("total_transactions"),
        frauds.alias("fraud_transactions"),
        F.sum(F.when(F.col("is_fraud") == 0, 1).otherwise(0)).cast("long").alias("normal_transactions"),
        _r4(F.avg(amt)).alias("avg_transaction_amount"),
        F.max(amt).alias("max_transaction_amount"),
        F.min(amt).alias("min_transaction_amount"),
        _r4(F.sum(amt)).alias("total_amount"),
        _r4(fraud_amt).alias("fraud_amount"),
        _r4(F.avg(F.when(dist >= 0, dist))).alias("avg_distance"),
        F.max(F.when(dist >= 0, dist)).alias("max_distance"),
        _fraud_rate().alias("fraud_rate"),
        _r4(
            F.when(frauds > 0, fraud_amt / frauds).otherwise(0.0)
        ).alias("avg_fraud_amount"),
    )


# ---------------------------------------------------------------------------
# 2. hourly_summary (gold_layer_views_delta.sql:64-83)
# ---------------------------------------------------------------------------
@_register(
    "hourly_summary",
    f"""
    SELECT
      CAST(year(transaction_timestamp) AS INTEGER) AS year,
      CAST(month(transaction_timestamp) AS INTEGER) AS month,
      CAST(day(transaction_timestamp) AS INTEGER) AS day,
      transaction_hour AS hour,
      COUNT(*) AS total_transactions,
      {_FRAUDS} AS fraud_transactions,
      {_r4s('AVG(transaction_amount)')} AS avg_amount,
      {_r4s('AVG(CASE WHEN distance_km >= 0 THEN distance_km END)')} AS avg_distance,
      {_RATE} AS fraud_rate
    FROM fact_transactions
    GROUP BY 1, 2, 3, 4
    """,
)
def hourly_summary(g: dict[str, DataFrame]) -> DataFrame:
    f = g["fact"]
    ts = F.col("transaction_timestamp")
    dist = F.col("distance_km")
    return f.groupBy(
        F.year(ts).alias("year"),
        F.month(ts).alias("month"),
        F.dayofmonth(ts).alias("day"),
        F.col("transaction_hour").alias("hour"),
    ).agg(
        F.count("*").alias("total_transactions"),
        _frauds().alias("fraud_transactions"),
        _r4(F.avg("transaction_amount")).alias("avg_amount"),
        _r4(F.avg(F.when(dist >= 0, dist))).alias("avg_distance"),
        _fraud_rate().alias("fraud_rate"),
    )


# ---------------------------------------------------------------------------
# 3. state_summary (gold_layer_views_delta.sql:90-105) — J1 broadcast join
# ---------------------------------------------------------------------------
@_register(
    "state_summary",
    f"""
    SELECT
      c.customer_state AS state,
      COUNT(*) AS total_transactions,
      {_FRAUDS} AS fraud_transactions,
      {_r4s('AVG(f.transaction_amount)')} AS avg_amount,
      {_r4s('AVG(CASE WHEN f.distance_km >= 0 THEN f.distance_km END)')} AS avg_distance,
      {_RATE} AS fraud_rate
    FROM fact_transactions f
    JOIN dim_customer c ON f.customer_key = c.customer_key
    GROUP BY c.customer_state
    """,
)
def state_summary(g: dict[str, DataFrame]) -> DataFrame:
    f = g["fact"]
    c = g["dim_customer"]
    dist = F.col("distance_km")
    return (
        f.join(F.broadcast(c), "customer_key", "inner")
        .groupBy(F.col("customer_state").alias("state"))
        .agg(
            F.count("*").alias("total_transactions"),
            _frauds().alias("fraud_transactions"),
            _r4(F.avg("transaction_amount")).alias("avg_amount"),
            _r4(F.avg(F.when(dist >= 0, dist))).alias("avg_distance"),
            _fraud_rate().alias("fraud_rate"),
        )
    )


# ---------------------------------------------------------------------------
# 4. category_summary (gold_layer_views_delta.sql:112-124)
# ---------------------------------------------------------------------------
@_register(
    "category_summary",
    f"""
    SELECT
      transaction_category AS category,
      COUNT(*) AS total_transactions,
      {_FRAUDS} AS fraud_transactions,
      {_r4s('AVG(transaction_amount)')} AS avg_amount,
      {_RATE} AS fraud_rate
    FROM fact_transactions
    GROUP BY transaction_category
    """,
)
def category_summary(g: dict[str, DataFrame]) -> DataFrame:
    return g["fact"].groupBy(F.col("transaction_category").alias("category")).agg(
        F.count("*").alias("total_transactions"),
        _frauds().alias("fraud_transactions"),
        _r4(F.avg("transaction_amount")).alias("avg_amount"),
        _fraud_rate().alias("fraud_rate"),
    )


# ---------------------------------------------------------------------------
# 5. amount_summary (gold_layer_views_delta.sql:131-143)
# ---------------------------------------------------------------------------
@_register(
    "amount_summary",
    f"""
    SELECT
      amount_bin AS amount_range,
      COUNT(*) AS total_transactions,
      {_FRAUDS} AS fraud_transactions,
      {_r4s('AVG(transaction_amount)')} AS avg_amount,
      {_RATE} AS fraud_rate
    FROM fact_transactions
    GROUP BY amount_bin
    """,
)
def amount_summary(g: dict[str, DataFrame]) -> DataFrame:
    return g["fact"].groupBy(F.col("amount_bin").alias("amount_range")).agg(
        F.count("*").alias("total_transactions"),
        _frauds().alias("fraud_transactions"),
        _r4(F.avg("transaction_amount")).alias("avg_amount"),
        _fraud_rate().alias("fraud_rate"),
    )


# ---------------------------------------------------------------------------
# 6. latest_metrics (gold_layer_views_delta.sql:150-170) — global agg.
# Deviation: "today" = the dataset's max report date, not CURRENT_DATE.
# ---------------------------------------------------------------------------
@_register(
    "latest_metrics",
    f"""
    SELECT
      COUNT(*) AS total_transactions_today,
      {_FRAUDS} AS fraud_detected_today,
      {_r4s('AVG(transaction_amount)')} AS avg_amount_today,
      {_r4s('AVG(CASE WHEN distance_km >= 0 THEN distance_km END)')} AS avg_distance_today,
      MAX(transaction_timestamp) AS last_update,
      {_RATE} AS fraud_rate_today,
      CASE WHEN {_RATE} > 0.01 THEN 'HIGH'
           WHEN {_RATE} > 0.005 THEN 'MEDIUM'
           ELSE 'LOW' END AS alert_level
    FROM fact_transactions
    WHERE CAST(transaction_timestamp AS DATE) =
          (SELECT MAX(CAST(transaction_timestamp AS DATE)) FROM fact_transactions)
    """,
)
def latest_metrics(g: dict[str, DataFrame]) -> DataFrame:
    f = g["fact"]
    ts = F.col("transaction_timestamp")
    # scalar-subquery shape (like the oracle SQL): broadcast the
    # one-row max-date aggregate instead of a driver-side collect —
    # keeps the view builder lazy and single-pipeline
    max_date = f.agg(F.max(F.to_date(ts)).alias("_max_date"))
    dist = F.col("distance_km")
    rate = _fraud_rate()
    return f.join(F.broadcast(max_date), F.to_date(ts) == F.col("_max_date")).agg(
        F.count("*").alias("total_transactions_today"),
        _frauds().alias("fraud_detected_today"),
        _r4(F.avg("transaction_amount")).alias("avg_amount_today"),
        _r4(F.avg(F.when(dist >= 0, dist))).alias("avg_distance_today"),
        F.max(ts).alias("last_update"),
        rate.alias("fraud_rate_today"),
        F.when(rate > 0.01, "HIGH")
        .when(rate > 0.005, "MEDIUM")
        .otherwise("LOW")
        .alias("alert_level"),
    )


# ---------------------------------------------------------------------------
# 7. fraud_patterns (gold_layer_views_delta.sql:177-192)
# ---------------------------------------------------------------------------
@_register(
    "fraud_patterns",
    f"""
    SELECT
      amount_bin AS amount_range,
      COUNT(*) AS fraud_count,
      {_r4s('AVG(transaction_amount)')} AS avg_fraud_amount,
      {_r4s('AVG(CASE WHEN distance_km >= 0 THEN distance_km END)')} AS avg_fraud_distance,
      AVG(transaction_hour) AS avg_hour,
      CAST(SUM(CASE WHEN is_weekend_transaction = 1 THEN 1 ELSE 0 END) AS BIGINT) AS weekend_frauds
    FROM fact_transactions
    WHERE is_fraud = 1
    GROUP BY amount_bin
    """,
)
def fraud_patterns(g: dict[str, DataFrame]) -> DataFrame:
    f = g["fact"].filter(F.col("is_fraud") == 1)
    dist = F.col("distance_km")
    return f.groupBy(F.col("amount_bin").alias("amount_range")).agg(
        F.count("*").alias("fraud_count"),
        _r4(F.avg("transaction_amount")).alias("avg_fraud_amount"),
        _r4(F.avg(F.when(dist >= 0, dist))).alias("avg_fraud_distance"),
        F.avg("transaction_hour").alias("avg_hour"),
        F.sum(F.when(F.col("is_weekend_transaction") == 1, 1).otherwise(0))
        .cast("long")
        .alias("weekend_frauds"),
    )


# ---------------------------------------------------------------------------
# 8. merchant_analysis (gold_layer_views_delta.sql:199-214) — HAVING + top-k
# ---------------------------------------------------------------------------
@_register(
    "merchant_analysis",
    f"""
    SELECT * FROM (
      SELECT
        merchant,
        transaction_category AS merchant_category,
        COUNT(*) AS total_transactions,
        {_FRAUDS} AS fraud_transactions,
        {_r4s('AVG(transaction_amount)')} AS avg_amount,
        {_RATE} AS fraud_rate
      FROM fact_transactions
      GROUP BY merchant, transaction_category
      HAVING COUNT(*) > 10
    ) ORDER BY fraud_rate DESC, merchant ASC, merchant_category ASC LIMIT 100
    """,
)
def merchant_analysis(g: dict[str, DataFrame]) -> DataFrame:
    return (
        g["fact"]
        .groupBy("merchant", F.col("transaction_category").alias("merchant_category"))
        .agg(
            F.count("*").alias("total_transactions"),
            _frauds().alias("fraud_transactions"),
            _r4(F.avg("transaction_amount")).alias("avg_amount"),
            _fraud_rate().alias("fraud_rate"),
        )
        .filter(F.col("total_transactions") > 10)
        .orderBy(F.desc("fraud_rate"), F.asc("merchant"), F.asc("merchant_category"))
        .limit(100)
    )


# ---------------------------------------------------------------------------
# 9. time_period_analysis (gold_layer_views_delta.sql:221-236) — J2 join
# ---------------------------------------------------------------------------
@_register(
    "time_period_analysis",
    f"""
    SELECT
      t.time_period,
      t.is_weekend,
      COUNT(*) AS total_transactions,
      {_FRAUDS} AS fraud_transactions,
      {_r4s('AVG(f.transaction_amount)')} AS avg_amount,
      {_RATE} AS fraud_rate
    FROM fact_transactions f
    JOIN dim_time t ON f.time_key = t.time_key
    GROUP BY t.time_period, t.is_weekend
    """,
)
def time_period_analysis(g: dict[str, DataFrame]) -> DataFrame:
    f = g["fact"]
    t = g["dim_time"].select("time_key", "time_period", "is_weekend")
    return (
        f.join(F.broadcast(t), "time_key", "inner")
        .groupBy("time_period", "is_weekend")
        .agg(
            F.count("*").alias("total_transactions"),
            _frauds().alias("fraud_transactions"),
            _r4(F.avg("transaction_amount")).alias("avg_amount"),
            _fraud_rate().alias("fraud_rate"),
        )
    )
