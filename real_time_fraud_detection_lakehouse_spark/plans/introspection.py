"""Catalog introspection surface: ``SHOW TABLES`` / ``DESCRIBE``.

The reference's chatbot service discovers the lakehouse schema through
Trino metadata queries — ``SHOW TABLES`` scoped to the gold schema and
per-table ``DESCRIBE``
(`/root/reference/services/fraud-chatbot/src/database/trino.py:74-98`,
`schema_loader.py:82-152`).  The Spark-native equivalent is the session
catalog: after :func:`register_analytics_views` the whole surface is
visible to ``spark.sql("SHOW TABLES")`` / ``DESCRIBE TABLE`` /
``spark.catalog.listTables()``.

Both queries below are scoped to the engine's registered table set
(the reference scopes by Trino schema name; a shared Spark session may
hold unrelated temp views), so their output is deterministic and
oracle-checkable as constant relations.  ``DESCRIBE`` doubles as the
schema-drift tripwire: the oracle pins the gold fact contract
column-for-column, so any silver/gold change that alters a name or
type fails the driver hash compare instead of sliding through.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from real_time_fraud_detection_lakehouse_spark.plans.sql_views import (
    SPARK_SQL_VIEWS,
    register_analytics_views,
)

#: Base tables registered by register_analytics_views (medallion star
#: schema + silver), before the analytics views.
BASE_TABLES = [
    "fact_transactions",
    "dim_customer",
    "dim_merchant",
    "dim_time",
    "dim_location",
    "silver_transactions",
]

#: The full SQL-visible surface, mirroring the reference chatbot's
#: schema-scoped SHOW TABLES result set.
SQL_SURFACE = sorted(BASE_TABLES + list(SPARK_SQL_VIEWS))

#: Gold fact contract: (column, spark type) in DESCRIBE order. This is
#: the declared interface the DESCRIBE oracle pins; gold.fact_transactions
#: must keep producing exactly this.
FACT_CONTRACT: list[tuple[str, str]] = [
    ("transaction_key", "string"),
    ("customer_key", "bigint"),
    ("merchant", "string"),
    ("time_key", "string"),
    ("transaction_amount", "double"),
    ("is_fraud", "int"),
    ("transaction_timestamp", "timestamp"),
    ("transaction_category", "string"),
    ("unix_time", "bigint"),
    ("distance_km", "double"),
    ("customer_age_at_transaction", "bigint"),
    ("log_amount", "double"),
    ("amount_bin", "int"),
    ("is_distant_transaction", "int"),
    ("is_late_night", "int"),
    ("is_zero_amount", "int"),
    ("is_high_amount", "int"),
    ("transaction_hour", "int"),
    ("transaction_day_of_week", "int"),
    ("is_weekend_transaction", "int"),
    ("hour_sin", "double"),
    ("hour_cos", "double"),
]


def sql_show_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``SHOW TABLES`` over the registered lakehouse surface
    (trino.py:74-82 shape: one row per table, scoped to the engine's
    schema). Metadata-only — no data scan at any SF."""
    register_analytics_views(spark, sf_dir)
    return (
        spark.sql("SHOW TABLES")
        .filter(F.col("tableName").isin(SQL_SURFACE))
        .select(F.col("tableName").alias("table_name"))
    )


def sql_describe_fact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``DESCRIBE TABLE fact_transactions`` (schema_loader.py:82-152
    shape: column name + type per row). Metadata-only."""
    register_analytics_views(spark, sf_dir)
    return spark.sql("DESCRIBE TABLE fact_transactions").select(
        F.col("col_name").alias("column_name"),
        F.col("data_type"),
    )


def _values_sql(rows: list[tuple[str, ...]], cols: tuple[str, ...]) -> str:
    body = ", ".join("(" + ", ".join(f"'{v}'" for v in row) + ")" for row in rows)
    return f"SELECT * FROM (VALUES {body}) AS t({', '.join(cols)})"


#: DuckDB oracles: constant relations pinning the catalog surface and
#: the fact contract (metadata has no data-dependent component).
SHOW_TABLES_SQL = _values_sql([(n,) for n in SQL_SURFACE], ("table_name",))
DESCRIBE_FACT_SQL = _values_sql(
    [(c, t) for c, t in FACT_CONTRACT], ("column_name", "data_type")
)
