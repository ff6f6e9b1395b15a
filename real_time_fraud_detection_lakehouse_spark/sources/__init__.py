"""Sources and sinks: testdata-derived transactions, CDC parsing, writers."""

from real_time_fraud_detection_lakehouse_spark.sources.transactions import (  # noqa: F401
    TRANSACTIONS_CTE,
    dround,
    dround_sql,
    transactions_df,
)
