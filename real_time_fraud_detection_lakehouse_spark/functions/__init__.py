"""Scalar / feature column-expression library (JVM-side, no Python UDFs)."""

from real_time_fraud_detection_lakehouse_spark.functions.features import (  # noqa: F401
    REF_PI,
    age_years,
    amount_bin,
    cyclic_hour,
    gender_encoded,
    haversine_km,
    is_distant_transaction,
    is_high_amount,
    is_late_night,
    is_weekend,
    is_zero_amount,
    log_amount,
    rule_fraud_score,
    risk_level,
    surrogate_key,
    time_period,
    with_silver_features,
)
