"""Declared schemas for the lakehouse tables.

Single source of truth for every StructType the engine consumes or
produces. Mirrors the reference's declared payload schema
(`/root/reference/spark/app/streaming_job.py:37-60`) and the CDC
envelope (`/root/reference/spark/app/realtime_prediction_job.py:423-428`):
Debezium publishes every field as string except ``amt`` (JSON double,
decimal.handling.mode=double) — the typed casts happen in silver.
"""

from __future__ import annotations

from pyspark.sql.types import (
    DoubleType,
    StringType,
    StructField,
    StructType,
)

#: Raw transaction payload as it arrives on the change stream. All
#: strings except amt (reference streaming_job.py:37-60): the source
#: emits epoch-micros strings for the timestamp and epoch-days ints
#: for dob; bronze keeps them raw, silver casts.
TRANSACTION_PAYLOAD = StructType(
    [
        StructField("trans_date_trans_time", StringType()),
        StructField("cc_num", StringType()),
        StructField("merchant", StringType()),
        StructField("category", StringType()),
        StructField("amt", DoubleType()),
        StructField("first", StringType()),
        StructField("last", StringType()),
        StructField("gender", StringType()),
        StructField("street", StringType()),
        StructField("city", StringType()),
        StructField("state", StringType()),
        StructField("zip", StringType()),
        StructField("lat", StringType()),
        StructField("long", StringType()),
        StructField("city_pop", StringType()),
        StructField("job", StringType()),
        StructField("dob", StringType()),
        StructField("trans_num", StringType()),
        StructField("unix_time", StringType()),
        StructField("merch_lat", StringType()),
        StructField("merch_long", StringType()),
        StructField("is_fraud", StringType()),
    ]
)

#: Debezium-style envelope: the row image lives under "after";
#: tombstones carry after=null (reference realtime_prediction_job.py:423-428).
CDC_ENVELOPE = StructType([StructField("after", TRANSACTION_PAYLOAD)])

#: 15-feature vector contract, exact order (reference
#: services/fraud-detection-api/app/main.py:359-376 — "Order MUST
#: match training"; training list ml_training_sklearn.py:62-75).
ML_FEATURES = [
    "amt",
    "log_amount",
    "is_zero_amount",
    "is_high_amount",
    "amount_bin",
    "distance_km",
    "is_distant_transaction",
    "age",
    "gender_encoded",
    "hour",
    "day_of_week",
    "is_weekend",
    "is_late_night",
    "hour_sin",
    "hour_cos",
]
