"""Streaming bronze ingest: CDC-enveloped JSON → parsed, typed,
partitioned append with checkpointing.

Re-expresses `/root/reference/spark/app/streaming_job.py:65-115`
(Kafka → get_json_object → from_json → partitioned Delta append via
foreachBatch) as an idiomatic Structured Streaming pipeline. In this
environment there is no Kafka broker, so the stream source is a JSON
*file* source with the identical Debezium envelope and encodings
(epoch-µs string timestamps, epoch-day dob, tombstones with
after=null per docs/FAQ.txt:59-93) — the transform stage is
source-agnostic: swap ``readStream.json`` for
``readStream.format("kafka")`` + the value-cast and nothing else
changes (see :func:`parse_cdc`).

Design choices vs the reference, for scale:
- direct partitioned append sink (no foreachBatch detour — pure
  appends don't need it; exactly-once comes from the file-sink
  commit log + checkpoint).
- ``Trigger.AvailableNow`` for batch-boundary runs (T1/T4) instead
  of an always-on 10 s trigger; production would use processingTime.
- partitioned by year/month/day like bronze in the reference
  (streaming_job.py:104) so downstream date filters prune files.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from real_time_fraud_detection_lakehouse_spark.core.schemas import CDC_ENVELOPE
from real_time_fraud_detection_lakehouse_spark.sources.transactions import transactions_df

#: every 211th record becomes a tombstone (after=null) to exercise P3.
TOMBSTONE_MOD = 211


def write_cdc_fixture(spark: SparkSession, sf_dir: str, out_dir: str) -> int:
    """Materialize the transactions table as CDC JSON-lines files
    (the Debezium envelope shape from FIXTURES.md §2). Returns the
    number of *data* records (tombstones excluded)."""
    rows = transactions_df(spark, sf_dir).collect()
    os.makedirs(out_dir, exist_ok=True)
    n_files = 4
    counts = 0
    files = [open(os.path.join(out_dir, f"part-{i}.json"), "w") for i in range(n_files)]
    try:
        for i, row in enumerate(rows):
            f = files[i % n_files]
            if i % TOMBSTONE_MOD == 0:
                f.write(json.dumps({"after": None}) + "\n")
                continue
            d = row.asDict()
            after = {
                "trans_date_trans_time": str(
                    int(d["trans_timestamp"].timestamp() * 1_000_000)
                ),
                "cc_num": str(d["cc_num"]),
                "merchant": d["merchant"],
                "category": d["category"],
                "amt": d["amt"],
                "first": d["first"],
                "last": d["last"],
                "gender": d["gender"],
                "street": d["street"],
                "city": d["city"],
                "state": d["state"],
                "zip": str(d["zip"]),
                "lat": repr(d["lat"]),
                "long": repr(d["long"]),
                "city_pop": str(d["city_pop"]),
                "job": d["job"],
                "dob": str((d["dob"] - __import__("datetime").date(1970, 1, 1)).days),
                "trans_num": d["trans_num"],
                "unix_time": str(d["unix_time"]),
                "merch_lat": repr(d["merch_lat"]) if d["merch_lat"] is not None else None,
                "merch_long": repr(d["merch_long"]),
                "is_fraud": str(d["is_fraud"]),
            }
            f.write(json.dumps({"after": after}) + "\n")
            counts += 1
    finally:
        for f in files:
            f.close()
    return counts


def parse_cdc(raw: DataFrame, json_col: str = "value") -> DataFrame:
    """Envelope parse + flatten + typed bronze columns — the shared
    transform for any CDC byte source (S1/S2 → P1/P2/P3 → F1/F3).

    ``raw`` carries one JSON string per record in ``json_col``
    (for Kafka: ``selectExpr("CAST(value AS STRING) AS value")``).
    """
    after_json = F.get_json_object(F.col(json_col), "$.after")
    parsed = (
        raw.select(after_json.alias("after_json"))
        .filter(F.col("after_json").isNotNull())  # tombstone filter (P3)
        .select(F.from_json("after_json", CDC_ENVELOPE["after"].dataType).alias("data"))
        .select("data.*")
    )
    ts = (F.col("trans_date_trans_time").cast("long") / 1_000_000).cast("timestamp")
    return (
        parsed.withColumn("trans_timestamp", ts)
        .withColumn("ingestion_time", F.current_timestamp())
        .withColumn("year", F.year("trans_timestamp"))
        .withColumn("month", F.month("trans_timestamp"))
        .withColumn("day", F.dayofmonth("trans_timestamp"))
    )


def run_bronze_stream(
    spark: SparkSession,
    cdc_dir: str,
    bronze_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> DataFrame:
    """File-source stream → parse → partitioned parquet append with
    checkpoint; returns the bronze table read back."""
    raw = (
        spark.readStream.schema("value string")
        .text(cdc_dir)
        .withColumnRenamed("value", "value")
    )
    bronze = parse_cdc(raw)
    writer = (
        bronze.writeStream.format("parquet")
        .option("path", bronze_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .partitionBy("year", "month", "day")
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
    else:
        q = writer.trigger(processingTime="10 seconds").start()
    q.awaitTermination()
    return spark.read.parquet(bronze_dir)


def streaming_bronze_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end streaming smoke path for the driver: fixture →
    stream → bronze → per-day counts (deterministic aside from audit
    cols, which are excluded)."""
    import tempfile

    tmp = tempfile.mkdtemp(prefix="bronze_stream_")
    cdc = os.path.join(tmp, "cdc")
    bronze_dir = os.path.join(tmp, "bronze")
    ckpt = os.path.join(tmp, "ckpt")
    write_cdc_fixture(spark, sf_dir, cdc)
    bronze = run_bronze_stream(spark, cdc, bronze_dir, ckpt)
    return (
        bronze.groupBy("year", "month", "day")
        .agg(
            F.count("*").alias("records"),
            F.countDistinct("trans_num").alias("distinct_trans"),
        )
        .orderBy("year", "month", "day")
    )
