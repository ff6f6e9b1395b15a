"""Watermarked streaming windows: emitted (closed) windows must equal
the batch aggregation over the same input."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL

from real_time_fraud_detection_lakehouse_spark.sources.transactions import transactions_df
from real_time_fraud_detection_lakehouse_spark.streaming.windows import (
    hourly_metrics_stream,
    user_sessions_stream,
)


def test_hourly_window_stream_matches_batch(spark, tmp_path):
    src = str(tmp_path / "tx")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    tx = transactions_df(spark, SF_SMALL)
    tx.write.mode("overwrite").parquet(src)

    streamed = hourly_metrics_stream(spark, src, out, ckpt)

    batch = (
        tx.groupBy(F.window("trans_timestamp", "1 hour").alias("w"), "category")
        .agg(
            F.count("*").alias("n"),
            F.sum("amt").alias("total_amount"),
            F.sum(F.when(F.col("is_fraud") == 1, 1).otherwise(0)).alias("frauds"),
        )
        .select(F.col("w.start").alias("window_start"), "category", "n", "total_amount", "frauds")
    )
    # append mode only emits windows the final watermark has passed
    # (max event time - 2h); the last windows stay open.
    s_rows = {
        (r["window_start"], r["category"]): (r["n"], r["frauds"]) for r in streamed.collect()
    }
    b_rows = {
        (r["window_start"], r["category"]): (r["n"], r["frauds"]) for r in batch.collect()
    }
    assert s_rows  # the 30-day span closes nearly everything
    assert len(s_rows) >= len(b_rows) * 0.9
    for key, val in s_rows.items():
        assert b_rows[key] == val


def test_session_window_stream_closes_sessions(spark, tmp_path):
    src = str(tmp_path / "tx")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    tx = transactions_df(spark, SF_SMALL)
    tx.write.mode("overwrite").parquet(src)

    sessions = user_sessions_stream(spark, src, out, ckpt)
    rows = sessions.collect()
    assert rows
    total_events = sum(r["events_in_session"] for r in rows)
    assert total_events <= tx.count()
    for r in rows[:50]:
        assert r["session_end"] > r["session_start"]
