"""Salted join correctness: same result as the plain join, heavy keys split."""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_fraud_detection_lakehouse_spark.functions.skew import (
    salted_join,
    top_heavy_keys,
)


def _skewed_frames(spark):
    # 90% of fact rows share one key → classic hot key
    fact = spark.range(10_000).select(
        F.when(F.col("id") % 10 < 9, F.lit(1)).otherwise(F.col("id") % 100).alias("k"),
        F.col("id").alias("payload"),
    )
    dim = spark.range(100).select(F.col("id").alias("k"), (F.col("id") * 10).alias("attr"))
    return fact, dim


def test_top_heavy_keys(spark):
    fact, _ = _skewed_frames(spark)
    heavy = top_heavy_keys(fact, "k", threshold_ratio=0.5)
    assert heavy == [1]


def test_salted_join_equals_plain_join(spark):
    fact, dim = _skewed_frames(spark)
    plain = fact.join(dim, "k", "inner").groupBy("k").agg(
        F.count("*").alias("n"), F.sum("attr").alias("s")
    )
    salted = salted_join(fact, dim, "k", buckets=8).groupBy("k").agg(
        F.count("*").alias("n"), F.sum("attr").alias("s")
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))
