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


def test_aqe_skew_join_splits_planted_skew(spark):
    """With AQE skew handling on (engine default), a planted 95%-one-key
    sort-merge join shows skew-split partitions (skew=true) in the
    final adaptive plan and returns exact results."""
    from pyspark.sql import functions as F

    # thresholds are runtime confs — shrink them so local-size data
    # qualifies as skewed, restore after
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "20KB"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "20KB")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")

        # left: 95% of 100k rows pile onto k=0; right: unique keys so
        # the join output stays equal to the left row count
        left = spark.range(100_000).select(
            F.when(F.col("id") % 20 != 0, 0).otherwise(F.col("id")).alias("k"),
            F.concat(F.lit("pad-" * 16), F.col("id")).alias("payload"),
        )
        right = spark.range(100_000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("rid")
        )
        # keep payload in the output so column pruning cannot shrink
        # the skewed partition below the detection threshold
        joined = left.join(right, "k").select("k", "payload", "rid")
        rows = joined.collect()  # executes THIS DataFrame -> final AQE plan
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:2000]
        assert len(rows) == 100_000  # every left row matches exactly once
        assert sum(1 for r in rows if r["k"] == 0) == 100_000 - 100_000 // 20 + 1
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
