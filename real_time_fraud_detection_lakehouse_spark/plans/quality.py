"""Data-quality observation: pipeline counters that ride an existing
action via ``DataFrame.observe`` — at 100 TB a second
validation scan of the input is itself a 100 TB job, so quality
metrics must piggyback on the write that already reads every row.

The reference validates post-hoc with separate queries
(`/root/reference/spark/app/silver_job.py` recount patterns); this
is the engine-native upgrade: the aggregates are computed by the
same tasks that produce the output, surfaced on the driver after the
action finishes, zero extra jobs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observe_silver_quality(silver: DataFrame) -> tuple[DataFrame, Observation]:
    """Attach silver-layer quality counters. Returns (df, observation);
    run any action on ``df`` (e.g. the silver write), then read
    ``observation.get`` — a dict with row counts, null/violation
    counters and value bounds. The observation aggregates are
    evaluated inside the action's tasks (map-side, merged on the
    driver), not by a second scan."""
    obs = Observation("silver_quality")
    observed = silver.observe(
        obs,
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.when(F.col("amt").isNull(), 1).otherwise(0)).alias("null_amt"),
        F.sum(F.when(F.col("amt") < 0, 1).otherwise(0)).alias("negative_amt"),
        F.sum(F.when(F.col("trans_timestamp").isNull(), 1).otherwise(0)).alias(
            "null_ts"
        ),
        F.min("trans_timestamp").alias("min_ts"),
        F.max("trans_timestamp").alias("max_ts"),
        F.sum(F.when(F.col("distance_km") < 0, 1).otherwise(0)).alias(
            "sentinel_distance"
        ),
    )
    return observed, obs
