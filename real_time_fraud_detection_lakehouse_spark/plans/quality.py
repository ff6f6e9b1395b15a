"""Data-quality observation: pipeline counters that ride an existing
action via ``DataFrame.observe`` — at 100 TB a second
validation scan of the input is itself a 100 TB job, so quality
metrics must piggyback on the write that already reads every row.

The reference validates post-hoc with separate queries
(`/root/reference/spark/app/silver_job.py` recount patterns); this
is the engine-native upgrade: the aggregates are computed by the
same tasks that produce the output, surfaced on the driver after the
action finishes, zero extra jobs.

Session-hygiene note (Spark 4.1 classic): the first ``Observation``
use registers ``ObservationManager$Listener$`` on the session's
``ExecutionListenerManager`` and never removes it.  That leftover
listener later gets captured into Spark-ML task closures and every
subsequent ``model.transform``/``fit`` dies with ``Task not
serializable: ...NotSerializableException: ObservationManager``.
``QualityObservation.get`` therefore detaches the listener right
after the metrics are read, and ``observe_silver_quality`` re-attaches
it (the manager's lazy one-shot init won't) before the next
observed action.  Detach/attach are no-ops on non-classic sessions.
"""

from __future__ import annotations

from typing import Any, Dict

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F


def _listener_entries(spark: SparkSession) -> list:
    """JVM QueryExecutionListeners owned by the ObservationManager."""
    try:
        lm = spark._jsparkSession.listenerManager()
        return [
            listener
            for listener in lm.listListeners()
            if "ObservationManager" in listener.getClass().getName()
        ]
    except Exception:  # Spark Connect / no py4j surface: nothing to manage
        return []


def detach_observation_listener(spark: SparkSession) -> None:
    """Remove the ObservationManager's QueryExecutionListener from the
    session so it cannot leak into later jobs' task closures."""
    try:
        lm = spark._jsparkSession.listenerManager()
    except Exception:
        return
    for listener in _listener_entries(spark):
        lm.unregister(listener)


def _attach_observation_listener(spark: SparkSession) -> None:
    """Re-register the manager's listener if a prior detach removed it.
    ObservationManager only self-registers on its lazy first init, so
    after a detach new Observations would block forever without this."""
    if _listener_entries(spark):
        return
    try:
        sess = spark._jsparkSession
        sess.listenerManager().register(sess.observationManager().Listener())
    except Exception:
        pass


class QualityObservation:
    """Thin wrapper over :class:`pyspark.sql.Observation` whose ``get``
    detaches the session-level observation listener after reading the
    metrics (see module docstring).  One in-flight observation per
    session: detaching while another observed action is mid-run would
    strand that observation, so read each ``get`` before starting the
    next observed action."""

    def __init__(self, spark: SparkSession, obs: Observation) -> None:
        self._spark = spark
        self._obs = obs

    @property
    def get(self) -> Dict[str, Any]:
        metrics = self._obs.get
        detach_observation_listener(self._spark)
        return metrics


def observe_silver_quality(silver: DataFrame) -> tuple[DataFrame, QualityObservation]:
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
    spark = silver.sparkSession
    _attach_observation_listener(spark)
    return observed, QualityObservation(spark, obs)
