"""SparkSession factory.

Mirrors the reference's engine configuration surface
(`config/spark/spark-defaults.conf:19-21` — AQE on, tuned shuffle
partitions, Kryo) but chosen for scale: AQE with partition
coalescing and skew-join handling, UTC session time zone (required
for deterministic oracle comparison against DuckDB), Arrow-enabled
pandas interop.

Scale notes (100 TB / 1000-executor design intent):
- ``spark.sql.shuffle.partitions`` here is a local-mode default; on
  a real cluster set it ~2-3x total cores, or rely on AQE
  coalescing from a high initial value.
- ``spark.sql.files.maxPartitionBytes`` 128m keeps scan tasks
  right-sized for wide parquet; raise for highly-compressed data.
- autoBroadcastJoinThreshold 64m: every dim table in the star
  schema fits comfortably; fact-fact joins still sort-merge.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CONF: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.shuffle.partitions": "32",
    "spark.sql.files.maxPartitionBytes": "134217728",
    "spark.sql.autoBroadcastJoinThreshold": "67108864",
    "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
    "spark.ui.enabled": "false",
    "spark.sql.parquet.compression.codec": "snappy",
}


def get_spark(
    app_name: str = "real_time_fraud_detection_lakehouse_spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or reuse) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (or all
    cores); in cluster deployments pass None and submit via
    spark-submit so the cluster manager decides.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    builder = SparkSession.builder.master(master).appName(app_name)
    conf = dict(DEFAULT_CONF)
    if extra_conf:
        conf.update(extra_conf)
    for key, value in conf.items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
