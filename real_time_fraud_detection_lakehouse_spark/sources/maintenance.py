"""Table maintenance: small-file compaction for hive-partitioned
parquet tables — the vanilla-parquet analog of Delta ``OPTIMIZE``
(reference `docs/DEVELOPER_GUIDE.md:1038-1054`; Delta also gets
ZORDER/VACUUM, which have no parquet equivalent — annotated here the
same way sinks.py annotates MERGE).

Why this matters at 100 TB: a partitioned write from a T-task stage
fans out into up to T files *per hive partition* (every task holds a
sliver of every partition). Readers then pay per-file open/footer
costs and the driver pays listing costs; at thousands of partitions ×
hundreds of tasks that is millions of files.

Two tools:

- ``write_partitioned_compact`` — prevention: REBALANCE-hint the
  partition columns before the write, so AQE shuffles each hive
  partition's rows into ~one right-sized task (coalescing tiny
  partitions, splitting skewed ones) and the write emits ~1 file per
  partition instead of tasks × partitions.
- ``compact_partitions`` — cure: rewrite only the partitions whose
  file count exceeds a threshold, through the same partition-pruned
  scan + dynamic-partition-overwrite machinery as the partitioned
  upsert (sinks.upsert_by_key); untouched partitions are never read
  or rewritten.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned_compact(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
) -> None:
    """Partitioned write without small-file fan-out (see module doc)."""
    (
        df.hint("rebalance", *partition_cols)
        .write.mode(mode)
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def partition_file_counts(path: str, partition_cols: list[str]) -> dict[str, int]:
    """{relative partition dir → parquet file count}. Local-FS listing;
    on object storage this becomes a parallel FS listing (or a Delta
    log scan, which makes it free)."""
    depth = "/".join("*" for _ in partition_cols)
    counts: dict[str, int] = {}
    for part_dir in glob.glob(os.path.join(path, depth)):
        files = glob.glob(os.path.join(part_dir, "*.parquet"))
        if files:
            counts[os.path.relpath(part_dir, path)] = len(files)
    return counts


def compact_partitions(
    spark: SparkSession,
    path: str,
    partition_cols: list[str],
    max_files_per_partition: int = 1,
) -> dict[str, int]:
    """Rewrite partitions holding more than ``max_files_per_partition``
    parquet files into AQE-right-sized files; leave the rest untouched.
    Returns {partition dir → file count before} for the rewritten set.
    """
    before = partition_file_counts(path, partition_cols)
    crowded = {p: n for p, n in before.items() if n > max_files_per_partition}
    if not crowded:
        return {}

    # partition values from the dir names: "year=2024/month=1" → filter
    def part_filter(rel: str):
        cond = F.lit(True)
        for piece in rel.split(os.sep):
            col, val = piece.split("=", 1)
            cond = cond & (F.col(col).cast("string") == val)
        return cond

    existing = spark.read.parquet(path)
    affected = None
    for rel in crowded:
        affected = part_filter(rel) if affected is None else (affected | part_filter(rel))
    slice_df = existing.filter(affected)
    # materialize before overwriting the files being read (same
    # self-consumption hazard and same answer as sinks.upsert_by_key)
    staged = slice_df.hint("rebalance", *partition_cols).localCheckpoint(eager=True)
    (
        staged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_cols)
        .parquet(path)
    )
    return crowded
