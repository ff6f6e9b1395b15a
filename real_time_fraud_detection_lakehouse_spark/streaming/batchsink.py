"""The idempotent per-batch partition sink — the one foreachBatch
scaffold every availableNow monitor here shares (FK monitor, quantile
sketch, ring monitor, fuzzy-entity gate; round-13 review finding: the
pattern was copy-pasted four times, and all four copies crashed on a
zero-batch source whose out_path never materializes).

Contract: the per-batch ``emit(batch_df, batch_id)`` writes its
output under ``out_path/batch_id=<N>`` with mode=overwrite (use
:func:`write_batch_partition`), so a crash replay overwrites the SAME
partition instead of double-appending — exactly-once from idempotence
rather than from trust in the commit protocol."""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def write_batch_partition(df: DataFrame, out_path: str, batch_id: int) -> None:
    """Idempotent per-batch write: the batch_id IS the partition dir."""
    df.write.mode("overwrite").parquet(
        os.path.join(out_path, f"batch_id={batch_id}")
    )


def run_partitioned_foreach_stream(
    spark: SparkSession,
    stream: DataFrame,
    emit: Callable[[DataFrame, int], None],
    out_path: str,
    checkpoint_dir: str,
    out_schema: str,
) -> DataFrame:
    """Run ``stream`` to completion under AvailableNow with ``emit``
    as the foreachBatch body, then read the accumulated partitioned
    output back with an explicit schema. A source that produced ZERO
    batches leaves no out_path at all — returns an empty frame of the
    declared schema instead of a read crash (the stateful-sink
    zero-row bug class, closed at the scaffold)."""
    q = (
        stream.writeStream.foreachBatch(emit)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if not os.path.isdir(out_path):
        return spark.createDataFrame([], out_schema)
    return spark.read.schema(out_schema).parquet(out_path)
