"""Key-shifted replica synthesis: build an N-times larger, join-
consistent copy of a testdata directory for scale testing.

Join keys (orderkey, custkey, suppkey, user/doc/vec ids) are offset
per copy so joins keep their selectivity and dedup operators find
real (planted) cross-copy duplicates; pure dimension tables (nation,
region) are kept as-is so FK arity is preserved. This is the
machinery behind the standing scaling bench (bench.py) and
scripts/bench_scale.py.

Scale note: the replica is built with unionByName of column-shifted
scans — no shuffle, no driver materialization; the write is the only
cost. At 100 TB you would point the bench at a real larger SF
instead, but the key-shift trick is also how one fabricates
worst-case skew/fan-out datasets from a small seed.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from real_time_fraud_detection_lakehouse_spark.core.catalog import TESTDATA_TABLES, table

#: per-table key columns to offset per copy (keeps joins consistent)
KEY_SHIFTS = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "events": ["user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "nation": [],  # dims: kept as-is (copies would break FK arity)
    "region": [],
}


def build_replica(
    spark: SparkSession, sf_dir: str, out_dir: str, copies: int = 10
) -> None:
    """Write a ``copies``-times key-shifted replica of ``sf_dir`` to
    ``out_dir`` (one parquet dir per table, same layout as testdata)."""
    for name in TESTDATA_TABLES:
        src = table(spark, sf_dir, name)
        shifts = KEY_SHIFTS.get(name, [])
        if not shifts:
            df = src
        else:
            offsets = {c: src.agg(F.max(c)).first()[0] + 1 for c in shifts}
            parts = []
            for i in range(copies):
                c = src
                for col, off in offsets.items():
                    c = c.withColumn(col, F.col(col) + F.lit(i * off))
                parts.append(c)
            df = parts[0]
            for c in parts[1:]:
                df = df.unionByName(c)
        df.write.mode("overwrite").parquet(os.path.join(out_dir, f"{name}.parquet"))
