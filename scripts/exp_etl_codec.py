"""r17: isolate etl_silver_gold's sink cost by parquet codec.

The r16 verdict flagged etl_silver_gold 8.6 -> 12.7 s raw and named the
r16 global zstd default as the only code change in its path. This
replays bench phase 1 (silver REBALANCE write + 5 concurrent gold
writes) with the codec as a per-write option, interleaved A/B/A/B so a
drifting host cannot masquerade as a codec effect.

Usage: python scripts/exp_etl_codec.py [rounds]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    from real_time_fraud_detection_lakehouse_spark.core.session import get_spark
    from real_time_fraud_detection_lakehouse_spark.plans import gold as gold_mod
    from real_time_fraud_detection_lakehouse_spark.plans.gold import gold_frames

    spark = get_spark(
        "exp-etl-codec",
        master="local[32]",
        extra_conf={
            "spark.sql.shuffle.partitions": "32",
            "spark.driver.memory": "16g",
        },
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    gold_builders = {
        "fact": gold_mod.fact_transactions,
        "dim_customer": gold_mod.dim_customer,
        "dim_merchant": gold_mod.dim_merchant,
        "dim_time": gold_mod.dim_time,
        "dim_location": gold_mod.dim_location,
    }

    def run(codec: str) -> tuple[float, int]:
        warehouse = tempfile.mkdtemp(prefix=f"etl_codec_{codec.replace(':','_')}_")
        if codec.startswith("zstd:"):
            level = codec.split(":")[1]
            spark.conf.set("spark.sql.parquet.compression.codec", "zstd")
            spark._jsc.hadoopConfiguration().set(
                "parquet.compression.codec.zstd.level", level
            )
            opt = "zstd"
        else:
            spark.conf.set("spark.sql.parquet.compression.codec", codec)
            opt = codec
        t0 = time.time()
        g = gold_frames(spark, SF_DIR)
        (
            g["silver"]
            .hint("rebalance", "year", "month", "day")
            .write.mode("overwrite")
            .option("compression", opt)
            .partitionBy("year", "month", "day")
            .parquet(os.path.join(warehouse, "silver"))
        )
        silver_mat = spark.read.parquet(os.path.join(warehouse, "silver"))
        with ThreadPoolExecutor(max_workers=len(gold_builders)) as pool:
            list(
                pool.map(
                    lambda kv: kv[1](silver_mat)
                    .write.mode("overwrite")
                    .option("compression", opt)
                    .parquet(os.path.join(warehouse, kv[0])),
                    gold_builders.items(),
                )
            )
        sec = round(time.time() - t0, 3)
        nbytes = 0
        for root, _dirs, files in os.walk(warehouse):
            nbytes += sum(os.path.getsize(os.path.join(root, f)) for f in files)
        shutil.rmtree(warehouse, ignore_errors=True)
        return sec, nbytes

    codecs = ["snappy", "zstd:3", "zstd:1"]
    results: dict[str, list[float]] = {c: [] for c in codecs}
    sizes: dict[str, int] = {}
    for r in range(rounds):
        for c in codecs:
            spark.sparkContext.setJobDescription(f"etl-codec:{c}#{r}")
            sec, nbytes = run(c)
            results[c].append(sec)
            sizes[c] = nbytes
            print(f"round {r} {c}: {sec} s  ({nbytes/1e6:.1f} MB)", flush=True)
    for c in codecs:
        print(f"{c}: samples={results[c]} min={min(results[c])} bytes={sizes[c]}")
    spark.stop()


if __name__ == "__main__":
    main()
