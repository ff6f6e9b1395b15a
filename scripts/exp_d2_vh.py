"""r17 dev experiment: A/B one-variant-build (lazily checkpointed vh)
vs the current two-Generate shape for dedup_fuzzy_names_d2."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def timed(label, build, n=2):
    samples = []
    for _ in range(n):
        t0 = time.time()
        build().write.format("noop").mode("overwrite").save()
        samples.append(round(time.time() - t0, 3))
    print(f"{label}: min={min(samples)} samples={samples}", flush=True)
    return min(samples)


def main() -> None:
    from pyspark.sql import functions as F

    from real_time_fraud_detection_lakehouse_spark.core.catalog import (
        spread_small_input,
        table,
    )
    from real_time_fraud_detection_lakehouse_spark.core.session import get_spark

    spark = get_spark(
        "exp-d2-vh",
        master="local[32]",
        extra_conf={
            "spark.sql.shuffle.partitions": "32",
            "spark.driver.memory": "16g",
        },
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    from real_time_fraud_detection_lakehouse_spark.operators.dedup import (
        dedup_fuzzy_names_d2,
        deletion_variants2,
    )

    t = {"customer": table(spark, SF_DIR, "customer")}

    def names_d2_vh_ckpt():
        names = spread_small_input(t["customer"]).select("c_custkey", "c_name")
        variants = deletion_variants2(names, "c_custkey", "c_name")
        vh = variants.select(
            F.xxhash64("variant").alias("vh"), F.col("entity_id").alias("k")
        ).localCheckpoint(eager=False)
        cand = (
            vh.alias("a")
            .join(vh.alias("b"), "vh")
            .filter(F.col("a.k") < F.col("b.k"))
            .select(F.col("a.k").alias("custkey_a"), F.col("b.k").alias("custkey_b"))
            .distinct()
        )
        na = names.select(
            F.col("c_custkey").alias("custkey_a"), F.col("c_name").alias("name_a")
        )
        nb = names.select(
            F.col("c_custkey").alias("custkey_b"), F.col("c_name").alias("name_b")
        )
        return (
            cand.join(na, "custkey_a")
            .join(nb, "custkey_b")
            .select(
                "custkey_a",
                "custkey_b",
                F.levenshtein("name_a", "name_b", 2).alias("distance"),
            )
            .filter(F.col("distance") >= 0)
            .select(
                "custkey_a",
                "custkey_b",
                F.col("distance").cast("long").alias("distance"),
            )
        )

    for rnd in range(2):
        timed(f"names_d2 CURRENT (round {rnd})", lambda: dedup_fuzzy_names_d2(t))
        timed(f"names_d2 vh-ckpt (round {rnd})", names_d2_vh_ckpt)
    spark.stop()


if __name__ == "__main__":
    main()
