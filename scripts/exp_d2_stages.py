"""r17 dev experiment: isolate the d2 fuzzy family's stage costs at
sf0.1 (variant gen / candidate join+distinct / verify / CC) and A/B
candidate-generation shapes. Not part of the bench contract."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def timed(label, df, n=2):
    samples = []
    for _ in range(n):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        samples.append(round(time.time() - t0, 3))
    print(f"{label}: min={min(samples)} samples={samples}", flush=True)
    return min(samples)


def main() -> None:
    from pyspark.sql import functions as F

    from real_time_fraud_detection_lakehouse_spark.core.catalog import table
    from real_time_fraud_detection_lakehouse_spark.core.session import get_spark
    from real_time_fraud_detection_lakehouse_spark.core.catalog import spread_small_input

    spark = get_spark(
        "exp-d2",
        master="local[32]",
        extra_conf={
            "spark.sql.shuffle.partitions": "32",
            "spark.driver.memory": "16g",
        },
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    from real_time_fraud_detection_lakehouse_spark.operators.dedup import (
        _fastss_verified_pairs,
        dedup_fuzzy_canonical_d2,
        dedup_fuzzy_names_d2,
        deletion_variants2,
    )

    t = {"customer": table(spark, SF_DIR, "customer"),
         "documents": table(spark, SF_DIR, "documents")}
    names = spread_small_input(t["customer"]).select("c_custkey", "c_name")

    # stage 1: variant generation
    var = deletion_variants2(names, "c_custkey", "c_name")
    timed("variants (gen only)", var)
    print("n_variants:", var.count(), flush=True)

    # stage 2: candidate join + distinct (current shape)
    vh = var.select(F.xxhash64("variant").alias("vh"), F.col("entity_id").alias("k"))
    cand = (
        vh.alias("a").join(vh.alias("b"), "vh")
        .filter(F.col("a.k") < F.col("b.k"))
        .select(F.col("a.k").alias("custkey_a"), F.col("b.k").alias("custkey_b"))
    )
    print("n_candidates_raw:", cand.count(), flush=True)
    timed("candidates join+distinct (current)", cand.distinct())

    # stage 2b: group-explode shape
    groups = (
        vh.groupBy("vh").agg(F.array_sort(F.collect_set("k")).alias("ks"))
        .where(F.size("ks") > 1)
    )
    pairs_b = (
        groups.select(
            F.explode(
                F.expr(
                    "flatten(transform(ks, (x, i) -> "
                    "transform(slice(ks, i + 2, size(ks)), y -> "
                    "struct(x AS custkey_a, y AS custkey_b))))"
                )
            ).alias("p")
        )
        .select("p.*")
    )
    timed("candidates group-explode+distinct", pairs_b.distinct())

    # stage 3: full verified pairs (current)
    timed("names_d2 full (current)", dedup_fuzzy_names_d2(t))

    # stage 4: full canonical
    timed("canonical_d2 full (current)", dedup_fuzzy_canonical_d2(t))

    spark.stop()


if __name__ == "__main__":
    main()
