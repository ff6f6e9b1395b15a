"""r17 dev experiment: A/B the contracted-CC rewrite (directed edge
list, no und materialization) and a lazily-checkpointed vh for the d2
canonicalization, interleaved in one process. Not part of the bench."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def timed(label, build, n=3):
    samples = []
    for _ in range(n):
        t0 = time.time()
        build().write.format("noop").mode("overwrite").save()
        samples.append(round(time.time() - t0, 3))
    print(f"{label}: min={min(samples)} samples={samples}", flush=True)
    return min(samples)


def main() -> None:
    from pyspark.sql import functions as F

    from real_time_fraud_detection_lakehouse_spark.core.catalog import table
    from real_time_fraud_detection_lakehouse_spark.core.session import get_spark

    spark = get_spark(
        "exp-d2-cc",
        master="local[32]",
        extra_conf={
            "spark.sql.shuffle.partitions": "32",
            "spark.driver.memory": "16g",
        },
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    from real_time_fraud_detection_lakehouse_spark.operators.dedup import (
        Window,
        connected_components,
        connected_components_contracted,
        dedup_fuzzy_names_d2,
        dround,
    )

    t = {"customer": table(spark, SF_DIR, "customer")}

    def contracted_v2(edges, src, dst, **kwargs):
        e = edges.selectExpr(f"{src} AS a", f"{dst} AS b").localCheckpoint(
            eager=False
        )
        n1 = e.select(F.col("a").alias("node"), F.col("b").alias("mn"))
        n2 = e.select(F.col("b").alias("node"), F.col("a").alias("mn"))
        star = (
            n1.unionByName(n2)
            .groupBy("node")
            .agg(F.least(F.min("mn"), F.first("node")).alias("lab"))
            .localCheckpoint(eager=True)
        )
        sa = star.select(F.col("node").alias("a"), F.col("lab").alias("la"))
        sb = star.select(F.col("node").alias("b"), F.col("lab").alias("lb"))
        cedges = (
            e.join(sa, "a")
            .join(sb, "b")
            .filter(F.col("la") != F.col("lb"))
            .select(F.col("la").alias("csrc"), F.col("lb").alias("cdst"))
            .distinct()
        )
        comp = connected_components(cedges, src="csrc", dst="cdst", **kwargs)
        return star.join(
            comp.withColumnRenamed("node", "lab").withColumnRenamed(
                "component", "croot"
            ),
            "lab",
            "left",
        ).select(
            "node",
            F.coalesce("croot", "lab").alias("component"),
        )

    def canonical_d2(cc_fn):
        pairs = (
            dedup_fuzzy_names_d2(t)
            .select("custkey_a", "custkey_b")
            .localCheckpoint(eager=False)
        )
        comp = cc_fn(pairs, src="custkey_a", dst="custkey_b")
        members = comp.select(
            F.col("node").alias("c_custkey"),
            F.col("component").alias("canonical_custkey"),
        )
        sizes = members.groupBy("canonical_custkey").agg(
            F.count("*").cast("long").alias("cluster_size")
        )
        edges = (
            pairs.join(members, pairs.custkey_a == members.c_custkey)
            .groupBy("canonical_custkey")
            .agg(F.count("*").cast("long").alias("cluster_edges"))
        )
        return (
            members.join(sizes, "canonical_custkey")
            .join(edges, "canonical_custkey")
            .select(
                "c_custkey",
                "canonical_custkey",
                "cluster_size",
                "cluster_edges",
                dround(
                    2.0
                    * F.col("cluster_edges")
                    / (F.col("cluster_size") * (F.col("cluster_size") - 1))
                ).alias("edge_density"),
            )
        )

    # equality check first (cheap at sf0.01)
    t01 = {"customer": table(spark, "/root/testdata/sf0.01", "customer")}
    p01 = dedup_fuzzy_names_d2(t01).select("custkey_a", "custkey_b")
    old = {
        tuple(r)
        for r in connected_components_contracted(
            p01, src="custkey_a", dst="custkey_b"
        ).collect()
    }
    new = {
        tuple(r)
        for r in contracted_v2(p01, src="custkey_a", dst="custkey_b").collect()
    }
    print("equality at sf0.01:", old == new, len(old), flush=True)

    # interleaved A/B at sf0.1, build inside each sample
    for rnd in range(2):
        timed(
            f"canonical_d2 OLD contracted (round {rnd})",
            lambda: canonical_d2(connected_components_contracted),
            n=2,
        )
        timed(
            f"canonical_d2 NEW contracted_v2 (round {rnd})",
            lambda: canonical_d2(contracted_v2),
            n=2,
        )
    spark.stop()


if __name__ == "__main__":
    main()
