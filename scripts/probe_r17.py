"""Round-16 optimization probes: isolate + time + explain individual
heavy entries at sf0.1 with the bench's session conf (noop sink,
min-of-2, setJobDescription labels). Usage:

    python scripts/probe_r17.py <entry> [<entry> ...] [--cpus N] [--explain]

Writes explain output to plans/r17/<entry>_probe.txt when --explain.
Not part of the bench contract; a developer tool for this round.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    explain = "--explain" in sys.argv
    cpus = "16"
    for i, a in enumerate(sys.argv):
        if a == "--cpus":
            cpus = sys.argv[i + 1]
            args.remove(cpus) if cpus in args else None

    from real_time_fraud_detection_lakehouse_spark.core.session import get_spark

    spark = get_spark(
        "probe-r17",
        master=f"local[{cpus}]",
        extra_conf={
            "spark.sql.shuffle.partitions": cpus,
            "spark.driver.memory": "16g",
        },
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    from real_time_fraud_detection_lakehouse_spark.core.catalog import (
        TESTDATA_TABLES,
        table,
    )
    from real_time_fraud_detection_lakehouse_spark.operators import LLM_OPS
    from real_time_fraud_detection_lakehouse_spark.plans.dashboards import DASHBOARDS
    from real_time_fraud_detection_lakehouse_spark.plans.gold import gold_frames
    from real_time_fraud_detection_lakehouse_spark.plans.relational import RELATIONAL
    from real_time_fraud_detection_lakehouse_spark.plans.views import VIEWS

    ops = {**RELATIONAL, **LLM_OPS}
    registry = {**VIEWS, **DASHBOARDS}
    frames = {t: table(spark, SF_DIR, t) for t in TESTDATA_TABLES}
    gf = None

    for name in args:
        if name in ops:
            builder, _ = ops[name]
            build = lambda: builder(frames)
        elif name in registry:
            if gf is None:
                gf = gold_frames(spark, SF_DIR)
            builder, _ = registry[name]
            build = lambda: builder(gf)
        else:
            print(f"SKIP unknown entry {name}", file=sys.stderr)
            continue
        samples = []
        for i in range(3):
            spark.sparkContext.setJobDescription(f"probe:{name}#{i}")
            t0 = time.time()
            build().write.format("noop").mode("overwrite").save()
            samples.append(round(time.time() - t0, 3))
        print(f"{name}: samples={samples} min={min(samples)}")
        if explain:
            os.makedirs("plans/r17", exist_ok=True)
            plan = build()._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            with open(f"plans/r17/{name}_probe.txt", "w") as fh:
                fh.write(plan)
    spark.stop()


if __name__ == "__main__":
    main()
