"""Dump .explain("formatted") for named entries to plans/r17/<name>_<tag>.txt.

Driver-only (no jobs for lazy builders) — used to capture before/after
plan evidence for OPTIMIZATION_r17.md. Entries whose builders run
driver actions at build time (iterative CC, publish lifecycles) are
captured via their dominant lazy sub-frame instead where noted.

Usage: python scripts/explain_r17.py <tag> <entry> [<entry> ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]

    from real_time_fraud_detection_lakehouse_spark.core.session import get_spark

    spark = get_spark(
        "explain-r17",
        master="local[4]",
        extra_conf={"spark.sql.shuffle.partitions": "32"},
    )

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
    gf = gold_frames(spark, SF_DIR)

    os.makedirs("plans/r17", exist_ok=True)
    for name in names:
        if name in ops:
            df = ops[name][0](frames)
        elif name in registry:
            df = registry[name][0](gf)
        else:
            print(f"SKIP unknown entry {name}", file=sys.stderr)
            continue
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        out = f"plans/r17/{name}_{tag}.txt"
        with open(out, "w") as fh:
            fh.write(plan)
        print(f"wrote {out}")
    spark.stop()


if __name__ == "__main__":
    main()
