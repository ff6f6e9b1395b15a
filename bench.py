"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "suite_seconds", "value": N, "unit": "sec",
   "queries": {name: sec, ...}, "sf": "..."}

Each query is forced end-to-end with the noop sink (full computation,
no driver-side collect of wide rows). The suite covers the engine's
load-bearing paths: full silver feature scan, gold aggregation views,
broadcast joins, HAVING+top-k, 3-way TPC-H join, windowed velocity,
dedup, ANN brute force, text analysis.
"""

from __future__ import annotations

import json
import os
import sys
import time

from real_time_fraud_detection_lakehouse_spark.core.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

HEADLINE = [
    "silver_features",
    "gold_fact_transactions",
    "daily_summary",
    "hourly_summary",
    "state_summary",
    "merchant_analysis",
    "time_period_analysis",
    "dash_multi_factor",
    "rule_predictions",
    "q_pricing_summary",
    "q_top_customers",
    "q_regional_revenue",
    "q_user_velocity",
    "dedup_exact",
    "dedup_minhash_lsh",
    "similarity_cosine_topk",
    "text_stats",
]


def main() -> None:
    import __spark_entry__ as em

    spark = get_spark(
        "bench",
        master=f"local[{CPUS}]",
        extra_conf={"spark.sql.shuffle.partitions": str(max(int(CPUS) if CPUS != "*" else 32, 8))},
    )
    qs = em.queries()
    # warm the JVM + parquet footers so timings reflect steady state,
    # not session startup
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    qs["transactions_source"](spark, SF_DIR).write.format("noop").mode("overwrite").save()
    timings: dict[str, float] = {}
    t_suite = time.time()
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.time()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)
    total = round(time.time() - t_suite, 3)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "suite_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    sys.stdout.flush()
    spark.stop()


if __name__ == "__main__":
    main()
