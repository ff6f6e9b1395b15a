"""Local replica of the driver's CORRECTNESS gate.

Runs every ``queries()`` entry (optionally the first N, mirroring the
driver's 50-entry cap) at a chosen sf_dir; oracle entries are compared
against DuckDB with the same row-count / sorted-column / value compare
the driver uses, rows-only entries just need to run clean.

Usage:  python scripts/validate_driver.py [--sf /root/testdata/sf0.01] [--first 50] [--only name ...]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import traceback

sys.path.insert(0, ".")

import duckdb

import __spark_entry__ as entrymod
from real_time_fraud_detection_lakehouse_spark.core.session import get_spark
from tests.conftest import compare_frames, register_duck_views


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--first", type=int, default=0, help="only the first N entries (0 = all)")
    ap.add_argument("--only", nargs="*", default=None)
    args = ap.parse_args()

    spark = get_spark(
        "validate-driver",
        master="local[8]",
        extra_conf={"spark.sql.shuffle.partitions": "16"},
    )
    duck = duckdb.connect()
    duck.execute("SET TimeZone='UTC'")
    register_duck_views(duck, args.sf)

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = list(queries)
    if args.first:
        names = names[: args.first]
    if args.only:
        names = [n for n in names if n in set(args.only)]

    results: dict[str, dict] = {}
    failed = 0
    for name in names:
        t0 = time.time()
        try:
            sdf = queries[name](spark, args.sf)
            if name in oracles:
                compare_frames(sdf, duck.sql(oracles[name]))
                status = "oracle-ok"
            else:
                n_rows = sdf.count()
                status = f"rows-only-ok ({n_rows})"
            results[name] = {"ok": True, "status": status, "sec": round(time.time() - t0, 2)}
        except Exception as exc:  # noqa: BLE001 - report-all harness
            failed += 1
            results[name] = {
                "ok": False,
                "status": f"{type(exc).__name__}: {exc}",
                "sec": round(time.time() - t0, 2),
            }
            traceback.print_exc()
        print(f"{'OK ' if results[name]['ok'] else 'FAIL'} {name:<32} "
              f"{results[name]['sec']:>7.2f}s  {results[name]['status'][:120]}",
              flush=True)

    print(json.dumps({"sf": args.sf, "checked": len(names), "failed": failed}))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
