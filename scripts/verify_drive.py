"""/verify drive: exercise the two runtime surfaces the grading driver
uses — the driver contract (entry + queries()/oracle_sql() sampled
compares vs DuckDB) and the bench CLI one-line contract. Entries to
oracle-compare are passed as argv (defaults below); rows-only entries
are executed for non-emptiness instead of compared.

    python scripts/verify_drive.py [entry ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

SF = os.environ.get("VERIFY_SF_DIR", "/root/testdata/sf0.001")

DEFAULT = [
    "daily_summary",          # domain view
    "q_top_customers",        # TPC-H join
    "dedup_ngram_jaccard",    # LLM op
]


def main() -> None:
    import duckdb

    import __spark_entry__ as em
    from conftest import compare_frames, register_duck_views
    from real_time_fraud_detection_lakehouse_spark.core.session import get_spark

    names = sys.argv[1:] or DEFAULT
    spark = get_spark("verify", master="local[8]")
    smoke = em.entry(spark).collect()
    print(f"entry() smoke: {len(smoke)} rows")
    q, o = em.queries(), em.oracle_sql()
    assert set(o) <= set(q), "oracle keys not a subset of queries"
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    register_duck_views(con, SF)
    for name in names:
        df = q[name](spark, SF)
        if name in o:
            compare_frames(df, con.sql(o[name]))
            print(f"{name}: ORACLE OK ({df.count()} rows)")
        else:
            n = df.count()
            print(f"{name}: rows-only OK ({n} rows)")
    spark.stop()
    print("verify drive: PASS")


if __name__ == "__main__":
    main()
