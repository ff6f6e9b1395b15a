"""Shared fixtures: one local SparkSession per test run, DuckDB oracle
connection with the testdata parquet registered as views (mirrors the
driver harness described in __spark_entry__.py)."""

from __future__ import annotations

import math

import duckdb
import pytest

from real_time_fraud_detection_lakehouse_spark.core.catalog import TESTDATA_TABLES
from real_time_fraud_detection_lakehouse_spark.core.session import get_spark

SF_SMALL = "/root/testdata/sf0.001"
SF_MEDIUM = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(
        "tests",
        master="local[4]",
        extra_conf={
            "spark.sql.shuffle.partitions": "8",
            # r17: the session JVM serves the WHOLE suite (~870 tests,
            # thousands of broadcasts + the session-shared persisted
            # surfaces); the 1g default heap OOM'd at suite tail
            # (TorrentBroadcast blockify, java heap space). Local mode:
            # driver heap is the only heap.
            "spark.driver.memory": "6g",
        },
    )
    yield spark


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    yield con
    con.close()


def register_duck_views(con: duckdb.DuckDBPyConnection, sf_dir: str) -> None:
    for name in TESTDATA_TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )


def _norm(v):
    """Canonicalize a cell for cross-engine comparison."""
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if hasattr(v, "isoformat"):  # datetime/date
        return v.isoformat()
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return float(v)
    except Exception:
        pass
    return v


def compare_frames(spark_df, duck_rel, check_types: bool = True) -> None:
    """Driver-style compare: row count, column names (sorted), and
    order-insensitive exact value equality."""
    spark_cols = sorted(spark_df.columns)
    duck_cols = sorted(duck_rel.columns)
    assert spark_cols == duck_cols, f"columns differ: {spark_cols} vs {duck_cols}"
    srows = [tuple(_norm(row[c]) for c in spark_cols) for row in spark_df.collect()]
    order = [duck_rel.columns.index(c) for c in spark_cols]
    drows = [tuple(_norm(row[i]) for i in order) for row in duck_rel.fetchall()]
    assert len(srows) == len(drows), f"row count {len(srows)} vs {len(drows)}"
    srows.sort(key=repr)
    drows.sort(key=repr)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(srows, drows)) if a != b
    ]
    assert not mismatches, f"{len(mismatches)} mismatched rows; first 3: {mismatches[:3]}"
