"""Correctness AT SCALE: the oracle comparison repeated on a 10x
key-shifted replica — evidence that plans stay correct (not just
fast) when the data grows, and that the replica builder preserves
join/dedup semantics."""

from __future__ import annotations

import duckdb
import pytest

from tests.conftest import SF_SMALL, compare_frames

from real_time_fraud_detection_lakehouse_spark.core.catalog import TESTDATA_TABLES, table
from real_time_fraud_detection_lakehouse_spark.sources.replica import build_replica

QUERIES = ["q_pricing_summary", "q_top_customers", "dedup_exact"]


@pytest.fixture(scope="module")
def replica_dir(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("replica10x"))
    build_replica(spark, SF_SMALL, out, copies=10)
    return out


@pytest.mark.parametrize("name", QUERIES)
def test_oracle_holds_at_10x(name, spark, replica_dir):
    from real_time_fraud_detection_lakehouse_spark.operators import LLM_OPS
    from real_time_fraud_detection_lakehouse_spark.plans.relational import RELATIONAL

    ops = {**RELATIONAL, **LLM_OPS}
    builder, oracle = ops[name]
    frames = {t: table(spark, replica_dir, t) for t in TESTDATA_TABLES}

    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{replica_dir}/{t}.parquet/*.parquet')"
        )
    compare_frames(builder(frames), con.sql(oracle))
