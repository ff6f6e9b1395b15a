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

QUERIES = [
    "q_pricing_summary",
    "q_top_customers",
    "dedup_exact",
    # round-6 late additions: the ExactSubstr spans (exact-copy replica
    # = a 100%-dup corpus — dense output, but the oracle must still
    # agree row-for-row), the DSIR weights (bucket models shift with
    # corpus composition; both engines must shift identically), the
    # Q18 decorrelation and the single-pass quality suite
    "docs_dup_spans",
    "docs_dsir_weights",
    "q_large_volume_customers",
    "q_quality_report",
    # round-14: the depth-2 FastSS join — the replica's key shift
    # rewrites every digit of every name, so the variant-blocking
    # recall theorem is re-proven on a fresh name population at 10x
    "dedup_fuzzy_names_d2",
]


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


def test_perturbed_embedding_replica_decorrelates_copies(spark, tmp_path):
    """perturb_embeddings: within-copy cosine structure is EXACTLY
    preserved (a uniform dimension rotation commutes with the dot
    product) while each copy's vectors sit at random-pair cosine from
    their originals — a scaled corpus models new data, not planted
    duplicates."""
    import math

    out = str(tmp_path / "emb3x")
    build_replica(
        spark, SF_SMALL, out, copies=3, tables=("embeddings",), perturb_embeddings=True
    )
    base = {
        r["vec_id"]: r["embedding"]
        for r in table(spark, SF_SMALL, "embeddings").collect()
    }
    rep = {
        r["vec_id"]: r["embedding"] for r in table(spark, out, "embeddings").collect()
    }
    n, off = len(base), max(base) + 1
    assert len(rep) == 3 * n

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / math.sqrt(sum(x * x for x in a) * sum(x * x for x in b))

    ids = sorted(base)[:10]
    # cross-copy: original vs its copy-1/copy-2 twin ≈ random-pair level
    for i in ids:
        for c in (1, 2):
            assert abs(cos(base[i], rep[i + c * off])) < 0.5
    # within-copy: pairwise cosines inside copy 1 match the originals'
    for i in ids[:5]:
        for j in ids[5:]:
            assert abs(cos(rep[i + off], rep[j + off]) - cos(base[i], base[j])) < 1e-5
