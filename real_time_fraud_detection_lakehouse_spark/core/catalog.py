"""Testdata / warehouse catalog helpers.

The driver-generated tables (TESTDATA.md) are one parquet file per
table under an sf directory. ``table`` reads one; reads are cached
per (session, path) so repeated query builds share one analyzed
relation (Spark re-resolves parquet footers cheaply, but sharing the
DataFrame keeps plans identical and lets Catalyst reuse exchange
output where possible).

Scans stay fully declarative: column pruning and predicate pushdown
reach the parquet reader via Catalyst (verify with
``df.explain('formatted')`` -> PushedFilters / ReadSchema).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

import weakref

# per-session read cache; weak keys so a stopped session's entries
# die with it (an id()-keyed dict could collide after GC reuse)
_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict[str, DataFrame]]" = (
    weakref.WeakKeyDictionary()
)


def _ensure_session_conf(spark: SparkSession) -> None:
    """Make an externally-created SparkSession safe for this engine.

    The driver harness supplies its own session; two runtime-settable
    confs are load-bearing for correctness: nanos timestamps in
    events.parquet (unreadable without the legacy flag) and the UTC
    session time zone (calendar functions must agree with the DuckDB
    oracle, which reads naive timestamps). Both are plain SQLConfs —
    settable after session creation.
    """
    for key, value in (
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        ("spark.sql.session.timeZone", "UTC"),
    ):
        try:
            if spark.conf.get(key, None) != value:
                spark.conf.set(key, value)
        except Exception:
            spark.conf.set(key, value)


def table(spark: SparkSession, sf_dir: str | None = None, name: str = "lineitem") -> DataFrame:
    """Read one testdata table as a DataFrame (cached per session+path)."""
    _ensure_session_conf(spark)
    sf_dir = sf_dir or DEFAULT_SF_DIR
    path = os.path.join(sf_dir, f"{name}.parquet")
    try:
        per_session = _CACHE.setdefault(spark, {})
    except TypeError:  # session not weak-referenceable → skip caching
        per_session = {}
    df = per_session.get(path)
    if df is None:
        from pyspark.sql import functions as F

        df = spark.read.parquet(path)
        if name == "events" and dict(df.dtypes).get("ts") == "bigint":
            # legacy testdata: events.parquet stored TIMESTAMP(NANOS);
            # Spark reads it as int64 nanos
            # (spark.sql.legacy.parquet.nanosAsLong=true in
            # DEFAULT_CONF). Truncate to micros — same as DuckDB's
            # ns→µs conversion — so both engines see identical values.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        # current testdata stores naive micros (TIMESTAMP_NTZ in Spark,
        # naive TIMESTAMP in DuckDB). Re-type as session-TZ instants —
        # the session TZ is pinned to UTC (_ensure_session_conf), so
        # the wall-clock values are preserved and epoch/calendar
        # functions (unix_micros, date_trunc, RANGE frames) behave
        # identically to the oracle, which reads the same naive values
        # under TimeZone=UTC. dtype-gated: already-LTZ columns pass
        # through untouched.
        for col, dtype in df.dtypes:
            if dtype == "timestamp_ntz":
                df = df.withColumn(col, F.col(col).cast("timestamp"))
        per_session[path] = df
    return df


def register_testdata(spark: SparkSession, sf_dir: str | None = None) -> None:
    """Register every testdata table as a temp view (SQL surface)."""
    for name in TESTDATA_TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)


def spread_small_input(df: DataFrame) -> DataFrame:
    """Round-robin a DataFrame across the cluster iff its scan has
    fewer splits than cores — the local-testdata guard for HEAVY
    per-row operators (gram explosion, signature hashing, tokenize
    pipelines), whose pre-shuffle stages otherwise run on ONE task
    because each testdata table is a single-row-group parquet file.

    Measured at sf0.1 (local[32]): 2x on docs_dup_spans; NEGATIVE on
    cheap-scan aggregates (q_pricing_summary 0.56 -> 1.03 s — the raw
    exchange costs more than one-task partial agg), which is why this
    is per-operator opt-in, not a catalog-wide rewrite. On a cluster
    against real multi-row-group inputs the condition is false and
    the plan is untouched."""
    spark = df.sparkSession
    p = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < p:
        return df.repartition(p)
    return df
