"""Deterministic transactions source derived from the driver's
``events`` testdata table.

The correctness harness (TESTDATA.md) ships generic tables, not the
reference's Sparkov ``transactions`` table — so the fraud-domain
pipeline (silver features → gold star schema → analytics views) is
exercised over a *deterministic synthetic mapping* of ``events`` into
the 22-column transactions shape (`/root/reference/database/
init_postgres.sql:12-51`). The same mapping exists twice, and MUST
stay in lock-step:

- :func:`transactions_df` — the Spark DataFrame builder, and
- :data:`TRANSACTIONS_CTE` — the equivalent DuckDB SQL fragment used
  by every domain oracle query.

Cross-engine determinism rules (why this file looks pedantic):

1. Only integer arithmetic (+ * %) and IEEE-754 double + - * / on
   values both engines hold as DOUBLE. DuckDB parses bare decimal
   literals as DECIMAL and does exact decimal arithmetic, which
   rounds differently from double math — so every fractional literal
   in the SQL fragment carries ``::DOUBLE``.
2. No engine ``round()``: Spark rounds doubles through their shortest
   decimal string (HALF_UP on BigDecimal), DuckDB through a binary
   multiply — they disagree on values like 2.675. :func:`dround` /
   :func:`dround_sql` implement floor(x*10^n + 0.5)/10^n with plain
   IEEE ops, bit-identical in both engines.
3. Dates via date + integer days; epoch via microsecond integers
   (``unix_micros`` / ``epoch_us``) — both exact int64.

Fixture coverage (FIXTURES.md §1 must-include rows): zero amounts
(event_id % 101), >$1000 amounts, null coords → distance sentinel -1
(event_id % 213), distant transactions (event_id % 23 → +30° lat),
null names/gender/job for fillna, all 24 hours / weekend days via the
events timestamp spread, ~1.5%+ fraud rate biased toward high-amount
rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from real_time_fraud_detection_lakehouse_spark.core.catalog import table


def dround(col: Column, digits: int = 6) -> Column:
    """Deterministic cross-engine rounding: floor(x*10^n + 0.5)/10^n.

    Pure IEEE double ops → bit-identical in Spark and DuckDB (engine
    ``round()`` implementations disagree; see module docstring).
    """
    scale = float(10**digits)
    return F.floor(col * scale + F.lit(0.5)) / scale


def dround_sql(expr: str, digits: int = 6) -> str:
    """DuckDB twin of :func:`dround` (same floor-based formula)."""
    scale = float(10**digits)
    return f"(FLOOR(({expr}) * {scale} + 0.5) / {scale})"


def transactions_df(spark: SparkSession, sf_dir: str | None = None) -> DataFrame:
    """Build the typed transactions DataFrame from ``events``.

    One row per event; every column is a deterministic pure function
    of (event_id, user_id, ts, event_type, value). Narrow projection —
    no shuffle; at 100 TB this is scan + codegen only.
    """
    ev = table(spark, sf_dir, "events")
    e = F.col("event_id")
    u = F.col("user_id")
    val = F.col("value")

    amt_raw = dround(val * (1 + e % 4), 2)
    amt = F.when(e % 101 == 0, F.lit(0.0)).otherwise(amt_raw)
    lat = F.lit(25.0) + (u % 500) * F.lit(0.05)
    lon = F.lit(-120.0) + (u % 900) * F.lit(0.05)
    merch_lat = (
        F.when(e % 213 == 0, F.lit(None).cast("double"))
        .when(e % 23 == 0, lat + F.lit(30.0))
        .otherwise(lat + ((e % 41) - 20) * F.lit(0.1))
    )
    merch_lon = lon + ((e % 37) - 18) * F.lit(0.1)

    return ev.select(
        F.col("ts").alias("trans_timestamp"),
        (F.lit(4000000000000000) + u).alias("cc_num"),
        F.concat(F.lit("merchant_"), ((u * 7 + e) % 60).cast("string")).alias("merchant"),
        F.col("event_type").alias("category"),
        amt.alias("amt"),
        F.when(u % 19 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("First"), (u % 20).cast("string")))
        .alias("first"),
        F.when(u % 23 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("Last"), (u % 25).cast("string")))
        .alias("last"),
        F.when(u % 3 == 0, F.lit("M")).when(u % 3 == 1, F.lit("F"))
        .otherwise(F.lit(None).cast("string"))
        .alias("gender"),
        F.concat(F.lit("Street "), (u % 100).cast("string")).alias("street"),
        F.when(u % 31 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("city_"), (u % 40).cast("string")))
        .alias("city"),
        F.when(u % 31 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("ST"), (u % 15).cast("string")))
        .alias("state"),
        ((u * 37) % 89999 + 10000).cast("int").alias("zip"),
        lat.alias("lat"),
        lon.alias("long"),
        (F.lit(1000) + (u % 1000) * 7919).cast("bigint").alias("city_pop"),
        F.when(u % 29 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("job_"), (u % 30).cast("string")))
        .alias("job"),
        F.date_add(F.to_date(F.lit("1950-01-01")), ((u * 147) % 20000).cast("int")).alias("dob"),
        F.concat(F.lit("TX"), e.cast("string")).alias("trans_num"),
        F.expr("unix_micros(ts) div 1000000").alias("unix_time"),
        merch_lat.alias("merch_lat"),
        merch_lon.alias("merch_long"),
        F.when(
            (e % 137 < 2) | ((amt > 900) & (e % 5 == 0)), 1
        ).otherwise(0).cast("int").alias("is_fraud"),
    )


def _amt_sql() -> str:
    raw = dround_sql("value * (1 + event_id % 4)", 2)
    return f"CASE WHEN event_id % 101 = 0 THEN 0.0::DOUBLE ELSE {raw} END"


_LAT = "(25.0::DOUBLE + (user_id % 500) * 0.05::DOUBLE)"
_LON = "(-120.0::DOUBLE + (user_id % 900) * 0.05::DOUBLE)"

#: DuckDB CTE body equivalent to :func:`transactions_df` — keep in
#: lock-step with it (tests/test_transactions_source.py asserts
#: column-for-column equality at sf0.001).
TRANSACTIONS_CTE = f"""
SELECT
  ts AS trans_timestamp,
  4000000000000000 + user_id AS cc_num,
  'merchant_' || CAST((user_id * 7 + event_id) % 60 AS VARCHAR) AS merchant,
  event_type AS category,
  {_amt_sql()} AS amt,
  CASE WHEN user_id % 19 = 0 THEN NULL
       ELSE 'First' || CAST(user_id % 20 AS VARCHAR) END AS first,
  CASE WHEN user_id % 23 = 0 THEN NULL
       ELSE 'Last' || CAST(user_id % 25 AS VARCHAR) END AS last,
  CASE WHEN user_id % 3 = 0 THEN 'M'
       WHEN user_id % 3 = 1 THEN 'F' ELSE NULL END AS gender,
  'Street ' || CAST(user_id % 100 AS VARCHAR) AS street,
  CASE WHEN user_id % 31 = 0 THEN NULL
       ELSE 'city_' || CAST(user_id % 40 AS VARCHAR) END AS city,
  CASE WHEN user_id % 31 = 0 THEN NULL
       ELSE 'ST' || CAST(user_id % 15 AS VARCHAR) END AS state,
  CAST((user_id * 37) % 89999 + 10000 AS INTEGER) AS zip,
  {_LAT} AS lat,
  {_LON} AS long,
  CAST(1000 + (user_id % 1000) * 7919 AS BIGINT) AS city_pop,
  CASE WHEN user_id % 29 = 0 THEN NULL
       ELSE 'job_' || CAST(user_id % 30 AS VARCHAR) END AS job,
  DATE '1950-01-01' + CAST((user_id * 147) % 20000 AS INTEGER) AS dob,
  'TX' || CAST(event_id AS VARCHAR) AS trans_num,
  epoch_us(ts) // 1000000 AS unix_time,
  CASE WHEN event_id % 213 = 0 THEN NULL
       WHEN event_id % 23 = 0 THEN {_LAT} + 30.0::DOUBLE
       ELSE {_LAT} + ((event_id % 41) - 20) * 0.1::DOUBLE END AS merch_lat,
  {_LON} + ((event_id % 37) - 18) * 0.1::DOUBLE AS merch_long,
  CAST(CASE WHEN (event_id % 137 < 2)
         OR (({_amt_sql()}) > 900 AND event_id % 5 = 0)
       THEN 1 ELSE 0 END AS INTEGER) AS is_fraud
FROM events
"""
