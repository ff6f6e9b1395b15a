"""Relational operator coverage over the generic TPC-H-ish testdata.

One query per operator family from SURVEY.md §2 that isn't already
exercised by the fraud-domain surface: multi-way equi-joins with
broadcast dims (J1–J5), conditional/grouped aggregation (A1-family),
HAVING + top-k (A8/O1), union (U1), distinct (A16), exact median
(A13's deterministic variant), JSON extraction (P1/P2), epoch
conversions (F1/F6), range predicates (P7), and the idiomatic
windowed velocity feature the reference lacks (SURVEY §2.6 note).

Registry shape matches plans.views: name → (builder(frames), oracle
SELECT). Builders receive a dict of the raw testdata DataFrames.
Every oracle SELECT is self-contained DuckDB SQL over the driver's
pre-registered table views.

Scale notes are per-query in docstrings/comments; the common themes:
dim joins stay broadcast-shaped so fact-side scans never shuffle for
the join; aggregates rely on map-side partial aggregation; top-k uses
TakeOrderedAndProject (no global sort).

Broadcast-hint policy (round 9): an explicit ``F.broadcast`` hint is
a scale-invariance claim, so it is reserved for frames whose
cardinality does NOT grow with the scale factor — nation (25 rows),
region (5), and 1-row/bounded aggregates (crossJoin scalars). Tables
that scale with sf (customer 150k×sf, supplier 10k×sf, part 200k×sf,
and any frame filtered/aggregated from them) are left UNHINTED: the
static planner broadcasts them from parquet size statistics while
they fit ``spark.sql.autoBroadcastJoinThreshold``, and AQE re-plans
from observed sizes past that, so a 100× scale-up degrades to a
shuffle join instead of a driver OOM. Plan tests accordingly assert
"no nested-loop/cartesian" + pushdown rather than pinning a forced
hint.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from real_time_fraud_detection_lakehouse_spark.sources.transactions import dround, dround_sql

Frames = dict[str, DataFrame]
RELATIONAL: dict[str, tuple[Callable[[Frames], DataFrame], str]] = {}


def _register(name: str, sql: str):
    def deco(fn):
        RELATIONAL[name] = (fn, sql)
        return fn

    return deco


def _r4(col):
    return dround(col, 4)


def _r4s(expr):
    return dround_sql(expr, 4)


# --- TPC-H Q1 shape: scan + filter + grouped conditional agg ----------------
@_register(
    "q_pricing_summary",
    f"""
    SELECT
      l_returnflag,
      l_linestatus,
      {_r4s('SUM(l_quantity)')} AS sum_qty,
      -- price sums reach ~1e9 per group (6 groups over all lineitem)
      -- at sf0.1: double summation-order noise sits within ~3x of a
      -- 4-decimal quantum, so round the big money sums at 2 decimals
      -- (the TPC-H print convention) — same drift class the sf0.1
      -- sweep caught on q_shuffled_hash_join
      {dround_sql('SUM(l_extendedprice)', 2)} AS sum_base_price,
      {dround_sql('SUM(l_extendedprice * (1 - l_discount))', 2)} AS sum_disc_price,
      {dround_sql('SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax))', 2)} AS sum_charge,
      {_r4s('AVG(l_quantity)')} AS avg_qty,
      {_r4s('AVG(l_extendedprice)')} AS avg_price,
      {_r4s('AVG(l_discount)')} AS avg_disc,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-08-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_pricing_summary(t: Frames) -> DataFrame:
    l = t["lineitem"].filter(F.col("l_shipdate") <= F.lit("2001-08-02 00:00:00").cast("timestamp"))
    price = F.col("l_extendedprice")
    disc = F.col("l_discount")
    return l.groupBy("l_returnflag", "l_linestatus").agg(
        _r4(F.sum("l_quantity")).alias("sum_qty"),
        dround(F.sum(price), 2).alias("sum_base_price"),
        dround(F.sum(price * (1 - disc)), 2).alias("sum_disc_price"),
        dround(F.sum(price * (1 - disc) * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
        _r4(F.avg("l_quantity")).alias("avg_qty"),
        _r4(F.avg(price)).alias("avg_price"),
        _r4(F.avg(disc)).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


# --- 3-way join + group + top-k (customer ⋈ orders ⋈ lineitem) --------------
@_register(
    "q_top_customers",
    f"""
    SELECT * FROM (
      SELECT c.c_custkey, c.c_name,
             {_r4s('SUM(l.l_extendedprice * (1 - l.l_discount))')} AS revenue,
             COUNT(*) AS line_count
      FROM customer c
      JOIN orders o ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      GROUP BY c.c_custkey, c.c_name
    ) ORDER BY revenue DESC, c_custkey ASC LIMIT 10
    """,
)
def q_top_customers(t: Frames) -> DataFrame:
    # customer is the small side → broadcast; orders⋈lineitem shuffles
    # on orderkey (co-partitioned by AQE).
    j = (
        t["lineitem"]
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t["customer"], F.col("c_custkey") == F.col("o_custkey"))
    )
    return (
        j.groupBy("c_custkey", "c_name")
        .agg(
            _r4(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"),
            F.count("*").alias("line_count"),
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(10)
    )


# --- 5-way join through region/nation (TPC-H Q5 shape) ----------------------
@_register(
    "q_regional_revenue",
    f"""
    SELECT r.r_name AS region,
           n.n_name AS nation,
           {_r4s('SUM(l.l_extendedprice * (1 - l.l_discount))')} AS revenue,
           COUNT(*) AS line_count
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY r.r_name, n.n_name
    """,
)
def q_regional_revenue(t: Frames) -> DataFrame:
    j = (
        t["lineitem"]
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t["customer"], F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(t["nation"]), F.col("n_nationkey") == F.col("c_nationkey"))
        .join(F.broadcast(t["region"]), F.col("r_regionkey") == F.col("n_regionkey"))
    )
    return j.groupBy(
        F.col("r_name").alias("region"), F.col("n_name").alias("nation")
    ).agg(
        _r4(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"),
        F.count("*").alias("line_count"),
    )


# --- range predicate + grouped count (P7) -----------------------------------
@_register(
    "q_order_priority",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-03-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1996-06-01 00:00:00'
    GROUP BY o_orderpriority
    """,
)
def q_order_priority(t: Frames) -> DataFrame:
    return (
        t["orders"]
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-03-01 00:00:00").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1996-06-01 00:00:00").cast("timestamp"))
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


# --- union (U1) + grouped count ---------------------------------------------
@_register(
    "q_union_rebalance",
    """
    SELECT part_class, COUNT(*) AS n FROM (
      SELECT 'large' AS part_class, p_partkey FROM part WHERE p_size >= 40
      UNION ALL
      SELECT 'pricey' AS part_class, p_partkey FROM part WHERE p_retailprice > 1500
    ) GROUP BY part_class
    """,
)
def q_union_rebalance(t: Frames) -> DataFrame:
    p = t["part"]
    a = p.filter(F.col("p_size") >= 40).select(F.lit("large").alias("part_class"), "p_partkey")
    b = p.filter(F.col("p_retailprice") > 1500).select(
        F.lit("pricey").alias("part_class"), "p_partkey"
    )
    return a.union(b).groupBy("part_class").agg(F.count("*").alias("n"))


# --- distinct projection (A16 analog) ---------------------------------------
@_register(
    "q_distinct_pairs",
    """
    SELECT COUNT(*) AS distinct_pairs FROM (
      SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
    )
    """,
)
def q_distinct_pairs(t: Frames) -> DataFrame:
    return (
        t["lineitem"]
        .select("l_partkey", "l_suppkey")
        .dropDuplicates(["l_partkey", "l_suppkey"])
        .agg(F.count("*").alias("distinct_pairs"))
    )


# --- exact median (deterministic A13 variant) -------------------------------
@_register(
    "q_median_quantity",
    """
    SELECT l_returnflag, median(l_quantity) AS median_qty, COUNT(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_median_quantity(t: Frames) -> DataFrame:
    # Exact median (Spark 3.4+ `median` aggregate); the reference's
    # approxQuantile imputation path (ml_training_job.py:94-104) is
    # exercised tolerance-based in tests/test_ml.py since
    # Greenwald-Khanna sketches aren't cross-engine comparable.
    return t["lineitem"].groupBy("l_returnflag").agg(
        F.median("l_quantity").alias("median_qty"), F.count("*").alias("n")
    )


# --- JSON field extraction (P1/P2) ------------------------------------------
_K = "CAST(json_extract_string(props, '$.k') AS INTEGER)"


@_register(
    "q_events_json",
    f"""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM({_K}) AS BIGINT) AS sum_k,
           {_r4s(f'AVG({_K})')} AS avg_k
    FROM events GROUP BY event_type
    """,
)
def q_events_json(t: Frames) -> DataFrame:
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return t["events"].groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(k).cast("long").alias("sum_k"),
        _r4(F.avg(k)).alias("avg_k"),
    )


# --- epoch conversions (F1/F6): µs → timestamp → seconds round-trip ---------
@_register(
    "q_epoch_roundtrip",
    """
    SELECT event_id,
           make_timestamp(epoch_us(ts)) AS ts_roundtrip,
           epoch_us(ts) // 1000000 AS unix_seconds,
           DATE '1970-01-01' + CAST(event_id % 20000 AS INTEGER) AS epoch_day_date
    FROM events WHERE event_id % 97 = 0
    """,
)
def q_epoch_roundtrip(t: Frames) -> DataFrame:
    return t["events"].filter(F.col("event_id") % 97 == 0).select(
        "event_id",
        F.timestamp_micros(F.expr("unix_micros(ts)")).alias("ts_roundtrip"),
        F.expr("unix_micros(ts) div 1000000").alias("unix_seconds"),
        F.date_add(F.to_date(F.lit("1970-01-01")), (F.col("event_id") % 20000).cast("int")).alias(
            "epoch_day_date"
        ),
    )


# --- windowed velocity features (idiomatic extension, SURVEY §2.6) ----------
@_register(
    "q_user_velocity",
    f"""
    SELECT * FROM (
      SELECT user_id,
             event_id,
             COUNT(*) OVER w AS events_last_hour,
             {_r4s('SUM(value) OVER w')} AS value_last_hour
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts) // 1000000
                   RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
    ) WHERE event_id % 17 = 0
    """,
)
def q_user_velocity(t: Frames) -> DataFrame:
    # RANGE frame keyed on epoch seconds: deterministic under ties
    # (frame membership is value-based, not row-order-based). This is
    # the per-card velocity feature the reference lacks (SURVEY §2.6);
    # at scale it is one shuffle on user_id, then a sorted range scan
    # per partition.
    ev = t["events"].withColumn("_sec", F.expr("unix_micros(ts) div 1000000"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("_sec")
        .rangeBetween(-3600, Window.currentRow)
    )
    return (
        ev.select(
            "user_id",
            "event_id",
            F.count("*").over(w).alias("events_last_hour"),
            _r4(F.sum("value").over(w)).alias("value_last_hour"),
        )
        .filter(F.col("event_id") % 17 == 0)
    )


# --- anti/semi joins (free in Spark; exercised for completeness) ------------
@_register(
    "q_customers_without_orders",
    """
    SELECT COUNT(*) AS n FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def q_customers_without_orders(t: Frames) -> DataFrame:
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .agg(F.count("*").alias("n"))
    )


@_register(
    "q_parts_ordered",
    """
    SELECT COUNT(*) AS n FROM part p
    WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey)
    """,
)
def q_parts_ordered(t: Frames) -> DataFrame:
    return (
        t["part"]
        .join(t["lineitem"], F.col("p_partkey") == F.col("l_partkey"), "left_semi")
        .agg(F.count("*").alias("n"))
    )


# --- highly selective filter agg (TPC-H Q6 shape; pushdown showcase) --------
@_register(
    "q_selective_revenue",
    f"""
    SELECT {_r4s('SUM(l_extendedprice * l_discount)')} AS revenue,
           COUNT(*) AS matched
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-02-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1996-05-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def q_selective_revenue(t: Frames) -> DataFrame:
    l = t["lineitem"]
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-02-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-05-01 00:00:00").cast("timestamp"))
            & F.col("l_discount").between(0.03, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            _r4(F.sum(F.col("l_extendedprice") * F.col("l_discount"))).alias("revenue"),
            F.count("*").alias("matched"),
        )
    )


# --- CUBE rollup (generalizes the reference's multi-factor grouping A10) ----
@_register(
    "q_cube_returnflag_status",
    f"""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n, {_r4s('SUM(l_quantity)')} AS qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def q_cube_returnflag_status(t: Frames) -> DataFrame:
    return (
        t["lineitem"]
        .cube("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"), _r4(F.sum("l_quantity")).alias("qty"))
    )


# --- join + conditional-share agg (TPC-H Q14 shape) -------------------------
_TYPED_REV = (
    "SUM(CASE WHEN p.p_type LIKE '%a%' "
    "THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END)"
)


@_register(
    "q_brand_revenue_share",
    f"""
    SELECT p.p_brand,
           {_r4s(_TYPED_REV)} AS typed_revenue,
           {_r4s('SUM(l.l_extendedprice * (1 - l.l_discount))')} AS total_revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    GROUP BY p.p_brand
    """,
)
def q_brand_revenue_share(t: Frames) -> DataFrame:
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    j = t["lineitem"].join(t["part"], F.col("p_partkey") == F.col("l_partkey"))
    return j.groupBy("p_brand").agg(
        _r4(F.sum(F.when(F.col("p_type").contains("a"), rev).otherwise(0.0))).alias(
            "typed_revenue"
        ),
        _r4(F.sum(rev)).alias("total_revenue"),
    )


# --- sessionization (gap > 30 min starts a new session) ---------------------
@_register(
    "q_user_sessions",
    """
    WITH ordered AS (
      SELECT user_id, event_id, epoch_us(ts) // 1000000 AS sec,
             lag(epoch_us(ts) // 1000000) OVER (PARTITION BY user_id ORDER BY epoch_us(ts) // 1000000, event_id) AS prev_sec
      FROM events
    ),
    flagged AS (
      SELECT *, CASE WHEN prev_sec IS NULL OR sec - prev_sec > 1800 THEN 1 ELSE 0 END AS new_session
      FROM ordered
    ),
    sessions AS (
      SELECT user_id,
             CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY sec, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      FROM flagged
    )
    SELECT user_id, session_id, COUNT(*) AS events_in_session
    FROM sessions GROUP BY user_id, session_id
    """,
)
def q_user_sessions(t: Frames) -> DataFrame:
    # classic gap sessionization: lag → new-session flag → running sum
    # as session id → per-session aggregate. Orders on (sec, event_id)
    # so ties are deterministic. One shuffle on user_id.
    ev = t["events"].withColumn("sec", F.expr("unix_micros(ts) div 1000000"))
    w = Window.partitionBy("user_id").orderBy("sec", "event_id")
    flagged = ev.select(
        "user_id",
        "event_id",
        "sec",
        F.when(
            F.lag("sec").over(w).isNull() | ((F.col("sec") - F.lag("sec").over(w)) > 1800),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    sessions = flagged.select(
        "user_id",
        F.sum("new_session")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long")
        .alias("session_id"),
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.count("*").alias("events_in_session")
    )


# --- tumbling event-time window aggregate (batch twin of the streaming agg) -
@_register(
    "q_events_hourly_window",
    f"""
    SELECT date_trunc('hour', ts) AS window_start,
           event_type,
           COUNT(*) AS n,
           {_r4s('SUM(value)')} AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def q_events_hourly_window(t: Frames) -> DataFrame:
    return (
        t["events"]
        .groupBy(
            F.date_trunc("hour", F.col("ts")).alias("window_start"),
            "event_type",
        )
        .agg(F.count("*").alias("n"), _r4(F.sum("value")).alias("total_value"))
    )


# --- exact distinct counting (oracle) + HLL sketch (rows-only twin) ---------
@_register(
    "q_distinct_users",
    """
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS distinct_users,
           COUNT(*) AS events
    FROM events GROUP BY event_type
    """,
)
def q_distinct_users(t: Frames) -> DataFrame:
    return t["events"].groupBy("event_type").agg(
        F.countDistinct("user_id").alias("distinct_users"),
        F.count("*").alias("events"),
    )


@_register("q_distinct_users_approx", None)
def q_distinct_users_approx(t: Frames) -> DataFrame:
    """HLL-sketch variant (approx_count_distinct, rsd 1%) — the scale
    path when exact distinct's shuffle is too wide; accuracy vs the
    exact count is asserted in tests/test_relational.py."""
    return t["events"].groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.01).alias("approx_distinct_users"),
        F.count("*").alias("events"),
    )


#: Datasketches HLL precision (lgConfigK). 12 → 4 Ki registers,
#: ~1.6% relative standard error — a few KiB per stored sketch.
HLL_LGK = 12


@_register("q_distinct_users_hll_rollup", None)
def q_distinct_users_hll_rollup(t: Frames) -> DataFrame:
    """MERGEABLE distinct-count rollup — the pre-aggregation cube
    pattern ``approx_count_distinct`` can't express: materialize one
    Datasketches HLL sketch per (event_type, day) partition
    (``hll_sketch_agg``), then answer the per-type total by UNIONING
    the daily sketches (``hll_union_agg``) instead of re-scanning raw
    events. Output per event_type: the rollup estimate, the number of
    daily sketches merged, and total event rows.

    Scale design: this is how 100 TB distinct-count dashboards
    actually work — the nightly job appends a few-KiB sketch per
    partition (here: a day) to a sketch table; any later rollup
    (week, month, all-time, any type subset) is a merge over KiB-size
    sketches, never a rescan of the raw table. Both aggs are
    map-side-partial groupBys; the merge input is O(days x types)
    rows whatever the event volume. Union of same-lgK sketches is
    LOSSLESS: the rollup estimate is bit-identical to sketching the
    raw column in one pass — pinned in pytest (rollup == direct,
    plus |estimate - exact| within the configured error band).

    Rows-only entry: DuckDB has no Datasketches HLL surface, and the
    estimate depends on the exact register hashes. Determinism is
    order-insensitive (registers keep maxima), so driver rows are
    stable run to run."""
    daily = (
        t["events"]
        .groupBy(F.to_date("ts").alias("day"), "event_type")
        .agg(
            F.hll_sketch_agg("user_id", F.lit(HLL_LGK)).alias("sketch"),
            F.count("*").alias("events"),
        )
    )
    return daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch", F.lit(False)))
        .alias("rollup_distinct_users"),
        F.count("*").cast("long").alias("n_daily_sketches"),
        F.sum("events").cast("long").alias("events"),
    )


@_register(
    "q_user_overlap_exact",
    """
    WITH tu AS (SELECT DISTINCT event_type, user_id FROM events)
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           CAST(COUNT(*) AS BIGINT) AS users_both
    FROM tu a JOIN tu b
      ON a.user_id = b.user_id AND a.event_type < b.event_type
    GROUP BY a.event_type, b.event_type
    """,
)
def q_user_overlap_exact(t: Frames) -> DataFrame:
    """Exact audience-overlap anchor for the HLL twin below: distinct
    (type, user) pairs self-joined on user, one count per type pair.

    Scale class (why the sketch twin exists): the distinct projection
    and the self-join both shuffle on user_id — corpus-sized — and the
    join fans out (types-per-user choose 2) rows per user; every new
    pair question re-pays that scan+shuffle. Keyed and bounded (never
    all-pairs over users), so it is an honest exact path, but at
    100 TB the sketch twin answers ALL pairs from one scan's few-KiB
    sketches. Oracled exactly; the sketch op's band test measures
    against this anchor."""
    tu = t["events"].select("event_type", "user_id").distinct()
    a = tu.select(F.col("event_type").alias("type_a"), "user_id")
    b = tu.select(F.col("event_type").alias("type_b"), "user_id")
    return (
        a.join(b, ["user_id"])
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count("*").cast("long").alias("users_both"))
    )


@_register("q_user_overlap_hll", None)
def q_user_overlap_hll(t: Frames) -> DataFrame:
    """Audience-overlap matrix from SKETCHES: for every event-type
    pair, estimate how many users did BOTH — via inclusion-exclusion
    over HLL sketches (|A∩B| ≈ |A| + |B| - |A∪B|, with the pairwise
    union from the binary ``hll_union``). The question exact SQL
    answers with a self-join + COUNT(DISTINCT) over the raw table —
    per pair; this plan answers ALL pairs from one sketch per type.

    Scale design: one corpus scan builds |types| sketches (map-side
    partial agg); the pair matrix is a |types|² self-join over
    few-KiB sketch rows — at 100 TB the raw table is touched ONCE
    however many pairs the dashboard asks for, and the same persisted
    sketches (see the rollup op) answer overlap, union, and distinct
    questions without rescans. Inclusion-exclusion inherits ~3x the
    single-sketch error (three estimates), so the pytest contract is
    a wider band (union-scaled) vs the exact per-pair intersection —
    the standard sketch-overlap tradeoff, documented rather than
    hidden.

    Rows-only: DuckDB has no Datasketches surface; estimates are
    deterministic (register maxima), so driver rows are stable."""
    per_type = (
        t["events"]
        .groupBy("event_type")
        .agg(F.hll_sketch_agg("user_id", F.lit(HLL_LGK)).alias("sk"))
    )
    a = per_type.select(
        F.col("event_type").alias("type_a"), F.col("sk").alias("sk_a")
    )
    b = per_type.select(
        F.col("event_type").alias("type_b"), F.col("sk").alias("sk_b")
    )
    est_a = F.hll_sketch_estimate("sk_a")
    est_b = F.hll_sketch_estimate("sk_b")
    est_union = F.hll_sketch_estimate(F.hll_union("sk_a", "sk_b"))
    return (
        a.join(b, F.col("type_a") < F.col("type_b"))
        .select(
            "type_a",
            "type_b",
            est_a.alias("users_a"),
            est_b.alias("users_b"),
            est_union.alias("users_either"),
            F.greatest(F.lit(0), est_a + est_b - est_union).alias("users_both_est"),
        )
    )


# --- interpolated quantiles per group (A13 family, exact) -------------------
@_register(
    "q_quantity_quantiles",
    f"""
    SELECT l_linestatus,
           {_r4s('quantile_cont(l_quantity, 0.25)')} AS q25,
           {_r4s('quantile_cont(l_quantity, 0.50)')} AS q50,
           {_r4s('quantile_cont(l_quantity, 0.75)')} AS q75
    FROM lineitem GROUP BY l_linestatus
    """,
)
def q_quantity_quantiles(t: Frames) -> DataFrame:
    # Spark `percentile` = exact interpolated quantile ≡ DuckDB
    # quantile_cont (both linear interpolation on the sorted set)
    return t["lineitem"].groupBy("l_linestatus").agg(
        _r4(F.percentile("l_quantity", 0.25)).alias("q25"),
        _r4(F.percentile("l_quantity", 0.50)).alias("q50"),
        _r4(F.percentile("l_quantity", 0.75)).alias("q75"),
    )


# --- left join with null handling (J5 left variant) -------------------------
@_register(
    "q_supplier_order_volume",
    f"""
    SELECT s.s_suppkey, s.s_name,
           CAST(COUNT(l.l_orderkey) AS BIGINT) AS lines,
           {_r4s('COALESCE(SUM(l.l_quantity), 0.0)')} AS total_qty
    FROM supplier s
    LEFT JOIN lineitem l ON l.l_suppkey = s.s_suppkey
    GROUP BY s.s_suppkey, s.s_name
    """,
)
def q_supplier_order_volume(t: Frames) -> DataFrame:
    return (
        t["supplier"]
        .join(t["lineitem"], F.col("l_suppkey") == F.col("s_suppkey"), "left")
        .groupBy("s_suppkey", "s_name")
        .agg(
            F.count("l_orderkey").alias("lines"),
            _r4(F.coalesce(F.sum("l_quantity"), F.lit(0.0))).alias("total_qty"),
        )
    )


# --- as-of join (point-in-time join, SURVEY custom-operator family) ---------
@_register(
    "q_asof_click_purchase",
    """
    WITH clicks AS (
      SELECT user_id, ts, MAX(event_id) AS click_event_id
      FROM events WHERE event_type = 'click' GROUP BY 1, 2
    ),
    purchases AS (
      SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
    )
    SELECT p.event_id AS purchase_id, p.user_id,
           p.ts AS purchase_ts, c.ts AS last_click_ts,
           CAST(date_diff('second', c.ts, p.ts) AS BIGINT) AS secs_since_click,
           p.value AS purchase_value
    FROM purchases p ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND c.ts <= p.ts
    """,
)
def q_asof_click_purchase(t: Frames) -> DataFrame:
    """As-of (point-in-time) join: each purchase matched to that
    user's latest click at-or-before the purchase. Spark has no ASOF
    JOIN operator, so this is the idiomatic re-expression: union both
    sides tagged, one shuffle on user_id, and a running
    last(click_ts, ignorenulls) window — O(n log n) per user instead
    of the naive ts-inequality join's per-user cross product. Clicks
    are pre-deduped to one row per (user_id, ts) so equal-timestamp
    ties are deterministic in both engines (DuckDB ASOF takes the
    greatest ts <= purchase ts; clicks sort before purchases at equal
    ts here, matching the inclusive bound). Oracle: DuckDB's native
    ASOF LEFT JOIN."""
    ev = t["events"]
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_event_id"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    c_tag = clicks.select(
        "user_id",
        "ts",
        F.lit(0).alias("kind"),
        F.lit(None).cast("long").alias("event_id"),
        F.lit(None).cast("double").alias("value"),
    )
    p_tag = purchases.select("user_id", "ts", F.lit(1).alias("kind"), "event_id", "value")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("kind").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    last_click = F.last(F.when(F.col("kind") == 0, F.col("ts")), ignorenulls=True).over(w)
    return (
        c_tag.unionByName(p_tag)
        .withColumn("last_click_ts", last_click)
        .filter(F.col("kind") == 1)
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("purchase_ts"),
            "last_click_ts",
            (F.unix_timestamp("ts") - F.unix_timestamp("last_click_ts"))
            .cast("long")
            .alias("secs_since_click"),
            F.col("value").alias("purchase_value"),
        )
    )


# --- explicit GROUPING SETS (the cube/rollup generalization) ----------------
@_register(
    "q_grouping_sets_priority",
    """
    SELECT o_orderpriority, o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN o_totalprice > 100000 THEN 1 ELSE 0 END) AS BIGINT)
             AS big_orders
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus), (o_orderpriority), ())
    """,
)
def q_grouping_sets_priority(t: Frames) -> DataFrame:
    """Explicit GROUPING SETS via Spark 4's DataFrame.groupingSets —
    one pass computes the detail level, the per-priority subtotals and
    the grand total (vs three scans + union). Physically one Expand +
    hash aggregate: partial aggregation still collapses rows map-side,
    so shuffle volume is O(groups × sets), not O(rows)."""
    return (
        t["orders"]
        .groupingSets(
            [["o_orderpriority", "o_orderstatus"], ["o_orderpriority"], []],
            "o_orderpriority",
            "o_orderstatus",
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.when(F.col("o_totalprice") > 100000, 1).otherwise(0))
            .cast("long")
            .alias("big_orders"),
        )
    )


# --- lag/lead/ntile window family (§2.6 breadth) ----------------------------
@_register(
    "q_customer_order_gaps",
    """
    WITH seq AS (
      SELECT o_custkey, o_orderkey, o_orderdate,
             lag(o_orderdate) OVER w AS prev_date,
             lead(o_orderdate) OVER w AS next_date,
             CAST(ntile(4) OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER)
               AS price_quartile
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    )
    SELECT o_custkey, o_orderkey, o_orderdate, prev_date, next_date,
           CAST(date_diff('day', prev_date, o_orderdate) AS BIGINT) AS days_since_prev,
           price_quartile
    FROM seq
    """,
)
def q_customer_order_gaps(t: Frames) -> DataFrame:
    """lag/lead/ntile over per-customer order history — one shuffle on
    o_custkey shared by all three window functions (same partition
    key), sort reused. Tie-breaks on o_orderkey make every window
    deterministic cross-engine."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wq = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    prev_d = F.lag("o_orderdate").over(w)
    return t["orders"].select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        prev_d.alias("prev_date"),
        F.lead("o_orderdate").over(w).alias("next_date"),
        F.datediff(F.col("o_orderdate"), prev_d).cast("long").alias("days_since_prev"),
        F.ntile(4).over(wq).alias("price_quartile"),
    )


# --- pivot (wide conditional aggregation) -----------------------------------
_ORDER_STATUSES = ["F", "O", "P"]


@_register(
    "q_pivot_status_by_priority",
    f"""
    SELECT o_orderpriority,
           {", ".join(f'''CAST(SUM(CASE WHEN o_orderstatus = '{s}' THEN 1 ELSE 0 END) AS BIGINT) AS status_{s}''' for s in _ORDER_STATUSES)},
           {_r4s('SUM(o_totalprice)')} AS total_price
    FROM orders GROUP BY o_orderpriority
    """,
)
def q_pivot_status_by_priority(t: Frames) -> DataFrame:
    """`groupBy().pivot(values=...).count()` with the value list given
    explicitly — skipping the distinct-scan pivot inference pass AND
    keeping the output schema static (a 100 TB job can't let data
    content decide its schema). Compiles to one pass of conditional
    aggregation, same as the SQL twin."""
    piv = (
        t["orders"]
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", _ORDER_STATUSES)
        .count()
    )
    renamed = piv.select(
        "o_orderpriority",
        *[F.coalesce(F.col(s), F.lit(0)).cast("long").alias(f"status_{s}") for s in _ORDER_STATUSES],
    )
    totals = t["orders"].groupBy("o_orderpriority").agg(
        _r4(F.sum("o_totalprice")).alias("total_price")
    )
    return renamed.join(totals, "o_orderpriority")


# --- distribution of counts (TPC-H Q13 shape: left join → histogram) --------
@_register(
    "q_order_count_distribution",
    """
    WITH per_customer AS (
      SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey
    )
    SELECT n_orders, CAST(COUNT(*) AS BIGINT) AS customers
    FROM per_customer GROUP BY n_orders
    """,
)
def q_order_count_distribution(t: Frames) -> DataFrame:
    """Two-level aggregation (count per key, then distribution of the
    counts — TPC-H Q13): the left join keeps zero-order customers in
    the histogram. First agg shuffles on custkey (partial agg
    map-side), second on the tiny n_orders domain."""
    per_customer = (
        t["customer"]
        .join(t["orders"], F.col("o_custkey") == F.col("c_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_customer.groupBy("n_orders").agg(
        F.count("*").alias("customers")
    )


# --- width_bucket histogram -------------------------------------------------
@_register(
    "q_price_histogram",
    """
    SELECT CAST(CASE WHEN o_totalprice < 0 THEN 0
                     WHEN o_totalprice >= 400000 THEN 21
                     ELSE CAST(FLOOR(o_totalprice / 20000) AS INTEGER) + 1
                END AS INTEGER) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(o_totalprice) AS DOUBLE) AS lo,
           CAST(MAX(o_totalprice) AS DOUBLE) AS hi
    FROM orders GROUP BY 1
    """,
)
def q_price_histogram(t: Frames) -> DataFrame:
    """Fixed-bin histogram via width_bucket — the single-pass scalable
    histogram (each row maps to a bucket id in the scan projection;
    one partial-agg shuffle over ≤22 groups). DuckDB has no
    width_bucket, so the oracle spells out the same SQL-standard
    semantics arithmetically (out-of-range → 0 / nbuckets+1; bucket i
    covers [lo+(i-1)·w, lo+i·w))."""
    return (
        t["orders"]
        .groupBy(
            F.width_bucket("o_totalprice", F.lit(0), F.lit(400000), F.lit(20))
            .cast("int")
            .alias("bucket")
        )
        .agg(
            F.count("*").alias("n"),
            F.min("o_totalprice").cast("double").alias("lo"),
            F.max("o_totalprice").cast("double").alias("hi"),
        )
    )


# --- set operations (INTERSECT / EXCEPT) ------------------------------------
@_register(
    "q_repeat_engagers",
    """
    SELECT user_id, CAST(ts AS DATE) AS d FROM events WHERE event_type = 'click'
    INTERSECT
    SELECT user_id, CAST(ts AS DATE) AS d FROM events WHERE event_type = 'purchase'
    """,
)
def q_repeat_engagers(t: Frames) -> DataFrame:
    """INTERSECT (distinct set semantics): (user, day) pairs with both
    a click and a purchase. Compiles to a left-semi hash join over the
    two deduped sides — one shuffle each on the pair key."""
    ev = t["events"]
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.to_date("ts").alias("d")
    )
    buys = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.to_date("ts").alias("d")
    )
    return clicks.intersect(buys)


@_register(
    "q_clickers_not_purchasers",
    """
    SELECT user_id, CAST(ts AS DATE) AS d FROM events WHERE event_type = 'click'
    EXCEPT
    SELECT user_id, CAST(ts AS DATE) AS d FROM events WHERE event_type = 'purchase'
    """,
)
def q_clickers_not_purchasers(t: Frames) -> DataFrame:
    """EXCEPT (distinct set semantics): (user, day) pairs that clicked
    but did not purchase that day — the funnel-drop-off set.
    ``subtract`` is Spark's EXCEPT DISTINCT: a left-anti hash join
    over deduped sides (exceptAll would keep left-side duplicate
    multiplicity — wrong for set semantics)."""
    ev = t["events"]
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.to_date("ts").alias("d")
    )
    buys = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.to_date("ts").alias("d")
    )
    return clicks.subtract(buys)


# --- unpivot / melt ---------------------------------------------------------
_MELT_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


@_register(
    "q_unpivot_lineitem_stats",
    f"""
    WITH melted AS (
      {" UNION ALL ".join(f"SELECT l_linestatus, '{c}' AS measure, CAST({c} AS DOUBLE) AS value FROM lineitem" for c in _MELT_COLS)}
    )
    SELECT l_linestatus, measure,
           CAST(COUNT(*) AS BIGINT) AS n,
           {_r4s('AVG(value)')} AS avg_value,
           {_r4s('MAX(value)')} AS max_value
    FROM melted GROUP BY l_linestatus, measure
    """,
)
def q_unpivot_lineitem_stats(t: Frames) -> DataFrame:
    """Wide→long reshape via the native unpivot operator (Spark 3.4
    ``DataFrame.unpivot``), then per-measure stats. unpivot is a
    zero-shuffle row expansion (like Expand), so the only shuffle is
    the final small-domain aggregation; the oracle spells the reshape
    as UNION ALL, the standard SQL equivalent."""
    melted = t["lineitem"].unpivot(
        ids=["l_linestatus"],
        values=_MELT_COLS,
        variableColumnName="measure",
        valueColumnName="value",
    )
    return (
        melted.withColumn("value", F.col("value").cast("double"))
        .groupBy("l_linestatus", "measure")
        .agg(
            F.count("*").alias("n"),
            _r4(F.avg("value")).alias("avg_value"),
            _r4(F.max("value")).alias("max_value"),
        )
    )


# --- bucketed interval (range) join (SURVEY custom-operator family) ---------
_RANGE_W_US = 30 * 60 * 1_000_000  # 30-minute window, µs


@_register(
    "q_range_join_clicks",
    f"""
    WITH purchases AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ),
    clicks AS (
      SELECT user_id, ts FROM events WHERE event_type = 'click'
    )
    SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
           CAST(COUNT(c.ts) AS BIGINT) AS clicks_30m
    FROM purchases p LEFT JOIN clicks c
      ON c.user_id = p.user_id
     AND epoch_us(c.ts) >= epoch_us(p.ts) - {_RANGE_W_US}
     AND epoch_us(c.ts) < epoch_us(p.ts)
    GROUP BY 1, 2, 3
    """,
)
def q_range_join_clicks(t: Frames) -> DataFrame:
    """Interval (range) join: per purchase, count that user's clicks in
    the preceding 30 minutes. Spark plans a raw ts-inequality join as a
    per-user cross product (BNLJ at worst), so the scale path is
    time-bucket blocking: clicks land in one floor(ts/W) bucket, each
    purchase probes its own bucket and the previous one (a window of
    width W spans at most two), and the pair becomes an equi-join on
    (user_id, bucket) followed by the exact half-open range filter.
    Each click matches a probe row at most once (one bucket per click,
    distinct probe buckets), so counts need no dedup; a final left
    join restores zero-click purchases. Shuffle volume is O(events),
    never O(pairs). Bounds are half-open [p - 30min, p) in exact µs on
    both engines, so boundary events can't flip. Oracle: DuckDB's
    native inequality join (its IEJoin optimizer handles the range
    predicate directly)."""
    ev = t["events"]
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.expr("unix_micros(ts)").alias("p_us")
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select("user_id", F.expr("unix_micros(ts)").alias("c_us"))
        .withColumn("bucket", F.expr(f"c_us div {_RANGE_W_US}"))
    )
    probes = purchases.withColumn(
        "bucket",
        F.explode(
            F.array(
                F.expr(f"p_us div {_RANGE_W_US}"),
                F.expr(f"p_us div {_RANGE_W_US} - 1"),
            )
        ),
    )
    matched = probes.join(clicks, ["user_id", "bucket"]).filter(
        (F.col("c_us") >= F.col("p_us") - _RANGE_W_US) & (F.col("c_us") < F.col("p_us"))
    )
    counts = matched.groupBy("event_id").agg(F.count("*").alias("clicks_30m"))
    return purchases.join(counts, "event_id", "left").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.coalesce(F.col("clicks_30m"), F.lit(0).cast("long")).alias("clicks_30m"),
    )


# --- distribution drift monitoring: Population Stability Index --------------
PSI_BINS = 10
PSI_EPS = 1e-6  # floor for empty-bin proportions (keeps ln defined)


@_register(
    "q_psi_price_drift",
    f"""
    WITH stats AS (
      SELECT min(o_totalprice) AS mn, max(o_totalprice) AS mx FROM orders
    ),
    binned AS (
      SELECT least({PSI_BINS - 1},
                   CAST(floor((o_totalprice - mn) / (mx - mn) * {PSI_BINS}) AS INTEGER))
               AS bucket,
             year(o_orderdate) % 2 AS slice
      FROM orders, stats
    ),
    counts AS (
      SELECT bucket,
             CAST(sum(CASE WHEN slice = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             CAST(sum(CASE WHEN slice = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
      FROM binned GROUP BY bucket
    ),
    props AS (
      SELECT bucket, n_a, n_b,
             greatest(CAST(n_a AS DOUBLE) / sum(n_a) OVER (), {PSI_EPS}) AS p_a,
             greatest(CAST(n_b AS DOUBLE) / sum(n_b) OVER (), {PSI_EPS}) AS p_b
      FROM counts
    )
    SELECT bucket, n_a, n_b,
           {dround_sql("p_a")} AS p_a,
           {dround_sql("p_b")} AS p_b,
           {dround_sql("(p_a - p_b) * ln(p_a / p_b)")} AS psi_term
    FROM props
    """,
)
def q_psi_price_drift(t: Frames) -> DataFrame:
    """Population Stability Index between even- and odd-year order
    price distributions — the standard drift monitor a production
    scoring pipeline runs before trusting a model on this week's
    traffic (PSI > 0.25 ⇒ retrain). Emitted per-bin so the drifting
    bins are identifiable; total PSI = sum(psi_term).

    Scale design: one scan computes global min/max (one-row agg,
    broadcast), a second bins and counts — two keyed partial aggs and
    a 10-row window; no UDF, no per-row Python. The same shape
    monitors any numeric feature at 100 TB for the cost of a scan."""
    orders = t["orders"]
    stats = orders.agg(
        F.min("o_totalprice").alias("mn"), F.max("o_totalprice").alias("mx")
    )
    binned = orders.crossJoin(F.broadcast(stats)).select(
        F.least(
            F.lit(PSI_BINS - 1),
            F.floor(
                (F.col("o_totalprice") - F.col("mn"))
                / (F.col("mx") - F.col("mn"))
                * PSI_BINS
            ).cast("int"),
        ).alias("bucket"),
        (F.year("o_orderdate") % 2).alias("slice"),
    )
    counts = binned.groupBy("bucket").agg(
        F.sum(F.when(F.col("slice") == 0, 1).otherwise(0)).cast("long").alias("n_a"),
        F.sum(F.when(F.col("slice") == 1, 1).otherwise(0)).cast("long").alias("n_b"),
    )
    w = Window.partitionBy()
    p_a = F.greatest(
        F.col("n_a").cast("double") / F.sum("n_a").over(w), F.lit(PSI_EPS)
    )
    p_b = F.greatest(
        F.col("n_b").cast("double") / F.sum("n_b").over(w), F.lit(PSI_EPS)
    )
    props = counts.select("bucket", "n_a", "n_b", p_a.alias("p_a"), p_b.alias("p_b"))
    return props.select(
        "bucket",
        "n_a",
        "n_b",
        dround(F.col("p_a")).alias("p_a"),
        dround(F.col("p_b")).alias("p_b"),
        dround((F.col("p_a") - F.col("p_b")) * F.log(F.col("p_a") / F.col("p_b"))).alias(
            "psi_term"
        ),
    )


# --- rolling event-time window (RANGE BETWEEN interval) ---------------------
ROLL_DAYS = 7
_ROLL_SECS = ROLL_DAYS * 86_400


@_register(
    "q_rolling_7d_spend",
    f"""
    SELECT o_custkey,
           o_orderkey,
           CAST(epoch(o_orderdate) AS BIGINT) AS order_epoch,
           {dround_sql(
             f"SUM(o_totalprice) OVER ("
             f"PARTITION BY o_custkey ORDER BY CAST(epoch(o_orderdate) AS BIGINT) "
             f"RANGE BETWEEN {_ROLL_SECS} PRECEDING AND CURRENT ROW)"
           )} AS spend_7d,
           CAST(COUNT(*) OVER (
             PARTITION BY o_custkey ORDER BY CAST(epoch(o_orderdate) AS BIGINT)
             RANGE BETWEEN {_ROLL_SECS} PRECEDING AND CURRENT ROW) AS BIGINT
           ) AS orders_7d
    FROM orders
    """,
)
def q_rolling_7d_spend(t: Frames) -> DataFrame:
    """Rolling 7-day spend per customer — the RANGE-BETWEEN-interval
    window (event-time sliding aggregate, the velocity feature a fraud
    model wants: 'how much did this account spend in the trailing
    week as of each order'). RANGE frames (value-based) differ from
    ROWS frames under same-timestamp ties: all orders sharing an
    order date see the same trailing total — both engines agree on
    that semantic, which is why the oracle hashes match.

    Scale design: one shuffle on o_custkey; within each partition the
    frame slides monotonically over the sorted epoch (O(n) per
    customer, no re-scan). The epoch cast keeps the frame numeric —
    Spark's rangeBetween needs a numeric ordering key."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("order_epoch"))
        .rangeBetween(-_ROLL_SECS, 0)
    )
    base = t["orders"].select(
        "o_custkey",
        "o_orderkey",
        F.unix_timestamp("o_orderdate").alias("order_epoch"),
        "o_totalprice",
    )
    return base.select(
        "o_custkey",
        "o_orderkey",
        "order_epoch",
        dround(F.sum("o_totalprice").over(w)).alias("spend_7d"),
        F.count("*").over(w).cast("long").alias("orders_7d"),
    )


# --- rank distributions (cume_dist / percent_rank) --------------------------
@_register(
    "q_price_rank_distribution",
    f"""
    SELECT o_orderkey,
           o_orderpriority,
           {dround_sql("percent_rank() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)")}
             AS price_percentile,
           {dround_sql("cume_dist() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)")}
             AS price_cume
    FROM orders
    WHERE o_orderkey % 10 = 0
    """,
)
def q_price_rank_distribution(t: Frames) -> DataFrame:
    """Within-priority price percentile + cumulative distribution —
    the 'where does this order sit in its class' feature
    (percent_rank for percentile scoring, cume_dist for threshold
    alerting). Deterministic tie-break on o_orderkey so both engines
    rank identically. One shuffle on the partition key; the
    o_orderkey%10 filter is pushed below the window (predicate on the
    partition-invariant key column would NOT push — this one is row
    local, so Catalyst moves it into the scan)."""
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return (
        t["orders"]
        .filter(F.col("o_orderkey") % 10 == 0)
        .select(
            "o_orderkey",
            "o_orderpriority",
            dround(F.percent_rank().over(w)).alias("price_percentile"),
            dround(F.cume_dist().over(w)).alias("price_cume"),
        )
    )


# --- weekly retention cohorts over the events stream ------------------------
@_register(
    "q_user_retention_cohorts",
    """
    WITH activity AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS week FROM events
    ),
    cohorts AS (
      SELECT user_id, MIN(week) AS cohort_week FROM activity GROUP BY user_id
    )
    SELECT c.cohort_week,
           CAST(date_diff('week', c.cohort_week, a.week) AS INTEGER) AS weeks_since,
           CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS active_users
    FROM activity a JOIN cohorts c USING (user_id)
    GROUP BY 1, 2
    """,
)
def q_user_retention_cohorts(t: Frames) -> DataFrame:
    """Weekly retention cohorts: users are grouped by first-active
    week; each (cohort, weeks-since) cell counts the cohort's users
    still active that week — the standard retention triangle. Two
    keyed aggregations plus one user_id join; the distinct-activity
    projection collapses the event volume FIRST, so the join input is
    O(users x weeks), not O(events). At 100 TB that ordering is the
    difference between joining billions of raw events and joining
    millions of (user, week) pairs."""
    ev = t["events"]
    activity = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("week")
    ).distinct()
    cohorts = activity.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        activity.join(cohorts, "user_id")
        .select(
            "cohort_week",
            (
                F.floor(
                    (F.unix_timestamp("week") - F.unix_timestamp("cohort_week"))
                    / (7 * 86400)
                )
            )
            .cast("int")
            .alias("weeks_since"),
            "user_id",
        )
        .groupBy(F.col("cohort_week").cast("date").alias("cohort_week"), F.col("weeks_since"))
        .agg(F.count_distinct("user_id").alias("active_users"))
    )


# --- ordered funnel conversion (view -> click -> purchase) ------------------
@_register(
    "q_funnel_conversion",
    """
    WITH v AS (
      SELECT user_id, min(CASE WHEN event_type = 'view' THEN ts END) AS first_view
      FROM events GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, min(e.ts) AS first_click
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.first_view
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS first_purchase
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.first_click
      GROUP BY e.user_id
    )
    SELECT CAST(count(v.user_id) FILTER (WHERE v.first_view IS NOT NULL) AS BIGINT) AS viewed,
           CAST(count(c.user_id) AS BIGINT) AS clicked_after_view,
           CAST(count(p.user_id) AS BIGINT) AS purchased_after_click
    FROM v LEFT JOIN c ON v.user_id = c.user_id
           LEFT JOIN p ON v.user_id = p.user_id
    """,
)
def q_funnel_conversion(t: Frames) -> DataFrame:
    """Ordered funnel: users who viewed, then clicked strictly after
    their first view, then purchased strictly after that click — the
    event-ORDER-aware conversion count (a user who purchases before
    ever clicking does not convert), which is what distinguishes a
    funnel from three independent counts.

    Scale design: three keyed min-aggregations chained by user_id
    joins — each stage collapses to one row per user BEFORE the next
    join, so join inputs are O(users). The per-stage time predicate
    (ts > previous stage's ts) rides the join, not a window over raw
    events."""
    ev = t["events"]
    v = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("first_view")
    )
    c = (
        ev.join(v, "user_id")
        .filter((F.col("event_type") == "click") & (F.col("ts") > F.col("first_view")))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_click"))
    )
    p = (
        ev.join(c, "user_id")
        .filter(
            (F.col("event_type") == "purchase") & (F.col("ts") > F.col("first_click"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase"))
    )
    return (
        v.join(c.select("user_id", "first_click"), "user_id", "left")
        .join(p.select("user_id", "first_purchase"), "user_id", "left")
        .agg(
            F.count(F.when(F.col("first_view").isNotNull(), 1)).cast("long").alias("viewed"),
            F.count("first_click").cast("long").alias("clicked_after_view"),
            F.count("first_purchase").cast("long").alias("purchased_after_click"),
        )
    )


# --- trailing z-score anomaly detection -------------------------------------
ZSCORE_TRAIL = 30  # trailing days in the baseline window


@_register(
    "q_revenue_anomaly_zscore",
    f"""
    WITH daily AS (
      SELECT o_orderpriority AS priority, CAST(o_orderdate AS DATE) AS day,
             sum(o_totalprice) AS revenue
      FROM orders GROUP BY 1, 2
    ),
    scored AS (
      SELECT priority, day, revenue,
             avg(revenue) OVER w AS mu,
             stddev_samp(revenue) OVER w AS sigma,
             count(*) OVER w AS n_base
      FROM daily
      WINDOW w AS (PARTITION BY priority ORDER BY day
                   ROWS BETWEEN {ZSCORE_TRAIL} PRECEDING AND 1 PRECEDING)
    )
    SELECT priority, day,
           {dround_sql("revenue")} AS revenue,
           {dround_sql("(revenue - mu) / sigma")} AS zscore
    FROM scored
    WHERE n_base >= 10 AND sigma > 0 AND abs((revenue - mu) / sigma) > 2
    """,
)
def q_revenue_anomaly_zscore(t: Frames) -> DataFrame:
    """Trailing z-score anomaly detection: each (priority, day)
    revenue is scored against the mean/stddev of its own trailing
    {ZSCORE_TRAIL}-day window (ROWS ... 1 PRECEDING — the baseline
    excludes the scored day, so a spike cannot mask itself), and days
    beyond |z| > 2 with >= 10 baseline days surface. The daily
    pre-aggregation collapses order volume before the window, so the
    window operates on O(priorities x days) rows, not O(orders) —
    same collapse-first discipline as the retention cohorts."""
    daily = (
        t["orders"]
        .groupBy(
            F.col("o_orderpriority").alias("priority"),
            F.col("o_orderdate").cast("date").alias("day"),
        )
        .agg(F.sum("o_totalprice").alias("revenue"))
    )
    w = (
        Window.partitionBy("priority")
        .orderBy("day")
        .rowsBetween(-ZSCORE_TRAIL, -1)
    )
    scored = daily.select(
        "priority",
        "day",
        "revenue",
        F.avg("revenue").over(w).alias("mu"),
        F.stddev_samp("revenue").over(w).alias("sigma"),
        F.count("*").over(w).alias("n_base"),
    )
    z = (F.col("revenue") - F.col("mu")) / F.col("sigma")
    return scored.filter(
        (F.col("n_base") >= 10) & (F.col("sigma") > 0) & (F.abs(z) > 2)
    ).select(
        "priority",
        "day",
        dround(F.col("revenue")).alias("revenue"),
        dround(z).alias("zscore"),
    )


# --- salted two-phase aggregation (hot-key mitigation, SURVEY scale notes) --
SALT_BUCKETS = 16


@_register(
    "q_salted_skew_agg",
    f"""
    SELECT l_returnflag,
           {_r4s('SUM(l_quantity)')} AS sum_qty,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           {_r4s('SUM(l_extendedprice) / COUNT(*)')} AS avg_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_salted_skew_agg(t: Frames) -> DataFrame:
    """Two-phase SALTED aggregation over a deliberately hot grouping
    key (l_returnflag: 3 values over the whole table — exactly the
    cardinality where one reducer would own a third of 100 TB). Phase
    1 aggregates by (key, salt) so each hot key fans out over
    SALT_BUCKETS reducers; phase 2 merges the bucket partials — sums
    and counts re-aggregate losslessly, and the average is derived
    from merged sums, never averaged across buckets. Oracle = the
    plain single-phase GROUP BY: salting must be invisible in the
    result.

    At real scale this is the manual fallback when AQE skew handling
    can't help (aggregation skew, not join skew — AQE only splits
    skewed JOIN partitions). Salt = hash of a high-cardinality column,
    deterministic per row."""
    li = t["lineitem"]
    partial = (
        li.withColumn("_salt", (F.abs(F.hash("l_orderkey")) % SALT_BUCKETS).cast("int"))
        .groupBy("l_returnflag", "_salt")
        .agg(
            F.sum("l_quantity").alias("p_qty"),
            F.count("*").alias("p_n"),
            F.sum("l_extendedprice").alias("p_price"),
        )
    )
    return partial.groupBy("l_returnflag").agg(
        dround(F.sum("p_qty"), 4).alias("sum_qty"),
        F.sum("p_n").cast("long").alias("n_rows"),
        dround(F.sum("p_price") / F.sum("p_n"), 4).alias("avg_price"),
    )


# --- deterministic weighted sampling (importance-weighted data mixing) ------
@_register(
    "q_weighted_sample",
    f"""
    WITH mx AS (SELECT MAX(o_totalprice) AS m FROM orders)
    SELECT o_orderkey, o_custkey,
           {_r4s('o_totalprice')} AS totalprice,
           {_r4s("CAST(CAST(('0x' || substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 8)) AS UBIGINT) AS DOUBLE) / 4294967296.0")}
             AS sample_u
    FROM orders, mx
    WHERE CAST(CAST(('0x' || substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 8)) AS UBIGINT) AS DOUBLE) / 4294967296.0
          < o_totalprice / mx.m
    """,
)
def q_weighted_sample(t: Frames) -> DataFrame:
    """Weighted Bernoulli sample with inclusion probability
    proportional to o_totalprice — the importance-weighted mixing step
    of a training-data pipeline (sample high-value sources harder),
    made DETERMINISTIC: the uniform draw is the first 8 hex digits of
    md5(key) scaled to [0,1), so membership is a pure row function —
    identical across engines, runs, partitionings, and replays (same
    property as the hash holdout split, corpus_sample_hash).

    Scale design: the max weight joins in as a broadcast one-row
    aggregate (no driver collect); everything else is a scan-side
    projection + filter. One exact 32-bit hash fraction — dyadic, so
    the double compare is exact on both engines."""
    orders = t["orders"]
    u = F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8), 16, 10).cast(
        "double"
    ) / F.lit(4294967296.0)
    mx = orders.agg(F.max("o_totalprice").alias("m"))
    return (
        orders.crossJoin(F.broadcast(mx))
        .withColumn("sample_u", u)
        .filter(F.col("sample_u") < F.col("o_totalprice") / F.col("m"))
        .select(
            "o_orderkey",
            "o_custkey",
            dround(F.col("o_totalprice"), 4).alias("totalprice"),
            dround(F.col("sample_u"), 4).alias("sample_u"),
        )
    )


# --- explicitly salted equi-join (broadcast-ineligible skewed fact side) ----
@_register(
    "q_salted_join_parts",
    f"""
    SELECT p.p_brand,
           {_r4s('SUM(l.l_extendedprice * (1 - l.l_discount))')} AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_brand
    """,
)
def q_salted_join_parts(t: Frames) -> DataFrame:
    """Brand revenue through an EXPLICITLY SALTED join
    (functions/skew.py:salted_join): the fact side gets a per-row salt,
    the dim side is exploded buckets x, and the join key becomes
    (key, salt) — splitting each hot key across `buckets` reducers.
    This is the manual mitigation for the case AQE's skew handling
    can't touch: a skewed join where the dim is too big to broadcast.
    Salting must be invisible in the result — the oracle is the plain
    unsalted join.

    (part comfortably broadcasts at this SF; the query pins the salted
    plan anyway because it exists to verify the rewrite's semantics —
    the plan-shape test asserts the (key, salt) join actually runs.)"""
    from real_time_fraud_detection_lakehouse_spark.functions.skew import salted_join

    li = t["lineitem"]
    dim = t["part"].withColumnRenamed("p_partkey", "l_partkey")
    joined = salted_join(li, dim, "l_partkey", buckets=8)
    return joined.groupBy("p_brand").agg(
        dround(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
            "revenue"
        ),
        F.count("*").cast("long").alias("n_items"),
    )


# --- TPC-H Q15 shape: aggregate + scalar-max join-back ----------------------
#: revenue window for the top-supplier query (3 months inside the
#: 1995–2001 lineitem shipdate range)
_Q15_LO, _Q15_HI = "1996-01-01 00:00:00", "1996-04-01 00:00:00"


@_register(
    "q_top_supplier_revenue",
    f"""
    WITH revenue AS (
      SELECT l_suppkey,
             {_r4s('SUM(l_extendedprice * (1 - l_discount))')} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '{_Q15_LO}'
        AND l_shipdate < TIMESTAMP '{_Q15_HI}'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.l_suppkey
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s.s_suppkey
    """,
)
def q_top_supplier_revenue(t: Frames) -> DataFrame:
    """TPC-H Q15 shape (ref parity: the reference's Trino view layer has
    no scalar-subquery example; this covers SURVEY §2's uncorrelated
    scalar subquery family): per-supplier revenue over a shipdate
    window, then keep the supplier(s) whose revenue equals the global
    max — the "join an aggregate back against its own maximum" pattern.

    Scale design: revenue is one keyed partial agg over the
    windowed scan (filter reaches the parquet scan). The max is a
    one-row broadcast aggregate of that small per-supplier table —
    never a driver collect — and the equality filter + supplier join
    both run broadcast, so the fact table is read exactly once. The
    comparison is on the ROUNDED revenue (both engines round
    identically), so float summation order can't flip the winner."""
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit(_Q15_LO).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(_Q15_HI).cast("timestamp"))
    )
    revenue = li.groupBy("l_suppkey").agg(
        _r4(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
            "total_revenue"
        )
    )
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    return (
        revenue.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .join(t["supplier"], F.col("s_suppkey") == F.col("l_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


# --- TPC-H Q17 shape: correlated scalar subquery (per-key avg threshold) ----
_Q17_BRAND = "Brand#23"


@_register(
    "q_small_qty_revenue",
    f"""
    WITH brand_parts AS (
      SELECT p_partkey FROM part WHERE p_brand = '{_Q17_BRAND}'
    ),
    thresholds AS (
      SELECT l_partkey, {_r4s('0.2 * AVG(l_quantity)')} AS qty_threshold
      FROM lineitem
      WHERE l_partkey IN (SELECT p_partkey FROM brand_parts)
      GROUP BY l_partkey
    )
    SELECT {_r4s('SUM(l.l_extendedprice) / 7.0')} AS avg_yearly,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem l
    JOIN thresholds th ON l.l_partkey = th.l_partkey
    WHERE l.l_quantity < th.qty_threshold
    """,
)
def q_small_qty_revenue(t: Frames) -> DataFrame:
    """TPC-H Q17 shape — the CORRELATED scalar subquery family: revenue
    from small-quantity line items where "small" is defined per part as
    20% of that part's own average quantity. This is the decorrelation
    pattern: the correlated `(SELECT AVG(..) WHERE partkey = outer)` is
    rewritten as a keyed aggregate joined back on the key — which is
    exactly how Catalyst decorrelates it, made explicit.

    Scale design: the brand filter (tiny part subset) broadcasts as a
    semi-join that prunes lineitem BEFORE the per-part average — the
    per-part agg shuffles only the brand's rows, not the whole fact
    table. The thresholds table is |brand parts| rows → broadcast for
    the final threshold join; the fact side never shuffles. Thresholds
    are ROUNDED identically on both engines so boundary rows can't
    flip on float summation order."""
    brand_parts = t["part"].filter(F.col("p_brand") == _Q17_BRAND).select("p_partkey")
    li_brand = t["lineitem"].join(
        brand_parts,
        F.col("l_partkey") == F.col("p_partkey"),
        "left_semi",
    )
    thresholds = li_brand.groupBy("l_partkey").agg(
        _r4(F.lit(0.2) * F.avg("l_quantity")).alias("qty_threshold")
    )
    return (
        li_brand.join(thresholds, "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            _r4(F.sum("l_extendedprice") / F.lit(7.0)).alias("avg_yearly"),
            F.count("*").cast("long").alias("n_items"),
        )
    )


# --- TPC-H Q22 shape: scalar-avg filter + windowed NOT EXISTS ---------------
_Q22_LO, _Q22_HI = "1997-01-01 00:00:00", "1998-01-01 00:00:00"


@_register(
    "q_sales_opportunity",
    f"""
    WITH avg_bal AS (
      SELECT {_r4s('AVG(c_acctbal)')} AS a FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c.c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           {_r4s('SUM(c.c_acctbal)')} AS totacctbal
    FROM customer c, avg_bal
    WHERE c.c_acctbal > avg_bal.a
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '{_Q22_LO}'
          AND o.o_orderdate < TIMESTAMP '{_Q22_HI}'
      )
    GROUP BY c.c_mktsegment
    ORDER BY c.c_mktsegment
    """,
)
def q_sales_opportunity(t: Frames) -> DataFrame:
    """TPC-H Q22 shape: "dormant high-value customers" — customers with
    above-average positive account balance and NO orders inside a date
    window, grouped by market segment. Combines an uncorrelated scalar
    subquery (the global average balance, broadcast as a one-row
    aggregate, never collected) with a windowed anti-join (NOT EXISTS
    decorrelated to left_anti against the date-pruned orders scan).

    Scale design: the orders side of the anti-join is filtered at the
    scan (partition/row-group pruning on o_orderdate) before the
    shuffle; customer is the smaller side but the anti-join keeps keys
    co-partitioned — at 100 TB AQE picks the broadcast side. The
    average-balance threshold is ROUNDED on both engines before the
    compare so summation order can't flip membership."""
    cust = t["customer"]
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        _r4(F.avg("c_acctbal")).alias("a")
    )
    window_orders = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit(_Q22_LO).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(_Q22_HI).cast("timestamp"))
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(window_orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").cast("long").alias("numcust"),
            _r4(F.sum("c_acctbal")).alias("totacctbal"),
        )
        .orderBy("c_mktsegment")
    )


# --- SCD Type-2 dimension history (lakehouse merge family) ------------------
_SCD2_BASE_TS = "1995-01-01 00:00:00"
_SCD2_EFF_TS = "2000-06-01 00:00:00"


@_register(
    "q_scd2_customer_history",
    f"""
    WITH base AS (
      SELECT c_custkey, c_mktsegment, c_acctbal,
             TIMESTAMP '{_SCD2_BASE_TS}' AS valid_from
      FROM customer
    ),
    updates AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % 10 = 0 THEN 'WHOLESALE' ELSE c_mktsegment END AS c_mktsegment,
             CASE WHEN c_custkey % 10 = 0 THEN c_acctbal + 100.0 ELSE c_acctbal END AS c_acctbal
      FROM customer WHERE c_custkey % 5 = 0
      UNION ALL
      SELECT c_custkey + 1000000, 'WHOLESALE', 0.0
      FROM customer WHERE c_custkey % 100 = 0
    ),
    changed AS (
      SELECT u.c_custkey, u.c_mktsegment, u.c_acctbal
      FROM updates u JOIN base b USING (c_custkey)
      WHERE u.c_mktsegment IS DISTINCT FROM b.c_mktsegment
         OR u.c_acctbal IS DISTINCT FROM b.c_acctbal
    ),
    hist AS (
      SELECT b.c_custkey, b.c_mktsegment, b.c_acctbal, b.valid_from,
             TIMESTAMP '{_SCD2_EFF_TS}' AS valid_to, FALSE AS is_current
      FROM base b WHERE b.c_custkey IN (SELECT c_custkey FROM changed)
      UNION ALL
      SELECT c_custkey, c_mktsegment, c_acctbal,
             TIMESTAMP '{_SCD2_EFF_TS}', NULL, TRUE
      FROM changed
      UNION ALL
      SELECT b.c_custkey, b.c_mktsegment, b.c_acctbal, b.valid_from, NULL, TRUE
      FROM base b WHERE b.c_custkey NOT IN (SELECT c_custkey FROM changed)
      UNION ALL
      SELECT u.c_custkey, u.c_mktsegment, u.c_acctbal,
             TIMESTAMP '{_SCD2_EFF_TS}', NULL, TRUE
      FROM updates u WHERE u.c_custkey NOT IN (SELECT c_custkey FROM base)
    )
    SELECT c_custkey, c_mktsegment, {_r4s('c_acctbal')} AS acctbal,
           valid_from, valid_to, is_current
    FROM hist ORDER BY c_custkey, is_current
    """,
)
def q_scd2_customer_history(t: Frames) -> DataFrame:
    """SCD Type-2 history via :func:`plans.incremental.scd2_apply` on a
    deterministic synthetic update batch: every 5th customer submits an
    update, every 10th actually changes (segment → WHOLESALE, balance
    +100), every 100th also appears as a brand-new key — covering all
    four merge paths (close+reopen, no-op suppression, untouched,
    insert). The oracle recomputes the same merge in plain SQL.

    Scale notes live on scd2_apply: the dim side never shuffles, the
    batch broadcasts."""
    from real_time_fraud_detection_lakehouse_spark.plans.incremental import scd2_apply

    cust = t["customer"]
    base = cust.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.lit(_SCD2_BASE_TS).cast("timestamp").alias("valid_from"),
    )
    updates = (
        cust.filter(F.col("c_custkey") % 5 == 0)
        .select(
            "c_custkey",
            F.when(F.col("c_custkey") % 10 == 0, F.lit("WHOLESALE"))
            .otherwise(F.col("c_mktsegment"))
            .alias("c_mktsegment"),
            F.when(F.col("c_custkey") % 10 == 0, F.col("c_acctbal") + 100.0)
            .otherwise(F.col("c_acctbal"))
            .alias("c_acctbal"),
        )
        .unionByName(
            cust.filter(F.col("c_custkey") % 100 == 0).select(
                (F.col("c_custkey") + 1000000).alias("c_custkey"),
                F.lit("WHOLESALE").alias("c_mktsegment"),
                F.lit(0.0).alias("c_acctbal"),
            )
        )
    )
    hist = scd2_apply(
        base, updates, "c_custkey", ["c_mktsegment", "c_acctbal"], _SCD2_EFF_TS
    )
    return hist.select(
        "c_custkey",
        "c_mktsegment",
        _r4(F.col("c_acctbal")).alias("acctbal"),
        "valid_from",
        "valid_to",
        "is_current",
    ).orderBy("c_custkey", "is_current")


# --- temporal gap-fill + forward fill (time-series densification) -----------
@_register(
    "q_events_gapfill_ffill",
    f"""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS hour,
             COUNT(*) AS n, {_r4s('AVG(value)')} AS avg_val
      FROM events GROUP BY 1, 2
    ),
    bounds AS (
      SELECT date_trunc('hour', MIN(ts)) AS lo, date_trunc('hour', MAX(ts)) AS hi
      FROM events
    ),
    grid AS (
      SELECT t.event_type, g.hour
      FROM (SELECT DISTINCT event_type FROM events) t
      CROSS JOIN (
        SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour FROM bounds
      ) g
    ),
    joined AS (
      SELECT g.event_type, g.hour,
             COALESCE(h.n, 0) AS n_events, h.avg_val
      FROM grid g LEFT JOIN hourly h USING (event_type, hour)
    )
    SELECT event_type, hour, CAST(n_events AS BIGINT) AS n_events,
           LAST_VALUE(avg_val IGNORE NULLS) OVER (
             PARTITION BY event_type ORDER BY hour
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS avg_val_ffill
    FROM joined
    """,
)
def q_events_gapfill_ffill(t: Frames) -> DataFrame:
    """Time-series densification: the hourly per-type event series with
    every missing hour materialized (count 0) and the average value
    FORWARD-FILLED from the last observed hour — the gap-fill +
    locf resample every monitoring/feature pipeline needs and plain
    GROUP BY cannot express (missing groups produce no rows at all).

    Scale design: the raw scan collapses to the hourly aggregate
    FIRST (map-side partials; |types|x|hours| rows), the dense grid is
    sequence()+explode over a broadcast one-row bounds aggregate —
    O(types x hours), data-size independent — and the forward fill is
    last(ignorenulls) over a PARTITIONED window (state bounded per
    type, no global sort). Rounded averages before the fill keep the
    carried values bit-identical cross-engine."""
    ev = t["events"]
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(F.count("*").alias("n"), _r4(F.avg("value")).alias("avg_val"))
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    grid = (
        ev.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(
                F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
            ).alias("hour"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(hourly, ["event_type", "hour"], "left")
        .select(
            "event_type",
            "hour",
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_events"),
            F.last("avg_val", ignorenulls=True).over(w).alias("avg_val_ffill"),
        )
    )


# --- TPC-H Q3: shipping priority (filter-heavy 3-way + top-k) ---------------
@_register(
    "q_shipping_priority",
    f"""
    SELECT * FROM (
      SELECT l.l_orderkey,
             {_r4s('SUM(l.l_extendedprice * (1 - l.l_discount))')} AS revenue,
             o.o_orderdate, o.o_orderpriority
      FROM customer c
      JOIN orders o ON o.o_custkey = c.c_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      WHERE c.c_mktsegment = 'BUILDING'
        AND o.o_orderdate < TIMESTAMP '1998-07-01 00:00:00'
        AND l.l_shipdate > TIMESTAMP '1998-07-01 00:00:00'
      GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ) ORDER BY revenue DESC, o_orderdate ASC, l_orderkey ASC LIMIT 10
    """,
)
def q_shipping_priority(t: Frames) -> DataFrame:
    """TPC-H Q3 (ref parity class: trino/queries; the reference's SQL
    surface has no Q3, this extends the join family J4 with the
    classic selective-date variant). Scale: the segment filter prunes
    customer BEFORE the broadcast, both date filters reach the scans
    (PushedFilters), the only shuffle is orders⋈lineitem on orderkey,
    and the top-10 is TakeOrderedAndProject — no global sort."""
    j = (
        t["lineitem"]
        .filter(F.col("l_shipdate") > F.lit("1998-07-01 00:00:00").cast("timestamp"))
        .join(
            t["orders"].filter(
                F.col("o_orderdate") < F.lit("1998-07-01 00:00:00").cast("timestamp")
            ),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .join(
            t["customer"].filter(F.col("c_mktsegment") == "BUILDING"),
            F.col("c_custkey") == F.col("o_custkey"),
        )
    )
    return (
        j.groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            _r4(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "revenue"
            )
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("o_orderdate"), F.asc("l_orderkey"))
        .limit(10)
    )


# --- TPC-H Q7: bilateral nation trade volume (dual-aliased dim) -------------
@_register(
    "q_nation_trade_volume",
    f"""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l.l_shipdate) AS INTEGER) AS l_year,
           {_r4s('SUM(l.l_extendedprice * (1 - l.l_discount))')} AS volume,
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation sn ON sn.n_nationkey = s.s_nationkey
    JOIN nation cn ON cn.n_nationkey = c.c_nationkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1999-01-01 00:00:00'
      AND sn.n_nationkey <> cn.n_nationkey
    GROUP BY sn.n_name, cn.n_name, 3
    """,
)
def q_nation_trade_volume(t: Frames) -> DataFrame:
    """TPC-H Q7 generalized to all cross-nation pairs (the 25-nation
    testdata makes a single fixed pair trivially small). Exercises the
    SAME dim broadcast twice under different aliases (supplier-nation
    vs customer-nation) plus a cross-side inequality. Scale: all four
    dims broadcast; the fact side shuffles once for orders⋈lineitem
    and once for the (supp, cust, year) agg — both with map-side
    partials; the date range is scan-pushed."""
    sn = t["nation"].select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = t["nation"].select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    j = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1999-01-01 00:00:00").cast("timestamp"))
        )
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t["customer"], F.col("c_custkey") == F.col("o_custkey"))
        .join(t["supplier"], F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(sn), F.col("sn_key") == F.col("s_nationkey"))
        .join(F.broadcast(cn), F.col("cn_key") == F.col("c_nationkey"))
        .filter(F.col("sn_key") != F.col("cn_key"))
    )
    return j.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").cast("int").alias("l_year")
    ).agg(
        _r4(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("volume"),
        F.count("*").alias("n_lines"),
    )


# --- TPC-H Q18: large-volume customers (IN over grouped HAVING) -------------
@_register(
    "q_large_volume_customers",
    f"""
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
           {_r4s('o.o_totalprice')} AS o_totalprice,
           {_r4s('SUM(l.l_quantity)')} AS total_qty
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING SUM(l_quantity) > 250
    )
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    """,
)
def q_large_volume_customers(t: Frames) -> DataFrame:
    """TPC-H Q18: the IN-over-grouped-HAVING decorrelation shape. The
    subquery is expressed as its own aggregate then LEFT SEMI joined
    back — Catalyst's own rewrite, stated explicitly so the plan is
    pinned. Scale: the HAVING survivor set is ~1% of orders (a
    per-key partial-agg shuffle on orderkey), the semi-join reuses the
    same orderkey partitioning (AQE co-locates), customer broadcasts;
    nothing materializes the full join before filtering."""
    big = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("s"))
        .filter(F.col("s") > 250)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    j = (
        t["lineitem"]
        .join(big, F.col("big_orderkey") == F.col("l_orderkey"), "left_semi")
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t["customer"], F.col("c_custkey") == F.col("o_custkey"))
    )
    return j.groupBy(
        "c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice"
    ).agg(_r4(F.sum("l_quantity")).alias("total_qty")).select(
        "c_name",
        "c_custkey",
        "o_orderkey",
        "o_orderdate",
        _r4(F.col("o_totalprice")).alias("o_totalprice"),
        "total_qty",
    )


# --- join-strategy knob: shuffled hash join (avoids both sort passes) -------
@_register(
    "q_shuffled_hash_join",
    f"""
    SELECT o.o_orderpriority,
           COUNT(*) AS n_lines,
           -- 2-decimal round: this sum reaches ~6e9 per group at
           -- sf0.1 (only 5 groups), where double summation-order
           -- noise (~1e-4) exceeds a 4-decimal quantum — caught by
           -- the sf0.1 full-surface validation
           {dround_sql('SUM(l.l_extendedprice)', 2)} AS gross
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def q_shuffled_hash_join(t: Frames) -> DataFrame:
    """The SHUFFLE_HASH strategy hint on the fact-fact join: when both
    sides are too big to broadcast but one side's per-partition hash
    table fits memory, hashing beats sort-merge by skipping BOTH sort
    passes (the standard Spark knob for large co-partitioned joins;
    with AQE off-by-default selection this is where a human overrides
    the planner). Semantically invisible — the oracle is the plain
    join — and plan-pinned to ShuffledHashJoin in
    tests/test_plans_perf.py."""
    j = t["lineitem"].join(
        t["orders"].hint("shuffle_hash"),
        F.col("o_orderkey") == F.col("l_orderkey"),
    )
    return j.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_lines"),
        dround(F.sum("l_extendedprice"), 2).alias("gross"),
    )


# --- EWMA trend (applyInPandas: the sanctioned Pandas-UDF escape hatch) -----
EWMA_ALPHA = 0.3


@_register(
    "q_ewma_daily_value",
    f"""
    WITH RECURSIVE daily AS (
      SELECT event_type,
             -- duckdb's date_trunc('day') yields DATE; Spark yields
             -- TIMESTAMP — align the types
             CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             {dround_sql('AVG(value)', 4)} AS daily_avg
      FROM events GROUP BY 1, 2
    ),
    seq AS (
      SELECT event_type, day, daily_avg,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS rn
      FROM daily
    ),
    ew AS (
      SELECT event_type, day, daily_avg, rn, daily_avg AS ewma
      FROM seq WHERE rn = 1
      UNION ALL
      SELECT s.event_type, s.day, s.daily_avg, s.rn,
             {EWMA_ALPHA} * s.daily_avg + (1 - {EWMA_ALPHA}) * e.ewma
      FROM seq s JOIN ew e ON s.event_type = e.event_type AND s.rn = e.rn + 1
    )
    SELECT event_type, day, daily_avg, {dround_sql('ewma', 4)} AS ewma FROM ew
    """,
)
def q_ewma_daily_value(t: Frames) -> DataFrame:
    """Exponentially-weighted moving average of the daily event value
    per event_type — a genuinely SEQUENTIAL recurrence (y_t = αx_t +
    (1-α)y_{t-1}) that no built-in window frame expresses, so this is
    the one legitimate applyInPandas site in the relational surface:
    Arrow-batched, one group per entity, linear in group size.

    Scale design: the heavy reduction (events → per-day averages)
    happens FIRST as a normal partial-agg groupBy, so the Python
    stage only ever sees |entities| × |days| rows — bounded series,
    not raw events. Entities partition independently (the shuffle key
    is event_type); within a series the recurrence is inherently
    ordered, and series length is calendar-bounded. The EWMA runs
    over the ROUNDED daily series so the oracle's recursive CTE
    consumes bit-identical inputs."""
    import pandas as pd

    daily = (
        t["events"]
        .groupBy("event_type", F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(_r4(F.avg("value")).alias("daily_avg"))
    )

    def _ewma(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("day").reset_index(drop=True)
        out = []
        prev = None
        for v in pdf["daily_avg"]:
            prev = v if prev is None else EWMA_ALPHA * v + (1 - EWMA_ALPHA) * prev
            out.append(prev)
        pdf["ewma"] = out
        return pdf

    result = daily.groupBy("event_type").applyInPandas(
        _ewma, "event_type string, day timestamp, daily_avg double, ewma double"
    )
    return result.select("event_type", "day", "daily_avg", _r4(F.col("ewma")).alias("ewma"))


# --- declarative data-quality constraint suite (Deequ-style) ----------------
@_register(
    "q_quality_report",
    """
    WITH m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS m_row_count,
             CAST(SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS m_qty_nulls,
             CAST(SUM(CASE WHEN l_quantity < 0 OR l_quantity > 100 THEN 1 ELSE 0 END) AS BIGINT) AS m_qty_range,
             CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 ELSE 0 END) AS BIGINT) AS m_disc_range,
             CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS m_key_nulls,
             CAST(COUNT(*) - COUNT(DISTINCT (l_orderkey, l_linenumber)) AS BIGINT) AS m_key_dups,
             CAST(SUM(CASE WHEN l_returnflag NOT IN ('A', 'N', 'R') THEN 1 ELSE 0 END) AS BIGINT) AS m_flag_domain
      FROM lineitem
    )
    SELECT 'row_count_min' AS rule, m_row_count AS metric, m_row_count >= 1 AS passed FROM m
    UNION ALL SELECT 'quantity_not_null', m_qty_nulls, m_qty_nulls = 0 FROM m
    UNION ALL SELECT 'quantity_in_0_100', m_qty_range, m_qty_range = 0 FROM m
    UNION ALL SELECT 'discount_in_0_1', m_disc_range, m_disc_range = 0 FROM m
    UNION ALL SELECT 'orderkey_not_null', m_key_nulls, m_key_nulls = 0 FROM m
    UNION ALL SELECT 'line_key_unique', m_key_dups, m_key_dups = 0 FROM m
    UNION ALL SELECT 'returnflag_domain', m_flag_domain, m_flag_domain = 0 FROM m
    """,
)
def q_quality_report(t: Frames) -> DataFrame:
    """Deequ-style declarative constraint suite: completeness, range,
    key-uniqueness and domain checks over lineitem, ALL computed in a
    single aggregate pass — at 100 TB a per-rule scan is a per-rule
    100 TB job, so the whole suite must ride one scan (this is the
    batch complement to plans/quality.py's observe()-based counters,
    which piggyback on an existing write instead). The one-row metric
    vector explodes into the per-rule report driver-side — 7 rows, not
    a shuffle."""
    l = t["lineitem"]
    viol = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("long")  # noqa: E731
    m = l.agg(
        F.count("*").cast("long").alias("m_row_count"),
        viol(F.col("l_quantity").isNull()).alias("m_qty_nulls"),
        viol((F.col("l_quantity") < 0) | (F.col("l_quantity") > 100)).alias("m_qty_range"),
        viol((F.col("l_discount") < 0) | (F.col("l_discount") > 1)).alias("m_disc_range"),
        viol(F.col("l_orderkey").isNull()).alias("m_key_nulls"),
        (F.count("*") - F.countDistinct("l_orderkey", "l_linenumber"))
        .cast("long")
        .alias("m_key_dups"),
        viol(~F.col("l_returnflag").isin("A", "N", "R")).alias("m_flag_domain"),
    )
    rules = [
        ("row_count_min", "m_row_count", F.col("m_row_count") >= 1),
        ("quantity_not_null", "m_qty_nulls", F.col("m_qty_nulls") == 0),
        ("quantity_in_0_100", "m_qty_range", F.col("m_qty_range") == 0),
        ("discount_in_0_1", "m_disc_range", F.col("m_disc_range") == 0),
        ("orderkey_not_null", "m_key_nulls", F.col("m_key_nulls") == 0),
        ("line_key_unique", "m_key_dups", F.col("m_key_dups") == 0),
        ("returnflag_domain", "m_flag_domain", F.col("m_flag_domain") == 0),
    ]
    report = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(name).alias("rule"),
                    F.col(metric).alias("metric"),
                    passed.alias("passed"),
                )
                for name, metric, passed in rules
            ]
        )
    ).alias("r")
    return m.select(report).select("r.rule", "r.metric", "r.passed")


# --- Spark 4 VARIANT type over semi-structured props ------------------------
@_register(
    "q_events_variant",
    f"""
    SELECT CAST(json_extract(props, '$.k') AS INTEGER) // 10 AS k_decile,
           COUNT(*) AS n,
           {_r4s('AVG(value)')} AS avg_value,
           CAST(MIN(CAST(json_extract(props, '$.k') AS INTEGER)) AS INTEGER) AS k_min,
           CAST(MAX(CAST(json_extract(props, '$.k') AS INTEGER)) AS INTEGER) AS k_max
    FROM events
    GROUP BY 1
    """,
)
def q_events_variant(t: Frames) -> DataFrame:
    """Semi-structured access through Spark 4's VARIANT type:
    ``parse_json`` materializes the binary variant once, ``variant_get``
    does typed path extraction without string re-parsing — the
    engine-native upgrade over ``get_json_object`` (q_events_json keeps
    the classic path for parity). At 100 TB the variant encode beats
    repeated JSON string parsing when several paths are read per row.
    Oracle: DuckDB's native JSON extraction over the same docs."""
    v = F.parse_json(F.col("props"))
    k = F.try_variant_get(v, "$.k", "int")
    return (
        t["events"]
        .select(k.alias("k"), "value")
        .groupBy((F.col("k") / F.lit(10)).cast("int").alias("k_decile"))
        .agg(
            F.count("*").alias("n"),
            _r4(F.avg("value")).alias("avg_value"),
            F.min("k").cast("int").alias("k_min"),
            F.max("k").cast("int").alias("k_max"),
        )
    )


# --- TPC-H Q21 shape: correlated EXISTS + NOT EXISTS over the same fact -----
#: the "nation" scope of the classic query, widened to five synthetic
#: nations so the result set stays meaningful at small SF
_Q21_NATIONS = ("NATION_0", "NATION_1", "NATION_2", "NATION_3", "NATION_4")
_Q21_IN = ", ".join(f"'{n}'" for n in _Q21_NATIONS)


@_register(
    "q_suppliers_kept_waiting",
    f"""
    SELECT s.s_name,
           CAST(COUNT(*) AS BIGINT) AS numwait
    FROM lineitem l1
    JOIN orders o ON o.o_orderkey = l1.l_orderkey AND o.o_orderstatus = 'F'
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE l1.l_returnflag = 'R'
      AND n.n_name IN ({_Q21_IN})
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_returnflag = 'R'
      )
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 100
    """,
)
def q_suppliers_kept_waiting(t: Frames) -> DataFrame:
    """TPC-H Q21 shape ("suppliers who kept orders waiting"): for
    finished multi-supplier orders, count per supplier the lines where
    that supplier was the ONLY one whose line came back flagged
    (l_returnflag = 'R' stands in for receipt-after-commit — the
    synthetic lineitem carries no receipt/commit dates). The last
    classic decorrelation pattern in the relational surface: a
    correlated EXISTS (another supplier participated in the order)
    becomes a LEFT SEMI self-join and the correlated NOT EXISTS (no
    OTHER supplier's line was flagged) a LEFT ANTI self-join, both on
    the l_orderkey equi-key with the l_suppkey inequality as a join
    residual.

    Scale design: both self-joins carry the orderkey equi-conjunct, so
    Spark plans shuffled hash/sort-merge joins co-partitioned on
    l_orderkey — never a nested-loop (pinned in test_plans_perf). The
    candidate side is pre-shrunk by the flag + order-status + nation
    filters before the self-joins; supplier⋈nation broadcasts; the
    top-100 is TakeOrderedAndProject, no global sort."""
    li = t["lineitem"]
    f_orders = t["orders"].filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    nat = t["nation"].filter(F.col("n_name").isin(*_Q21_NATIONS)).select("n_nationkey")
    supp = (
        t["supplier"]
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name")
    )
    cand = (
        li.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .join(f_orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .drop("o_orderkey")
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
    )
    l2 = li.select(F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2"))
    l3 = (
        li.filter(F.col("l_returnflag") == "R")
        .select(F.col("l_orderkey").alias("o3"), F.col("l_suppkey").alias("s3"))
    )
    waited = cand.join(
        l2,
        (F.col("l_orderkey") == F.col("o2")) & (F.col("l_suppkey") != F.col("s2")),
        "left_semi",
    ).join(
        l3,
        (F.col("l_orderkey") == F.col("o3")) & (F.col("l_suppkey") != F.col("s3")),
        "left_anti",
    )
    return (
        waited.groupBy("s_name")
        .agg(F.count("*").cast("long").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(100)
    )


# --- TPC-H Q4 shape: date-windowed EXISTS count by priority ------------------
_Q4_LO, _Q4_HI = "1996-01-01 00:00:00", "1996-04-01 00:00:00"


@_register(
    "q_priority_order_check",
    f"""
    SELECT o.o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '{_Q4_LO}'
      AND o.o_orderdate < TIMESTAMP '{_Q4_HI}'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R'
      )
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
)
def q_priority_order_check(t: Frames) -> DataFrame:
    """TPC-H Q4 shape ("order priority checking"): orders placed in one
    quarter having at least one flagged line (l_returnflag = 'R' stands
    in for receipt-after-commit), counted per priority — the
    EXISTS-to-LEFT-SEMI decorrelation in its simplest grouped form,
    complementing Q21's double-correlated variant.

    Scale design: the orders side prunes to one quarter AT THE SCAN
    (o_orderdate min/max row-group stats), the lineitem side prunes on
    the flag; the semi-join is the only shuffle and the grouped count
    collapses map-side (5 priority groups)."""
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit(_Q4_LO).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(_Q4_HI).cast("timestamp"))
    )
    flagged = t["lineitem"].filter(F.col("l_returnflag") == "R").select("l_orderkey")
    return (
        orders.join(flagged, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").cast("long").alias("order_count"))
        .orderBy("o_orderpriority")
    )


# --- TPC-H Q2 shape: correlated scalar-MIN subquery --------------------------
@_register(
    "q_min_cost_supplier",
    f"""
    WITH costs AS (
      SELECT l_partkey, l_suppkey,
             {_r4s('MIN(l_extendedprice / l_quantity)')} AS unit_cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    best AS (
      SELECT l_partkey, MIN(unit_cost) AS min_cost FROM costs GROUP BY l_partkey
    )
    SELECT c.l_partkey AS p_partkey, p.p_brand, s.s_name, n.n_name, c.unit_cost
    FROM costs c
    JOIN best b ON c.l_partkey = b.l_partkey AND c.unit_cost = b.min_cost
    JOIN part p ON p.p_partkey = c.l_partkey
    JOIN supplier s ON s.s_suppkey = c.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE p.p_size <= 10
    ORDER BY c.unit_cost, p_partkey, s.s_name
    LIMIT 100
    """,
)
def q_min_cost_supplier(t: Frames) -> DataFrame:
    """TPC-H Q2 shape ("minimum cost supplier"): for each small part,
    the supplier(s) achieving the minimum observed unit price — the
    correlated scalar-subquery pattern (WHERE cost = (SELECT MIN ...
    WHERE same part)) decorrelated Spark-side as a MIN window over the
    partkey partition + equality filter, so the per-part minimum never
    re-scans (the synthetic schema has no partsupp; per-(part, supplier)
    unit costs derive from lineitem). Ties at the minimum all survive,
    exactly like the classic query.

    Scale design: one shuffle on (l_partkey, l_suppkey) for the cost
    agg; the window min rides the SAME partkey partitioning (no second
    shuffle — partial-agg then window); part/supplier/nation broadcast;
    unit costs are rounded AFTER the inner per-(part, supplier) MIN and
    before the per-part window MIN / equality compare, so double
    division noise cannot flip the min-equality between engines (both
    engines apply the identical rounding at the same point); top-100 is
    TakeOrderedAndProject."""
    # r16 (guide §3.2 — reduce the big side before shuffling it): the
    # p_size filter lands on the PART side only, so the lineitem agg
    # used to shuffle every part's lines and the window dropped ~80%
    # of them afterwards. A semi-join on the filtered part keys prunes
    # lineitem BEFORE the (l_partkey, l_suppkey) exchange; the per-part
    # window min is partkey-local, so removing whole partkeys cannot
    # change any surviving row — the final inner join applied the same
    # cut anyway.
    small_parts = t["part"].filter(F.col("p_size") <= 10).select("p_partkey", "p_brand")
    costs = (
        t["lineitem"]
        .join(
            small_parts.select("p_partkey"),
            F.col("l_partkey") == F.col("p_partkey"),
            "left_semi",
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(_r4(F.min(F.col("l_extendedprice") / F.col("l_quantity"))).alias("unit_cost"))
    )
    w = Window.partitionBy("l_partkey")
    best = costs.withColumn("min_cost", F.min("unit_cost").over(w)).filter(
        F.col("unit_cost") == F.col("min_cost")
    )
    supp = t["supplier"].select("s_suppkey", "s_name", "s_nationkey")
    nat = t["nation"].select("n_nationkey", "n_name")
    return (
        best.join(small_parts, F.col("l_partkey") == F.col("p_partkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            "p_brand",
            "s_name",
            "n_name",
            "unit_cost",
        )
        .orderBy("unit_cost", "p_partkey", "s_name")
        .limit(100)
    )


# --- TPC-H Q5: local supplier volume (same-nation residual) -----------------
@_register(
    "q_local_supplier_volume",
    f"""
    SELECT n.n_name AS n_name,
           {_r4s('SUM(l.l_extendedprice * (1 - l.l_discount))')} AS revenue,
           COUNT(*) AS n_lines
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
                   AND s.s_nationkey = c.c_nationkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n.n_name
    """,
)
def q_local_supplier_volume(t: Frames) -> DataFrame:
    """TPC-H Q5 shape ("local supplier volume",
    reference/sql parity family): revenue per nation where the
    CUSTOMER and the LINE's SUPPLIER sit in the same nation of one
    region — the classic same-nation residual (c_nationkey =
    s_nationkey) that is NOT a star-schema key equi-join but a
    cross-dimension equality riding the supplier probe.

    Scale design: the date range is scan-pushed into orders; the only
    fact-fact shuffle is orders⋈lineitem on orderkey; customer and
    supplier are UNHINTED per the module broadcast policy (the planner
    broadcasts them from size stats while they fit, AQE shuffles them
    past that — no forced full-dim broadcast to OOM the driver at
    100×), and the same-nation residual rides the supplier join
    condition so mismatched rows die during the probe, never
    materializing; nation/region (fixed 25/5 rows) keep their explicit
    hints and the region filter prunes the nation build side to 1/5
    before the probe. One final (n_name) agg with map-side partials."""
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    asia_nations = (
        t["nation"]
        .join(
            F.broadcast(t["region"].filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
    )
    cust = t["customer"].select("c_custkey", "c_nationkey")
    supp = t["supplier"].select("s_suppkey", "s_nationkey")
    j = (
        t["lineitem"]
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(
            supp,
            (F.col("s_suppkey") == F.col("l_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .join(F.broadcast(asia_nations), F.col("n_nationkey") == F.col("s_nationkey"))
    )
    return j.groupBy("n_name").agg(
        _r4(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"),
        F.count("*").alias("n_lines"),
    )


# --- TPC-H Q8: national market share (conditional share ratio) --------------
MKT_SHARE_NATION = "NATION_2"


@_register(
    "q_market_share",
    f"""
    WITH all_nations AS (
      SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS INTEGER) AS o_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume,
             n2.n_name AS nation
      FROM part p
      JOIN lineitem l ON l.l_partkey = p.p_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = n1.n_regionkey
      JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
      WHERE r.r_name = 'AMERICA'
        AND p.p_type = 'ECONOMY'
        AND o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        AND o.o_orderdate < TIMESTAMP '2001-01-01 00:00:00'
    ),
    shares AS (
      SELECT o_year,
             {_r4s(f"SUM(CASE WHEN nation = '{MKT_SHARE_NATION}' THEN volume ELSE 0 END)")}
               AS nation_volume,
             {_r4s('SUM(volume)')} AS total_volume
      FROM all_nations
      GROUP BY o_year
    )
    SELECT o_year, nation_volume, total_volume,
           {_r4s('nation_volume / total_volume')} AS mkt_share
    FROM shares
    """,
)
def q_market_share(t: Frames) -> DataFrame:
    """TPC-H Q8 shape ("national market share"): within one region's
    customers and one part type, the yearly revenue share supplied by
    one nation — the two-nation-alias pattern (customer nation gates
    the region, supplier nation feeds the share numerator) plus the
    conditional-sum-over-sum ratio.

    Determinism: both engines round the two sums to 4 decimals FIRST
    and divide the rounded values, then round the ratio — double
    summation-order noise (≪ 1e-4 at these magnitudes) cannot leak
    into the share. Scale design: part is filtered to one type before
    its join (probe-side lineitem prune); part/customer/supplier are
    UNHINTED per the module broadcast policy (size-gated by the
    planner/AQE, shuffle-join past the threshold) while the two
    nation aliases and region keep their fixed-cardinality hints;
    orders⋈lineitem is the single fact-fact shuffle, then one
    (o_year) agg with map-side partials — same exchange count as Q7;
    the CASE numerator rides the same agg (no second pass)."""
    econ_parts = t["part"].filter(F.col("p_type") == "ECONOMY").select("p_partkey")
    am_nations = (
        t["nation"]
        .join(
            F.broadcast(t["region"].filter(F.col("r_name") == "AMERICA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select(F.col("n_nationkey").alias("cn_key"))
    )
    supp_nation = t["nation"].select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("nation")
    )
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("2001-01-01 00:00:00").cast("timestamp"))
    )
    j = (
        t["lineitem"]
        .join(econ_parts, F.col("p_partkey") == F.col("l_partkey"))
        .join(t["supplier"], F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t["customer"], F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(am_nations), F.col("cn_key") == F.col("c_nationkey"))
        .join(F.broadcast(supp_nation), F.col("sn_key") == F.col("s_nationkey"))
    )
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    shares = j.groupBy(
        F.year("o_orderdate").cast("int").alias("o_year")
    ).agg(
        _r4(
            F.sum(F.when(F.col("nation") == MKT_SHARE_NATION, volume).otherwise(F.lit(0.0)))
        ).alias("nation_volume"),
        _r4(F.sum(volume)).alias("total_volume"),
    )
    return shares.select(
        "o_year",
        "nation_volume",
        "total_volume",
        _r4(F.col("nation_volume") / F.col("total_volume")).alias("mkt_share"),
    )


# --- TPC-H Q10: returned-item reporting (top revenue-loss customers) --------
@_register(
    "q_returned_item_customers",
    f"""
    SELECT c.c_custkey, c.c_name,
           {_r4s('SUM(l.l_extendedprice * (1 - l.l_discount))')} AS revenue,
           {_r4s('c.c_acctbal')} AS c_acctbal, n.n_name
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def q_returned_item_customers(t: Frames) -> DataFrame:
    """TPC-H Q10 shape ("returned item reporting"): the customers who
    returned the most revenue in a window — the support-desk /
    fraud-triage list. Joins the full fact path but every predicate is
    fact-side-prunable.

    Scale design: the half-year range is scan-pushed into orders and
    the returnflag equality into lineitem BEFORE the orderkey shuffle;
    customer/nation broadcast; the (custkey, name, acctbal, nation)
    agg partial-aggregates map-side; top-20 is TakeOrderedAndProject
    (revenue desc, custkey tiebreak for cross-engine determinism)."""
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
    )
    returned = t["lineitem"].filter(F.col("l_returnflag") == "R")
    cust = t["customer"].select("c_custkey", "c_name", "c_acctbal", "c_nationkey")
    nat = t["nation"].select("n_nationkey", "n_name")
    j = (
        returned.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(nat), F.col("n_nationkey") == F.col("c_nationkey"))
    )
    return (
        j.groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            _r4(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "revenue"
            )
        )
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            _r4(F.col("c_acctbal")).alias("c_acctbal"),
            "n_name",
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# --- TPC-H Q19: discounted revenue (OR-of-ANDs disjunctive predicate) -------
@_register(
    "q_disjunctive_revenue",
    f"""
    SELECT {_r4s('SUM(l.l_extendedprice * (1 - l.l_discount))')} AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity >= 1 AND l.l_quantity <= 15)
       OR (p.p_brand = 'Brand#7' AND p.p_size BETWEEN 5 AND 25
           AND l.l_quantity >= 10 AND l.l_quantity <= 30)
       OR (p.p_brand = 'Brand#13' AND p.p_size BETWEEN 20 AND 50
           AND l.l_quantity >= 25 AND l.l_quantity <= 50)
    """,
)
def q_disjunctive_revenue(t: Frames) -> DataFrame:
    """TPC-H Q19 shape ("discounted revenue"): one scalar revenue over
    an OR of three (brand ∧ size-range ∧ quantity-range) conjuncts —
    the classic disjunctive-predicate planning test. The adaptation
    drops the container/shipmode literals the synthetic schema lacks;
    the planning shape (cross-table OR) is what matters.

    Scale design: Catalyst pushes the UNION of the per-table bounds to
    each scan — lineitem gets l_quantity ∈ [1, 50] (the OR-hull) and
    part gets the brand-set IN filter — then the broadcast part join
    evaluates the full disjunction as the join residual; no
    nested-loop, a single scalar agg with map-side partials. Plan
    pinned in tests/test_plans_perf.py: part broadcasts, the residual
    Or-condition sits ON the BroadcastHashJoin, no fact shuffle at
    all (scalar partial agg → single final row)."""
    p = t["part"].select("p_partkey", "p_brand", "p_size")
    li = t["lineitem"].select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(1, 15)
        )
        | (
            (F.col("p_brand") == "Brand#7")
            & F.col("p_size").between(5, 25)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#13")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(25, 50)
        )
    )
    j = li.join(p, F.col("p_partkey") == F.col("l_partkey")).filter(cond)
    return j.agg(
        _r4(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"),
        F.count("*").alias("n_lines"),
    )


# --- TPC-H Q20: potential part promotion (nested semi-joins) ----------------
@_register(
    "q_dominant_suppliers",
    f"""
    WITH q AS (
      SELECT l_partkey, l_suppkey, SUM(l_quantity) AS qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY l_partkey, l_suppkey
    ),
    tot AS (
      SELECT l_partkey, SUM(qty) AS total_qty FROM q GROUP BY l_partkey
    ),
    qual AS (
      SELECT DISTINCT q.l_suppkey
      FROM q
      JOIN tot ON tot.l_partkey = q.l_partkey
      WHERE q.qty > 0.5 * tot.total_qty
        AND q.l_partkey IN (
          SELECT p_partkey FROM part WHERE p_name LIKE 'blue%'
        )
    )
    SELECT s.s_suppkey, s.s_name, n.n_name
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE s.s_suppkey IN (SELECT l_suppkey FROM qual)
    ORDER BY s.s_name, s.s_suppkey
    """,
)
def q_dominant_suppliers(t: Frames) -> DataFrame:
    """TPC-H Q20 shape ("potential part promotion"): suppliers who
    shipped MORE THAN HALF of a blue part's total 1997 quantity — the
    double-nested-subquery pattern (IN over a correlated quantity
    threshold over an IN over a LIKE-filtered dim), decorrelated the
    Q2 way: the per-part total rides a window over the SAME partkey
    partitioning as the (partkey, suppkey) agg (no second shuffle),
    the part-name gate is a broadcast LEFT SEMI before the heavy
    window, and the supplier gate is a LEFT SEMI on the distinct
    dominant-supplier set. The adaptation derives "availability" from
    shipped quantity (the synthetic schema has no partsupp); the
    >50%-share threshold keeps Q20's dominance semantics.

    Determinism: l_quantity is integral-valued, so the SUMs and the
    0.5× comparison are exact in both engines — no rounding needed.
    Scale design: one shuffle on (l_partkey, l_suppkey); window and
    per-part total reuse the partkey prefix; part/nation broadcast;
    the final supplier semi-join probes a distinct suppkey set."""
    year = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    blue = t["part"].filter(F.col("p_name").startswith("blue")).select("p_partkey")
    q = (
        year.join(blue, F.col("p_partkey") == F.col("l_partkey"), "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    w = Window.partitionBy("l_partkey")
    qual = (
        q.withColumn("total_qty", F.sum("qty").over(w))
        .filter(F.col("qty") > 0.5 * F.col("total_qty"))
        .select("l_suppkey")
        .distinct()
    )
    nat = t["nation"].select("n_nationkey", "n_name")
    return (
        t["supplier"]
        .join(qual, F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .join(F.broadcast(nat), F.col("n_nationkey") == F.col("s_nationkey"))
        .select("s_suppkey", "s_name", "n_name")
        .orderBy("s_name", "s_suppkey")
    )


# --- TPC-H Q14: promotion effect (conditional revenue share) ----------------
_Q14_PROMO = (
    "SUM(CASE WHEN p.p_type = 'PROMO' "
    "THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END)"
)
_Q14_TOTAL = "SUM(l.l_extendedprice * (1 - l.l_discount))"


@_register(
    "q_promo_revenue_share",
    f"""
    SELECT {_r4s(_Q14_PROMO)} AS promo_revenue,
           {_r4s(_Q14_TOTAL)} AS total_revenue,
           {_r4s(f"{_r4s(_Q14_PROMO)} * 100.0 / {_r4s(_Q14_TOTAL)}")} AS promo_pct
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1997-10-01 00:00:00'
    """,
)
def q_promo_revenue_share(t: Frames) -> DataFrame:
    """TPC-H Q14 shape ("promotion effect"): the percentage of one
    month's revenue that came from PROMO-type parts — the scalar
    conditional-share query a marketing dashboard refreshes. Both
    sums are rounded before the division (the Q8 determinism rule).

    Scale design: the month is scan-pushed into lineitem; part
    broadcasts with only (partkey, type); ONE scalar agg carries both
    the CASE numerator and the denominator (single pass, map-side
    partials, SinglePartition final over 32 partial rows)."""
    month = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01 00:00:00").cast("timestamp"))
    )
    p = t["part"].select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    agg = (
        month.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .agg(
            _r4(
                F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0)))
            ).alias("promo_revenue"),
            _r4(F.sum(rev)).alias("total_revenue"),
        )
    )
    return agg.select(
        "promo_revenue",
        "total_revenue",
        _r4(F.col("promo_revenue") * 100.0 / F.col("total_revenue")).alias("promo_pct"),
    )


# --- TPC-H Q9: product-type profit (derived supply cost, nation-year) -------
#: supply-cost proxy: the synthetic schema has no partsupp, so cost is
#: derived from lineitem itself — 80% of the (part, supplier) average
#: unit price, rounded BEFORE use so both engines join on identical
#: doubles (the Q2 derived-cost idiom)
Q9_COST_FACTOR = 0.8


@_register(
    "q_product_profit",
    f"""
    WITH cost AS (
      SELECT l_partkey, l_suppkey,
             {_r4s(f'{Q9_COST_FACTOR} * AVG(l_extendedprice / l_quantity)')}
               AS supply_cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    )
    SELECT n.n_name AS nation,
           CAST(EXTRACT(year FROM o.o_orderdate) AS INTEGER) AS o_year,
           {_r4s('SUM(l.l_extendedprice * (1 - l.l_discount)'
                 ' - c.supply_cost * l.l_quantity)')} AS profit
    FROM lineitem l
    JOIN cost c ON c.l_partkey = l.l_partkey AND c.l_suppkey = l.l_suppkey
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE 'red%'
    GROUP BY n.n_name, 2
    """,
)
def q_product_profit(t: Frames) -> DataFrame:
    """TPC-H Q9 shape ("product type profit measure"): profit on red
    parts per (supplier nation, order year), where profit = revenue −
    supply_cost × quantity. partsupp doesn't exist in the synthetic
    schema, so supply cost derives from lineitem itself (Q9_COST_FACTOR
    × the per-(part, supplier) average unit price — the Q2 idiom),
    rounded before use so the join carries identical doubles in both
    engines.

    Scale design: the red-part key set semi-prunes lineitem BEFORE
    the heavy cost aggregation; the cost table comes from one
    (partkey, suppkey) shuffle and joins back to lineitem on the same
    compound key (AQE co-locates); red/supplier are UNHINTED per the
    module broadcast policy (planner/AQE size-gates the broadcast)
    while nation keeps its fixed-cardinality hint; orders⋈lineitem is
    the one remaining fact-fact shuffle; final (nation, year) agg
    partials map-side."""
    red = t["part"].filter(F.col("p_name").startswith("red")).select("p_partkey")
    li = t["lineitem"].join(red, F.col("p_partkey") == F.col("l_partkey"), "left_semi")
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        _r4(
            F.lit(Q9_COST_FACTOR) * F.avg(F.col("l_extendedprice") / F.col("l_quantity"))
        ).alias("supply_cost")
    ).withColumnsRenamed({"l_partkey": "c_partkey", "l_suppkey": "c_suppkey"})
    supp = t["supplier"].select("s_suppkey", "s_nationkey")
    nat = t["nation"].select("n_nationkey", F.col("n_name").alias("nation"))
    j = (
        li.join(
            cost,
            (F.col("c_partkey") == F.col("l_partkey"))
            & (F.col("c_suppkey") == F.col("l_suppkey")),
        )
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(supp, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(nat), F.col("n_nationkey") == F.col("s_nationkey"))
    )
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "supply_cost"
    ) * F.col("l_quantity")
    return j.groupBy(
        "nation", F.year("o_orderdate").cast("int").alias("o_year")
    ).agg(_r4(F.sum(profit)).alias("profit"))


# --- TPC-H Q16: parts/supplier relationship (anti-join + countDistinct) -----
@_register(
    "q_parts_supplier_relationship",
    f"""
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def q_parts_supplier_relationship(t: Frames) -> DataFrame:
    """TPC-H Q16 shape ("parts/supplier relationship"): how many
    distinct suppliers can deliver each (brand, type, size) variant,
    excluding one brand, a size list, and a supplier blacklist (the
    classic NOT IN complaint-supplier subquery — here: negative
    account balance, since s_comment doesn't exist in the synthetic
    schema). partsupp is absent, so the supplier-part relationships
    come from observed lineitem shipments.

    Scale design: the size/brand filters broadcast with part and
    prune lineitem during the probe; the blacklist NOT IN lands as a
    broadcast LEFT ANTI on suppkey (tiny build side); countDistinct
    expands to the two-phase distinct-then-count aggregate pair with
    map-side partials on (brand, type, size, suppkey)."""
    parts = t["part"].filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    blacklist = t["supplier"].filter(F.col("s_acctbal") < 0).select("s_suppkey")
    j = (
        t["lineitem"]
        .join(parts, F.col("p_partkey") == F.col("l_partkey"))
        .join(
            blacklist,
            F.col("s_suppkey") == F.col("l_suppkey"),
            "left_anti",
        )
    )
    return j.groupBy("p_brand", "p_type", "p_size").agg(
        F.countDistinct("l_suppkey").cast("long").alias("supplier_cnt")
    )


# --- TPC-H Q11: important inventory (HAVING vs global-fraction scalar) ------
Q11_NATION = "NATION_3"
#: dominance threshold: parts worth more than this multiple of the MEAN
#: per-part value — scale-free (the classic 0.0001/SF literal degenerates
#: to 0 or all rows as the corpus grows; a mean-relative cut never does)
Q11_MEAN_MULTIPLE = 2.0


@_register(
    "q_important_inventory",
    f"""
    WITH nation_value AS (
      SELECT l.l_partkey,
             {_r4s('SUM(l.l_extendedprice * (1 - l.l_discount))')} AS part_value
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name = '{Q11_NATION}'
      GROUP BY l.l_partkey
    ),
    total AS (
      SELECT {_r4s('SUM(part_value)')} AS nation_total,
             CAST(COUNT(*) AS BIGINT) AS n_parts
      FROM nation_value
    )
    SELECT v.l_partkey AS p_partkey, v.part_value,
           {_r4s('v.part_value / t.nation_total')} AS value_share
    FROM nation_value v CROSS JOIN total t
    WHERE v.part_value > {Q11_MEAN_MULTIPLE} * t.nation_total / t.n_parts
    ORDER BY v.part_value DESC, v.l_partkey
    """,
)
def q_important_inventory(t: Frames, checkpoint: bool = True) -> DataFrame:
    """TPC-H Q11 shape ("important stock identification"): the parts
    holding an outsized share of one nation's shipped value — the
    grouped-HAVING-against-a-global-scalar pattern (HAVING SUM(...) >
    fraction × (SELECT SUM over the same slice)). partsupp is absent,
    so "inventory value" derives from shipped lineitem value of the
    nation's suppliers — the dominance semantics survive intact.

    Determinism: per-part values are rounded once, the grand total is
    the rounded sum OF the rounded values, the mean-multiple threshold
    derives from that rounded total and an exact count, and the
    strict > compares identical doubles in both engines. Scale design: the nation's
    supplier set broadcasts (semi-prunes lineitem during the probe);
    ONE (partkey) agg shuffle; the grand total is a broadcast 1-row
    re-aggregate of the per-part table (never a second corpus pass);
    the threshold filter and share projection ride the crossJoin of
    that single row."""
    nat_suppliers = (
        t["supplier"]
        .join(
            F.broadcast(t["nation"].filter(F.col("n_name") == Q11_NATION)),
            F.col("n_nationkey") == F.col("s_nationkey"),
        )
        .select("s_suppkey")
    )
    value = (
        t["lineitem"]
        .join(
            nat_suppliers,
            F.col("s_suppkey") == F.col("l_suppkey"),
            "left_semi",
        )
        .groupBy("l_partkey")
        .agg(
            _r4(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "part_value"
            )
        )
    )
    if checkpoint:
        # feeds the total AND the filter side once; tests pass
        # checkpoint=False to pin the full (un-truncated) plan shape
        value = value.localCheckpoint(eager=False)
    total = value.agg(
        _r4(F.sum("part_value")).alias("nation_total"),
        F.count("*").cast("long").alias("n_parts"),
    )
    return (
        value.crossJoin(F.broadcast(total))
        .filter(
            F.col("part_value")
            > Q11_MEAN_MULTIPLE * F.col("nation_total") / F.col("n_parts")
        )
        .select(
            F.col("l_partkey").alias("p_partkey"),
            "part_value",
            _r4(F.col("part_value") / F.col("nation_total")).alias("value_share"),
        )
        .orderBy(F.desc("part_value"), F.asc("p_partkey"))
    )


# --- TPC-H Q12: late shipments by class (conditional priority counts) ------
@_register(
    "q_late_shipment_priority",
    f"""
    SELECT l.l_returnflag AS ship_class,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= o.o_orderdate + INTERVAL 60 DAY
      AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l.l_returnflag
    """,
)
def q_late_shipment_priority(t: Frames) -> DataFrame:
    """TPC-H Q12 shape ("shipping modes and order priority"): how many
    high- vs low-priority orders ride each shipment class, restricted
    to LATE shipments — the cross-table date-arithmetic residual
    (l_shipdate ≥ o_orderdate + 60 days; the synthetic schema lacks
    shipmode/commit/receipt dates, so returnflag plays the class and
    the ship-after-order lag plays "late"). Both engines evaluate the
    identical day-interval arithmetic on identical instants.

    Scale design: the year window is scan-pushed into lineitem; the
    date-lag predicate cannot prune at scan (it needs both tables) and
    correctly lands as the join RESIDUAL on the single orderkey
    shuffle; the two conditional counts ride one (returnflag) agg with
    map-side partials."""
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    j = li.join(
        t["orders"],
        (F.col("o_orderkey") == F.col("l_orderkey"))
        & (F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return j.groupBy(F.col("l_returnflag").alias("ship_class")).agg(
        F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
        F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_line_count"),
    )


# --- RFM customer segmentation (quantile-banded scores, scale-safe) ---------
@_register(
    "q_customer_rfm",
    f"""
    WITH per_cust AS (
      SELECT o_custkey,
             datediff('day', DATE '1970-01-01', CAST(MAX(o_orderdate) AS DATE))
               AS recency_days,
             CAST(COUNT(*) AS BIGINT) AS frequency,
             {dround_sql('SUM(o_totalprice)', 2)} AS monetary
      FROM orders GROUP BY o_custkey
    ),
    b AS (
      SELECT quantile_cont(recency_days, 0.25) AS r1,
             quantile_cont(recency_days, 0.50) AS r2,
             quantile_cont(recency_days, 0.75) AS r3,
             quantile_cont(frequency, 0.25) AS f1,
             quantile_cont(frequency, 0.50) AS f2,
             quantile_cont(frequency, 0.75) AS f3,
             quantile_cont(monetary, 0.25) AS m1,
             quantile_cont(monetary, 0.50) AS m2,
             quantile_cont(monetary, 0.75) AS m3
      FROM per_cust
    )
    SELECT o_custkey AS c_custkey, recency_days, frequency, monetary,
           CAST(1 + CASE WHEN recency_days > r1 THEN 1 ELSE 0 END
                  + CASE WHEN recency_days > r2 THEN 1 ELSE 0 END
                  + CASE WHEN recency_days > r3 THEN 1 ELSE 0 END AS INTEGER)
             AS r_score,
           CAST(1 + CASE WHEN frequency > f1 THEN 1 ELSE 0 END
                  + CASE WHEN frequency > f2 THEN 1 ELSE 0 END
                  + CASE WHEN frequency > f3 THEN 1 ELSE 0 END AS INTEGER)
             AS f_score,
           CAST(1 + CASE WHEN monetary > m1 THEN 1 ELSE 0 END
                  + CASE WHEN monetary > m2 THEN 1 ELSE 0 END
                  + CASE WHEN monetary > m3 THEN 1 ELSE 0 END AS INTEGER)
             AS m_score,
           CASE
             WHEN recency_days > r3 AND frequency > f3 AND monetary > m3
               THEN 'champion'
             WHEN recency_days > r2 AND frequency > f2 THEN 'loyal'
             WHEN recency_days <= r2 AND monetary > m2
               THEN 'at_risk_high_value'
             WHEN recency_days <= r1 AND frequency <= f1 THEN 'hibernating'
             ELSE 'regular'
           END AS segment
    FROM per_cust CROSS JOIN b
    """,
)
def q_customer_rfm(t: Frames) -> DataFrame:
    """RFM segmentation — the classic CRM cut: per customer, recency
    (epoch-day of latest order), frequency (order count), monetary
    (total spend), each banded 1-4 against the population QUARTILES,
    then mapped to a named segment (champion / loyal /
    at_risk_high_value / hibernating / regular, first match wins).

    Scale design: the naive formulation is ``ntile(4) OVER (ORDER BY
    metric)`` — an UNPARTITIONED window, i.e. every customer through
    one task: the single worst scale hazard in the window family.
    This plan instead computes the three quartile BOUNDARIES with one
    1-row aggregate (exact interpolated percentile, the
    q_quantity_quantiles precedent: Spark ``percentile`` == DuckDB
    ``quantile_cont``) and bands by comparison — one keyed agg over
    orders plus a scan with a broadcast 1-row crossJoin; nothing is
    globally sorted at any size. Banding by fixed boundaries also
    keeps scores STABLE under tie-heavy metrics (ntile splits ties
    across buckets by arbitrary order; boundary comparison cannot).
    Monetary is rounded to cents before both the quantile and the
    comparison, same discipline as every money sum in this module."""
    per_cust = (
        t["orders"]
        .groupBy("o_custkey")
        .agg(
            F.datediff(
                F.to_date(F.max("o_orderdate")), F.lit("1970-01-01").cast("date")
            ).alias("recency_days"),
            F.count("*").cast("long").alias("frequency"),
            dround(F.sum("o_totalprice"), 2).alias("monetary"),
        )
    )
    bounds = per_cust.agg(
        *[
            F.percentile(m, q).alias(f"{m[0]}{i}")
            for m in ("recency_days", "frequency", "monetary")
            for i, q in ((1, 0.25), (2, 0.50), (3, 0.75))
        ]
    )

    def band(metric: str, prefix: str):
        score = F.lit(1)
        for i in (1, 2, 3):
            score = score + F.when(F.col(metric) > F.col(f"{prefix}{i}"), 1).otherwise(0)
        return score.cast("int")

    seg = (
        F.when(
            (F.col("recency_days") > F.col("r3"))
            & (F.col("frequency") > F.col("f3"))
            & (F.col("monetary") > F.col("m3")),
            "champion",
        )
        .when(
            (F.col("recency_days") > F.col("r2")) & (F.col("frequency") > F.col("f2")),
            "loyal",
        )
        .when(
            (F.col("recency_days") <= F.col("r2")) & (F.col("monetary") > F.col("m2")),
            "at_risk_high_value",
        )
        .when(
            (F.col("recency_days") <= F.col("r1")) & (F.col("frequency") <= F.col("f1")),
            "hibernating",
        )
        .otherwise("regular")
    )
    return per_cust.crossJoin(F.broadcast(bounds)).select(
        F.col("o_custkey").alias("c_custkey"),
        "recency_days",
        "frequency",
        "monetary",
        band("recency_days", "r").alias("r_score"),
        band("frequency", "f").alias("f_score"),
        band("monetary", "m").alias("m_score"),
        seg.alias("segment"),
    )


# --- revenue concentration (Pareto deciles, windowless banding) --------------
@_register(
    "q_revenue_concentration",
    f"""
    WITH per_cust AS (
      SELECT o_custkey, {dround_sql('SUM(o_totalprice)', 2)} AS revenue
      FROM orders GROUP BY o_custkey
    ),
    b AS (
      SELECT quantile_cont(revenue, 0.1) AS q1, quantile_cont(revenue, 0.2) AS q2,
             quantile_cont(revenue, 0.3) AS q3, quantile_cont(revenue, 0.4) AS q4,
             quantile_cont(revenue, 0.5) AS q5, quantile_cont(revenue, 0.6) AS q6,
             quantile_cont(revenue, 0.7) AS q7, quantile_cont(revenue, 0.8) AS q8,
             quantile_cont(revenue, 0.9) AS q9
      FROM per_cust
    ),
    banded AS (
      SELECT revenue,
             1 + CASE WHEN revenue > q1 THEN 1 ELSE 0 END
               + CASE WHEN revenue > q2 THEN 1 ELSE 0 END
               + CASE WHEN revenue > q3 THEN 1 ELSE 0 END
               + CASE WHEN revenue > q4 THEN 1 ELSE 0 END
               + CASE WHEN revenue > q5 THEN 1 ELSE 0 END
               + CASE WHEN revenue > q6 THEN 1 ELSE 0 END
               + CASE WHEN revenue > q7 THEN 1 ELSE 0 END
               + CASE WHEN revenue > q8 THEN 1 ELSE 0 END
               + CASE WHEN revenue > q9 THEN 1 ELSE 0 END AS decile
      FROM per_cust CROSS JOIN b
    )
    SELECT CAST(decile AS INTEGER) AS decile,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           {dround_sql('SUM(revenue)', 2)} AS revenue,
           {_r4s('SUM(revenue) / SUM(SUM(revenue)) OVER ()')} AS revenue_share,
           {_r4s('SUM(SUM(revenue)) OVER (ORDER BY decile DESC) / SUM(SUM(revenue)) OVER ()')}
             AS cum_share_from_top
    FROM banded GROUP BY decile
    """,
)
def q_revenue_concentration(t: Frames) -> DataFrame:
    """Revenue-concentration (Pareto) table: customers banded into
    spend deciles, with each decile's headcount, revenue, revenue
    share, and the cumulative share captured from the TOP decile down
    — the "what fraction of revenue do our top 10/20/30% customers
    carry" question every commercial dashboard asks.

    Scale design: the q_customer_rfm technique — per-customer revenue
    is one o_custkey-keyed partial-agg groupBy; the nine decile
    boundaries are ONE 1-row percentile aggregate (reusing the same
    exchange); banding is a broadcast-crossJoin comparison chain; and
    the share/cumulative windows run over the TEN-row decile
    aggregate, never over customers. No unpartitioned window ever
    sees a corpus-sized frame (contrast: the naive
    ``ntile(10) OVER (ORDER BY revenue)`` + running sum drags every
    customer through one task)."""
    per_cust = (
        t["orders"]
        .groupBy("o_custkey")
        .agg(dround(F.sum("o_totalprice"), 2).alias("revenue"))
    )
    bounds = per_cust.agg(
        *[
            F.percentile("revenue", i / 10.0).alias(f"q{i}")
            for i in range(1, 10)
        ]
    )
    decile = F.lit(1)
    for i in range(1, 10):
        decile = decile + F.when(F.col("revenue") > F.col(f"q{i}"), 1).otherwise(0)
    banded = per_cust.crossJoin(F.broadcast(bounds)).select(
        decile.cast("int").alias("decile"), "revenue"
    )
    agg = banded.groupBy("decile").agg(
        F.count("*").cast("long").alias("n_customers"),
        dround(F.sum("revenue"), 2).alias("revenue"),
    )
    total = Window.partitionBy()
    from_top = Window.partitionBy().orderBy(F.desc("decile")).rangeBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return agg.select(
        "decile",
        "n_customers",
        "revenue",
        _r4(F.col("revenue") / F.sum("revenue").over(total)).alias("revenue_share"),
        _r4(
            F.sum("revenue").over(from_top) / F.sum("revenue").over(total)
        ).alias("cum_share_from_top"),
    )


# --- DAU / WAU stickiness (trailing-window distinct, windowless) -------------
@_register(
    "q_events_dau_wau",
    f"""
    WITH du AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
    ),
    bounds AS (SELECT MIN(day) AS dmin, MAX(day) AS dmax FROM du),
    dau AS (
      SELECT day, CAST(COUNT(*) AS BIGINT) AS dau FROM du GROUP BY day
    ),
    contrib AS (
      SELECT du.user_id, du.day + CAST(i.i AS INTEGER) AS day
      FROM du CROSS JOIN (SELECT unnest(generate_series(0, 6)) AS i) i
    ),
    wau AS (
      SELECT day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau
      FROM contrib GROUP BY day
    )
    SELECT d.day, d.dau, w.wau,
           {dround_sql('CAST(d.dau AS DOUBLE) / w.wau')} AS stickiness
    FROM dau d JOIN wau w ON d.day = w.day
    CROSS JOIN bounds b
    WHERE d.day BETWEEN b.dmin AND b.dmax
    """,
)
def q_events_dau_wau(t: Frames) -> DataFrame:
    """DAU / trailing-7-day WAU / stickiness per day — the engagement
    dashboard's headline ratio. WAU(d) counts distinct users active in
    [d-6, d].

    Scale design: the naive WAU is a RANGE SELF-JOIN of the activity
    table against itself (every day joined to its 7-day history —
    corpus x 7 shuffle fan-out on the JOIN side) or a windowed
    COUNT(DISTINCT) (unsupported / state-heavy). This plan inverts it:
    each distinct (user, day) pair CONTRIBUTES itself to the 7 target
    days it keeps alive (a bounded 7-row explode — a projection, not a
    join), and WAU is then one keyed distinct-agg per target day. Two
    keyed aggregations over a x7 projection of the DISTINCT pair
    table, no self-join, no window; the final day filter drops the
    spill past max(day). Both engines compute the identical
    date+integer arithmetic; counts are exact, so the oracle is
    exact."""
    du = (
        t["events"]
        .select(F.to_date("ts").alias("day"), "user_id")
        .distinct()
    )
    dau = du.groupBy("day").agg(F.count("*").cast("long").alias("dau"))
    contrib = du.select(
        "user_id",
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("i"),
        "day",
    ).select("user_id", F.date_add("day", F.col("i")).alias("day"))
    wau = contrib.groupBy("day").agg(
        F.countDistinct("user_id").cast("long").alias("wau")
    )
    bounds = du.agg(F.min("day").alias("dmin"), F.max("day").alias("dmax"))
    return (
        dau.join(wau, "day")
        .crossJoin(F.broadcast(bounds))
        .filter(F.col("day").between(F.col("dmin"), F.col("dmax")))
        .select(
            "day",
            "dau",
            "wau",
            dround(F.col("dau").cast("double") / F.col("wau")).alias("stickiness"),
        )
    )


# --- robust (MAD) revenue anomaly — windowless, outlier-proof ----------------
@_register(
    "q_revenue_anomaly_mad",
    f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             SUM(o_totalprice) AS revenue
      FROM orders GROUP BY 1
    ),
    med AS (SELECT quantile_cont(revenue, 0.5) AS med FROM daily),
    mad AS (
      SELECT quantile_cont(abs(revenue - med), 0.5) AS mad
      FROM daily, med
    )
    SELECT day, {dround_sql('revenue', 2)} AS revenue,
           {_r4s('(revenue - med) / (1.4826 * mad)')} AS robust_z
    FROM daily, med, mad
    WHERE mad > 0 AND abs(revenue - med) > 3 * 1.4826 * mad
    """,
)
def q_revenue_anomaly_mad(t: Frames) -> DataFrame:
    """Robust daily-revenue anomaly flags: days whose total revenue
    sits more than 3 robust standard deviations (1.4826·MAD — the
    consistency constant that makes MAD estimate σ under normality)
    from the population MEDIAN. The median/MAD pair is the
    outlier-proof twin of ``q_revenue_anomaly_zscore``'s mean/stddev:
    a handful of extreme days inflate the mean AND the stddev enough
    to mask each other (the masking problem), while the median and
    MAD have 50% breakdown — the detector the fraud dashboard wants
    when the contamination is exactly what it is looking for.

    Scale design: the windowless-banding family (q_customer_rfm
    precedent) — one keyed day-agg collapses orders to O(days) rows,
    then TWO 1-row exact-percentile aggregates (median, then median
    absolute deviation) ride broadcast crossJoins; nothing is
    globally sorted, no window anywhere. Spark ``percentile`` ==
    DuckDB ``quantile_cont`` (both linear interpolation), so the
    oracle is exact under the dround discipline.

    Degenerate guard (round-12 advice): when ≥50% of days share the
    median revenue, MAD = 0 and ``(revenue - med) / (1.4826·mad)``
    is a division by zero — Spark double division yields ±Infinity
    while DuckDB yields NULL, so both sides filter ``mad > 0``
    explicitly: a zero-spread population has no MAD-detectable
    outliers by construction, and the engines stay bit-agreed."""
    daily = t["orders"].groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(F.sum("o_totalprice").alias("revenue"))
    med = daily.agg(F.percentile("revenue", 0.5).alias("med"))
    dev = daily.crossJoin(F.broadcast(med)).withColumn(
        "adev", F.abs(F.col("revenue") - F.col("med"))
    )
    mad = dev.agg(F.percentile("adev", 0.5).alias("mad"))
    return (
        dev.crossJoin(F.broadcast(mad))
        .filter(
            (F.col("mad") > 0) & (F.col("adev") > 3 * 1.4826 * F.col("mad"))
        )
        .select(
            "day",
            dround(F.col("revenue"), 2).alias("revenue"),
            _r4(
                (F.col("revenue") - F.col("med")) / (1.4826 * F.col("mad"))
            ).alias("robust_z"),
        )
    )


# --- Benford first-digit conformance (fraud-analytics screen) ----------------
@_register(
    "q_orders_benford",
    f"""
    WITH digits AS (
      SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
                  AS BIGINT) AS digit
      FROM orders WHERE o_totalprice >= 1
    ),
    counts AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM digits GROUP BY digit),
    total AS (SELECT CAST(SUM(n) AS DOUBLE) AS t FROM counts)
    SELECT digit, n,
           {_r4s('n / t')} AS observed_p,
           {_r4s('log10(1.0 + 1.0 / digit)')} AS benford_p,
           {_r4s('pow(n - t * log10(1.0 + 1.0 / digit), 2) / (t * log10(1.0 + 1.0 / digit))')} AS chi2_term
    FROM counts, total
    """,
)
def q_orders_benford(t: Frames) -> DataFrame:
    """Benford's-law first-digit screen over order totals — the
    classic forensic-accounting test the fraud domain runs on amount
    columns: fabricated numbers over-represent mid digits, organic
    multiplicative processes follow P(d) = log10(1 + 1/d). One row
    per leading digit with the observed share, the Benford share, and
    the chi-square contribution (sum the column for the test
    statistic; 8 dof against the 9-digit law).

    Scale design: one digit-keyed count with map-side partials (9
    output rows) + a 1-row total on a broadcast crossJoin — the
    windowless family's cheapest member; the digit extraction is
    per-row string arithmetic inside codegen. Exact closed form in
    both engines (integer counts, log10/pow on identical doubles), so
    the oracle is exact under dround."""
    digits = (
        t["orders"]
        .filter(F.col("o_totalprice") >= 1)
        .select(
            F.substring(
                F.floor("o_totalprice").cast("long").cast("string"), 1, 1
            )
            .cast("long")
            .alias("digit")
        )
    )
    counts = digits.groupBy("digit").agg(F.count("*").cast("long").alias("n"))
    total = counts.agg(F.sum("n").cast("double").alias("t"))
    benford = F.log10(1.0 + 1.0 / F.col("digit"))
    return counts.crossJoin(F.broadcast(total)).select(
        "digit",
        "n",
        _r4(F.col("n") / F.col("t")).alias("observed_p"),
        _r4(benford).alias("benford_p"),
        _r4(
            F.pow(F.col("n") - F.col("t") * benford, 2) / (F.col("t") * benford)
        ).alias("chi2_term"),
    )


# --- market-basket pair mining (association analysis) ------------------------
#: THE distinct co-occurring pair stream + supported pair counts —
#: one definition shared by q_market_basket_pairs, q_basket_rules and
#: both their oracles (the _BIGRAM_EXPR discipline: a second copy
#: WILL drift on the DISTINCT or the support floor).
_BASKET_PAIRS_SQL = """
    pairs AS (
      SELECT DISTINCT a.l_orderkey, a.l_partkey AS part_a, b.l_partkey AS part_b
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    pc AS (
      SELECT part_a, part_b, CAST(COUNT(*) AS BIGINT) AS n_ab
      FROM pairs GROUP BY part_a, part_b HAVING COUNT(*) >= 2
    )
"""


def _basket_sets(lines: DataFrame) -> DataFrame:
    """One row per order with its DISTINCT part set — the shared
    surface under pairs, per-item order counts and the order total
    (r16, guide §2.3 "aggregate before you shuffle" / §2.4 "remove
    shuffles outright"): collect_set is a keyed aggregation with
    map-side partials, so the basket projection crosses the wire once,
    already deduplicated, instead of riding a self-join whose pair
    fan-out then needs a 3-column DISTINCT exchange. Null orderkeys
    are dropped up front — the old equi-join never matched them, and
    COUNT(DISTINCT l_orderkey) ignores them, so the filter preserves
    both semantics exactly."""
    return (
        lines.filter(F.col("l_orderkey").isNotNull())
        .groupBy("l_orderkey")
        .agg(F.collect_set("l_partkey").alias("parts"))
    )


def _basket_pair_counts(lines: DataFrame) -> DataFrame:
    """Supported distinct-pair counts (n_ab ≥ 2) from a
    (l_orderkey, l_partkey) projection — the Spark half of
    ``_BASKET_PAIRS_SQL``.

    r16 restructure: pairs explode from the per-order distinct part
    set (:func:`_basket_sets`). A set member pair (a < b) is exactly a
    DISTINCT (l_orderkey, part_a, part_b) triple of the old self-join
    — same pair stream by construction — but the plan drops from
    scan×2 + broadcast build + pair-stream DISTINCT exchange + count
    exchange to scan×1 + one keyed set agg + the count exchange
    (plans/r16/q_market_basket_pairs_{before,after}.txt). Fan-out is
    still bounded by max basket size (B² per order pre-filter)."""
    sets_ = _basket_sets(lines)
    pairs = (
        sets_.select(F.explode("parts").alias("part_a"), "parts")
        .select("part_a", F.explode("parts").alias("part_b"))
        .filter(F.col("part_a") < F.col("part_b"))
    )
    return (
        pairs.groupBy("part_a", "part_b")
        .agg(F.count("*").cast("long").alias("n_ab"))
        .filter(F.col("n_ab") >= 2)
    )


@_register(
    "q_market_basket_pairs",
    f"""
    WITH {_BASKET_PAIRS_SQL.strip()}
    SELECT part_a, part_b, n_ab AS n_orders FROM pc
    """,
)
def q_market_basket_pairs(t: Frames) -> DataFrame:
    """Frequent co-purchased part pairs (support ≥ 2 orders) — the
    A-priori pair-counting core of market-basket analysis, and the
    second similarity-JOIN family here that never goes all-pairs
    against the full catalog.

    Scale design: the self-join is keyed on l_orderkey, so the
    fan-out is Σ B(o)² over basket sizes — bounded by the max basket
    (7 lines in TPC-H; the documented association-mining cost at any
    scale), NOT catalog². The DISTINCT collapses a part appearing
    twice in one order before counting (support counts ORDERS, not
    line pairs); the pair count is one keyed agg with map-side
    partials and the support filter prunes the long tail before any
    downstream join. A-priori's k>2 levels compose the same way:
    join the survivors back to the basket projection."""
    lines = t["lineitem"].select("l_orderkey", "l_partkey")
    return _basket_pair_counts(lines).withColumnRenamed("n_ab", "n_orders")


# --- association rules over the basket pairs ---------------------------------
@_register(
    "q_basket_rules",
    f"""
    WITH {_BASKET_PAIRS_SQL.strip()},
    item AS (
      SELECT l_partkey, CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_item
      FROM lineitem GROUP BY l_partkey
    ),
    tot AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS DOUBLE) AS n FROM lineitem)
    SELECT pc.part_a, pc.part_b, pc.n_ab,
           {_r4s('pc.n_ab / ia.n_item')} AS conf_a_to_b,
           {_r4s('pc.n_ab / ib.n_item')} AS conf_b_to_a,
           {_r4s('(pc.n_ab * tot.n) / (ia.n_item * ib.n_item)')} AS lift
    FROM pc JOIN item ia ON pc.part_a = ia.l_partkey
            JOIN item ib ON pc.part_b = ib.l_partkey, tot
    """,
)
def q_basket_rules(t: Frames) -> DataFrame:
    """Association rules over the frequent pairs: confidence in both
    directions (P(B|A), P(A|B)) and lift (observed co-occurrence over
    the independence expectation) — the A-priori output a
    recommender/fraud-ring screen actually consumes (a pair bought
    together 3x means nothing if both items are in every basket;
    lift >> 1 is the signal).

    Scale design: rides q_market_basket_pairs' bounded-fan-out pair
    counting; per-item order counts are one keyed distinct-agg; the
    two join-backs are item-keyed (catalog-bounded, AQE-sized — the
    PMI unigram join-back idiom) AFTER the support filter pruned the
    pair tail; the basket total rides the 1-row broadcast crossJoin.
    The shape is PMI's exactly — association mining and collocation
    mining are the same plan over different pair streams."""
    # r16: per-item order counts and the order total read the SAME
    # per-order distinct-set surface the pair stream explodes from
    # (identical exchange subtree → one shuffle of lineitem feeds all
    # three, instead of three independent distinct-aggregations of it):
    # n_item = COUNT(DISTINCT l_orderkey) per part ≡ number of sets
    # containing the part (sets are per-order and deduplicated);
    # n = COUNT(DISTINCT l_orderkey) ≡ number of sets (nulls dropped in
    # _basket_sets exactly as countDistinct drops them).
    lines = t["lineitem"].select("l_orderkey", "l_partkey")
    sets_ = _basket_sets(lines)
    pc = _basket_pair_counts(lines)
    item = (
        sets_.select(F.explode("parts").alias("l_partkey"))
        .groupBy("l_partkey")
        .agg(F.count("*").cast("long").alias("n_item"))
    )
    tot = sets_.agg(F.count("*").cast("double").alias("n"))
    ia = item.select(F.col("l_partkey").alias("part_a"), F.col("n_item").alias("na"))
    ib = item.select(F.col("l_partkey").alias("part_b"), F.col("n_item").alias("nb"))
    return (
        pc.join(ia, "part_a")
        .join(ib, "part_b")
        .crossJoin(F.broadcast(tot))
        .select(
            "part_a",
            "part_b",
            "n_ab",
            _r4(F.col("n_ab") / F.col("na")).alias("conf_a_to_b"),
            _r4(F.col("n_ab") / F.col("nb")).alias("conf_b_to_a"),
            _r4((F.col("n_ab") * F.col("n")) / (F.col("na") * F.col("nb"))).alias(
                "lift"
            ),
        )
    )


# --- referential-integrity audit (data-quality primitive) --------------------
#: the star schema's FK edges: (child table, child key, parent table,
#: parent key) — ONE definition shared by the Spark builder and the
#: oracle generator so the audited edge set cannot drift.
_FK_EDGES = [
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
]


def _fk_oracle() -> str:
    parts = [
        f"""
        SELECT '{c}.{ck}->{p}' AS fk_edge,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CASE WHEN pp.{pk} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_orphans,
               {dround_sql(
                   f"SUM(CASE WHEN pp.{pk} IS NULL THEN 1.0 ELSE 0.0 END) / COUNT(*)"
               )} AS orphan_rate
        FROM {c} cc LEFT JOIN {p} pp ON cc.{ck} = pp.{pk}
        """
        for c, ck, p, pk in _FK_EDGES
    ]
    return " UNION ALL ".join(parts)


@_register("q_referential_integrity", _fk_oracle())
def q_referential_integrity(t: Frames) -> DataFrame:
    """Referential-integrity audit across the star schema — the
    data-quality gate a lakehouse runs after every load: one row per
    FK edge with the child row count, the orphan count (child keys
    with no parent), and the orphan rate. A clean load reads all
    zeros; a partial dim load or a torn publish shows up as a
    non-zero rate on exactly the affected edges (the cross-table
    manifest publish exists to make that state unreachable — this op
    is the AUDIT that proves it on data).

    Scale design: each edge is one left join keyed on the FK (dims
    broadcast while they fit, AQE shuffles them past that — the
    module join policy) folded to a 1-row aggregate with map-side
    partials; the 7-row union is metadata-sized. No edge ever
    materializes the join output — the count/sum fold happens in the
    same stage. NULL child keys match nothing in either engine and
    count as orphans, the conservative audit convention."""
    out = None
    for c, ck, p, pk in _FK_EDGES:
        parent = t[p].select(F.col(pk).alias("__pk"))
        row = (
            t[c]
            .select(F.col(ck).alias("__ck"))
            .join(parent, F.col("__ck") == F.col("__pk"), "left")
            .agg(
                F.lit(f"{c}.{ck}->{p}").alias("fk_edge"),
                F.count("*").cast("long").alias("n_rows"),
                F.sum(F.when(F.col("__pk").isNull(), 1).otherwise(0))
                .cast("long")
                .alias("n_orphans"),
                dround(
                    F.sum(F.when(F.col("__pk").isNull(), 1.0).otherwise(0.0))
                    / F.count("*")
                ).alias("orphan_rate"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out


# --- mergeable quantile sketch (round 13: the distribution sketch) -----------
#: 10^(d-3) as exact shortest-roundtrip literals, d = integer-digit
#: count of the bucketed value. A literal table instead of pow():
#: both engines parse these decimal strings to the identical double,
#: where cross-engine pow()/log() are only 1-ulp-accurate — and a
#: 1-ulp difference under floor() flips a bucket. Shared by the Spark
#: builder AND the SQL oracle (one definition, the _FK_EDGES rule).
_QSK_POW10 = {d: repr(10.0 ** (d - 3)) for d in range(1, 13)}

#: quantiles the sketch surfaces (label, probability literal).
_QSK_PS = [("p25", "0.25"), ("p50", "0.50"), ("p75", "0.75"), ("p95", "0.95")]


def _qsk_pow10_sql(d_expr: str) -> str:
    arms = " ".join(
        f"WHEN {d} THEN {lit}" for d, lit in _QSK_POW10.items()
    )
    return f"(CASE {d_expr} {arms} END)"


def _qsk_pow10_col(d_col) -> F.Column:
    expr = F.lit(None).cast("double")
    for d, lit in _QSK_POW10.items():
        expr = F.when(d_col == d, F.lit(float(lit))).otherwise(expr)
    return expr


def _qsk_sql(table: str, key: str, val: str, out_key: str) -> str:
    """The whole sketch as one parametrized SQL statement — the
    oracle twin of qsk_histogram + qsk_finalize, shared by every
    keyed-value registration (one definition)."""
    return f"""
    WITH vals AS (
      SELECT {key} AS grp, {val} AS v FROM {table}
      WHERE {val} >= 1 AND {val} < 1e12
    ),
    bkt AS (
      SELECT grp,
             LENGTH(CAST(CAST(floor(v) AS BIGINT) AS VARCHAR)) AS d,
             CASE
               WHEN LENGTH(CAST(CAST(floor(v) AS BIGINT) AS VARCHAR)) >= 3
                 THEN CAST(substr(CAST(CAST(floor(v) AS BIGINT) AS VARCHAR), 1, 3) AS BIGINT)
               WHEN LENGTH(CAST(CAST(floor(v) AS BIGINT) AS VARCHAR)) = 2
                 THEN CAST(floor(v * 10) AS BIGINT)
               ELSE CAST(floor(v * 100) AS BIGINT)
             END AS sig
      FROM vals
    ),
    hist AS (
      SELECT grp, d, sig, CAST(COUNT(*) AS BIGINT) AS n FROM bkt GROUP BY grp, d, sig
    ),
    walk AS (
      SELECT grp,
             (sig + 0.5) * {_qsk_pow10_sql('d')} AS rep,
             SUM(n) OVER (PARTITION BY grp ORDER BY d * 1000 + sig) AS cum,
             SUM(n) OVER (PARTITION BY grp) AS total
      FROM hist
    )
    SELECT grp AS {out_key},
           CAST(MIN(total) AS BIGINT) AS n_rows,
           {", ".join(
             _r4s(f"MIN(CASE WHEN cum >= CAST(ceil({p} * total) AS BIGINT)"
                  f" THEN rep END)") + f" AS {lbl}_est"
             for lbl, p in _QSK_PS
           )}
    FROM walk GROUP BY grp
    """


@_register(
    "q_price_quantile_sketch",
    None,  # bound right below via the shared template
)
def q_price_quantile_sketch(t: Frames) -> DataFrame:
    """Per-priority order-price quantiles from a MERGEABLE decimal
    log-bucket sketch — the distribution member of the sketch quartet
    (frequency = Misra-Gries, distinct = HLL, membership = Bloom).
    Each value lands in the bucket keyed by (integer-digit-count d,
    first-3-significant-digits sig): ~900 buckets per decade, fixed
    ≤0.5% relative half-width (the HdrHistogram layout in decimal).
    A group's sketch is just bucket counts — merging two sketches is
    vector addition, so it folds across partitions, days, or stream
    batches with no rank-error growth, unlike KLL/GK whose compaction
    is order-sensitive. Estimates are the midpoint of the bucket
    holding the ceil(p·N)-th value: provably within ±0.5% of that
    order statistic.

    Scale design: one keyed count with map-side partials collapses
    any input to O(groups × buckets) rows (~thousands), then the
    quantile walk runs on a per-group sorted array via
    ``aggregate()`` — bounded by the bucket count, never a window
    over data rows, never a global sort. Bucketing is exact
    integer/string arithmetic (digit count + leading digits + literal
    power-of-ten table) — deliberately NOT floor(log10(v)), whose
    1-ulp cross-engine wobble flips boundary buckets; here the DuckDB
    oracle agrees bit-for-bit, so a SKETCH op gets a full hash-checked
    oracle rather than the usual rows-only band."""
    return qsk_finalize(qsk_histogram(t["orders"])).withColumnRenamed(
        "grp", "o_orderpriority"
    )


@_register("docs_length_quantile_sketch", None)  # bound below (shared template)
def docs_length_quantile_sketch(t: Frames) -> DataFrame:
    """The same mergeable sketch on the TRAINING-DATA axis: per-source
    document-length quantiles over the corpus — the per-key
    distribution profile a mixture designer reads before setting
    packing lengths and source weights (q_price_quantile_sketch's
    docstring carries the machinery; this registration carries it to
    the documents table, where corpus-scale inputs are the actual
    100 TB case)."""
    docs = t["documents"].select(
        "source", F.col("n_chars").cast("double").alias("len")
    )
    return qsk_finalize(
        qsk_histogram(docs, key="source", val="len")
    ).withColumnRenamed("grp", "source")


RELATIONAL["q_price_quantile_sketch"] = (
    q_price_quantile_sketch,
    _qsk_sql("orders", "o_orderpriority", "o_totalprice", "o_orderpriority"),
)
RELATIONAL["docs_length_quantile_sketch"] = (
    docs_length_quantile_sketch,
    _qsk_sql("documents", "source", "CAST(n_chars AS DOUBLE)", "source"),
)


def qsk_histogram(
    df: DataFrame, key: str = "o_orderpriority", val: str = "o_totalprice"
) -> DataFrame:
    """The sketch itself: (grp, d, sig) bucket counts — the mergeable
    representation (merge = sum of n on the bucket key). Shared by the
    batch ops and the streaming twin (one definition)."""
    vals = (
        df
        .filter((F.col(val) >= 1) & (F.col(val) < 1e12))
        .select(F.col(key).alias("grp"), F.col(val).alias("v"))
    )
    istr = F.floor("v").cast("long").cast("string")
    d = F.length(istr)
    sig = (
        F.when(d >= 3, F.substring(istr, 1, 3).cast("long"))
        .when(d == 2, F.floor(F.col("v") * 10).cast("long"))
        .otherwise(F.floor(F.col("v") * 100).cast("long"))
    )
    return (
        vals.select("grp", d.alias("d"), sig.alias("sig"))
        .groupBy("grp", "d", "sig")
        .agg(F.count("*").cast("long").alias("n"))
    )


def qsk_finalize(hist: DataFrame) -> DataFrame:
    """Quantile walk over a (grp, d, sig, n) histogram: per-group
    sorted bucket array + ``aggregate()`` scan — bounded by the bucket
    count, no window over data."""
    bucket = F.struct(
        (F.col("d") * 1000 + F.col("sig")).alias("ord"),
        F.col("n").alias("n"),
        ((F.col("sig") + 0.5) * _qsk_pow10_col(F.col("d"))).alias("rep"),
    )
    agg = hist.groupBy("grp").agg(
        F.sum("n").cast("long").alias("total"),
        F.sort_array(F.collect_list(bucket)).alias("bs"),
    )

    def est_for(p: float) -> F.Column:
        target = F.ceil(F.lit(p) * F.col("total")).cast("long")
        return F.aggregate(
            "bs",
            F.struct(
                F.lit(0).cast("long").alias("cum"),
                F.lit(None).cast("double").alias("est"),
            ),
            lambda acc, x: F.struct(
                (acc.cum + x.n).alias("cum"),
                F.when(acc.est.isNotNull(), acc.est)
                .when(acc.cum + x.n >= target, x.rep)
                .alias("est"),
            ),
            lambda acc: acc.est,
        )

    return agg.select(
        "grp",
        F.col("total").alias("n_rows"),
        *[_r4(est_for(float(p))).alias(f"{lbl}_est") for lbl, p in _QSK_PS],
    )
