"""Relational coverage queries: Spark ≡ DuckDB oracle on TPC-H-ish tables."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL, compare_frames, register_duck_views

from real_time_fraud_detection_lakehouse_spark.core.catalog import TESTDATA_TABLES, table
from real_time_fraud_detection_lakehouse_spark.plans.relational import RELATIONAL


@pytest.fixture(scope="module")
def frames(spark):
    return {name: table(spark, SF_SMALL, name) for name in TESTDATA_TABLES}


ORACLED = {k: v for k, v in RELATIONAL.items() if v[1] is not None}


@pytest.mark.parametrize("name", sorted(ORACLED))
def test_relational_matches_oracle(name, spark, duck, frames):
    register_duck_views(duck, SF_SMALL)
    builder, oracle = RELATIONAL[name]
    compare_frames(builder(frames), duck.sql(oracle))


def test_approx_distinct_tracks_exact(spark, frames):
    exact = {
        r["event_type"]: r["distinct_users"]
        for r in RELATIONAL["q_distinct_users"][0](frames).collect()
    }
    approx = {
        r["event_type"]: r["approx_distinct_users"]
        for r in RELATIONAL["q_distinct_users_approx"][0](frames).collect()
    }
    assert exact.keys() == approx.keys()
    for k, ex in exact.items():
        assert abs(approx[k] - ex) <= max(2, ex * 0.05), (k, ex, approx[k])


def test_gapfill_densifies_and_forward_fills(spark):
    """Planted sparse series: hours with no events appear with count 0,
    and the forward-filled average carries the last observed value
    (null only before the first observation of a partition)."""
    from pyspark.sql import functions as F

    from real_time_fraud_detection_lakehouse_spark.plans.relational import RELATIONAL

    ev = spark.createDataFrame(
        [
            (1, "2024-01-01 00:10:00", 7, "click", 2.0, "{}"),
            (2, "2024-01-01 03:20:00", 7, "click", 4.0, "{}"),
            (3, "2024-01-01 01:00:00", 8, "view", 1.0, "{}"),
        ],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = RELATIONAL["q_events_gapfill_ffill"][0]({"events": ev}).collect()
    rows = {(r["event_type"], str(r["hour"])): r for r in out}
    # grid: 2 types x 4 hours (00..03)
    assert len(rows) == 8
    gap = rows[("click", "2024-01-01 01:00:00")]
    assert gap["n_events"] == 0
    assert gap["avg_val_ffill"] == 2.0  # carried from hour 00
    assert rows[("click", "2024-01-01 03:00:00")]["avg_val_ffill"] == 4.0
    # 'view' has nothing at hour 00 → null before first observation
    assert rows[("view", "2024-01-01 00:00:00")]["avg_val_ffill"] is None
    assert rows[("view", "2024-01-01 03:00:00")]["avg_val_ffill"] == 1.0


def test_ewma_recurrence_hand_computed(spark):
    """q_ewma_daily_value implements y_t = 0.3 x_t + 0.7 y_{t-1} per
    event_type over day-ordered daily averages (hand-checked series),
    independent across entities."""
    import datetime as dt

    from real_time_fraud_detection_lakehouse_spark.plans.relational import RELATIONAL

    def ts(day, hour=0):
        return dt.datetime(2024, 3, day, hour)

    rows = [
        # 'a': daily avgs 10.0, 20.0, 30.0 -> ewma 10.0, 13.0, 18.1
        (1, ts(1, 1), 1, "a", 5.0, "{}"),
        (2, ts(1, 2), 1, "a", 15.0, "{}"),
        (3, ts(2), 1, "a", 20.0, "{}"),
        (4, ts(3), 1, "a", 30.0, "{}"),
        # 'b': single day -> ewma == daily_avg
        (5, ts(2), 2, "b", 7.0, "{}"),
    ]
    frames = {
        "events": spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
        )
    }
    got = {
        (r["event_type"], r["day"].day): (r["daily_avg"], r["ewma"])
        for r in RELATIONAL["q_ewma_daily_value"][0](frames).collect()
    }
    assert got[("a", 1)] == (10.0, 10.0)
    assert got[("a", 2)] == (20.0, 13.0)
    assert got[("a", 3)] == (30.0, 18.1)
    assert got[("b", 2)] == (7.0, 7.0)


def test_quality_report_detects_planted_violations(spark):
    """q_quality_report: each constraint fires on a planted violation
    (null quantity, out-of-range quantity/discount, duplicate line
    key, out-of-domain returnflag) and passes on the clean rows."""
    from real_time_fraud_detection_lakehouse_spark.plans.relational import RELATIONAL

    rows = [
        (1, 1, 1, 1, 10.0, 100.0, 0.05, 0.0, "N", "O", None),
        (1, 1, 1, 1, None, 100.0, 0.05, 0.0, "A", "F", None),  # null qty + dup key
        (2, 1, 1, 1, 500.0, 100.0, 1.5, 0.0, "X", "O", None),  # range + domain
    ]
    frames = {
        "lineitem": spark.createDataFrame(
            rows,
            "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber long, "
            "l_quantity double, l_extendedprice double, l_discount double, "
            "l_tax double, l_returnflag string, l_linestatus string, l_shipdate timestamp",
        )
    }
    got = {
        r["rule"]: (r["metric"], r["passed"])
        for r in RELATIONAL["q_quality_report"][0](frames).collect()
    }
    assert got["row_count_min"] == (3, True)
    assert got["quantity_not_null"] == (1, False)
    assert got["quantity_in_0_100"] == (1, False)
    assert got["discount_in_0_1"] == (1, False)
    assert got["orderkey_not_null"] == (0, True)
    assert got["line_key_unique"] == (1, False)
    assert got["returnflag_domain"] == (1, False)


def test_hll_rollup_merge_is_lossless_and_tracks_exact(spark, frames):
    """Union of same-lgK daily sketches == one direct sketch over the
    raw column (Datasketches HLL merge is lossless), and the estimate
    stays inside the configured error band of the exact count."""
    from pyspark.sql import functions as F

    from real_time_fraud_detection_lakehouse_spark.plans.relational import HLL_LGK

    rollup = {
        r["event_type"]: r
        for r in RELATIONAL["q_distinct_users_hll_rollup"][0](frames).collect()
    }
    direct = {
        r["event_type"]: r["est"]
        for r in frames["events"]
        .groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg("user_id", F.lit(HLL_LGK))
            ).alias("est")
        )
        .collect()
    }
    exact = {
        r["event_type"]: r["distinct_users"]
        for r in RELATIONAL["q_distinct_users"][0](frames).collect()
    }
    days = {
        r["event_type"]: r["d"]
        for r in frames["events"]
        .groupBy("event_type")
        .agg(F.countDistinct(F.to_date("ts")).alias("d"))
        .collect()
    }
    assert rollup.keys() == direct.keys() == exact.keys()
    for k, row in rollup.items():
        # lossless merge: rollup over daily sketches == single-pass sketch
        assert row["rollup_distinct_users"] == direct[k], (k, row, direct[k])
        # lgK=12 → ~1.6% RSE; 5% (min 2) is a comfortably safe band
        assert abs(row["rollup_distinct_users"] - exact[k]) <= max(2, exact[k] * 0.05)
        assert row["n_daily_sketches"] == days[k]


def test_rfm_banding_invariants_and_no_window(spark, frames):
    """Scores are quartile bands in 1..4; the named segments follow the
    documented first-match CASE; and the plan contains NO window
    operator — the whole point of banding by 1-row quantile boundaries
    instead of an unpartitioned ntile."""
    df = RELATIONAL["q_customer_rfm"][0](frames)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan
    rows = df.collect()
    n = len(rows)
    assert n > 0
    for r in rows:
        for s in ("r_score", "f_score", "m_score"):
            assert 1 <= r[s] <= 4, r
        if r["segment"] == "champion":
            assert (r["r_score"], r["f_score"], r["m_score"]) == (4, 4, 4), r
        if r["segment"] == "hibernating":
            assert r["r_score"] == 1 and r["f_score"] == 1, r
    # boundary banding still yields a roughly balanced recency split
    # (recency_days is near-unique): every band is populated
    from collections import Counter

    bands = Counter(r["r_score"] for r in rows)
    assert set(bands) == {1, 2, 3, 4}
    assert max(bands.values()) <= 0.5 * n, bands


def test_user_overlap_hll_tracks_exact_intersections(spark, frames):
    """Inclusion-exclusion overlap estimates track the exact per-pair
    distinct-intersection within a union-scaled band (three HLL
    estimates compound to ~3x single-sketch error; lgK=12 → ~1.6%
    RSE each, 10% of the union is a comfortably safe band), and the
    single-type estimates match the rollup op's numbers."""
    from pyspark.sql import functions as F

    out = {
        (r["type_a"], r["type_b"]): r
        for r in RELATIONAL["q_user_overlap_hll"][0](frames).collect()
    }
    assert out
    users: dict[str, set] = {}
    for r in frames["events"].select("event_type", "user_id").distinct().collect():
        users.setdefault(r["event_type"], set()).add(r["user_id"])
    for (ta, tb), r in out.items():
        exact_both = len(users[ta] & users[tb])
        exact_union = len(users[ta] | users[tb])
        band = max(3, 0.10 * exact_union)
        assert abs(r["users_both_est"] - exact_both) <= band, (
            ta, tb, exact_both, r["users_both_est"], band,
        )
        assert abs(r["users_a"] - len(users[ta])) <= max(2, 0.05 * len(users[ta]))
        assert r["users_either"] <= r["users_a"] + r["users_b"]


def test_dau_wau_trailing_window_semantics(spark):
    """Planted fixture: WAU(d) counts exactly the users active in
    [d-6, d]; a user active once keeps contributing for 7 days then
    drops out; stickiness = dau/wau; no day past max(day) appears."""
    from pyspark.sql import functions as F

    ev = spark.createDataFrame(
        [
            # user 1 active on day 1 only; user 2 on days 1 and 10
            (1, "2024-01-01 10:00:00", 1, "click", 1.0, "{}"),
            (2, "2024-01-01 11:00:00", 2, "view", 1.0, "{}"),
            (3, "2024-01-10 09:00:00", 2, "click", 1.0, "{}"),
        ],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    rows = {str(r["day"]): r for r in RELATIONAL["q_events_dau_wau"][0]({"events": ev}).collect()}
    assert rows["2024-01-01"]["dau"] == 2 and rows["2024-01-01"]["wau"] == 2
    # day 7 still inside both users' trailing window; day 8+ has no dau
    # rows (dau requires activity THAT day), so only days 1 and 10 emit
    assert set(rows) == {"2024-01-01", "2024-01-10"}
    # day 10: user 2 active; user 1's window (days 1-7) long gone
    assert rows["2024-01-10"]["dau"] == 1 and rows["2024-01-10"]["wau"] == 1
    assert rows["2024-01-10"]["stickiness"] == 1.0


# --- round 12: association mining + robust anomaly + Benford -----------------
def test_market_basket_counts_orders_not_line_pairs(spark):
    """A part appearing twice in one order must contribute ONE
    co-occurrence to each pair (support counts orders); pairs below
    support 2 are pruned."""
    from real_time_fraud_detection_lakehouse_spark.plans.relational import RELATIONAL

    rows = [
        # order 1: part 10 twice, part 20 once
        (1, 10), (1, 10), (1, 20),
        # order 2: 10 + 20 again -> pair (10,20) support 2
        (2, 10), (2, 20),
        # order 3: 10 + 30 (support 1 -> pruned)
        (3, 10), (3, 30),
    ]
    t = {
        "lineitem": spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    }
    got = {
        (r["part_a"], r["part_b"]): r["n_orders"]
        for r in RELATIONAL["q_market_basket_pairs"][0](t).collect()
    }
    assert got == {(10, 20): 2}, got


def test_mad_anomaly_survives_masking_outliers(spark):
    """The masking case the MAD detector exists for: two extreme days
    inflate the mean AND stddev enough that a z-score test (3 sigma)
    flags neither, while median/MAD flags both."""
    import datetime as dt
    import statistics

    from real_time_fraud_detection_lakehouse_spark.plans.relational import RELATIONAL

    vals = [100.0 + i for i in range(20)] + [5000.0, 5000.0, 5000.0]
    rows = [
        (i + 1, dt.date(2024, 1, i + 1), v) for i, v in enumerate(vals)
    ]
    t = {
        "orders": spark.createDataFrame(
            rows, "o_orderkey long, o_orderdate date, o_totalprice double"
        )
    }
    flagged = {
        r["day"].day for r in RELATIONAL["q_revenue_anomaly_mad"][0](t).collect()
    }
    assert flagged == {21, 22, 23}, flagged
    # the plain 3-sigma test on the same series flags NOTHING (masking)
    mu, sd = statistics.mean(vals), statistics.stdev(vals)
    assert all(abs(v - mu) <= 3 * sd for v in vals)


def test_mad_anomaly_zero_mad_flags_nothing(spark):
    """Round-12 advice: when ≥50% of days share the median revenue,
    MAD = 0 and the robust_z division would be by zero (Spark yields
    ±Infinity, DuckDB NULL — an engine disagreement). Both sides now
    filter ``mad > 0`` explicitly: the degenerate zero-spread
    population flags NO days, even ones far from the median."""
    import datetime as dt

    import duckdb

    from real_time_fraud_detection_lakehouse_spark.plans.relational import RELATIONAL

    # 12 of 15 days at exactly 100 -> median 100, MAD 0; 3 wild days
    vals = [100.0] * 12 + [5000.0, 0.5, 9999.0]
    rows = [(i + 1, dt.date(2024, 2, i + 1), v) for i, v in enumerate(vals)]
    t = {
        "orders": spark.createDataFrame(
            rows, "o_orderkey long, o_orderdate date, o_totalprice double"
        )
    }
    builder, sql = RELATIONAL["q_revenue_anomaly_mad"]
    assert builder(t).count() == 0
    # the oracle agrees on the same degenerate data
    con = duckdb.connect()
    con.register("orders", t["orders"].toPandas())
    assert len(con.execute(sql).fetchall()) == 0
    con.close()


def test_benford_terms_are_the_closed_form(spark):
    """9 rows, shares sum to 1, benford_p is log10(1+1/d), and the
    chi2 term matches the hand-computed value for one digit."""
    import math

    from real_time_fraud_detection_lakehouse_spark.core.catalog import table
    from real_time_fraud_detection_lakehouse_spark.plans.relational import RELATIONAL
    from tests.conftest import SF_SMALL

    t = {"orders": table(spark, SF_SMALL, "orders")}
    rows = {r["digit"]: r for r in RELATIONAL["q_orders_benford"][0](t).collect()}
    assert set(rows) == set(range(1, 10))
    assert abs(sum(r["observed_p"] for r in rows.values()) - 1.0) < 1e-3
    total = sum(r["n"] for r in rows.values())
    for d in (1, 9):
        p = math.log10(1 + 1 / d)
        assert abs(rows[d]["benford_p"] - round(p, 4)) < 5e-4
        expected = (rows[d]["n"] - total * p) ** 2 / (total * p)
        assert abs(rows[d]["chi2_term"] - expected) < max(0.01, 0.01 * expected)


def test_basket_rules_lift_separates_ubiquity_from_affinity(spark):
    """Planted baskets: parts 1+2 co-occur ONLY together (lift = n/1
    >> 1); part 9 is in every basket, so its pairs have lift exactly 1
    (independence) — the reason rules consume lift, not raw support."""
    rows = []
    for o in range(1, 7):
        rows += [(o, 9)]          # ubiquitous item
        if o <= 3:
            rows += [(o, 1), (o, 2)]   # exclusive pair
        else:
            rows += [(o, 3 + o)]       # singletons elsewhere
    t = {
        "lineitem": spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    }
    from real_time_fraud_detection_lakehouse_spark.plans.relational import RELATIONAL

    got = {
        (r["part_a"], r["part_b"]): r
        for r in RELATIONAL["q_basket_rules"][0](t).collect()
    }
    pair = got[(1, 2)]
    assert pair["n_ab"] == 3
    assert pair["conf_a_to_b"] == 1.0 and pair["conf_b_to_a"] == 1.0
    assert pair["lift"] == 2.0  # n/n_a = 6/3
    ubiq = got[(1, 9)]
    assert ubiq["lift"] == 1.0  # part 9 in every basket: independence
    assert ubiq["conf_a_to_b"] == 1.0 and ubiq["conf_b_to_a"] == 0.5


def test_referential_integrity_flags_planted_orphans(spark):
    """Drop one parent: exactly the affected edge reports the orphan
    count; every other edge stays clean. NULL child keys count as
    orphans (the conservative audit convention)."""
    from pyspark.sql import functions as F

    from tests.conftest import SF_SMALL

    from real_time_fraud_detection_lakehouse_spark.core.catalog import (
        TESTDATA_TABLES,
        table,
    )
    from real_time_fraud_detection_lakehouse_spark.plans.relational import RELATIONAL

    frames = {n: table(spark, SF_SMALL, n) for n in TESTDATA_TABLES}
    clean = {
        r["fk_edge"]: r
        for r in RELATIONAL["q_referential_integrity"][0](frames).collect()
    }
    assert all(r["n_orphans"] == 0 for r in clean.values())
    assert len(clean) == 7
    # amputate nation 3: customer/supplier edges to nation must bleed
    frames["nation"] = frames["nation"].filter(F.col("n_nationkey") != 3)
    bled = {
        r["fk_edge"]: r
        for r in RELATIONAL["q_referential_integrity"][0](frames).collect()
    }
    cust = bled["customer.c_nationkey->nation"]
    supp = bled["supplier.s_nationkey->nation"]
    assert cust["n_orphans"] > 0 and supp["n_orphans"] > 0
    assert cust["n_rows"] == clean["customer.c_nationkey->nation"]["n_rows"]
    untouched = [k for k in bled if "->nation" not in k]
    assert all(bled[k]["n_orphans"] == 0 for k in untouched)


# --- round 13: mergeable quantile sketch -------------------------------------
def test_quantile_sketch_bucket_edges_exact(spark):
    """Known values land in the documented (d, sig) buckets with the
    midpoint representative: the 3-significant-digit decimal layout,
    including the sub-100 paths that read digits from the fraction."""
    from real_time_fraud_detection_lakehouse_spark.plans.relational import RELATIONAL

    rows = [(1, "K", v) for v in (5.37, 42.0, 12345.0, 1.0, 999.49)]
    t = {
        "orders": spark.createDataFrame(
            rows, "o_orderkey long, o_orderpriority string, o_totalprice double"
        )
    }
    out = RELATIONAL["q_price_quantile_sketch"][0](t).collect()[0]
    # sorted buckets: 1.0 -> (1,100) rep 1.005; 5.37 -> (1,537) rep 5.375;
    # 42.0 -> (2,420) rep 42.05; 999.49 -> (3,999) rep 999.5;
    # 12345 -> (5,123) rep 12350. N=5 -> p25 target 2nd value, p50 3rd,
    # p75 4th (ceil), p95 5th.
    assert out["n_rows"] == 5
    assert out["p25_est"] == 5.375
    assert out["p50_est"] == 42.05
    assert out["p75_est"] == 999.5
    assert out["p95_est"] == 12350.0


def test_quantile_sketch_within_band_of_exact(spark):
    """Every estimate sits within the sketch's guaranteed band of the
    exact interpolated percentile: the bucket half-width is 0.5/sig
    <= 0.5%, plus at most one bucket of definitional gap (nearest-rank
    vs interpolated) -> 1% is a safe bound at sf0.01."""
    from pyspark.sql import functions as F

    from real_time_fraud_detection_lakehouse_spark.core.catalog import table
    from real_time_fraud_detection_lakehouse_spark.plans.relational import RELATIONAL

    t = {"orders": table(spark, "/root/testdata/sf0.01", "orders")}
    est = {
        r["o_orderpriority"]: r
        for r in RELATIONAL["q_price_quantile_sketch"][0](t).collect()
    }
    exact = {
        r["o_orderpriority"]: r
        for r in t["orders"]
        .groupBy("o_orderpriority")
        .agg(
            *[
                F.percentile("o_totalprice", p).alias(lbl)
                for lbl, p in (("p25", 0.25), ("p50", 0.50), ("p75", 0.75), ("p95", 0.95))
            ]
        )
        .collect()
    }
    assert set(est) == set(exact) and len(est) == 5
    for grp, e in est.items():
        for lbl in ("p25", "p50", "p75", "p95"):
            rel = abs(e[f"{lbl}_est"] - exact[grp][lbl]) / exact[grp][lbl]
            assert rel <= 0.01, (grp, lbl, e[f"{lbl}_est"], exact[grp][lbl], rel)


def test_quantile_sketch_merge_is_order_invariant(spark):
    """The mergeability contract: sketching two disjoint halves and
    summing bucket counts gives BIT-IDENTICAL estimates to sketching
    the whole — in either merge order (count-sum is commutative, the
    property KLL/GK compaction does not have)."""
    from pyspark.sql import functions as F

    from tests.conftest import SF_SMALL

    from real_time_fraud_detection_lakehouse_spark.core.catalog import table
    from real_time_fraud_detection_lakehouse_spark.plans.relational import RELATIONAL

    orders = table(spark, SF_SMALL, "orders")
    build = RELATIONAL["q_price_quantile_sketch"][0]
    whole = sorted(tuple(r) for r in build({"orders": orders}).collect())
    a = orders.filter(F.col("o_orderkey") % 2 == 0)
    b = orders.filter(F.col("o_orderkey") % 2 == 1)
    for first, second in ((a, b), (b, a)):
        merged = sorted(
            tuple(r)
            for r in build({"orders": first.unionByName(second)}).collect()
        )
        assert merged == whole
