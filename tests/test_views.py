"""Every analytics view / dashboard query: Spark builder ≡ DuckDB oracle."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL, compare_frames, register_duck_views

from real_time_fraud_detection_lakehouse_spark.plans.dashboards import DASHBOARDS
from real_time_fraud_detection_lakehouse_spark.plans.gold import gold_frames, gold_prelude
from real_time_fraud_detection_lakehouse_spark.plans.views import VIEWS

ALL = {**VIEWS, **DASHBOARDS}


@pytest.fixture(scope="module")
def frames(spark):
    g = gold_frames(spark, SF_SMALL)
    g["silver"] = g["silver"].cache()
    g["fact"] = g["fact"].cache()
    return g


@pytest.mark.parametrize("name", sorted(ALL))
def test_view_matches_oracle(name, spark, duck, frames):
    register_duck_views(duck, SF_SMALL)
    builder, oracle = ALL[name]
    sdf = builder(frames)
    if oracle is None:  # standalone oracle (WITH RECURSIVE), bound in the entry
        import __spark_entry__ as em

        rel = duck.sql(em.oracle_sql()[name])
    else:
        rel = duck.sql(f"{gold_prelude()} {oracle}")
    compare_frames(sdf, rel)


def test_fraud_ring_pairs_planted_semantics(spark):
    """Support floor + hub cap, on a planted graph: cards 1/2 share 5
    merchant-days (LINKED), cards 1/3 share 4 (below RING_SUPPORT —
    pruned), and with the hub cap monkey-lowered to 2 a merchant-day
    visited by 3 cards contributes nothing (stopword exclusion), plus
    repeat visits within one merchant-day collapse via DISTINCT."""
    import datetime as dt

    from real_time_fraud_detection_lakehouse_spark.plans import dashboards as dash

    def tx(card, merchant, day):
        return (card, merchant, dt.datetime(2024, 1, day, 12, 0, 0))

    rows = (
        # 5 shared merchant-days for (1,2) — one duplicated visit
        [tx(1, f"m{i}", i) for i in range(1, 6)]
        + [tx(2, f"m{i}", i) for i in range(1, 6)]
        + [tx(2, "m1", 1)]  # repeat visit, must NOT double-count
        # 4 shared merchant-days for (1,3)
        + [tx(1, f"n{i}", i) for i in range(1, 5)]
        + [tx(3, f"n{i}", i) for i in range(1, 5)]
    )
    g = {
        "transactions": spark.createDataFrame(
            rows, "cc_num long, merchant string, trans_timestamp timestamp"
        )
    }
    got = {
        (r["card_a"], r["card_b"]): r["n_links"]
        for r in dash.dash_fraud_ring_pairs(g).collect()
    }
    assert got == {(1, 2): 5}, got

    # hub exclusion: lower the cap so a 3-card merchant-day is a hub
    hub = [tx(c, "hub", 20) for c in (7, 8, 9)]
    g2 = {
        "transactions": spark.createDataFrame(
            rows + hub, "cc_num long, merchant string, trans_timestamp timestamp"
        )
    }
    old = dash.RING_HUB_CAP
    try:
        dash.RING_HUB_CAP = 2
        got2 = {
            (r["card_a"], r["card_b"]): r["n_links"]
            for r in dash.dash_fraud_ring_pairs(g2).collect()
        }
    finally:
        dash.RING_HUB_CAP = old
    assert got2 == {(1, 2): 5}, got2  # hub trio contributed no pairs


def test_fraud_rings_chain_merges_transitively(spark):
    """A strong-link chain 1–2, 2–3 plus a separate pair 10–11 yields
    two rings with min-card ids and correct sizes (CC transitivity —
    the over-merge signal ring_size exists to surface)."""
    import datetime as dt

    from real_time_fraud_detection_lakehouse_spark.plans import dashboards as dash

    rows = []
    for i in range(1, dash.RING_STRONG_SUPPORT + 1):
        d = dt.datetime(2024, 2, i, 9, 0, 0)
        rows += [(1, f"a{i}", d), (2, f"a{i}", d)]          # edge 1-2
        rows += [(2, f"b{i}", d), (3, f"b{i}", d)]          # edge 2-3
        rows += [(10, f"c{i}", d), (11, f"c{i}", d)]        # edge 10-11
    g = {
        "transactions": spark.createDataFrame(
            rows, "cc_num long, merchant string, trans_timestamp timestamp"
        )
    }
    got = {
        r["cc_num"]: (r["ring_id"], r["ring_size"])
        for r in dash.dash_fraud_rings(g).collect()
    }
    assert got == {
        1: (1, 3), 2: (1, 3), 3: (1, 3),
        10: (10, 2), 11: (10, 2),
    }, got


def test_fraud_ring_stats_planted_rates(spark):
    """Ring stats on a planted two-ring graph: per-ring fraud rate,
    distinct member count, and tx volume are exact; unlinked cards
    contribute nothing."""
    import datetime as dt

    from real_time_fraud_detection_lakehouse_spark.plans import dashboards as dash

    rows = []
    # ring {1,2}: 1 is all-fraud, 2 clean; ring {10,11}: all clean;
    # card 99 unlinked (never co-occurs enough)
    for i in range(1, dash.RING_STRONG_SUPPORT + 1):
        d = dt.datetime(2024, 3, i, 10, 0, 0)
        rows += [(1, f"a{i}", d, 1), (2, f"a{i}", d, 0)]
        rows += [(10, f"b{i}", d, 0), (11, f"b{i}", d, 0)]
    rows += [(99, "solo", dt.datetime(2024, 3, 1, 11, 0, 0), 1)]
    g = {
        "transactions": spark.createDataFrame(
            rows,
            "cc_num long, merchant string, trans_timestamp timestamp, is_fraud int",
        )
    }
    got = {r["ring_id"]: r for r in dash.dash_fraud_ring_stats(g).collect()}
    k = dash.RING_STRONG_SUPPORT
    assert set(got) == {1, 10}
    assert (got[1]["n_cards"], got[1]["n_tx"], got[1]["n_fraud"]) == (2, 2 * k, k)
    assert got[1]["fraud_rate"] == 0.5
    assert (got[10]["n_cards"], got[10]["n_fraud"]) == (2, 0)
    assert got[10]["fraud_rate"] == 0.0


def test_category_anomaly_mad_uses_per_category_baseline(spark):
    """A spike that is tiny on the GLOBAL scale but huge against its
    own category's baseline is flagged — the per-entity-baseline
    property this screen exists for. The zero-MAD guard holds per
    category."""
    import datetime as dt

    from real_time_fraud_detection_lakehouse_spark.plans import dashboards as dash

    rows = []
    # grocery: 20 steady days at ~100 + one day at 400 (global noise,
    # category outlier); travel: constant 5000 every day (MAD 0 ->
    # must flag nothing even though it dwarfs grocery)
    for i in range(1, 21):
        rows.append(("grocery", dt.datetime(2024, 4, i, 12), 100.0 + i))
        rows.append(("travel", dt.datetime(2024, 4, i, 13), 5000.0))
    rows.append(("grocery", dt.datetime(2024, 4, 21, 12), 400.0))
    rows.append(("travel", dt.datetime(2024, 4, 21, 13), 5000.0))
    g = {
        "fact": spark.createDataFrame(
            rows,
            "transaction_category string, transaction_timestamp timestamp, "
            "transaction_amount double",
        )
    }
    got = [
        (r["category"], r["day"].day)
        for r in dash.dash_category_anomaly_mad(g).collect()
    ]
    assert got == [("grocery", 21)], got


def test_risk_propagation_lifts_clean_merchant_with_hot_cards(spark):
    """The guilt-by-association property on a planted graph: merchant
    'clean' has zero observed fraud but shares BOTH its cards with
    all-fraud merchant 'hot' -> propagated risk rises (lift > 0);
    merchant 'island' (clean, isolated cards) stays at its seed.
    Hand-computed fixed point of the two unrolled rounds."""
    import datetime as dt

    from real_time_fraud_detection_lakehouse_spark.plans import dashboards as dash

    d = dt.datetime(2024, 5, 1, 12)
    rows = [
        # cards 1,2 visit both 'hot' (all fraud) and 'clean' (no fraud)
        (1, "hot", d, 1), (2, "hot", d, 1),
        (1, "clean", d, 0), (2, "clean", d, 0),
        # card 3 only visits 'island' (no fraud)
        (3, "island", d, 0),
    ]
    g = {
        "transactions": spark.createDataFrame(
            rows,
            "cc_num long, merchant string, trans_timestamp timestamp, is_fraud int",
        )
    }
    got = {r["merchant"]: r for r in dash.dash_merchant_risk_propagation(g).collect()}
    # seeds: hot 1.0, clean 0.0, island 0.0
    # round 1: card1=card2=avg(1,0)=0.5, card3=0
    #   hot   = .5*1 + .5*.5  = 0.75
    #   clean = .5*0 + .5*.5  = 0.25
    #   island= 0
    # round 2: card1=card2=avg(.75,.25)=0.5, card3=0 -> same risks
    assert got["hot"]["seed_risk"] == 1.0
    assert got["clean"]["seed_risk"] == 0.0
    assert got["clean"]["propagated_risk"] == 0.25
    assert got["clean"]["risk_lift"] == 0.25
    assert got["hot"]["propagated_risk"] == 0.75
    assert got["island"]["propagated_risk"] == 0.0
    assert got["island"]["risk_lift"] == 0.0


def test_cusum_fires_on_sustained_drift_per_day_screen_misses(spark):
    """The complementarity CUSUM exists for: a sustained +2-robust-
    sigma fraud-rate creep (below the per-day screen's threshold
    every single day) accumulates past the CUSUM alarm on the 3rd
    drift day. Hand-computed: baseline 40 days alternating rates
    0.019/0.021 (median 0.021, MAD 0.002), drift 6 days at 0.027 ->
    z = 2.0235 per day (< 2.5: per-day silent), step = 1.5235 ->
    cusum crosses 4.0 at drift day 3."""
    import datetime as dt

    from pyspark.sql import functions as F

    from real_time_fraud_detection_lakehouse_spark.plans import dashboards as dash

    days = []
    base = dt.date(2024, 1, 1)
    for i in range(40):
        days.append((base + dt.timedelta(days=i), 19 if i % 2 == 0 else 21))
    for i in range(6):
        days.append((base + dt.timedelta(days=40 + i), 27))
    per_day = spark.createDataFrame(days, "day date, n_fraud int")
    fact = per_day.select(
        F.col("day").cast("timestamp").alias("transaction_timestamp"),
        F.explode(F.sequence(F.lit(1), F.lit(1000))).alias("i"),
        "n_fraud",
    ).select(
        "transaction_timestamp",
        F.when(F.col("i") <= F.col("n_fraud"), 1).otherwise(0).alias("is_fraud"),
    )
    got = {r["day"]: r for r in dash.dash_fraud_rate_cusum({"fact": fact}).collect()}
    assert len(got) == 46
    alarms = sorted(d for d, r in got.items() if r["alarm"])
    assert alarms == [base + dt.timedelta(days=40 + i) for i in (2, 3, 4, 5)], alarms
    # every baseline day is fully absorbed (cusum clamped at 0)
    assert all(got[base + dt.timedelta(days=i)]["cusum"] == 0.0 for i in range(40))
    # drift days accumulate ~1.5235/day
    d1 = got[base + dt.timedelta(days=40)]["cusum"]
    assert abs(d1 - 1.5235) < 0.001, d1


def test_impossible_travel_planted_pairs(spark):
    """NY->LA in one hour flags (~3936 km/h); the same-timestamp
    different-place pair flags with NULL speed; an overnight NY->LA
    pair (plausible) and a cross-CARD fast pair do not flag."""
    import datetime as dt

    from real_time_fraud_detection_lakehouse_spark.plans import dashboards as dash

    ny, la = (40.71, -74.0), (34.05, -118.24)
    t0 = dt.datetime(2024, 6, 1, 12, 0, 0)
    rows = [
        # card 1: NY then LA one hour later -> impossible
        (1, "t1", t0, ny[0], ny[1]),
        (1, "t2", t0 + dt.timedelta(hours=1), la[0], la[1]),
        # card 2: NY then LA ten hours later -> plausible flight, silent
        (2, "t3", t0, ny[0], ny[1]),
        (2, "t4", t0 + dt.timedelta(hours=10), la[0], la[1]),
        # card 3: simultaneous use NY + LA -> flagged, speed NULL
        (3, "t5", t0, ny[0], ny[1]),
        (3, "t6", t0, la[0], la[1]),
        # cards 4/5: fast pair across DIFFERENT cards -> silent
        (4, "t7", t0, ny[0], ny[1]),
        (5, "t8", t0 + dt.timedelta(minutes=5), la[0], la[1]),
    ]
    g = {
        "transactions": spark.createDataFrame(
            rows,
            "cc_num long, trans_num string, trans_timestamp timestamp, "
            "merch_lat double, merch_long double",
        )
    }
    got = {r["cc_num"]: r for r in dash.dash_impossible_travel(g).collect()}
    assert set(got) == {1, 3}
    assert 3900 < got[1]["speed_kmh"] < 4000, got[1]
    assert got[3]["speed_kmh"] is None
    assert got[3]["distance_km"] > 3900
    # tie order: the t0-pair on card 3 orders by trans_num -> t6 is
    # the flagged (second) transaction
    assert got[3]["trans_num"] == "t6"


def test_new_merchant_risk_frontloaded_fraud_lifts(spark):
    """Planted bust-out shape: merchant 'burst' is all-fraud in its
    first week then clean (early_lift > 0); merchant 'steady' has a
    uniform rate (lift 0); a merchant hit only LATER shows negative
    lift. Early window is first_day + 7 inclusive."""
    import datetime as dt

    from real_time_fraud_detection_lakehouse_spark.plans import dashboards as dash

    t0 = dt.datetime(2024, 7, 1, 12)
    rows = []
    # burst: 4 fraud tx days 0-7, then 4 clean tx days 20-23
    for i in range(4):
        rows.append(("burst", t0 + dt.timedelta(days=2 * i), 1))
        rows.append(("burst", t0 + dt.timedelta(days=20 + i), 0))
    # steady: alternating, 2 in early window, 2 later, same rate
    rows += [
        ("steady", t0, 1), ("steady", t0 + dt.timedelta(days=3), 0),
        ("steady", t0 + dt.timedelta(days=30), 1),
        ("steady", t0 + dt.timedelta(days=33), 0),
    ]
    # late-hit: clean early, fraud later
    rows += [
        ("late", t0, 0), ("late", t0 + dt.timedelta(days=40), 1),
    ]
    g = {
        "transactions": spark.createDataFrame(
            rows, "merchant string, trans_timestamp timestamp, is_fraud int"
        )
    }
    got = {r["merchant"]: r for r in dash.dash_new_merchant_risk(g).collect()}
    assert got["burst"]["n_tx_early"] == 4
    assert got["burst"]["early_fraud_rate"] == 1.0
    assert got["burst"]["overall_fraud_rate"] == 0.5
    assert got["burst"]["early_lift"] == 0.5
    assert got["steady"]["early_lift"] == 0.0
    assert got["late"]["early_fraud_rate"] == 0.0
    assert got["late"]["early_lift"] == -0.5


def test_round_amount_bias_exact_cents_logic(spark):
    """Cents recovery is exact through the float representation:
    19.99 / 20.00 / 30.00 / 20.10 classify correctly (the 0.5 nudge
    defeats the 1999.9999... representation), shares and lifts are
    the closed form."""
    from real_time_fraud_detection_lakehouse_spark.plans import dashboards as dash

    rows = [
        (0, 19.99), (0, 20.00), (0, 20.10), (0, 33.33),
        (1, 30.00), (1, 100.00),
    ]
    g = {
        "fact": spark.createDataFrame(
            rows, "is_fraud int, transaction_amount double"
        )
    }
    got = {r["is_fraud"]: r for r in dash.dash_round_amount_bias(g).collect()}
    assert got[0]["n_tx"] == 4
    assert got[0]["whole_dollar_share"] == 0.25   # only 20.00
    assert got[0]["ten_dollar_share"] == 0.25
    assert got[1]["whole_dollar_share"] == 1.0    # 30.00 and 100.00
    assert got[1]["whole_dollar_lift"] == 100.0


def test_ring_shared_intermediate_equals_recompute(spark):
    """r15 (r14 verdict #1): the four strong-support ring dashboards
    read ONE session-shared persisted pairs+CC intermediate instead of
    each recomputing the pair self-join + CC. Pin (a) the share is
    per-medallion — gold_frames memoization makes every dashboard call
    over one medallion hit the same cached objects — and (b) the
    shared-path pair stream and membership are row-identical to a
    from-scratch recompute (compute-on-miss IS the fallback path, so
    semantics cannot drift)."""
    from real_time_fraud_detection_lakehouse_spark.operators.dedup import (
        connected_components,
    )
    from real_time_fraud_detection_lakehouse_spark.plans import dashboards as dash

    g = gold_frames(spark, SF_SMALL)
    s1 = dash._ring_shared(g)
    s2 = dash._ring_shared(gold_frames(spark, SF_SMALL))
    assert s1["pairs"] is s2["pairs"] and s1["comp"] is s2["comp"]

    fresh_pairs = dash._ring_pair_frame(g, dash.RING_STRONG_SUPPORT)
    fresh_comp = connected_components(fresh_pairs, src="card_a", dst="card_b")
    assert {tuple(r) for r in s1["comp"].collect()} == {
        (r["node"], r["component"]) for r in fresh_comp.collect()
    }
    assert {tuple(r) for r in s1["pairs"].collect()} == {
        tuple(r) for r in fresh_pairs.collect()
    }
    # r16: the base-support pair screen reads the same persisted
    # intermediate (strong = filter of base); pin it against a fresh
    # base-support build too
    fresh_base = dash._ring_pair_frame(g, dash.RING_SUPPORT)
    assert {tuple(r) for r in s1["pairs_all"].collect()} == {
        tuple(r) for r in fresh_base.collect()
    }


def test_mule_hub_shared_surface_equals_recompute(spark):
    """r16: dash_mule_hubs / dash_ring_hub_exposure /
    dash_ring_hub_trend read ONE session-shared persisted hub surface
    (the _RING_SHARED discipline applied to the expensive PR×RP
    conjunction). Pin (a) the share is per-medallion, (b) the shared
    frame is row-identical to the un-shared build (compute-on-miss IS
    the fallback), and (c) override consumers bypass the share."""
    from real_time_fraud_detection_lakehouse_spark.plans import dashboards as dash

    g = gold_frames(spark, SF_SMALL)
    h1 = dash.dash_mule_hubs(g)
    h2 = dash.dash_mule_hubs(gold_frames(spark, SF_SMALL))
    assert h1 is h2  # same persisted object per medallion

    fresh = dash._mule_hubs_fresh(g, None, None)
    assert {tuple(r) for r in h1.collect()} == {
        tuple(r) for r in fresh.collect()
    }

    # an edges override must NOT hit (or populate) the shared surface
    edges = g["transactions"].select("cc_num", "merchant").distinct()
    h_override = dash.dash_mule_hubs(g, edges=edges)
    assert h_override is not h1
    assert {tuple(r) for r in h_override.collect()} == {
        tuple(r) for r in h1.collect()
    }


def test_pr_rp_shared_surfaces_equal_recompute(spark):
    """r17: the five PR/RP screens read session-shared persisted score
    surfaces (production + audit depths built once — see _PR_SHARED /
    _RP_SHARED). Pin (a) the share is per-medallion, (b) every
    screen's shared-path output is row-identical to the un-shared
    build (the edges/seed-override path, which bypasses the share and
    runs the original per-screen recurrence), and (c) the override
    path does not populate the share with override-shaped frames."""
    from pyspark.sql import functions as F

    from real_time_fraud_detection_lakehouse_spark.plans import dashboards as dash

    g = gold_frames(spark, SF_SMALL)
    s1 = dash._pr_shared_surfaces(g, want_cards=True)
    s2 = dash._pr_shared_surfaces(gold_frames(spark, SF_SMALL))
    assert s1["m"] is s2["m"]
    assert dash._rp_shared_surface(g) is dash._rp_shared_surface(
        gold_frames(spark, SF_SMALL)
    )

    edges = g["transactions"].select("cc_num", "merchant").distinct()
    seed = g["transactions"].groupBy("merchant").agg(
        F.avg(F.col("is_fraud").cast("double")).alias("risk0")
    )
    checks = [
        (dash.dash_merchant_centrality(g),
         dash.dash_merchant_centrality(g, edges=edges)),
        (dash.dash_centrality_convergence(g),
         dash.dash_centrality_convergence(g, edges=edges)),
        (dash.dash_card_hubs(g), dash.dash_card_hubs(g, edges=edges)),
        (dash.dash_merchant_risk_propagation(g),
         dash.dash_merchant_risk_propagation(g, edges=edges, seed=seed)),
        (dash.dash_rp_convergence(g),
         dash.dash_rp_convergence(g, edges=edges, seed=seed)),
    ]
    for shared, fresh in checks:
        assert {tuple(r) for r in shared.collect()} == {
            tuple(r) for r in fresh.collect()
        }


def test_centrality_fixed_round_truncation_is_measured(spark):
    """r15 (r14 verdict #8): dash_merchant_centrality truncates the
    power iteration at 2 rounds; dash_centrality_convergence makes
    that a MEASURED quantity. Pin the band observed in-round on the
    synthetic graph (max relative round-2→3 movement 0.143 at sf0.001,
    0.056 at sf0.01 — band 0.25 with margin) and, the property the
    screen actually rides on, that the top-10 hub SET is identical at
    both depths (observed: identical, Spearman ≥ 0.998 at both SFs)."""
    from real_time_fraud_detection_lakehouse_spark.plans import dashboards as dash

    g = gold_frames(spark, SF_SMALL)
    rows = dash.dash_centrality_convergence(g).collect()
    assert rows, "convergence audit returned no merchants"
    assert max(r["abs_move"] / r["centrality_2r"] for r in rows) < 0.25
    top2 = {r["merchant"] for r in sorted(rows, key=lambda r: -r["centrality_2r"])[:10]}
    top3 = {r["merchant"] for r in sorted(rows, key=lambda r: -r["centrality_3r"])[:10]}
    assert top2 == top3


def test_ring_hub_trend_delta_algebra_and_family_consistency(spark):
    """r16 (r15 verdict #8): the ring-hub TREND composes the ring
    timeline with the mule-hub surface. Pin (a) the lag algebra —
    per ring, the first active week's delta is NULL and every later
    delta is exactly round4(share - prev share); (b) family
    consistency — the trend's ring set equals the static exposure
    screen's, every weekly hub count is bounded by that week's
    merchant count, and each ring's weeks sit inside the
    [first_seen, last_seen] span dash_ring_evolution reports."""
    from collections import defaultdict

    from real_time_fraud_detection_lakehouse_spark.plans import dashboards as dash

    g = gold_frames(spark, SF_SMALL)
    rows = dash.dash_ring_hub_trend(g).collect()
    assert rows, "trend returned no ring-weeks"

    per_ring = defaultdict(list)
    for r in rows:
        assert 0 <= r["n_hub_merchants"] <= r["n_merchants"]
        per_ring[r["ring_id"]].append(r)
    for ring, rs in per_ring.items():
        rs.sort(key=lambda r: r["week_start"])
        assert rs[0]["hub_share_delta"] is None, ring
        for prev, cur in zip(rs, rs[1:]):
            assert cur["hub_share_delta"] == round(
                cur["hub_share"] - prev["hub_share"], 4
            ), (ring, cur["week_start"])

    expo = {r["ring_id"] for r in dash.dash_ring_hub_exposure(g).collect()}
    assert set(per_ring) == expo

    evo = {r["ring_id"]: r for r in dash.dash_ring_evolution(g).collect()}
    for ring, rs in per_ring.items():
        lo, hi = evo[ring]["first_seen"], evo[ring]["last_seen"]
        for r in rs:
            wk = r["week_start"]
            # the week bucket containing a link day starts at most 6
            # days before it and ends at most 6 days after
            assert (hi - wk).days >= 0 and (wk - lo).days >= -6, (ring, wk)


def test_rp_fixed_round_truncation_is_measured(spark):
    """r16 (r15 verdict #7): dash_merchant_risk_propagation truncates
    the message passing at 2 rounds; dash_rp_convergence makes that a
    MEASURED quantity — the centrality-convergence discipline on the
    risk recurrence. Observed in-round on the synthetic graph: the
    third round moves NO merchant at the screen's dround(4) precision
    (max abs_move 0.0 at sf0.001 AND sf0.01 — damping geometry: each
    extra round's contribution is scaled by (1-damping)^r = 0.25 and
    the round-2 card averages are already near-stationary), so the
    production depth is fully converged at reported precision. Pin
    the band with margin plus per-merchant lift agreement at one
    rounding ulp."""
    from real_time_fraud_detection_lakehouse_spark.plans import dashboards as dash

    g = gold_frames(spark, SF_SMALL)
    rows = dash.dash_rp_convergence(g).collect()
    assert rows, "rp convergence audit returned no merchants"
    assert max(r["abs_move"] for r in rows) <= 0.001
    for r in rows:
        assert abs(r["lift_3r"] - r["lift_2r"]) <= 0.0002, r["merchant"]


def test_score_gain_curve_is_cumulative_and_complete(spark):
    """r15: structural pins for the gain curve — capture_rate and
    cum_tx_share are non-decreasing as the score cut walks DOWN, the
    lowest band closes at exactly 1.0 on both, and band counts sum to
    the population. (No diagonal-dominance pin: the rule score's top
    band holds zero fraud at sf0.001 — curve SHAPE is data, only the
    cumulative algebra is contract.) Value correctness is the
    parametrized DuckDB oracle test."""
    from real_time_fraud_detection_lakehouse_spark.plans import dashboards as dash

    g = gold_frames(spark, SF_SMALL)
    rows = sorted(
        dash.dash_score_gain(g).collect(), key=lambda r: -r["score"]
    )
    assert len(rows) >= 3
    n_total = g["silver"].count()
    assert sum(r["n_tx"] for r in rows) == n_total
    caps = [r["capture_rate"] for r in rows]
    shares = [r["cum_tx_share"] for r in rows]
    assert caps == sorted(caps) and shares == sorted(shares)
    assert caps[-1] == 1.0 and shares[-1] == 1.0
