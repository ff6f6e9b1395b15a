"""Watermarked streaming windows: emitted (closed) windows must equal
the batch aggregation over the same input."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_MEDIUM, SF_SMALL

from real_time_fraud_detection_lakehouse_spark.sources.transactions import transactions_df
from real_time_fraud_detection_lakehouse_spark.streaming.windows import (
    hourly_metrics_stream,
    user_sessions_stream,
)


def test_hourly_window_stream_matches_batch(spark, tmp_path):
    src = str(tmp_path / "tx")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    tx = transactions_df(spark, SF_SMALL)
    tx.write.mode("overwrite").parquet(src)

    streamed = hourly_metrics_stream(spark, src, out, ckpt)

    batch = (
        tx.groupBy(F.window("trans_timestamp", "1 hour").alias("w"), "category")
        .agg(
            F.count("*").alias("n"),
            F.sum("amt").alias("total_amount"),
            F.sum(F.when(F.col("is_fraud") == 1, 1).otherwise(0)).alias("frauds"),
        )
        .select(F.col("w.start").alias("window_start"), "category", "n", "total_amount", "frauds")
    )
    # append mode only emits windows the final watermark has passed
    # (max event time - 2h); the last windows stay open.
    s_rows = {
        (r["window_start"], r["category"]): (r["n"], r["frauds"]) for r in streamed.collect()
    }
    b_rows = {
        (r["window_start"], r["category"]): (r["n"], r["frauds"]) for r in batch.collect()
    }
    assert s_rows  # the 30-day span closes nearly everything
    assert len(s_rows) >= len(b_rows) * 0.9
    for key, val in s_rows.items():
        assert b_rows[key] == val


def test_session_window_stream_closes_sessions(spark, tmp_path):
    src = str(tmp_path / "tx")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    tx = transactions_df(spark, SF_SMALL)
    tx.write.mode("overwrite").parquet(src)

    sessions = user_sessions_stream(spark, src, out, ckpt)
    rows = sessions.collect()
    assert rows
    total_events = sum(r["events_in_session"] for r in rows)
    assert total_events <= tx.count()
    for r in rows[:50]:
        assert r["session_end"] > r["session_start"]


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    """Every pair the stream-stream join emits must exist in the batch
    interval join over the same events, and coverage must be near-total
    (append mode withholds only pairs still inside the watermark at
    end-of-stream)."""
    from real_time_fraud_detection_lakehouse_spark.core.catalog import table
    from real_time_fraud_detection_lakehouse_spark.streaming.windows import (
        clicks_before_purchase_stream,
    )

    src = str(tmp_path / "events")
    ev = table(spark, SF_SMALL, "events")
    ev.write.mode("overwrite").parquet(src)

    streamed = clicks_before_purchase_stream(
        spark, src, str(tmp_path / "out"), str(tmp_path / "ckpt")
    )

    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts").alias("purchase_ts"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("click_ts")
    )
    batch = p.join(
        c,
        (F.col("c_user") == F.col("user_id"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 30 minutes"))
        & (F.col("click_ts") < F.col("purchase_ts")),
    ).select("purchase_id", "user_id", "purchase_ts", "click_ts")

    s_pairs = {tuple(r) for r in streamed.collect()}
    b_pairs = {tuple(r) for r in batch.collect()}
    assert s_pairs  # sf0.001 has thousands of matched pairs
    assert s_pairs <= b_pairs  # no spurious emissions, exactly-once
    assert len(s_pairs) >= len(b_pairs) * 0.9  # only watermark tail withheld


def test_stream_static_enrichment_matches_batch(spark, tmp_path):
    """Stream-static broadcast join ≡ the batch left join, row for
    row; the static dim keeps no stream state."""
    from real_time_fraud_detection_lakehouse_spark.plans.gold import dim_merchant
    from real_time_fraud_detection_lakehouse_spark.plans.silver import build_silver
    from real_time_fraud_detection_lakehouse_spark.streaming.scoring import (
        enrich_stream,
    )

    silver = build_silver(spark, SF_SMALL).select(
        "trans_num", "merchant", "amt", "trans_timestamp"
    )
    # one dim row per join key (dim_merchant is grained on
    # merchant+geo; enrichment wants the merchant grain)
    dim = dim_merchant(build_silver(spark, SF_SMALL)).dropDuplicates(["merchant"])
    src = str(tmp_path / "src")
    silver.write.mode("overwrite").parquet(src)

    streamed = enrich_stream(
        spark, src, dim, ["merchant"], str(tmp_path / "out"), str(tmp_path / "ckpt")
    )
    batch = silver.join(dim, ["merchant"], "left")

    assert streamed.count() == batch.count() == silver.count()
    key = lambda r: r["trans_num"]  # noqa: E731
    s = sorted(
        streamed.select("trans_num", "merchant", "merchant_category").collect(), key=key
    )
    b = sorted(
        batch.select("trans_num", "merchant", "merchant_category").collect(), key=key
    )
    assert s == b


def test_stream_stream_join_restart_is_exactly_once(spark, tmp_path):
    """Re-running the stream-stream join against the same checkpoint
    emits nothing new — replayed micro-batches cannot duplicate
    pairs."""
    from real_time_fraud_detection_lakehouse_spark.core.catalog import table
    from real_time_fraud_detection_lakehouse_spark.streaming.windows import (
        clicks_before_purchase_stream,
    )

    src, out, ckpt = (
        str(tmp_path / "events"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    table(spark, SF_SMALL, "events").write.mode("overwrite").parquet(src)
    first = clicks_before_purchase_stream(spark, src, out, ckpt).count()
    again = clicks_before_purchase_stream(spark, src, out, ckpt).count()
    assert first > 0
    assert again == first  # checkpoint: no reprocessing, no duplicates


def test_stream_stream_outer_join_emits_null_for_unmatched(spark, tmp_path):
    """Left-outer stream-stream interval join: an old unmatched
    purchase (well before the watermark tail) emits a null-click row
    after state eviction; a matched purchase emits its pair; matched
    pairs agree with the inner variant's contract (subset of the batch
    join)."""
    import datetime as dt

    from real_time_fraud_detection_lakehouse_spark.streaming.windows import (
        clicks_before_purchase_stream_outer,
    )

    def ts(day, hour, minute=0):
        return dt.datetime(2024, 1, day, hour, minute)

    rows = [
        # old purchase, NO click within 30 min before -> null row after eviction
        (1, ts(1, 9), 100, "purchase", 5.0, "{}"),
        # a click 10 min before a purchase -> matched pair
        (2, ts(1, 10, 50), 200, "click", 0.0, "{}"),
        (3, ts(1, 11), 200, "purchase", 7.0, "{}"),
        # far-future event drives the watermark past both purchases
        (4, ts(5, 12), 300, "click", 0.0, "{}"),
        (5, ts(5, 13), 300, "purchase", 1.0, "{}"),
    ]
    src = str(tmp_path / "events")
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    ).write.mode("overwrite").parquet(src)

    out = clicks_before_purchase_stream_outer(
        spark, src, str(tmp_path / "out"), str(tmp_path / "ckpt")
    ).collect()
    by_purchase = {}
    for r in out:
        by_purchase.setdefault(r["purchase_id"], []).append(r)
    # unmatched old purchase: exactly one row, null click, flagged
    assert len(by_purchase[1]) == 1
    assert by_purchase[1][0]["click_ts"] is None
    assert by_purchase[1][0]["no_prior_click"] is True
    # matched purchase: its pair, not a null row
    assert len(by_purchase[3]) == 1
    assert by_purchase[3][0]["click_ts"] is not None
    assert by_purchase[3][0]["no_prior_click"] is False
    # the final-watermark purchase (id 5) may be withheld -> no assert


def test_state_store_reader_shows_watermark_bounded_state(spark, tmp_path):
    """The statestore reader exposes exactly the dedup operator's live
    keys: a subset of source keys, each expiring within the watermark
    horizon of the stream's max event time — evidence the state is
    horizon-bounded, not history-bounded."""
    import datetime as dt

    from real_time_fraud_detection_lakehouse_spark.core.catalog import table
    from real_time_fraud_detection_lakehouse_spark.sources.transactions import (
        transactions_df,
    )
    from real_time_fraud_detection_lakehouse_spark.streaming.windows import (
        inspect_dedup_state,
    )

    src = str(tmp_path / "src")
    tx = transactions_df(spark, SF_SMALL)
    tx.write.mode("overwrite").parquet(src)

    state = inspect_dedup_state(
        spark, src, str(tmp_path / "out"), str(tmp_path / "ckpt")
    ).collect()
    assert state, "dedup stream must hold some within-horizon state"
    all_keys = {r["trans_num"] for r in tx.select("trans_num").collect()}
    max_ts = tx.agg(F.max("trans_timestamp")).collect()[0][0]
    horizon = dt.timedelta(hours=2)
    for r in state:
        assert r["trans_num"] in all_keys
        # expiry = event_time + watermark; live state means expiry is
        # after (max event time - watermark) ⇒ within one horizon span
        assert r["expires_at"] >= max_ts - horizon
        assert r["expires_at"] <= max_ts + horizon
    # the state is the horizon TAIL, not the whole history
    assert len(state) < len(all_keys)


def _assert_fixture_inside_watermark_horizon(spark, src, horizon_s=2 * 3600):
    """Precondition of the stream≡batch parity contract (see the
    streaming/curation.py module docstring): dropDuplicatesWithinWatermark
    only guarantees single-survivor dedup for arrivals within the delay
    threshold of each other, so every duplicate class's ingest_ts span
    must sit strictly inside the watermark horizon. A larger fixture
    whose doc_id-second clock stretches a class past 2h must widen the
    watermark instead of silently diverging from the batch election."""
    from real_time_fraud_detection_lakehouse_spark.operators.curation import (
        curation_columns,
    )

    fixture = spark.read.parquet(src)
    span = (
        fixture.groupBy(curation_columns()["fp"].alias("fp"))
        .agg(
            (
                F.unix_timestamp(F.max("ingest_ts"))
                - F.unix_timestamp(F.min("ingest_ts"))
            ).alias("gap")
        )
        .agg(F.max("gap").alias("max_gap"))
        .collect()[0]["max_gap"]
    )
    assert span < horizon_s, (
        f"fixture intra-class ingest span {span}s >= watermark {horizon_s}s — "
        "parity with the batch keeper election is no longer guaranteed"
    )


def test_streaming_curation_equals_batch_gates(spark, tmp_path):
    """Filter-at-ingest ≡ batch: the streaming curation slice over the
    replayed documents fixture keeps exactly one survivor per content
    fingerprint, the surviving fingerprint SET equals the batch
    computation (gates applied, then distinct fp), and every emitted
    row passes all three gates with batch-identical scrub accounting.
    (Which replica of a duplicate survives is arrival-order-defined —
    the fingerprint set, not the doc_id set, is the contract.)"""
    from real_time_fraud_detection_lakehouse_spark.core.catalog import table
    from real_time_fraud_detection_lakehouse_spark.operators.curation import (
        curation_columns,
    )
    from real_time_fraud_detection_lakehouse_spark.operators.text import (
        DECON_EVAL_SOURCE,
    )
    from real_time_fraud_detection_lakehouse_spark.streaming.curation import (
        curation_stream,
        write_doc_stream_fixture,
    )

    src = str(tmp_path / "src")
    n_in = write_doc_stream_fixture(spark, SF_SMALL, src, replays=2)
    _assert_fixture_inside_watermark_horizon(spark, src)
    # eval_docs=None is the EXPLICIT gates-only opt-out (round 10: the
    # eval quarantine defaults ON; this test compares against the
    # gates-only batch slice, so it must opt out)
    out = curation_stream(
        spark, src, str(tmp_path / "out"), str(tmp_path / "ckpt"), eval_docs=None
    ).collect()
    assert out, "stream must emit survivors"
    assert len(out) < n_in  # replays + failing docs were dropped

    cols = curation_columns()
    batch = (
        table(spark, SF_SMALL, "documents")
        .select(
            "doc_id",
            "source",
            cols["quality_score"].alias("quality_score"),
            cols["en_hits"].alias("en_hits"),
            cols["n_pii"].alias("n_pii"),
            cols["clean_fp"].alias("clean_fp"),
            cols["fp"].alias("fp"),
        )
        .filter(
            (F.col("quality_score") >= 0.5)
            & (F.col("en_hits") > 0)
            & (F.col("source") != DECON_EVAL_SOURCE)
        )
    )
    batch_rows = batch.collect()
    batch_fps = {r["fp"] for r in batch_rows}
    by_doc = {r["doc_id"]: r for r in batch_rows}

    stream_fps = [r["fp"] for r in out]
    assert len(stream_fps) == len(set(stream_fps)), "dedup emitted a fp twice"
    assert set(stream_fps) == batch_fps, "survivor fingerprints diverge from batch"
    for r in out:
        b = by_doc[r["doc_id"]]  # every emission is a gate-passing doc
        assert (r["quality_score"], r["n_pii"], r["clean_fp"]) == (
            b["quality_score"],
            b["n_pii"],
            b["clean_fp"],
        )


def test_streaming_curation_with_decon_matches_batch_pipeline(spark, tmp_path):
    """The FULL filter-at-ingest slice (gates + stream-static
    decontamination + fingerprint dedup) lands on exactly the batch
    docs_curate_pipeline survivor set, compared by content
    fingerprint: clean_fp multisets must be equal (the batch keeper is
    min-doc_id per fp, the stream keeps first arrival — different
    representatives, same content)."""
    from real_time_fraud_detection_lakehouse_spark.core.catalog import (
        TESTDATA_TABLES,
        table,
    )
    from real_time_fraud_detection_lakehouse_spark.operators.curation import (
        docs_curate_pipeline,
    )
    from real_time_fraud_detection_lakehouse_spark.operators.text import (
        DECON_EVAL_SOURCE,
    )
    from real_time_fraud_detection_lakehouse_spark.streaming.curation import (
        curation_stream,
        write_doc_stream_fixture,
    )

    src = str(tmp_path / "src")
    write_doc_stream_fixture(spark, SF_SMALL, src, replays=2)
    _assert_fixture_inside_watermark_horizon(spark, src)
    eval_docs = table(spark, SF_SMALL, "documents").filter(
        F.col("source") == DECON_EVAL_SOURCE
    )
    out = curation_stream(
        spark,
        src,
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
        eval_docs=eval_docs,
    ).collect()

    frames = {n: table(spark, SF_SMALL, n) for n in TESTDATA_TABLES}
    batch = docs_curate_pipeline(frames).collect()
    assert sorted(r["clean_fp"] for r in out) == sorted(r["clean_fp"] for r in batch)


def test_streaming_curation_mixed_class_quarantined_both_orders(spark, tmp_path):
    """Round-9 order-independence: a duplicate class spanning the eval
    source AND a training source — planted SHORT (< DECON_GRAM tokens,
    so the gram gate cannot see it) — is quarantined by the exact-fp
    eval gate under BOTH arrival orders, and the stream survivor fp set
    equals the batch docs_curate_pipeline survivor fp set each time.
    Covers both mixed-class shapes: eval member has the smaller doc_id
    (S1) and the larger doc_id (S2). Round 10: the stream is invoked
    WITHOUT eval_docs — the quarantine must hold by DEFAULT (the eval
    set derives from the source's own eval-source docs at stream
    start), per the round-9 verdict's default-on requirement."""
    from real_time_fraud_detection_lakehouse_spark.operators.curation import (
        curation_columns,
        docs_curate_pipeline,
    )
    from real_time_fraud_detection_lakehouse_spark.operators.text import (
        DECON_EVAL_SOURCE,
    )
    from real_time_fraud_detection_lakehouse_spark.streaming.curation import (
        INGEST_BASE,
        curation_stream,
    )

    s1 = "alpha bravo charlie the"  # 4 distinct tokens + stopword:
    s2 = "delta echo foxtrot the"  # quality exactly 0.5, en_hits 1,
    keep = "golf hotel india the"  # and NO 5-gram → gram-gate blind
    rows = [
        (1, DECON_EVAL_SOURCE, s1),  # S1: eval member first by doc_id
        (2, "web", s1),
        (3, "web", keep),  # the one doc that must survive
        (4, DECON_EVAL_SOURCE, "juliett kilo lima the"),  # plain eval doc
        (5, "web", s2),  # S2: train member first by doc_id
        (6, DECON_EVAL_SOURCE, s2),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    batch_fps = {
        r["clean_fp"] for r in docs_curate_pipeline({"documents": docs}).collect()
    }
    cols = curation_columns()
    keep_fp = docs.filter(F.col("doc_id") == 3).select(
        cols["clean_fp"].alias("c")
    ).collect()[0]["c"]
    assert batch_fps == {keep_fp}, "batch must quarantine both mixed classes"

    # arrival order must be REAL, not cosmetic: dropDuplicatesWithinWatermark
    # keeps the first row PROCESSED per key (ingest_ts never elects the
    # survivor), so each doc lands as its own parquet file with a strictly
    # increasing mtime and the stream paces one file per micro-batch —
    # cross-batch state makes "doc X arrived before doc Y" well-defined.
    import glob as _glob
    import os as _os
    import time as _time

    def write_sequential(src, order):
        seen: set[str] = set()
        base = _time.time() - 3600
        for i, doc_id in enumerate(order):
            one = docs.filter(F.col("doc_id") == doc_id).withColumn(
                "ingest_ts",
                F.lit(INGEST_BASE).cast("timestamp")
                + F.make_dt_interval(secs=F.col("doc_id").cast("double")),
            )
            one.coalesce(1).write.mode("append").parquet(src)
            for f in _glob.glob(_os.path.join(src, "*.parquet")):
                if f not in seen:
                    _os.utime(f, (base + i, base + i))
                    seen.add(f)

    for tag, order in (("forward", [1, 2, 3, 4, 5, 6]), ("reversed", [6, 5, 4, 3, 2, 1])):
        src = str(tmp_path / f"src_{tag}")
        write_sequential(src, order)
        ckpt = str(tmp_path / f"ckpt_{tag}")
        out = curation_stream(
            spark,
            src,
            str(tmp_path / f"out_{tag}"),
            ckpt,
            max_files_per_trigger=1,
        ).collect()
        # the pacing must be real: 6 files at 1/trigger → ≥6 committed
        # micro-batches, else the "order" below is one batch's task
        # scheduling and the leg proves nothing
        n_batches = len(
            [n for n in _os.listdir(_os.path.join(ckpt, "offsets")) if not n.startswith(".")]
        )
        assert n_batches >= 6, f"{tag}: expected ≥6 micro-batches, got {n_batches}"
        got = {r["clean_fp"] for r in out}
        assert got == batch_fps, f"{tag} arrival order diverged from batch"


def test_streaming_curation_restart_is_idempotent(spark, tmp_path):
    """Exactly-once on checkpoint reuse: re-running the curation
    stream against the same source + checkpoint emits NOTHING new —
    the availableNow restart sees all files committed and the sink
    stays byte-stable (the bronze-stream restart contract, applied to
    the ingest-curation slice)."""
    from real_time_fraud_detection_lakehouse_spark.streaming.curation import (
        curation_stream,
        write_doc_stream_fixture,
    )

    src = str(tmp_path / "src")
    write_doc_stream_fixture(spark, SF_SMALL, src, replays=1)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    first = curation_stream(spark, src, out, ckpt).collect()
    second = curation_stream(spark, src, out, ckpt).collect()
    assert sorted(r["doc_id"] for r in second) == sorted(r["doc_id"] for r in first)


def test_streaming_incremental_dedup_matches_batch_both_orders(spark, tmp_path):
    """Round-11 verdict #5: the streaming ingest gate
    (incremental_dedup_stream against the published corpus index)
    admits the SAME fingerprint set as the batch twin
    (docs_dedup_incremental) on the planted corpus/arrival fixture,
    under BOTH arrival orders — and the documented deferral holds: an
    arrival-vs-arrival NEAR-dup (nightly re-index's job) is admitted
    by the stream, then gated once the index is rebuilt over the
    admissions."""
    import glob as _glob
    import os as _os
    import time as _time

    from real_time_fraud_detection_lakehouse_spark.operators.dedup import (
        build_corpus_index,
        docs_dedup_incremental,
    )
    from real_time_fraud_detection_lakehouse_spark.streaming.curation import (
        INGEST_BASE,
        incremental_dedup_stream,
    )

    base = " ".join(f"tok{i:02d}" for i in range(25))
    near = base + " extraa extrab extrac"  # same prefix bucket, J≈0.82
    fresh = " ".join(f"new{i:02d}" for i in range(25))
    rows = [
        (1, "en", "web", base),   # corpus
        (2, "en", "web", fresh.replace("new", "old")),  # corpus, unrelated
        # hwm = floor(16 * 0.8) = 12 → arrivals are 13..16
        (13, "en", "web", base),   # exact twin of corpus doc 1 → dropped
        (14, "en", "web", near),   # near-dup of corpus doc 1 → dropped
        (15, "en", "web", fresh),  # fresh → ADMITTED
        (16, "en", "web", fresh),  # exact twin of arrival 15 → dropped
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, lang string, source string, text string"
    ).withColumn("n_chars", F.length("text"))

    batch_fps = {
        r["fp"]
        for r in docs_dedup_incremental({"documents": docs})
        .join(
            docs.select("doc_id", F.md5(F.lower(F.trim(F.col("text")))).alias("fp")),
            "doc_id",
        )
        .collect()
    }
    assert len(batch_fps) == 1  # fixture sanity: exactly doc 15's class

    root = str(tmp_path / "corpus_index")
    build_corpus_index({"documents": docs.filter(F.col("doc_id") <= 12)}, root)
    arrivals = docs.filter(F.col("doc_id") > 12)

    def write_sequential(src, order):
        seen: set[str] = set()
        mtime_base = _time.time() - 3600
        for i, doc_id in enumerate(order):
            one = arrivals.filter(F.col("doc_id") == doc_id).withColumn(
                "ingest_ts",
                F.lit(INGEST_BASE).cast("timestamp")
                + F.make_dt_interval(secs=F.col("doc_id").cast("double")),
            )
            one.coalesce(1).write.mode("append").parquet(src)
            for f in _glob.glob(_os.path.join(src, "*.parquet")):
                if f not in seen:
                    _os.utime(f, (mtime_base + i, mtime_base + i))
                    seen.add(f)

    for tag, order in (("forward", [13, 14, 15, 16]), ("reversed", [16, 15, 14, 13])):
        src = str(tmp_path / f"src_{tag}")
        write_sequential(src, order)
        ckpt = str(tmp_path / f"ckpt_{tag}")
        out = incremental_dedup_stream(
            spark,
            src,
            str(tmp_path / f"out_{tag}"),
            ckpt,
            root,
            max_files_per_trigger=1,
        ).collect()
        n_batches = len(
            [n for n in _os.listdir(_os.path.join(ckpt, "offsets")) if not n.startswith(".")]
        )
        assert n_batches >= 4, f"{tag}: expected ≥4 micro-batches, got {n_batches}"
        assert {r["fp"] for r in out} == batch_fps, f"{tag} diverged from batch"

    # the documented deferral: doc 17 is a NEAR-dup of admitted arrival
    # 15 (not of any corpus doc) — today's stream admits it, the batch
    # twin on the full table drops it, and once the nightly pass
    # re-indexes corpus+admissions the SAME stream gate drops it too
    day2 = spark.createDataFrame(
        [(17, "en", "web", fresh + " extraa extrab extrac")],
        "doc_id long, lang string, source string, text string",
    ).withColumn("n_chars", F.length("text"))
    src2 = str(tmp_path / "src_day2")
    day2.withColumn(
        "ingest_ts",
        F.lit(INGEST_BASE).cast("timestamp")
        + F.make_dt_interval(secs=F.col("doc_id").cast("double")),
    ).write.parquet(src2)
    stale = incremental_dedup_stream(
        spark, src2, str(tmp_path / "out_stale"), str(tmp_path / "ckpt_stale"), root
    ).collect()
    assert {r["doc_id"] for r in stale} == {17}, "stale index must admit the peer near-dup"
    # the nightly input is corpus + ADMISSIONS (1, 2, 15) — NOT the
    # rejected arrivals 13/14; the pass must not depend on them
    root2 = str(tmp_path / "corpus_index_day2")
    build_corpus_index(
        {"documents": docs.filter(F.col("doc_id").isin(1, 2, 15))}, root2
    )
    fresh_idx = incremental_dedup_stream(
        spark, src2, str(tmp_path / "out_fresh"), str(tmp_path / "ckpt_fresh"), root2
    ).collect()
    assert fresh_idx == [], "re-indexed gate must drop the near-dup of an admission"


def test_streaming_containment_gate_matches_batch_both_orders(spark, tmp_path):
    """r16 (r15 verdict #5): the containment ingest gate admits
    EXACTLY the arrivals not substantially contained in the standing
    corpus, under BOTH arrival orders — the class the Jaccard gate
    structurally misses (a short doc quoted whole inside a long
    corpus doc has Jaccard ~0.26 here, containment 1.0). The
    documented asymmetries are pinned as exactly the batch apply's
    deferred classes: a corpus doc contained IN an arrival survives
    the gate (nightly's job to drop the corpus side), and an
    arrival contained in a PEER arrival is admitted today, then
    gated once the nightly pass re-indexes over the admissions."""
    import glob as _glob
    import os as _os
    import time as _time

    from real_time_fraud_detection_lakehouse_spark.operators.dedup import (
        build_corpus_index,
        docs_dedup_containment_apply,
    )
    from real_time_fraud_detection_lakehouse_spark.streaming.curation import (
        INGEST_BASE,
        containment_gate_stream,
    )

    long_doc = " ".join(f"tok{i:02d}" for i in range(40))
    short_in_long = " ".join(f"tok{i:02d}" for i in range(12))
    old_short = " ".join(f"old{i:02d}" for i in range(12))
    old_long = " ".join(f"old{i:02d}" for i in range(40))
    fresh = " ".join(f"new{i:02d}" for i in range(25))
    partial = " ".join(
        [f"tok{i:02d}" for i in range(10)] + [f"zzz{i:02d}" for i in range(10, 20)]
    )
    contained_in_fresh = " ".join(f"new{i:02d}" for i in range(12))
    rows = [
        (1, "en", "web", long_doc),    # corpus: the container
        (2, "en", "web", old_short),   # corpus: contained in arrival 17
        (13, "en", "web", short_in_long),  # ⊂ corpus 1 → DROPPED
        (14, "en", "web", fresh),          # fresh → ADMITTED
        (15, "en", "web", partial),        # same bucket, cont. 8/18 → ADMITTED
        (16, "en", "web", fresh),          # byte twin of 14 → fp-collapsed
        (17, "en", "web", old_long),       # CONTAINS corpus 2 → ADMITTED
        (18, "en", "web", contained_in_fresh),  # ⊂ peer arrival 14 → deferred
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, lang string, source string, text string"
    ).withColumn("n_chars", F.length("text"))
    fp_of = {
        r["doc_id"]: r["fp"]
        for r in docs.select(
            "doc_id", F.md5(F.lower(F.trim(F.col("text")))).alias("fp")
        ).collect()
    }

    # fixture sanity via the BATCH apply over the full table: corpus 2
    # and arrivals 13/16/18 fall, so survivors-among-arrivals are
    # {14, 15, 17}
    batch_survivors = {
        r["doc_id"]
        for r in docs_dedup_containment_apply({"documents": docs}).collect()
    }
    assert batch_survivors == {1, 14, 15, 17}

    root = str(tmp_path / "corpus_index")
    build_corpus_index({"documents": docs.filter(F.col("doc_id") <= 12)}, root)
    arrivals = docs.filter(F.col("doc_id") > 12)

    def write_sequential(src, order):
        seen: set[str] = set()
        mtime_base = _time.time() - 3600
        for i, doc_id in enumerate(order):
            one = arrivals.filter(F.col("doc_id") == doc_id).withColumn(
                "ingest_ts",
                F.lit(INGEST_BASE).cast("timestamp")
                + F.make_dt_interval(secs=F.col("doc_id").cast("double")),
            )
            one.coalesce(1).write.mode("append").parquet(src)
            for f in _glob.glob(_os.path.join(src, "*.parquet")):
                if f not in seen:
                    _os.utime(f, (mtime_base + i, mtime_base + i))
                    seen.add(f)

    # gate expectation: batch survivors among arrivals PLUS the
    # deferred peer-containment class {18}
    expected_fps = {fp_of[d] for d in (14, 15, 17, 18)}
    for tag, order in (
        ("forward", [13, 14, 15, 16, 17, 18]),
        ("reversed", [18, 17, 16, 15, 14, 13]),
    ):
        src = str(tmp_path / f"csrc_{tag}")
        write_sequential(src, order)
        ckpt = str(tmp_path / f"cckpt_{tag}")
        out = containment_gate_stream(
            spark,
            src,
            str(tmp_path / f"cout_{tag}"),
            ckpt,
            root,
            max_files_per_trigger=1,
        ).collect()
        n_batches = len(
            [n for n in _os.listdir(_os.path.join(ckpt, "offsets")) if not n.startswith(".")]
        )
        assert n_batches >= 6, f"{tag}: expected ≥6 micro-batches, got {n_batches}"
        got = {r["fp"] for r in out}
        assert got == expected_fps, f"{tag} diverged"
        # the deferral, pinned exactly: admissions minus the batch
        # apply's survivors-among-arrivals is {18} and nothing else
        assert got - {fp_of[d] for d in batch_survivors if d > 12} == {
            fp_of[18]
        }

    # deferral closure: the nightly pass re-indexes corpus + the
    # admitted arrivals; a day-2 twin of the peer-contained class is
    # then a CORPUS containment and the same gate drops it
    root2 = str(tmp_path / "corpus_index_day2")
    build_corpus_index(
        {"documents": docs.filter(F.col("doc_id").isin(1, 2, 14, 15, 17))},
        root2,
    )
    day2 = spark.createDataFrame(
        [(19, "en", "web", contained_in_fresh)],
        "doc_id long, lang string, source string, text string",
    ).withColumn("n_chars", F.length("text"))
    src2 = str(tmp_path / "csrc_day2")
    day2.withColumn(
        "ingest_ts",
        F.lit(INGEST_BASE).cast("timestamp")
        + F.make_dt_interval(secs=F.col("doc_id").cast("double")),
    ).write.parquet(src2)
    gated = containment_gate_stream(
        spark, src2, str(tmp_path / "cout_day2"), str(tmp_path / "cckpt_day2"), root2
    ).collect()
    assert gated == [], "re-indexed gate must drop the peer-contained class"


def test_streaming_containment_gate_global_exact_recall(spark, tmp_path):
    """r16: the exact-recall containment gate at ingest — the planted
    mid-document quote (different 4-token prefix) that the BUCKETED
    gate admits is rejected here (the dedup_containment_global
    prefix-filter theorem applied per batch), under both arrival
    orders; decisions match the batch global op's corpus-containment
    drops exactly; restart is idempotent."""
    from real_time_fraud_detection_lakehouse_spark.operators.dedup import (
        build_corpus_index,
        containment_gate_global,
        dedup_containment_global,
    )
    from real_time_fraud_detection_lakehouse_spark.streaming.curation import (
        INGEST_BASE,
        containment_gate_global_stream,
        containment_gate_stream,
    )

    quoted = "alpha beta gamma delta one two three four five"
    rows = [
        # corpus doc 1 wraps the quote MID-document
        (1, "intro words come first here " + quoted + " trailing text "
            "apple banana cherry durian elderberry fig grape"),
        (2, "old00 old01 old02 old03 old04 old05 old06 old07 old08 "
            "old09 old10 old11"),
        # arrivals: 13 = the quote (contained mid-doc-1), 14 fresh,
        # 15 CONTAINS corpus 2 (corpus-side containment — admitted)
        (13, quoted),
        (14, " ".join(f"new{i:02d}" for i in range(25))),
        (15, "old00 old01 old02 old03 old04 old05 old06 old07 old08 "
             "old09 old10 old11 extra words trail behind here now"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string").select(
        "doc_id", F.lit("en").alias("lang"), F.lit("web").alias("source"),
        "text",
    ).withColumn("n_chars", F.length("text"))

    root = str(tmp_path / "gidx")
    build_corpus_index({"documents": docs.filter(F.col("doc_id") <= 12)}, root)
    arrivals = docs.filter(F.col("doc_id") > 12)

    # the batch anchor: corpus-containment drops from the global op
    gpairs = dedup_containment_global({"documents": docs}).collect()
    expected_drop = {
        p["doc_b"]
        for p in gpairs
        if p["doc_a"] <= 12 and p["doc_b"] > 12 and p["containment_b"] >= 0.8
    }
    assert expected_drop == {13}  # fixture sanity: the mid-doc quote

    for tag in ("fwd", "rev"):
        src = str(tmp_path / f"gsrc_{tag}")
        order = F.col("doc_id").asc() if tag == "fwd" else F.col("doc_id").desc()
        arrivals.orderBy(order).coalesce(1).write.parquet(src)
        out = containment_gate_global_stream(
            spark, src, str(tmp_path / f"gout_{tag}"),
            str(tmp_path / f"gckpt_{tag}"), root,
        )
        got = {r["doc_id"]: (r["admitted"], r["matched_doc"]) for r in out.collect()}
        assert got == {13: (False, 1), 14: (True, None), 15: (True, None)}, (
            tag, got,
        )

    # the bucketed gate ADMITS the mid-document quote — the recall
    # gap this gate closes (both gates share containment_gate_cond)
    bsrc = str(tmp_path / "bsrc")
    arrivals.withColumn(
        "ingest_ts",
        F.lit(INGEST_BASE).cast("timestamp")
        + F.make_dt_interval(secs=F.col("doc_id").cast("double")),
    ).coalesce(1).write.parquet(bsrc)
    bucketed = containment_gate_stream(
        spark, bsrc, str(tmp_path / "bout"), str(tmp_path / "bckpt"), root
    )
    assert 13 in {r["doc_id"] for r in bucketed.collect()}

    # restart idempotence: same checkpoint, no new input
    again = containment_gate_global_stream(
        spark, str(tmp_path / "gsrc_fwd"), str(tmp_path / "gout_fwd"),
        str(tmp_path / "gckpt_fwd"), root,
    )
    assert {r["doc_id"]: (r["admitted"], r["matched_doc"]) for r in again.collect()} == {
        13: (False, 1), 14: (True, None), 15: (True, None),
    }


def test_streaming_incremental_dedup_restart_is_idempotent(spark, tmp_path):
    """Exactly-once on checkpoint reuse for the ingest gate: a re-run
    against the same source + checkpoint + index emits nothing new —
    the curation-stream restart contract applied to the near-dup
    gate."""
    from pyspark.sql import functions as F

    from real_time_fraud_detection_lakehouse_spark.core.catalog import table
    from real_time_fraud_detection_lakehouse_spark.operators.dedup import (
        _INCR_HWM_FRACTION,
        build_corpus_index,
    )
    from real_time_fraud_detection_lakehouse_spark.streaming.curation import (
        INGEST_BASE,
        incremental_dedup_stream,
    )

    docs = table(spark, SF_SMALL, "documents")
    h = docs.agg(
        F.floor(F.max("doc_id") * _INCR_HWM_FRACTION).cast("long")
    ).first()[0]
    root = str(tmp_path / "index")
    build_corpus_index({"documents": docs.filter(F.col("doc_id") <= h)}, root)
    src = str(tmp_path / "src")
    docs.filter(F.col("doc_id") > h).withColumn(
        "ingest_ts",
        F.lit(INGEST_BASE).cast("timestamp")
        + F.make_dt_interval(secs=F.col("doc_id").cast("double")),
    ).write.parquet(src)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    first = incremental_dedup_stream(spark, src, out, ckpt, root).collect()
    second = incremental_dedup_stream(spark, src, out, ckpt, root).collect()
    assert first and sorted(r["doc_id"] for r in second) == sorted(
        r["doc_id"] for r in first
    )


def test_streaming_top_ngrams_matches_batch_both_orders(spark, tmp_path):
    """heavy_hitters_stream (round 11): in the no-eviction regime
    (corpus bigram type count within MG capacity) the per-shard MG
    counters are exact, so the streamed top-K must equal the exact
    batch pass row-for-row, order included — under BOTH arrival
    orders, with state accumulating across >= 3 micro-batches."""
    import glob as _glob
    import os as _os
    import time as _time

    from real_time_fraud_detection_lakehouse_spark.core.catalog import table
    from real_time_fraud_detection_lakehouse_spark.operators.text import (
        MG_CAPACITY,
        _bigram_stream,
        text_top_ngrams,
    )
    from real_time_fraud_detection_lakehouse_spark.streaming.stateful import (
        heavy_hitters_stream,
    )

    docs = table(spark, SF_SMALL, "documents")
    assert _bigram_stream(docs).distinct().count() <= MG_CAPACITY, (
        "fixture must sit in the no-eviction regime for exact equality"
    )
    batch = [tuple(r) for r in text_top_ngrams({"documents": docs}).collect()]

    thirds = [
        docs.filter(F.col("doc_id") % 3 == i).localCheckpoint() for i in range(3)
    ]
    for tag, order in (("forward", [0, 1, 2]), ("reversed", [2, 1, 0])):
        src = str(tmp_path / f"src_{tag}")
        seen: set[str] = set()
        mtime_base = _time.time() - 3600
        for i, part in enumerate(order):
            thirds[part].coalesce(1).write.mode("append").parquet(src)
            for f in _glob.glob(_os.path.join(src, "*.parquet")):
                if f not in seen:
                    _os.utime(f, (mtime_base + i, mtime_base + i))
                    seen.add(f)
        ckpt = str(tmp_path / f"ckpt_{tag}")
        out = heavy_hitters_stream(
            spark,
            src,
            str(tmp_path / f"out_{tag}"),
            ckpt,
            max_files_per_trigger=1,
        )
        n_batches = len(
            [n for n in _os.listdir(_os.path.join(ckpt, "offsets")) if not n.startswith(".")]
        )
        assert n_batches >= 3, f"{tag}: expected >= 3 micro-batches, got {n_batches}"
        assert [tuple(r) for r in out.collect()] == batch, f"{tag} diverged from batch"


def test_streaming_top_ngrams_bounded_state_under_eviction(spark, tmp_path):
    """Adversarial regime: one shard, capacity 64, ~3000 distinct
    bigram types — eviction provably fires, yet (a) the emitted
    summary never exceeds the capacity (the bounded-state claim: state
    is config-sized, not type-space-sized) and (b) the planted heavy
    hitters surface with MG counters that are lower bounds within the
    n/(capacity+1) error band."""
    cap = 64
    rare = " ".join(f"u{i:04d}" for i in range(3000))  # 2999 distinct, once each
    rows = [
        (0, rare, "en", "A", 0),
        (1, " ".join(["hot"] * 501), "en", "A", 0),   # "hot hot" x 500
        (2, " ".join(["warm"] * 101), "en", "A", 0),  # "warm warm" x 100
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )

    from real_time_fraud_detection_lakehouse_spark.streaming.stateful import (
        heavy_hitters_stream,
    )

    src = str(tmp_path / "src")
    docs.write.parquet(src)
    out = heavy_hitters_stream(
        spark,
        src,
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
        shards=1,
        capacity=cap,
        k=cap + 100,  # no top-K cut: observe the whole surviving summary
    ).collect()
    n_stream = 2999 + 500 + 100  # total bigram occurrences
    err = n_stream // (cap + 1)
    assert len(out) <= cap, "summary exceeded the counter budget"
    got = {r["bigram"]: r["n"] for r in out}
    for bigram, true in (("hot hot", 500), ("warm warm", 100)):
        assert bigram in got, f"heavy hitter {bigram!r} evicted"
        assert true - err <= got[bigram] <= true, (
            f"{bigram!r}: counter {got[bigram]} outside [{true - err}, {true}]"
        )


def test_streaming_top_ngrams_empty_stream_yields_empty_frame(spark, tmp_path):
    """An all-short-docs source emits zero bigrams; the sink directory
    then holds only _spark_metadata, and the reader must return an
    EMPTY (bigram, n) frame — not an AnalysisException from parquet
    schema inference."""
    from real_time_fraud_detection_lakehouse_spark.streaming.stateful import (
        heavy_hitters_stream,
    )

    docs = spark.createDataFrame(
        [(0, "solo", "en", "A", 4), (1, "", "en", "A", 0)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    src = str(tmp_path / "src")
    docs.write.parquet(src)
    out = heavy_hitters_stream(
        spark, src, str(tmp_path / "out"), str(tmp_path / "ckpt")
    )
    assert out.columns == ["bigram", "n"]
    assert out.count() == 0


def test_velocity_stream_empty_source_yields_empty_frame(spark, tmp_path):
    """A zero-row transaction source leaves the sink with only
    _spark_metadata; the reader must return an empty typed frame, not
    an AnalysisException from parquet schema inference (same bug class
    as the heavy-hitter sink, fixed at all three stateful sinks)."""
    from real_time_fraud_detection_lakehouse_spark.streaming.stateful import (
        velocity_stream,
    )

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [],
        "cc_num long, trans_num string, trans_timestamp timestamp, amt double",
    ).write.parquet(src)
    out = velocity_stream(
        spark, src, str(tmp_path / "out"), str(tmp_path / "ckpt")
    )
    assert out.count() == 0
    assert "txn_seq" in out.columns


def test_streaming_distinct_hll_matches_batch_rollup_both_orders(spark, tmp_path):
    """Sketch-at-ingest (round-11 late): HLL register maxima commute,
    so however the stream slices arrivals into micro-batches, the
    per-day sketches it emits merge to the SAME registers — and the
    same estimate — as the batch rollup over the raw table. Pinned
    row-for-row under both arrival orders, with >= 3 micro-batches
    and a far-future sentinel type flushing every real day past the
    watermark (excluded from the comparison on both sides). The
    watermark is set wider than the fixture's 30-day span so that
    REVERSED arrival drops nothing — watermark late-drop semantics
    are a different contract, pinned by the other streaming tests."""
    import glob as _glob
    import os as _os
    import time as _time

    from real_time_fraud_detection_lakehouse_spark.core.catalog import table
    from real_time_fraud_detection_lakehouse_spark.plans.relational import RELATIONAL
    from real_time_fraud_detection_lakehouse_spark.streaming.windows import (
        distinct_users_sketch_stream,
    )

    events = table(spark, SF_SMALL, "events")
    sentinel = events.agg(
        F.lit(10**9).alias("event_id"),
        (F.max("ts") + F.expr("INTERVAL 45 DAYS")).alias("ts"),
        F.lit(-1).cast("long").alias("user_id"),
        F.lit("__sentinel__").alias("event_type"),
        F.lit(0.0).alias("value"),
        F.lit("{}").alias("props"),
    )
    batch = {
        tuple(r)
        for r in RELATIONAL["q_distinct_users_hll_rollup"][0]({"events": events})
        .collect()
    }

    thirds = [
        events.filter(F.col("event_id") % 3 == i).localCheckpoint() for i in range(3)
    ]
    for tag, order in (("forward", [0, 1, 2]), ("reversed", [2, 1, 0])):
        src = str(tmp_path / f"src_{tag}")
        seen: set[str] = set()
        mtime_base = _time.time() - 3600
        for i, part in enumerate(order):
            thirds[part].coalesce(1).write.mode("append").parquet(src)
            for f in _glob.glob(_os.path.join(src, "*.parquet")):
                if f not in seen:
                    _os.utime(f, (mtime_base + i, mtime_base + i))
                    seen.add(f)
        # sentinel arrives LAST so it can only flush, never be flushed
        sentinel.coalesce(1).write.mode("append").parquet(src)
        for f in _glob.glob(_os.path.join(src, "*.parquet")):
            if f not in seen:
                _os.utime(f, (mtime_base + 10, mtime_base + 10))
                seen.add(f)
        ckpt = str(tmp_path / f"ckpt_{tag}")
        # watermark wider than the 30-day data span: no row is ever
        # late whatever the arrival order (late-drop semantics are
        # pinned elsewhere; THIS test pins slicing invariance), and
        # the +45d sentinel still flushes every real day
        out = distinct_users_sketch_stream(
            spark,
            src,
            str(tmp_path / f"out_{tag}"),
            ckpt,
            watermark="40 days",
            max_files_per_trigger=1,
        )
        got = {
            tuple(r)
            for r in out.filter(F.col("event_type") != "__sentinel__").collect()
        }
        n_batches = len(
            [n for n in _os.listdir(_os.path.join(ckpt, "offsets")) if not n.startswith(".")]
        )
        assert got == batch, f"{tag} diverged from the batch rollup"
        assert n_batches >= 3, f"{tag}: expected >= 3 micro-batches, got {n_batches}"


def test_streaming_bloom_curation_equals_exact_minus_bloom_flags(spark, tmp_path):
    """decon_mode='bloom' admits exactly the exact-mode admissions
    minus the docs the BATCH bloom op flags (no false negatives ⇒
    nothing the exact gate drops survives; bloom false positives are
    the only extra drops, and the batch op names them) — under both
    arrival orders."""
    import glob as _glob
    import os as _os
    import time as _time

    from real_time_fraud_detection_lakehouse_spark.core.catalog import table
    from real_time_fraud_detection_lakehouse_spark.operators.text import TEXT_OPS
    from real_time_fraud_detection_lakehouse_spark.streaming.curation import (
        INGEST_BASE,
        curation_stream,
    )

    docs = table(spark, SF_SMALL, "documents")
    bloom_flagged = {
        r["doc_id"]
        for r in TEXT_OPS["docs_bloom_decontaminate"][0]({"documents": docs}).collect()
    }

    stamped = docs.withColumn(
        "ingest_ts",
        F.lit(INGEST_BASE).cast("timestamp")
        + F.make_dt_interval(secs=F.col("doc_id").cast("double")),
    )
    halves = [
        stamped.filter(F.col("doc_id") % 2 == i).localCheckpoint() for i in range(2)
    ]
    for tag, order in (("forward", [0, 1]), ("reversed", [1, 0])):
        src = str(tmp_path / f"src_{tag}")
        seen: set[str] = set()
        mtime_base = _time.time() - 3600
        for i, part in enumerate(order):
            halves[part].coalesce(1).write.mode("append").parquet(src)
            for f in _glob.glob(_os.path.join(src, "*.parquet")):
                if f not in seen:
                    _os.utime(f, (mtime_base + i, mtime_base + i))
                    seen.add(f)
        exact = curation_stream(
            spark,
            src,
            str(tmp_path / f"out_exact_{tag}"),
            str(tmp_path / f"ckpt_exact_{tag}"),
            max_files_per_trigger=1,
        )
        bloom = curation_stream(
            spark,
            src,
            str(tmp_path / f"out_bloom_{tag}"),
            str(tmp_path / f"ckpt_bloom_{tag}"),
            max_files_per_trigger=1,
            decon_mode="bloom",
        )
        exact_ids = {r["doc_id"] for r in exact.collect()}
        bloom_ids = {r["doc_id"] for r in bloom.collect()}
        assert bloom_ids == exact_ids - bloom_flagged, tag
        # and with this fixture's bloom load the FP cost is zero or tiny
        assert len(exact_ids - bloom_ids) <= max(3, 0.01 * len(exact_ids)), tag


def test_day_bucketed_stream_requires_utc_session(spark, tmp_path):
    """Round-11 advice fix: the stream buckets days with
    window('ts','1 day') (epoch-aligned = UTC midnights) while its
    batch twin uses to_date(ts) (session-timezone midnights) — the
    stream==batch contract silently depended on the repo's UTC pin.
    Now the dependency is asserted loudly at stream construction."""
    import pytest

    from real_time_fraud_detection_lakehouse_spark.streaming.windows import (
        distinct_users_sketch_stream,
    )

    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        with pytest.raises(RuntimeError, match="timeZone=UTC"):
            distinct_users_sketch_stream(
                spark,
                str(tmp_path / "src"),
                str(tmp_path / "out"),
                str(tmp_path / "ckpt"),
            )
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")


def test_streaming_distinct_hll_short_span_yields_empty_frame(spark, tmp_path):
    """A source whose whole span fits inside the watermark finalizes
    ZERO daily windows (append semantics) — the sink holds only
    _spark_metadata, and the reader must return an empty typed rollup,
    not a schema-inference AnalysisException (the stateful-sink bug
    class pinned at the velocity and heavy-hitter sinks)."""
    from real_time_fraud_detection_lakehouse_spark.streaming.windows import (
        distinct_users_sketch_stream,
    )

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", 7, "click", 1.0, "{}")],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).selectExpr(
        "event_id", "cast(ts as timestamp) ts", "user_id", "event_type", "value", "props"
    ).write.parquet(src)
    out = distinct_users_sketch_stream(
        spark, src, str(tmp_path / "out"), str(tmp_path / "ckpt")
    )
    assert out.count() == 0
    assert set(out.columns) == {
        "event_type", "rollup_distinct_users", "n_daily_sketches", "events",
    }


def test_streaming_dau_wau_matches_batch_within_hll_band(spark, tmp_path):
    """Round-11 verdict #6: the engagement dashboard's stream twin.
    Per-day HLL user sketches at ingest, trailing-7-day union per
    emitted day. Same-lgK register maxima commute, so both arrival
    orders must produce IDENTICAL output; and each day's (dau, wau)
    must sit within the lgK=12 band (5%, min 2) of the EXACT batch
    q_events_dau_wau on the same fixture. A far-future sentinel user
    flushes every real day past the watermark; days past the real span
    (reachable only through the sentinel) are excluded on both sides."""
    import glob as _glob
    import os as _os
    import time as _time

    from real_time_fraud_detection_lakehouse_spark.core.catalog import table
    from real_time_fraud_detection_lakehouse_spark.plans.relational import RELATIONAL
    from real_time_fraud_detection_lakehouse_spark.streaming.windows import (
        events_dau_wau_stream,
    )

    events = table(spark, SF_SMALL, "events")
    sentinel = events.agg(
        F.lit(10**9).alias("event_id"),
        (F.max("ts") + F.expr("INTERVAL 45 DAYS")).alias("ts"),
        F.lit(-1).cast("long").alias("user_id"),
        F.lit("__sentinel__").alias("event_type"),
        F.lit(0.0).alias("value"),
        F.lit("{}").alias("props"),
    )
    batch = {
        r["day"]: (r["dau"], r["wau"])
        for r in RELATIONAL["q_events_dau_wau"][0]({"events": events}).collect()
    }
    dmax = max(batch)

    thirds = [
        events.filter(F.col("event_id") % 3 == i).localCheckpoint() for i in range(3)
    ]
    outputs = {}
    for tag, order in (("forward", [0, 1, 2]), ("reversed", [2, 1, 0])):
        src = str(tmp_path / f"src_{tag}")
        seen: set[str] = set()
        mtime_base = _time.time() - 3600
        for i, part in enumerate(order):
            thirds[part].coalesce(1).write.mode("append").parquet(src)
            for f in _glob.glob(_os.path.join(src, "*.parquet")):
                if f not in seen:
                    _os.utime(f, (mtime_base + i, mtime_base + i))
                    seen.add(f)
        sentinel.coalesce(1).write.mode("append").parquet(src)
        for f in _glob.glob(_os.path.join(src, "*.parquet")):
            if f not in seen:
                _os.utime(f, (mtime_base + 10, mtime_base + 10))
                seen.add(f)
        out = events_dau_wau_stream(
            spark,
            src,
            str(tmp_path / f"out_{tag}"),
            str(tmp_path / f"ckpt_{tag}"),
            watermark="40 days",
            max_files_per_trigger=1,
        )
        outputs[tag] = {
            r["day"]: (r["dau"], r["wau"], r["stickiness"])
            for r in out.filter(F.col("day") <= F.lit(dmax)).collect()
        }
    assert outputs["forward"] == outputs["reversed"], (
        "micro-batch slicing changed the sketches"
    )
    got = outputs["forward"]
    assert set(got) == set(batch), "emitted day set diverged from batch"
    for day, (dau_e, wau_e, stick) in got.items():
        dau_x, wau_x = batch[day]
        assert abs(dau_e - dau_x) <= max(2, 0.05 * dau_x), (day, dau_e, dau_x)
        assert abs(wau_e - wau_x) <= max(2, 0.05 * wau_x), (day, wau_e, wau_x)
        assert abs(stick - dau_e / wau_e) < 1e-6


def test_streaming_dau_wau_short_span_yields_empty_frame(spark, tmp_path):
    """A source whose whole span fits inside the watermark finalizes
    zero daily sketches — the reader must return an empty typed frame,
    not a schema-inference failure."""
    from real_time_fraud_detection_lakehouse_spark.streaming.windows import (
        events_dau_wau_stream,
    )

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", 7, "click", 1.0, "{}")],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).selectExpr(
        "event_id", "cast(ts as timestamp) ts", "user_id", "event_type", "value", "props"
    ).write.parquet(src)
    out = events_dau_wau_stream(
        spark, src, str(tmp_path / "out"), str(tmp_path / "ckpt")
    )
    assert out.count() == 0
    assert set(out.columns) == {"day", "dau", "wau", "stickiness"}


def test_streaming_quantile_sketch_bit_identical_to_batch(spark, tmp_path):
    """Round-13 sketch-quartet completion: the decimal log-bucket
    quantile sketch maintained at ingest. Count-sum merge is
    commutative and associative, so the streamed result must equal
    the batch q_price_quantile_sketch BIT-FOR-BIT — under both
    arrival orders and any micro-batch slicing (a stronger contract
    than the HLL twins' error band), and a checkpoint-wiped replay
    overwrites its batch partitions instead of double-counting."""
    import shutil

    from real_time_fraud_detection_lakehouse_spark.core.catalog import table
    from real_time_fraud_detection_lakehouse_spark.plans.relational import RELATIONAL
    from real_time_fraud_detection_lakehouse_spark.streaming.windows import (
        price_quantile_sketch_stream,
    )

    orders = table(spark, SF_SMALL, "orders")
    batch = sorted(
        tuple(r)
        for r in RELATIONAL["q_price_quantile_sketch"][0]({"orders": orders}).collect()
    )
    halves = [
        orders.filter(F.col("o_orderkey") % 2 == i).localCheckpoint()
        for i in range(2)
    ]
    for tag, order in (("fwd", (0, 1)), ("rev", (1, 0))):
        src = str(tmp_path / f"src_{tag}")
        for part in order:
            halves[part].coalesce(1).write.mode("append").parquet(src)
        out = price_quantile_sketch_stream(
            spark, src, str(tmp_path / f"out_{tag}"), str(tmp_path / f"ckpt_{tag}")
        )
        got = sorted(tuple(r) for r in out.collect())
        assert got == batch, (tag, got[:2], batch[:2])

    # replay idempotence: wipe the checkpoint, rerun into the same
    # out dir — batch partitions overwrite, totals unchanged
    shutil.rmtree(str(tmp_path / "ckpt_fwd"))
    replayed = price_quantile_sketch_stream(
        spark,
        str(tmp_path / "src_fwd"),
        str(tmp_path / "out_fwd"),
        str(tmp_path / "ckpt_fwd2"),
    )
    assert sorted(tuple(r) for r in replayed.collect()) == batch


def test_streaming_cusum_bit_identical_to_batch(spark, tmp_path):
    """Round-13 verdict #3: the drift screen AT INGEST. Integer
    (n_fraud, n_tx) partials merge exactly in any order, so the
    streamed CUSUM surface is BIT-IDENTICAL to dash_fraud_rate_cusum
    on finalized days under both arrival orders; batch_id-partition
    writes make checkpoint-wipe replay idempotent."""
    import shutil

    from real_time_fraud_detection_lakehouse_spark.plans.dashboards import (
        dash_fraud_rate_cusum,
    )
    from real_time_fraud_detection_lakehouse_spark.plans.gold import gold_frames
    from real_time_fraud_detection_lakehouse_spark.sources.transactions import (
        transactions_df,
    )
    from real_time_fraud_detection_lakehouse_spark.streaming.windows import (
        fraud_rate_cusum_stream,
    )

    # SF_MEDIUM: at sf0.001 the daily-rate MAD degenerates to 0 and
    # the screen is legitimately empty — the pin needs live rows
    batch = sorted(
        tuple(r)
        for r in dash_fraud_rate_cusum(gold_frames(spark, SF_MEDIUM)).collect()
    )
    assert batch  # fixture exercises the path
    tx = transactions_df(spark, SF_MEDIUM)
    halves = [
        tx.filter(F.abs(F.xxhash64("trans_num")) % 2 == i).localCheckpoint()
        for i in range(2)
    ]
    for tag, order in (("fwd", (0, 1)), ("rev", (1, 0))):
        src = str(tmp_path / f"src_{tag}")
        for part in order:
            halves[part].coalesce(1).write.mode("append").parquet(src)
        out = fraud_rate_cusum_stream(
            spark, src, str(tmp_path / f"out_{tag}"), str(tmp_path / f"ckpt_{tag}")
        )
        got = sorted(tuple(r) for r in out.collect())
        assert got == batch, (tag, got[:2], batch[:2])

    # replay idempotence: wipe the checkpoint, rerun into the same
    # out dir — batch partitions overwrite, totals unchanged
    shutil.rmtree(str(tmp_path / "ckpt_fwd"))
    replayed = fraud_rate_cusum_stream(
        spark,
        str(tmp_path / "src_fwd"),
        str(tmp_path / "out_fwd"),
        str(tmp_path / "ckpt_fwd2"),
    )
    assert sorted(tuple(r) for r in replayed.collect()) == batch

    # zero-batch source: empty frame of the declared schema, no crash
    empty = fraud_rate_cusum_stream(
        spark,
        str(tmp_path / "src_fwd"),
        str(tmp_path / "out_empty"),
        str(tmp_path / "ckpt_fwd2"),  # already-consumed checkpoint
    )
    assert empty.count() == 0


def test_streaming_gopher_gate_equals_batch_pass_set(spark, tmp_path):
    """r15: curation_stream(gopher_gate=True) admits exactly the
    default-mode admissions intersected with the batch
    docs_gopher_rules pass set (one gopher_rule_cols definition on
    both paths; zero-token docs fail on both) — under both arrival
    orders, with per-file micro-batches making order real."""
    import glob as _glob
    import os as _os
    import time as _time

    from real_time_fraud_detection_lakehouse_spark.core.catalog import table
    from real_time_fraud_detection_lakehouse_spark.operators.text import TEXT_OPS
    from real_time_fraud_detection_lakehouse_spark.streaming.curation import (
        INGEST_BASE,
        curation_stream,
    )

    docs = table(spark, SF_SMALL, "documents")
    gopher_pass = {
        r["doc_id"]
        for r in TEXT_OPS["docs_gopher_rules"][0]({"documents": docs}).collect()
        if r["pass_gopher"]
    }

    stamped = docs.withColumn(
        "ingest_ts",
        F.lit(INGEST_BASE).cast("timestamp")
        + F.make_dt_interval(secs=F.col("doc_id").cast("double")),
    )
    halves = [
        stamped.filter(F.col("doc_id") % 2 == i).localCheckpoint() for i in range(2)
    ]
    for tag, order in (("forward", [0, 1]), ("reversed", [1, 0])):
        src = str(tmp_path / f"gsrc_{tag}")
        seen: set[str] = set()
        mtime_base = _time.time() - 3600
        for i, part in enumerate(order):
            halves[part].coalesce(1).write.mode("append").parquet(src)
            for f in _glob.glob(_os.path.join(src, "*.parquet")):
                if f not in seen:
                    _os.utime(f, (mtime_base + i, mtime_base + i))
                    seen.add(f)
        plain = curation_stream(
            spark,
            src,
            str(tmp_path / f"gout_plain_{tag}"),
            str(tmp_path / f"gckpt_plain_{tag}"),
            max_files_per_trigger=1,
        )
        gated = curation_stream(
            spark,
            src,
            str(tmp_path / f"gout_gated_{tag}"),
            str(tmp_path / f"gckpt_gated_{tag}"),
            max_files_per_trigger=1,
            gopher_gate=True,
        )
        plain_ids = {r["doc_id"] for r in plain.collect()}
        gated_ids = {r["doc_id"] for r in gated.collect()}
        assert gated_ids == plain_ids & gopher_pass, tag
        # the gate must actually bite on this fixture (non-trivial pin)
        assert plain_ids - gated_ids, tag
