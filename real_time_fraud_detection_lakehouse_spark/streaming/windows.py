"""Watermarked event-time windowed aggregations — the streaming
upgrade the reference planned but never built (SURVEY §2.6/T5: zero
``withWatermark``/``F.window`` in the reference; its aggregation is
batch-side only and late rows are dropped by the HWM filter).

Three stateful shapes over the transaction stream:

- tumbling hourly metrics (``F.window``) — the streaming twin of
  ``hourly_summary``;
- gap-based user sessions (``F.session_window``) — the streaming twin
  of the batch sessionization query;
- both run with ``withWatermark`` so state is bounded: Spark evicts
  window state once the watermark passes, which is what makes the
  operator viable on an unbounded 100 TB/day stream (state size is
  O(open windows), not O(history)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _assert_utc_day_bucketing(spark: SparkSession) -> None:
    """Guard for every stream whose batch twin buckets days with
    ``to_date(ts)``: the stream side must use ``window('ts', '1 day')``
    (append-mode state requires an event-time window, not a derived
    date column), and those boundaries are epoch-aligned — i.e. UTC
    midnights — while ``to_date`` cuts at SESSION-timezone midnights.
    The two agree only under ``spark.sql.session.timeZone=UTC`` (the
    repo-wide pin in core/session.py). Making that dependency explicit
    here turns a silent stream/batch divergence under a non-UTC
    session into a loud error at stream construction (round-11 advice
    fix)."""
    tz = spark.conf.get("spark.sql.session.timeZone", "")
    if tz != "UTC":
        raise RuntimeError(
            "day-bucketed streams require spark.sql.session.timeZone=UTC "
            f"(got {tz!r}): window('ts','1 day') cuts UTC midnights while "
            "the batch twin's to_date(ts) cuts session-timezone midnights, "
            "so the stream==batch contract only holds under UTC"
        )


def hourly_metrics_stream(
    spark: SparkSession,
    source_path: str,
    out_path: str,
    checkpoint_dir: str,
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling 1-hour event-time aggregation with watermark; append
    mode emits each window once it is final (watermark passed)."""
    schema = spark.read.parquet(source_path).schema
    stream = (
        spark.readStream.schema(schema)
        .parquet(source_path)
        .withWatermark("trans_timestamp", watermark)
    )
    agg = (
        stream.groupBy(
            F.window("trans_timestamp", "1 hour").alias("w"),
            F.col("category"),
        )
        .agg(
            F.count("*").alias("n"),
            F.sum("amt").alias("total_amount"),
            F.sum(F.when(F.col("is_fraud") == 1, 1).otherwise(0)).alias("frauds"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "category",
            "n",
            "total_amount",
            "frauds",
        )
    )
    q = (
        agg.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out_path)


def user_sessions_stream(
    spark: SparkSession,
    source_path: str,
    out_path: str,
    checkpoint_dir: str,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Gap-based session aggregation (``session_window``): sessions
    close when no event arrives within ``gap``; watermark bounds the
    open-session state."""
    schema = spark.read.parquet(source_path).schema
    stream = (
        spark.readStream.schema(schema)
        .parquet(source_path)
        .withWatermark("trans_timestamp", watermark)
    )
    agg = (
        stream.groupBy(
            F.session_window("trans_timestamp", gap).alias("w"),
            F.col("cc_num"),
        )
        .agg(F.count("*").alias("events_in_session"))
        .select(
            F.col("cc_num"),
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "events_in_session",
        )
    )
    q = (
        agg.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out_path)

def dedup_stream(
    spark: SparkSession,
    source_path: str,
    out_path: str,
    checkpoint_dir: str,
    key: str = "trans_num",
    watermark: str = "2 hours",
) -> DataFrame:
    """Exactly-once streaming deduplication:
    ``dropDuplicatesWithinWatermark`` keeps the first arrival per key
    and drops replays/late duplicates whose event time falls inside
    the watermark horizon. Unlike plain ``dropDuplicates`` on a
    stream (state grows with ALL keys ever seen — unbounded on a
    100 TB/day feed), the within-watermark variant evicts key state
    once the watermark passes, so state is O(keys per horizon). This
    is the streaming twin of the CDC replay policy: an at-least-once
    upstream (Kafka redelivery, file re-drop) becomes exactly-once
    downstream."""
    schema = spark.read.parquet(source_path).schema
    stream = (
        spark.readStream.schema(schema)
        .parquet(source_path)
        .withWatermark("trans_timestamp", watermark)
        .dropDuplicatesWithinWatermark([key])
    )
    q = (
        stream.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out_path)


def clicks_before_purchase_stream(
    spark: SparkSession,
    source_path: str,
    out_path: str,
    checkpoint_dir: str,
    window: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream interval join: the streaming twin of the batch
    ``q_range_join_clicks`` operator. Two watermarked streams over the
    same events source — clicks and purchases — joined on user_id with
    the half-open event-time bound [purchase - window, purchase);
    append mode emits each matched pair exactly once.

    Scale design: the time-range predicate in the join condition is
    what lets Spark BOUND the join state — each side buffers only rows
    within watermark+window of the stream clock, so state is
    O(rate x horizon), not O(history). Without the range condition a
    stream-stream join must keep every row forever. The watermark also
    defines correctness: clicks later than ``watermark`` behind the
    max event time may be dropped (documented lossy-late semantics,
    same contract as the reference's HWM filter)."""
    schema = spark.read.parquet(source_path).schema
    events = lambda: spark.readStream.schema(schema).parquet(source_path)  # noqa: E731
    purchases = (
        events()
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    clicks = (
        events()
        .filter(F.col("event_type") == "click")
        .select(F.col("user_id").alias("c_user"), F.col("ts").alias("click_ts"))
        .withWatermark("click_ts", watermark)
    )
    joined = purchases.join(
        clicks,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr(f"INTERVAL {window}"))
        & (F.col("click_ts") < F.col("purchase_ts")),
    ).select("purchase_id", F.col("p_user").alias("user_id"), "purchase_ts", "click_ts")
    q = (
        joined.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out_path)


def clicks_before_purchase_stream_outer(
    spark: SparkSession,
    source_path: str,
    out_path: str,
    checkpoint_dir: str,
    window: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """LEFT OUTER stream-stream interval join: every purchase emits —
    matched purchases as they pair with buffered clicks, UNMATCHED
    purchases as a null-click row once the watermark passes their
    buffer horizon (the state-eviction-emits-null contract that
    distinguishes outer from inner streaming joins; conversion
    funnels need exactly this to count no-touch purchases).

    Same state bound as the inner variant: the event-time range
    predicate + watermark cap both buffers at O(rate × horizon).
    Semantics caveat (documented Spark behavior, asserted in the
    test): null rows flush only when the watermark ADVANCES past the
    purchase's eviction bound, so with a bounded availableNow source,
    unmatched purchases within the final watermark of max event time
    stay buffered and are not emitted — a live stream flushes them as
    the clock advances."""
    schema = spark.read.parquet(source_path).schema
    events = lambda: spark.readStream.schema(schema).parquet(source_path)  # noqa: E731
    purchases = (
        events()
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    clicks = (
        events()
        .filter(F.col("event_type") == "click")
        .select(F.col("user_id").alias("c_user"), F.col("ts").alias("click_ts"))
        .withWatermark("click_ts", watermark)
    )
    joined = purchases.join(
        clicks,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr(f"INTERVAL {window}"))
        & (F.col("click_ts") < F.col("purchase_ts")),
        "leftOuter",
    ).select(
        "purchase_id",
        F.col("p_user").alias("user_id"),
        "purchase_ts",
        "click_ts",
        F.col("click_ts").isNull().alias("no_prior_click"),
    )
    q = (
        joined.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out_path)


def inspect_dedup_state(
    spark: SparkSession,
    source_path: str,
    out_path: str,
    checkpoint_dir: str,
    key: str = "trans_num",
    watermark: str = "2 hours",
) -> DataFrame:
    """Run the exactly-once dedup stream, then read its STATE STORE
    back through Spark 4's `statestore` data source — the streaming
    observability surface: what keys is the operator currently
    holding, and when does each expire? (Ops teams use exactly this
    to diagnose state growth / watermark stalls without touching the
    job.) Returns one row per live state key with its expiry.

    Scale: the reader scans the checkpoint's state files directly —
    state is O(keys within the watermark horizon) by construction
    (dropDuplicatesWithinWatermark), so the inspection is bounded by
    the horizon, never by stream history."""
    dedup_stream(spark, source_path, out_path, checkpoint_dir, key=key, watermark=watermark)
    st = spark.read.format("statestore").load(checkpoint_dir)
    return st.select(
        F.col(f"key.{key}").alias(key),
        F.timestamp_micros(F.col("value.expiresAtMicros")).alias("expires_at"),
        F.col("partition_id"),
    )


def distinct_users_sketch_stream(
    spark: SparkSession,
    source_path: str,
    out_path: str,
    checkpoint_dir: str,
    watermark: str = "2 days",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Sketch-at-ingest twin of ``q_distinct_users_hll_rollup``: the
    stream maintains one Datasketches HLL sketch per (day, event_type)
    window in streaming state and APPENDS each finalized day's sketch
    row (binary sketch + event count) to the sketch table; the rollup
    here merges the emitted sketches per event_type — the exact plan
    the batch op runs over its own daily sketches.

    Why this is the production shape at 100 TB: the raw event stream
    is never re-scanned for a distinct-count question. Ingest pays
    O(1) state per (day, type) — a few KiB of HLL registers, bounded
    by the watermark horizon like every other stateful op here — and
    every later rollup (any date range, any type subset) is a merge
    over KiB-size sketch rows. Same-lgK HLL union is LOSSLESS and
    register-maxima commute, so however the stream slices arrivals
    into micro-batches, each EMITTED day's sketch — and any merge
    over them — equals the batch single-pass sketch bit-for-bit;
    pinned row-for-row against the batch rollup under both arrival
    orders in tests/test_streaming_windows.py (the test widens the
    watermark past the fixture span and flushes with a far-future
    sentinel so every day emits). Standard append semantics
    otherwise: days still inside the trailing watermark horizon at
    end-of-stream stay in state and are NOT yet in the output — the
    hourly_metrics_stream finalized-windows contract — so the default
    entry's rollup covers the FINALIZED days, not the last ~watermark
    of them.

    Output: (event_type, rollup_distinct_users, n_daily_sketches,
    events) — the batch rollup's exact schema."""
    from real_time_fraud_detection_lakehouse_spark.plans.relational import HLL_LGK

    _assert_utc_day_bucketing(spark)
    schema = spark.read.parquet(source_path).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_path).withWatermark("ts", watermark)
    daily = (
        stream.groupBy(
            F.window("ts", "1 day").alias("w"),
            F.col("event_type"),
        )
        .agg(
            F.hll_sketch_agg("user_id", F.lit(HLL_LGK)).alias("sketch"),
            F.count("*").alias("events"),
        )
        .select(
            F.to_date(F.col("w.start")).alias("day"),
            "event_type",
            "sketch",
            "events",
        )
    )
    q = (
        daily.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # explicit schema: a source whose span fits inside the watermark
    # (or an empty source) emits ZERO finalized days and the sink holds
    # only _spark_metadata, which cannot infer a parquet schema — the
    # stateful-sink bug class fixed at the velocity/heavy-hitter sinks
    sketches = spark.read.schema(
        "day date, event_type string, sketch binary, events long"
    ).parquet(out_path)
    return sketches.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch", F.lit(False)))
        .alias("rollup_distinct_users"),
        F.count("*").cast("long").alias("n_daily_sketches"),
        F.sum("events").cast("long").alias("events"),
    )


def events_dau_wau_stream(
    spark: SparkSession,
    source_path: str,
    out_path: str,
    checkpoint_dir: str,
    watermark: str = "2 days",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Sketch-at-ingest twin of ``q_events_dau_wau`` (the engagement
    dashboard): the stream maintains ONE HLL user sketch per day in
    streaming state — the ``distinct_users_sketch_stream`` machinery
    minus the event_type key — and APPENDS each finalized day's sketch
    row; DAU/WAU then derive from the emitted sketch table alone:

    - DAU(d)  = estimate(sketch_d);
    - WAU(d)  = estimate(union(sketch_{d-6} .. sketch_d)) — the
      trailing-7-day union, materialized with the batch op's own
      inverted fan-out (each day's sketch CONTRIBUTES to the 7 target
      days it keeps alive via a bounded 7-row explode, then one keyed
      union-agg per target day; no range self-join);
    - stickiness = DAU/WAU.

    Why this is the production shape at 100 TB: the raw event stream
    is never re-scanned — ingest pays O(1) state per day (KiB of HLL
    registers, watermark-bounded), and the whole DAU/WAU dashboard
    refresh is a x7 projection + keyed merge over KiB-size sketch
    rows, whatever the event volume. Same-lgK HLL union is LOSSLESS,
    so each emitted day's sketch equals the batch single-pass sketch
    bit-for-bit under any micro-batch slicing; the DAU/WAU estimates
    therefore sit within the lgK=12 error band (~1.6% RSE) of the
    EXACT batch op — pinned on the same fixture under both arrival
    orders in tests/test_streaming_windows.py.

    Day bucketing follows the UTC contract asserted by
    ``_assert_utc_day_bucketing``. Append semantics: days still inside
    the trailing watermark horizon at end-of-stream stay in state and
    are NOT in the output (the finalized-windows contract shared by
    every append stream here).

    Output: (day, dau, wau, stickiness) — the batch op's schema, with
    sketch-estimated counts."""
    from real_time_fraud_detection_lakehouse_spark.plans.relational import HLL_LGK
    from real_time_fraud_detection_lakehouse_spark.sources.transactions import dround

    _assert_utc_day_bucketing(spark)
    schema = spark.read.parquet(source_path).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_path).withWatermark("ts", watermark)
    daily = (
        stream.groupBy(F.window("ts", "1 day").alias("w"))
        .agg(F.hll_sketch_agg("user_id", F.lit(HLL_LGK)).alias("sketch"))
        .select(F.to_date(F.col("w.start")).alias("day"), "sketch")
    )
    q = (
        daily.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # explicit schema: a short-span source finalizes zero days and the
    # sink holds only _spark_metadata (the stateful-sink bug class)
    sketches = spark.read.schema("day date, sketch binary").parquet(out_path)
    dau = sketches.select(
        "day", F.hll_sketch_estimate("sketch").cast("long").alias("dau")
    )
    contrib = sketches.select(
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("i"), "day", "sketch"
    ).select(F.date_add("day", F.col("i")).alias("day"), "sketch")
    wau = contrib.groupBy("day").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch", F.lit(False)))
        .cast("long")
        .alias("wau")
    )
    bounds = sketches.agg(F.min("day").alias("dmin"), F.max("day").alias("dmax"))
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


def price_quantile_sketch_stream(
    spark: SparkSession,
    source_path: str,
    out_path: str,
    checkpoint_dir: str,
) -> DataFrame:
    """Sketch-at-ingest twin of ``q_price_quantile_sketch``: every
    micro-batch of the orders stream folds to its own decimal
    log-bucket histogram (the sketch's mergeable representation,
    O(groups × buckets) KiB-size rows regardless of batch volume),
    idempotently written under ``batch_id=<N>`` (the FK-monitor
    overwrite pattern — replays overwrite, never double-count); the
    final quantile table is one keyed count-sum merge over the batch
    histograms plus the shared finalize walk.

    Because the sketch's merge IS addition, the streamed result is
    BIT-IDENTICAL to the batch op on the same data under ANY
    micro-batch slicing or arrival order — a stronger contract than
    the HLL twins' error-band equivalence, pinned both-arrival-orders
    in tests/test_streaming_windows.py. At 100 TB rates the raw
    stream is never re-scanned: per-trigger cost is one map-side
    partial count, and the dashboard refresh touches only histogram
    rows."""
    from real_time_fraud_detection_lakehouse_spark.plans.relational import (
        qsk_finalize,
        qsk_histogram,
    )
    from real_time_fraud_detection_lakehouse_spark.streaming.batchsink import (
        run_partitioned_foreach_stream,
        write_batch_partition,
    )

    schema = spark.read.parquet(source_path).schema
    stream = spark.readStream.schema(schema).parquet(source_path)

    def _emit(batch: DataFrame, batch_id: int) -> None:
        write_batch_partition(qsk_histogram(batch), out_path, batch_id)

    hists = run_partitioned_foreach_stream(
        spark, stream, _emit, out_path, checkpoint_dir,
        "grp string, d int, sig long, n long, batch_id long",
    )
    merged = hists.groupBy("grp", "d", "sig").agg(
        F.sum("n").cast("long").alias("n")
    )
    return qsk_finalize(merged).withColumnRenamed("grp", "o_orderpriority")


def fraud_rate_cusum_stream(
    spark: SparkSession,
    source_path: str,
    out_path: str,
    checkpoint_dir: str,
) -> DataFrame:
    """Drift-screen-at-ingest twin of ``dash_fraud_rate_cusum``: every
    micro-batch of the transactions stream folds to per-day
    (n_fraud, n_tx) LONG partials — the rate's mergeable
    representation, O(days) rows regardless of batch volume —
    idempotently written under ``batch_id=<N>`` (the shared
    batch-partition scaffold: replays overwrite, never double-count).
    The monitor's emit is one keyed count-sum merge over the audit
    table plus the shared closed-form CUSUM walk
    (``plans.dashboards.cusum_from_daily``) over the O(days) merged
    frame.

    Because the partials are integer counts, their merge is exact
    addition in any order, and day_rate = n_fraud/n_tx reproduces the
    batch op's ``avg(double)`` bit-for-bit (0/1 values sum exactly in
    doubles below 2^53) — so the streamed surface is BIT-IDENTICAL to
    ``dash_fraud_rate_cusum`` on finalized days under ANY micro-batch
    slicing or arrival order (the quantile-sketch contract), pinned
    both-arrival-orders + restart in tests/test_streaming_windows.py.

    Scale design: per-trigger cost is one map-side partial count over
    the arriving rows; the CUSUM recompute touches only the O(days)
    audit table — the raw stream is never re-scanned. The median/MAD
    baseline is recomputed over all finalized days per emit, which is
    exactly what the batch op defines (a frozen baseline would be a
    DIFFERENT detector)."""
    from real_time_fraud_detection_lakehouse_spark.plans.dashboards import (
        cusum_from_daily,
    )
    from real_time_fraud_detection_lakehouse_spark.streaming.batchsink import (
        run_partitioned_foreach_stream,
        write_batch_partition,
    )

    schema = spark.read.parquet(source_path).schema
    stream = spark.readStream.schema(schema).parquet(source_path)

    def _emit(batch: DataFrame, batch_id: int) -> None:
        # same row-membership rule as the batch twin: the dashboard
        # aggregates fact (silver-filtered), so the stream applies
        # silver's trans_num quality filter — without it a source
        # carrying null-trans_num rows would break the bit-identical
        # contract (post-round review finding)
        partials = batch.filter(F.col("trans_num").isNotNull()).groupBy(
            F.to_date("trans_timestamp").alias("day")
        ).agg(
            F.sum(F.when(F.col("is_fraud") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_fraud"),
            F.count("*").cast("long").alias("n_tx"),
        )
        write_batch_partition(partials, out_path, batch_id)

    partials = run_partitioned_foreach_stream(
        spark, stream, _emit, out_path, checkpoint_dir,
        "day date, n_fraud long, n_tx long, batch_id long",
    )
    daily = partials.groupBy("day").agg(
        (
            F.sum("n_fraud").cast("double") / F.sum("n_tx").cast("double")
        ).alias("rate")
    )
    return cusum_from_daily(daily)
