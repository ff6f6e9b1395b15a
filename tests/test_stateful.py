"""applyInPandasWithState velocity tracker: per-card running counts,
state persistence across restarted runs."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL

from real_time_fraud_detection_lakehouse_spark.sources.transactions import transactions_df
from real_time_fraud_detection_lakehouse_spark.streaming.stateful import velocity_stream


def test_velocity_state_counts(spark, tmp_path):
    src = str(tmp_path / "tx")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    tx = transactions_df(spark, SF_SMALL)
    tx.write.mode("overwrite").parquet(src)

    tracked = velocity_stream(spark, src, out, ckpt)
    assert tracked.count() == tx.count()
    # per-card max seq equals that card's transaction count
    per_card = {
        r["cc_num"]: r["m"]
        for r in tracked.groupBy("cc_num").agg(F.max("txn_seq").alias("m")).collect()
    }
    expected = {
        r["cc_num"]: r["n"]
        for r in tx.groupBy("cc_num").agg(F.count("*").alias("n")).collect()
    }
    assert per_card == expected
    # running average is cumulative/seq for every row
    sample = tracked.filter("txn_seq > 1").limit(20).collect()
    for r in sample:
        assert abs(r["avg_amount_so_far"] - r["cum_amount"] / r["txn_seq"]) < 1e-9


def test_velocity_state_survives_restart(spark, tmp_path):
    src = str(tmp_path / "tx")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    tx = transactions_df(spark, SF_SMALL).cache()
    first = tx.filter(F.dayofmonth("trans_timestamp") <= 15)
    second = tx.filter(F.dayofmonth("trans_timestamp") > 15)

    first.write.mode("overwrite").parquet(src)
    velocity_stream(spark, src, out, ckpt)
    second.write.mode("append").parquet(src)
    tracked = velocity_stream(spark, src, out, ckpt)

    # counts continue from checkpointed state, not restart at 1
    per_card = {
        r["cc_num"]: r["m"]
        for r in tracked.groupBy("cc_num").agg(F.max("txn_seq").alias("m")).collect()
    }
    expected = {
        r["cc_num"]: r["n"]
        for r in tx.groupBy("cc_num").agg(F.count("*").alias("n")).collect()
    }
    assert per_card == expected
    tx.unpersist()


def test_velocity_tws_matches_legacy_api(spark, tmp_path):
    """transformWithStateInPandas twin produces row-identical output to
    the applyInPandasWithState tracker on the same input — the two
    stateful APIs implement one contract. Skips where the TWS runtime
    dependency (google.protobuf, the state-server wire protocol) is
    absent — as in this container; the NotImplementedError contract is
    still asserted there."""
    import pytest

    from real_time_fraud_detection_lakehouse_spark.streaming.stateful import (
        HAS_TRANSFORM_WITH_STATE,
        velocity_stream_tws,
    )

    if not HAS_TRANSFORM_WITH_STATE:
        with pytest.raises(NotImplementedError, match="protobuf"):
            velocity_stream_tws(spark, "x", "y", "z")
        pytest.skip("google.protobuf absent: TWS state server cannot start in this env")
    src = str(tmp_path / "tx")
    tx = transactions_df(spark, SF_SMALL).limit(2000)
    tx.write.mode("overwrite").parquet(src)

    legacy = velocity_stream(
        spark, src, str(tmp_path / "out_a"), str(tmp_path / "ckpt_a")
    )
    tws = velocity_stream_tws(
        spark, src, str(tmp_path / "out_b"), str(tmp_path / "ckpt_b")
    )
    cols = ["cc_num", "trans_num", "txn_seq", "cum_amount", "avg_amount_so_far"]
    a = sorted(map(tuple, legacy.select(cols).collect()))
    b = sorted(map(tuple, tws.select(cols).collect()))
    assert a == b


def test_impossible_travel_stream_matches_batch_on_ordered_source(spark, tmp_path):
    """Per-card last-location state: on a per-card-timestamp-ordered
    source the stream flags EXACTLY the batch op's pair set (state
    carries across micro-batches — the source is split in time so
    cross-batch hops must still flag), distances agree to 1e-6, and a
    restart emits nothing new."""
    from pyspark.sql import functions as F

    from tests.conftest import SF_SMALL

    from real_time_fraud_detection_lakehouse_spark.plans.dashboards import (
        dash_impossible_travel,
    )
    from real_time_fraud_detection_lakehouse_spark.sources.transactions import (
        transactions_df,
    )
    from real_time_fraud_detection_lakehouse_spark.streaming.stateful import (
        impossible_travel_stream,
    )

    tx = transactions_df(spark, SF_SMALL)
    batch = {
        (r["cc_num"], r["trans_num"]): r
        for r in dash_impossible_travel({"transactions": tx}).collect()
    }
    assert batch  # fixture exercises the path

    # time-ordered source in two files split at the median timestamp
    # (per-card order preserved; hops across the split must still flag)
    mid = tx.agg(
        F.percentile(F.unix_micros("trans_timestamp"), 0.5)
    ).first()[0]
    src = str(tmp_path / "src")
    tx.filter(F.unix_micros("trans_timestamp") <= mid).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    tx.filter(F.unix_micros("trans_timestamp") > mid).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    out = impossible_travel_stream(
        spark, src, str(tmp_path / "out"), str(tmp_path / "ckpt")
    )
    got = {(r["cc_num"], r["trans_num"]): r for r in out.collect()}
    assert set(got) == set(batch)
    for k, r in got.items():
        assert abs(r["distance_km"] - batch[k]["distance_km"]) < 1e-4
        if batch[k]["speed_kmh"] is None:
            assert r["speed_kmh"] is None
        else:
            assert abs(r["speed_kmh"] - batch[k]["speed_kmh"]) < 1e-2

    again = impossible_travel_stream(
        spark, src, str(tmp_path / "out"), str(tmp_path / "ckpt")
    )
    assert again.count() == len(got)


def test_velocity_multi_chunk_group_sorts_globally(spark, tmp_path):
    """Round-13 advice: a card whose micro-batch rows span multiple
    Arrow chunks (arrow.maxRecordsPerBatch) must see ONE global
    per-card sort, not per-chunk sorts — shuffle delivers chunks in
    arbitrary order, so a per-chunk sort assigns txn_seq out of
    timestamp order. Shrink the chunk size so a single card's batch
    spans many chunks and write the source deliberately shuffled."""
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    prior = spark.conf.get(key)
    src = str(tmp_path / "tx")
    tx = (
        transactions_df(spark, SF_SMALL)
        .filter(F.col("cc_num").isNotNull())
        .limit(400)
        # anti-sort: reverse timestamp order on disk
        .orderBy(F.col("trans_timestamp").desc())
        .coalesce(1)
    )
    tx.write.mode("overwrite").parquet(src)
    n_cards = tx.select("cc_num").distinct().count()
    assert tx.count() / max(n_cards, 1) > 1  # groups really span rows
    spark.conf.set(key, "7")
    try:
        tracked = velocity_stream(
            spark, src, str(tmp_path / "out"), str(tmp_path / "ckpt")
        )
        rows = tracked.collect()
    finally:
        spark.conf.set(key, prior)
    # txn_seq must follow the (trans_timestamp, trans_num) order per
    # card — exactly what a per-chunk sort breaks
    per_card: dict = {}
    for r in rows:
        per_card.setdefault(r["cc_num"], []).append(r)
    assert per_card
    for recs in per_card.values():
        by_seq = sorted(recs, key=lambda r: r["txn_seq"])
        by_time = sorted(
            recs, key=lambda r: (r["trans_timestamp"], r["trans_num"])
        )
        assert [r["trans_num"] for r in by_seq] == [
            r["trans_num"] for r in by_time
        ]
        # and the running sum is consistent with that order
        cum = 0.0
        for r in by_seq:
            cum += r["amt"]
            assert abs(r["cum_amount"] - cum) < 1e-6


def test_velocity_burst_stream_matches_batch_on_ordered_source(spark, tmp_path):
    """The rolling-hour burst tracker at ingest: on a per-card
    time-ordered source (two files split at the median timestamp, so
    windows span the micro-batch boundary), the per-card MAX of the
    emitted burst equals batch dash_velocity_burst exactly; replays
    into the same checkpoint are idempotent."""
    from real_time_fraud_detection_lakehouse_spark.plans.dashboards import (
        dash_velocity_burst,
    )
    from real_time_fraud_detection_lakehouse_spark.streaming.stateful import (
        velocity_burst_stream,
    )

    tx = transactions_df(spark, SF_SMALL)
    batch = {
        r["cc_num"]: r["max_burst_1h"]
        for r in dash_velocity_burst({"transactions": tx}).collect()
    }
    assert batch  # fixture exercises the path

    mid = tx.agg(
        F.percentile(F.unix_micros("trans_timestamp"), 0.5)
    ).first()[0]
    src = str(tmp_path / "src")
    tx.filter(F.unix_micros("trans_timestamp") <= mid).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    tx.filter(F.unix_micros("trans_timestamp") > mid).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    out = velocity_burst_stream(
        spark, src, str(tmp_path / "out"), str(tmp_path / "ckpt")
    )
    got = {
        r["cc_num"]: r["m"]
        for r in out.groupBy("cc_num").agg(F.max("burst").alias("m")).collect()
    }
    assert got == batch

    again = velocity_burst_stream(
        spark, src, str(tmp_path / "out"), str(tmp_path / "ckpt")
    )
    assert again.count() == out.count()
