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
