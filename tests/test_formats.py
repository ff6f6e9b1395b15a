"""Source/sink format round-trips: CSV with explicit schema (S5 —
the reference's producer replays CSV rows), ORC, JSON lines, Spark 4's
built-in XML, and the raw `text` source."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL

from real_time_fraud_detection_lakehouse_spark.sources.transactions import transactions_df


def _sample(spark):
    return transactions_df(spark, SF_SMALL).select(
        "trans_num", "cc_num", "amt", "category", "is_fraud", "trans_timestamp"
    )


def test_csv_roundtrip_with_schema(spark, tmp_path):
    path = str(tmp_path / "csv")
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"  # default format drops micros
    df = _sample(spark)
    df.write.mode("overwrite").option("header", True).option("timestampFormat", fmt).csv(path)
    back = (
        spark.read.schema(
            "trans_num string, cc_num long, amt double, category string, "
            "is_fraud int, trans_timestamp timestamp"
        )
        .option("header", True)
        .option("timestampFormat", fmt)
        .csv(path)
    )
    assert back.count() == df.count()
    a = sorted(map(tuple, df.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b


def test_csv_schema_inference_vs_declared(spark, tmp_path):
    # the engine's stance: declared schemas (core/schemas.py), never
    # inference in pipelines — but inference must at least see the rows
    path = str(tmp_path / "csv2")
    _sample(spark).write.mode("overwrite").option("header", True).csv(path)
    inferred = spark.read.option("header", True).option("inferSchema", True).csv(path)
    assert inferred.count() == _sample(spark).count()


def test_orc_roundtrip(spark, tmp_path):
    path = str(tmp_path / "orc")
    df = _sample(spark)
    df.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    assert sorted(map(tuple, df.collect())) == sorted(map(tuple, back.collect()))


def test_json_lines_roundtrip(spark, tmp_path):
    path = str(tmp_path / "json")
    df = _sample(spark).withColumn("trans_timestamp", F.col("trans_timestamp").cast("string"))
    df.write.mode("overwrite").json(path)
    back = spark.read.schema(
        "trans_num string, cc_num long, amt double, category string, "
        "is_fraud int, trans_timestamp string"
    ).json(path)
    assert sorted(map(tuple, df.collect())) == sorted(map(tuple, back.collect()))


def test_xml_roundtrip(spark, tmp_path):
    """Spark 4's BUILT-IN XML source (the former spark-xml package,
    merged in 4.0): write the sample as XML rows, read back with a
    declared schema — value-identical. Extends the S5 format family
    beyond CSV/ORC/JSON without any external jar."""
    path = str(tmp_path / "xml")
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    df = _sample(spark)
    (
        df.write.mode("overwrite")
        .option("rootTag", "transactions")
        .option("rowTag", "tx")
        .option("timestampFormat", fmt)
        .format("xml")
        .save(path)
    )
    back = (
        spark.read.schema(
            "trans_num string, cc_num long, amt double, category string, "
            "is_fraud int, trans_timestamp timestamp"
        )
        .option("rowTag", "tx")
        .option("timestampFormat", fmt)
        .format("xml")
        .load(path)
    )
    assert sorted(map(tuple, df.collect())) == sorted(map(tuple, back.collect()))


def test_text_format_roundtrip(spark, tmp_path):
    """The `text` source (one string column per line — the raw-crawl
    ingest format an LLM pipeline starts from): documents round-trip
    line-for-line through it."""
    from real_time_fraud_detection_lakehouse_spark.core.catalog import table

    path = str(tmp_path / "text")
    docs = table(spark, SF_SMALL, "documents").select("text").filter(
        ~F.col("text").contains("\n")
    )
    docs.write.mode("overwrite").text(path)
    back = spark.read.text(path).withColumnRenamed("value", "text")
    assert sorted(r["text"] for r in back.collect()) == sorted(
        r["text"] for r in docs.collect()
    )
