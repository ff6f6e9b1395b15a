"""Multimodal column plumbing: opaque binary payloads + typed
metadata, with Arrow-batched feature extraction via ``mapInPandas``.

Image/audio decode libraries are not available in this container, so
the decode step is STUBBED: :func:`decode_stub` raises
NotImplementedError for real decoding and the pipeline uses
:func:`fake_features` — a deterministic featurizer over the raw bytes
(length, byte histogram moments) — so the Spark-side plumbing
(schema, Arrow batch shape, partitioning) is real and tested.

Scale notes: binary payloads ride in parquet as BINARY columns;
``mapInPandas`` streams Arrow batches so executor memory is bounded
by batch size (spark.sql.execution.arrow.maxRecordsPerBatch), not
partition size. Feature extraction is embarrassingly parallel — no
shuffle.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, media_type string, content binary, "
    "meta struct<width:int, height:int, duration_ms:int>"
)

FEATURE_SCHEMA = (
    "media_id long, media_type string, n_bytes int, "
    "byte_mean double, byte_std double, content_sha1 string"
)


def synth_media_table(spark: SparkSession, sf_dir: str | None = None) -> DataFrame:
    """Deterministic fake media table: binary payloads derived from the
    documents table (text bytes stand in for encoded media)."""
    from real_time_fraud_detection_lakehouse_spark.core.catalog import table

    docs = table(spark, sf_dir, "documents")
    mt = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        mt.alias("media_type"),
        F.encode(F.col("text"), "UTF-8").alias("content"),
        F.struct(
            ((F.col("doc_id") % 16 + 1) * 64).cast("int").alias("width"),
            ((F.col("doc_id") % 9 + 1) * 64).cast("int").alias("height"),
            ((F.col("doc_id") % 100 + 1) * 1000).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )


def decode_stub(content: bytes, media_type: str):
    """Placeholder for the real decoder (PIL / torchaudio / pyav).

    Not implemented in this container — the pipeline uses
    :func:`fake_features` instead; swap this in when decode libs
    exist.
    """
    raise NotImplementedError(
        f"real {media_type} decoding requires media libraries not present "
        "in this environment; use fake_features for plumbing tests"
    )


def fake_features(content: bytes) -> tuple[int, float, float, str]:
    """Deterministic stand-in featurizer: byte stats + sha1."""
    n = len(content)
    if n == 0:
        return 0, 0.0, 0.0, hashlib.sha1(b"").hexdigest()
    mean = sum(content) / n
    var = sum((b - mean) ** 2 for b in content) / n
    return n, mean, var**0.5, hashlib.sha1(content).hexdigest()


def extract_media_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary columns."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [fake_features(c) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [f[0] for f in feats],
                    "byte_mean": [f[1] for f in feats],
                    "byte_std": [f[2] for f in feats],
                    "content_sha1": [f[3] for f in feats],
                }
            )

    return media.mapInPandas(_extract, FEATURE_SCHEMA)


def multimodal_features(spark: SparkSession, sf_dir: str | None = None) -> DataFrame:
    """Driver-facing entry: synth table → extract → stable ordering."""
    return extract_media_features(synth_media_table(spark, sf_dir)).orderBy("media_id")


RESIZE_SCHEMA = "media_id long, out_width int, out_height int, content binary"


def resize_images(media: DataFrame, max_side: int = 256) -> DataFrame:
    """Resize plumbing: computes the target geometry from metadata
    (aspect-preserving fit into ``max_side``) and passes payloads
    through an Arrow batch. The pixel resample itself is the stubbed
    decode step (:func:`decode_stub`) — with PIL present, swap the
    passthrough for ``Image.resize``; the schema, batching, and
    geometry math are the real, tested parts."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            w = pdf["meta"].map(lambda m: m["width"])
            h = pdf["meta"].map(lambda m: m["height"])
            scale = (max_side / pd.concat([w, h], axis=1).max(axis=1)).clip(upper=1.0)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "out_width": (w * scale).astype(int),
                    "out_height": (h * scale).astype(int),
                    "content": pdf["content"],  # decode_stub: real resample needs PIL
                }
            )

    return media.filter(F.col("media_type") == "image").mapInPandas(_resize, RESIZE_SCHEMA)


FRAME_SCHEMA = "media_id long, frame_index int, frame_offset_ms int"


def sample_frames(media: DataFrame, every_ms: int = 10_000) -> DataFrame:
    """Frame-sampling plumbing for video payloads: expands each video
    row into one row per sampled frame offset (every ``every_ms``
    within the metadata duration). The frame *decode* is the stubbed
    step; the explode geometry — the part that controls output row
    count and partition sizing at scale — is real and tested."""
    video = media.filter(F.col("media_type") == "video")
    n_frames = F.greatest(
        (F.col("meta.duration_ms") / every_ms).cast("int"), F.lit(1)
    )
    return video.select(
        "media_id",
        F.posexplode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_index", "_v"),
    ).select(
        "media_id",
        F.col("frame_index").cast("int"),
        (F.col("frame_index") * every_ms).cast("int").alias("frame_offset_ms"),
    )
