"""Multimodal column plumbing: opaque binary payloads + typed
metadata, with Arrow-batched feature extraction via ``mapInPandas``.

PNG is a fully WORKING decode path: image payloads in the synth table
are real (pure-Python-encoded, spec-valid) PNG files, and
:func:`decode_png_header` parses the signature + IHDR chunk to
recover authoritative width/height — no external libraries.
Audio/video (and non-PNG image formats) remain STUBBED:
:func:`decode_stub` raises NotImplementedError for them and the
pipeline falls back to :func:`fake_features` — a deterministic
featurizer over the raw bytes — so the Spark-side plumbing (schema,
Arrow batch shape, partitioning) is real and tested for every
modality even where the codec is absent.

Scale notes: binary payloads ride in parquet as BINARY columns;
``mapInPandas`` streams Arrow batches so executor memory is bounded
by batch size (spark.sql.execution.arrow.maxRecordsPerBatch), not
partition size. Feature extraction is embarrassingly parallel — no
shuffle. Header-only decode (IHDR is in the first 24 bytes) is the
pattern a 100 TB metadata-validation pass wants: it never touches
the pixel data.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
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
    "byte_mean double, byte_std double, content_sha1 string, "
    "decoded_width int, decoded_height int"
)

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"


def encode_png(width: int, height: int, seed: int = 0) -> bytes:
    """Minimal spec-valid 8-bit grayscale PNG encoder (pure Python:
    struct + zlib, both stdlib). Deterministic pixel ramp from
    ``seed`` so fixtures are stable across runs. Used to give the
    synth table REAL image payloads for the working decode path."""

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    # IHDR: width, height, bit depth 8, color type 0 (grayscale),
    # compression 0, filter 0, interlace 0
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(
        b"\x00" + bytes((seed + x + y) % 256 for x in range(width))
        for y in range(height)
    )
    return (
        PNG_SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def decode_png_header(content: bytes) -> tuple[int, int] | None:
    """Parse a PNG signature + IHDR and return (width, height), or
    None if ``content`` is not a PNG. Spec: the 8-byte signature is
    followed immediately by the IHDR chunk (length=13), whose first
    8 data bytes are big-endian width and height — so authoritative
    dimensions live in content[16:24] and decode never reads pixel
    data."""
    if (
        len(content) >= 24
        and bytes(content[:8]) == PNG_SIGNATURE
        and bytes(content[12:16]) == b"IHDR"
    ):
        w, h = struct.unpack(">II", bytes(content[16:24]))
        return int(w), int(h)
    return None


def synth_media_table(spark: SparkSession, sf_dir: str | None = None) -> DataFrame:
    """Deterministic fake media table. Image rows carry REAL PNG
    payloads (tiny rasters encoded by :func:`encode_png`, IHDR dims ==
    meta dims) so the decode path is exercised end-to-end; audio/video
    rows carry the document's text bytes as an opaque stand-in."""
    from real_time_fraud_detection_lakehouse_spark.core.catalog import table

    docs = table(spark, sf_dir, "documents")
    mt = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    base = docs.select(
        F.col("doc_id").alias("media_id"),
        mt.alias("media_type"),
        F.encode(F.col("text"), "UTF-8").alias("content"),
        F.struct(
            ((F.col("doc_id") % 16 + 1) * 4).cast("int").alias("width"),
            ((F.col("doc_id") % 9 + 1) * 4).cast("int").alias("height"),
            ((F.col("doc_id") % 100 + 1) * 1000).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )

    # swap in real PNG bytes for image rows (Arrow batch; rasters are
    # <= 64x36 so fixture generation stays cheap)
    def _encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = []
            for mid, mtyp, c, meta in zip(
                pdf["media_id"], pdf["media_type"], pdf["content"], pdf["meta"]
            ):
                if mtyp == "image":
                    content.append(encode_png(meta["width"], meta["height"], seed=int(mid)))
                else:
                    content.append(c)
            pdf = pdf.copy()
            pdf["content"] = content
            yield pdf

    return base.mapInPandas(_encode, MEDIA_SCHEMA)


def decode_stub(content: bytes, media_type: str) -> dict:
    """Decode entry point. PNG is a WORKING path (pure-Python IHDR
    parse → authoritative width/height); every other format raises
    NotImplementedError because the codecs (torchaudio / pyav /
    non-PNG PIL) are not present in this container — callers fall
    back to :func:`fake_features` for those."""
    if media_type == "image":
        dims = decode_png_header(content)
        if dims is not None:
            return {"format": "png", "width": dims[0], "height": dims[1]}
    raise NotImplementedError(
        f"real {media_type} decoding (beyond PNG headers) requires media "
        "libraries not present in this environment; use fake_features "
        "for plumbing tests"
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
            dims = []
            for c, mtyp in zip(pdf["content"], pdf["media_type"]):
                try:
                    d = decode_stub(c, mtyp)
                    dims.append((d["width"], d["height"]))
                except NotImplementedError:
                    dims.append((None, None))  # codec absent -> bytes-only features
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [f[0] for f in feats],
                    "byte_mean": [f[1] for f in feats],
                    "byte_std": [f[2] for f in feats],
                    "content_sha1": [f[3] for f in feats],
                    "decoded_width": pd.array([d[0] for d in dims], dtype="Int32"),
                    "decoded_height": pd.array([d[1] for d in dims], dtype="Int32"),
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
