"""Multimodal column plumbing: opaque binary payloads + typed
metadata, with Arrow-batched feature extraction via ``mapInPandas``.

WORKING pure-Python decode paths (no external libraries): PNG, GIF
and JPEG (SOF frame header) for images — authoritative
width/height; RIFF/WAV headers for audio (sample rate, channels,
data-chunk duration); MP4 ``moov/mvhd`` for video (timescale →
duration). The synth table plants real spec-valid PNG, JPEG, WAV
and MP4 payloads so all four run end-to-end. Exotic codecs (mp3,
webm, TIFF, ...) remain STUBBED: :func:`decode_stub` raises
NotImplementedError and the pipeline falls back to
:func:`fake_features` — a deterministic featurizer over the raw
bytes — so the Spark-side plumbing (schema, Arrow batch shape,
partitioning) is real and tested for every modality even where a
codec is absent.

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
    "decoded_width int, decoded_height int, "
    "decoded_sample_rate int, decoded_duration_ms int"
)

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

#: Hard cap on the DECODED byte size an ingest-gate decode will
#: allocate (filter bytes + pixels = (width+1)*height). 64 MiB covers
#: any sane gate-scale grayscale-8 image (~8k x 8k); anything larger
#: is rejected from the declared IHDR dims BEFORE inflating, and the
#: inflate itself is capped at this bound — a crafted zlib bomb (a
#: few-KiB IDAT that inflates to gigabytes) can never allocate past
#: it (round-11 advice fix).
PNG_MAX_DECODED_BYTES = 64 << 20


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    """One PNG chunk: length + type + payload + CRC — THE layout
    definition shared by both encoders."""
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def encode_png(width: int, height: int, seed: int = 0) -> bytes:
    """Minimal spec-valid 8-bit grayscale PNG encoder (pure Python:
    struct + zlib, both stdlib). Deterministic pixel ramp from
    ``seed`` so fixtures are stable across runs. Used to give the
    synth table REAL image payloads for the working decode path."""
    chunk = _png_chunk

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


def decode_gif_header(content: bytes) -> tuple[int, int] | None:
    """GIF87a/GIF89a logical-screen width/height (little-endian uint16
    at bytes 6..10)."""
    if len(content) >= 10 and bytes(content[:6]) in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", bytes(content[6:10]))
        return int(w), int(h)
    return None


def encode_jpeg(width: int, height: int, seed: int = 0) -> bytes:
    """Minimal structurally-valid baseline JPEG (pure stdlib): SOI,
    JFIF APP0, DQT, SOF0 carrying the authoritative dimensions, DHT,
    SOS, a deterministic entropy-coded filler (no unstuffed 0xFF
    bytes), EOI. Enough spec conformance that any marker-walking
    header parser — including :func:`decode_jpeg_header` — reads the
    true dimensions without a codec library."""
    out = b"\xff\xd8"  # SOI
    app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xe0" + struct.pack(">H", len(app0) + 2) + app0
    dqt = b"\x00" + bytes([1] * 64)  # flat luminance table, id 0
    out += b"\xff\xdb" + struct.pack(">H", len(dqt) + 2) + dqt
    # SOF0: 8-bit precision, height BEFORE width per spec, 1 component
    sof = struct.pack(">BHHB", 8, height, width, 1) + b"\x01\x11\x00"
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    dht = b"\x00" + bytes([1] + [0] * 15) + b"\x00"  # one 1-bit DC code
    out += b"\xff\xc4" + struct.pack(">H", len(dht) + 2) + dht
    sos = b"\x01\x01\x00\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
    out += bytes((seed + i) % 255 for i in range(8))  # % 255 ⇒ never 0xFF
    return out + b"\xff\xd9"  # EOI


def decode_jpeg_header(content: bytes) -> tuple[int, int] | None:
    """Walk JPEG markers to the first SOF frame header (0xC0–0xCF
    excluding DHT 0xC4 / JPG 0xC8 / DAC 0xCC) and return
    (width, height) from its big-endian height/width fields — the
    standard dimensions-without-decode path; pixel data is never
    touched."""
    b = bytes(content)
    if len(b) < 4 or b[:2] != b"\xff\xd8":
        return None
    i = 2
    while i + 4 <= len(b):
        if b[i] != 0xFF:
            return None
        # JPEG permits runs of 0xFF fill/padding bytes before a marker
        # (ITU T.81 §B.1.1.2) — skip them instead of reading 0xFF as a
        # (nonexistent) marker code and bailing on real-world baselines
        while i + 4 <= len(b) and b[i + 1] == 0xFF:
            i += 1
        if i + 4 > len(b):
            return None
        marker = b[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:  # no payload
            i += 2
            continue
        if marker in (0xD9, 0xDA):  # EOI / SOS before any SOF: give up
            return None
        seglen = struct.unpack(">H", b[i + 2 : i + 4])[0]
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            if i + 9 > len(b):
                return None
            _prec, h, w = struct.unpack(">BHH", b[i + 4 : i + 9])
            return int(w), int(h)
        i += 2 + seglen
    return None


def _mp4_box(typ: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", len(payload) + 8) + typ + payload


def encode_mp4(duration_ms: int, timescale: int = 1000, seed: int = 0) -> bytes:
    """Minimal spec-valid MP4 (ISO BMFF) container: ``ftyp`` +
    ``moov`` holding a version-0 ``mvhd`` (timescale, duration,
    unity matrix) + a small deterministic ``mdat``. Gives the synth
    table REAL video payloads for the mvhd duration decode path."""
    ftyp = _mp4_box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    mvhd = struct.pack(">I", 0)  # version 0 + flags
    mvhd += struct.pack(
        ">IIII", 0, 0, timescale, duration_ms * timescale // 1000
    )  # creation, modification, timescale, duration
    mvhd += struct.pack(">I", 0x00010000) + struct.pack(">H", 0x0100)  # rate, volume
    mvhd += b"\x00" * 10  # reserved
    mvhd += struct.pack(
        ">9I", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000
    )  # unity matrix
    mvhd += b"\x00" * 24 + struct.pack(">I", 2)  # pre_defined, next_track_ID
    moov = _mp4_box(b"moov", _mp4_box(b"mvhd", mvhd))
    mdat = _mp4_box(b"mdat", bytes((seed + i) % 256 for i in range(16)))
    return ftyp + moov + mdat


def decode_mp4_mvhd(content: bytes) -> dict | None:
    """Walk top-level ISO BMFF boxes to ``moov``, then its children to
    ``mvhd``; handle version 0 (32-bit times) and version 1 (64-bit)
    and return {timescale, duration_ms}. Header-only — ``mdat`` (the
    ~100% of a real video's bytes) is skipped via the box length, the
    exact pattern a 100 TB duration-filter pass needs."""
    b = bytes(content)
    i = 0
    while i + 8 <= len(b):
        size = struct.unpack(">I", b[i : i + 4])[0]
        if size < 8:
            return None
        if b[i + 4 : i + 8] == b"moov":
            j, end = i + 8, min(i + size, len(b))
            while j + 8 <= end:
                csize = struct.unpack(">I", b[j : j + 4])[0]
                if csize < 8:
                    return None
                if b[j + 4 : j + 8] == b"mvhd" and j + 40 <= end:
                    if b[j + 8] == 0:  # version 0: 32-bit times
                        timescale, duration = struct.unpack(">II", b[j + 20 : j + 28])
                    else:  # version 1: 64-bit creation/modification/duration
                        timescale = struct.unpack(">I", b[j + 28 : j + 32])[0]
                        duration = struct.unpack(">Q", b[j + 32 : j + 40])[0]
                    return {
                        "timescale": int(timescale),
                        "duration_ms": int(duration * 1000 // timescale)
                        if timescale
                        else 0,
                    }
                j += csize
            return None
        i += size
    return None


def encode_wav(duration_ms: int, sample_rate: int = 8000, seed: int = 0) -> bytes:
    """Minimal spec-valid PCM WAV encoder (RIFF/fmt/data, 8-bit mono)
    with a deterministic byte ramp — real audio payloads for the
    decode path without any codec library."""
    n_samples = max(1, sample_rate * duration_ms // 1000)
    data = bytes((seed + i) % 256 for i in range(n_samples))
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate, 1, 8)
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav_header(content: bytes) -> dict | None:
    """Parse a RIFF/WAVE header: sample rate, channels, and duration
    derived from the data-chunk byte count — the audio-metadata pass
    (sample-rate filters, duration caps) that a 100 TB pipeline runs
    without ever decoding samples."""
    b = bytes(content[:64])
    if len(b) < 36 or b[:4] != b"RIFF" or b[8:12] != b"WAVE" or b[12:16] != b"fmt ":
        return None
    fmt_len = struct.unpack("<I", b[16:20])[0]
    _, channels, sample_rate, _, block_align, bits = struct.unpack(
        "<HHIIHH", b[20:36]
    )
    data_off = 20 + fmt_len
    if len(content) < data_off + 8 or bytes(content[data_off : data_off + 4]) != b"data":
        return None
    data_len = struct.unpack("<I", bytes(content[data_off + 4 : data_off + 8]))[0]
    bytes_per_sec = sample_rate * channels * (bits // 8)
    return {
        "sample_rate": int(sample_rate),
        "channels": int(channels),
        "duration_ms": int(data_len * 1000 // bytes_per_sec) if bytes_per_sec else 0,
    }


def synth_media_table(spark: SparkSession, sf_dir: str | None = None) -> DataFrame:
    """Deterministic fake media table. Image rows alternate REAL PNG
    and REAL JPEG payloads (header dims == meta dims), audio rows
    carry REAL PCM WAV payloads (data-chunk duration == meta
    duration), and video rows REAL minimal MP4 containers (mvhd
    duration == meta duration) — every decode path runs
    end-to-end."""
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
                    # image media_ids are ≡0 (mod 3), so mid % 2
                    # alternates PNG/JPEG across them
                    enc = encode_png if int(mid) % 2 == 0 else encode_jpeg
                    content.append(enc(meta["width"], meta["height"], seed=int(mid)))
                elif mtyp == "audio":
                    # 1 kHz keeps payloads ~duration_ms bytes
                    content.append(
                        encode_wav(meta["duration_ms"], sample_rate=1000, seed=int(mid))
                    )
                else:
                    content.append(encode_mp4(meta["duration_ms"], seed=int(mid)))
            pdf = pdf.copy()
            pdf["content"] = content
            yield pdf

    return base.mapInPandas(_encode, MEDIA_SCHEMA)


def decode_stub(content: bytes, media_type: str) -> dict:
    """Decode entry point. WORKING pure-Python paths: PNG + GIF +
    JPEG-SOF headers (images → width/height), RIFF/WAV headers
    (audio → sample rate / channels / duration), and MP4 moov/mvhd
    (video → duration). Exotic codecs (mp3, webm, TIFF, ...) raise
    NotImplementedError because those need codec libraries absent in
    this container — callers fall back to :func:`fake_features`."""
    if media_type == "image":
        dims = decode_png_header(content)
        if dims is not None:
            return {"format": "png", "width": dims[0], "height": dims[1]}
        dims = decode_gif_header(content)
        if dims is not None:
            return {"format": "gif", "width": dims[0], "height": dims[1]}
        dims = decode_jpeg_header(content)
        if dims is not None:
            return {"format": "jpeg", "width": dims[0], "height": dims[1]}
    if media_type == "audio":
        wav = decode_wav_header(content)
        if wav is not None:
            return {"format": "wav", **wav}
    if media_type == "video":
        mv = decode_mp4_mvhd(content)
        if mv is not None:
            return {"format": "mp4", **mv}
    raise NotImplementedError(
        f"real {media_type} decoding (beyond PNG/GIF/JPEG/WAV/MP4 headers) "
        "requires media libraries not present in this environment; use "
        "fake_features for plumbing tests"
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
                    dims.append(
                        (
                            d.get("width"),
                            d.get("height"),
                            d.get("sample_rate"),
                            d.get("duration_ms"),
                        )
                    )
                except NotImplementedError:
                    dims.append((None, None, None, None))  # codec absent
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
                    "decoded_sample_rate": pd.array([d[2] for d in dims], dtype="Int32"),
                    "decoded_duration_ms": pd.array([d[3] for d in dims], dtype="Int32"),
                }
            )

    return media.mapInPandas(_extract, FEATURE_SCHEMA)


def multimodal_features(spark: SparkSession, sf_dir: str | None = None) -> DataFrame:
    """Driver-facing entry: synth table → extract → stable ordering."""
    return extract_media_features(synth_media_table(spark, sf_dir)).orderBy("media_id")


RESIZE_SCHEMA = "media_id long, out_width int, out_height int, content binary"


def area_resample(pixels, out_w: int, out_h: int):
    """Area-mean downsample of a grayscale pixel matrix onto
    (out_h, out_w): cell (r, c) is the mean of its source block
    (integer boundaries (i*src)//out — the ahash grid, generalized).
    Downscale/equal only (the resize geometry clips scale at 1.0)."""
    import numpy as np

    h, w = pixels.shape
    rb = (np.arange(out_h + 1) * h) // out_h
    cb = (np.arange(out_w + 1) * w) // out_w
    px = pixels.astype(np.float64)
    out = np.empty((out_h, out_w), dtype=np.uint8)
    for r in range(out_h):
        band = px[rb[r] : rb[r + 1]]
        for c in range(out_w):
            out[r, c] = int(band[:, cb[c] : cb[c + 1]].mean() + 0.5)
    return out


def encode_png_pixels(pixels) -> bytes:
    """Re-encode a grayscale uint8 matrix as a spec-valid PNG (filter
    type 0 per scanline) — the write side of
    :func:`decode_png_pixels`, sharing :func:`encode_png`'s chunk
    layout (one ``_png_chunk`` definition)."""
    chunk = _png_chunk
    h, w = pixels.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + bytes(pixels[y].tolist()) for y in range(h))
    return (
        PNG_SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def resize_images(media: DataFrame, max_side: int = 256) -> DataFrame:
    """Image resize: computes the target geometry from metadata
    (aspect-preserving fit into ``max_side``), and for payloads inside
    the decode envelope (grayscale-8 PNG) performs the REAL resample —
    pixel decode → area-mean downsample → PNG re-encode, all stdlib +
    numpy in one Arrow batch. Payloads outside the envelope (JPEG —
    no DCT codec here) pass through with the computed geometry, the
    honest fallback the module has always documented. Round-trip
    (output decodes to exactly the target dims with area-mean pixel
    values) is pinned in tests/test_ml.py."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ws, out_hs, content = [], [], []
            for c, meta in zip(pdf["content"], pdf["meta"]):
                px = decode_png_pixels(bytes(c))
                if px is not None:
                    # AUTHORITATIVE dims are the decoded payload's, not
                    # the metadata's (they are independent fields; a
                    # lying meta must not drive the resample — review
                    # finding: meta-derived targets wider than the real
                    # image NaN-crash area_resample)
                    h, w = px.shape
                else:
                    w, h = meta["width"], meta["height"]
                scale = min(1.0, max_side / max(w, h, 1))
                ow, oh = max(1, int(w * scale)), max(1, int(h * scale))
                if px is not None and (oh, ow) != px.shape:
                    content.append(encode_png_pixels(area_resample(px, ow, oh)))
                else:
                    # outside envelope (geometry-only) or no-op resize
                    # (already within max_side): pass bytes through —
                    # no pointless inflate/resample/deflate cycle
                    content.append(c)
                out_ws.append(ow)
                out_hs.append(oh)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "out_width": out_ws,
                    "out_height": out_hs,
                    "content": content,
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


# --- real pixel decode (grayscale-8 PNG) + perceptual-hash dedup -------------
#
# The one image family this container can decode END-TO-END with the
# stdlib: 8-bit grayscale, non-interlaced PNG (signature + IHDR walk,
# IDAT concat, zlib inflate, full filter reconstruction per the PNG
# spec §9 — all five filter types, not just the 0s our own encoder
# emits). JPEG pixel decode stays honestly out of scope (DCT codec).


def decode_png_pixels(content: bytes):
    """Full pixel decode for 8-bit grayscale non-interlaced PNGs:
    returns a (height, width) uint8 numpy array, or None when
    ``content`` is not a PNG this decoder supports (wrong color
    type / bit depth / interlace, or not a PNG at all). Pure stdlib
    (struct + zlib) + numpy; filter reconstruction implements all
    five spec filter types (None/Sub/Up/Average/Paeth) so any
    conforming grayscale-8 PNG decodes, not only our encoder's."""
    import numpy as np

    if len(content) < 24 or bytes(content[:8]) != PNG_SIGNATURE:
        return None
    # MALFORMED payloads (truncated IHDR, corrupt deflate stream, lying
    # chunk lengths) must return None per the contract, not abort the
    # whole Arrow batch — an ingest gate survives truncated uploads
    # (review finding, pinned in tests/test_ml.py)
    try:
        pos, width, height, idat = 8, None, None, b""
        data = bytes(content)
        while pos + 8 <= len(data):
            (length,) = struct.unpack(">I", data[pos : pos + 4])
            typ = data[pos + 4 : pos + 8]
            payload = data[pos + 8 : pos + 8 + length]
            if typ == b"IHDR":
                width, height, depth, color, _comp, _filt, interlace = struct.unpack(
                    ">IIBBBBB", payload
                )
                if depth != 8 or color != 0 or interlace != 0:
                    return None  # outside the honest decode envelope
            elif typ == b"IDAT":
                idat += payload
            elif typ == b"IEND":
                break
            pos += 12 + length  # len + type + payload + crc
        if not width or not height or not idat:
            return None
        stride = width + 1  # leading filter byte per scanline
        expected = stride * height
        if expected > PNG_MAX_DECODED_BYTES:
            return None  # declared dims alone exceed the gate envelope
        # Bounded inflate: ask for at most expected+1 bytes, so a
        # conforming stream yields exactly `expected` and a zlib bomb
        # (or any stream longer than the declared dims) yields
        # expected+1 — caught by the length check below — WITHOUT the
        # unbounded allocation plain zlib.decompress would make
        # (round-11 advice fix; pinned in tests/test_ml.py).
        raw = zlib.decompressobj().decompress(idat, expected + 1)
    except (struct.error, zlib.error, OverflowError, MemoryError):
        return None
    if len(raw) != expected:
        return None
    out = np.zeros((height, width), dtype=np.uint8)
    prev = np.zeros(width, dtype=np.int32)
    for y in range(height):
        row = raw[y * stride : (y + 1) * stride]
        ftype, cur = row[0], np.frombuffer(row[1:], dtype=np.uint8).astype(np.int32)
        if ftype == 0:  # None
            rec = cur
        elif ftype == 2:  # Up
            rec = (cur + prev) & 0xFF
        else:  # Sub / Average / Paeth need the running left pixel
            rec = np.zeros(width, dtype=np.int32)
            left = 0
            for x in range(width):
                up = int(prev[x])
                if ftype == 1:  # Sub
                    pred = left
                elif ftype == 3:  # Average
                    pred = (left + up) // 2
                elif ftype == 4:  # Paeth
                    ul = int(prev[x - 1]) if x else 0
                    p = left + up - ul
                    pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                    pred = left if pa <= pb and pa <= pc else (up if pb <= pc else ul)
                else:
                    return None  # invalid filter type
                left = (int(cur[x]) + pred) & 0xFF
                rec[x] = left
        out[y] = rec.astype(np.uint8)
        prev = rec
    return out


def ahash64(pixels) -> int:
    """64-bit average hash: area-mean the image onto an 8x8 grid,
    set bit (r*8+c) iff the cell mean exceeds the grid mean. The
    classic perceptual hash — stable under resizing and small local
    edits, so near-duplicate images land within a few bits.

    Sub-8-pixel dimensions: every cell's block is forced non-empty
    (``max(lo+1, hi)``, blocks then overlap — nearest-neighbor
    upsampling in effect), so a 4-pixel-tall image hashes on its
    CONTENT; the naive floor grid leaves half the slices empty there,
    NaN-means every cell, and collapses all such images to hash 0 —
    a false exact-dup clique (review finding, pinned in
    tests/test_ml.py)."""
    import numpy as np

    h, w = pixels.shape
    rb = (np.arange(9) * h) // 8
    cb = (np.arange(9) * w) // 8
    cells = np.empty((8, 8), dtype=np.float64)
    # uint8 slice .mean() accumulates in float64 — same values as an
    # astype copy without 8x the image in memory (the phash64_dct fix)
    for r in range(8):
        r0, r1 = rb[r], max(rb[r] + 1, rb[r + 1])
        for c in range(8):
            c0, c1 = cb[c], max(cb[c] + 1, cb[c + 1])
            cells[r, c] = pixels[r0:r1, c0:c1].mean()
    bits = (cells > cells.mean()).flatten()
    val = 0
    for i, b in enumerate(bits):
        if b:
            val |= 1 << i
    return val - (1 << 64) if val >= 1 << 63 else val  # two's-complement int64


def phash64_dct(pixels) -> int:
    """64-bit DCT perceptual hash (the classic pHash): grid-mean the
    image onto 32x32, apply the orthonormal 2-D DCT-II, keep the
    top-left 8x8 LOW-FREQUENCY coefficient block, and set bit i iff
    coefficient i exceeds the block median (DC excluded from the
    median so a constant offset can't drag the threshold).

    Why it exists next to :func:`ahash64`: aHash thresholds spatial
    cell means against their own mean, so a uniform brightness /
    contrast shift that CLIPS at 0/255 redistributes the means and
    flips bits — a planted limitation, not a bug. The DCT separates
    structure (AC coefficients — shape) from level (DC): an affine
    intensity change scales every AC coefficient by the same positive
    factor and the median threshold is scale-invariant, so the hash
    moves only where clipping destroys actual structure. Same 32x32
    grid idiom as ahash's 8x8 (forced-nonempty overlapping blocks, so
    sub-32px images hash on content); numpy matrix DCT — no codec
    dependency, same decoded-PNG envelope.

    Cost: one 32x32 grid fold + two 32x32 matmuls per image — an
    Arrow-batched kernel like ahash, banding unchanged, so the scale
    story is identical (band-bucket joins, never all-pairs)."""
    import numpy as np

    n = 32
    h, w = pixels.shape
    rb = (np.arange(n + 1) * h) // n
    cb = (np.arange(n + 1) * w) // n
    # no up-front float64 copy of the full image (8x the decoded
    # payload, ~512 MB at the 64 MiB decode cap): uint8 slice .mean()
    # already accumulates in float64, bit-identical result
    cells = np.empty((n, n), dtype=np.float64)
    for r in range(n):
        r0, r1 = rb[r], max(rb[r] + 1, rb[r + 1])
        for c in range(n):
            c0, c1 = cb[c], max(cb[c] + 1, cb[c + 1])
            cells[r, c] = pixels[r0:r1, c0:c1].mean()
    k = np.arange(n).reshape(-1, 1)
    i = np.arange(n).reshape(1, -1)
    m = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * i + 1) * k / (2 * n))
    m[0, :] = np.sqrt(1.0 / n)
    block = (m @ cells @ m.T)[:8, :8].flatten()
    med = float(np.median(block[1:]))
    val = 0
    for b, v in enumerate(block):
        if v > med:
            val |= 1 << b
    return val - (1 << 64) if val >= 1 << 63 else val  # two's-complement int64


#: 4 bands x 16 bits over the 64-bit hash: by pigeonhole, any pair
#: within PHASH_HAMMING_MAX=3 bits shares at least one untouched band,
#: so the banded candidate join has PERFECT recall at that radius —
#: the simhash blocking argument, applied to images.
PHASH_BANDS = 4
PHASH_HAMMING_MAX = 3

PHASH_SCHEMA = "media_id long, phash long"


def image_phash(media: DataFrame, kernel=ahash64) -> DataFrame:
    """Per-image perceptual hash over the decodable payloads (the
    grayscale-8 PNGs; JPEG rows are skipped — no image-codec DCT
    here; :func:`phash64_dct`'s DCT is numpy matrix math over decoded
    pixels, not a codec). Arrow-batched kernel, bounded CPU per
    image; output is one long per image. ``kernel`` picks the hash
    (``ahash64`` default; ``phash64_dct`` for the brightness-robust
    variant)."""

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for mid, c in zip(pdf["media_id"], pdf["content"]):
                px = decode_png_pixels(bytes(c))
                if px is not None:
                    ids.append(int(mid))
                    hashes.append(kernel(px))
            yield pd.DataFrame({"media_id": ids, "phash": hashes})

    return (
        media.filter(F.col("media_type") == "image")
        .select("media_id", "content")
        .mapInPandas(_hash, PHASH_SCHEMA)
    )


def phash_near_dup_pairs(hashes: DataFrame) -> DataFrame:
    """Banded near-duplicate candidate join over perceptual hashes:
    split each 64-bit hash into PHASH_BANDS 16-bit band keys, bucket
    on (band index, band value), pair within buckets, keep pairs with
    hamming(phash_a, phash_b) <= PHASH_HAMMING_MAX. Identical plan
    family as the simhash candidates: the only shuffle is the
    band-bucket groupBy-join, candidates are bucket-local, and
    all-pairs never happens — at 100 TB of images this is the same
    banding cost model as text simhash (perfect recall at the radius
    by pigeonhole, precision from the exact hamming filter)."""
    bands = hashes.select(
        "media_id",
        "phash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftrightunsigned("phash", 16 * i)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("key"),
                    )
                    for i in range(PHASH_BANDS)
                ]
            )
        ).alias("bk"),
    ).select("media_id", "phash", "bk.band", "bk.key")
    a = bands.select(
        F.col("band"),
        F.col("key"),
        F.col("media_id").alias("media_id_a"),
        F.col("phash").alias("phash_a"),
    )
    b = bands.select(
        F.col("band"),
        F.col("key"),
        F.col("media_id").alias("media_id_b"),
        F.col("phash").alias("phash_b"),
    )
    ham = F.bit_count(F.col("phash_a").bitwiseXOR(F.col("phash_b")))
    return (
        a.join(b, ["band", "key"])
        .filter(F.col("media_id_a") < F.col("media_id_b"))
        .select("media_id_a", "media_id_b", ham.alias("hamming"))
        .distinct()  # a pair can share several bands
        .filter(F.col("hamming") <= PHASH_HAMMING_MAX)
    )


def multimodal_phash_dedup(spark: SparkSession, sf_dir: str | None = None) -> DataFrame:
    """Driver-facing entry: synth media table → real PNG pixel decode
    → perceptual hash → banded near-dup pairs. The synth ramps are
    visually similar by construction, so the fixture yields real
    pairs; planted structured/perturbed/distinct images pin recall
    and precision in tests/test_ml.py."""
    return phash_near_dup_pairs(image_phash(synth_media_table(spark, sf_dir))).orderBy(
        "media_id_a", "media_id_b"
    )


def multimodal_phash_dct_dedup(
    spark: SparkSession, sf_dir: str | None = None
) -> DataFrame:
    """DCT-pHash variant of :func:`multimodal_phash_dedup` (round-11
    verdict #7): same decode envelope, same banded candidate join —
    only the hash kernel changes, trading aHash's brightness
    brittleness for DCT's affine-intensity invariance. The planted
    brightness-shift pair aHash misses and this catches is pinned in
    tests/test_ml.py."""
    return phash_near_dup_pairs(
        image_phash(synth_media_table(spark, sf_dir), kernel=phash64_dct)
    ).orderBy("media_id_a", "media_id_b")
