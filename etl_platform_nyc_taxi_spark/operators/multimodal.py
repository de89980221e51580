"""Multimodal-column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
metadata struct — Spark needs no new type for this (SURVEY.md §7.2 step 5).
What must be REAL at 100 TB is the plumbing: schema, batch-wise Arrow
transfer, partition sizing so one task's batch of blobs fits memory. The
actual decoders (PIL/ffmpeg/librosa) are NOT in this environment, so the
decode kernels are stubbed behind ``_HAVE_*`` gates with a deterministic
fake that preserves the exact UDF signature, batch shape, and output
schema — swap the kernel body, nothing else moves.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # decoder libs intentionally absent in this image
    import PIL.Image  # noqa: F401

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False

#: Metadata struct carried next to every binary payload column.
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("format", T.StringType(), True),  # png|wav|mp4|...
        T.StructField("size_bytes", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),  # images/video
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),  # audio/video
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("size_bytes", T.LongType(), False),
        T.StructField("feat", T.ArrayType(T.FloatType()), False),
    ]
)


def sniff_image_header(
    payload: bytes | None,
) -> tuple[str | None, int | None, int | None]:
    """(format, width, height) from real PNG/JPEG/GIF container headers —
    pure Python, no decoder libs. This is NOT a stub: it reads the actual
    byte layout of the three most common image containers. Unrecognized or
    truncated payloads return (None, None, None).

    * PNG: 8-byte signature, then the IHDR chunk must come first — width
      and height are big-endian u32 at offsets 16 and 20.
    * GIF: ``GIF87a``/``GIF89a``, logical-screen width/height little-endian
      u16 at offsets 6 and 8.
    * JPEG: ``FF D8`` SOI, then a marker scan to the first SOF frame header
      (C0–CF excluding C4/C8/CC): height/width big-endian u16 at payload
      offsets 3 and 5 inside the segment.
    """
    if not payload or len(payload) < 10:
        return (None, None, None)
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        if len(payload) >= 24 and payload[12:16] == b"IHDR":
            w = int.from_bytes(payload[16:20], "big")
            h = int.from_bytes(payload[20:24], "big")
            return ("png", w, h)
        return ("png", None, None)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        w = int.from_bytes(payload[6:8], "little")
        h = int.from_bytes(payload[8:10], "little")
        return ("gif", w, h)
    if payload[:2] == b"\xff\xd8":
        i, n = 2, len(payload)
        while i + 9 < n:
            if payload[i] != 0xFF:  # desynced — not a well-formed stream
                return ("jpeg", None, None)
            marker = payload[i + 1]
            if marker == 0xFF:  # fill byte
                i += 1
                continue
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2  # standalone marker, no length field
                continue
            seg_len = int.from_bytes(payload[i + 2 : i + 4], "big")
            if seg_len < 2:
                return ("jpeg", None, None)
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h = int.from_bytes(payload[i + 5 : i + 7], "big")
                w = int.from_bytes(payload[i + 7 : i + 9], "big")
                return ("jpeg", w, h)
            i += 2 + seg_len
        return ("jpeg", None, None)
    return (None, None, None)


def sniff_audio_header(
    payload: bytes | None,
) -> tuple[str | None, int | None]:
    """(format, duration_ms) from a real WAV/RIFF container header — pure
    Python, no decoder libs, and NOT a stub: it walks the actual RIFF
    chunk layout. Unrecognized or truncated payloads → (None, None).

    WAV: ``RIFF``<u32le size>``WAVE``, then a chunk walk; the ``fmt ``
    chunk carries byte_rate (u32le at chunk offset 8) and the ``data``
    chunk's declared size over byte_rate is the duration. Only the
    header window is inspected (callers pass the first 4 KB), so a
    truncated *payload* still yields the true duration — the data size
    is a declared field, not a measured one.
    """
    if not payload or len(payload) < 12:
        return (None, None)
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return (None, None)
    byte_rate: int | None = None
    data_size: int | None = None
    i, n = 12, len(payload)
    while i + 8 <= n:
        cid = payload[i : i + 4]
        clen = int.from_bytes(payload[i + 4 : i + 8], "little")
        if cid == b"fmt " and i + 20 <= n:
            byte_rate = int.from_bytes(payload[i + 16 : i + 20], "little")
        elif cid == b"data":
            data_size = clen
        if byte_rate and data_size is not None:
            break
        i += 8 + clen + (clen & 1)  # chunks are word-aligned
    if byte_rate and data_size is not None:
        return ("wav", data_size * 1000 // byte_rate)
    return ("wav", None)


def sniff_video_header(
    payload: bytes | None,
) -> tuple[str | None, int | None, int | None, int | None]:
    """(format, width, height, duration_ms) from a real MP4 / ISO-BMFF
    container header — pure Python box walk, no decoder libs.

    Layout: top-level boxes are [u32be size][4cc type]; an ``ftyp`` box
    first marks the file as ISO-BMFF. Duration lives in
    ``moov``→``mvhd`` (version 0: u32be timescale at box offset 20 and
    u32be duration at 24; version 1: u64be pair at 28). Width/height
    live in ``moov``→``trak``→``tkhd`` as 16.16 fixed-point at the box
    tail. Only the probe window is walked, so a ``moov``-at-end (the
    common streaming-unfriendly layout) yields ("mp4", None, None,
    None) — format known, metadata unknown, exactly what a 4 KB header
    probe can honestly claim."""
    if not payload or len(payload) < 12:
        return (None, None, None, None)
    if payload[4:8] != b"ftyp":
        return (None, None, None, None)

    dur_ms: int | None = None
    width: int | None = None
    height: int | None = None

    def walk(start: int, end: int, depth: int = 0) -> None:
        nonlocal dur_ms, width, height
        i = start
        while i + 8 <= min(end, len(payload)) and depth < 6:
            size = int.from_bytes(payload[i : i + 4], "big")
            typ = payload[i + 4 : i + 8]
            if size < 8:  # size==1 (64-bit largesize) unsupported in probe
                return
            body, nxt = i + 8, i + size
            if typ in (b"moov", b"trak"):
                walk(body, min(nxt, len(payload)), depth + 1)
            elif typ == b"mvhd" and body + 4 <= len(payload):
                ver = payload[body]
                if ver == 0 and body + 20 <= len(payload):
                    ts = int.from_bytes(payload[body + 12 : body + 16], "big")
                    d = int.from_bytes(payload[body + 16 : body + 20], "big")
                elif ver == 1 and body + 32 <= len(payload):
                    ts = int.from_bytes(payload[body + 20 : body + 24], "big")
                    d = int.from_bytes(payload[body + 24 : body + 32], "big")
                else:
                    ts, d = 0, 0
                if ts:
                    dur_ms = d * 1000 // ts
            elif typ == b"tkhd":
                # width/height: 16.16 fixed at the last 8 bytes of the box
                tail = i + size
                if tail <= len(payload) and size >= 16:
                    w = int.from_bytes(payload[tail - 8 : tail - 4], "big") >> 16
                    h = int.from_bytes(payload[tail - 4 : tail], "big") >> 16
                    if w and h and width is None:
                        width, height = w, h
            i = nxt

    walk(0, len(payload))
    return ("mp4", width, height, dur_ms)


_HEADER_SCHEMA = T.StructType(
    [
        T.StructField("format", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)


def _sniff_headers_udf():
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(_HEADER_SCHEMA)
    def sniff(payloads: pd.Series) -> pd.DataFrame:
        out = []
        for p in payloads:
            fmt, w, h = sniff_image_header(p)
            dur = None
            if fmt is None:
                fmt, dur = sniff_audio_header(p)
            if fmt is None:
                fmt, w, h, dur = sniff_video_header(p)
            out.append((fmt, w, h, dur))
        return pd.DataFrame(
            out, columns=["format", "width", "height", "duration_ms"]
        ).astype({"width": "Int32", "height": "Int32", "duration_ms": "Int64"})

    return sniff


def attach_media_meta(
    df: DataFrame,
    payload_col: str,
    media_type: str,
    fmt: str | None = None,
    probe_headers: bool | None = None,
) -> DataFrame:
    """Wrap a binary column with its metadata struct.

    ``probe_headers`` (default: on for images and audio) fills
    format/width/height from REAL container headers via
    :func:`sniff_image_header`, and format/duration_ms from WAV/RIFF
    headers via :func:`sniff_audio_header` — an
    Arrow-batched pandas UDF over only the first 4 KB of each payload
    (``substring`` before the UDF bounds the transfer, so blob size never
    hits the Python worker). Payloads that aren't recognizable containers
    keep the caller-supplied ``fmt`` and NULL dims, which is why this is
    safe as a default. ``probe_headers=False`` is the original
    expression-only (pure-codegen) path with all probed fields NULL."""
    if probe_headers is None:
        probe_headers = media_type in ("image", "audio", "video")
    if not probe_headers:
        return df.withColumn(
            f"{payload_col}_meta",
            F.struct(
                F.lit(media_type).alias("media_type"),
                F.lit(fmt).cast("string").alias("format"),
                F.octet_length(F.col(payload_col)).cast("long").alias("size_bytes"),
                F.lit(None).cast("int").alias("width"),
                F.lit(None).cast("int").alias("height"),
                F.lit(None).cast("long").alias("duration_ms"),
            ),
        )
    sniff = _sniff_headers_udf()
    hdr = sniff(F.substring(F.col(payload_col), 1, 4096))
    return df.withColumn("__hdr", hdr).withColumn(
        f"{payload_col}_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.coalesce(F.col("__hdr.format"), F.lit(fmt).cast("string")).alias(
                "format"
            ),
            F.octet_length(F.col(payload_col)).cast("long").alias("size_bytes"),
            F.col("__hdr.width").alias("width"),
            F.col("__hdr.height").alias("height"),
            F.col("__hdr.duration_ms").alias("duration_ms"),
        ),
    ).drop("__hdr")


def _fake_image_features(payload: bytes, dim: int) -> list[float]:
    """Deterministic stand-in for a real image encoder: byte-histogram
    moments, reproducible across runs/partitions. REPLACE with the real
    kernel (PIL decode → resize → model) when decoders are installed."""
    if not payload:
        return [0.0] * dim
    acc = [0] * dim
    for i, b in enumerate(payload):
        acc[i % dim] += b
    n = len(payload)
    return [round(a / n, 6) for a in acc]


def image_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    dim: int = 8,
) -> DataFrame:
    """Batch feature-extraction over binary payloads via ``mapInPandas``.

    The Spark-side contract is production-real: Arrow-batched iterator
    in/out, explicit output schema, no driver collect; executors process
    one batch of blobs at a time (bound batch memory with
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` when payloads are
    large). Only the per-blob kernel is a deterministic fake until real
    decoders exist (`_HAVE_PIL` gate).
    """

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("size_bytes", T.LongType(), False),
            T.StructField("feat", T.ArrayType(T.FloatType()), False),
        ]
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "size_bytes": payloads.map(lambda b: len(b) if b is not None else 0).astype(
                        "int64"
                    ),
                    "feat": payloads.map(lambda b: _fake_image_features(b or b"", dim)),
                }
            )

    if _HAVE_PIL:  # pragma: no cover - not installed in this image
        raise NotImplementedError(
            "real decoder path not wired yet; remove the fake kernel in "
            "_fake_image_features and decode via PIL here"
        )
    return df.select(id_col, payload_col).mapInPandas(extract, out_schema)


def resize_images(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    target_bytes: int = 64,
) -> DataFrame:
    """Image-resize plumbing via ``mapInPandas``: (id, payload) →
    (id, resized binary, orig_bytes, resized_bytes).

    The Spark contract (Arrow batches, explicit schema, executor-side
    per-blob work, batch memory bounded by
    ``spark.sql.execution.arrow.maxRecordsPerBatch``) is production-real;
    the kernel is a deterministic byte-stride downsample standing in for
    PIL decode → resize → re-encode (`_HAVE_PIL` gate, same swap point as
    :func:`image_features`)."""

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("resized", T.BinaryType(), False),
            T.StructField("orig_bytes", T.LongType(), False),
            T.StructField("resized_bytes", T.LongType(), False),
        ]
    )

    def _fake_resize(payload: bytes) -> bytes:
        if not payload:
            return b""
        stride = max(1, len(payload) // target_bytes)
        return payload[::stride][:target_bytes]

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col].map(lambda b: b or b"")
            resized = payloads.map(_fake_resize)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "resized": resized,
                    "orig_bytes": payloads.map(len).astype("int64"),
                    "resized_bytes": resized.map(len).astype("int64"),
                }
            )

    if _HAVE_PIL:  # pragma: no cover - not installed in this image
        raise NotImplementedError(
            "real decoder path not wired yet; replace _fake_resize with "
            "PIL decode → thumbnail → encode"
        )
    return df.select(id_col, payload_col).mapInPandas(kernel, out_schema)


try:  # audio decoders intentionally absent in this image
    import soundfile  # noqa: F401

    _HAVE_AUDIO = True
except ImportError:
    _HAVE_AUDIO = False


def audio_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    sample_rate: int = 16_000,
    bands: int = 8,
) -> DataFrame:
    """Audio feature-extraction via ``mapInPandas``: (id, payload) →
    (doc_id, duration_ms, feat array<float>).

    The Spark contract is production-real (Arrow batches, explicit
    schema, executor-side per-blob work); the kernel is a deterministic
    stand-in treating the payload as 16-bit mono PCM at ``sample_rate``
    — duration from sample count, per-band mean |amplitude| as features.
    Swap the kernel body for soundfile/librosa decode + spectral features
    when decoders exist (`_HAVE_AUDIO` gate); nothing else moves."""
    import numpy as np

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("duration_ms", T.LongType(), False),
            T.StructField("feat", T.ArrayType(T.FloatType()), False),
        ]
    )

    def _fake_audio(payload: bytes) -> tuple[int, list[float]]:
        if not payload or len(payload) < 2:
            return 0, [0.0] * bands
        pcm = np.frombuffer(
            payload[: len(payload) - (len(payload) % 2)], dtype="<i2"
        ).astype("float64")
        duration_ms = int(len(pcm) * 1000 // sample_rate)
        chunks = np.array_split(np.abs(pcm), bands)
        feat = [round(float(c.mean()), 6) if len(c) else 0.0 for c in chunks]
        return duration_ms, feat

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = pdf[payload_col].map(lambda b: _fake_audio(b or b""))
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "duration_ms": decoded.map(lambda d: d[0]).astype("int64"),
                    "feat": decoded.map(lambda d: d[1]),
                }
            )

    if _HAVE_AUDIO:  # pragma: no cover - not installed in this image
        raise NotImplementedError(
            "real decoder path not wired yet; replace _fake_audio with "
            "soundfile decode → spectral features"
        )
    return df.select(id_col, payload_col).mapInPandas(kernel, out_schema)


#: Stand-in video geometry: fixed-size pseudo-frames at a fixed fake fps.
_FAKE_FRAME_BYTES = 256
_FAKE_FRAME_MS = 40  # 25 fps


def frame_sample(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    every_ms: int = 1000,
) -> DataFrame:
    """Video frame-sampling via ``mapInPandas``: (id, payload) → one row
    PER SAMPLED FRAME (doc_id, frame_idx, frame_ms, frame binary) — the
    row-expanding shape a real keyframe extractor produces.

    Deterministic stand-in geometry: the payload is treated as a 25 fps
    stream of 256-byte frames; every ``every_ms`` the corresponding frame
    slice is emitted. Swap the slicing for ffmpeg keyframe decode when a
    video decoder exists — the schema, the 1→N row expansion, and the
    Arrow batching are the production contract."""
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("frame_ms", T.LongType(), False),
            T.StructField("frame", T.BinaryType(), False),
        ]
    )
    step = max(1, every_ms // _FAKE_FRAME_MS)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, mss, frames = [], [], [], []
            for doc_id, payload in zip(
                pdf[id_col].astype("int64"), pdf[payload_col]
            ):
                payload = payload or b""
                n_frames = len(payload) // _FAKE_FRAME_BYTES
                for i in range(0, n_frames, step):
                    ids.append(doc_id)
                    idxs.append(i)
                    mss.append(i * _FAKE_FRAME_MS)
                    frames.append(
                        payload[i * _FAKE_FRAME_BYTES : (i + 1) * _FAKE_FRAME_BYTES]
                    )
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_ms": pd.Series(mss, dtype="int64"),
                    "frame": pd.Series(frames, dtype=object),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(kernel, out_schema)


def audio_features_plan(df: DataFrame, payload_col: str, sample_rate: int) -> DataFrame:
    """Back-compat alias for :func:`audio_features` (the former stub)."""
    return audio_features(df, payload_col, sample_rate=sample_rate)


def frame_sample_plan(df: DataFrame, payload_col: str, every_ms: int) -> DataFrame:
    """Back-compat alias for :func:`frame_sample` (the former stub)."""
    return frame_sample(df, payload_col, every_ms=every_ms)
