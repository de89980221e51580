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


def attach_media_meta(
    df: DataFrame, payload_col: str, media_type: str, fmt: str | None = None
) -> DataFrame:
    """Wrap a binary column with its metadata struct (cheap, expression-
    only; width/height/duration stay NULL until a decode pass fills them)."""
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


def audio_features_plan(df: DataFrame, payload_col: str, sample_rate: int) -> DataFrame:
    """Audio feature-extraction STUB: real implementation decodes PCM and
    computes spectral features inside mapInPandas (same contract as
    image_features). Raises until an audio decoder (librosa/soundfile)
    exists — the schema is the contract."""
    raise NotImplementedError(
        "audio decoding unavailable in this environment; "
        "plumbing contract: mapInPandas over (id, payload) → "
        "(id, duration_ms long, feat array<float>)"
    )


def frame_sample_plan(df: DataFrame, payload_col: str, every_ms: int) -> DataFrame:
    """Video frame-sampling STUB: real implementation decodes keyframes per
    ``every_ms`` inside mapInPandas (same contract as image_features).
    Raises until a video decoder exists — the schema is the contract."""
    raise NotImplementedError(
        "video decoding unavailable in this environment; "
        "plumbing contract: mapInPandas over (id, payload) → "
        "(id, frame_idx, frame_ms, frame_png binary)"
    )
