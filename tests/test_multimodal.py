"""Multimodal plumbing: metadata struct, mapInPandas feature extraction
with the deterministic fake kernel, and the stub contracts (SURVEY.md
§7.2 step 5 — decoders absent by design in this environment)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_platform_nyc_taxi_spark.operators.multimodal import (
    _fake_image_features,
    attach_media_meta,
    frame_sample_plan,
    image_features,
)


@pytest.fixture
def blobs(spark):
    rows = [
        (1, bytes([10, 20, 30, 40])),
        (2, b""),
        (3, None),
    ]
    return spark.createDataFrame(rows, "doc_id long, payload binary")


def test_attach_media_meta_struct(blobs):
    out = attach_media_meta(blobs, "payload", media_type="image", fmt="png")
    row = out.filter(F.col("doc_id") == 1).select("payload_meta.*").first()
    assert row["media_type"] == "image"
    assert row["format"] == "png"
    assert row["size_bytes"] == 4
    assert row["width"] is None and row["duration_ms"] is None


def test_image_features_deterministic_kernel(blobs):
    out = {r["doc_id"]: r for r in image_features(blobs, dim=2).collect()}
    # payload [10,20,30,40], dim=2: slot0=(10+30)/4, slot1=(20+40)/4
    assert out[1]["size_bytes"] == 4
    assert out[1]["feat"] == [10.0, 15.0]
    # empty and NULL payloads: zero vector, size 0 — never a crash
    assert out[2]["feat"] == [0.0, 0.0] and out[2]["size_bytes"] == 0
    assert out[3]["feat"] == [0.0, 0.0] and out[3]["size_bytes"] == 0


def test_image_features_schema_and_partition_stability(blobs):
    df = image_features(blobs.repartition(3), dim=4)
    assert [f.name for f in df.schema.fields] == ["doc_id", "size_bytes", "feat"]
    assert df.schema["feat"].dataType.simpleString() == "array<float>"
    # kernel is per-row deterministic: partitioning must not change values
    a = sorted(map(repr, df.collect()))
    b = sorted(map(repr, image_features(blobs.coalesce(1), dim=4).collect()))
    assert a == b


def test_fake_kernel_is_pure():
    p = bytes(range(16))
    assert _fake_image_features(p, 8) == _fake_image_features(p, 8)
    assert _fake_image_features(b"", 3) == [0.0, 0.0, 0.0]


def test_frame_sample_rows_and_geometry(spark):
    """1→N row expansion: 25 fake fps, 256-byte pseudo-frames, sampled
    every every_ms; short/empty payloads produce no rows, never a crash."""
    from etl_platform_nyc_taxi_spark.operators.multimodal import frame_sample

    rows = [
        (1, bytes(range(256)) * 50),  # 50 frames -> 2 samples at 1000ms step
        (2, b"tiny"),  # < one frame: no rows
        (3, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = frame_sample(df, every_ms=1000).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == {1}
    # step = 1000ms / 40ms = 25 frames: indices 0 and 25 of 50
    got = sorted((r["frame_idx"], r["frame_ms"]) for r in by_doc[1])
    assert got == [(0, 0), (25, 1000)]
    for r in by_doc[1]:
        assert len(bytes(r["frame"])) == 256


def test_resize_images_kernel(blobs):
    from etl_platform_nyc_taxi_spark.operators.multimodal import resize_images

    out = {r["doc_id"]: r for r in resize_images(blobs, target_bytes=2).collect()}
    # stride = 4//2 = 2: bytes [10,20,30,40] -> [10,30]
    assert bytes(out[1]["resized"]) == bytes([10, 30])
    assert out[1]["orig_bytes"] == 4 and out[1]["resized_bytes"] == 2
    assert bytes(out[2]["resized"]) == b"" and out[3]["resized_bytes"] == 0


def test_audio_features_duration_and_bands(spark):
    """16-bit-PCM stand-in kernel: duration from sample count at the given
    rate; per-band mean |amplitude| features; degenerate payloads -> zeros."""
    import struct

    from etl_platform_nyc_taxi_spark.operators.multimodal import audio_features

    # 16000 samples @ 16 kHz = 1000 ms; constant amplitude 1000
    pcm = struct.pack("<16000h", *([1000] * 16000))
    rows = [(1, pcm), (2, b"x"), (3, None)]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r["doc_id"]: r for r in audio_features(df, bands=4).collect()}
    assert out[1]["duration_ms"] == 1000
    assert out[1]["feat"] == [1000.0] * 4
    assert out[2]["duration_ms"] == 0 and out[2]["feat"] == [0.0] * 4
    assert out[3]["duration_ms"] == 0 and out[3]["feat"] == [0.0] * 4


def test_audio_plan_alias_back_compat(spark):
    from etl_platform_nyc_taxi_spark.operators.multimodal import audio_features_plan

    df = spark.createDataFrame([(1, b"\x00\x01" * 8)], "doc_id long, payload binary")
    out = audio_features_plan(df, "payload", sample_rate=16)
    assert [f.name for f in out.schema.fields] == ["doc_id", "duration_ms", "feat"]


def test_image_feature_near_dup_composition(spark):
    """image_features → embedding_near_dups_lsh end-to-end: identical
    payloads pair at cosine 1.0; clearly different payloads don't."""
    from etl_platform_nyc_taxi_spark.operators.multimodal import image_features
    from etl_platform_nyc_taxi_spark.operators.similarity import (
        embedding_near_dups_lsh,
    )

    rows = [
        (1, bytes(range(200)) * 3),
        (2, bytes(range(200)) * 3),  # exact copy of 1
        (3, bytes([7, 250, 3, 128] * 100)),  # different distribution
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    feats = image_features(df, dim=16).select(
        F.col("doc_id").alias("vec_id"), F.col("feat").alias("embedding")
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in embedding_near_dups_lsh(
            feats, threshold=1.0, num_planes=8, num_tables=4, dim=16
        ).collect()
    }
    assert pairs == {(1, 2): 1.0}


# ---------------------------------------------------------------------------
# Real container-header parsing (sniff_image_header — no decoder libs)
# ---------------------------------------------------------------------------


def _png_bytes(w: int, h: int) -> bytes:
    """A REAL minimal PNG: signature + IHDR(+CRC) + IEND. Any spec-
    compliant reader agrees on these dims."""
    import struct
    import zlib

    ihdr = struct.pack(">II5B", w, h, 8, 0, 0, 0, 0)
    chunk = b"IHDR" + ihdr
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", len(ihdr))
        + chunk
        + struct.pack(">I", zlib.crc32(chunk))
        + struct.pack(">I", 0)
        + b"IEND"
        + struct.pack(">I", zlib.crc32(b"IEND"))
    )


def _jpeg_bytes(w: int, h: int) -> bytes:
    """SOI + APP0(JFIF) + SOF0 prefix — the marker layout every camera
    JPEG starts with; dims live in the SOF0 segment."""
    import struct

    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + b"\x00" * 6
    sof0 = b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, h, w, 1) + b"\x01\x11\x00"
    return b"\xff\xd8" + app0 + sof0


def _gif_bytes(w: int, h: int) -> bytes:
    import struct

    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00\x00\x00"


def test_sniff_image_header_parses_real_containers():
    from etl_platform_nyc_taxi_spark.operators.multimodal import sniff_image_header

    assert sniff_image_header(_png_bytes(640, 480)) == ("png", 640, 480)
    assert sniff_image_header(_jpeg_bytes(1920, 1080)) == ("jpeg", 1920, 1080)
    assert sniff_image_header(_gif_bytes(32, 16)) == ("gif", 32, 16)
    assert sniff_image_header(b"not an image at all") == (None, None, None)
    assert sniff_image_header(b"") == (None, None, None)
    assert sniff_image_header(None) == (None, None, None)
    # Truncated PNG signature-only: format known, dims unknown.
    assert sniff_image_header(b"\x89PNG\r\n\x1a\n\x00\x00") == ("png", None, None)


def test_sniff_image_header_webp_all_three_chunk_layouts():
    """WebP container sniffing (VERDICT r6 task 5: the capability
    ceiling beyond the native decoders must still RECOGNIZE the
    format): VP8X 24-bit canvas dims, VP8L 14-bit packed dims, lossy
    VP8 u16le dims after the 9D 01 2A sync — all per the public spec.
    Decode stays with the PIL fallback; only the byte layout is read."""
    from etl_platform_nyc_taxi_spark.operators.multimodal import sniff_image_header

    def le(v, n):
        return v.to_bytes(n, "little")

    vp8x = (
        b"RIFF" + le(22, 4) + b"WEBP" + b"VP8X" + le(10, 4)
        + b"\x00" * 4 + le(639, 3) + le(479, 3)
    )
    assert sniff_image_header(vp8x) == ("webp", 640, 480)
    bits = (31) | (15 << 14)  # 32x16 - 1, 14-bit packed
    vp8l = (
        b"RIFF" + le(17, 4) + b"WEBP" + b"VP8L" + le(5, 4)
        + b"\x2f" + le(bits, 4)
    )
    assert sniff_image_header(vp8l) == ("webp", 32, 16)
    vp8 = (
        b"RIFF" + le(22, 4) + b"WEBP" + b"VP8 " + le(10, 4)
        + b"\x00" * 3 + b"\x9d\x01\x2a" + le(800, 2) + le(600, 2)
    )
    assert sniff_image_header(vp8) == ("webp", 800, 600)
    # unknown first chunk / truncation: format known, dims unknown
    unk = b"RIFF" + le(20, 4) + b"WEBP" + b"XXXX" + b"\x00" * 8
    assert sniff_image_header(unk) == ("webp", None, None)
    assert sniff_image_header(vp8x[:20]) == ("webp", None, None)
    # lossy chunk without the sync code: no dim guess
    nosync = (
        b"RIFF" + le(22, 4) + b"WEBP" + b"VP8 " + le(10, 4) + b"\x00" * 10
    )
    assert sniff_image_header(nosync) == ("webp", None, None)


def test_attach_media_meta_fills_dims_from_real_headers(spark):
    rows = [
        (1, _png_bytes(640, 480)),
        (2, _jpeg_bytes(1920, 1080)),
        (3, _gif_bytes(32, 16)),
        (4, b"opaque non-image payload"),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = (
        attach_media_meta(df, "payload", media_type="image", fmt="raw")
        .select("doc_id", "payload_meta.*")
        .orderBy("doc_id")
        .collect()
    )
    assert [(r["format"], r["width"], r["height"]) for r in out] == [
        ("png", 640, 480),
        ("jpeg", 1920, 1080),
        ("gif", 32, 16),
        ("raw", None, None),  # unrecognized: caller fmt, NULL dims
        ("raw", None, None),
    ]
    assert out[0]["media_type"] == "image" and out[0]["duration_ms"] is None


def _wav_bytes(seconds: float, rate: int = 8000, channels: int = 1) -> bytes:
    """A REAL wav container via the stdlib wave module (genuine RIFF)."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(b"\x00\x00" * int(rate * seconds) * channels)
    return buf.getvalue()


def test_sniff_audio_header_parses_real_wav():
    from etl_platform_nyc_taxi_spark.operators.multimodal import sniff_audio_header

    assert sniff_audio_header(_wav_bytes(2.0)) == ("wav", 2000)
    assert sniff_audio_header(_wav_bytes(0.5, rate=44100, channels=2)) == ("wav", 500)
    assert sniff_audio_header(b"RIFF\x00\x00\x00\x00WAVE") == ("wav", None)
    assert sniff_audio_header(b"not audio") == (None, None)
    assert sniff_audio_header(None) == (None, None)
    # Ogg capture pattern: format certain, duration honestly unknown
    # (it lives in the LAST page's granule position, past any header
    # probe window) — the decode stays with the soundfile fallback.
    assert sniff_audio_header(b"OggS" + b"\x00" * 60) == ("ogg", None)


def test_sniff_audio_header_from_header_window_only():
    """Duration comes from the DECLARED data size, so a 4 KB prefix of a
    long file still yields the full duration (the serving contract:
    attach_media_meta substrings before the UDF)."""
    from etl_platform_nyc_taxi_spark.operators.multimodal import sniff_audio_header

    full = _wav_bytes(10.0)
    assert sniff_audio_header(full[:4096]) == ("wav", 10000)


def test_attach_media_meta_fills_audio_duration(spark):
    rows = [(1, _wav_bytes(1.5)), (2, b"opaque"), (3, None)]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = (
        attach_media_meta(df, "payload", media_type="audio", fmt="pcm")
        .select("doc_id", "payload_meta.*")
        .orderBy("doc_id")
        .collect()
    )
    assert [(r["format"], r["duration_ms"]) for r in out] == [
        ("wav", 1500),
        ("pcm", None),
        ("pcm", None),
    ]
    assert out[0]["media_type"] == "audio" and out[0]["width"] is None


def _box(typ: bytes, body: bytes) -> bytes:
    import struct

    return struct.pack(">I", 8 + len(body)) + typ + body


def _mp4_bytes(seconds: float, w: int, h: int, timescale: int = 600) -> bytes:
    """A minimal REAL ISO-BMFF layout: ftyp + moov(mvhd v0 + trak(tkhd))."""
    import struct

    mvhd = _box(
        b"mvhd",
        b"\x00\x00\x00\x00"  # version 0 + flags
        + struct.pack(">II", 0, 0)  # ctime, mtime
        + struct.pack(">II", timescale, int(seconds * timescale))
        + b"\x00" * 80,
    )
    # tkhd: version/flags + ctime/mtime/track/reserved/duration... then
    # width/height as 16.16 fixed in the LAST 8 bytes of the box.
    tkhd = _box(
        b"tkhd",
        b"\x00\x00\x00\x07" + b"\x00" * 72 + struct.pack(">II", w << 16, h << 16),
    )
    moov = _box(b"moov", mvhd + _box(b"trak", tkhd))
    ftyp = _box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
    return ftyp + moov


def test_sniff_video_header_parses_real_mp4_layout():
    from etl_platform_nyc_taxi_spark.operators.multimodal import sniff_video_header

    assert sniff_video_header(_mp4_bytes(3.0, 1280, 720)) == ("mp4", 1280, 720, 3000)
    assert sniff_video_header(_mp4_bytes(0.5, 320, 240, timescale=90000)) == (
        "mp4", 320, 240, 500,
    )
    # moov-at-end beyond the probe window: format known, metadata unknown
    ftyp_only = _box(b"ftyp", b"isom\x00\x00\x02\x00isom")
    assert sniff_video_header(ftyp_only) == ("mp4", None, None, None)
    assert sniff_video_header(b"not a video") == (None, None, None, None)
    assert sniff_video_header(None) == (None, None, None, None)


def test_sniff_video_header_mp4_largesize_box():
    """ISO-BMFF size==1 boxes carry a 64-bit largesize after the 4cc;
    the probe must step over them instead of bailing (common for a
    large mdat placed before moov)."""
    from etl_platform_nyc_taxi_spark.operators.multimodal import sniff_video_header

    full = _mp4_bytes(3.0, 1280, 720)
    ftyp, moov = full[: full.index(b"moov") - 4], full[full.index(b"moov") - 4 :]
    mdat_payload = b"\x00" * 32
    largesize = 16 + len(mdat_payload)
    mdat = (
        (1).to_bytes(4, "big") + b"mdat"
        + largesize.to_bytes(8, "big") + mdat_payload
    )
    assert sniff_video_header(ftyp + mdat + moov) == ("mp4", 1280, 720, 3000)
    # truncated largesize header: honest format-only answer
    assert sniff_video_header(ftyp + mdat[:10]) == ("mp4", None, None, None)


def test_attach_media_meta_fills_video_dims_and_duration(spark):
    rows = [(1, _mp4_bytes(2.0, 640, 360)), (2, b"opaque"), (3, None)]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = (
        attach_media_meta(df, "payload", media_type="video", fmt="raw")
        .select("doc_id", "payload_meta.*")
        .orderBy("doc_id")
        .collect()
    )
    assert [(r["format"], r["width"], r["height"], r["duration_ms"]) for r in out] == [
        ("mp4", 640, 360, 2000),
        ("raw", None, None, None),
        ("raw", None, None, None),
    ]


def test_sniff_audio_header_truncated_mid_byte_rate():
    """A payload cut 1-3 bytes into the fmt chunk's byte_rate field must
    report unknown duration, not parse a garbage partial value."""
    from etl_platform_nyc_taxi_spark.operators.multimodal import sniff_audio_header

    full = _wav_bytes(2.0)
    # fmt chunk body starts at offset 20; byte_rate occupies bytes 28-32
    for cut in (29, 30, 31):
        assert sniff_audio_header(full[:cut]) == ("wav", None), cut


# ---------------------------------------------------------------------------
# Round 5: REAL decoding of self-contained formats (no decoder libs)
# ---------------------------------------------------------------------------


def _ppm_bytes(w, h, rgb):
    return b"P6\n# comment\n" + f"{w} {h}\n255\n".encode() + bytes(rgb) * (w * h)


def _bmp_bytes(w, h, bgr):
    """Minimal 24-bit uncompressed bottom-up BMP, rows 4-byte padded."""
    import struct

    stride = (w * 3 + 3) & ~3
    raster = (bytes(bgr) * w + b"\x00" * (stride - w * 3)) * h
    data_off = 54
    header = b"BM" + struct.pack(
        "<IHHI", data_off + len(raster), 0, 0, data_off
    )
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raster), 0, 0, 0, 0)
    return header + dib + raster


def test_decode_image_pixels_ppm_pgm_bmp():
    import numpy as np

    from etl_platform_nyc_taxi_spark.operators.multimodal import (
        decode_image_pixels,
    )

    img = decode_image_pixels(_ppm_bytes(4, 3, (10, 20, 30)))
    assert img.shape == (3, 4, 3)
    assert (img[:, :, 0] == 10).all() and (img[:, :, 2] == 30).all()

    pgm = b"P5\n2 2\n255\n" + bytes([0, 64, 128, 255])
    g = decode_image_pixels(pgm)
    assert g.shape == (2, 2, 1) and g.ravel().tolist() == [0, 64, 128, 255]

    bmp = decode_image_pixels(_bmp_bytes(3, 2, (30, 20, 10)))  # BGR on disk
    assert bmp.shape == (2, 3, 3)
    assert (bmp[:, :, 0] == 10).all() and (bmp[:, :, 2] == 30).all()  # RGB out

    assert decode_image_pixels(b"\x89PNG\r\n\x1a\n" + b"\x00" * 24) is None
    assert decode_image_pixels(b"P6\n4 3\n255\n" + b"\x00" * 5) is None  # short
    assert decode_image_pixels(None) is None
    assert np.asarray(img).dtype == np.uint8


def test_image_features_real_for_decodable_payloads(spark):
    """A solid-color PPM must produce REAL stats (std 0, exact mean, real
    dims) — proof the kernel consumed pixels, not container bytes."""
    from etl_platform_nyc_taxi_spark.operators.multimodal import image_features

    df = spark.createDataFrame(
        [(1, _ppm_bytes(8, 4, (100, 100, 100))), (2, b"not an image")],
        "doc_id long, payload binary",
    )
    out = {r.doc_id: r for r in image_features(df, dim=8).collect()}
    real = out[1].feat
    assert real[0] == 8.0 and real[1] == 4.0 and real[2] == 3.0  # w, h, c
    assert real[3] == 100.0 and real[4] == 0.0                    # mean, std
    fake = out[2].feat  # non-decodable → deterministic fallback, not crash
    assert len(fake) == 8


def test_resize_images_real_thumbnail_roundtrips(spark):
    """Decodable payloads resize for REAL: output is a valid P6 the
    decoder can read back, solid color preserved, byte size near
    target."""
    from etl_platform_nyc_taxi_spark.operators.multimodal import (
        decode_image_pixels,
        resize_images,
    )

    df = spark.createDataFrame(
        [(1, _ppm_bytes(32, 32, (7, 8, 9)))], "doc_id long, payload binary"
    )
    r = resize_images(df, target_bytes=48).collect()[0]
    thumb = decode_image_pixels(bytes(r.resized))
    assert thumb is not None and thumb.shape[2] == 3
    assert (thumb[:, :, 0] == 7).all() and (thumb[:, :, 2] == 9).all()
    assert r.resized_bytes < r.orig_bytes


def test_audio_features_real_wav_rate_and_amplitude(spark):
    """A real 8 kHz WAV must yield duration from the CONTAINER rate (not
    the configured default) and per-band |amplitude| from real samples."""
    import io
    import wave

    import numpy as np

    from etl_platform_nyc_taxi_spark.operators.multimodal import audio_features

    rate, seconds, amp = 8000, 1.0, 1000
    t = np.arange(int(rate * seconds))
    pcm = (amp * np.sign(np.sin(2 * np.pi * 440 * t / rate))).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(pcm.tobytes())
    df = spark.createDataFrame(
        [(1, buf.getvalue())], "doc_id long, payload binary"
    )
    # sample_rate=16k default would halve the duration if the kernel
    # ignored the real container rate
    r = audio_features(df, bands=4).collect()[0]
    assert r.duration_ms == 1000
    assert all(900 <= f <= 1000 for f in r.feat)  # square wave |amp|≈1000


def test_decode_audio_pcm_stereo_and_rejects():
    import io
    import wave

    import numpy as np

    from etl_platform_nyc_taxi_spark.operators.multimodal import decode_audio_pcm

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(4000)
        frames = np.array([100, 300, -100, -300], dtype="<i2")  # 2 frames
        w.writeframes(frames.tobytes())
    pcm, rate = decode_audio_pcm(buf.getvalue())
    assert rate == 4000 and pcm.tolist() == [200, -200]  # mono mean
    assert decode_audio_pcm(b"RIFFxxxxJUNK") is None
    assert decode_audio_pcm(b"") is None


# --- round 6: real PNG decode (stdlib zlib, all 5 scanline filters) ----


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body))
    )


def _encode_png(img, filters):
    """Reference PNG encoder for the round-trip tests: applies the
    requested filter type per scanline (cycling through ``filters``),
    zlib-compresses, assembles IHDR/IDAT/IEND with real CRCs."""
    import struct
    import zlib

    import numpy as np

    h, w, c = img.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    bpp = c
    raw = bytearray()
    prev = np.zeros(w * c, dtype=np.int32)
    for y in range(h):
        row = img[y].reshape(-1).astype(np.int32)
        f = filters[y % len(filters)]
        raw.append(f)
        left = np.concatenate([np.zeros(bpp, np.int32), row[:-bpp]])
        if f == 0:
            enc = row
        elif f == 1:
            enc = (row - left) % 256
        elif f == 2:
            enc = (row - prev) % 256
        elif f == 3:
            enc = (row - (left + prev) // 2) % 256
        else:  # Paeth
            enc = np.zeros_like(row)
            for x in range(len(row)):
                a = row[x - bpp] if x >= bpp else 0
                b = prev[x]
                cc = prev[x - bpp] if x >= bpp else 0
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else b if pb <= pc else cc
                enc[x] = (row[x] - pred) % 256
        raw.extend(int(v) for v in enc)
        prev = row
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
@pytest.mark.parametrize("filters", [[0], [1], [2], [3], [4], [0, 1, 2, 3, 4]])
def test_png_decode_roundtrip_all_filters_and_color_types(channels, filters):
    """Pixel-exact PNG round trip: every scanline filter (None/Sub/Up/
    Average/Paeth) × every supported color type (gray, gray+alpha, RGB,
    RGBA) through the pure-zlib decoder."""
    import numpy as np

    from etl_platform_nyc_taxi_spark.operators.multimodal import (
        decode_image_pixels,
    )

    rng = np.random.default_rng(42 + channels)
    img = rng.integers(0, 256, size=(7, 5, channels), dtype=np.uint8)
    dec = decode_image_pixels(_encode_png(img, filters))
    assert dec is not None and dec.shape == img.shape
    assert np.array_equal(dec, img)


def test_png_decode_multi_idat_and_rejections():
    """IDAT may be split across chunks (decoder must concatenate);
    16-bit, PLTE-less palette, stream-size-mismatched, and truncated
    payloads return None (fall back to the deterministic fake kernel,
    never crash the executor)."""
    import struct
    import zlib

    import numpy as np

    from etl_platform_nyc_taxi_spark.operators.multimodal import (
        decode_image_pixels,
    )

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(4, 4, 3), dtype=np.uint8)
    whole = _encode_png(img, [0])

    # rebuild with the IDAT split in two
    raw = bytearray()
    for y in range(4):
        raw.append(0)
        raw.extend(int(v) for v in img[y].reshape(-1))
    z = zlib.compress(bytes(raw))
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0)
    split = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", z[: len(z) // 2])
        + _png_chunk(b"IDAT", z[len(z) // 2 :])
        + _png_chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_image_pixels(split), img)

    assert decode_image_pixels(whole[:40]) is None  # truncated
    bad = bytearray(whole)
    bad[24] = 16  # claims 16-bit but the stream is 8-bit-sized
    assert decode_image_pixels(bytes(bad)) is None
    bad = bytearray(whole)
    bad[25] = 3  # claims palette but carries no PLTE chunk
    assert decode_image_pixels(bytes(bad)) is None
    bad = bytearray(whole)
    bad[28] = 1  # claims Adam7 but the stream is sequential-sized
    assert decode_image_pixels(bytes(bad)) is None


def test_image_features_uses_real_png_pixels(spark):
    """The mapInPandas feature kernel must route PNG payloads through
    the REAL decoder: a solid-color PNG yields std = 0 and mean = the
    pixel value — the byte-histogram fake cannot produce that (its
    moments include header/deflate bytes)."""
    import numpy as np

    from etl_platform_nyc_taxi_spark.operators.multimodal import image_features

    img = np.full((6, 4, 3), 77, dtype=np.uint8)
    payload = _encode_png(img, [1])  # Sub filter: deflate bytes != pixels
    df = spark.createDataFrame([(1, bytearray(payload))], "doc_id long, payload binary")
    row = image_features(df, dim=8).collect()[0]
    f = [round(float(x), 4) for x in row["feat"]]
    assert f[:5] == [4.0, 6.0, 3.0, 77.0, 0.0]


# --- round 6: real G.711 mu-law / A-law WAV decode ---------------------


def _g711_wav_bytes(fmt_tag: int, codes: bytes, rate: int = 8000, channels: int = 1) -> bytes:
    """Hand-assembled G.711 WAV (format tag 6 = A-law, 7 = mu-law) —
    the stdlib wave module refuses to WRITE these, which is the point."""
    import struct

    fmt = struct.pack(
        "<HHIIHH", fmt_tag, channels, rate, rate * channels, channels, 8
    )
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(codes))
        + codes
        + (b"\x00" if len(codes) % 2 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_g711_tables_match_itu_reference_points():
    """Canonical ITU-T G.711 expansion values: mu-law max ±32124 at
    0x80/0x00, both zeros (0xFF/0x7F); A-law ±8 at 0xD5/0x55 and max
    ±32256 at 0xAA/0x2A; positive mu-law codes strictly decreasing."""
    import numpy as np

    from etl_platform_nyc_taxi_spark.operators.multimodal import (
        _g711_alaw_table,
        _g711_mulaw_table,
    )

    mu, al = _g711_mulaw_table(), _g711_alaw_table()
    assert (mu[0x00], mu[0x80], mu[0xFF], mu[0x7F]) == (-32124, 32124, 0, 0)
    assert (al[0xD5], al[0x55], al[0xAA], al[0x2A]) == (8, -8, 32256, -32256)
    assert bool(np.all(np.diff(mu[0x80:0x100].astype(int)) < 0))


def test_decode_audio_mulaw_and_alaw_wav():
    from etl_platform_nyc_taxi_spark.operators.multimodal import (
        decode_audio_pcm,
    )

    pcm, rate = decode_audio_pcm(_g711_wav_bytes(7, bytes([0x80, 0xFF, 0x00])))
    assert rate == 8000 and pcm.tolist() == [32124, 0, -32124]
    pcm, rate = decode_audio_pcm(
        _g711_wav_bytes(6, bytes([0xAA, 0xD5, 0x55]), rate=16000)
    )
    assert rate == 16000 and pcm.tolist() == [32256, 8, -8]
    # stereo averages to mono
    pcm, rate = decode_audio_pcm(
        _g711_wav_bytes(7, bytes([0x80, 0x00, 0xFF, 0xFF]), channels=2)
    )
    assert pcm.tolist() == [0, 0]  # (32124 + -32124)/2, (0+0)/2


def test_audio_features_uses_real_g711_decode(spark):
    """audio_features must pick up the G.711 rate and REAL samples: a
    mu-law payload of all 0x80 codes (constant +32124) yields per-band
    mean |amplitude| 32124.0 and duration from the container rate —
    the raw-PCM fake would read the same bytes as int16 garbage."""
    from etl_platform_nyc_taxi_spark.operators.multimodal import audio_features

    payload = _g711_wav_bytes(7, bytes([0x80]) * 4000, rate=4000)
    df = spark.createDataFrame(
        [(1, bytearray(payload))], "doc_id long, payload binary"
    )
    row = audio_features(df, sample_rate=999, bands=4).collect()[0]
    assert row["duration_ms"] == 1000  # 4000 samples at the REAL 4000 Hz
    assert [round(float(x), 2) for x in row["feat"]] == [32124.0] * 4


def test_resize_png_roundtrips_as_png_with_alpha(spark):
    """PNG in → PNG out: an RGBA/gray+alpha source thumbnails to a
    decodable PNG with the alpha plane intact (netpbm outputs are
    reserved for the alpha-free raster formats)."""
    import numpy as np

    from etl_platform_nyc_taxi_spark.operators.multimodal import (
        decode_image_pixels,
        resize_images,
    )

    rng = np.random.default_rng(3)
    rgba = rng.integers(0, 256, size=(8, 8, 4), dtype=np.uint8)
    ga = rng.integers(0, 256, size=(8, 8, 2), dtype=np.uint8)
    df = spark.createDataFrame(
        [(1, bytearray(_encode_png(rgba, [0]))), (2, bytearray(_encode_png(ga, [0])))],
        "doc_id long, payload binary",
    )
    out = {r["doc_id"]: bytes(r["resized"]) for r in resize_images(df, target_bytes=48).collect()}
    assert out[1][:8] == b"\x89PNG\r\n\x1a\n"
    dec_rgba = decode_image_pixels(out[1])
    assert dec_rgba is not None and dec_rgba.shape[2] == 4  # alpha kept
    dec_ga = decode_image_pixels(out[2])
    assert dec_ga is not None and dec_ga.shape[2] == 2
    # thumbnail pixels come from the source raster (nearest-neighbor
    # includes the top-left source pixel, all 4 planes)
    assert dec_rgba[0, 0].tolist() == rgba[0, 0].tolist()


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_encode_png_decode_roundtrip(channels):
    """The production encoder (filter-0, stdlib zlib) is the exact
    inverse of the decoder for every accepted shape."""
    import numpy as np

    from etl_platform_nyc_taxi_spark.operators.multimodal import (
        decode_image_pixels,
        encode_png,
    )

    rng = np.random.default_rng(11 + channels)
    img = rng.integers(0, 256, size=(9, 6, channels), dtype=np.uint8)
    dec = decode_image_pixels(encode_png(img))
    assert dec is not None and np.array_equal(dec, img)
    with pytest.raises(ValueError):
        encode_png(img[:, :, 0])  # 2-D input: channel axis required


def test_png_decode_bounds_decompression():
    """Bomb-resistance: an IHDR declaring absurd dims, and a deflate
    stream inflating past the IHDR-promised size, must both return None
    without allocating the full expansion."""
    import struct
    import zlib

    from etl_platform_nyc_taxi_spark.operators.multimodal import (
        decode_image_pixels,
    )

    # IHDR says 100000 x 100000 RGBA (> 512 MiB cap) with a tiny IDAT
    ihdr = struct.pack(">IIBBBBB", 100_000, 100_000, 8, 6, 0, 0, 0)
    bomb = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"\x00" * 1024))
        + _png_chunk(b"IEND", b"")
    )
    assert decode_image_pixels(bomb) is None

    # IHDR says 2x2 gray but the stream inflates to far more
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    over = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"\x00" * 100_000))
        + _png_chunk(b"IEND", b"")
    )
    assert decode_image_pixels(over) is None


def test_image_features_exclude_alpha_plane():
    """A gray+alpha image with opaque alpha must feature identically to
    its pure-gray twin (alpha averaged into luminance would shift a
    black image's histogram to mid-bin)."""
    import numpy as np

    from etl_platform_nyc_taxi_spark.operators.multimodal import (
        _real_image_features,
    )

    gray = np.zeros((4, 4, 1), dtype=np.uint8)
    ga = np.zeros((4, 4, 2), dtype=np.uint8)
    ga[:, :, 1] = 255  # opaque alpha
    f_gray = _real_image_features(gray, 8)
    f_ga = _real_image_features(ga, 8)
    # same moments and histogram; only the channel-count feature differs
    assert f_ga[3:] == f_gray[3:]
    assert (f_gray[2], f_ga[2]) == (1.0, 2.0)


# --- round 6: property-based decoder coverage (no Spark jobs — pure
# kernel properties, so examples are cheap) ---------------------------


def test_png_roundtrip_property():
    """Hypothesis: ANY (h, w, c) uint8 image round-trips pixel-exact
    through encode_png -> decode_image_pixels, and through the
    reference per-filter encoder for every filter type."""
    from hypothesis import given, settings, strategies as st

    import numpy as np

    from etl_platform_nyc_taxi_spark.operators.multimodal import (
        decode_image_pixels,
        encode_png,
    )

    @settings(max_examples=40, deadline=None)
    @given(
        h=st.integers(1, 12),
        w=st.integers(1, 12),
        c=st.sampled_from([1, 2, 3, 4]),
        f=st.sampled_from([0, 1, 2, 3, 4]),
        seed=st.integers(0, 2**31 - 1),
    )
    def prop(h, w, c, f, seed):
        img = np.random.default_rng(seed).integers(
            0, 256, size=(h, w, c), dtype=np.uint8
        )
        assert np.array_equal(decode_image_pixels(encode_png(img)), img)
        assert np.array_equal(
            decode_image_pixels(_encode_png(img, [f])), img
        )

    prop()


def _mulaw_encode_reference(x: int) -> int:
    """Reference linear→µ-law compressor from the G.711 bit layout
    (independent of the decoder's table construction)."""
    BIAS = 0x84
    sign = 0x80 if x < 0 else 0
    mag = min((-x if x < 0 else x) + BIAS, 0x7FFF)
    exp = 7
    mask = 0x4000
    while exp > 0 and not (mag & mask):
        mask >>= 1
        exp -= 1
    mant = (mag >> (exp + 3)) & 0x0F
    return ~(sign | (exp << 4) | mant) & 0xFF


def test_mulaw_encode_decode_quantization_property():
    """Hypothesis: for any int16 sample, decode(encode(x)) lands within
    the segment's quantization step (G.711 µ-law: step 8<<exp), and the
    sign is preserved — proves the decode table against an independent
    compressor, not against its own construction."""
    from hypothesis import given, settings, strategies as st

    from etl_platform_nyc_taxi_spark.operators.multimodal import (
        _g711_mulaw_table,
    )

    table = _g711_mulaw_table()

    @settings(max_examples=200, deadline=None)
    @given(x=st.integers(-32124, 32124))
    def prop(x):
        y = int(table[_mulaw_encode_reference(x)])
        exp = 0
        mag = abs(x) + 0x84
        while mag >= (0x100 << exp) and exp < 7:
            exp += 1
        step = 8 << exp
        assert abs(y - x) <= step, (x, y, step)
        if abs(x) > 8:  # inside the dead zone both zeros are legal
            assert (y >= 0) == (x >= 0)

    prop()


def test_bmp_row_order_bottom_up_and_top_down():
    """Row-distinct raster pins the vertical flip: bottom-up BMPs store
    the LAST image row first (decoder must flip); negative height means
    top-down (no flip). A solid color can't catch this."""
    import struct

    import numpy as np

    from etl_platform_nyc_taxi_spark.operators.multimodal import (
        decode_image_pixels,
    )

    w = 2
    row_red = bytes([0, 0, 255]) * w + b"\x00" * 2  # BGR red, stride pad
    row_blue = bytes([255, 0, 0]) * w + b"\x00" * 2  # BGR blue

    def bmp(h_field, raster):
        header = b"BM" + struct.pack("<IHHI", 54 + len(raster), 0, 0, 54)
        dib = struct.pack(
            "<IiiHHIIiiII", 40, w, h_field, 1, 24, 0, len(raster), 0, 0, 0, 0
        )
        return header + dib + raster

    # bottom-up (h=+2): file stores bottom row first -> decoder flips,
    # so storing [blue, red] yields image rows [red, blue]
    img = decode_image_pixels(bmp(2, row_blue + row_red))
    assert img[0].tolist() == [[255, 0, 0]] * w  # top row red (RGB)
    assert img[1].tolist() == [[0, 0, 255]] * w

    # top-down (h=-2): stored order IS image order
    img = decode_image_pixels(bmp(-2, row_blue + row_red))
    assert img[0].tolist() == [[0, 0, 255]] * w  # top row blue
    assert img[1].tolist() == [[255, 0, 0]] * w
    assert np.asarray(img).flags["C_CONTIGUOUS"]


def _png_file(w, h, depth, color, interlace, raw, plte=None, trns=None):
    import struct
    import zlib

    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, interlace)
    out = b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
    if plte is not None:
        out += _png_chunk(b"PLTE", plte)
    if trns is not None:
        out += _png_chunk(b"tRNS", trns)
    return out + _png_chunk(b"IDAT", zlib.compress(raw)) + _png_chunk(b"IEND", b"")


_ADAM7_PASSES = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def test_png_decode_palette_with_trns_alpha():
    """Color type 3: PLTE lookup, sub-byte packed indices, tRNS alpha
    (padded to 255 for entries beyond the tRNS table)."""
    import numpy as np

    from etl_platform_nyc_taxi_spark.operators.multimodal import (
        decode_image_pixels,
    )

    rng = np.random.default_rng(3)
    pal = rng.integers(0, 256, (7, 3), dtype=np.uint8)
    idx = rng.integers(0, 7, (5, 9)).astype(np.uint8)

    # depth 8, no tRNS → RGB
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(5))
    out = decode_image_pixels(_png_file(9, 5, 8, 3, 0, raw, plte=pal.tobytes()))
    assert np.array_equal(out, pal[idx])

    # depth 4 + short tRNS (3 entries; rest default opaque) → RGBA
    def pack4(row):
        p = np.concatenate([row, np.zeros((-len(row)) % 2, np.uint8)])
        return ((p[0::2] << 4) | p[1::2]).astype(np.uint8).tobytes()

    raw = b"".join(b"\x00" + pack4(idx[y]) for y in range(5))
    trns = bytes([255, 0, 128])
    out = decode_image_pixels(
        _png_file(9, 5, 4, 3, 0, raw, plte=pal.tobytes(), trns=trns)
    )
    assert out.shape == (5, 9, 4)
    assert np.array_equal(out[:, :, :3], pal[idx])
    alut = np.array([255, 0, 128, 255, 255, 255, 255], np.uint8)
    assert np.array_equal(out[:, :, 3], alut[idx])

    # out-of-palette index → None, never crash
    bad_idx = np.full((2, 2), 7, np.uint8)  # palette has 7 entries (0-6)
    raw = b"".join(b"\x00" + bad_idx[y].tobytes() for y in range(2))
    assert decode_image_pixels(_png_file(2, 2, 8, 3, 0, raw, plte=pal.tobytes())) is None


def test_png_decode_subbyte_grayscale():
    """Gray depths 1/2/4 unpack MSB-first and scale to full range
    (×255, ×85, ×17)."""
    import numpy as np

    from etl_platform_nyc_taxi_spark.operators.multimodal import (
        decode_image_pixels,
    )

    rng = np.random.default_rng(4)
    for depth, scale in ((1, 255), (2, 85), (4, 17)):
        g = rng.integers(0, 1 << depth, (6, 11)).astype(np.uint8)
        per = 8 // depth
        rows = []
        for y in range(6):
            p = np.concatenate([g[y], np.zeros((-11) % per, np.uint8)])
            packed = np.zeros(len(p) // per, np.int32)
            for k in range(per):
                packed |= p[k::per].astype(np.int32) << (8 - depth * (k + 1))
            rows.append(b"\x00" + packed.astype(np.uint8).tobytes())
        out = decode_image_pixels(_png_file(11, 6, depth, 0, 0, b"".join(rows)))
        assert out is not None and out.shape == (6, 11, 1), depth
        assert np.array_equal(out[:, :, 0], g * scale), depth


def test_png_decode_adam7_interlaced():
    """Adam7: per-pass scanline filtering (exercised with Up) and the
    7-pass scatter reassemble the sequential image exactly — for RGB,
    RGBA, and sub-byte palette images, including sizes where some
    passes are empty."""
    import numpy as np

    from etl_platform_nyc_taxi_spark.operators.multimodal import (
        decode_image_pixels,
    )

    rng = np.random.default_rng(5)
    for h, w, ch in ((13, 17, 3), (8, 8, 4), (3, 2, 3), (1, 1, 3), (16, 5, 4)):
        img = rng.integers(0, 256, (h, w, ch), dtype=np.uint8)
        parts = []
        for x0, y0, dx, dy in _ADAM7_PASSES:
            sub = img[y0::dy, x0::dx]
            if sub.size == 0:
                continue
            prev = np.zeros(sub.shape[1] * ch, np.int64)
            for y in range(sub.shape[0]):
                row = sub[y].reshape(-1).astype(np.int64)
                parts.append(
                    b"\x02" + ((row - prev) % 256).astype(np.uint8).tobytes()
                )
                prev = row
        color = 2 if ch == 3 else 6
        out = decode_image_pixels(_png_file(w, h, 8, color, 1, b"".join(parts)))
        assert out is not None and np.array_equal(out, img), (h, w, ch)

    # interlaced depth-2 palette
    pal = rng.integers(0, 256, (4, 3), dtype=np.uint8)
    idx = rng.integers(0, 4, (9, 9)).astype(np.uint8)

    def pack2(row):
        p = np.concatenate([row, np.zeros((-len(row)) % 4, np.uint8)])
        return (
            (p[0::4] << 6) | (p[1::4] << 4) | (p[2::4] << 2) | p[3::4]
        ).astype(np.uint8).tobytes()

    parts = []
    for x0, y0, dx, dy in _ADAM7_PASSES:
        sub = idx[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        for y in range(sub.shape[0]):
            parts.append(b"\x00" + pack2(sub[y]))
    out = decode_image_pixels(
        _png_file(9, 9, 2, 3, 1, b"".join(parts), plte=pal.tobytes())
    )
    assert np.array_equal(out, pal[idx])


def test_png_new_paths_never_crash_on_garbage():
    import numpy as np

    from etl_platform_nyc_taxi_spark.operators.multimodal import (
        decode_image_pixels,
    )

    rng = np.random.default_rng(6)
    pal = rng.integers(0, 256, (4, 3), dtype=np.uint8)
    idx = rng.integers(0, 4, (9, 9)).astype(np.uint8)
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(9))
    payload = _png_file(9, 9, 8, 3, 0, raw, plte=pal.tobytes(), trns=b"\x80")
    for cut in range(len(payload)):
        decode_image_pixels(payload[:cut])
    for _ in range(400):
        b = bytearray(payload)
        for _ in range(int(rng.integers(1, 5))):
            b[int(rng.integers(0, len(b)))] = int(rng.integers(0, 256))
        decode_image_pixels(bytes(b))


def test_png_decode_16bit_high_byte_downscale():
    """16-bit samples decode by keeping the high byte (v >> 8) — for
    gray, RGB, and RGBA, with per-pass filtering intact (Up filter)."""
    import numpy as np

    from etl_platform_nyc_taxi_spark.operators.multimodal import (
        decode_image_pixels,
    )

    rng = np.random.default_rng(8)
    for ch, color in ((1, 0), (3, 2), (4, 6)):
        img16 = rng.integers(0, 65536, (6, 9, ch), dtype=np.uint16)
        raw = bytearray()
        prev = np.zeros(9 * ch * 2, np.int64)
        for y in range(6):
            row = (
                img16[y].reshape(-1).astype(">u2").view(np.uint8).astype(np.int64)
            )
            raw += b"\x02" + ((row - prev) % 256).astype(np.uint8).tobytes()
            prev = row
        out = decode_image_pixels(_png_file(9, 6, 16, color, 0, bytes(raw)))
        assert out is not None and out.shape == (6, 9, ch), (ch, color)
        assert np.array_equal(out, (img16 >> 8).astype(np.uint8)), (ch, color)


# ---------------------------------------------------------------------------
# MP3 / OGG header walk (VERDICT r8 task 3 — metadata without PCM decode)
# ---------------------------------------------------------------------------


def _mp3_frame_bytes(pad: bool = False) -> bytearray:
    """One MPEG1 Layer III 44.1 kHz 128 kbps stereo frame (header + zero
    body). Frame length 144*128000/44100 (+padding) = 417/418 bytes."""
    b2 = 0x90 | (0x02 if pad else 0x00)
    frame_len = 144 * 128000 // 44100 + (1 if pad else 0)
    fr = bytearray([0xFF, 0xFB, b2, 0x00]) + bytearray(frame_len - 4)
    return fr


def test_mp3_xing_frame_count_duration():
    """Xing tag in the first frame (offset 4 + 32-byte MPEG1-stereo side
    info) carries the total frame count: duration is exact from the
    header window alone — 1000 frames * 1152 / 44100 = 26122 ms."""
    from etl_platform_nyc_taxi_spark.operators.multimodal import (
        mp3_stream_info,
        sniff_audio_header,
    )

    fr = _mp3_frame_bytes()
    fr[36:40] = b"Xing"
    fr[40:44] = (0x1).to_bytes(4, "big")
    fr[44:48] = (1000).to_bytes(4, "big")
    payload = bytes(fr)
    assert mp3_stream_info(payload) == ("mp3", 1000 * 1152 * 1000 // 44100)
    # reachable through the generic sniffer too
    assert sniff_audio_header(payload) == ("mp3", 26122)


def test_mp3_cbr_two_frame_validation_and_size_duration():
    """No Xing tag: recognition demands a SECOND valid header one frame
    length later (anti-false-positive), and duration needs total_size —
    CBR arithmetic (bytes*8/bitrate)."""
    from etl_platform_nyc_taxi_spark.operators.multimodal import (
        mp3_stream_info,
    )

    two = bytes(_mp3_frame_bytes() + _mp3_frame_bytes())
    assert mp3_stream_info(two) == ("mp3", None)
    # 10 s of 128 kbps CBR = 160000 bytes
    assert mp3_stream_info(two, total_size=160_000) == ("mp3", 10_000)
    # a single frame with garbage after it is NOT recognized
    one = bytes(_mp3_frame_bytes()) + b"\x00" * 500
    assert mp3_stream_info(one) == (None, None)


def test_mp3_id3v2_prefix_skipped_via_syncsafe_size():
    from etl_platform_nyc_taxi_spark.operators.multimodal import (
        mp3_stream_info,
    )

    fr = _mp3_frame_bytes()
    fr[36:40] = b"Xing"
    fr[40:44] = (0x1).to_bytes(4, "big")
    fr[44:48] = (441).to_bytes(4, "big")  # 441*1152/44100 = 11520 ms
    id3 = b"ID3\x04\x00\x00" + bytes([0, 0, 0, 100]) + bytes(100)
    assert mp3_stream_info(id3 + bytes(fr)) == ("mp3", 441 * 1152 * 1000 // 44100)


def test_mp3_rejects_text_and_random_binary():
    """UTF-8 text can never contain the 0xFF sync byte; sync-looking
    binary without a consecutive second frame is rejected."""
    from etl_platform_nyc_taxi_spark.operators.multimodal import (
        mp3_stream_info,
    )

    assert mp3_stream_info("plain text document".encode()) == (None, None)
    assert mp3_stream_info(b"\xff\xfb\x90\x00" + b"junk" * 10) == (None, None)


def _ogg_page(htype: int, granule: int, packet: bytes) -> bytes:
    head = (
        b"OggS"
        + bytes([0, htype])
        + granule.to_bytes(8, "little")
        + (7).to_bytes(4, "little")  # serial
        + (0).to_bytes(4, "little")  # seqno
        + (0).to_bytes(4, "little")  # crc (not validated by the walk)
        + bytes([1, len(packet)])  # one segment
    )
    return head + packet


def test_ogg_vorbis_granule_duration():
    """First page's Vorbis ID header gives the rate; the LAST page's
    granule position over that rate is the duration."""
    from etl_platform_nyc_taxi_spark.operators.multimodal import (
        ogg_duration_ms,
        sniff_audio_header,
    )

    ident = b"\x01vorbis" + (0).to_bytes(4, "little") + bytes([2]) + (
        44100
    ).to_bytes(4, "little") + bytes(9)
    first = _ogg_page(0x02, 0, ident)
    last = _ogg_page(0x04, 441_000, b"\x00" * 4)
    whole = first + b"\x00" * 64 + last
    assert ogg_duration_ms(whole) == 10_000  # tail defaults to head
    assert ogg_duration_ms(first, tail=last) == 10_000
    assert sniff_audio_header(whole) == ("ogg", 10_000)
    assert sniff_audio_header(first, tail=last) == ("ogg", 10_000)


def test_ogg_opus_preskip_subtracted_at_48k():
    from etl_platform_nyc_taxi_spark.operators.multimodal import (
        ogg_duration_ms,
    )

    ident = b"OpusHead" + bytes([1, 2]) + (312).to_bytes(2, "little") + (
        48000
    ).to_bytes(4, "little") + bytes(3)
    first = _ogg_page(0x02, 0, ident)
    last = _ogg_page(0x04, 96_312, b"\x00" * 4)
    assert ogg_duration_ms(first + last) == 2_000


def test_ogg_unset_granule_pages_are_skipped():
    """granule -1 marks 'no packet finishes on this page' — the walk
    must step back to the previous page instead of computing from -1."""
    from etl_platform_nyc_taxi_spark.operators.multimodal import (
        ogg_duration_ms,
    )

    ident = b"\x01vorbis" + (0).to_bytes(4, "little") + bytes([2]) + (
        44100
    ).to_bytes(4, "little") + bytes(9)
    first = _ogg_page(0x02, 0, ident)
    good = _ogg_page(0x00, 220_500, b"\x00" * 4)
    unset = _ogg_page(0x01, (1 << 64) - 1, b"\x00" * 4)
    assert ogg_duration_ms(first + good + unset) == 5_000
    # unknown codec: rate unreadable -> None
    assert ogg_duration_ms(_ogg_page(0x02, 0, b"\x05weird")) is None


# --- round 10: MP3 duration hardening (VERDICT r9 task 4 + advisor) --


def test_mp3_id3_tag_larger_than_window_still_recognized():
    """Advisor r9: real MP3s commonly carry 10-100 KB ID3 cover-art
    tags against a 4 KB sniff window. A well-formed ID3 header whose
    syncsafe size points past the window is strong format evidence:
    ('mp3', None), not a silent (None, None)."""
    from etl_platform_nyc_taxi_spark.operators.multimodal import (
        mp3_stream_info,
        sniff_audio_header,
    )

    # declares a 50000-byte tag; only 4 KB of it is in the window
    sz = 50_000
    id3 = b"ID3\x04\x00\x00" + bytes(
        [(sz >> 21) & 0x7F, (sz >> 14) & 0x7F, (sz >> 7) & 0x7F, sz & 0x7F]
    )
    window = (id3 + bytes(4096))[:4096]
    assert mp3_stream_info(window) == ("mp3", None)
    assert sniff_audio_header(window, total_size=300_000) == ("mp3", None)
    # malformed syncsafe size (high bit set) is NOT evidence
    bad = b"ID3\x04\x00\x00" + b"\xff\x00\x00\x00" + bytes(4086)
    assert mp3_stream_info(bad) == (None, None)


def _free_frame_bytes(frame_len: int = 417) -> bytes:
    """One MPEG1 Layer III 44.1 kHz FREE-FORMAT frame (bitrate index
    0): header + zero body, size chosen by the caller (free-format
    size is measured, not declared)."""
    return bytes([0xFF, 0xFB, 0x00, 0x00]) + bytes(frame_len - 4)


def test_mp3_free_format_frames_measured_and_priced():
    """ISO 11172-3 bitrate index 0 (free format): frame size comes
    from the distance between matching syncs, bitrate is backed out of
    it, and CBR duration prices total_size with that bitrate."""
    from etl_platform_nyc_taxi_spark.operators.multimodal import (
        mp3_stream_info,
    )

    payload = _free_frame_bytes() * 3
    bitrate = 417 * 8 * 44100 // 1152  # 127706 bps
    assert mp3_stream_info(payload) == ("mp3", None)
    assert mp3_stream_info(payload, total_size=160_000) == (
        "mp3",
        160_000 * 8 * 1000 // bitrate,
    )
    # two matching syncs but a MISSING third (window reaches that far):
    # not accepted — arbitrary binary with repeated 0xFF FB 00 pairs
    # spaced differently must fall through
    two_then_junk = _free_frame_bytes() * 2 + bytes(600)
    assert mp3_stream_info(two_then_junk) == (None, None)
    # a lone free-format header followed by garbage is rejected
    assert mp3_stream_info(_free_frame_bytes()[:4] + b"junk" * 200) == (
        None,
        None,
    )


def test_mp3_stream_info_totality_fuzz():
    """Hypothesis totality: mp3_stream_info never raises and returns a
    well-typed pair on ANY byte string — including 0xFF-dense windows
    that stress the free-format scan."""
    from hypothesis import given, settings, strategies as st

    from etl_platform_nyc_taxi_spark.operators.multimodal import (
        mp3_stream_info,
    )

    @settings(max_examples=120, deadline=None)
    @given(
        payload=st.one_of(
            st.binary(max_size=512),
            st.builds(
                lambda pre, n: pre + b"\xff\xfb\x00\x00" * n,
                st.binary(max_size=16),
                st.integers(0, 128),
            ),
            st.builds(
                lambda sz, body: b"ID3\x04\x00\x00"
                + bytes(
                    [
                        (sz >> 21) & 0x7F,
                        (sz >> 14) & 0x7F,
                        (sz >> 7) & 0x7F,
                        sz & 0x7F,
                    ]
                )
                + body,
                st.integers(0, 1 << 28),
                st.binary(max_size=256),
            ),
        ),
        total=st.one_of(st.none(), st.integers(0, 1 << 40)),
    )
    def prop(payload, total):
        fmt, dur = mp3_stream_info(payload, total_size=total)
        assert fmt in (None, "mp3")
        assert dur is None or (isinstance(dur, int) and dur >= 0)
        assert not (fmt is None and dur is not None)

    prop()


def test_ogg_coincidental_oggs_in_payload_is_not_a_page():
    """Advisor r9: compressed payload bytes can coincidentally spell
    'OggS'. The backward scan must reject candidates whose
    stream-structure version byte is nonzero or whose header-type
    flags exceed the 3-bit range, and keep scanning to the REAL page."""
    from etl_platform_nyc_taxi_spark.operators.multimodal import (
        ogg_duration_ms,
    )

    ident = b"\x01vorbis" + (0).to_bytes(4, "little") + bytes([2]) + (
        44100
    ).to_bytes(4, "little") + bytes(9)
    first = _ogg_page(0x02, 0, ident)
    real_last = _ogg_page(0x04, 441_000, b"\x00" * 4)
    # fake 'OggS' deeper in the tail with an invalid version byte and a
    # huge bogus granule — previously read as 4-hour duration
    fake = b"OggS" + bytes([9, 0]) + (10**12).to_bytes(8, "little") + bytes(8)
    fake2 = b"OggS" + bytes([0, 0x55]) + (10**12).to_bytes(8, "little") + bytes(8)
    assert ogg_duration_ms(first + real_last + b"\x00" * 8 + fake) == 10_000
    assert ogg_duration_ms(first + real_last + b"\x00" * 8 + fake2) == 10_000
    # only fakes in the tail: honestly unknown
    assert ogg_duration_ms(first, tail=fake + fake2) is None


def test_attach_media_meta_skips_large_id3_scan_side(spark):
    """Advisor r9: attach_media_meta's 4 KB head window must start
    AFTER the ID3v2 tag, so a 10 KB cover-art tag does not blind the
    sync walk — and total_size must shrink by the tag so CBR duration
    prices audio bytes only."""
    from etl_platform_nyc_taxi_spark.operators.multimodal import (
        attach_media_meta,
    )

    fr = bytearray(_mp3_frame_bytes())
    fr[36:40] = b"Xing"
    fr[40:44] = (0x1).to_bytes(4, "big")
    fr[44:48] = (441).to_bytes(4, "big")  # 11520 ms
    tag_body = 10_000
    id3 = b"ID3\x04\x00\x00" + bytes(
        [
            (tag_body >> 21) & 0x7F,
            (tag_body >> 14) & 0x7F,
            (tag_body >> 7) & 0x7F,
            tag_body & 0x7F,
        ]
    ) + bytes(tag_body)
    tagged = id3 + bytes(fr)
    # CBR sibling (no Xing): duration must use size MINUS the tag
    cbr = id3 + bytes(_mp3_frame_bytes() + _mp3_frame_bytes()) + bytes(
        160_000 - 2 * len(_mp3_frame_bytes())
    )
    df = spark.createDataFrame(
        [(1, bytearray(tagged)), (2, bytearray(cbr))], "id int, payload binary"
    )
    out = {
        r["id"]: (
            r["payload_meta"]["format"],
            r["payload_meta"]["duration_ms"],
            r["payload_meta"]["size_bytes"],
        )
        for r in attach_media_meta(df, "payload", media_type="audio").collect()
    }
    assert out[1] == ("mp3", 441 * 1152 * 1000 // 44100, len(tagged))
    assert out[2] == ("mp3", 10_000, len(cbr))  # 160000 B at 128 kbps
