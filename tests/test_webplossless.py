"""VP8L (lossless WebP) codec tests — round-trips through every
encoder-reachable branch plus hand-crafted bitstreams for the
decoder-only transform paths (predictor, cross-channel color
transform) with independently computed forward residuals."""

from __future__ import annotations

import numpy as np
import pytest

from etl_platform_nyc_taxi_spark.operators.webplossless import (
    _BitWriter,
    _encode_literal_stream,
    _lz77_encode,
    _lz77_value,
    _BitReader,
    _color_transform_delta,
    _plane_code_to_distance,
    _predict,
    decode_vp8l,
    decode_webp,
    encode_vp8l,
)


def _rt(img, **kwargs):
    out = decode_webp(encode_vp8l(img, **kwargs))
    assert out is not None
    assert out.shape == img.shape
    assert (out == img).all()
    return out


def test_roundtrip_literals_and_variants():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (13, 17, 3), dtype=np.uint8)
    _rt(img)
    _rt(img, subtract_green=True)
    _rt(img, use_lz77_runs=True)
    _rt(img, use_max_symbol=True)


def test_roundtrip_alpha_and_channel_folding():
    rng = np.random.default_rng(8)
    rgba = rng.integers(0, 256, (9, 11, 4), dtype=np.uint8)
    _rt(rgba)
    # fully-opaque RGBA folds to RGB on decode
    opaque = rgba.copy()
    opaque[:, :, 3] = 255
    out = decode_webp(encode_vp8l(opaque))
    assert out.shape == (9, 11, 3)
    assert (out == opaque[:, :, :3]).all()


def test_roundtrip_lz77_runs_and_degenerate_sizes():
    rng = np.random.default_rng(9)
    runs = np.repeat(rng.integers(0, 256, (5, 4, 3), dtype=np.uint8), 8, axis=1)
    _rt(runs, use_lz77_runs=True)
    _rt(np.full((6, 6, 3), 42, np.uint8))  # single-symbol trees
    _rt(np.array([[[7, 8, 9]]], np.uint8))  # 1x1


def test_roundtrip_palette_all_bundlings():
    rng = np.random.default_rng(10)
    # 3 colors -> 4 px/byte; 2 colors -> 8 px/byte; 20 colors -> none
    three = np.array(
        [[(255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 0, 0)] * 5] * 7,
        dtype=np.uint8,
    )
    _rt(three, use_palette=True)
    two = np.array([[(0, 0, 0), (255, 255, 255)] * 8] * 3, np.uint8)
    _rt(two, use_palette=True)
    many = np.array(
        [[(i * 13 % 256, i * 7 % 256, i * 3 % 256) for i in range(20)]] * 4,
        dtype=np.uint8,
    )
    _rt(many, use_palette=True)
    odd = np.array([[(0, 0, 0), (255, 255, 255), (0, 0, 0)]] * 2, np.uint8)
    _rt(odd, use_palette=True)  # width not a multiple of pixels/byte
    # 17 distinct colors: 2 px/byte bundling boundary is 16, so none
    b17 = np.array([[(i * 5, i * 5, i * 5) for i in range(17)]] * 3, np.uint8)
    _rt(b17, use_palette=True)


def test_roundtrip_color_cache_and_meta_groups():
    rng = np.random.default_rng(11)
    small = rng.integers(0, 6, (12, 15, 3), dtype=np.uint8) * 40
    _rt(small, cache_bits=4)
    _rt(small, cache_bits=7)
    _rt(small, cache_bits=2, use_lz77_runs=True)  # cache insert on copies
    _rt(small, meta_bits=2)
    _rt(small, meta_bits=3, cache_bits=4)
    # meta groups with genuinely different statistics: a wrong tile
    # lookup would decode through the wrong tree and mismatch
    grad = np.zeros((16, 16, 3), np.uint8)
    grad[:, :8] = 10
    grad[:, 8:] = 200
    grad += rng.integers(0, 3, grad.shape, dtype=np.uint8)
    _rt(grad, meta_bits=3)


def test_lz77_prefix_coding_inverse():
    bw = _BitWriter()
    for v in [1, 2, 3, 4, 5, 6, 7, 8, 9, 100, 1000, 4096]:
        code, eb, ev = _lz77_encode(v)
        bw2 = _BitWriter()
        bw2.bits(ev, eb)
        br = _BitReader(bw2.done() or b"\x00")
        assert _lz77_value(br, code) == v


def test_plane_code_distance_map():
    # plane code 1 = pixel directly above; 2 = directly left;
    # > 120 = linear distance
    assert _plane_code_to_distance(50, 1) == 50
    assert _plane_code_to_distance(50, 2) == 1
    assert _plane_code_to_distance(50, 121) == 1
    assert _plane_code_to_distance(50, 200) == 80
    # map never yields < 1
    assert all(
        _plane_code_to_distance(3, pc) >= 1 for pc in range(1, 121)
    )


def test_predictor_modes_hand_computed():
    left = (255, 100, 0, 0)
    top = (255, 0, 100, 0)
    tl = (255, 90, 90, 0)
    tr = (255, 10, 20, 30)
    assert _predict(0, left, top, tl, tr) == (255, 0, 0, 0)
    assert _predict(1, left, top, tl, tr) == left
    assert _predict(7, left, top, tl, tr) == (255, 50, 50, 0)
    # ClampAddSubtractFull: clamp(L + T - TL)
    assert _predict(12, left, top, tl, tr) == (255, 10, 10, 0)
    # ClampAddSubtractHalf: ave=(255,50,50,0), d=ave-TL=(0,-40,-40,0),
    # C-truncating /2 = (0,-20,-20,0) -> (255,30,30,0)
    assert _predict(13, left, top, tl, tr) == (255, 30, 30, 0)
    # Select: sum|L-TL| - sum|T-TL| = (10+90) - (90+10) = 0 -> top
    assert _predict(11, left, top, tl, tr) == top


def test_predictor_mode13_truncates_toward_zero():
    """Spec/libwebp ClampAddSubtractHalf uses C division (a-b)/2 which
    truncates toward zero; an arithmetic >>1 floors and decodes one too
    low on negative ODD deltas. ave=(10)=((7+13)>>1), TL=13: d=-3,
    trunc(-3/2)=-1 -> 9 (a >>1 would give 10+(-2)=8)."""
    left = (0, 7, 7, 7)
    top = (0, 13, 13, 13)
    tl = (0, 13, 13, 13)
    assert _predict(13, left, top, tl, (0, 0, 0, 0)) == (0, 9, 9, 9)


def test_color_transform_delta_signed():
    # t=0x40 (+64): delta = (64 * c_signed) >> 5 = 2 * c_signed
    assert _color_transform_delta(0x40, 10) == 20
    assert _color_transform_delta(0x40, 250) == -12  # c = -6 signed
    # t=0xC0 (-64): delta = -2 * c_signed
    assert _color_transform_delta(0xC0, 10) == -20


def _wrap_vp8l(payload: bytes) -> bytes:
    chunk = b"VP8L" + len(payload).to_bytes(4, "little") + payload
    if len(payload) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + len(riff).to_bytes(4, "little") + riff


def _forward_predict(img_argb: np.ndarray, modes: np.ndarray, bits: int):
    """Independent forward predictor (encoder side) producing the
    residual stream the decoder must invert back to img_argb."""
    h, w, _ = img_argb.shape
    flat = [
        tuple(int(v) for v in row)
        for row in img_argb.astype(np.int32).reshape(-1, 4)
    ]
    res = np.zeros((h * w, 4), np.int32)
    for y in range(h):
        for x in range(w):
            i = y * w + x
            if x == 0 and y == 0:
                pred = (255, 0, 0, 0)
            elif y == 0:
                pred = flat[i - 1]
            elif x == 0:
                pred = flat[i - w]
            else:
                mode = int(modes[y >> bits, x >> bits])
                pred = _predict(
                    mode, flat[i - 1], flat[i - w], flat[i - w - 1],
                    flat[i - w + 1],
                )
            res[i] = [
                (pv - qv) & 0xFF for pv, qv in zip(flat[i], pred)
            ]
    return res.reshape(h, w, 4)


def test_predictor_transform_stream():
    """Hand-crafted bitstream with a predictor transform: 8x8 image,
    4x4 blocks, four different modes; residuals computed by the
    test-side forward pass."""
    rng = np.random.default_rng(21)
    rgb = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    argb = np.concatenate(
        [np.full((8, 8, 1), 255, np.uint8), rgb], axis=2
    ).astype(np.int32)
    bits = 2
    modes = np.array([[1, 2], [11, 12]], np.int32)
    residual = _forward_predict(argb, modes, bits)

    bw = _BitWriter()
    bw.bits(0x2F, 8)
    bw.bits(7, 14)
    bw.bits(7, 14)
    bw.bit(0)
    bw.bits(0, 3)
    bw.bit(1)  # transform present
    bw.bits(0, 2)  # predictor
    bw.bits(bits - 2, 3)
    sub = np.zeros((2, 2, 4), np.int32)
    sub[:, :, 0] = 255
    sub[:, :, 2] = modes  # mode lives in green
    _encode_literal_stream(bw, sub, level0=False)
    bw.bit(0)  # end transforms
    _encode_literal_stream(bw, residual)
    out = decode_vp8l(bw.done())
    assert out.shape == (8, 8, 3)
    assert (out == rgb).all()


def test_predictor_transform_all_modes_random_map():
    """All 14 predictor modes under a random 8x8-block mode map over a
    64x64 random image — the full sequential inverse must reproduce the
    source exactly (catches any mode formula or edge-rule slip)."""
    rng = np.random.default_rng(33)
    h = w = 64
    bits = 3
    rgb = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    argb = np.concatenate(
        [np.full((h, w, 1), 255, np.uint8), rgb], axis=2
    ).astype(np.int32)
    modes = rng.integers(0, 14, (h >> bits, w >> bits), dtype=np.int32)
    residual = _forward_predict(argb, modes, bits)
    bw = _BitWriter()
    bw.bits(0x2F, 8)
    bw.bits(w - 1, 14)
    bw.bits(h - 1, 14)
    bw.bit(0)
    bw.bits(0, 3)
    bw.bit(1)
    bw.bits(0, 2)
    bw.bits(bits - 2, 3)
    sub = np.zeros((h >> bits, w >> bits, 4), np.int32)
    sub[:, :, 0] = 255
    sub[:, :, 2] = modes
    _encode_literal_stream(bw, sub, level0=False)
    bw.bit(0)
    _encode_literal_stream(bw, residual)
    out = decode_vp8l(bw.done())
    assert out.shape == (h, w, 3)
    assert (out == rgb).all()


def test_color_transform_stream():
    """Hand-crafted bitstream with a cross-channel color transform:
    known multipliers, residuals from the independent forward form."""
    rng = np.random.default_rng(22)
    rgb = rng.integers(0, 256, (4, 4, 3), dtype=np.uint8)
    bits = 2  # one 4x4 block
    g2r, g2b, r2b = 0x40, 0x20, 0xC0

    def fwd(px):
        r, g, b = (int(v) for v in px)
        tr = (r - _color_transform_delta(g2r, g)) & 0xFF
        tb = (
            b
            - _color_transform_delta(g2b, g)
            - _color_transform_delta(r2b, r)
        ) & 0xFF
        return r, g, b, tr, tb

    residual = np.zeros((4, 4, 4), np.int32)
    residual[:, :, 0] = 255
    for y in range(4):
        for x in range(4):
            r, g, b, tr, tb = fwd(rgb[y, x])
            residual[y, x, 1] = tr
            residual[y, x, 2] = g
            residual[y, x, 3] = tb

    bw = _BitWriter()
    bw.bits(0x2F, 8)
    bw.bits(3, 14)
    bw.bits(3, 14)
    bw.bit(0)
    bw.bits(0, 3)
    bw.bit(1)
    bw.bits(1, 2)  # color transform
    bw.bits(bits - 2, 3)
    sub = np.zeros((1, 1, 4), np.int32)
    sub[0, 0] = (255, r2b, g2b, g2r)  # A=255, R=r2b, G=g2b, B=g2r
    _encode_literal_stream(bw, sub, level0=False)
    bw.bit(0)
    _encode_literal_stream(bw, residual)
    out = decode_vp8l(bw.done())
    assert out.shape == (4, 4, 3)
    assert (out == rgb).all()


def test_decode_webp_container_walk_and_rejects():
    img = np.full((3, 3, 3), 9, np.uint8)
    good = encode_vp8l(img)
    assert (decode_webp(good) == img).all()
    # unknown leading chunk before VP8L is skipped
    i = good.index(b"VP8L")
    junk = b"XTRA" + (4).to_bytes(4, "little") + b"\x00" * 4
    spliced = (
        good[:4]
        + (len(good) - 8 + len(junk)).to_bytes(4, "little")
        + good[8:12]
        + junk
        + good[12:]
    )
    assert (decode_webp(spliced) == img).all()
    # lossy VP8 and garbage return None (fallback path keeps them)
    lossy = b"RIFF" + (20).to_bytes(4, "little") + b"WEBP" + b"VP8 " + (8).to_bytes(4, "little") + b"\x00" * 8
    assert decode_webp(lossy) is None
    assert decode_webp(b"not webp") is None
    assert decode_webp(None) is None
    # truncated VP8L payload -> None, not an exception
    assert decode_webp(good[: i + 12]) is None


def test_webp_through_production_kernels(spark):
    """Lossless WebP payloads flow through the REAL decode path of the
    production mapInPandas kernels: image_features yields true
    width/height/channels/mean/std (not the byte-histogram fake), and
    resize_images re-encodes WebP-in → WebP-out losslessly."""
    from etl_platform_nyc_taxi_spark.operators.multimodal import (
        decode_image_pixels,
        image_features,
        resize_images,
    )

    img = np.full((6, 10, 3), 77, np.uint8)
    payload = encode_vp8l(img)
    assert (decode_image_pixels(payload) == img).all()
    df = spark.createDataFrame(
        [(1, bytearray(payload))], "doc_id long, payload binary"
    )
    row = image_features(df, dim=8).first()
    assert row["feat"][:5] == [10.0, 6.0, 3.0, 77.0, 0.0]  # w,h,c,mean,std
    rrow = resize_images(df, target_bytes=48).first()
    resized = bytes(rrow["resized"])
    assert resized[:4] == b"RIFF" and resized[8:12] == b"WEBP"
    thumb = decode_webp(resized)
    assert thumb is not None and (thumb == 77).all()  # lossless thumb


def test_fuzz_mutations_never_crash():
    """Byte-mutated valid payloads must decode, return None, or raise
    ValueError — never IndexError/OverflowError/hangs (same fuzz
    contract as the GIF/JPEG/FLAC codecs). Found in r7: simple-form
    prefix codes with out-of-alphabet symbols."""
    for seed, kwargs in [
        (3, dict(use_lz77_runs=True, cache_bits=3)),
        (5, dict(use_palette=True)),
        (9, dict(meta_bits=2)),
    ]:
        rng = np.random.default_rng(seed)
        img = rng.integers(0, 5, (10, 12, 3), dtype=np.uint8) * 50
        base = bytearray(encode_vp8l(img, **kwargs))
        for trial in range(400):
            b = bytearray(base)
            r = np.random.default_rng(trial * 17 + seed)
            for _ in range(int(r.integers(1, 5))):
                b[int(r.integers(12, len(b)))] = int(r.integers(0, 256))
            try:
                decode_webp(bytes(b))
            except ValueError:
                pass  # the only sanctioned failure mode


def test_decode_rejects_bad_streams():
    with pytest.raises(ValueError):
        decode_vp8l(b"\x00\x00\x00\x00")  # bad signature
    # version != 0
    bw = _BitWriter()
    bw.bits(0x2F, 8)
    bw.bits(0, 14)
    bw.bits(0, 14)
    bw.bit(0)
    bw.bits(5, 3)
    with pytest.raises(ValueError):
        decode_vp8l(bw.done())


def test_decode_rejects_oversized_dims_before_allocating():
    """ADVICE r7: a tiny payload whose 14-bit header fields claim
    16384x16384 must fail BEFORE the (n,4) allocation / pixel loop."""
    from etl_platform_nyc_taxi_spark.operators import webplossless as wl

    bw = wl._BitWriter()
    bw.bits(0x2F, 8)
    bw.bits((1 << 14) - 1, 14)  # w = 16384
    bw.bits((1 << 14) - 1, 14)  # h = 16384
    bw.bit(0)  # alpha hint
    bw.bits(0, 3)  # version
    payload = bw.done() + b"\x00" * 32  # garbage "bitstream"
    chunk = b"VP8L" + len(payload).to_bytes(4, "little") + payload
    riff = b"WEBP" + chunk
    blob = b"RIFF" + len(riff).to_bytes(4, "little") + riff

    import time

    t0 = time.monotonic()
    assert wl.decode_webp(blob) is None  # rejected, not decoded
    assert time.monotonic() - t0 < 1.0  # and rejected FAST
