"""WebP-lossless (VP8L) codec — pure Python + numpy, no decoder libs.

Decoder per the public WebP Lossless Bitstream Specification (RFC 9649 /
Google "webp-lossless-bitstream-spec"), the same from-scratch pattern as
the GIF/JPEG/TIFF/FLAC codecs in this package:

* LSB-first bitstream; canonical prefix (Huffman) codes read as a
  DEFLATE-style MSB-first tree walk;
* both prefix-code forms: the 1-or-2-symbol "simple" form and the
  normal form (19-symbol code-length code in kCodeLengthCodeOrder,
  16/17/18 repeat codes, optional explicit max_symbol);
* the full pixel stream: ARGB literals (green, red, blue, alpha trees),
  LZ77 backward references (prefix-coded lengths; distances through the
  120-entry 2D plane-code neighborhood map), and the color cache
  ((0x1e35a7bd * argb) >> (32 - bits) insertion hash);
* meta prefix-code image (per-tile tree groups) for the main image;
* all four transforms, applied inverse in reverse bitstream order:
  predictor (14 modes, incl. Select and the clamped add/subtract
  pair), cross-channel color transform (signed 3.5 fixed-point
  multipliers), subtract-green, and color indexing (palette) with
  sub-byte index bundling.

The encoder is the test-harness inverse (same role as encode_gif /
encode_jpeg / encode_flac): real frequency-built canonical prefix
codes emitted through the normal-form code-length path, optional
dist-1 LZ77 run compression, optional subtract-green, optional
palette (with bundling) — enough to exercise every decoder branch
with round-trip-exact pixels.

Reference capability ceiling this replaces: operators/multimodal.py
used to route ALL WebP decodes to the optional-PIL fallback; lossless
(VP8L) WebP now decodes natively. Lossy VP8 stays with the fallback —
it is a full video-intra codec (boolean arithmetic coder, loop filter)
and honestly out of scope.

Scale note: decode is row-local per-payload CPU behind the same
Arrow-batched mapInPandas kernels as every other codec here
(multimodal.image_features / resize_images) — embarrassingly parallel,
no shuffle; see SCALE_BENCH.json kernel rows for the measured shape.
"""

from __future__ import annotations

import heapq

import numpy as np

# --------------------------------------------------------------- bit IO


#: lazily built bit-reversal tables: k -> list of 2^k reversed values
_REV_TABLES: dict[int, list[int]] = {}


#: Hard pixel budget for a single decoded stream (main or sub-stream).
#: 2^24 ≈ 16.7 MP (64 MiB of flat ARGB) — far above any test-scale
#: payload, far below the 16384×16384 the header fields can claim. The
#: pure-Python loop makes larger images a CPU hazard regardless of
#: payload validity, so this is a budget, not a format limit.
MAX_DECODE_PIXELS = 1 << 24


def _rev_table(k: int) -> list[int]:
    t = _REV_TABLES.get(k)
    if t is None:
        t = [int(format(v, f"0{k}b")[::-1], 2) for v in range(1 << k)]
        _REV_TABLES[k] = t
    return t


class _BitReader:
    """LSB-first bit reader over bytes (VP8L convention). Exposes a
    zero-padded MSB-first ``peek`` so table-based prefix decoders can
    consume a whole code in one lookup."""

    def __init__(self, data: bytes):
        # pad so a 5-byte window read never slices short near the end
        self.data = data + b"\x00\x00\x00\x00\x00"
        self.pos = 0  # bit position
        self.nbits = len(data) * 8

    def bit(self) -> int:
        i = self.pos
        if i >= self.nbits:
            raise ValueError("VP8L: bitstream truncated")
        self.pos = i + 1
        return (self.data[i >> 3] >> (i & 7)) & 1

    def bits(self, n: int) -> int:
        """Read n ≤ 30 bits LSB-first (a 5-byte window covers 33+ bits
        after the intra-byte shift)."""
        i = self.pos
        if i + n > self.nbits:
            raise ValueError("VP8L: bitstream truncated")
        self.pos = i + n
        j = i >> 3
        window = int.from_bytes(self.data[j : j + 5], "little") >> (i & 7)
        return window & ((1 << n) - 1)

    def peek_msb(self, k: int) -> int:
        """Next k ≤ 15 bits in tree-walk (MSB-first) order, zero-padded
        past the stream end; does not consume."""
        i = self.pos
        j = i >> 3
        window = int.from_bytes(self.data[j : j + 5], "little") >> (i & 7)
        return _rev_table(k)[window & ((1 << k) - 1)]


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def bit(self, b: int) -> None:
        self.acc |= (b & 1) << self.n
        self.n += 1
        if self.n == 8:
            self.out.append(self.acc)
            self.acc = 0
            self.n = 0

    def bits(self, v: int, n: int) -> None:
        for k in range(n):
            self.bit((v >> k) & 1)

    def code(self, code: int, length: int) -> None:
        """Canonical prefix code: MSB first (tree-walk order)."""
        for k in range(length - 1, -1, -1):
            self.bit((code >> k) & 1)

    def done(self) -> bytes:
        if self.n:
            self.out.append(self.acc)
            self.acc = 0
            self.n = 0
        return bytes(self.out)


# ------------------------------------------------- canonical prefix codes


def _canonical_codes(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical assignment (shorter first,
    ties by symbol index) — DEFLATE/VP8L convention."""
    pairs = sorted(
        (ln, s) for s, ln in enumerate(lengths) if ln > 0
    )
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    prev_len = 0
    for ln, s in pairs:
        code <<= ln - prev_len
        codes[s] = (code, ln)
        code += 1
        prev_len = ln
    return codes


class _HuffDecoder:
    """Table-based prefix decoder from a code-length array: one
    ``peek_msb(max_len)`` lookup consumes a whole code (the classic
    full-width decode table — every code of length L fills
    2^(max_len-L) slots). A single-symbol code (the simple form with
    one symbol, or one nonzero length) consumes ZERO bits per decode,
    per the spec."""

    def __init__(self, lengths: list[int]):
        nonzero = [s for s, ln in enumerate(lengths) if ln > 0]
        if not nonzero:
            raise ValueError("VP8L: empty prefix code")
        if len(nonzero) == 1:
            self.single: int | None = nonzero[0]
            return
        # completeness (Kraft) check — incomplete codes are invalid
        kraft = sum(2.0 ** -ln for ln in lengths if ln > 0)
        if abs(kraft - 1.0) > 1e-9:
            raise ValueError("VP8L: incomplete prefix code")
        self.single = None
        self.max_len = max(lengths)
        size = 1 << self.max_len
        table: list[tuple[int, int]] = [(-1, 0)] * size
        for s, (code, ln) in _canonical_codes(lengths).items():
            base = code << (self.max_len - ln)
            for i in range(base, base + (1 << (self.max_len - ln))):
                table[i] = (s, ln)
        self.table = table

    def read(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        s, ln = self.table[br.peek_msb(self.max_len)]
        pos = br.pos + ln
        if s < 0 or pos > br.nbits:
            raise ValueError("VP8L: bad prefix code in stream")
        br.pos = pos
        return s


_CL_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]


def _read_prefix_code(br: _BitReader, alphabet_size: int) -> _HuffDecoder:
    lengths = [0] * alphabet_size
    if br.bit():  # simple code: 1 or 2 symbols, 8-bit symbol values
        num_symbols = br.bit() + 1
        first_8bit = br.bit()
        s0 = br.bits(8 if first_8bit else 1)
        if s0 >= alphabet_size:
            raise ValueError("VP8L: simple-code symbol out of alphabet")
        lengths[s0] = 1
        if num_symbols == 2:
            s1 = br.bits(8)
            if s1 >= alphabet_size:
                raise ValueError("VP8L: simple-code symbol out of alphabet")
            lengths[s1] = 1
        return _HuffDecoder(lengths)
    # normal code: 19-symbol code-length code
    num_codes = 4 + br.bits(4)
    cl_lengths = [0] * 19
    for i in range(num_codes):
        cl_lengths[_CL_ORDER[i]] = br.bits(3)
    cl_dec = _HuffDecoder(cl_lengths)
    if br.bit():  # explicit max_symbol
        length_nbits = 2 + 2 * br.bits(3)
        max_symbol = 2 + br.bits(length_nbits)
    else:
        max_symbol = alphabet_size
    symbol = 0
    prev_len = 8
    while symbol < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        code_len = cl_dec.read(br)
        if code_len < 16:
            lengths[symbol] = code_len
            symbol += 1
            if code_len:
                prev_len = code_len
        elif code_len == 16:  # repeat previous nonzero length 3-6x
            repeat = 3 + br.bits(2)
            for _ in range(repeat):
                if symbol >= alphabet_size:
                    raise ValueError("VP8L: code-length repeat overflow")
                lengths[symbol] = prev_len
                symbol += 1
        elif code_len == 17:  # 3-10 zeros
            repeat = 3 + br.bits(3)
            symbol += repeat
        else:  # 18: 11-138 zeros
            repeat = 11 + br.bits(7)
            symbol += repeat
        if symbol > alphabet_size:
            raise ValueError("VP8L: code-length overflow")
    return _HuffDecoder(lengths)


# --------------------------------------------- LZ77 prefix-coded values


def _lz77_value(br: _BitReader, code: int) -> int:
    """length/distance prefix decode: codes 0-3 are literal 1-4; above
    that, (2 + (code&1)) << extra_bits + extra + 1."""
    if code < 4:
        return code + 1
    extra_bits = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra_bits
    return offset + br.bits(extra_bits) + 1


def _lz77_encode(value: int) -> tuple[int, int, int]:
    """(code, extra_bits, extra) for a length/distance value ≥ 1."""
    if value <= 4:
        return value - 1, 0, 0
    code = 4
    while True:
        extra_bits = (code - 2) >> 1
        offset = (2 + (code & 1)) << extra_bits
        if offset + 1 <= value <= offset + (1 << extra_bits):
            return code, extra_bits, value - offset - 1
        code += 1


#: 2D neighborhood map for distance plane-codes 1..120 (spec constant):
#: byte = (yoffset << 4) | (8 - xoffset).
_CODE_TO_PLANE = [
    0x18, 0x07, 0x17, 0x19, 0x28, 0x06, 0x27, 0x29, 0x16, 0x1A,
    0x26, 0x2A, 0x38, 0x05, 0x37, 0x39, 0x15, 0x1B, 0x36, 0x3A,
    0x25, 0x2B, 0x48, 0x04, 0x47, 0x49, 0x14, 0x1C, 0x35, 0x3B,
    0x46, 0x4A, 0x24, 0x2C, 0x58, 0x45, 0x4B, 0x34, 0x3C, 0x03,
    0x57, 0x59, 0x13, 0x1D, 0x56, 0x5A, 0x23, 0x2D, 0x44, 0x4C,
    0x55, 0x5B, 0x33, 0x3D, 0x68, 0x02, 0x67, 0x69, 0x12, 0x1E,
    0x66, 0x6A, 0x22, 0x2E, 0x54, 0x5C, 0x43, 0x4D, 0x65, 0x6B,
    0x32, 0x3E, 0x78, 0x01, 0x77, 0x79, 0x53, 0x5D, 0x11, 0x1F,
    0x64, 0x6C, 0x42, 0x4E, 0x76, 0x7A, 0x21, 0x2F, 0x75, 0x7B,
    0x31, 0x3F, 0x63, 0x6D, 0x52, 0x5E, 0x00, 0x74, 0x7C, 0x41,
    0x4F, 0x10, 0x20, 0x62, 0x6E, 0x30, 0x73, 0x7D, 0x51, 0x5F,
    0x40, 0x72, 0x7E, 0x61, 0x6F, 0x50, 0x71, 0x7F, 0x60, 0x70,
]


def _plane_code_to_distance(xsize: int, plane_code: int) -> int:
    if plane_code > 120:
        return plane_code - 120
    b = _CODE_TO_PLANE[plane_code - 1]
    dist = (b >> 4) * xsize + (8 - (b & 0xF))
    return dist if dist >= 1 else 1


# ----------------------------------------------------------- transforms


def _div_round_up(a: int, b: int) -> int:
    return (a + b - 1) // b


def _color_transform_delta(t: int, c: int) -> int:
    """((int8)t * (int8)c) >> 5 with arithmetic shift."""
    ts = t - 256 if t >= 128 else t
    cs = c - 256 if c >= 128 else c
    return (ts * cs) >> 5


def _predict(mode: int, left, top, tl, tr) -> tuple[int, int, int, int]:
    """One of the 14 predictor modes over 4-tuples of plain ints.

    Plain-int math, not numpy vectors: the inverse predictor is
    inherently sequential (each pixel needs already-decoded neighbors),
    so this runs per pixel — Python ints are ~30x cheaper per call than
    allocating numpy scalars. Mode 13's half-delta uses TRUNCATING
    division toward zero (C ``(a-b)/2``), not an arithmetic shift —
    they differ by one for negative odd deltas."""
    if mode == 0:
        return (255, 0, 0, 0)  # opaque black (ARGB)
    if mode == 1:
        return left
    if mode == 2:
        return top
    if mode == 3:
        return tr
    if mode == 4:
        return tl
    if mode == 5:
        return tuple(
            ((((lv + tv) >> 1) + pv) >> 1)
            for lv, tv, pv in zip(left, tr, top)
        )
    if mode == 6:
        return tuple((a + b) >> 1 for a, b in zip(left, tl))
    if mode == 7:
        return tuple((a + b) >> 1 for a, b in zip(left, top))
    if mode == 8:
        return tuple((a + b) >> 1 for a, b in zip(tl, top))
    if mode == 9:
        return tuple((a + b) >> 1 for a, b in zip(top, tr))
    if mode == 10:
        return tuple(
            ((((lv + cv) >> 1) + ((tv + rv) >> 1)) >> 1)
            for lv, cv, tv, rv in zip(left, tl, top, tr)
        )
    if mode == 11:  # Select
        pa_minus_pb = sum(
            abs(lv - cv) - abs(tv - cv)
            for lv, tv, cv in zip(left, top, tl)
        )
        return top if pa_minus_pb <= 0 else left
    if mode == 12:  # ClampAddSubtractFull
        return tuple(
            min(255, max(0, lv + tv - cv))
            for lv, tv, cv in zip(left, top, tl)
        )
    if mode == 13:  # ClampAddSubtractHalf: C-truncating (a-b)/2
        out = []
        for lv, tv, cv in zip(left, top, tl):
            a = (lv + tv) >> 1
            d = a - cv
            half = d // 2 if d >= 0 else -((-d) // 2)
            out.append(min(255, max(0, a + half)))
        return tuple(out)
    raise ValueError(f"VP8L: bad predictor mode {mode}")


def _inverse_predictor(img: np.ndarray, pred_img: np.ndarray, bits: int) -> None:
    """In-place inverse predictor transform over (h, w, 4) ARGB.
    Sequential by nature; runs on plain-int tuples for speed."""
    h, w, _ = img.shape
    res = img.reshape(-1, 4).astype(np.int32).tolist()
    modes = pred_img[:, :, 2].tolist()
    out: list[tuple[int, int, int, int]] = [None] * (h * w)  # type: ignore[list-item]
    for y in range(h):
        mode_row = modes[y >> bits]
        for x in range(w):
            i = y * w + x
            r = res[i]
            if x == 0 and y == 0:
                pred = (255, 0, 0, 0)
            elif y == 0:
                pred = out[i - 1]
            elif x == 0:
                pred = out[i - w]
            else:
                mode = mode_row[x >> bits]
                # contiguous-memory TR semantics: at x = w-1 the
                # top-right slot is the first pixel of the current row
                pred = _predict(
                    mode,
                    out[i - 1],
                    out[i - w],
                    out[i - w - 1],
                    out[i - w + 1],
                )
            out[i] = (
                (r[0] + pred[0]) & 0xFF,
                (r[1] + pred[1]) & 0xFF,
                (r[2] + pred[2]) & 0xFF,
                (r[3] + pred[3]) & 0xFF,
            )
    img[:] = np.asarray(out, np.uint8).reshape(h, w, 4)


def _inverse_color_transform(img: np.ndarray, ct_img: np.ndarray, bits: int) -> None:
    """In-place inverse cross-channel color transform, vectorized per
    tile (multipliers are constant within a tile; green is untouched,
    so red and blue invert with whole-tile numpy expressions)."""
    h, w, _ = img.shape

    def delta(t: int, c: np.ndarray) -> np.ndarray:
        ts = t - 256 if t >= 128 else t
        cs = np.where(c >= 128, c - 256, c).astype(np.int32)
        return (ts * cs) >> 5

    th, tw = ct_img.shape[0], ct_img.shape[1]
    bs = 1 << bits
    for ty in range(th):
        for tx in range(tw):
            g2r = int(ct_img[ty, tx, 3])  # blue channel
            g2b = int(ct_img[ty, tx, 2])  # green channel
            r2b = int(ct_img[ty, tx, 1])  # red channel
            ys, xs = ty * bs, tx * bs
            tile = img[ys : min(ys + bs, h), xs : min(xs + bs, w)]
            g = tile[:, :, 2].astype(np.int32)
            r = (tile[:, :, 1].astype(np.int32) + delta(g2r, g)) & 0xFF
            b = (
                tile[:, :, 3].astype(np.int32)
                + delta(g2b, g)
                + delta(r2b, r)
            ) & 0xFF
            tile[:, :, 1] = r
            tile[:, :, 3] = b


def _inverse_subtract_green(img: np.ndarray) -> None:
    g = img[:, :, 2].astype(np.int32)
    img[:, :, 1] = (img[:, :, 1].astype(np.int32) + g) & 0xFF
    img[:, :, 3] = (img[:, :, 3].astype(np.int32) + g) & 0xFF


def _palette_width_bits(size: int) -> int:
    if size <= 2:
        return 3
    if size <= 4:
        return 2
    if size <= 16:
        return 1
    return 0


def _inverse_palette(img: np.ndarray, palette: np.ndarray, true_width: int) -> np.ndarray:
    """Expand bundled indices and map through the (delta-decoded)
    palette. ``img`` is the reduced-width coded image; indices live in
    the green channel. Out-of-range indices map to transparent black."""
    size = palette.shape[0]
    wb = _palette_width_bits(size)
    h = img.shape[0]
    px_per = 1 << wb
    bits_per = 8 >> wb
    mask = (1 << bits_per) - 1
    packed = img[:, :, 2].astype(np.int32)  # (h, coded_w)
    # unbundle: shift each packed byte by every sub-position at once
    shifts = (np.arange(px_per, dtype=np.int32) * bits_per)[None, None, :]
    idx = ((packed[:, :, None] >> shifts) & mask).reshape(h, -1)[
        :, :true_width
    ]
    # out-of-range indices map to transparent black (extra palette row)
    pal_ext = np.vstack([palette, np.zeros((1, 4), np.uint8)])
    idx = np.where(idx < size, idx, size)
    return pal_ext[idx]


# --------------------------------------------------------------- decode


def _decode_image_stream(
    br: _BitReader, w: int, h: int, level0: bool
) -> np.ndarray:
    """Decode one (possibly sub-resolution) VP8L image stream into an
    (h, w, 4) uint8 ARGB array (channels A, R, G, B)."""
    transforms: list[tuple] = []
    coded_w = w
    if level0:
        while br.bit():
            ttype = br.bits(2)
            if ttype == 0:  # predictor
                bits = br.bits(3) + 2
                sub = _decode_image_stream(
                    br,
                    _div_round_up(coded_w, 1 << bits),
                    _div_round_up(h, 1 << bits),
                    False,
                )
                transforms.append(("predictor", bits, sub))
            elif ttype == 1:  # color transform
                bits = br.bits(3) + 2
                sub = _decode_image_stream(
                    br,
                    _div_round_up(coded_w, 1 << bits),
                    _div_round_up(h, 1 << bits),
                    False,
                )
                transforms.append(("color", bits, sub))
            elif ttype == 2:  # subtract green
                transforms.append(("subtract_green",))
            else:  # color indexing (palette)
                size = br.bits(8) + 1
                pal_img = _decode_image_stream(br, size, 1, False)
                # palette entries are delta-coded per channel
                pal = np.cumsum(
                    pal_img[0].astype(np.uint32), axis=0, dtype=np.uint32
                ).astype(np.uint8)
                transforms.append(("palette", pal, coded_w))
                coded_w = _div_round_up(coded_w, 1 << _palette_width_bits(size))

    cache_bits = br.bits(4) if br.bit() else 0
    if cache_bits > 11:
        raise ValueError("VP8L: invalid color-cache size")
    cache_size = (1 << cache_bits) if cache_bits else 0
    cache = [0] * cache_size

    meta = None
    meta_bits = 0
    num_groups = 1
    if level0 and br.bit():
        meta_bits = br.bits(3) + 2
        meta = _decode_image_stream(
            br,
            _div_round_up(coded_w, 1 << meta_bits),
            _div_round_up(h, 1 << meta_bits),
            False,
        )
        num_groups = int(
            (meta[:, :, 1].astype(np.int32) << 8 | meta[:, :, 2]).max()
        ) + 1

    green_alpha = 256 + 24 + cache_size
    groups = []
    for _ in range(num_groups):
        groups.append(
            (
                _read_prefix_code(br, green_alpha),
                _read_prefix_code(br, 256),  # red
                _read_prefix_code(br, 256),  # blue
                _read_prefix_code(br, 256),  # alpha
                _read_prefix_code(br, 40),  # distance
            )
        )

    n = coded_w * h
    if n > MAX_DECODE_PIXELS:
        # Guard BEFORE the (n, 4) allocation and the per-pixel loop: the
        # 14-bit header fields admit 16384×16384 (≈1 GB flat + minutes of
        # Python loop) from a payload of a few dozen bytes — a tiny
        # malformed/adversarial input must fail here, not after the
        # allocation (code-review r7). A payload-size ratio bound would
        # NOT close the hole: a single-symbol green code resolving to a
        # color-cache hit legally encodes pixels at 0 bits each, so
        # pixel count is the only enforceable budget.
        raise ValueError(
            f"VP8L: {coded_w}x{h} exceeds MAX_DECODE_PIXELS "
            f"({MAX_DECODE_PIXELS}); raise the module constant for "
            "trusted large inputs"
        )
    flat = np.zeros((n, 4), np.uint8)  # A R G B
    i = 0
    while i < n:
        if meta is not None:
            y, x = divmod(i, coded_w)
            mp = meta[y >> meta_bits, x >> meta_bits]
            gidx = (int(mp[1]) << 8) | int(mp[2])
            g_dec, r_dec, b_dec, a_dec, d_dec = groups[gidx]
        else:
            g_dec, r_dec, b_dec, a_dec, d_dec = groups[0]
        s = g_dec.read(br)
        if s < 256:  # literal
            r = r_dec.read(br)
            b = b_dec.read(br)
            a = a_dec.read(br)
            flat[i] = (a, r, s, b)
            if cache_size:
                argb = (a << 24) | (r << 16) | (s << 8) | b
                cache[(0x1E35A7BD * argb & 0xFFFFFFFF) >> (32 - cache_bits)] = argb
            i += 1
        elif s < 280:  # LZ77 backward reference
            length = _lz77_value(br, s - 256)
            plane_code = _lz77_value(br, d_dec.read(br))
            dist = _plane_code_to_distance(coded_w, plane_code)
            if dist > i or i + length > n:
                raise ValueError("VP8L: backref out of range")
            for _ in range(length):
                flat[i] = flat[i - dist]
                if cache_size:
                    a, r, g, b = (int(v) for v in flat[i])
                    argb = (a << 24) | (r << 16) | (g << 8) | b
                    cache[
                        (0x1E35A7BD * argb & 0xFFFFFFFF) >> (32 - cache_bits)
                    ] = argb
                i += 1
        else:  # color-cache hit
            idx = s - 280
            if idx >= cache_size:
                raise ValueError("VP8L: cache index out of range")
            argb = cache[idx]
            flat[i] = (
                argb >> 24 & 0xFF,
                argb >> 16 & 0xFF,
                argb >> 8 & 0xFF,
                argb & 0xFF,
            )
            i += 1

    img = flat.reshape(h, coded_w, 4)
    # inverse transforms, reverse bitstream order
    for t in reversed(transforms):
        if t[0] == "palette":
            img = _inverse_palette(img, t[1], t[2])
        elif t[0] == "subtract_green":
            _inverse_subtract_green(img)
        elif t[0] == "predictor":
            _inverse_predictor(img, t[2], t[1])
        else:
            _inverse_color_transform(img, t[2], t[1])
    return img


def decode_vp8l(data: bytes) -> np.ndarray:
    """Decode a VP8L chunk payload → (H, W, C) uint8, C = 4 (RGBA) when
    any pixel is non-opaque else 3 (RGB)."""
    if not data or data[0] != 0x2F:
        raise ValueError("VP8L: bad signature")
    br = _BitReader(data)
    br.bits(8)  # signature
    w = br.bits(14) + 1
    h = br.bits(14) + 1
    br.bit()  # alpha hint (informational)
    if br.bits(3) != 0:
        raise ValueError("VP8L: unsupported version")
    argb = _decode_image_stream(br, w, h, True)
    rgba = argb[:, :, [1, 2, 3, 0]]  # ARGB -> RGBA
    if (rgba[:, :, 3] == 255).all():
        return np.ascontiguousarray(rgba[:, :, :3])
    return np.ascontiguousarray(rgba)


def decode_webp(payload: bytes):
    """RIFF/WEBP container walk → decode the first VP8L chunk. Lossy
    VP8 (a full video-intra codec) and animations return None — those
    stay with the optional-PIL fallback path in operators/multimodal."""
    if (
        not payload
        or len(payload) < 20
        or payload[:4] != b"RIFF"
        or payload[8:12] != b"WEBP"
    ):
        return None
    i, n = 12, len(payload)
    while i + 8 <= n:
        cid = payload[i : i + 4]
        clen = int.from_bytes(payload[i + 4 : i + 8], "little")
        if cid == b"VP8L":
            try:
                return decode_vp8l(payload[i + 8 : i + 8 + clen])
            except ValueError:
                return None
        i += 8 + clen + (clen & 1)
    return None


# --------------------------------------------------------------- encode


def _build_lengths(freqs: dict[int, int], alphabet_size: int, max_len: int = 15) -> list[int]:
    """Frequency-built prefix-code lengths (heap merge), depth-limited
    with a Kraft fixup. Always yields a COMPLETE code."""
    syms = [s for s, f in freqs.items() if f > 0]
    lengths = [0] * alphabet_size
    if not syms:
        raise ValueError("no symbols")
    if len(syms) == 1:
        lengths[syms[0]] = 1
        return lengths
    heap = [(freqs[s], (s,)) for s in syms]
    heapq.heapify(heap)
    while len(heap) > 1:
        fa, sa = heapq.heappop(heap)
        fb, sb = heapq.heappop(heap)
        for s in sa + sb:
            lengths[s] += 1
        heapq.heappush(heap, (fa + fb, sa + sb))
    if max(lengths) > max_len:
        for s in syms:
            lengths[s] = min(lengths[s], max_len)
        # Kraft fixup: deepen the shallowest symbols until complete
        def kraft():
            return sum(1 << (max_len - lengths[s]) for s in syms)

        while kraft() > (1 << max_len):
            cand = min(
                (s for s in syms if lengths[s] < max_len),
                key=lambda s: lengths[s],
            )
            lengths[cand] += 1
        # lossless shortening where possible
        for s in sorted(syms, key=lambda s: -lengths[s]):
            while lengths[s] > 1:
                lengths[s] -= 1
                if kraft() > (1 << max_len):
                    lengths[s] += 1
                    break
    return lengths


def _write_prefix_code(bw: _BitWriter, lengths: list[int], use_max_symbol: bool = False) -> None:
    """Emit a prefix code. Simple form when it fits (≤2 symbols, all
    8-bit), else the normal code-length form with 0-run RLE."""
    nonzero = [s for s, ln in enumerate(lengths) if ln > 0]
    if 1 <= len(nonzero) <= 2 and all(s < 256 for s in nonzero):
        bw.bit(1)  # simple
        bw.bit(len(nonzero) - 1)
        s0 = nonzero[0]
        if s0 <= 1 and len(nonzero) == 1:
            bw.bit(0)
            bw.bits(s0, 1)
        else:
            bw.bit(1)
            bw.bits(s0, 8)
        if len(nonzero) == 2:
            bw.bits(nonzero[1], 8)
        return
    bw.bit(0)  # normal
    # RLE the length array into code-length symbols
    stream: list[tuple[int, int, int]] = []  # (symbol, extra_bits, extra)
    i = 0
    end = len(lengths)
    while i < end:
        if lengths[i] == 0:
            run = 1
            while i + run < end and lengths[i + run] == 0:
                run += 1
            left = run
            while left >= 11:
                k = min(left, 138)
                stream.append((18, 7, k - 11))
                left -= k
            while left >= 3:
                k = min(left, 10)
                stream.append((17, 3, k - 3))
                left -= k
            for _ in range(left):
                stream.append((0, 0, 0))
            i += run
        else:
            stream.append((lengths[i], 0, 0))
            i += 1
    if use_max_symbol:
        # trim trailing zero-producing tokens; the decoder stops after
        # reading max_symbol TOKENS and leaves the rest zero-filled
        while stream and stream[-1][0] in (0, 17, 18):
            stream.pop()
        if len(stream) < 2:
            stream.append((0, 0, 0))
    cl_freq: dict[int, int] = {}
    for s, _, _ in stream:
        cl_freq[s] = cl_freq.get(s, 0) + 1
    cl_lengths = _build_lengths(cl_freq, 19, max_len=7)
    # trim trailing zeros in kCodeLengthCodeOrder, min 4 entries
    num_codes = 19
    while num_codes > 4 and cl_lengths[_CL_ORDER[num_codes - 1]] == 0:
        num_codes -= 1
    bw.bits(num_codes - 4, 4)
    for k in range(num_codes):
        bw.bits(cl_lengths[_CL_ORDER[k]], 3)
    cl_codes = _canonical_codes(cl_lengths)
    if use_max_symbol:
        # "max_symbol" is the number of code-length TOKENS the decoder
        # will read before stopping (trailing symbols stay zero)
        max_tokens = len(stream)
        nbits = 2
        while (1 << nbits) <= max_tokens - 2:
            nbits += 2
        bw.bit(1)
        bw.bits((nbits - 2) // 2, 3)
        bw.bits(max_tokens - 2, nbits)
    else:
        bw.bit(0)
    single = len(cl_codes) == 1
    for s, eb, ev in stream:
        if not single:
            code, ln = cl_codes[s]
            bw.code(code, ln)
        if eb:
            bw.bits(ev, eb)


def encode_vp8l(
    img,
    subtract_green: bool = False,
    use_lz77_runs: bool = False,
    use_palette: bool = False,
    use_max_symbol: bool = False,
    cache_bits: int = 0,
    meta_bits: int = 0,
) -> bytes:
    """Test-harness VP8L encoder, inverse of :func:`decode_vp8l`:
    frequency-built canonical prefix codes, optional subtract-green
    transform, optional dist-1 run LZ77, optional palette (with
    sub-byte bundling). Input (H, W, 3|4) uint8 RGB(A); output a full
    RIFF/WEBP file."""
    img = np.asarray(img, dtype=np.uint8)
    h, w, c = img.shape
    if c == 3:
        img = np.concatenate(
            [img, np.full((h, w, 1), 255, np.uint8)], axis=2
        )
    if not (1 <= w <= 1 << 14 and 1 <= h <= 1 << 14):
        raise ValueError("dims out of VP8L range")
    argb = img[:, :, [3, 0, 1, 2]].astype(np.int32)  # A R G B

    bw = _BitWriter()
    bw.bits(0x2F, 8)
    bw.bits(w - 1, 14)
    bw.bits(h - 1, 14)
    bw.bit(1 if (img[:, :, 3] != 255).any() else 0)
    bw.bits(0, 3)  # version

    coded = argb
    coded_w = w
    if use_palette:
        colors = sorted(
            {tuple(int(v) for v in px) for px in argb.reshape(-1, 4)}
        )
        if len(colors) > 256:
            raise ValueError("palette mode needs <= 256 colors")
        index = {col: k for k, col in enumerate(colors)}
        size = len(colors)
        bw.bit(1)
        bw.bits(3, 2)  # color indexing transform
        bw.bits(size - 1, 8)
        pal = np.array(colors, np.int32)
        deltas = pal.copy()
        deltas[1:] = (pal[1:] - pal[:-1]) & 0xFF
        _encode_literal_stream(bw, deltas.reshape(1, size, 4), level0=False)
        wb = _palette_width_bits(size)
        px_per = 1 << wb
        bits_per = 8 >> wb
        coded_w = _div_round_up(w, px_per)
        packed = np.zeros((h, coded_w, 4), np.int32)
        packed[:, :, 0] = 255
        for y in range(h):
            for x in range(w):
                idx = index[tuple(int(v) for v in argb[y, x])]
                packed[y, x >> wb, 2] |= idx << ((x % px_per) * bits_per)
        coded = packed
    elif subtract_green:
        bw.bit(1)
        bw.bits(2, 2)  # subtract-green transform
        coded = argb.copy()
        g = coded[:, :, 2]
        coded[:, :, 1] = (coded[:, :, 1] - g) & 0xFF
        coded[:, :, 3] = (coded[:, :, 3] - g) & 0xFF
    bw.bit(0)  # end of transforms

    _encode_literal_stream(
        bw,
        coded,
        use_lz77_runs=use_lz77_runs,
        use_max_symbol=use_max_symbol,
        coded_w=coded_w,
        cache_bits=cache_bits,
        meta_bits=meta_bits,
    )
    payload = bw.done()
    chunk = b"VP8L" + len(payload).to_bytes(4, "little") + payload
    if len(payload) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + len(riff).to_bytes(4, "little") + riff


def _encode_literal_stream(
    bw: _BitWriter,
    argb: np.ndarray,
    use_lz77_runs: bool = False,
    use_max_symbol: bool = False,
    coded_w: int | None = None,
    level0: bool = True,
    cache_bits: int = 0,
    meta_bits: int = 0,
) -> None:
    """Emit one entropy-coded image: literals, optional dist-1 run
    backrefs, optional color cache, optional meta prefix-code image
    (two tile-parity groups). Sub-resolution images (``level0=False``)
    carry no meta-image bit. The cache simulation mirrors the decoder
    exactly, including insertions during backref copies."""
    h, w, _ = argb.shape
    flat = argb.reshape(-1, 4)
    n = flat.shape[0]
    cache_size = (1 << cache_bits) if cache_bits else 0
    cache = [None] * cache_size

    def cache_slot(a, r, g, b):
        argb32 = (a << 24) | (r << 16) | (g << 8) | b
        return (0x1E35A7BD * argb32 & 0xFFFFFFFF) >> (32 - cache_bits), argb32

    def group_of(i: int) -> int:
        if not meta_bits:
            return 0
        y, x = divmod(i, w)
        return ((x >> meta_bits) + (y >> meta_bits)) & 1

    # tokenize with exact decoder-side cache simulation
    tokens: list[tuple] = []  # ("lit",grp,a,r,g,b)|("run",grp,len)|("cache",grp,idx)
    i = 0
    while i < n:
        grp = group_of(i)
        a, r, g, b = (int(v) for v in flat[i])
        if use_lz77_runs and i > 0 and (flat[i] == flat[i - 1]).all():
            run = 1
            while i + run < n and (flat[i + run] == flat[i - 1]).all():
                run += 1
            tokens.append(("run", grp, run))
            if cache_size:
                for k in range(run):
                    aa, rr, gg, bb = (int(v) for v in flat[i + k])
                    slot, argb32 = cache_slot(aa, rr, gg, bb)
                    cache[slot] = argb32
            i += run
            continue
        if cache_size:
            slot, argb32 = cache_slot(a, r, g, b)
            if cache[slot] == argb32:
                tokens.append(("cache", grp, slot))
                i += 1
                continue
            cache[slot] = argb32
        tokens.append(("lit", grp, a, r, g, b))
        i += 1

    ngroups = 2 if meta_bits else 1
    gf = [dict() for _ in range(ngroups)]
    rf = [dict() for _ in range(ngroups)]
    bf = [dict() for _ in range(ngroups)]
    af = [dict() for _ in range(ngroups)]
    df = [dict() for _ in range(ngroups)]
    for t in tokens:
        grp = t[1]
        if t[0] == "lit":
            _, _, a, r, g, b = t
            gf[grp][g] = gf[grp].get(g, 0) + 1
            rf[grp][r] = rf[grp].get(r, 0) + 1
            bf[grp][b] = bf[grp].get(b, 0) + 1
            af[grp][a] = af[grp].get(a, 0) + 1
        elif t[0] == "run":
            code, _, _ = _lz77_encode(t[2])
            gf[grp][256 + code] = gf[grp].get(256 + code, 0) + 1
            dcode, _, _ = _lz77_encode(121)  # plane_code = dist 1 + 120
            df[grp][dcode] = df[grp].get(dcode, 0) + 1
        else:
            s = 256 + 24 + t[2]
            gf[grp][s] = gf[grp].get(s, 0) + 1
    for grp in range(ngroups):
        for m in (gf[grp], rf[grp], bf[grp], af[grp], df[grp]):
            if not m:
                m[0] = 1

    if cache_bits:
        bw.bit(1)
        bw.bits(cache_bits, 4)
    else:
        bw.bit(0)
    if level0:
        if meta_bits:
            bw.bit(1)
            bw.bits(meta_bits - 2, 3)
            mh = _div_round_up(h, 1 << meta_bits)
            mw = _div_round_up(w, 1 << meta_bits)
            meta = np.zeros((mh, mw, 4), np.int32)
            meta[:, :, 0] = 255
            for ty in range(mh):
                for tx in range(mw):
                    meta[ty, tx, 2] = (tx + ty) & 1  # group in green
            _encode_literal_stream(bw, meta, level0=False)
        else:
            bw.bit(0)  # no meta prefix image
    codes = []
    for grp in range(ngroups):
        gl = _build_lengths(gf[grp], 256 + 24 + cache_size)
        rl = _build_lengths(rf[grp], 256)
        bl = _build_lengths(bf[grp], 256)
        al = _build_lengths(af[grp], 256)
        dl = _build_lengths(df[grp], 40)
        for lengths in (gl, rl, bl, al, dl):
            _write_prefix_code(bw, lengths, use_max_symbol=use_max_symbol)
        codes.append(tuple(_canonical_codes(ln) for ln in (gl, rl, bl, al, dl)))

    def emit(cmap, s):
        if len(cmap) == 1:
            return  # single-symbol code consumes no bits
        code, ln = cmap[s]
        bw.code(code, ln)

    for t in tokens:
        gc, rc, bc, ac, dc = codes[t[1]]
        if t[0] == "lit":
            _, _, a, r, g, b = t
            emit(gc, g)
            emit(rc, r)
            emit(bc, b)
            emit(ac, a)
        elif t[0] == "run":
            code, eb, ev = _lz77_encode(t[2])
            emit(gc, 256 + code)
            if eb:
                bw.bits(ev, eb)
            dcode, deb, dev = _lz77_encode(121)
            emit(dc, dcode)
            if deb:
                bw.bits(dev, deb)
        else:
            emit(gc, 256 + 24 + t[2])
