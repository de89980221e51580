"""Pure-stdlib+numpy image codecs for the compressed container formats:
GIF (LZW) decode/encode and baseline JPEG (Huffman + IDCT) decode/encode.

These close the gap `operators/multimodal.py` previously left behind the
`_HAVE_PIL` inverse gate: every format the corpus sniffers recognize as
an image (`sniff_image_header`) now decodes to real pixels with zero
external decoder libraries. The reference treats media payloads as
opaque blobs (it has no decode step at all); this engine decodes them
executor-side inside `mapInPandas` kernels, so the decoders follow the
same contract as `_decode_png`: **return None, never crash** on
malformed/truncated/unsupported payloads — a poison blob in a 100 TB
corpus must cost one null row, not a task retry storm.

Scope (deliberately the interoperable core of each spec):
* GIF87a/GIF89a, first frame only, global or local color table,
  interlaced or not, binary transparency via GCE → RGB or RGBA.
* JPEG/JFIF baseline sequential DCT (SOF0) AND progressive DCT (SOF2,
  T.81 Annex G: spectral selection + successive approximation, EOB
  runs, AC refinement), 8-bit, grayscale or YCbCr with any sampling
  factors h,v ∈ {1,2}, restart markers honored in every scan type.
  Arithmetic coding and lossless/hierarchical return None.
* MJPEG-in-AVI video (RIFF container): real per-frame extraction —
  `parse_avi_mjpeg` walks hdrl/movi, returns the JPEG frame payloads
  plus true frame timing from `avih`, feeding
  `multimodal.frame_sample`'s real-video path; `encode_avi_mjpeg`
  writes a spec-shaped AVI (avih/strh/strf/movi/idx1) for tests.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# GIF
# ---------------------------------------------------------------------------

_GIF_MAGICS = (b"GIF87a", b"GIF89a")

_MAX_PIXELS = 64 * 1024 * 1024  # refuse absurd dims up front (bomb guard)


def _lzw_decode(data: bytes, min_code_size: int, max_out: int):
    """GIF-flavor LZW: LSB-first variable-width codes, CLEAR/EOI codes,
    dict capped at 4096 entries. Returns index bytearray or None."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    # bit reader state
    acc = 0
    nbits = 0
    pos = 0
    n = len(data)

    def reset_table():
        return {i: bytes([i]) for i in range(clear)}

    table = reset_table()
    width = min_code_size + 1
    next_code = eoi + 1
    prev: bytes | None = None
    while True:
        while nbits < width:
            if pos >= n:
                # stream may legally end right at EOI; missing EOI is
                # tolerated (common in the wild) once output exists
                return out if out else None
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = reset_table()
            width = min_code_size + 1
            next_code = eoi + 1
            prev = None
            continue
        if code == eoi:
            return out
        if prev is None:
            entry = table.get(code)
            if entry is None:
                return None
        elif code in table:
            entry = table[code]
        elif code == next_code:  # KwKwK
            entry = prev + prev[:1]
        else:
            return None
        out += entry
        if len(out) > max_out:
            return None
        if prev is not None and next_code < 4096:
            table[next_code] = prev + entry[:1]
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry
    return None


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """GIF-flavor LZW compressor — true dict-growing LZW (not the
    uncompressed-GIF trick), inverse of :func:`_lzw_decode`."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    width = min_code_size + 1

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    emit(clear)
    w = b""
    for b in indices:
        wk = w + bytes([b])
        if wk in table:
            w = wk
            continue
        emit(table[w])
        if next_code < 4096:
            table[wk] = next_code
            next_code += 1
            # the decoder's table lags the encoder's by exactly one
            # entry (its first code after CLEAR defines nothing), so
            # the encoder widens one entry LATER than its own count
            # suggests — at 2^width + 1, not 2^width
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        else:
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        w = bytes([b])
    if w:
        emit(table[w])
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    """Undo GIF 4-pass interlacing (rows stored pass-major)."""
    h = rows.shape[0]
    order = np.concatenate(
        [
            np.arange(0, h, 8),
            np.arange(4, h, 8),
            np.arange(2, h, 4),
            np.arange(1, h, 2),
        ]
    )
    out = np.empty_like(rows)
    out[order] = rows
    return out


def decode_gif(payload: bytes):
    """First-frame GIF decode → (H, W, 3) uint8, or (H, W, 4) when the
    frame's GCE marks a transparent index. Returns None on anything
    malformed or out of scope (no color table, zero dims, bad LZW)."""
    if len(payload) < 13 or payload[:6] not in _GIF_MAGICS:
        return None
    n = len(payload)
    packed = payload[10]
    gct = None
    pos = 13
    if packed & 0x80:
        gct_len = 2 << (packed & 0x07)
        if pos + 3 * gct_len > n:
            return None
        gct = np.frombuffer(
            payload[pos : pos + 3 * gct_len], dtype=np.uint8
        ).reshape(gct_len, 3)
        pos += 3 * gct_len
    transparent = -1
    while pos < n:
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer before any image
            return None
        if block == 0x21:  # extension
            if pos >= n:
                return None
            label = payload[pos]
            pos += 1
            # walk sub-blocks; remember GCE transparency for the frame
            first_sub = True
            while pos < n:
                sublen = payload[pos]
                pos += 1
                if sublen == 0:
                    break
                if label == 0xF9 and first_sub and sublen >= 4 and pos + 4 <= n:
                    flags = payload[pos]
                    if flags & 0x01:
                        transparent = payload[pos + 3]
                first_sub = False
                pos += sublen
            continue
        if block != 0x2C:  # not an image descriptor
            return None
        if pos + 9 > n:
            return None
        _left, _top, w, h = struct.unpack_from("<4H", payload, pos)
        ipacked = payload[pos + 8]
        pos += 9
        palette = gct
        if ipacked & 0x80:
            lct_len = 2 << (ipacked & 0x07)
            if pos + 3 * lct_len > n:
                return None
            palette = np.frombuffer(
                payload[pos : pos + 3 * lct_len], dtype=np.uint8
            ).reshape(lct_len, 3)
            pos += 3 * lct_len
        if palette is None or w <= 0 or h <= 0 or w * h > _MAX_PIXELS:
            return None
        if pos >= n:
            return None
        mcs = payload[pos]
        pos += 1
        if not 2 <= mcs <= 8:  # palette ≤ 256 ⇒ root codes are bytes
            return None
        chunks = bytearray()
        while pos < n:
            sublen = payload[pos]
            pos += 1
            if sublen == 0:
                break
            if pos + sublen > n:
                return None
            chunks += payload[pos : pos + sublen]
            pos += sublen
        idx = _lzw_decode(bytes(chunks), mcs, w * h)
        if idx is None or len(idx) < w * h:
            return None
        indices = np.frombuffer(bytes(idx[: w * h]), dtype=np.uint8).reshape(h, w)
        if indices.max(initial=0) >= palette.shape[0]:
            return None
        if ipacked & 0x40:
            indices = _deinterlace(indices)
        rgb = palette[indices]  # (h, w, 3)
        if transparent < 0:
            return np.ascontiguousarray(rgb)
        alpha = np.where(indices == transparent, 0, 255).astype(np.uint8)
        return np.ascontiguousarray(
            np.concatenate([rgb, alpha[:, :, None]], axis=2)
        )
    return None


def _gif_palettize(img):
    """Shared encoder core: (H, W, 1|3|4) uint8 → (padded power-of-two
    palette, size bits, LZW min-code-size, flat index bytes,
    transparent slot or -1). Raises ValueError when the image cannot be
    represented losslessly (palette overflow, non-binary alpha)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] not in (1, 3, 4):
        raise ValueError(f"expected (H, W, 1|3|4) uint8, got {img.shape}")
    h, w, c = img.shape
    if h == 0 or w == 0:
        raise ValueError("empty image")
    if h > 0xFFFF or w > 0xFFFF:
        raise ValueError("GIF dimensions are 16-bit: max 65535")
    transparent = -1
    if c == 1:
        rgb = np.repeat(img, 3, axis=2)
        opaque_mask = np.ones((h, w), dtype=bool)
    elif c == 3:
        rgb = img
        opaque_mask = np.ones((h, w), dtype=bool)
    else:
        alpha = img[:, :, 3]
        if not np.isin(alpha, (0, 255)).all():
            raise ValueError("GIF transparency is binary: alpha must be 0 or 255")
        opaque_mask = alpha == 255
        rgb = img[:, :, :3]
    flat = rgb.reshape(-1, 3)
    flat_opaque = flat[opaque_mask.reshape(-1)]
    colors = np.unique(flat_opaque, axis=0) if flat_opaque.size else np.zeros((0, 3), np.uint8)
    has_transparent = bool((~opaque_mask).any())
    if colors.shape[0] + (1 if has_transparent else 0) > 256:
        raise ValueError(
            f"{colors.shape[0]} distinct colors; GIF palette holds ≤256"
        )
    # index map: transparent pixels get a dedicated palette slot
    palette = colors
    if has_transparent:
        transparent = colors.shape[0]
        palette = np.vstack([colors, np.zeros((1, 3), dtype=np.uint8)])
    # vectorized color → index via lexicographic searchsorted
    keys = (
        colors[:, 0].astype(np.int64) << 16
        | colors[:, 1].astype(np.int64) << 8
        | colors[:, 2].astype(np.int64)
    )
    pix = (
        flat[:, 0].astype(np.int64) << 16
        | flat[:, 1].astype(np.int64) << 8
        | flat[:, 2].astype(np.int64)
    )
    order = np.argsort(keys)
    if colors.shape[0]:
        # transparent pixels' colors may be absent from the opaque
        # palette — clip, their index is overwritten by the mask below
        slots = np.clip(np.searchsorted(keys[order], pix), 0, keys.size - 1)
        lookup = order[slots]
    else:
        lookup = np.zeros(h * w, np.int64)
    indices = lookup.astype(np.uint8)
    if has_transparent:
        indices = np.where(opaque_mask.reshape(-1), indices, transparent).astype(
            np.uint8
        )
    # palette size: power of two ≥ palette length, minimum 2 entries
    bits = 1
    while (1 << bits) < palette.shape[0]:
        bits += 1
    gct = np.zeros((1 << bits, 3), dtype=np.uint8)
    gct[: palette.shape[0]] = palette
    mcs = max(2, bits)
    return gct, bits, mcs, indices.tobytes(), transparent


def encode_gif(img) -> bytes:
    """REAL GIF89a encoder (true LZW), inverse of :func:`decode_gif` for
    in-scope images. Accepts (H, W, C) uint8 with C ∈ {1, 3, 4}; C=4
    requires binary alpha (0 or 255 — GIF transparency is 1-bit) and the
    opaque color count plus the transparent slot must fit 256. Raises
    ValueError when the image cannot be represented losslessly."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim != 3:
        raise ValueError(f"expected (H, W, C) uint8, got {img.shape}")
    h, w = img.shape[:2]
    gct, bits, mcs, indices, transparent = _gif_palettize(img)
    has_transparent = transparent >= 0
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | ((bits - 1) & 0x07), 0, 0])  # GCT flag + size
    out += gct.tobytes()
    if has_transparent:
        out += bytes([0x21, 0xF9, 4, 0x01, 0, 0, transparent, 0])
    out += bytes([0x2C]) + struct.pack("<4H", 0, 0, w, h) + bytes([0])
    out += bytes([mcs])
    lzw = _lzw_encode(indices, mcs)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += bytes([0, 0x3B])
    return bytes(out)


def encode_gif_animated(frames, delays_ms) -> bytes:
    """REAL animated GIF89a writer: one full-canvas frame per entry,
    each with its own LOCAL color table (palettes may differ across
    frames), a GCE carrying the per-frame delay (10 ms units, rounded),
    and disposal method 1 (leave in place — every frame fully covers
    the canvas). The inverse of :func:`decode_gif_frames` for opaque
    same-size frames."""
    frames = [np.ascontiguousarray(f, dtype=np.uint8) for f in frames]
    if not frames:
        raise ValueError("need at least one frame")
    if len(delays_ms) != len(frames):
        raise ValueError("one delay per frame")
    h, w = frames[0].shape[:2]
    if any(f.shape[:2] != (h, w) for f in frames):
        raise ValueError("all frames must share the canvas size")
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HH", w, h)
    out += bytes([0, 0, 0])  # no GCT — every frame ships an LCT
    for img, delay in zip(frames, delays_ms):
        lct, bits, mcs, indices, transparent = _gif_palettize(img)
        delay_cs = max(0, int(round(delay / 10)))
        gce_flags = 0x04 | (0x01 if transparent >= 0 else 0)  # disposal 1
        out += bytes(
            [0x21, 0xF9, 4, gce_flags]
        ) + struct.pack("<H", min(delay_cs, 0xFFFF)) + bytes(
            [transparent if transparent >= 0 else 0, 0]
        )
        out += bytes([0x2C]) + struct.pack("<4H", 0, 0, w, h)
        out += bytes([0x80 | ((bits - 1) & 0x07)])  # LCT flag + size
        out += lct.tobytes()
        out += bytes([mcs])
        lzw = _lzw_encode(indices, mcs)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += bytes([0])
    out += bytes([0x3B])
    return bytes(out)


def decode_gif_frames(payload: bytes):
    """Full ANIMATED GIF decode with real compositing → ``(frames,
    delays_ms)`` where each frame is the COMPOSITED (H, W, 4) RGBA
    canvas at that point of the animation and ``delays_ms`` the
    per-frame GCE delays (0 when absent). Honors frame offsets
    (left/top sub-rectangles), per-frame transparency (transparent
    pixels leave the canvas untouched — that is GIF's delta encoding),
    interlacing, and disposal methods 0/1 (leave), 2 (restore
    background = clear region to transparent), 3 (restore previous).
    Returns None on malformed payloads — never crashes."""
    if len(payload) < 13 or payload[:6] not in _GIF_MAGICS:
        return None
    n = len(payload)
    cw, ch = struct.unpack_from("<HH", payload, 6)
    if cw <= 0 or ch <= 0 or cw * ch > _MAX_PIXELS:
        return None
    packed = payload[10]
    gct = None
    pos = 13
    if packed & 0x80:
        gct_len = 2 << (packed & 0x07)
        if pos + 3 * gct_len > n:
            return None
        gct = np.frombuffer(
            payload[pos : pos + 3 * gct_len], dtype=np.uint8
        ).reshape(gct_len, 3)
        pos += 3 * gct_len
    canvas = np.zeros((ch, cw, 4), dtype=np.uint8)  # transparent
    frames: list[np.ndarray] = []
    delays: list[int] = []
    transparent = -1
    delay_cs = 0
    disposal = 0
    while pos < n:
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            if pos >= n:
                return None
            label = payload[pos]
            pos += 1
            first_sub = True
            while pos < n:
                sublen = payload[pos]
                pos += 1
                if sublen == 0:
                    break
                if label == 0xF9 and first_sub and sublen >= 4 and pos + 4 <= n:
                    flags = payload[pos]
                    disposal = (flags >> 2) & 0x07
                    delay_cs = int.from_bytes(payload[pos + 1 : pos + 3], "little")
                    transparent = payload[pos + 3] if flags & 0x01 else -1
                first_sub = False
                pos += sublen
            continue
        if block != 0x2C or pos + 9 > n:
            return None
        left, top, w, h = struct.unpack_from("<4H", payload, pos)
        ipacked = payload[pos + 8]
        pos += 9
        palette = gct
        if ipacked & 0x80:
            lct_len = 2 << (ipacked & 0x07)
            if pos + 3 * lct_len > n:
                return None
            palette = np.frombuffer(
                payload[pos : pos + 3 * lct_len], dtype=np.uint8
            ).reshape(lct_len, 3)
            pos += 3 * lct_len
        if (
            palette is None
            or w <= 0
            or h <= 0
            or left + w > cw
            or top + h > ch
        ):
            return None
        if pos >= n:
            return None
        mcs = payload[pos]
        pos += 1
        if not 2 <= mcs <= 8:
            return None
        chunks = bytearray()
        while pos < n:
            sublen = payload[pos]
            pos += 1
            if sublen == 0:
                break
            if pos + sublen > n:
                return None
            chunks += payload[pos : pos + sublen]
            pos += sublen
        idx = _lzw_decode(bytes(chunks), mcs, w * h)
        if idx is None or len(idx) < w * h:
            return None
        indices = np.frombuffer(bytes(idx[: w * h]), dtype=np.uint8).reshape(h, w)
        if indices.max(initial=0) >= palette.shape[0]:
            return None
        if ipacked & 0x40:
            indices = _deinterlace(indices)
        region = canvas[top : top + h, left : left + w]
        saved = region.copy() if disposal == 3 else None
        draw = indices != transparent if transparent >= 0 else np.ones(
            (h, w), dtype=bool
        )
        region[draw, :3] = palette[indices[draw]]
        region[draw, 3] = 255
        frames.append(canvas.copy())
        delays.append(delay_cs * 10)
        if disposal == 2:  # restore background → transparent region
            region[:] = 0
        elif disposal == 3 and saved is not None:
            region[:] = saved
        transparent = -1
        delay_cs = 0
        disposal = 0
        # bomb guards: bound the AGGREGATE allocation (each composited
        # frame is a full canvas copy — a few-KB payload declaring a
        # huge canvas with many tiny frames would otherwise OOM the
        # executor), not just the frame count
        if len(frames) >= 10_000 or len(frames) * cw * ch > _MAX_PIXELS * 4:
            return None
    if not frames:
        return None
    return frames, delays


# ---------------------------------------------------------------------------
# JPEG (baseline sequential DCT)
# ---------------------------------------------------------------------------

_JPEG_MAGIC = b"\xff\xd8\xff"


def _zigzag_order():
    """The 64 (row, col) pairs of JPEG's zigzag scan, generated from the
    anti-diagonal walk rather than transcribed as a constant table."""
    out = []
    for s in range(15):
        rng = range(min(7, s), max(0, s - 7) - 1, -1) if s % 2 == 0 else range(
            max(0, s - 7), min(7, s) + 1
        )
        for i in rng:
            out.append((i, s - i))
    return out


_ZIGZAG = _zigzag_order()
_ZZ_ROWS = np.array([r for r, _ in _ZIGZAG])
_ZZ_COLS = np.array([c for _, c in _ZIGZAG])


def _dct_basis():
    """8×8 DCT-II orthonormal basis A: spatial = A.T @ coef @ A."""
    k = np.arange(8)
    a = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16)
    a *= np.sqrt(2.0 / 8.0)
    a[0] *= np.sqrt(0.5)
    return a


_DCT_A = _dct_basis()


class _HuffTable:
    """Canonical JPEG Huffman table (spec F.2.2.3 MINCODE/MAXCODE/VALPTR
    decode). Built from the DHT wire form: 16 length counts + symbols."""

    def __init__(self, counts, symbols):
        self.symbols = symbols
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code = 0
        k = 0
        for ln in range(1, 17):
            if counts[ln - 1]:
                self.valptr[ln] = k
                self.mincode[ln] = code
                code += counts[ln - 1]
                k += counts[ln - 1]
                self.maxcode[ln] = code - 1
            code <<= 1
        self.nsymbols = k


class _BitReader:
    """MSB-first bit reader over a de-stuffed entropy segment."""

    __slots__ = ("data", "pos", "acc", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise EOFError
            self.acc = self.data[self.pos]
            self.pos += 1
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode(self, table: _HuffTable) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | self.read_bit()
            if code <= table.maxcode[ln]:
                return table.symbols[table.valptr[ln] + code - table.mincode[ln]]
        raise ValueError("bad huffman code")


def _extend(v: int, s: int) -> int:
    return v - (1 << s) + 1 if v < (1 << (s - 1)) else v


class _ProgState:
    """Accumulated coefficient state for PROGRESSIVE JPEG (SOF2) decode
    per ITU T.81 Annex G: each SOS refines a (spectral band, bit
    plane) slice of the per-component DCT coefficient grids; pixels
    exist only after all scans land. Interleaved (DC) scans walk the
    padded MCU grid; non-interleaved scans walk the component's TRUE
    block grid (spec G.1 — the padded MCU columns do not exist there).

    The invariant the tests pin: after a full scan script, the
    coefficient grids equal what the sequential decoder produces for
    the same image, so progressive and baseline decodes of the same
    source are bit-identical."""

    def __init__(self, frame):
        hh, ww, comps = frame
        self.hh, self.ww = hh, ww
        self.comps = comps  # [(cid, h, v, tq)]
        self.hmax = max(h for _, h, _, _ in comps)
        self.vmax = max(v for _, _, v, _ in comps)
        if not all(
            1 <= h <= 2 and 1 <= v <= 2 for _, h, v, _ in comps
        ):
            raise ValueError("sampling factors out of scope")
        self.mx = -(-ww // (8 * self.hmax))
        self.my = -(-hh // (8 * self.vmax))
        self.grids: dict[int, np.ndarray] = {}
        self.true_dims: dict[int, tuple[int, int]] = {}  # cid -> (tby, tbx)
        for cid, h, v, _tq in comps:
            self.grids[cid] = np.zeros(
                (self.my * v, self.mx * h, 64), dtype=np.int32
            )
            cw = -(-ww * h // self.hmax)
            ch = -(-hh * v // self.vmax)
            self.true_dims[cid] = (-(-ch // 8), -(-cw // 8))

    def _blocks_interleaved(self, order):
        """Yield (restart_unit_index, block_view, comp_slot) MCU-major."""
        for mcu in range(self.mx * self.my):
            mcy, mcx = divmod(mcu, self.mx)
            for slot, (cid, h, v) in enumerate(order):
                g = self.grids[cid]
                for bv in range(v):
                    for bh in range(h):
                        yield mcu, g[mcy * v + bv, mcx * h + bh], slot

    def _blocks_single(self, cid):
        tby, tbx = self.true_dims[cid]
        g = self.grids[cid]
        for i in range(tby * tbx):
            yield i, g[i // tbx, i % tbx], 0

    def decode_scan(self, payload, pos, scomp, ss, se, ah, al, huff, restart):
        """Decode one progressive SOS; returns the payload position of
        the marker that ended the scan, or None on any malformation."""
        by_id = {cid: (h, v) for cid, h, v, _tq in self.comps}
        ns = len(scomp)
        if ns < 1 or any(cs not in by_id for cs, _td, _ta in scomp):
            return None
        if ss == 0:
            if se != 0:
                return None  # DC scan is exactly the (0, 0) band
        else:
            if ns != 1 or not ss <= se <= 63:
                return None
        if ah not in (0,) and al != ah - 1:
            return None  # successive approximation refines one bit
        segs, end_pos = _split_entropy(payload, pos)
        reader = _BitReader(segs[0])
        seg_i = 0
        preds = [0] * ns
        eobrun = 0
        if ns > 1:
            order = [(cs, *by_id[cs]) for cs, _td, _ta in scomp]
            blocks = self._blocks_interleaved(order)
        else:
            blocks = self._blocks_single(scomp[0][0])
        tables = []
        for cs, td, ta in scomp:
            if ss == 0 and ah > 0:  # DC refinement reads raw bits only
                tables.append(None)
                continue
            key = (0, td) if ss == 0 else (1, ta)
            if key not in huff:
                return None
            tables.append(huff[key])
        try:
            for unit, blk, slot in blocks:
                if restart and unit and unit % restart == 0 and (
                    seg_i < unit // restart
                ):
                    seg_i = unit // restart
                    if seg_i >= len(segs):
                        return None
                    reader = _BitReader(segs[seg_i])
                    preds = [0] * ns
                    eobrun = 0
                if ss == 0 and ah == 0:  # DC first
                    s = reader.decode(tables[slot])
                    if s > 15:
                        return None
                    diff = _extend(reader.receive(s), s) if s else 0
                    preds[slot] += diff
                    blk[0] = preds[slot] << al
                elif ss == 0:  # DC refinement: one raw bit per block
                    if reader.read_bit():
                        blk[0] |= 1 << al
                elif ah == 0:  # AC first (ns == 1)
                    if eobrun > 0:
                        eobrun -= 1
                        continue
                    k = ss
                    act = tables[0]
                    while k <= se:
                        rs = reader.decode(act)
                        r, s = rs >> 4, rs & 0x0F
                        if s == 0:
                            if r == 15:
                                k += 16
                                continue
                            eobrun = (1 << r) - 1
                            if r:
                                eobrun += reader.receive(r)
                            break
                        k += r
                        if k > se:
                            return None
                        blk[k] = _extend(reader.receive(s), s) << al
                        k += 1
                else:  # AC refinement (ns == 1)
                    eobrun = self._ac_refine_block(
                        reader, tables[0], blk, ss, se, al, eobrun
                    )
                    if eobrun < 0:
                        return None
        except (EOFError, ValueError, IndexError, OverflowError):
            return None
        return end_pos

    @staticmethod
    def _ac_refine_block(reader, act, blk, ss, se, al, eobrun):
        """One block of an AC successive-approximation refinement scan
        (T.81 G.1.2.3 / the libjpeg decode_mcu_AC_refine structure).
        Returns the updated EOBRUN, or -1 on malformation."""
        p1 = 1 << al
        m1 = -p1
        k = ss
        if eobrun == 0:
            while k <= se:
                rs = reader.decode(act)
                r, s = rs >> 4, rs & 0x0F
                if s == 0:
                    if r < 15:
                        # unlike AC-first, the CURRENT block still reads
                        # its correction bits below and decrements the
                        # run — so no -1 here (total ended = (1<<r)+ext)
                        eobrun = 1 << r
                        if r:
                            eobrun += reader.receive(r)
                        break
                    newval = 0  # ZRL: pass 16 zero-history coefficients
                elif s == 1:
                    newval = p1 if reader.read_bit() else m1
                else:
                    return -1  # refine scans carry only size-1 values
                # advance over r zero-history positions, emitting
                # correction bits for every nonzero-history coefficient
                # passed on the way
                while k <= se:
                    v = int(blk[k])
                    if v != 0:
                        if reader.read_bit() and (v & p1) == 0:
                            blk[k] = v + (p1 if v > 0 else m1)
                    else:
                        if r == 0:
                            if newval:
                                blk[k] = newval
                            k += 1
                            break
                        r -= 1
                    k += 1
        if eobrun > 0:
            # inside an EOB run: correction bits only, for the rest of
            # this block's nonzero-history coefficients
            while k <= se:
                v = int(blk[k])
                if v != 0:
                    if reader.read_bit() and (v & p1) == 0:
                        blk[k] = v + (p1 if v > 0 else m1)
                k += 1
            eobrun -= 1
        return eobrun

    def reconstruct(self, qt):
        """Dequantize the accumulated grids, then the shared IDCT +
        assembly back half (:func:`_grids_to_image` — identical math to
        the sequential path, which is what makes the bit-identity
        invariant testable)."""
        specs = []
        for cid, h, v, tq in self.comps:
            if tq not in qt:
                return None
            specs.append((self.grids[cid].astype(np.int64) * qt[tq], h, v))
        return _grids_to_image(specs, self.hh, self.ww, self.hmax, self.vmax)


def decode_jpeg(payload: bytes):
    """JPEG decode → (H, W, 3) RGB or (H, W, 1) grayscale uint8 — both
    BASELINE sequential (SOF0/1, one scan) and PROGRESSIVE (SOF2,
    multi-scan spectral selection + successive approximation via
    :class:`_ProgState`). Pure numpy: Huffman entropy decode per spec
    F.2.2 / G.1.2, batched orthonormal IDCT, nearest chroma upsample,
    restart markers. Arithmetic/12-bit/hierarchical return None — as
    do all malformed payloads (return-None-never-crash contract)."""
    if len(payload) < 4 or payload[:3] != _JPEG_MAGIC:
        return None
    n = len(payload)
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffTable] = {}
    frame = None  # (H, W, [(cid, h, v, tq), ...])
    restart = 0
    progressive = False
    prog = None  # _ProgState once the first progressive SOS arrives
    try:
        while pos + 4 <= n:
            if payload[pos] != 0xFF:
                return None
            marker = payload[pos + 1]
            if marker == 0xFF:  # fill byte (T.81 B.1.1.2: any number
                pos += 1  # of 0xFF pad bytes may precede a marker)
                continue
            if marker == 0xD9:  # EOI — reconstruct accumulated scans
                break
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                pos += 2
                continue
            seglen = int.from_bytes(payload[pos + 2 : pos + 4], "big")
            body = payload[pos + 4 : pos + 2 + seglen]
            if seglen < 2 or len(body) != seglen - 2:
                return None
            if marker == 0xDB:  # DQT
                i = 0
                while i < len(body):
                    pq, tq = body[i] >> 4, body[i] & 0x0F
                    i += 1
                    if pq == 0:
                        tbl = np.frombuffer(body[i : i + 64], np.uint8).astype(
                            np.int32
                        )
                        i += 64
                    else:
                        tbl = np.frombuffer(body[i : i + 128], ">u2").astype(
                            np.int32
                        )
                        i += 128
                    if tbl.size != 64:
                        return None
                    qt[tq] = tbl
            elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
                if body[0] != 8:
                    return None
                hh = int.from_bytes(body[1:3], "big")
                ww = int.from_bytes(body[3:5], "big")
                nc = body[5]
                if hh == 0 or ww == 0 or nc not in (1, 3) or hh * ww > _MAX_PIXELS:
                    return None
                comps = []
                for c in range(nc):
                    cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                    comps.append((cid, hv >> 4, hv & 0x0F, tq))
                frame = (hh, ww, comps)
                progressive = marker == 0xC2
            elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
                return None  # arithmetic / lossless / hierarchical
            elif marker == 0xC4:  # DHT
                i = 0
                while i + 17 <= len(body):
                    tc, th = body[i] >> 4, body[i] & 0x0F
                    counts = list(body[i + 1 : i + 17])
                    total = sum(counts)
                    syms = list(body[i + 17 : i + 17 + total])
                    if len(syms) != total:
                        return None
                    huff[(tc, th)] = _HuffTable(counts, syms)
                    i += 17 + total
            elif marker == 0xDD:  # DRI
                restart = int.from_bytes(body[0:2], "big")
            elif marker == 0xDA:  # SOS — entropy data follows
                if frame is None:
                    return None
                ns = body[0]
                scomp = []
                for c in range(ns):
                    cs, tt = body[1 + 2 * c : 3 + 2 * c]
                    scomp.append((cs, tt >> 4, tt & 0x0F))
                data_start = pos + 2 + seglen
                if not progressive:
                    return _jpeg_scan(
                        payload, data_start, frame, scomp, qt, huff, restart
                    )
                ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
                ahal = body[3 + 2 * ns]
                if prog is None:
                    prog = _ProgState(frame)
                pos = prog.decode_scan(
                    payload, data_start, scomp, ss, se,
                    ahal >> 4, ahal & 0x0F, huff, restart,
                )
                if pos is None:
                    return None
                continue
            pos += 2 + seglen
    except (IndexError, ValueError, EOFError, struct.error):
        return None
    if prog is not None:
        return prog.reconstruct(qt)
    return None


def _split_entropy(payload: bytes, pos: int):
    """Consume one scan's entropy-coded data starting at ``pos``:
    remove 0xFF00 byte stuffing, split on RSTn markers. Returns
    ``(segments, next_pos)`` where ``next_pos`` points at the 0xFF of
    the marker that ended the scan (EOI, next SOS, DHT, ...)."""
    segs = []
    cur = bytearray()
    n = len(payload)
    while pos < n:
        b = payload[pos]
        if b != 0xFF:
            cur.append(b)
            pos += 1
            continue
        m = payload[pos + 1] if pos + 1 < n else 0xD9
        if m == 0x00:
            cur.append(0xFF)
            pos += 2
        elif 0xD0 <= m <= 0xD7:
            segs.append(bytes(cur))
            cur = bytearray()
            pos += 2
        else:  # EOI or next marker ends the scan
            break
    segs.append(bytes(cur))
    return segs, pos


def _jpeg_scan(payload, pos, frame, scomp, qt, huff, restart):
    hh, ww, comps = frame
    by_id = {cid: (h, v, tq) for cid, h, v, tq in comps}
    order = []
    for cs, td, ta in scomp:
        if cs not in by_id or (0, td) not in huff or (1, ta) not in huff:
            return None
        h, v, tq = by_id[cs]
        if tq not in qt or not (1 <= h <= 2 and 1 <= v <= 2):
            return None
        order.append((cs, h, v, qt[tq], huff[(0, td)], huff[(1, ta)]))
    if len(order) != len(comps):
        return None  # multi-scan files out of scope
    hmax = max(h for _, h, _, _, _, _ in order)
    vmax = max(v for _, _, v, _, _, _ in order)
    mx = -(-ww // (8 * hmax))
    my = -(-hh // (8 * vmax))
    segs, _ = _split_entropy(payload, pos)
    # decode coefficient blocks into (rows, cols, 64) DEQUANTIZED grids
    grids = {
        cs: np.zeros((my * v, mx * h, 64), dtype=np.int64)
        for cs, h, v, *_ in order
    }
    seg_i = 0
    reader = _BitReader(segs[0])
    pred = {cs: 0 for cs, *_ in order}
    try:
        for mcu in range(mx * my):
            if restart and mcu and mcu % restart == 0:
                seg_i += 1
                if seg_i >= len(segs):
                    return None
                reader = _BitReader(segs[seg_i])
                pred = {cs: 0 for cs, *_ in order}
            mcy, mcx = divmod(mcu, mx)
            for cs, h, v, q, dct, act in order:
                for bi in range(h * v):
                    blk = np.zeros(64, dtype=np.int32)
                    s = reader.decode(dct)
                    if s > 15:  # corrupt table: size beyond baseline range
                        return None
                    diff = _extend(reader.receive(s), s) if s else 0
                    pred[cs] += diff
                    blk[0] = pred[cs]
                    k = 1
                    while k < 64:
                        rs = reader.decode(act)
                        r, sz = rs >> 4, rs & 0x0F
                        if sz == 0:
                            if r == 15:
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            return None
                        blk[k] = _extend(reader.receive(sz), sz)
                        k += 1
                    grids[cs][mcy * v + bi // h, mcx * h + bi % h] = blk * q
    except (EOFError, ValueError, IndexError, OverflowError):
        return None
    return _grids_to_image(
        [(grids[cs], h, v) for cs, h, v, *_ in order], hh, ww, hmax, vmax
    )


def _grids_to_image(grid_specs, hh, ww, hmax, vmax):
    """Shared back half of both JPEG decode paths: DEQUANTIZED zigzag
    coefficient grids (rows, cols, 64) → batched orthonormal IDCT →
    vectorized plane assembly → chroma upsample → crop → YCbCr→RGB.
    ``grid_specs`` is a list of (grid, h, v) per component."""
    planes = []
    for grid, h, v in grid_specs:
        by, bx = grid.shape[0], grid.shape[1]
        blocks = grid.reshape(-1, 64).astype(np.float64)
        mat = np.zeros((blocks.shape[0], 8, 8), dtype=np.float64)
        mat[:, _ZZ_ROWS, _ZZ_COLS] = blocks
        spatial = np.einsum("ij,njk,kl->nil", _DCT_A.T, mat, _DCT_A) + 128.0
        spatial = np.clip(np.round(spatial), 0, 255).astype(np.uint8)
        plane = (
            spatial.reshape(by, bx, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(by * 8, bx * 8)
        )
        plane = np.repeat(np.repeat(plane, vmax // v, axis=0), hmax // h, axis=1)
        planes.append(plane[:hh, :ww])
    if len(planes) == 1:
        return np.ascontiguousarray(planes[0][:, :, None])
    y = planes[0].astype(np.float64)
    cb = planes[1].astype(np.float64) - 128.0
    cr = planes[2].astype(np.float64) - 128.0
    rgb = np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb],
        axis=2,
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


class _BitWriter:
    """MSB-first bit writer with JPEG 0xFF byte stuffing."""

    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec
        return bytes(self.out)

    def restart(self, m: int) -> None:
        """Byte-align (1-bit pad), then emit RSTm — a marker, so the two
        bytes go out raw, never stuffed."""
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)
        self.out += bytes([0xFF, 0xD0 | (m & 7)])


def _enc_tables():
    """Encoder Huffman tables: every symbol at one uniform code length
    (canonical ⇒ code == list index). Custom tables are fully legal
    baseline JPEG — the DHT segment ships them — and sidestep
    transcribing the (optional) Annex K defaults. DC: 12 symbols @ 4
    bits; AC: the 162 meaningful run/size symbols @ 8 bits."""
    dc_syms = list(range(12))
    # (r << 4) | 0 for r ≤ 14 are the progressive EOBn symbols; 0xF0 is
    # ZRL; all coexist with the run/size pairs in one 8-bit table
    ac_syms = [r << 4 for r in range(16)] + [
        (r << 4) | s for r in range(16) for s in range(1, 11)
    ]
    ac_syms = sorted(set(ac_syms))
    dc_counts = [0] * 16
    dc_counts[3] = len(dc_syms)  # 4-bit codes
    ac_counts = [0] * 16
    ac_counts[7] = len(ac_syms)  # 8-bit codes
    dc_code = {s: (i, 4) for i, s in enumerate(dc_syms)}
    ac_code = {s: (i, 8) for i, s in enumerate(ac_syms)}
    return (dc_counts, dc_syms, dc_code), (ac_counts, ac_syms, ac_code)


def _mag_bits(v: int):
    """(size, raw bits) for a DC diff / AC coefficient per spec F.1.2."""
    if v == 0:
        return 0, 0
    a = abs(v)
    s = a.bit_length()
    return s, v if v > 0 else v + (1 << s) - 1


def _jpeg_coef_grids(img, quant: int, sampling: tuple[int, int]):
    """Shared encoder front half: colorspace + (optional) chroma
    downsample + blocked DCT + uniform quantization. Returns
    ``(grids, factors, h, w, mx, my, hmax, vmax)`` where each grid is
    the component's (rows, cols, 64) ZIGZAG coefficient array on the
    padded MCU grid."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] not in (1, 3):
        raise ValueError(f"expected (H, W, 1|3) uint8, got {img.shape}")
    if not 1 <= quant <= 255:
        raise ValueError("quant must be in [1, 255]")
    sh, sv = sampling
    if sh not in (1, 2) or sv not in (1, 2):
        raise ValueError("sampling factors must be 1 or 2")
    h, w, c = img.shape
    if h == 0 or w == 0:
        raise ValueError("empty image")
    if h > 0xFFFF or w > 0xFFFF:
        raise ValueError("JPEG dimensions are 16-bit: max 65535")
    if c == 3:
        r = img[:, :, 0].astype(np.float64)
        g = img[:, :, 1].astype(np.float64)
        b = img[:, :, 2].astype(np.float64)
        full = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
        factors = [(sh, sv), (1, 1), (1, 1)]
    else:
        full = [img[:, :, 0].astype(np.float64)]
        factors = [(1, 1)]
        sh = sv = 1
    hmax, vmax = sh, sv
    mx = -(-w // (8 * hmax))
    my = -(-h // (8 * vmax))
    grids = []  # per component: (rows, cols, 64) zigzag coefficient grid
    for (fh, fv), p in zip(factors, full):
        ph, pw = my * vmax * 8, mx * hmax * 8
        p = np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
        ry, rx = vmax // fv, hmax // fh
        if ry > 1 or rx > 1:  # chroma box-average downsample
            p = p.reshape(ph // ry, ry, pw // rx, rx).mean(axis=(1, 3))
        th, tw = my * fv * 8, mx * fh * 8
        blk = p.reshape(th // 8, 8, tw // 8, 8).transpose(0, 2, 1, 3)
        coef = np.einsum("ij,rcjk,lk->rcil", _DCT_A, blk - 128.0, _DCT_A)
        qz = np.round(coef / quant).astype(np.int64)
        grids.append(qz[:, :, _ZZ_ROWS, _ZZ_COLS])
    return grids, factors, h, w, mx, my, hmax, vmax


def encode_jpeg(
    img,
    quant: int = 1,
    sampling: tuple[int, int] = (1, 1),
    restart_interval: int = 0,
) -> bytes:
    """Baseline sequential JPEG encoder — pure numpy. ``sampling`` is
    the luma (h, v) factor pair with chroma fixed at (1, 1): (1, 1) ⇒
    4:4:4, (2, 1) ⇒ 4:2:2, (2, 2) ⇒ 4:2:0 (chroma box-averaged).
    ``restart_interval`` > 0 emits DRI + RSTn markers every that many
    MCUs. Uniform quantization of ``quant`` (1 ⇒ near-lossless at
    4:4:4: the only loss is DCT rounding, so :func:`decode_jpeg`
    round-trips within a few levels). Accepts (H, W, 1) grayscale or
    (H, W, 3) RGB uint8. Exercises every decoder path: multi-block
    MCUs, chroma upsample, restart resync."""
    grids, factors, h, w, mx, my, hmax, vmax = _jpeg_coef_grids(
        img, quant, sampling
    )
    (dc_counts, dc_syms, dc_code), (ac_counts, ac_syms, ac_code) = _enc_tables()
    bw = _BitWriter()
    preds = [0] * len(grids)
    rst = 0
    for mcu in range(mx * my):
        if restart_interval and mcu and mcu % restart_interval == 0:
            bw.restart(rst & 7)
            rst += 1
            preds = [0] * len(grids)
        mcy, mcx = divmod(mcu, mx)
        for ci, ((fh, fv), grid) in enumerate(zip(factors, grids)):
            for bv in range(fv):
                for bh in range(fh):
                    blk = grid[mcy * fv + bv, mcx * fh + bh]
                    diff = int(blk[0]) - preds[ci]
                    preds[ci] = int(blk[0])
                    s, bits = _mag_bits(diff)
                    code, ln = dc_code[s]
                    bw.write(code, ln)
                    if s:
                        bw.write(bits, s)
                    run = 0
                    nz = np.nonzero(blk[1:])[0]
                    last = nz[-1] + 1 if nz.size else 0
                    for k in range(1, last + 1):
                        v = int(blk[k])
                        if v == 0:
                            run += 1
                            continue
                        while run > 15:
                            code, ln = ac_code[0xF0]
                            bw.write(code, ln)
                            run -= 16
                        s, bits = _mag_bits(v)
                        code, ln = ac_code[(run << 4) | s]
                        bw.write(code, ln)
                        bw.write(bits, s)
                        run = 0
                    if last < 63:
                        code, ln = ac_code[0x00]  # EOB
                        bw.write(code, ln)
    data = bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xDB, bytes([0x00]) + bytes([quant] * 64))  # DQT 0 (uniform)
    nc = len(grids)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([nc])
    for ci, (fh, fv) in enumerate(factors):
        sof += bytes([ci + 1, (fh << 4) | fv, 0])  # id, sampling, qtable 0
    out += seg(0xC0, sof)
    out += seg(0xC4, bytes([0x00]) + bytes(dc_counts) + bytes(dc_syms))
    out += seg(0xC4, bytes([0x10]) + bytes(ac_counts) + bytes(ac_syms))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([nc])
    for ci in range(nc):
        sos += bytes([ci + 1, 0x00])  # DC table 0, AC table 0
    sos += bytes([0, 63, 0])  # Ss, Se, Ah/Al
    out += seg(0xDA, sos)
    out += data
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# MJPEG-in-AVI (RIFF container)
# ---------------------------------------------------------------------------

_MAX_AVI_FRAMES = 100_000  # bomb guard: bounded frame index per payload


def parse_avi_mjpeg(payload: bytes):
    """REAL video-frame extraction from an MJPEG AVI: walk the RIFF
    tree (LIST hdrl → avih for timing/dims, LIST movi for the frame
    chunks), collect every ``..dc``/``..db`` video chunk payload in
    stream order, and return::

        (frames, usec_per_frame, width, height)

    where ``frames`` is a list of per-frame byte strings (each one a
    complete JPEG for MJPEG files — feed :func:`decode_jpeg`).
    Timing comes from ``avih.dwMicroSecPerFrame`` (0 → caller picks a
    default). Returns None on anything that is not a RIFF/AVI or is
    malformed — same return-None-never-crash contract as the image
    decoders. Audio chunks (``..wb``) and index chunks are skipped, so
    interleaved files parse fine."""
    n = len(payload)
    if n < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        return None
    usec = 0
    width = height = None
    frames: list[bytes] = []

    def walk(start: int, end: int, depth: int) -> bool:
        nonlocal usec, width, height
        i = start
        while i + 8 <= end:
            ckid = payload[i : i + 4]
            size = int.from_bytes(payload[i + 4 : i + 8], "little")
            body = i + 8
            if body + size > end:
                return False  # torn chunk
            if ckid == b"LIST" and size >= 4 and depth < 8:
                if not walk(body + 4, body + size, depth + 1):
                    return False
            elif ckid == b"avih" and size >= 40:
                usec = int.from_bytes(payload[body : body + 4], "little")
                width = int.from_bytes(payload[body + 32 : body + 36], "little")
                height = int.from_bytes(payload[body + 36 : body + 40], "little")
            elif (
                len(ckid) == 4
                and ckid[2:4] in (b"dc", b"db")
                and ckid[:2].isdigit()
            ):
                if len(frames) >= _MAX_AVI_FRAMES:
                    return False
                frames.append(payload[body : body + size])
            i = body + size + (size & 1)  # chunks are word-aligned
        return True

    riff_size = int.from_bytes(payload[4:8], "little")
    end = min(8 + riff_size, n)
    if not walk(12, end, 0):
        return None
    if not frames:
        return None
    return frames, usec, width, height


def encode_avi_mjpeg(frames, fps: int = 25, width: int = 0, height: int = 0) -> bytes:
    """Minimal REAL AVI writer for MJPEG frame payloads: RIFF('AVI ')
    with LIST hdrl (avih + one 'vids'/'MJPG' strl with strh + a
    BITMAPINFOHEADER strf), LIST movi of ``00dc`` chunks (word-padded),
    and a flat idx1. ``frames`` is a list of JPEG byte strings (use
    :func:`encode_jpeg`); when width/height are 0 they are sniffed from
    the first frame's SOF0. The inverse of :func:`parse_avi_mjpeg`."""
    frames = [bytes(f) for f in frames]
    if not frames:
        raise ValueError("need at least one frame")
    if fps <= 0:
        raise ValueError("fps must be positive")
    if not width or not height:
        probe = decode_jpeg(frames[0])
        if probe is None:
            raise ValueError("first frame is not decodable JPEG; pass dims")
        height, width = probe.shape[:2]
    usec = 1_000_000 // fps

    def chunk(ckid: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return ckid + struct.pack("<I", len(body)) + body + pad

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    max_bytes = max(len(f) for f in frames)
    avih = struct.pack(
        "<14I",
        usec,  # dwMicroSecPerFrame
        max_bytes * fps,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        0x10,  # AVIF_HASINDEX
        len(frames),  # dwTotalFrames
        0,  # dwInitialFrames
        1,  # dwStreams
        max_bytes,  # dwSuggestedBufferSize
        width,
        height,
        0, 0, 0, 0,  # dwReserved
    )
    strh = (
        b"vids"
        + b"MJPG"
        + struct.pack(
            "<IHHIIIIIIIII",
            0,  # dwFlags
            0, 0,  # wPriority, wLanguage
            0,  # dwInitialFrames
            1,  # dwScale
            fps,  # dwRate (rate/scale = fps)
            0,  # dwStart
            len(frames),  # dwLength
            max_bytes,  # dwSuggestedBufferSize
            0xFFFFFFFF,  # dwQuality
            0,  # dwSampleSize (0 = variable, one sample per chunk)
            0,  # rcFrame (packed 4x u16 = two u32 zeros -> one here)
        )
        + struct.pack("<I", 0)  # rcFrame tail
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40,  # biSize
        width,
        height,
        1,  # biPlanes
        24,  # biBitCount
        b"MJPG",  # biCompression
        width * height * 3,  # biSizeImage
        0, 0, 0, 0,
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_body = b"".join(chunk(b"00dc", f) for f in frames)
    movi = lst(b"movi", movi_body)
    # idx1: one entry per frame — offset is from the start of 'movi'
    # (the fourcc), the common convention
    entries = []
    off = 4
    for f in frames:
        entries.append(b"00dc" + struct.pack("<III", 0x10, off, len(f)))
        off += 8 + len(f) + (len(f) & 1)
    idx1 = chunk(b"idx1", b"".join(entries))
    riff_body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def _emit_eobrun(bw, ac_code, eobrun: int, pending: list) -> int:
    """Flush a pending EOB run: the EOBn symbol ((r << 4) | 0 with r
    extension bits encoding run = (1 << r) + ext), then the buffered
    correction bits that belong to the blocks in the run."""
    if eobrun > 0:
        r = eobrun.bit_length() - 1
        code, ln = ac_code[r << 4]
        bw.write(code, ln)
        if r:
            bw.write(eobrun - (1 << r), r)
    for bit in pending:
        bw.write(bit, 1)
    pending.clear()
    return 0


def encode_jpeg_progressive(
    img,
    quant: int = 1,
    sampling: tuple[int, int] = (1, 1),
    band_split: int = 5,
    restart_interval: int = 0,
) -> bytes:
    """PROGRESSIVE JPEG encoder (SOF2, T.81 Annex G) — pure numpy, the
    test-harness inverse of the progressive decode path. Scan script
    (spectral selection × one level of successive approximation):

    1. DC first, all components interleaved, Al=1 (diffs of the
       arithmetically-shifted DC values);
    2. DC refinement, Ah=1 Al=0 (one raw bit per block);
    3. per component: AC first scans for bands [1..band_split] and
       [band_split+1..63] at Al=1 (run/size with EOBn run ends);
    4. per component: AC refinement scans for both bands at Ah=1 Al=0
       (newly-significant ±1 insertions + correction bits, EOB-run
       buffered bits — the G.1.2.3 structure).

    ``restart_interval`` applies per scan (MCUs for the interleaved DC
    scans, blocks for the AC scans), resetting predictors/EOB runs.
    The coefficients are identical to :func:`encode_jpeg`'s for the
    same (img, quant, sampling), so the progressive decode must match
    the sequential decode bit-for-bit — the cross-path test invariant."""
    grids, factors, h, w, mx, my, hmax, vmax = _jpeg_coef_grids(
        img, quant, sampling
    )
    nc = len(grids)
    (dc_counts, dc_syms, dc_code), (ac_counts, ac_syms, ac_code) = _enc_tables()
    if not 1 <= band_split <= 62:
        raise ValueError("band_split must be in [1, 62]")

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    def sos_header(comp_ids, ss, se, ah, al) -> bytes:
        body = bytes([len(comp_ids)])
        for ci in comp_ids:
            body += bytes([ci + 1, 0x00])  # DC table 0 / AC table 0
        body += bytes([ss, se, (ah << 4) | al])
        return seg(0xDA, body)

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xDB, bytes([0x00]) + bytes([quant] * 64))
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([nc])
    for ci, (fh, fv) in enumerate(factors):
        sof += bytes([ci + 1, (fh << 4) | fv, 0])
    out += seg(0xC2, sof)  # SOF2: progressive
    out += seg(0xC4, bytes([0x00]) + bytes(dc_counts) + bytes(dc_syms))
    out += seg(0xC4, bytes([0x10]) + bytes(ac_counts) + bytes(ac_syms))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))

    def dc_blocks():  # interleaved MCU-major over the padded grids
        for mcu in range(mx * my):
            mcy, mcx = divmod(mcu, mx)
            for ci, ((fh, fv), grid) in enumerate(zip(factors, grids)):
                for bv in range(fv):
                    for bh in range(fh):
                        yield mcu, ci, grid[mcy * fv + bv, mcx * fh + bh]

    # ---- scan 1: DC first, Al=1 ------------------------------------
    out += sos_header(list(range(nc)), 0, 0, 0, 1)
    bw = _BitWriter()
    preds = [0] * nc
    rst = 0
    for unit, ci, blk in dc_blocks():
        if restart_interval and unit and unit % restart_interval == 0 and (
            rst < unit // restart_interval
        ):
            bw.restart((rst := rst + 1) - 1 & 7)
            preds = [0] * nc
        v = int(blk[0]) >> 1  # arithmetic shift = DC point transform
        diff = v - preds[ci]
        preds[ci] = v
        s, bits = _mag_bits(diff)
        code, ln = dc_code[s]
        bw.write(code, ln)
        if s:
            bw.write(bits, s)
    out += bw.flush()

    # ---- scan 2: DC refinement, Ah=1 Al=0 --------------------------
    out += sos_header(list(range(nc)), 0, 0, 1, 0)
    bw = _BitWriter()
    rst = 0
    for unit, ci, blk in dc_blocks():
        if restart_interval and unit and unit % restart_interval == 0 and (
            rst < unit // restart_interval
        ):
            bw.restart((rst := rst + 1) - 1 & 7)
        bw.write(int(blk[0]) & 1, 1)
    out += bw.flush()

    bands = [(1, band_split), (band_split + 1, 63)]

    def true_blocks(ci):
        fh, fv = factors[ci]
        cw = -(-w * fh // hmax)
        chh = -(-h * fv // vmax)
        tbx, tby = -(-cw // 8), -(-chh // 8)
        g = grids[ci]
        for i in range(tby * tbx):
            yield i, g[i // tbx, i % tbx]

    # ---- AC first scans, Al=1 --------------------------------------
    for ci in range(nc):
        for ss, se in bands:
            out += sos_header([ci], ss, se, 0, 1)
            bw = _BitWriter()
            eobrun = 0
            rst = 0
            for bi, blk in true_blocks(ci):
                if restart_interval and bi and bi % restart_interval == 0 and (
                    rst < bi // restart_interval
                ):
                    eobrun = _emit_eobrun(bw, ac_code, eobrun, [])
                    bw.restart((rst := rst + 1) - 1 & 7)
                vals = [
                    (int(blk[k]) >> 1) if blk[k] >= 0 else -((-int(blk[k])) >> 1)
                    for k in range(ss, se + 1)
                ]
                nz = [i for i, v in enumerate(vals) if v]
                if not nz:
                    eobrun += 1
                    if eobrun == 0x7FFF:
                        eobrun = _emit_eobrun(bw, ac_code, eobrun, [])
                    continue
                eobrun = _emit_eobrun(bw, ac_code, eobrun, [])
                run = 0
                for i in range(nz[-1] + 1):
                    v = vals[i]
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = ac_code[0xF0]
                        bw.write(code, ln)
                        run -= 16
                    s, bits = _mag_bits(v)
                    code, ln = ac_code[(run << 4) | s]
                    bw.write(code, ln)
                    bw.write(bits, s)
                    run = 0
                if nz[-1] < se - ss:  # band ends early → join an EOB run
                    eobrun += 1
            _emit_eobrun(bw, ac_code, eobrun, [])
            out += bw.flush()

    # ---- AC refinement scans, Ah=1 Al=0 ----------------------------
    for ci in range(nc):
        for ss, se in bands:
            out += sos_header([ci], ss, se, 1, 0)
            bw = _BitWriter()
            eobrun = 0
            pending: list = []
            rst = 0
            for bi, blk in true_blocks(ci):
                if restart_interval and bi and bi % restart_interval == 0 and (
                    rst < bi // restart_interval
                ):
                    eobrun = _emit_eobrun(bw, ac_code, eobrun, pending)
                    bw.restart((rst := rst + 1) - 1 & 7)
                vals = [int(blk[k]) for k in range(ss, se + 1)]
                newsig = [i for i, v in enumerate(vals) if abs(v) == 1]
                if not newsig:
                    # whole block joins the EOB run; its correction bits
                    # (for already-significant coefficients) are buffered
                    eobrun += 1
                    pending.extend(abs(v) & 1 for v in vals if abs(v) > 1)
                    if eobrun == 0x7FFF:
                        eobrun = _emit_eobrun(bw, ac_code, eobrun, pending)
                    continue
                eobrun = _emit_eobrun(bw, ac_code, eobrun, pending)
                # emit tokens by SIMULATING the decoder's walk: each
                # token (run, s=1) or ZRL spans a window of positions,
                # and the correction bits that follow it belong ONLY to
                # the already-significant coefficients inside that
                # window — flushing later bits early desyncs the stream
                last_new = newsig[-1]
                i = 0
                while i <= last_new:
                    target = i
                    while abs(vals[target]) != 1:
                        target += 1
                    zeros = sum(1 for j in range(i, target) if vals[j] == 0)
                    while zeros > 15:
                        code, ln = ac_code[0xF0]
                        bw.write(code, ln)
                        cnt = 0  # ZRL window: 16 zero-history positions
                        while cnt < 16:
                            a = abs(vals[i])
                            if a > 1:
                                bw.write(a & 1, 1)
                            else:
                                cnt += 1
                            i += 1
                        zeros -= 16
                    code, ln = ac_code[(zeros << 4) | 1]
                    bw.write(code, ln)
                    bw.write(1 if vals[target] > 0 else 0, 1)
                    while i <= target:
                        a = abs(vals[i])
                        if a > 1:
                            bw.write(a & 1, 1)
                        i += 1
                if last_new < se - ss:
                    # band tail: this block starts (or joins) an EOB run;
                    # its remaining correction bits ride the run buffer
                    eobrun += 1
                    pending.extend(
                        abs(v) & 1 for v in vals[newsig[-1] + 1 :] if abs(v) > 1
                    )
            _emit_eobrun(bw, ac_code, eobrun, pending)
            out += bw.flush()

    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# TIFF (baseline: uncompressed / PackBits / TIFF-LZW, 8-bit, chunky)
# ---------------------------------------------------------------------------


def _packbits_decode(data: bytes, max_out: int):
    """Apple PackBits RLE (TIFF compression 32773). Returns bytes or
    None on malformation / output overflow."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        c = data[i]
        i += 1
        if c == 128:  # no-op
            continue
        if c < 128:  # literal run of c+1 bytes
            if i + c + 1 > n:
                return None
            out += data[i : i + c + 1]
            i += c + 1
        else:  # repeat next byte 257-c times
            if i >= n:
                return None
            out += bytes([data[i]]) * (257 - c)
            i += 1
        if len(out) > max_out:
            return None
    return bytes(out)


def _packbits_encode(data: bytes) -> bytes:
    """PackBits compressor (repeat runs >= 3 coded, else literals)."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 3:
            out += bytes([257 - run, data[i]])
            i += run
            continue
        j = i + run
        while j < n and j - i < 128:
            r = 1
            while j + r < n and r < 3 and data[j + r] == data[j]:
                r += 1
            if r >= 3:
                break
            j += 1
        out += bytes([j - i - 1]) + data[i:j]
        i = j
    return bytes(out)


def _tiff_lzw_decode(data: bytes, max_out: int):
    """TIFF-flavor LZW (compression 5): MSB-first bit packing and the
    EARLY code-width change (width grows one code sooner than GIF's) —
    TIFF 6.0 §13. 8-bit roots, CLEAR=256, EOI=257."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    table: list[bytes] = []

    def reset():
        nonlocal table, width, next_code, prev
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9
        next_code = 258
        prev = None

    width = 9
    next_code = 258
    prev: bytes | None = None
    reset()
    acc = 0
    nbits = 0
    for byte in data:
        acc = (acc << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (acc >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            if code == CLEAR:
                reset()
                continue
            if code == EOI:
                return bytes(out)
            if prev is None:
                if code >= len(table):
                    return None
                entry = table[code]
            elif code < len(table):
                entry = table[code]
            elif code == len(table):  # KwKwK
                entry = prev + prev[:1]
            else:
                return None
            out += entry
            if len(out) > max_out:
                return None
            if prev is not None and len(table) < 4096:
                table.append(prev + entry[:1])
            # EARLY CHANGE (TIFF 6.0 §13): the decoder widens when the
            # next free index reaches 2^width - 1 — one code earlier
            # than GIF — compensating its one-entry lag vs the encoder
            if len(table) >= (1 << width) - 1 and width < 12:
                width += 1
            prev = entry
    return bytes(out)


def _tiff_lzw_encode(data: bytes) -> bytes:
    """TIFF-flavor LZW compressor, inverse of :func:`_tiff_lzw_decode`
    (MSB-first, early change)."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    acc = 0
    nbits = 0
    width = 9

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    emit(CLEAR)
    w = b""
    for b in data:
        wk = w + bytes([b])
        if wk in table:
            w = wk
            continue
        emit(table[w])
        table[wk] = next_code
        next_code += 1
        # the encoder's next_code runs one ahead of the decoder's next
        # free index, so it widens at 2^width where the decoder widens
        # at 2^width - 1 — the pair lands on the same code boundary
        if next_code >= (1 << width) and width < 12:
            width += 1
        if next_code >= 4094:
            emit(CLEAR)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        w = bytes([b])
    if w:
        emit(table[w])
        # the decoder still ADDS an entry for this final code (the
        # encoder doesn't), which can cross a width boundary right
        # before EOI — widen so EOI is read at the decoder's width
        if next_code >= (1 << width) - 1 and width < 12:
            width += 1
    emit(EOI)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


_TIFF_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}


def decode_tiff(payload: bytes):
    """Baseline TIFF decode — pure numpy, TIFF 6.0: both byte orders,
    first IFD, 8-bit chunky (PlanarConfiguration=1) gray/RGB/RGBA,
    strip-organized, compression 1 (none), 5 (TIFF-LZW with early
    change) or 32773 (PackBits) → (H, W, C) uint8. Tiled, planar,
    16-bit, palette, and predictor!=1 images return None — same
    return-None-never-crash contract as the other decoders."""
    n = len(payload)
    if n < 8:
        return None
    if payload[:4] == b"II*\x00":
        bo = "little"
    elif payload[:4] == b"MM\x00*":
        bo = "big"
    else:
        return None

    def u16(off):
        return int.from_bytes(payload[off : off + 2], bo)

    def u32(off):
        return int.from_bytes(payload[off : off + 4], bo)

    ifd = u32(4)
    if ifd + 2 > n:
        return None
    count = u16(ifd)
    tags: dict[int, tuple[int, int, int]] = {}  # tag -> (type, n, value_off)
    for i in range(count):
        e = ifd + 2 + 12 * i
        if e + 12 > n:
            return None
        tag, typ, cnt = u16(e), u16(e + 2), u32(e + 4)
        size = _TIFF_TYPE_SIZES.get(typ)
        if size is None:
            continue
        voff = e + 8 if size * cnt <= 4 else u32(e + 8)
        tags[tag] = (typ, cnt, voff)

    def values(tag, default=None):
        if tag not in tags:
            return default
        typ, cnt, voff = tags[tag]
        size = _TIFF_TYPE_SIZES[typ]
        if voff + size * cnt > n:
            return default
        if typ == 3:
            return [u16(voff + 2 * i) for i in range(cnt)]
        if typ == 4:
            return [u32(voff + 4 * i) for i in range(cnt)]
        if typ == 1:
            return list(payload[voff : voff + cnt])
        return default

    def one(tag, default=None):
        v = values(tag)
        return v[0] if v else default

    w = one(256)
    h = one(257)
    spp = one(277, 1)
    comp = one(259, 1)
    planar = one(284, 1)
    predictor = one(317, 1)
    photometric = one(262, 1 if spp == 1 else 2)
    bits = values(258, [8])
    offsets = values(273)
    counts = values(279)
    rows_per_strip = one(278, h or 0)
    if (
        not w
        or not h
        or w * h > _MAX_PIXELS
        or spp not in (1, 3, 4)
        or planar != 1
        or predictor != 1
        or comp not in (1, 5, 32773)
        # photometric must MATCH the sample layout: 0/1 = grayscale
        # (WhiteIsZero inverted below), 2 = RGB(A); palette (3) and
        # the separation/YCbCr spaces are out of scope -> None, never
        # raw index values masquerading as gray pixels
        or (spp == 1 and photometric not in (0, 1))
        or (spp > 1 and photometric != 2)
        or not bits
        or any(b != 8 for b in bits)
        or not offsets
        or not counts
        or len(offsets) != len(counts)
    ):
        return None
    stride = w * spp
    out = bytearray()
    remaining = h
    for off, cnt in zip(offsets, counts):
        if off + cnt > n or remaining <= 0:
            return None
        strip_rows = min(rows_per_strip, remaining)
        want = strip_rows * stride
        raw = payload[off : off + cnt]
        if comp == 1:
            dec = raw
        elif comp == 32773:
            dec = _packbits_decode(raw, want)
        else:
            dec = _tiff_lzw_decode(raw, want)
        if dec is None or len(dec) < want:
            return None
        out += dec[:want]
        remaining -= strip_rows
    if remaining != 0:
        return None
    img = np.frombuffer(bytes(out), np.uint8).reshape(h, w, spp)
    if photometric == 0:  # WhiteIsZero: min value is white → invert
        img = 255 - img
    return np.ascontiguousarray(img)


def encode_tiff(img, compression: int = 1, rows_per_strip: int = 8) -> bytes:
    """Baseline TIFF writer (little-endian, one IFD, strip-organized,
    8-bit chunky), inverse of :func:`decode_tiff`. ``compression``:
    1 = none, 5 = TIFF-LZW, 32773 = PackBits."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] not in (1, 3, 4):
        raise ValueError(f"expected (H, W, 1|3|4) uint8, got {img.shape}")
    if compression not in (1, 5, 32773):
        raise ValueError("compression must be 1, 5 or 32773")
    h, w, spp = img.shape
    flat = img.reshape(h, w * spp)
    strips = []
    for y0 in range(0, h, rows_per_strip):
        raw = flat[y0 : y0 + rows_per_strip].tobytes()
        if compression == 5:
            strips.append(_tiff_lzw_encode(raw))
        elif compression == 32773:
            strips.append(_packbits_encode(raw))
        else:
            strips.append(raw)
    n_strips = len(strips)
    photometric = 1 if spp == 1 else 2  # BlackIsZero / RGB

    entries = []  # (tag, type, count, value) — value inline or offset

    # layout: header(8) + strip data + [bits array][offsets][counts] + IFD
    pos = 8
    strip_offsets = []
    for s in strips:
        strip_offsets.append(pos)
        pos += len(s)
    if pos & 1:
        pos += 1
    aux = bytearray()

    def aux_array(vals, typ):
        nonlocal pos
        size = _TIFF_TYPE_SIZES[typ]
        off = pos
        for v in vals:
            aux.extend(int(v).to_bytes(size, "little"))
        pos += size * len(vals)
        return off

    bits_val = (
        8 if spp == 1 else aux_array([8] * spp, 3)
    )
    off_val = (
        strip_offsets[0] if n_strips == 1 else aux_array(strip_offsets, 4)
    )
    cnt_val = (
        len(strips[0]) if n_strips == 1 else aux_array([len(s) for s in strips], 4)
    )
    entries = [
        (256, 4, 1, w),
        (257, 4, 1, h),
        (258, 3, spp, bits_val),
        (259, 3, 1, compression),
        (262, 3, 1, photometric),
        (273, 4, n_strips, off_val),
        (277, 3, 1, spp),
        (278, 4, 1, rows_per_strip),
        (279, 4, n_strips, cnt_val),
        (284, 3, 1, 1),  # chunky
    ]
    ifd_off = pos
    out = bytearray(b"II*\x00")
    out += ifd_off.to_bytes(4, "little")
    for s in strips:
        out += s
    if len(out) & 1:
        out += b"\x00"
    out += aux
    out += len(entries).to_bytes(2, "little")
    for tag, typ, cnt, val in entries:
        out += tag.to_bytes(2, "little")
        out += typ.to_bytes(2, "little")
        out += cnt.to_bytes(4, "little")
        size = _TIFF_TYPE_SIZES[typ]
        if size * cnt <= 4:
            # every inline entry this writer emits is single-valued
            # (multi-value arrays always exceed 4 bytes for spp 1/3/4)
            assert cnt == 1, "inline multi-value IFD entries unsupported"
            out += int(val).to_bytes(size, "little") + b"\x00" * (4 - size)
        else:
            out += int(val).to_bytes(4, "little")
    out += b"\x00\x00\x00\x00"  # no next IFD
    return bytes(out)
