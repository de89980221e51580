"""IMA/DVI ADPCM WAV codec — pure numpy, zero external dependencies.

Closes the last self-contained compressed-audio gap in
`operators/multimodal.py`: WAVE format tag 0x11 (IMA ADPCM, the 4:1
compressed WAV variant every desktop OS ships) now decodes to real
int16 samples next to PCM (stdlib ``wave``) and G.711 (µ-law/A-law
tables). FLAC/OGG/MP3 still genuinely need soundfile and stay behind
the ``_HAVE_AUDIO`` gate.

The decode recurrence (predictor + step-index per sample) is
non-associative, but IMA ADPCM is BLOCK-structured: every block of
``block_align`` bytes restarts the predictor from its own 4-byte
header. Blocks are therefore independent, and the kernel runs the
sample loop once per block POSITION while vectorizing across all
blocks with numpy — cost O(samples_per_block) Python iterations per
payload regardless of duration, the same trick a columnar engine uses
for block-independent compression. Same contract as the image codecs:
**return None, never crash** on malformed payloads.
"""

from __future__ import annotations

import struct

import numpy as np

#: Normative IMA ADPCM step-size table (89 entries) — from the public
#: IMA "Recommended Practices for Enhancing Digital Audio
#: Compatibility" spec; also in every OSS decoder (e.g. ffmpeg
#: adpcm.c). The quasi-geometric (~×1.1) progression is defined by
#: this exact list, not a formula, so it is transcribed.
_IMA_STEPS = np.array(
    [
        7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
        34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130,
        143, 157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408,
        449, 494, 544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282,
        1411, 1552, 1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327,
        3660, 4026, 4428, 4871, 5358, 5894, 6484, 7132, 7845, 8630,
        9493, 10442, 11487, 12635, 13899, 15289, 16818, 18500, 20350,
        22385, 24623, 27086, 29794, 32767,
    ],
    dtype=np.int32,
)

#: Step-index adjustment per nibble magnitude (sign bit ignored).
_IMA_INDEX_ADJ = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int32)


def _ima_decode_nibbles(nibbles: np.ndarray, pred0: np.ndarray, idx0: np.ndarray):
    """Decode (n_blocks, n_samples) nibble grid → int16 samples, given
    per-block initial predictors/indices. The j-loop is per sample
    POSITION; every operation inside is vectorized across blocks."""
    n_blocks, n_samples = nibbles.shape
    out = np.empty((n_blocks, n_samples), dtype=np.int16)
    pred = pred0.astype(np.int32).copy()
    idx = np.clip(idx0.astype(np.int32), 0, 88)
    for j in range(n_samples):
        nib = nibbles[:, j].astype(np.int32)
        step = _IMA_STEPS[idx]
        mag = nib & 0x7
        # diff = (step * mag) / 4 + step / 8, computed in integer
        # shifts exactly as the spec's reference decoder does
        diff = (
            (step >> 3)
            + np.where(mag & 4, step, 0)
            + np.where(mag & 2, step >> 1, 0)
            + np.where(mag & 1, step >> 2, 0)
        )
        pred = np.clip(
            np.where(nib & 8, pred - diff, pred + diff), -32768, 32767
        )
        out[:, j] = pred.astype(np.int16)
        idx = np.clip(idx + _IMA_INDEX_ADJ[mag], 0, 88)
    return out


def decode_wav_ima_adpcm(payload: bytes):
    """REAL IMA ADPCM WAV decode (format tag 0x11) → ``(mono_int16,
    rate)`` or None. Hand-parses the RIFF chunk list (word-aligned),
    splits the data chunk into independent ``block_align`` blocks, and
    decodes all blocks in lockstep (see module docstring). Stereo
    blocks carry one 4-byte state header per channel then interleave
    4-byte nibble words per channel; channels are averaged to mono —
    the same contract as the PCM/G.711 paths."""
    n = len(payload)
    if n < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    pos = 12
    fmt = None  # (nch, rate, block_align, samples_per_block)
    data_span = None
    while pos + 8 <= n:
        cid = payload[pos : pos + 4]
        clen = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        if cid == b"fmt " and clen >= 16 and pos + 8 + 16 <= n:
            tag = int.from_bytes(payload[pos + 8 : pos + 10], "little")
            if tag != 0x11:
                return None  # not IMA ADPCM — let the other decoders try
            nch = int.from_bytes(payload[pos + 10 : pos + 12], "little")
            rate = int.from_bytes(payload[pos + 12 : pos + 16], "little")
            block_align = int.from_bytes(payload[pos + 20 : pos + 22], "little")
            bits = int.from_bytes(payload[pos + 22 : pos + 24], "little")
            spb = None
            if clen >= 20 and pos + 8 + 20 <= n:  # cbSize + wSamplesPerBlock
                spb = int.from_bytes(payload[pos + 26 : pos + 28], "little")
            if bits != 4 or nch not in (1, 2) or not rate or not block_align:
                return None
            fmt = (nch, rate, block_align, spb)
        elif cid == b"data":
            data_span = (pos + 8, min(clen, n - pos - 8))
        pos += 8 + clen + (clen & 1)
    if fmt is None or data_span is None:
        return None
    nch, rate, block_align, spb = fmt
    if block_align < 4 * nch or block_align % (4 * nch):
        return None
    off, dlen = data_span
    n_blocks = dlen // block_align
    if n_blocks == 0:
        return None
    raw = np.frombuffer(payload, np.uint8, count=n_blocks * block_align, offset=off)
    blocks = raw.reshape(n_blocks, block_align)
    # nibble payload after the per-channel 4-byte state headers
    data_bytes = block_align - 4 * nch
    samples_per_block = 1 + data_bytes * 2 // nch  # header sample + nibbles
    if spb:  # the fmt chunk may declare fewer (trailing pad nibbles)
        samples_per_block = min(samples_per_block, spb)
    chans = []
    for c in range(nch):
        hdr = blocks[:, 4 * c : 4 * c + 4]
        pred0 = hdr[:, 0].astype(np.int16).astype(np.int32) | (
            hdr[:, 1].astype(np.int8).astype(np.int32) << 8
        )
        idx0 = np.clip(hdr[:, 2].astype(np.int32), 0, 88)
        body = blocks[:, 4 * nch :]
        if nch == 2:
            # interleaved 4-byte words: words 0,2,4.. = ch0; 1,3,5.. = ch1
            words = body.reshape(n_blocks, -1, 4)
            body = words[:, c::2, :].reshape(n_blocks, -1)
        lo = body & 0x0F
        hi = body >> 4
        nibs = np.empty((n_blocks, body.shape[1] * 2), dtype=np.uint8)
        nibs[:, 0::2] = lo  # low nibble first, per spec
        nibs[:, 1::2] = hi
        want = samples_per_block - 1  # header carries sample 0
        dec = _ima_decode_nibbles(nibs[:, :want], pred0, idx0)
        chans.append(
            np.concatenate(
                [pred0.astype(np.int16)[:, None], dec], axis=1
            ).reshape(-1)
        )
    if nch == 1:
        return chans[0], rate
    return ((chans[0].astype(np.int32) + chans[1]) // 2).astype(np.int16), rate


def _ima_encode_block(samples: np.ndarray, idx0: int):
    """Encode one channel-block: samples[0] becomes the header
    predictor; the rest quantize through the standard encoder
    recurrence. Returns (nibbles uint8 array, final index)."""
    pred = int(samples[0])
    idx = idx0
    nibs = np.empty(len(samples) - 1, dtype=np.uint8)
    for j in range(1, len(samples)):
        step = int(_IMA_STEPS[idx])
        diff = int(samples[j]) - pred
        nib = 8 if diff < 0 else 0
        diff = abs(diff)
        if diff >= step:
            nib |= 4
            diff -= step
        if diff >= step >> 1:
            nib |= 2
            diff -= step >> 1
        if diff >= step >> 2:
            nib |= 1
        mag = nib & 7
        delta = (
            (step >> 3)
            + (step if mag & 4 else 0)
            + ((step >> 1) if mag & 2 else 0)
            + ((step >> 2) if mag & 1 else 0)
        )
        pred = max(-32768, min(32767, pred - delta if nib & 8 else pred + delta))
        idx = max(0, min(88, idx + int(_IMA_INDEX_ADJ[mag])))
        nibs[j - 1] = nib
    return nibs, idx


def encode_wav_ima_adpcm(
    samples, rate: int, block_samples: int = 505, channels: int = 1
) -> bytes:
    """REAL IMA ADPCM WAV writer, inverse of :func:`decode_wav_ima_adpcm`.
    ``samples`` is mono int16 (``channels=2`` duplicates it to both
    channels — enough to exercise the stereo word interleave). Blocks
    carry ``block_samples`` samples each (header + nibbles; must be
    odd so the nibble count is even); the tail block is padded by
    repeating the last sample, with the true length declared via
    ``wSamplesPerBlock``-style trailing silence (standard practice)."""
    samples = np.asarray(samples, dtype=np.int16)
    if samples.ndim != 1 or len(samples) == 0:
        raise ValueError("need a non-empty 1-D int16 array")
    if rate <= 0:
        raise ValueError("rate must be positive")
    if block_samples < 3 or block_samples % 2 == 0:
        raise ValueError("block_samples must be odd and >= 3")
    if channels not in (1, 2):
        raise ValueError("channels must be 1 or 2")
    pad = (-len(samples)) % block_samples
    padded = np.concatenate([samples, np.repeat(samples[-1:], pad)])
    data_bytes_per_chan = (block_samples - 1) // 2
    block_align = (4 + data_bytes_per_chan) * channels
    blocks = []
    idx = 0
    for start in range(0, len(padded), block_samples):
        blk = padded[start : start + block_samples]
        idx_at_start = idx  # header carries the index the DECODER starts from
        nibs, idx = _ima_encode_block(blk, idx_at_start)
        packed = (nibs[0::2] | (nibs[1::2] << 4)).astype(np.uint8)
        hdr = struct.pack("<hBB", int(blk[0]), idx_at_start, 0)
        if channels == 1:
            blocks.append(hdr + packed.tobytes())
        else:  # duplicate channel: two headers, interleaved 4-byte words
            words = packed.reshape(-1, 4)
            inter = np.empty((words.shape[0] * 2, 4), dtype=np.uint8)
            inter[0::2] = words
            inter[1::2] = words
            blocks.append(hdr + hdr + inter.tobytes())
    data = b"".join(blocks)
    spb = block_samples
    byte_rate = rate * block_align // max(spb, 1)
    fmt = struct.pack(
        "<HHIIHHHH",
        0x11, channels, rate, byte_rate, block_align, 4, 2, spb
    )
    out = b"WAVE"
    out += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    out += b"data" + struct.pack("<I", len(data)) + data
    if len(data) & 1:
        out += b"\x00"
    return b"RIFF" + struct.pack("<I", len(out)) + out


# ---------------------------------------------------------------------------
# FLAC (free lossless audio codec — decoder + test-harness encoder)
# ---------------------------------------------------------------------------
#
# Pure-Python/numpy implementation of the public FLAC format
# (xiph.org/flac/format.html; also RFC 9639): STREAMINFO metadata,
# frame sync + UTF-8-style coded numbers, CRC-8/CRC-16 verification,
# all four subframe types (CONSTANT / VERBATIM / FIXED 0-4 / LPC),
# partitioned Rice residuals with escape codes, wasted bits, and the
# four stereo decorrelation modes (independent, left/side, right/side,
# mid/side). Same kernel contract as the rest of the module: decode
# returns None on anything malformed, never raises.

_FLAC_BLOCK_SIZES = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096, 13: 8192,
    14: 16384, 15: 32768,
}
_FLAC_RATES = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}
_FLAC_BPS = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}

#: Warmup-differencing coefficients of the FIXED predictors, order 0-4
#: (successive finite differences — spec §"fixed predictors").
_FIXED_COEFS = [[], [1], [2, -1], [3, -3, 1], [4, -6, 4, -1]]


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = (
                ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
            )
    return crc


class _FlacBitReader:
    """MSB-first bit reader with byte-position access (for CRC spans)."""

    __slots__ = ("data", "bitpos")

    def __init__(self, data: bytes, bitpos: int = 0):
        self.data = data
        self.bitpos = bitpos

    def read(self, n: int) -> int:
        end = self.bitpos + n
        if end > len(self.data) * 8:
            raise EOFError
        v = 0
        pos = self.bitpos
        while n > 0:
            byte = self.data[pos >> 3]
            avail = 8 - (pos & 7)
            take = min(avail, n)
            shift = avail - take
            v = (v << take) | ((byte >> shift) & ((1 << take) - 1))
            pos += take
            n -= take
        self.bitpos = pos
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >> (n - 1) else v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
            if q > 1 << 24:  # runaway guard on corrupt data
                raise ValueError("unary overflow")
        return q

    def align(self) -> None:
        self.bitpos = (self.bitpos + 7) & ~7


def _flac_utf8_number(br: _FlacBitReader) -> int:
    """FLAC's UTF-8-style coded frame/sample number (up to 36 bits)."""
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    nbytes = 0
    mask = 0x80
    while b0 & mask:
        nbytes += 1
        mask >>= 1
    if nbytes < 2 or nbytes > 7:
        raise ValueError("bad utf8 number")
    v = b0 & (0xFF >> (nbytes + 1))
    for _ in range(nbytes - 1):
        b = br.read(8)
        if b & 0xC0 != 0x80:
            raise ValueError("bad utf8 continuation")
        v = (v << 6) | (b & 0x3F)
    return v


def _flac_residual(br: _FlacBitReader, blocksize: int, order: int):
    """Partitioned Rice residual (spec §residual coding)."""
    method = br.read(2)
    if method > 1:
        raise ValueError("reserved residual method")
    plen = 4 if method == 0 else 5
    escape = (1 << plen) - 1
    porder = br.read(4)
    nparts = 1 << porder
    if blocksize % nparts:
        raise ValueError("partition count must divide block size")
    out = []
    for p in range(nparts):
        cnt = blocksize // nparts - (order if p == 0 else 0)
        if cnt < 0:
            raise ValueError("bad partition order")
        param = br.read(plen)
        if param == escape:
            bits = br.read(5)
            for _ in range(cnt):
                out.append(br.read_signed(bits) if bits else 0)
        else:
            for _ in range(cnt):
                q = br.read_unary()
                low = br.read(param) if param else 0
                z = (q << param) | low
                out.append((z >> 1) ^ -(z & 1))  # un-zigzag
    return out


def _flac_subframe(br: _FlacBitReader, blocksize: int, bps: int):
    if br.read(1) != 0:
        raise ValueError("subframe padding bit set")
    stype = br.read(6)
    wasted = 0
    if br.read(1):  # wasted-bits flag: unary count - 1
        wasted = 1 + br.read_unary()
    eff = bps - wasted
    if eff <= 0:
        raise ValueError("no effective bits")
    if stype == 0:  # CONSTANT
        v = br.read_signed(eff)
        samples = [v] * blocksize
    elif stype == 1:  # VERBATIM
        samples = [br.read_signed(eff) for _ in range(blocksize)]
    elif 8 <= stype <= 12:  # FIXED, order = stype - 8
        order = stype - 8
        warm = [br.read_signed(eff) for _ in range(order)]
        resid = _flac_residual(br, blocksize, order)
        samples = list(warm)
        coefs = _FIXED_COEFS[order]
        for i in range(order, blocksize):
            pred = sum(c * samples[i - 1 - j] for j, c in enumerate(coefs))
            samples.append(resid[i - order] + pred)
    elif stype >= 32:  # LPC, order = (stype & 31) + 1
        order = (stype & 31) + 1
        warm = [br.read_signed(eff) for _ in range(order)]
        prec = br.read(4)
        if prec == 15:
            raise ValueError("invalid lpc precision")
        prec += 1
        shift = br.read_signed(5)
        if shift < 0:
            raise ValueError("negative lpc shift")
        coefs = [br.read_signed(prec) for _ in range(order)]
        resid = _flac_residual(br, blocksize, order)
        samples = list(warm)
        for i in range(order, blocksize):
            acc = sum(c * samples[i - 1 - j] for j, c in enumerate(coefs))
            samples.append(resid[i - order] + (acc >> shift))
    else:
        raise ValueError("reserved subframe type")
    if wasted:
        samples = [s << wasted for s in samples]
    return samples


def decode_flac(payload: bytes):
    """REAL FLAC decode → ``(mono_int16, rate)`` or None. Walks the
    metadata blocks (STREAMINFO required), then every frame: sync +
    CRC-8-verified header, subframes per channel with the four stereo
    decorrelation modes undone, CRC-16-verified frame tail. Sample
    sizes 8/16/24 scale to int16 (>> for wider, << for narrower);
    channels average to mono — the contract every WAV path shares."""
    if len(payload) < 42 or payload[:4] != b"fLaC":
        return None
    try:
        pos = 4
        streaminfo = None
        while pos + 4 <= len(payload):
            hdr = payload[pos]
            btype = hdr & 0x7F
            blen = int.from_bytes(payload[pos + 1 : pos + 4], "big")
            body = payload[pos + 4 : pos + 4 + blen]
            if len(body) != blen:
                return None
            if btype == 0:
                streaminfo = body
            pos += 4 + blen
            if hdr & 0x80:  # last-metadata-block flag
                break
        if streaminfo is None or len(streaminfo) < 18:
            return None
        si = _FlacBitReader(streaminfo)
        si.read(16)  # min block size
        si.read(16)  # max block size
        si.read(24)
        si.read(24)  # min/max frame size
        rate = si.read(20)
        nch = si.read(3) + 1
        bps = si.read(5) + 1
        total = si.read(36)
        if rate == 0 or nch > 8 or bps not in (8, 16, 24):
            return None
        chans = [[] for _ in range(nch)]
        data = payload
        n = len(data)
        while pos + 2 <= n:
            if data[pos] != 0xFF or (data[pos + 1] & 0xFC) != 0xF8:
                return None  # lost sync
            frame_start = pos
            br = _FlacBitReader(data, pos * 8)
            br.read(14)  # sync
            br.read(1)  # reserved
            br.read(1)  # blocking strategy
            bs_code = br.read(4)
            sr_code = br.read(4)
            ch_code = br.read(4)
            ss_code = br.read(3)
            br.read(1)  # reserved
            _num = _flac_utf8_number(br)
            if bs_code == 0:
                return None
            if bs_code == 6:
                blocksize = br.read(8) + 1
            elif bs_code == 7:
                blocksize = br.read(16) + 1
            else:
                blocksize = _FLAC_BLOCK_SIZES[bs_code]
            if sr_code == 12:
                br.read(8)
            elif sr_code in (13, 14):
                br.read(16)
            elif sr_code == 15:
                return None
            fbps = _FLAC_BPS.get(ss_code, bps) if ss_code else bps
            hdr_end = (br.bitpos + 7) // 8
            if _crc8(data[frame_start:hdr_end]) != br.read(8):
                return None
            if ch_code < 8:
                if ch_code + 1 != nch:
                    return None
                subs = [_flac_subframe(br, blocksize, fbps) for _ in range(nch)]
            elif ch_code in (8, 9, 10):  # left/side, right/side, mid/side
                if nch != 2:
                    return None
                a_bits = fbps + (1 if ch_code in (9, 10) else 0)
                b_bits = fbps + (1 if ch_code in (8, 10) else 0)
                if ch_code == 10:
                    a_bits, b_bits = fbps, fbps + 1
                sub_a = _flac_subframe(br, blocksize, a_bits)
                sub_b = _flac_subframe(br, blocksize, b_bits)
                if ch_code == 8:  # left + side (side = left - right)
                    subs = [sub_a, [l - s for l, s in zip(sub_a, sub_b)]]
                elif ch_code == 9:  # side + right
                    subs = [[r + s for r, s in zip(sub_b, sub_a)], sub_b]
                else:  # mid + side
                    left, right = [], []
                    for m, s in zip(sub_a, sub_b):
                        m = (m << 1) | (s & 1)
                        left.append((m + s) >> 1)
                        right.append((m - s) >> 1)
                    subs = [left, right]
            else:
                return None
            br.align()
            crc_end = br.bitpos // 8
            if _crc16(data[frame_start:crc_end]) != br.read(16):
                return None
            for c in range(nch):
                chans[c].extend(subs[c])
            pos = crc_end + 2
            if total and len(chans[0]) >= total:
                break
        if not chans[0]:
            return None
        arr = np.array(chans, dtype=np.int64)
        if total:
            arr = arr[:, :total]
        mono = arr.mean(axis=0)
        if bps == 24:
            mono = mono / 256.0
        elif bps == 8:
            mono = mono * 256.0
        return np.clip(np.round(mono), -32768, 32767).astype(np.int16), rate
    except (EOFError, ValueError, IndexError, KeyError, OverflowError):
        return None


class _FlacBitWriter:
    """MSB-first bit writer for FLAC frames."""

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
            self.out.append((self.acc >> self.nbits) & 0xFF)

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)


def _flac_write_utf8(bw: _FlacBitWriter, v: int) -> None:
    if v < 0x80:
        bw.write(v, 8)
        return
    payload_bits = v.bit_length()
    nbytes = 2
    while payload_bits > 6 * (nbytes - 1) + (7 - nbytes):
        nbytes += 1
    lead = (0xFF << (8 - nbytes)) & 0xFF
    bw.write(lead | (v >> (6 * (nbytes - 1))), 8)
    for i in range(nbytes - 2, -1, -1):
        bw.write(0x80 | ((v >> (6 * i)) & 0x3F), 8)


def _flac_write_residual(bw, resid, blocksize, order, porder, force_escape):
    bw.write(0, 2)  # method 0: 4-bit rice params
    bw.write(porder, 4)
    nparts = 1 << porder
    idx = 0
    for p in range(nparts):
        cnt = blocksize // nparts - (order if p == 0 else 0)
        part = resid[idx : idx + cnt]
        idx += cnt
        zig = [((v << 1) if v >= 0 else (-(v << 1) - 1)) for v in part]
        if force_escape:
            bits = max((abs(v).bit_length() + 1 for v in part), default=1)
            bw.write(0xF, 4)
            bw.write(bits, 5)
            for v in part:
                bw.write(v & ((1 << bits) - 1), bits)
            continue
        mean = (sum(zig) // max(cnt, 1)) if cnt else 0
        param = max(0, mean.bit_length() - 1)
        param = min(param, 14)
        bw.write(param, 4)
        for z in zig:
            bw.write_unary(z >> param)
            if param:
                bw.write(z & ((1 << param) - 1), param)


def _flac_write_subframe(bw, samples, bps, mode, porder, force_escape):
    blocksize = len(samples)
    bw.write(0, 1)  # padding
    if mode == "constant" and len(set(samples)) == 1:
        bw.write(0, 6)
        bw.write(0, 1)  # no wasted bits
        bw.write(samples[0] & ((1 << bps) - 1), bps)
        return
    if mode == "verbatim":
        bw.write(1, 6)
        bw.write(0, 1)
        for s in samples:
            bw.write(s & ((1 << bps) - 1), bps)
        return
    if mode == "lpc":
        # order-2 LPC with quantized coefficients ~ the FIXED order-2
        # predictor scaled by 2^5: a1=2, a2=-1 → coefs [64, -32], shift 5
        order, prec, shift = 2, 12, 5
        coefs = [64, -32]
        bw.write(32 + order - 1, 6)
        bw.write(0, 1)
        for s in samples[:order]:
            bw.write(s & ((1 << bps) - 1), bps)
        bw.write(prec - 1, 4)
        bw.write(shift, 5)
        for c in coefs:
            bw.write(c & ((1 << prec) - 1), prec)
        resid = [
            samples[i]
            - ((coefs[0] * samples[i - 1] + coefs[1] * samples[i - 2]) >> shift)
            for i in range(order, blocksize)
        ]
        _flac_write_residual(bw, resid, blocksize, order, porder, force_escape)
        return
    # FIXED order 2 (default): resid = s[i] - 2 s[i-1] + s[i-2]
    order = min(2, blocksize - 1) if blocksize > 1 else 0
    coefs = _FIXED_COEFS[order]
    bw.write(8 + order, 6)
    bw.write(0, 1)
    for s in samples[:order]:
        bw.write(s & ((1 << bps) - 1), bps)
    resid = [
        samples[i] - sum(c * samples[i - 1 - j] for j, c in enumerate(coefs))
        for i in range(order, blocksize)
    ]
    _flac_write_residual(bw, resid, blocksize, order, porder, force_escape)


def encode_flac(
    samples,
    rate: int,
    channels: int = 1,
    block_size: int = 1024,
    mode: str = "fixed",
    stereo_mode: str = "independent",
    porder: int = 0,
    force_escape: bool = False,
) -> bytes:
    """Test-harness FLAC writer, inverse of :func:`decode_flac`:
    STREAMINFO + fixed-blocking frames with real CRC-8/CRC-16.
    ``samples`` is mono int16; ``channels=2`` encodes (left=samples,
    right=samples>>1) to exercise decorrelation. ``mode``:
    constant-aware ``fixed`` (order 2), ``verbatim``, or ``lpc``
    (order-2 quantized coefficients). ``stereo_mode``: independent /
    left_side / right_side / mid_side. ``porder`` partitions the Rice
    residual; ``force_escape`` uses raw-bit escape partitions."""
    samples = [int(s) for s in np.asarray(samples, dtype=np.int16)]
    if not samples:
        raise ValueError("need samples")
    if rate <= 0 or not 1 <= rate < (1 << 20):
        raise ValueError("bad rate")
    if channels not in (1, 2):
        raise ValueError("channels must be 1 or 2")
    if block_size % (1 << porder):
        raise ValueError("porder must divide block_size")
    bps = 16
    total = len(samples)
    # STREAMINFO
    si = _FlacBitWriter()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(rate, 20)
    si.write(channels - 1, 3)
    si.write(bps - 1, 5)
    si.write(total, 36)
    si_body = bytes(si.out) + b"\x00" * 16  # md5 unset
    out = bytearray(b"fLaC")
    out += bytes([0x80]) + len(si_body).to_bytes(3, "big") + si_body
    ch_codes = {
        "independent": None,
        "left_side": 8,
        "right_side": 9,
        "mid_side": 10,
    }
    if stereo_mode not in ch_codes:
        raise ValueError("bad stereo_mode")
    frame_no = 0
    for start in range(0, total, block_size):
        blk = samples[start : start + block_size]
        bs = len(blk)
        bw = _FlacBitWriter()
        bw.write(0b11111111111110, 14)
        bw.write(0, 1)  # reserved
        bw.write(0, 1)  # fixed blocking
        bw.write(7, 4)  # blocksize: explicit 16-bit field
        bw.write(0, 4)  # sample rate: from STREAMINFO
        if channels == 1:
            bw.write(0, 4)
        elif stereo_mode == "independent":
            bw.write(1, 4)
        else:
            bw.write(ch_codes[stereo_mode], 4)
        bw.write(4, 3)  # bps: 16
        bw.write(0, 1)
        _flac_write_utf8(bw, frame_no)
        bw.write(bs - 1, 16)
        hdr = bytes(bw.out)
        assert bw.nbits == 0
        bw.write(_crc8(hdr), 8)
        if channels == 1:
            _flac_write_subframe(bw, blk, bps, mode, porder, force_escape)
        else:
            left = blk
            right = [s >> 1 for s in blk]
            if stereo_mode == "independent":
                _flac_write_subframe(bw, left, bps, mode, porder, force_escape)
                _flac_write_subframe(bw, right, bps, mode, porder, force_escape)
            else:
                side = [l - r for l, r in zip(left, right)]
                if stereo_mode == "left_side":
                    _flac_write_subframe(bw, left, bps, mode, porder, force_escape)
                    _flac_write_subframe(bw, side, bps + 1, mode, porder, force_escape)
                elif stereo_mode == "right_side":
                    _flac_write_subframe(bw, side, bps + 1, mode, porder, force_escape)
                    _flac_write_subframe(bw, right, bps, mode, porder, force_escape)
                else:
                    mid = [(l + r) >> 1 for l, r in zip(left, right)]
                    _flac_write_subframe(bw, mid, bps, mode, porder, force_escape)
                    _flac_write_subframe(bw, side, bps + 1, mode, porder, force_escape)
        bw.align()
        frame = bytes(bw.out)
        bw.write(_crc16(frame), 16)
        out += bytes(bw.out)
        frame_no += 1
    return bytes(out)
