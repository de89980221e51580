"""IMA ADPCM WAV codec (operators/audiocodecs.py) and its wiring into
decode_audio_pcm / audio_features — the 4:1 compressed WAV variant
stdlib ``wave`` rejects, decoded block-vectorized with pure numpy."""

from __future__ import annotations

import numpy as np
import pytest

from etl_platform_nyc_taxi_spark.operators.audiocodecs import (
    _IMA_INDEX_ADJ,
    _IMA_STEPS,
    decode_wav_ima_adpcm,
    encode_wav_ima_adpcm,
)


def _sig(n=8000):
    t = np.arange(n)
    return (3000 * np.sin(t / 30) + 1500 * np.sin(t / 7)).astype(np.int16)


def test_step_table_shape_and_monotonic():
    assert len(_IMA_STEPS) == 89
    assert _IMA_STEPS[0] == 7 and _IMA_STEPS[-1] == 32767
    assert (np.diff(_IMA_STEPS) > 0).all()
    assert list(_IMA_INDEX_ADJ) == [-1, -1, -1, -1, 2, 4, 6, 8]


def test_adpcm_mono_roundtrip_quality():
    sig = _sig()
    pcm, rate = decode_wav_ima_adpcm(encode_wav_ima_adpcm(sig, 16_000))
    assert rate == 16_000
    assert len(pcm) >= len(sig)  # tail block pad
    err = np.abs(pcm[: len(sig)].astype(int) - sig.astype(int))
    # ~4 bits/sample: mean error well under 1% of signal RMS (~2372)
    assert err.mean() < 25
    # block restarts pin the header sample exactly
    assert pcm[0] == sig[0]


def test_adpcm_constant_signal_exact():
    c = np.full(1000, 1234, np.int16)
    pcm, _ = decode_wav_ima_adpcm(encode_wav_ima_adpcm(c, 8_000))
    assert (pcm[:1000] == 1234).all()


def test_adpcm_stereo_word_interleave():
    sig = _sig(3000)
    wav = encode_wav_ima_adpcm(sig, 8_000, channels=2)
    pcm, rate = decode_wav_ima_adpcm(wav)
    assert rate == 8_000
    # duplicated channels average back to the mono signal
    mono, _ = decode_wav_ima_adpcm(encode_wav_ima_adpcm(sig, 8_000))
    assert np.array_equal(pcm[: len(sig)], mono[: len(sig)])


def test_adpcm_negative_predictor_header():
    # first sample negative → int16 header round trip must sign-extend
    sig = (-_sig(2000)).astype(np.int16)
    pcm, _ = decode_wav_ima_adpcm(encode_wav_ima_adpcm(sig, 8_000))
    assert pcm[0] == sig[0]
    err = np.abs(pcm[: len(sig)].astype(int) - sig.astype(int))
    assert err.mean() < 25


def test_adpcm_block_independence():
    """Corrupting one block's nibbles cannot affect other blocks — the
    per-block state header makes blocks independently decodable."""
    sig = _sig(505 * 4)  # exactly 4 blocks at the default block size
    wav = bytearray(encode_wav_ima_adpcm(sig, 8_000))
    clean, _ = decode_wav_ima_adpcm(bytes(wav))
    i = wav.index(b"data") + 8
    block_align = 4 + (505 - 1) // 2
    # trash the middle of block 1's nibble area
    for k in range(40):
        wav[i + block_align + 10 + k] ^= 0xFF
    dirty, _ = decode_wav_ima_adpcm(bytes(wav))
    spb = 505
    assert np.array_equal(dirty[:spb], clean[:spb])  # block 0 intact
    assert not np.array_equal(dirty[spb : 2 * spb], clean[spb : 2 * spb])
    assert np.array_equal(dirty[2 * spb :], clean[2 * spb :])  # 2,3 intact


def test_adpcm_rejects_and_never_crashes():
    assert decode_wav_ima_adpcm(b"") is None
    assert decode_wav_ima_adpcm(b"RIFF\x00\x00\x00\x00WAVE") is None
    # PCM WAV (tag 1) is NOT for this decoder
    import io
    import wave as wavemod

    buf = io.BytesIO()
    with wavemod.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(_sig(100).tobytes())
    assert decode_wav_ima_adpcm(buf.getvalue()) is None
    payload = encode_wav_ima_adpcm(_sig(600), 8_000)
    r = np.random.default_rng(9)
    for cut in range(0, len(payload), 5):
        decode_wav_ima_adpcm(payload[:cut])  # never raises
    for _ in range(300):
        b = bytearray(payload)
        for _ in range(int(r.integers(1, 5))):
            b[int(r.integers(0, len(b)))] = int(r.integers(0, 256))
        decode_wav_ima_adpcm(bytes(b))


def test_adpcm_encoder_validation():
    with pytest.raises(ValueError):
        encode_wav_ima_adpcm(np.array([], np.int16), 8000)
    with pytest.raises(ValueError):
        encode_wav_ima_adpcm(_sig(10), 0)
    with pytest.raises(ValueError):
        encode_wav_ima_adpcm(_sig(10), 8000, block_samples=10)  # even
    with pytest.raises(ValueError):
        encode_wav_ima_adpcm(_sig(10), 8000, channels=3)


def test_decode_audio_pcm_reads_adpcm():
    from etl_platform_nyc_taxi_spark.operators.multimodal import (
        decode_audio_pcm,
    )

    sig = _sig(2000)
    wav = encode_wav_ima_adpcm(sig, 22_050)
    out = decode_audio_pcm(wav)
    assert out is not None
    pcm, rate = out
    assert rate == 22_050
    assert np.abs(pcm[: len(sig)].astype(int) - sig.astype(int)).mean() < 25


def test_audio_features_real_adpcm(spark):
    """ADPCM payloads ride the REAL feature path: the container rate
    (not the caller default) lands in the output."""
    from etl_platform_nyc_taxi_spark.operators.multimodal import (
        audio_features,
    )

    sig = _sig(4000)
    wav = encode_wav_ima_adpcm(sig, 32_000)
    df = spark.createDataFrame(
        [(1, bytearray(wav))], "doc_id long, payload binary"
    )
    row = audio_features(df, sample_rate=999, bands=4).collect()[0]
    # duration from the REAL container rate (pad ≤ one block), not the
    # caller's 999 Hz default the fake kernel would use
    n_padded = 4000 + (-4000) % 505
    assert row["duration_ms"] == n_padded * 1000 // 32_000
    # band features track the real decoded amplitude within ADPCM noise
    expect = [
        float(np.abs(chunk.astype(float)).mean())
        for chunk in np.array_split(sig, 4)
    ]
    got = [float(x) for x in row["feat"]]
    for g, e in zip(got, expect):
        assert abs(g - e) < 0.05 * max(e, 1.0) + 30


# ---------------------------------------------------------------- FLAC


def _flac_sig(n=3000):
    t = np.arange(n)
    return (3000 * np.sin(t / 30) + 1500 * np.sin(t / 7)).astype(np.int16)


def test_flac_lossless_roundtrip_all_subframe_types():
    from etl_platform_nyc_taxi_spark.operators.audiocodecs import (
        decode_flac,
        encode_flac,
    )

    sig = _flac_sig()
    for mode in ("fixed", "verbatim", "lpc"):
        pcm, rate = decode_flac(encode_flac(sig, 22_050, mode=mode, block_size=512))
        assert rate == 22_050 and np.array_equal(pcm, sig), mode


def test_flac_stereo_decorrelation_modes_exact():
    """left/side, right/side, and mid/side must all reconstruct the
    channels exactly (side carries bps+1 bits)."""
    from etl_platform_nyc_taxi_spark.operators.audiocodecs import (
        decode_flac,
        encode_flac,
    )

    sig = _flac_sig(2000)
    left = sig.astype(np.int64)
    right = left >> 1  # what the encoder derives for channel 2
    expect = np.clip(np.round((left + right) / 2), -32768, 32767).astype(np.int16)
    for sm in ("independent", "left_side", "right_side", "mid_side"):
        pcm, rate = decode_flac(
            encode_flac(sig, 16_000, channels=2, stereo_mode=sm, block_size=512)
        )
        assert np.array_equal(pcm, expect), sm


def test_flac_rice_partitions_and_escape():
    from etl_platform_nyc_taxi_spark.operators.audiocodecs import (
        decode_flac,
        encode_flac,
    )

    sig = _flac_sig(2048)
    for porder in (0, 1, 3):
        for esc in (False, True):
            pcm, _ = decode_flac(
                encode_flac(
                    sig, 8_000, porder=porder, force_escape=esc, block_size=1024
                )
            )
            assert np.array_equal(pcm, sig), (porder, esc)


def test_flac_constant_and_edge_signals():
    from etl_platform_nyc_taxi_spark.operators.audiocodecs import (
        decode_flac,
        encode_flac,
    )

    for s in ([5] * 700, [0], [-32768] * 10, [32767, -32768] * 50):
        arr = np.array(s, np.int16)
        pcm, _ = decode_flac(encode_flac(arr, 8_000, block_size=256))
        assert np.array_equal(pcm, arr), len(s)


def test_flac_crc_rejects_corruption_and_never_crashes():
    from etl_platform_nyc_taxi_spark.operators.audiocodecs import (
        decode_flac,
        encode_flac,
    )

    sig = _flac_sig(1500)
    payload = encode_flac(sig, 16_000, channels=2, stereo_mode="mid_side", porder=2, block_size=512)
    # flip one bit in the middle of frame data: CRC-16 must catch it
    b = bytearray(payload)
    b[len(b) // 2] ^= 0x01
    assert decode_flac(bytes(b)) is None
    assert decode_flac(b"") is None
    assert decode_flac(b"fLaC") is None
    r = np.random.default_rng(11)
    for cut in range(0, len(payload), 9):
        decode_flac(payload[:cut])  # never raises
    for _ in range(300):
        bb = bytearray(payload)
        for _ in range(int(r.integers(1, 5))):
            bb[int(r.integers(0, len(bb)))] = int(r.integers(0, 256))
        decode_flac(bytes(bb))


def test_flac_through_audio_surface(spark):
    """FLAC rides the real audio path end-to-end: sniffer reads
    STREAMINFO duration, audio_features uses decoded samples at the
    container rate."""
    from etl_platform_nyc_taxi_spark.operators.audiocodecs import encode_flac
    from etl_platform_nyc_taxi_spark.operators.multimodal import (
        attach_media_meta,
        audio_features,
        decode_audio_pcm,
        sniff_audio_header,
    )

    sig = _flac_sig(4000)
    payload = encode_flac(sig, 32_000)
    assert sniff_audio_header(payload) == ("flac", 125)
    assert sniff_audio_header(payload[:4096]) == ("flac", 125)
    pcm, rate = decode_audio_pcm(payload)
    assert rate == 32_000 and np.array_equal(pcm, sig)
    df = spark.createDataFrame(
        [(1, bytearray(payload))], "doc_id long, payload binary"
    )
    row = audio_features(df, sample_rate=999, bands=4).collect()[0]
    assert row["duration_ms"] == 4000 * 1000 // 32_000
    expect = [
        float(np.abs(chunk.astype(float)).mean())
        for chunk in np.array_split(sig, 4)
    ]
    for g, e in zip(row["feat"], expect):
        assert abs(float(g) - e) < 1.0
    meta = (
        attach_media_meta(df, "payload", media_type="audio", fmt=None)
        .select("payload_meta.*")
        .first()
    )
    assert meta["format"] == "flac" and meta["duration_ms"] == 125
