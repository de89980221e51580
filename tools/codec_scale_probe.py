"""Scale probe for decode KERNELS with no dedicated registry query
(VERDICT r6 task 6): FLAC (audiocodecs.decode_flac) and progressive
JPEG (imagecodecs.decode_jpeg SOF2 path), timed through the PRODUCTION
mapInPandas feature kernels (audio_features / image_features →
decode_audio_pcm / decode_image_pixels) at N and FACTOR×N payload rows.

Per-payload decode is row-local CPU with no shuffle, so the honest
scale expectation is linear work spread over the executor cores — the
recorded ratio at FACTOR=10 on local[32] should sit well under 10 once
fixed Arrow/session overheads amortize, and NEVER above FACTOR (that
would mean the kernel does cross-row work it must not do).

Usage: python tools/codec_scale_probe.py [n_base] [factor] [out_json]
Merges results into SCALE_BENCH.json-compatible shape on stdout; the
caller merges into the artifact (same recipe as scale_bench chunks).
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402


def _flac_payloads(k: int) -> list[bytes]:
    from etl_platform_nyc_taxi_spark.operators.audiocodecs import encode_flac

    out = []
    for i in range(k):
        t = np.arange(4096, dtype=np.float64)
        # distinct waveform per payload: two mixed tones + ramp
        wave = (
            8000.0 * np.sin(2 * np.pi * (60 + i) * t / 8000.0)
            + 3000.0 * np.sin(2 * np.pi * (333 + 7 * i) * t / 8000.0)
            + t * 0.5
        )
        samples = np.clip(wave, -32000, 32000).astype(np.int16)
        out.append(
            encode_flac(samples, rate=8000, block_size=1024, mode="fixed")
        )
    return out


def _vp8l_payloads(k: int) -> list[bytes]:
    from etl_platform_nyc_taxi_spark.operators.webplossless import (
        encode_vp8l,
    )

    out = []
    for i in range(k):
        yy, xx = np.mgrid[0:32, 0:32]
        img = np.stack(
            [
                ((yy * (i + 2) + xx) % 256),
                ((xx + i * 11) % 256),
                ((yy + xx * (i % 3 + 1)) % 256),
            ],
            axis=2,
        ).astype(np.uint8)
        out.append(encode_vp8l(img, use_lz77_runs=True))
    return out


def _pjpeg_payloads(k: int) -> list[bytes]:
    from etl_platform_nyc_taxi_spark.operators.imagecodecs import (
        encode_jpeg_progressive,
    )

    out = []
    for i in range(k):
        yy, xx = np.mgrid[0:64, 0:64]
        img = np.stack(
            [
                ((yy * (i + 3) + xx) % 256),
                ((xx * 2 + i * 17) % 256),
                ((yy + xx * (i % 5 + 1)) % 256),
            ],
            axis=2,
        ).astype(np.uint8)
        out.append(encode_jpeg_progressive(img, quant=4))
    return out


def _time_kernel(df, run) -> float:
    run(df)  # warm: codegen + Arrow worker spin-up
    t0 = time.monotonic()
    run(df)
    return round(time.monotonic() - t0, 3)


def main() -> int:
    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    from etl_platform_nyc_taxi_spark.operators.multimodal import (
        audio_features,
        image_features,
    )
    from etl_platform_nyc_taxi_spark.session import get_spark

    spark = get_spark("codec_scale_probe")
    spark.sparkContext.setLogLevel("ERROR")

    k_distinct = 48
    flac = _flac_payloads(k_distinct)
    pjpg = _pjpeg_payloads(k_distinct)
    vp8l = _vp8l_payloads(k_distinct)

    def mk(payloads, n):
        rows = [
            (i, bytearray(payloads[i % k_distinct])) for i in range(n)
        ]
        return spark.createDataFrame(
            rows, "doc_id long, payload binary"
        ).repartition(32)

    def run_audio(df):
        audio_features(df).write.format("noop").mode("overwrite").save()

    def run_image(df):
        image_features(df, dim=8).write.format("noop").mode(
            "overwrite"
        ).save()

    out = {}
    for name, payloads, run in (
        ("kernel:flac_decode", flac, run_audio),
        ("kernel:progressive_jpeg_decode", pjpg, run_image),
        ("kernel:vp8l_decode", vp8l, run_image),
    ):
        base_s = _time_kernel(mk(payloads, n_base), run)
        scaled_s = _time_kernel(mk(payloads, n_base * factor), run)
        out[name] = {
            "base_s": base_s,
            "scaled_s": scaled_s,
            "ratio": round(scaled_s / base_s, 2) if base_s else None,
            "n_base": n_base,
            "factor": factor,
        }
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
