"""Codec throughput micro-bench: per-codec decode rates for the pure
stdlib+numpy media codecs (operators/codecs.py + multimodal PNG/BMP).

Single process, min-of-3 over a fixed synthetic workload per codec —
the per-payload constant a 100 TB decode job multiplies by corpus
size. Prints ONE JSON line: {"codec": {"payloads_per_s": ..,
"mb_per_s_encoded": ..}} plus the 1-min load so contended runs are
self-identifying (same convention as bench.py).

Run: python codec_bench.py
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

from citibike_deep_dive_spark.operators import codecs as C
from citibike_deep_dive_spark.operators.multimodal import (
    decode_bmp_pixels,
    decode_png_pixels,
    encode_bmp,
    encode_png,
    encode_wav,
    decode_wav_samples,
)

REPEAT = 3


def build_workloads():
    rng = np.random.default_rng(42)
    img = rng.integers(0, 256, size=(64, 64, 3)).astype(np.uint8)
    pal = rng.integers(0, 256, size=(64, 3)).astype(np.uint8)
    gif_px = pal[rng.integers(0, 64, size=(64, 64))]
    audio = (
        9000 * np.sin(np.arange(16000) / 15)
        + 2000 * np.sin(np.arange(16000) / 3.1)
    ).astype(np.int16)
    frames = [
        np.clip(img.astype(np.int64) + 10 * t, 0, 255).astype(np.uint8)
        for t in range(5)
    ]
    return {
        "bmp": ([encode_bmp(img)] * 50, decode_bmp_pixels),
        "png_rgb8": ([encode_png(img)] * 20, decode_png_pixels),
        "gif": ([C.encode_gif(gif_px)] * 20, C.decode_gif_pixels),
        "jpeg_q90_444": ([C.encode_jpeg(img, 90)] * 5, C.decode_jpeg_pixels),
        "jpeg_q90_420": (
            [C.encode_jpeg(img, 90, subsample=True)] * 5,
            C.decode_jpeg_pixels,
        ),
        "jpeg_progressive_q90": (
            [C.encode_jpeg_progressive(img, 90)] * 3,
            C.decode_jpeg_pixels,
        ),
        "gif_animated_5f": (
            [C.encode_gif_animated([gif_px] * 5, delay_ms=50)] * 5,
            C.decode_gif_frames,
        ),
        "tiff_packbits": (
            [C.encode_tiff(img, packbits=True)] * 20,
            C.decode_tiff_pixels,
        ),
        "avi_mjpeg_5f": (
            [C.encode_avi_mjpeg(frames, fps=5)] * 2,
            C.decode_avi_frames,
        ),
        "wav_pcm16_1s": ([encode_wav(audio)] * 50, decode_wav_samples),
        "wav_ulaw_1s": (
            [C.encode_wav_compressed(audio, codec="ulaw")] * 50,
            decode_wav_samples,
        ),
        "wav_ima_adpcm_1s": (
            [C.encode_wav_compressed(audio, codec="ima")] * 3,
            decode_wav_samples,
        ),
        "flac_1s": ([C.encode_flac(audio)] * 3, C.decode_flac_samples),
    }


def main() -> None:
    out = {}
    for name, (payloads, decoder) in build_workloads().items():
        best = None
        for _ in range(REPEAT):
            t0 = time.perf_counter()
            for p in payloads:
                r = decoder(p)
                assert r is not None, name
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        n = len(payloads)
        nbytes = sum(len(p) for p in payloads)
        out[name] = {
            "payloads_per_s": round(n / best, 1),
            "mb_per_s_encoded": round(nbytes / best / 1e6, 2),
        }
    payload = {
        "metric": "codec_decode_throughput_single_core",
        "load1": round(os.getloadavg()[0], 2),
        "codecs": out,
    }
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
