#!/usr/bin/env python
"""Pure-Python codec decode-stage throughput floors (round-12,
VERDICT r11 task 1).

Times the per-image decode kernels the mapInPandas stages pay
(excluding Arrow transfer), single core, on the SAME deterministic
gradient content the gate fixtures use (pixel = (id*31 + x*7 + y*13 +
c*101) % 256; PNG cycles all five filters via the encoder's y % 5
default). Prints an img/s + MPix/s table to extend the PLANS.md floor
series (round-9 baseline -> round-12 post-vectorization).

Usage: python tools/codec_floor.py [--size 128] [--reps N]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from advanced_strapi_import_spark.operators import multimodal as MM  # noqa: E402


def gradient(w: int, h: int, ch: int = 3, did: int = 1) -> np.ndarray:
    ys = np.arange(h)[:, None, None]
    xs = np.arange(w)[None, :, None]
    cs = np.arange(ch)[None, None, :]
    px = ((did * 31 + xs * 7 + ys * 13 + cs * 101) % 256).astype(np.uint8)
    return px.reshape(h, w * ch)


def build_payloads(size: int) -> dict[str, tuple[bytes, int]]:
    """name -> (payload, n_pixels)."""
    rgb = gradient(size, size, 3)
    gray = gradient(size, size, 1)
    half = gradient(size // 2, size // 2, 1, did=3)
    tall = gradient(size // 2, size, 1, did=5)  # (H, W/2) for 4:2:2
    n = size * size
    out = {
        "PNG rgb (5-filter cycle)": (MM.png_encode_pixels(rgb), n),
        "BMP rgb": (MM.bmp_encode_pixels(rgb), n),
        "GIF gray (LZW)": (MM.gif_encode_pixels(gray), n),
        "JPEG gray": (MM.jpeg_encode_gray(gray), n),
        "JPEG color 4:4:4": (
            MM.jpeg_encode_ycbcr(
                gray, gradient(size, size, 1, did=3),
                gradient(size, size, 1, did=5), subsample="444",
            ),
            n,
        ),
        "JPEG color 4:2:0": (
            MM.jpeg_encode_ycbcr(
                gray, half, gradient(size // 2, size // 2, 1, did=7),
                subsample="420",
            ),
            n,
        ),
        "JPEG color 4:2:2": (
            MM.jpeg_encode_ycbcr(
                gray, tall, gradient(size // 2, size, 1, did=7),
                subsample="422",
            ),
            n,
        ),
        "JPEG progressive gray": (MM.jpeg_encode_progressive(gray), n),
    }
    return out


def bench_one(payload: bytes, n_px: int, reps: int) -> tuple[float, float]:
    # warm once (imports, dct basis cache), then best-of-3 batches
    MM._decode_image_pixels(payload)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            MM._decode_image_pixels(payload)
        dt = (time.perf_counter() - t0) / reps
        best = min(best, dt)
    return 1.0 / best, n_px / best / 1e6


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--reps", type=int, default=None)
    args = ap.parse_args()

    payloads = build_payloads(args.size)
    print(f"decode floors @ {args.size}x{args.size}, single core\n")
    print("| format | img/s | MPix/s/core |")
    print("|---|---|---|")
    for name, (data, n_px) in payloads.items():
        # pick reps so each batch is ~0.5-2s
        reps = args.reps
        if reps is None:
            MM._decode_image_pixels(data)
            t0 = time.perf_counter()
            MM._decode_image_pixels(data)
            dt = time.perf_counter() - t0
            reps = max(3, min(2000, int(0.5 / max(dt, 1e-6))))
        ips, mps = bench_one(data, n_px, reps)
        print(f"| {name} | {ips:,.1f} | {mps:.2f} |")
    return 0


if __name__ == "__main__":
    sys.exit(main())
