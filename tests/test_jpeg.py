"""Baseline JPEG codec: exact round trip for block-constant images,
bounded error for general content, marker/scope error paths, and
dispatch integration with the shared pixel-stats stage."""

from __future__ import annotations

import numpy as np
import pytest

from advanced_strapi_import_spark.operators import multimodal as MM

# Annex K luminance quantization table (natural order) — the
# "realistic quality-50" table, exercised in the tolerance test
_K1 = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ]
)


def _gradient(h: int, w: int, a: int = 7, b: int = 3) -> np.ndarray:
    return (np.arange(h)[:, None] * a + np.arange(w)[None, :] * b) % 256


def test_block_constant_exact_roundtrip():
    vals = np.array([[7, 200, 33], [128, 0, 255]], dtype=np.int64)
    gray = np.kron(vals, np.ones((8, 8), dtype=np.int64))
    w, h, ch, px = MM.jpeg_decode_pixels(MM.jpeg_encode_gray(gray))
    assert (w, h, ch) == (24, 16, 1)
    assert np.array_equal(px, gray.astype(np.uint8))


def test_gradient_near_lossless_q8():
    gray = _gradient(24, 40)
    w, h, _, px = MM.jpeg_decode_pixels(MM.jpeg_encode_gray(gray))
    assert (w, h) == (40, 24)
    assert int(np.abs(px.astype(int) - gray).max()) <= 8


def test_crop_non_multiple_of_8():
    gray = _gradient(11, 21, 13, 5)
    w, h, _, px = MM.jpeg_decode_pixels(MM.jpeg_encode_gray(gray))
    assert (w, h) == (21, 11) and px.shape == (11, 21)
    assert int(np.abs(px.astype(int) - gray).max()) <= 8


def test_annex_k_table_bounded_error():
    gray = _gradient(16, 16, 2, 1)  # smooth content for a coarse table
    data = MM.jpeg_encode_gray(gray, qtable=_K1)
    w, h, _, px = MM.jpeg_decode_pixels(data)
    assert (w, h) == (16, 16)
    # quality-50 quantization: visually-lossless bound on smooth input
    assert int(np.abs(px.astype(int) - gray).max()) <= 24


def test_deterministic_bytes():
    gray = _gradient(16, 24)
    assert MM.jpeg_encode_gray(gray) == MM.jpeg_encode_gray(gray)


def test_rejects_non_jpeg_and_truncation():
    with pytest.raises(MM.UnknownContainer):
        MM.jpeg_decode_pixels(b"\x89PNG\r\n\x1a\nnot a jpeg")
    data = MM.jpeg_encode_gray(_gradient(8, 8))
    with pytest.raises(ValueError):
        MM.jpeg_decode_pixels(data[:20])  # cut inside the marker walk


def test_rejects_progressive_sof():
    data = bytearray(MM.jpeg_encode_gray(_gradient(8, 8)))
    i = data.find(b"\xff\xc0")
    data[i + 1] = 0xC2  # flip SOF0 -> SOF2 (progressive)
    with pytest.raises(ValueError, match="non-baseline"):
        MM.jpeg_decode_pixels(bytes(data))


def test_dispatch_integration():
    gray = np.kron(
        np.array([[5, 250]], dtype=np.int64), np.ones((8, 8), dtype=np.int64)
    )
    w, h, ch, px, fmt = MM._decode_image_pixels(MM.jpeg_encode_gray(gray))
    assert fmt == "JPEG" and (w, h, ch) == (16, 8, 1)
    assert int(px.reshape(-1).astype(np.int64).sum()) == 64 * (5 + 250)
