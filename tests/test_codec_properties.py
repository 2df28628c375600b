"""Property-based tests for the pure-Python codecs (no Spark session:
these exercise the byte-level JPEG and Avro implementations directly,
so hypothesis can afford many examples).

JPEG: block-constant images must round-trip EXACTLY through the lossy
pipeline (DC-only + uniform-8 quant is lossless) for every chroma
layout and any restart interval — the invariant all the pixel oracles
rely on. Avro: arbitrary nested rows must survive write_ocf/iter_ocf
for both codecs and any block size.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from advanced_strapi_import_spark.operators import multimodal as MM
from advanced_strapi_import_spark.sources import avro_ocf as A

SETTINGS = dict(max_examples=20, deadline=None)

VALS = st.integers(min_value=0, max_value=255)


def _expected_rgb(y, cb, cr):
    yv = y.astype(np.int64)
    cbv = cb.astype(np.int64) - 128
    crv = cr.astype(np.int64) - 128
    base = (yv << 16) + 32768
    r = (base + 91881 * crv) >> 16
    g = (base - 22554 * cbv - 46802 * crv) >> 16
    b = (base + 116130 * cbv) >> 16
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)


@given(
    st.integers(1, 5), st.integers(1, 4),
    st.lists(VALS, min_size=20, max_size=20), st.integers(0, 4),
)
@settings(**SETTINGS)
def test_gray_block_constant_roundtrip_any_dri(wb, hb, vals, ri):
    grid = np.array(vals[: wb * hb], dtype=np.int64).reshape(hb, wb)
    gray = np.kron(grid, np.ones((8, 8), dtype=np.int64))
    w, h, ch, px = MM.jpeg_decode_pixels(
        MM.jpeg_encode_gray(gray, restart_interval=ri)
    )
    assert (w, h, ch) == (wb * 8, hb * 8, 1)
    assert np.array_equal(px, gray.astype(np.uint8))


@given(
    st.sampled_from(["420", "422", "444"]),
    st.integers(1, 3), st.integers(1, 3),
    st.lists(VALS, min_size=27, max_size=27), st.integers(0, 3),
)
@settings(**SETTINGS)
def test_color_block_constant_roundtrip_all_layouts(sub, wb, hb, vals, ri):
    n = wb * hb
    yv = np.array(vals[:n], dtype=np.int64).reshape(hb, wb)
    cbv = np.array(vals[9:9 + n], dtype=np.int64).reshape(hb, wb)
    crv = np.array(vals[18:18 + n], dtype=np.int64).reshape(hb, wb)
    mcu = {"420": (16, 16), "422": (8, 16), "444": (8, 8)}[sub]
    cdim = {"420": (8, 8), "422": (8, 8), "444": (8, 8)}[sub]
    y = np.kron(yv, np.ones(mcu, dtype=np.int64))
    cb = np.kron(cbv, np.ones(cdim, dtype=np.int64))
    cr = np.kron(crv, np.ones(cdim, dtype=np.int64))
    w, h, ch, px = MM.jpeg_decode_pixels(
        MM.jpeg_encode_ycbcr(y, cb, cr, subsample=sub, restart_interval=ri)
    )
    assert (w, h, ch) == (wb * mcu[1], hb * mcu[0], 3)
    exp = _expected_rgb(
        y,
        np.kron(cbv, np.ones(mcu, dtype=np.int64)),
        np.kron(crv, np.ones(mcu, dtype=np.int64)),
    )
    assert np.array_equal(px, exp), f"{sub} ri={ri}"


@given(st.integers(1, 7), st.integers(1, 7), st.integers(0, 3))
@settings(**SETTINGS)
def test_gray_gradient_bounded_error_any_crop(a, b, ri):
    gray = (np.arange(19)[:, None] * a + np.arange(29)[None, :] * b) % 256
    w, h, _, px = MM.jpeg_decode_pixels(
        MM.jpeg_encode_gray(gray, restart_interval=ri)
    )
    assert (w, h) == (29, 19)
    assert int(np.abs(px.astype(int) - gray).max()) <= 8


_NESTED = {
    "type": "record", "name": "p", "fields": [
        {"name": "id", "type": "long"},
        {"name": "s", "type": ["null", "string"]},
        {"name": "tags", "type": {"type": "array",
                                  "items": ["null", "string"]}},
        {"name": "m", "type": ["null", {
            "type": "record", "name": "m_rec", "fields": [
                {"name": "a", "type": "int"},
                {"name": "b", "type": {"type": "array", "items": "long"}},
            ]}]},
    ],
}

_TXT = st.text(max_size=8)
_ROW = st.fixed_dictionaries({
    "id": st.integers(min_value=-(2 ** 62), max_value=2 ** 62),
    "s": st.one_of(st.none(), _TXT),
    "tags": st.lists(st.one_of(st.none(), _TXT), max_size=4),
    "m": st.one_of(
        st.none(),
        st.fixed_dictionaries({
            "a": st.integers(min_value=-(2 ** 31), max_value=2 ** 31 - 1),
            "b": st.lists(
                st.integers(min_value=-(2 ** 62), max_value=2 ** 62),
                max_size=5,
            ),
        }),
    ),
})


@given(st.lists(_ROW, max_size=12), st.sampled_from(["null", "deflate"]),
       st.integers(1, 5))
@settings(**SETTINGS)
def test_avro_nested_roundtrip_property(rows, codec, block):
    import os
    import tempfile

    fd, p = tempfile.mkstemp(suffix=".avro")
    os.close(fd)
    try:
        A.write_ocf(p, _NESTED, rows, codec=codec, block_records=block)
        assert list(A.iter_ocf(open(p, "rb").read())) == rows
    finally:
        os.remove(p)
