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


def test_rejects_lossless_sof():
    # progressive (SOF2) decodes since round 9; lossless (SOF3) is the
    # remaining loud boundary
    data = bytearray(MM.jpeg_encode_gray(_gradient(8, 8)))
    i = data.find(b"\xff\xc0")
    data[i + 1] = 0xC3  # flip SOF0 -> SOF3 (lossless)
    with pytest.raises(ValueError, match="non-baseline"):
        MM.jpeg_decode_pixels(bytes(data))


def test_dispatch_integration():
    gray = np.kron(
        np.array([[5, 250]], dtype=np.int64), np.ones((8, 8), dtype=np.int64)
    )
    w, h, ch, px, fmt = MM._decode_image_pixels(MM.jpeg_encode_gray(gray))
    assert fmt == "JPEG" and (w, h, ch) == (16, 8, 1)
    assert int(px.reshape(-1).astype(np.int64).sum()) == 64 * (5 + 250)

# ---------------------------------------------------------------------------
# restart markers (DRI) — the round-8 _BitReader fix: _fill must not
# consume RSTn while unconsumed data bits from the previous interval
# are still buffered (a DRI=1 stream used to raise "huffman overrun")
# ---------------------------------------------------------------------------
def _expected_rgb(y, cb, cr):
    """The decoder's documented fixed-point JFIF matrix, applied to
    full-size int64 planes — the oracle arithmetic for color tests."""
    yv = y.astype(np.int64)
    cbv = cb.astype(np.int64) - 128
    crv = cr.astype(np.int64) - 128
    base = (yv << 16) + 32768
    r = (base + 91881 * crv) >> 16
    g = (base - 22554 * cbv - 46802 * crv) >> 16
    b = (base + 116130 * cbv) >> 16
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)


def test_dri_block_constant_exact_every_interval():
    vals = (np.arange(20).reshape(4, 5) * 41 + 3) % 256
    gray = np.kron(vals, np.ones((8, 8), dtype=np.int64))
    for ri in (1, 2, 3, 7, 20):
        data = MM.jpeg_encode_gray(gray, restart_interval=ri)
        assert b"\xff\xdd" in data  # DRI segment present
        w, h, ch, px = MM.jpeg_decode_pixels(data)
        assert (w, h, ch) == (40, 32, 1)
        assert np.array_equal(px, gray.astype(np.uint8)), f"ri={ri}"


def test_dri_gradient_matches_no_dri_decode():
    gray = _gradient(24, 32, 11, 5)
    plain = MM.jpeg_decode_pixels(MM.jpeg_encode_gray(gray))[3]
    with_ri = MM.jpeg_decode_pixels(
        MM.jpeg_encode_gray(gray, restart_interval=1)
    )[3]
    # restart markers change framing only, never reconstructed pixels
    assert np.array_equal(plain, with_ri)


def test_dri_rstn_cycling_and_dc_reset_in_stream():
    gray = np.kron(
        (np.arange(12).reshape(1, 12) * 19) % 256,
        np.ones((8, 8), dtype=np.int64),
    )
    data = MM.jpeg_encode_gray(gray, restart_interval=1)
    body = data[data.find(b"\xff\xda") :]
    for n in range(8):  # D0..D7 then wrap
        assert bytes([0xFF, 0xD0 + n]) in body


def test_missing_restart_marker_raises():
    gray = np.kron(
        np.array([[9, 77, 140, 201]]), np.ones((8, 8), dtype=np.int64)
    )
    data = bytearray(MM.jpeg_encode_gray(gray, restart_interval=1))
    i = data.find(b"\xff\xd0")
    del data[i : i + 2]  # stream now violates its own DRI contract
    with pytest.raises(ValueError):
        MM.jpeg_decode_pixels(bytes(data))


# ---------------------------------------------------------------------------
# 3-component color: 4:2:0 and 4:4:4 interleaved scans
# ---------------------------------------------------------------------------
def _const_mcu_planes(mby, mbx, seed=0):
    ys = np.arange(mby)[:, None]
    xs = np.arange(mbx)[None, :]
    yv = (ys * 13 + xs * 7 + 19 + seed) % 256
    cbv = (ys * 5 + xs * 11 + 29 + seed) % 256
    crv = (ys * 17 + xs * 3 + 37 + seed) % 256
    return yv, cbv, crv


def test_color_420_constant_mcu_exact():
    yv, cbv, crv = _const_mcu_planes(3, 4)
    y = np.kron(yv, np.ones((16, 16), dtype=np.int64))
    cb = np.kron(cbv, np.ones((8, 8), dtype=np.int64))
    cr = np.kron(crv, np.ones((8, 8), dtype=np.int64))
    w, h, ch, px = MM.jpeg_decode_pixels(
        MM.jpeg_encode_ycbcr(y, cb, cr, subsample="420")
    )
    assert (w, h, ch) == (64, 48, 3) and px.shape == (48, 64, 3)
    exp = _expected_rgb(
        y,
        np.kron(cbv, np.ones((16, 16), dtype=np.int64)),
        np.kron(crv, np.ones((16, 16), dtype=np.int64)),
    )
    assert np.array_equal(px, exp)


def test_color_444_constant_block_exact():
    yv, cbv, crv = _const_mcu_planes(2, 5, seed=100)
    y = np.kron(yv, np.ones((8, 8), dtype=np.int64))
    cb = np.kron(cbv, np.ones((8, 8), dtype=np.int64))
    cr = np.kron(crv, np.ones((8, 8), dtype=np.int64))
    w, h, ch, px = MM.jpeg_decode_pixels(
        MM.jpeg_encode_ycbcr(y, cb, cr, subsample="444")
    )
    assert (w, h, ch) == (40, 16, 3)
    assert np.array_equal(px, _expected_rgb(y, cb, cr))


def test_color_420_with_dri_exact():
    yv, cbv, crv = _const_mcu_planes(2, 3, seed=50)
    y = np.kron(yv, np.ones((16, 16), dtype=np.int64))
    cb = np.kron(cbv, np.ones((8, 8), dtype=np.int64))
    cr = np.kron(crv, np.ones((8, 8), dtype=np.int64))
    for ri in (1, 2, 4):
        px = MM.jpeg_decode_pixels(
            MM.jpeg_encode_ycbcr(y, cb, cr, subsample="420",
                                 restart_interval=ri)
        )[3]
        exp = _expected_rgb(
            y,
            np.kron(cbv, np.ones((16, 16), dtype=np.int64)),
            np.kron(crv, np.ones((16, 16), dtype=np.int64)),
        )
        assert np.array_equal(px, exp), f"ri={ri}"


def test_color_gradient_bounded_error():
    h, w = 32, 48
    y = _gradient(h, w, 3, 2)
    cb = _gradient(h // 2, w // 2, 5, 1)
    cr = _gradient(h // 2, w // 2, 1, 7)
    px = MM.jpeg_decode_pixels(
        MM.jpeg_encode_ycbcr(y, cb, cr, subsample="420")
    )[3]
    exp = _expected_rgb(
        y,
        np.kron(cb, np.ones((2, 2), dtype=np.int64)),
        np.kron(cr, np.ones((2, 2), dtype=np.int64)),
    )
    # uniform-8 quant on smooth planes: small reconstruction error,
    # amplified <=1.8x by the color matrix
    assert int(np.abs(px.astype(int) - exp.astype(int)).max()) <= 16


def test_color_encoder_shape_contracts():
    y16 = np.zeros((16, 16), dtype=np.int64)
    with pytest.raises(ValueError, match=r"\*16"):
        MM.jpeg_encode_ycbcr(
            np.zeros((8, 8)), np.zeros((4, 4)), np.zeros((4, 4)),
            subsample="420",
        )
    with pytest.raises(ValueError, match="chroma"):
        MM.jpeg_encode_ycbcr(
            y16, np.zeros((16, 16)), np.zeros((8, 8)), subsample="420"
        )
    with pytest.raises(ValueError, match="subsample"):
        MM.jpeg_encode_ycbcr(y16, y16, y16, subsample="411")


def test_color_dispatch_integration():
    yv, cbv, crv = _const_mcu_planes(1, 2)
    y = np.kron(yv, np.ones((16, 16), dtype=np.int64))
    cb = np.kron(cbv, np.ones((8, 8), dtype=np.int64))
    cr = np.kron(crv, np.ones((8, 8), dtype=np.int64))
    w, h, ch, px, fmt = MM._decode_image_pixels(
        MM.jpeg_encode_ycbcr(y, cb, cr)
    )
    assert fmt == "JPEG" and (w, h, ch) == (32, 16, 3)
    assert px.shape == (16, 32, 3)


def test_color_422_constant_mcu_exact():
    """4:2:2 (broadcast-video layout): 8x16 constant MCUs, two Y
    blocks + full-height half-width chroma per MCU — exact through
    the same fixed-point color path, including restart markers."""
    yv, cbv, crv = _const_mcu_planes(3, 2, seed=11)
    y = np.kron(yv, np.ones((8, 16), dtype=np.int64))
    cb = np.kron(cbv, np.ones((8, 8), dtype=np.int64))
    cr = np.kron(crv, np.ones((8, 8), dtype=np.int64))
    exp = _expected_rgb(
        y,
        np.kron(cbv, np.ones((8, 16), dtype=np.int64)),
        np.kron(crv, np.ones((8, 16), dtype=np.int64)),
    )
    for ri in (0, 2):
        w, h, ch, px = MM.jpeg_decode_pixels(
            MM.jpeg_encode_ycbcr(y, cb, cr, subsample="422",
                                 restart_interval=ri)
        )
        assert (w, h, ch) == (32, 24, 3)
        assert np.array_equal(px, exp), f"ri={ri}"
    with pytest.raises(ValueError, match="chroma must be H x W/2"):
        MM.jpeg_encode_ycbcr(y, cb[:4], cr[:4], subsample="422")


def test_color_jpeg_flows_through_resize_and_ahash(spark):
    """Color JPEG payloads compose with the downstream REAL image ops
    through the shared dispatch: resize_images_real nearest-neighbor
    resamples the decoded RGB grid and re-encodes PNG; image_ahash
    hashes the integer-grayscaled pixels. Constant-macroblock input
    makes both outputs exactly predictable."""
    yv, cbv, crv = _const_mcu_planes(2, 2, seed=77)
    y = np.kron(yv, np.ones((16, 16), dtype=np.int64))
    cb = np.kron(cbv, np.ones((8, 8), dtype=np.int64))
    cr = np.kron(crv, np.ones((8, 8), dtype=np.int64))
    data = MM.jpeg_encode_ycbcr(y, cb, cr, subsample="420")
    exp = _expected_rgb(
        y,
        np.kron(cbv, np.ones((16, 16), dtype=np.int64)),
        np.kron(crv, np.ones((16, 16), dtype=np.int64)),
    )  # 32x32x3
    df = spark.createDataFrame([(1, bytearray(data))],
                               "doc_id long, content binary")
    out = MM.resize_images_real(df, 8, 8).collect()[0]
    assert out["codec"] == "PNG"
    w, h, ch, px = MM.png_decode_pixels(bytes(out["content"]))
    assert (w, h, ch) == (8, 8, 3)
    ys = (np.arange(8) * 32) // 8
    xs = (np.arange(8) * 32) // 8
    assert np.array_equal(px.reshape(8, 8, 3), exp[np.ix_(ys, xs)])

    hashed = MM.image_ahash(df).collect()
    assert len(hashed) == 1  # decodable -> hashed, no drop


# ---------------------------------------------------------------------------
# round 9: progressive (SOF2) decode
# ---------------------------------------------------------------------------
def test_progressive_roundtrip_equals_baseline_gray():
    """A progressive encode must decode to the SAME pixels as the
    baseline encode of the same input (identical quantized
    coefficients, different scan packaging) — both the spectral-
    selection-only script and the successive-approximation script."""
    rng = np.random.RandomState(7)
    g = rng.randint(0, 256, (24, 40)).astype(np.int64)
    base = MM.jpeg_decode_pixels(MM.jpeg_encode_gray(g))
    for succ in (False, True):
        prog = MM.jpeg_decode_pixels(
            MM.jpeg_encode_progressive(g, successive=succ)
        )
        assert base[:3] == prog[:3]
        assert np.array_equal(base[3], prog[3]), f"successive={succ}"


@pytest.mark.parametrize("subsample", ["420", "422", "444"])
def test_progressive_roundtrip_equals_baseline_color(subsample):
    rng = np.random.RandomState(11)
    h, w = 32, 48
    y = rng.randint(0, 256, (h, w)).astype(np.int64)
    ch = (h // 2 if subsample == "420" else h,
          w // 2 if subsample in ("420", "422") else w)
    cb = rng.randint(0, 256, ch).astype(np.int64)
    cr = rng.randint(0, 256, ch).astype(np.int64)
    base = MM.jpeg_decode_pixels(
        MM.jpeg_encode_ycbcr(y, cb, cr, subsample=subsample)
    )
    for succ in (False, True):
        prog = MM.jpeg_decode_pixels(
            MM.jpeg_encode_progressive(
                y, cb, cr, subsample=subsample, successive=succ
            )
        )
        assert np.array_equal(base[3], prog[3]), (subsample, succ)


def test_progressive_annexk_and_crop():
    """Non-multiple-of-8 dims and a realistic quant table through the
    progressive path: same output as baseline, which is itself
    bounded-error vs the source."""
    g = _gradient(21, 35)
    base = MM.jpeg_decode_pixels(MM.jpeg_encode_gray(g, qtable=_K1))
    prog = MM.jpeg_decode_pixels(
        MM.jpeg_encode_progressive(g, qtable=_K1, successive=True)
    )
    assert base[:3] == prog[:3] == (35, 21, 1)
    assert np.array_equal(base[3], prog[3])


def test_progressive_dispatch_integration(spark):
    """Progressive payloads flow through the shared pixel-stats stage
    (magic dispatch -> SOF2 delegation) like any other JPEG."""
    g = (np.full((16, 16), 99)).astype(np.int64)
    blob = MM.jpeg_encode_progressive(g, successive=True)
    assert b"\xff\xc2" in blob[:200]  # really SOF2
    df = spark.createDataFrame(
        [(1, bytearray(blob))], "doc_id long, content binary"
    )
    row = MM.image_pixel_stats(df).collect()[0]
    assert (row["width"], row["height"], row["channels"]) == (16, 16, 1)
    assert row["format"] == "JPEG"
    assert row["px_min"] == 99 and row["px_max"] == 99


def test_progressive_jdk_imageio_cross_validation(spark):
    """Spec-validity proof from an INDEPENDENT codec: the JDK's
    ImageIO JPEG writer (on Spark's classpath) encodes a random RGB
    image in progressive mode with its own scan script (successive
    approximation included); our decoder must produce the same image
    the JDK's own reader produces, within the small IDCT/color-
    convert tolerance two independent decoders are allowed (T.81
    does not mandate bit-exact IDCT)."""
    jvm = spark._jvm
    w, h = 40, 24
    rng = np.random.RandomState(3)
    # smooth-ish content so quantization error stays small
    px = (
        (np.arange(h)[:, None] * 5 + np.arange(w)[None, :] * 3) % 200
        + rng.randint(0, 20, (h, w))
    ).astype(np.int64)
    img = jvm.java.awt.image.BufferedImage(w, h, 1)  # TYPE_INT_RGB
    for yy in range(h):
        for xx in range(w):
            v = int(px[yy, xx])
            img.setRGB(xx, yy, (v << 16) | (v << 8) | v)
    import tempfile

    f = tempfile.NamedTemporaryFile(suffix=".jpg", delete=False)
    f.close()
    writer = jvm.javax.imageio.ImageIO.getImageWritersByFormatName(
        "jpeg"
    ).next()
    param = writer.getDefaultWriteParam()
    param.setProgressiveMode(
        jvm.javax.imageio.ImageWriteParam.MODE_DEFAULT
    )
    out = jvm.javax.imageio.stream.FileImageOutputStream(
        jvm.java.io.File(f.name)
    )
    writer.setOutput(out)
    writer.write(
        None, jvm.javax.imageio.IIOImage(img, None, None), param
    )
    out.close()
    writer.dispose()
    blob = open(f.name, "rb").read()
    assert b"\xff\xc2" in blob, "JDK did not emit SOF2 — adjust test"

    dw, dh, ch, arr, fmt = MM._decode_image_pixels(blob)
    assert (dw, dh, fmt) == (w, h, "JPEG")

    jimg = jvm.javax.imageio.ImageIO.read(jvm.java.io.File(f.name))
    ours = arr.reshape(h, w, ch)
    worst = 0
    for yy in range(h):
        for xx in range(w):
            rgb = jimg.getRGB(xx, yy)
            jr, jg, jb = (rgb >> 16) & 255, (rgb >> 8) & 255, rgb & 255
            if ch == 3:
                orr, og, ob = (int(v) for v in ours[yy, xx])
            else:
                orr = og = ob = int(ours[yy, xx])
            worst = max(
                worst, abs(orr - jr), abs(og - jg), abs(ob - jb)
            )
    assert worst <= 4, f"max channel diff {worst} vs JDK decoder"


def _jdk_read_gray(jvm, blob):
    import tempfile

    import numpy as np

    f = tempfile.NamedTemporaryFile(suffix=".jpg", delete=False)
    f.write(blob)
    f.close()
    jimg = jvm.javax.imageio.ImageIO.read(jvm.java.io.File(f.name))
    assert jimg is not None, "JDK could not parse the JPEG"
    h, w = jimg.getHeight(), jimg.getWidth()
    out = np.zeros((h, w), int)
    for yy in range(h):
        for xx in range(w):
            out[yy, xx] = jimg.getRGB(xx, yy) & 255
    return out


def test_jdk_imageio_reads_our_progressive(spark):
    """Reverse cross-check: the JDK's reader must decode OUR
    progressive encoder's output (spec-validity of the scan script,
    the flat AC table with EOBn symbols, and the successive-
    approximation bit streams) to EXACTLY the pixels it decodes from
    our BASELINE encoding of the same image — the two files carry
    identical quantized coefficients, so any packaging bug in the
    progressive scans would surface as a pixel diff through the
    independent decoder. (Comparing JDK-vs-JDK sidesteps the JDK's
    grayscale ICC color-management offset, which shifts its absolute
    grayscale values relative to every spec-direct decoder.)"""
    jvm = spark._jvm
    g = _gradient(24, 32, 9, 4)
    jdk_base = _jdk_read_gray(jvm, MM.jpeg_encode_gray(g))
    for succ in (False, True):
        blob = MM.jpeg_encode_progressive(g, successive=succ)
        jdk_prog = _jdk_read_gray(jvm, blob)
        assert np.array_equal(jdk_prog, jdk_base), f"successive={succ}"


def test_progressive_with_restart_intervals():
    """Restart markers inside progressive scans: DC-predictor and
    EOB-run reset at every interval in every scan, for both scan
    scripts — pixels identical to the no-DRI progressive decode."""
    g = _gradient(24, 32, 6, 5)
    plain = MM.jpeg_decode_pixels(MM.jpeg_encode_progressive(g))[3]
    for succ in (False, True):
        for ri in (1, 2, 5):
            blob = MM.jpeg_encode_progressive(
                g, successive=succ, restart_interval=ri
            )
            assert b"\xff\xdd" in blob
            got = MM.jpeg_decode_pixels(blob)[3]
            assert np.array_equal(got, plain), f"succ={succ} ri={ri}"


def test_jdk_reads_our_progressive_with_dri(spark):
    """The JDK codec must also accept our DRI-bearing progressive
    files and decode them to its own baseline answer."""
    jvm = spark._jvm
    g = _gradient(16, 24, 7, 2)
    jdk_base = _jdk_read_gray(jvm, MM.jpeg_encode_gray(g))
    blob = MM.jpeg_encode_progressive(
        g, successive=True, restart_interval=2
    )
    assert np.array_equal(_jdk_read_gray(jvm, blob), jdk_base)


def test_progressive_truncation_and_bomb_guards():
    """Corrupt progressive streams fail LOUDLY: truncations anywhere
    inside the multi-scan walk raise ValueError (never hang, never
    fake pixels), and a 3-component SOF2 dimension bomb hits the same
    quarter decode-bomb cap as baseline color."""
    import struct

    g = _gradient(16, 24)
    blob = bytearray(MM.jpeg_encode_progressive(g, successive=True))
    # truncate at a spread of offsets past the headers
    for cut in (30, len(blob) // 4, len(blob) // 2, len(blob) - 3):
        try:
            MM.jpeg_decode_pixels(bytes(blob[:cut]))
        except (ValueError, MM.UnknownContainer):
            pass
        else:  # a very early cut can still decode scan 1 only — the
            # coefficients are then partial but structurally valid;
            # what is forbidden is succeeding on a cut INSIDE a
            # segment header, which the marker walk raises on
            assert cut >= len(blob) // 4, cut

    # dimension bomb in SOF2: 20k x 20k 3-component
    i = bytes(blob).find(b"\xff\xc2")
    bomb = bytearray(blob)
    bomb[i + 5:i + 9] = struct.pack(">HH", 20000, 20000)
    with pytest.raises(ValueError, match="decode-bomb"):
        MM.jpeg_decode_pixels(bytes(bomb))

    # flipped component count -> loud scope error
    badn = bytearray(blob)
    badn[i + 9] = 4
    with pytest.raises(ValueError, match="component count"):
        MM.jpeg_decode_pixels(bytes(badn))
