"""Multimodal plumbing tests: Arrow mapInPandas stages run with real
binary columns; the codec stubs are deterministic and the Spark-side
schema/fan-out/batch shapes are fully exercised."""

from __future__ import annotations

from advanced_strapi_import_spark.operators import multimodal as MM


def _bin_df(spark):
    return spark.createDataFrame(
        [(1, b"\x00" * 10), (2, b"\xff" * 300), (3, None)],
        "doc_id long, content binary",
    )


def test_decode_image_meta_stub(spark):
    out = MM.decode_image_meta(_bin_df(spark))
    got = {r["doc_id"]: r["image_meta"] for r in out.collect()}
    # deterministic fake dims derived from content length
    assert got[1]["width"] == 11 and got[1]["format"] == "fake"
    assert got[2]["width"] == 301
    assert got[3]["width"] == 1  # null payload -> length 0


def test_byte_histogram_shapes(spark):
    out = MM.byte_histogram(_bin_df(spark)).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert all(len(v) == 16 for v in by_doc.values())
    d1 = {r["bucket"]: r["count"] for r in by_doc[1]}
    assert d1[0] == 10 and sum(d1.values()) == 10      # all zero bytes
    d2 = {r["bucket"]: r["count"] for r in by_doc[2]}
    assert d2[15] == 300                                # all 0xff bytes
    assert all(r["n_bytes"] == 0 for r in by_doc[3])    # null payload


def test_resize_images_plumbing(spark):
    out = MM.resize_images(_bin_df(spark), 8, 4).collect()
    got = {r["doc_id"]: r for r in out}
    assert set(got) == {1, 2, 3}
    for r in got.values():
        # size-correct binary out, stub codec clearly marked
        assert len(r["content"]) == 8 * 4
        assert (r["width"], r["height"], r["codec"]) == (8, 4, "fake-raw")
    assert got[1]["content"] == b"\x00" * 32
    assert got[2]["content"] == b"\xff" * 32
    # deterministic: same input -> same bytes across runs/partitions
    again = {r["doc_id"]: r["content"]
             for r in MM.resize_images(_bin_df(spark).repartition(3), 8, 4).collect()}
    assert again == {k: r["content"] for k, r in got.items()}


def test_sample_frames_fanout(spark):
    df = spark.createDataFrame(
        [(1, bytes(range(256)) * 10), (2, b"xy"), (3, None)],
        "doc_id long, content binary",
    )
    out = MM.sample_frames(df, 3, frame_bytes=256).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1: 10 frames -> indices 0,3,6,9
    assert [r["frame_index"] for r in sorted(by_doc[1], key=lambda r: r["frame_index"])] == [0, 3, 6, 9]
    assert all(r["n_frames"] == 10 and len(r["frame"]) == 256 for r in by_doc[1])
    # doc 2: one short frame
    assert len(by_doc[2]) == 1 and by_doc[2][0]["frame"] == b"xy"
    # doc 3: empty payload -> zero rows (row explosion, not row-per-input)
    assert 3 not in by_doc


def test_real_codec_branch_and_corrupt_null(spark):
    # Exercise the real-codec branch without PIL in the container by
    # injecting an opener; the closure is cloudpickled into the worker.
    # A decode failure must surface as NULL image_meta, never fake dims.
    def opener(data):
        if bytes(data).startswith(b"PNG"):
            return len(data), 2 * len(data), "PNG"
        raise OSError("cannot identify image file")

    df = spark.createDataFrame(
        [(1, bytearray(b"PNG1234")), (2, bytearray(b"garbage"))],
        "doc_id long, content binary",
    )
    out = MM.decode_image_meta(df, opener=opener)
    result = {r["doc_id"]: r["image_meta"] for r in out.collect()}
    assert result[1] is not None and result[1]["width"] == 7
    assert result[1]["height"] == 14 and result[1]["format"] == "PNG"
    assert result[2] is None


def test_header_dimensions_real_decode():
    import struct

    png = (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR"
           + struct.pack(">II", 640, 480) + b"\x08\x02\x00\x00\x00")
    assert MM.header_dimensions(png) == (640, 480, "PNG")

    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00" * 4
    assert MM.header_dimensions(gif) == (320, 200, "GIF")

    # 14-byte file header, then BITMAPINFOHEADER (size field = 40)
    bmp = (b"BM" + b"\x00" * 12 + struct.pack("<I", 40)
           + struct.pack("<ii", 100, -50) + b"\x00" * 8)
    assert MM.header_dimensions(bmp) == (100, 50, "BMP")  # top-down abs()
    # the ancient BITMAPCOREHEADER (size 12) packs u16 dims elsewhere —
    # must refuse rather than misparse
    import pytest as _pt

    core = (b"BM" + b"\x00" * 12 + struct.pack("<I", 12)
            + struct.pack("<HH", 100, 50) + b"\x00" * 12)
    with _pt.raises(ValueError):
        MM.header_dimensions(core)

    # JPEG: SOI, APP0 segment, SOF0 with height=24 width=32
    jpeg = (b"\xff\xd8"
            + b"\xff\xe0" + struct.pack(">H", 4) + b"JF"
            + b"\xff\xc0" + struct.pack(">H", 11) + b"\x08"
            + struct.pack(">HH", 24, 32) + b"\x03\x00\x00\x00")
    assert MM.header_dimensions(jpeg) == (32, 24, "JPEG")

    import pytest

    with pytest.raises(MM.UnknownContainer):
        MM.header_dimensions(b"plain text payload")
    # recognized container, corrupt header -> ValueError but NOT unknown
    with pytest.raises(ValueError) as exc:
        MM.header_dimensions(b"\x89PNG\r\n\x1a\n" + b"\x00" * 8)
    assert not isinstance(exc.value, MM.UnknownContainer)


def test_decode_image_meta_header_sniff_in_spark(spark):
    import struct

    png = (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR"
           + struct.pack(">II", 640, 480) + b"\x08\x02\x00\x00\x00")
    corrupt_png = b"\x89PNG\r\n\x1a\n" + b"\x00" * 8
    df = spark.createDataFrame(
        [(1, bytearray(png)), (2, bytearray(corrupt_png)), (3, bytearray(b"\x00" * 10))],
        "doc_id long, content binary",
    )
    got = {r["doc_id"]: r["image_meta"]
           for r in MM.decode_image_meta(df).collect()}
    assert got[1]["width"] == 640 and got[1]["format"] == "PNG"  # real decode
    assert got[2] is None                                        # corrupt -> NULL
    assert got[3]["format"] == "fake"                            # unknown, no codec


def test_audio_header_meta_real_decode():
    import struct

    import pytest

    def wav(sr, ch, frames, bits=16):
        block = ch * bits // 8
        size = frames * block
        return (b"RIFF" + struct.pack("<I", 36 + size) + b"WAVEfmt " +
                struct.pack("<IHHIIHH", 16, 1, ch, sr, sr * block, block, bits) +
                b"data" + struct.pack("<I", size))

    assert MM.audio_header_meta(wav(16000, 2, 777)) == (16000, 2, 16, 777, 48, "WAV")
    # chunk walker copes with a LIST chunk before fmt
    b = wav(44100, 2, 1000)
    withlist = b[:12] + b"LIST" + struct.pack("<I", 4) + b"INFO" + b[12:]
    assert MM.audio_header_meta(withlist)[0] == 44100
    with pytest.raises(MM.UnknownContainer):
        MM.audio_header_meta(b"\x00" * 40)
    # recognized RIFF/WAVE but no fmt chunk -> bad data, not fake
    with pytest.raises(ValueError, match="missing"):
        MM.audio_header_meta(b"RIFF\x10\x00\x00\x00WAVEdata\x00\x00\x00\x00")


def test_decode_audio_meta_ladder(spark):
    import struct

    block = 2  # mono 16-bit
    size = 5 * block
    good = (b"RIFF" + struct.pack("<I", 36 + size) + b"WAVEfmt " +
            struct.pack("<IHHIIHH", 16, 1, 1, 8000, 8000 * block, block, 16) +
            b"data" + struct.pack("<I", size))
    corrupt = b"RIFF\x10\x00\x00\x00WAVEjunk\x00\x00\x00\x00"
    df = spark.createDataFrame(
        [(1, good), (2, corrupt), (3, b"not audio at all!")],
        "doc_id long, content binary",
    )
    got = {r["doc_id"]: r["audio_meta"] for r in MM.decode_audio_meta(df).collect()}
    assert got[1]["sample_rate"] == 8000 and got[1]["n_frames"] == 5
    assert got[1]["format"] == "WAV"
    assert got[2] is None          # recognized container, corrupt -> NULL
    assert got[3]["format"] == "fake"  # unknown container -> marked stub


def test_video_header_meta_real_decode():
    import struct

    import pytest

    def avi(uspf, frames, w, h):
        body = struct.pack("<10I", uspf, 0, 0, 0, frames, 0, 1, 0, w, h) \
            + struct.pack("<4I", 0, 0, 0, 0)
        return (b"RIFF" + struct.pack("<I", 4 + 12 + 64) + b"AVI " +
                b"LIST" + struct.pack("<I", 4 + 8 + 56) + b"hdrl" +
                b"avih" + struct.pack("<I", 56) + body)

    # 24 fps NTSC-ish: 41666 us/frame, 2400 frames
    assert MM.video_header_meta(avi(41666, 2400, 1920, 1080)) == (
        1920, 1080, 2400, 24000, 99998, "AVI")
    with pytest.raises(MM.UnknownContainer):
        MM.video_header_meta(b"\x00" * 40)
    # recognized AVI but no avih -> bad data, not fake
    with pytest.raises(ValueError, match="missing"):
        MM.video_header_meta(b"RIFF\x04\x00\x00\x00AVI ")


def test_decode_video_meta_ladder(spark):
    import struct

    body = struct.pack("<10I", 40000, 0, 0, 0, 250, 0, 1, 0, 640, 480) \
        + struct.pack("<4I", 0, 0, 0, 0)
    good = (b"RIFF" + struct.pack("<I", 4 + 12 + 64) + b"AVI " +
            b"LIST" + struct.pack("<I", 4 + 8 + 56) + b"hdrl" +
            b"avih" + struct.pack("<I", 56) + body)
    corrupt = b"RIFF\x08\x00\x00\x00AVI junk"
    df = spark.createDataFrame(
        [(1, good), (2, corrupt), (3, b"definitely not video")],
        "doc_id long, content binary",
    )
    got = {r["doc_id"]: r["video_meta"] for r in MM.decode_video_meta(df).collect()}
    assert got[1]["width"] == 640 and got[1]["total_frames"] == 250
    assert got[1]["fps_millis"] == 25000 and got[1]["format"] == "AVI"
    assert got[2] is None                # recognized, corrupt -> NULL
    assert got[3]["format"] == "fake"    # unknown -> marked stub


def test_sniff_media_meta_dispatch_and_unknown(spark):
    # magic-byte dispatch picks the right parser per payload; garbage
    # and NULL payloads surface as 'unknown' with NULL primary_dim,
    # never a dropped row or fake numbers
    from advanced_strapi_import_spark.operators.multimodal import (
        sniff_media_meta,
    )

    png = (
        bytes.fromhex("89504E470D0A1A0A0000000D49484452")
        + (7).to_bytes(4, "big")
        + (5).to_bytes(4, "big")
        + bytes.fromhex("0802000000")
    )
    wav = (
        b"RIFF" + (40).to_bytes(4, "little") + b"WAVEfmt "
        + (16).to_bytes(4, "little") + (1).to_bytes(2, "little")
        + (1).to_bytes(2, "little") + (8000).to_bytes(4, "little")
        + (16000).to_bytes(4, "little") + (2).to_bytes(2, "little")
        + (16).to_bytes(2, "little") + b"data" + (4).to_bytes(4, "little")
    )
    rows = [(1, png), (2, wav), (3, b"not a container"), (4, None)]
    df = spark.createDataFrame(rows, "doc_id bigint, content binary")
    got = {
        r["doc_id"]: (r["media_type"], r["primary_dim"], r["payload_bytes"])
        for r in sniff_media_meta(df).collect()
    }
    assert got[1] == ("PNG", 7, len(png))
    assert got[2] == ("WAV", 8000, len(wav))
    assert got[3] == ("unknown", None, 15)
    assert got[4] == ("unknown", None, 0)
    assert len(got) == 4


def test_sniff_media_meta_custom_id_col(spark):
    """The id column must pass through under its own name and Spark
    type (string here), not relabeled doc_id/bigint."""
    from pyspark.sql import functions as F

    from advanced_strapi_import_spark.operators.multimodal import (
        sniff_media_meta,
    )

    df = spark.createDataFrame(
        [("a", b"\x89PNG\r\n\x1a\x0anot-a-real-header"), ("b", b"junk")],
        "name string, payload binary",
    )
    out = sniff_media_meta(df, id_col="name", content_col="payload")
    assert out.schema["name"].dataType.simpleString() == "string"
    rows = {r["name"]: r for r in out.collect()}
    assert set(rows) == {"a", "b"}
    assert rows["b"]["media_type"] == "unknown"
    assert rows["b"]["payload_bytes"] == 4


# --- real pixel/sample decode ------------------------------------------------


def test_png_pixel_roundtrip_all_filters():
    """Encoder filters y%5 exercise None/Sub/Up/Average/Paeth; decode
    must reproduce every pixel bit-for-bit, RGB and grayscale, odd
    widths included."""
    import numpy as np

    rng = np.random.default_rng(11)
    for w, h, color in [(16, 13, 2), (5, 9, 2), (1, 6, 2), (7, 4, 0)]:
        ch = 3 if color == 2 else 1
        px = rng.integers(0, 256, size=(h, w * ch), dtype=np.uint8)
        data = MM.png_encode_pixels(px, color=color)
        w2, h2, ch2, out = MM.png_decode_pixels(data)
        assert (w2, h2, ch2) == (w, h, ch)
        assert np.array_equal(out, px)
        # header-only parser agrees with the full decoder
        assert MM.header_dimensions(data) == (w, h, "PNG")


def test_png_decode_rejects_unsupported_and_corrupt():
    import struct
    import zlib

    import numpy as np
    import pytest

    px = np.zeros((2, 6), np.uint8)
    good = MM.png_encode_pixels(px)
    with pytest.raises(MM.UnknownContainer):
        MM.png_decode_pixels(b"not a png at all")
    # truncated IDAT payload (decompresses short)
    bad = bytearray(good)
    # corrupt the IHDR bit depth -> unsupported variant
    ihdr_off = 8 + 8
    bad[ihdr_off + 8] = 16
    with pytest.raises(ValueError):
        MM.png_decode_pixels(bytes(bad))
    # interlaced flag -> unsupported
    bad = bytearray(good)
    bad[ihdr_off + 12] = 1
    with pytest.raises(ValueError):
        MM.png_decode_pixels(bytes(bad))


def test_bmp_pixel_roundtrip_padding_and_bgr():
    """Widths 3 and 7 force nonzero row padding; distinct channel
    values prove BGR->RGB reorder and bottom-up re-flip."""
    import numpy as np

    px = np.zeros((2, 3 * 3), np.uint8)
    px[0] = [10, 20, 30, 11, 21, 31, 12, 22, 32]  # top row, RGB triplets
    px[1] = [50, 60, 70, 51, 61, 71, 52, 62, 72]
    data = MM.bmp_encode_pixels(px)
    w, h, ch, out = MM.bmp_decode_pixels(data)
    assert (w, h, ch) == (3, 2, 3)
    assert np.array_equal(out, px)
    rng = np.random.default_rng(3)
    for w_, h_ in [(7, 5), (4, 1), (1, 4)]:
        p = rng.integers(0, 256, size=(h_, w_ * 3), dtype=np.uint8)
        assert np.array_equal(MM.bmp_decode_pixels(MM.bmp_encode_pixels(p))[3], p)


def test_wav_sample_roundtrip_mono_stereo():
    import numpy as np
    import pytest

    rng = np.random.default_rng(5)
    for chn in (1, 2):
        s = rng.integers(-32768, 32768, size=(40, chn)).astype(np.int16)
        data = MM.wav_encode_samples(22050, s)
        sr, c, out = MM.wav_decode_samples(data)
        assert (sr, c) == (22050, chn)
        assert np.array_equal(out, s)
        # header-only parser agrees on the frame count
        assert MM.audio_header_meta(data)[3] == 40
    with pytest.raises(MM.UnknownContainer):
        MM.wav_decode_samples(b"RIFFxxxxAVI is not wave")


def test_image_pixel_stats_mixed_and_corrupt(spark):
    """One Arrow stage dispatches PNG + BMP payloads and NULLs the
    corrupt row without dropping it."""
    import numpy as np

    png_px = np.arange(24, dtype=np.uint8).reshape(2, 12)  # 4x2 RGB
    bmp_px = np.full((3, 6), 7, np.uint8)  # 2x3 RGB
    df = spark.createDataFrame(
        [
            (1, MM.png_encode_pixels(png_px)),
            (2, MM.bmp_encode_pixels(bmp_px)),
            (3, b"garbage bytes here"),
        ],
        "doc_id long, content binary",
    )
    rows = {r["doc_id"]: r for r in MM.image_pixel_stats(df).collect()}
    assert rows[1]["format"] == "PNG" and rows[1]["width"] == 4
    assert rows[1]["n_vals"] == 24 and rows[1]["px_max"] == 23
    assert rows[1]["sum_c0"] == sum(range(0, 24, 3))
    assert rows[2]["format"] == "BMP" and rows[2]["sum_c1"] == 7 * 6
    assert rows[3]["format"] == "unknown" and rows[3]["n_vals"] is None


def test_audio_pcm_features_values(spark):
    import numpy as np

    s = np.array([[100], [-200], [300], [0], [-1]], np.int16)
    df = spark.createDataFrame(
        [(1, MM.wav_encode_samples(8000, s)), (2, b"nope")],
        "doc_id long, content binary",
    )
    rows = {r["doc_id"]: r for r in MM.audio_pcm_features(df).collect()}
    assert rows[1]["n_frames"] == 5
    assert rows[1]["sum_sq"] == 100**2 + 200**2 + 300**2 + 0 + 1
    assert rows[1]["peak"] == 300
    # sign pairs: (100,-200) (-200,300) (300,0) (0,-1) -> 2 strict crossings
    assert rows[1]["zero_crossings"] == 2
    assert rows[2]["sum_sq"] is None


def test_resize_images_real_nearest_neighbor(spark):
    """Real decode -> exact integer-grid nearest-neighbor -> PNG
    re-encode; downscale of a known gradient is predictable, and
    undecodable payloads keep their row with NULL content."""
    import numpy as np

    w, h = 6, 4
    ys, xs, cs = np.ogrid[0:h, 0:w, 0:3]
    px = ((xs * 7 + ys * 13 + cs * 101) % 256).astype(np.uint8)
    src = px.reshape(h, w * 3)
    df = spark.createDataFrame(
        [(1, MM.png_encode_pixels(src)), (2, b"not an image")],
        "doc_id long, content binary",
    )
    rows = {r["doc_id"]: r for r in MM.resize_images_real(df, 2, 2).collect()}
    assert rows[2]["content"] is None and rows[2]["codec"] is None
    w2, h2, ch2, out = MM.png_decode_pixels(bytes(rows[1]["content"]))
    assert (w2, h2, ch2) == (2, 2, 3)
    # nearest-neighbor map: src_x = dst_x*6//2 -> {0,3}; src_y = dst_y*4//2 -> {0,2}
    expect = px[np.ix_([0, 2], [0, 3])].reshape(2, 6)
    assert np.array_equal(out, expect)


def test_lzw_roundtrip_stress():
    """Pure-Python GIF LZW: random (table growth + width bumps),
    repetitive (KwKwK self-reference), and 100k-byte (12-bit CLEAR
    reset) streams all round-trip; corrupt streams raise."""
    import numpy as np
    import pytest

    rng = np.random.default_rng(13)
    for data in [
        rng.integers(0, 256, 5000).astype(np.uint8).tobytes(),
        b"\x00" * 4000,
        bytes(range(256)) * 40,
        rng.integers(0, 256, 100000).astype(np.uint8).tobytes(),
        b"",
    ]:
        assert MM._lzw_decompress(MM._lzw_compress(data)) == data
    with pytest.raises(ValueError):
        # a max-width code pointing far beyond the table
        MM._lzw_decompress(b"\xff\xff\xff\xff")


def test_gif_pixel_roundtrip_and_dispatch(spark):
    import numpy as np

    rng = np.random.default_rng(5)
    g = rng.integers(0, 256, size=(12, 16), dtype=np.uint8)
    data = MM.gif_encode_pixels(g)
    w, h, ch, out = MM.gif_decode_pixels(data)
    assert (w, h, ch) == (16, 12, 3)
    expect = np.repeat(g.reshape(12, 16, 1), 3, axis=2).reshape(12, 48)
    assert np.array_equal(out, expect)
    assert MM.header_dimensions(data) == (16, 12, "GIF")
    # shared dispatch: stats stage decodes GIF alongside PNG/BMP
    df = spark.createDataFrame(
        [(1, data), (2, b"GIF87a<truncated-garbage>")],
        "doc_id long, content binary",
    )
    rows = {r["doc_id"]: r for r in MM.image_pixel_stats(df).collect()}
    assert rows[1]["format"] == "GIF" and rows[1]["n_vals"] == 16 * 12 * 3
    assert rows[1]["sum_c0"] == rows[1]["sum_c1"] == int(g.astype(int).sum())
    assert rows[2]["format"] == "unknown"


# ---------------------------------------------------------------------------
# decode-bomb guards (round 8): corrupt/malicious headers and
# expansion bombs must raise BEFORE any gigabyte allocation
# ---------------------------------------------------------------------------
def test_png_dimension_bomb_rejected():
    import pytest
    import struct
    import zlib

    import numpy as np

    from advanced_strapi_import_spark.operators import multimodal as MM

    # craft a PNG claiming 60000x60000 grayscale with a tiny IDAT
    def chunk(tag, body):
        c = struct.pack(">I", len(body)) + tag + body
        return c + struct.pack(">I", zlib.crc32(tag + body))

    ihdr = struct.pack(">IIBBBBB", 60000, 60000, 8, 0, 0, 0, 0)
    data = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(b"\x00" * 64))
            + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="decode-bomb guard"):
        MM.png_decode_pixels(data)


def test_png_deflate_bomb_detected_bounded():
    import pytest
    import zlib

    import numpy as np

    from advanced_strapi_import_spark.operators import multimodal as MM

    # valid small dims, but the IDAT inflates far past the declared
    # payload: must raise after at most want+1 inflated bytes
    good = MM.png_encode_pixels(
        np.zeros((4, 4), dtype=np.uint8), color=0, filters=[0, 0, 0, 0]
    )
    # splice in a bomb IDAT: 1 MB of zeros compressed to ~1 KB
    bomb = zlib.compress(b"\x00" * (1 << 20))
    import struct

    def chunk(tag, body):
        c = struct.pack(">I", len(body)) + tag + body
        return c + struct.pack(">I", zlib.crc32(tag + body))

    i = good.index(b"IDAT") - 4
    j = good.index(b"IEND") - 4
    data = good[:i] + chunk(b"IDAT", bomb) + good[j:]
    with pytest.raises(ValueError, match="IDAT payload length"):
        MM.png_decode_pixels(data)


def test_jpeg_dimension_bomb_rejected():
    import pytest
    import numpy as np

    from advanced_strapi_import_spark.operators import multimodal as MM

    data = bytearray(MM.jpeg_encode_gray(np.zeros((8, 8), dtype=np.int64)))
    i = data.find(b"\xff\xc0")
    # SOF0 payload: len(2) prec(1) h(2) w(2) — claim 65535x65535
    data[i + 5:i + 9] = b"\xff\xff\xff\xff"
    with pytest.raises(ValueError, match="decode-bomb guard"):
        MM.jpeg_decode_pixels(bytes(data))


def test_gif_lzw_bomb_detected_bounded():
    import pytest
    import numpy as np

    from advanced_strapi_import_spark.operators import multimodal as MM

    # encode a large image, then shrink the DECLARED dims: the LZW
    # stream now inflates past w*h and must be rejected at the cap,
    # not materialized
    big = MM.gif_encode_pixels(np.zeros((64, 64), dtype=np.uint8))
    data = bytearray(big)
    import struct

    # image descriptor sits after the 13-byte header + global color
    # table (find() would hit palette bytes equal to 0x2C first)
    n = 2 << (data[10] & 7)
    i = 13 + 3 * n
    assert data[i] == 0x2C
    # descriptor: 0x2C l(2) t(2) w(2) h(2) flags — patch w,h to 2x2
    data[i + 5:i + 9] = struct.pack("<HH", 2, 2)
    # logical screen dims too (not load-bearing for the guard)
    data[6:10] = struct.pack("<HH", 2, 2)
    with pytest.raises(ValueError, match="inflates past"):
        MM.gif_decode_pixels(bytes(data))


def test_guards_leave_valid_payloads_untouched():
    import numpy as np

    from advanced_strapi_import_spark.operators import multimodal as MM

    g = (np.arange(64, dtype=np.uint8).reshape(8, 8) * 3) % 256
    assert MM.png_decode_pixels(
        MM.png_encode_pixels(g, color=0)
    )[3].shape == (8, 8)
    assert MM.gif_decode_pixels(MM.gif_encode_pixels(g))[2] == 3
    w, h, ch, px = MM.jpeg_decode_pixels(
        MM.jpeg_encode_gray(g.astype(np.int64))
    )
    assert (w, h) == (8, 8)


def test_system_codec_scope_mirrors_pure_decoders():
    """The bridge's eligibility pre-checks must accept exactly what
    the pure decoders accept — a payload outside pure scope must fall
    through (and keep raising via the pure path) even when PIL could
    decode it, or the bridge would silently change which rows a query
    counts as decodable."""
    import numpy as np

    px = (np.arange(48, dtype=np.uint8)).reshape(4, 12)
    png = MM.png_encode_pixels(px, color=2)
    assert MM._png_pure_scope(png)
    # 16-bit depth and interlace are outside pure scope
    deep = bytearray(png)
    deep[24] = 16
    assert not MM._png_pure_scope(bytes(deep))
    inter = bytearray(png)
    inter[28] = 1
    assert not MM._png_pure_scope(bytes(inter))
    assert not MM._png_pure_scope(b"\x89PNG\r\n\x1a\n")  # truncated

    bmp = MM.bmp_encode_pixels(px)
    assert MM._bmp_pure_scope(bmp)
    bad_bits = bytearray(bmp)
    bad_bits[28] = 8  # 8bpp palette BMP: pure decoder rejects
    assert not MM._bmp_pure_scope(bytes(bad_bits))
    rle = bytearray(bmp)
    rle[30] = 1  # BI_RLE8 compression
    assert not MM._bmp_pure_scope(bytes(rle))


def test_system_codec_bridge_off_and_absent(monkeypatch):
    """With SPARK_GRAFT_SYSTEM_CODECS=off — or PIL unimportable, the
    state of this container — the bridge must return None and
    _decode_image_pixels must produce pure-path output."""
    import numpy as np

    px = ((np.arange(60) * 4 % 251).astype(np.uint8)).reshape(5, 12)
    png = MM.png_encode_pixels(px, color=2)
    monkeypatch.setenv("SPARK_GRAFT_SYSTEM_CODECS", "off")
    assert MM._system_decode_pixels(png, "PNG") is None
    monkeypatch.delenv("SPARK_GRAFT_SYSTEM_CODECS", raising=False)
    w, h, ch, arr, fmt = MM._decode_image_pixels(png)
    assert (w, h, ch, fmt) == (4, 5, 3, "PNG")
    assert np.array_equal(arr, px)


def test_system_codec_bridge_plumbing_with_fake_pil(monkeypatch):
    """Exercise the PIL-side plumbing (open/size/mode/__array__ ->
    reshape to the pure (h, w*ch) convention) with a stub module that
    decodes via the pure codecs — validates the bridge produces
    BIT-IDENTICAL arrays to the pure path, which is the 'auto' mode
    contract. Runs everywhere; the Pillow-backed equality test below
    runs where Pillow exists."""
    import io

    import numpy as np

    class _Img:
        def __init__(self, w, h, ch, arr):
            self.size = (w, h)
            self.mode = "RGB" if ch == 3 else "L"
            self._a = (
                arr.reshape(h, w, ch) if ch == 3 else arr.reshape(h, w)
            )

        def convert(self, mode):
            assert mode == "RGB" and self.mode == "RGB"
            return self

        def __array__(self, dtype=None, copy=None):
            return self._a

    class _FakeImage:
        @staticmethod
        def open(fobj):
            data = fobj.read()
            if data[:8] == b"\x89PNG\r\n\x1a\n":
                return _Img(*MM.png_decode_pixels(data))
            return _Img(*MM.bmp_decode_pixels(data))

    monkeypatch.setattr(MM, "_PIL_CACHE", [_FakeImage])
    px = (np.arange(144) * 7 % 256).astype(np.uint8).reshape(6, 24)
    for blob in (MM.png_encode_pixels(px, color=2),
                 MM.bmp_encode_pixels(px)):
        got = MM._system_decode_pixels(blob, 
              "PNG" if blob[:2] != b"BM" else "BMP")
        assert got is not None  # bridge engaged
        w, h, ch, arr = got
        assert (w, h, ch) == (8, 6, 3)
        assert arr.flags["C_CONTIGUOUS"] and arr.dtype == np.uint8
        assert np.array_equal(arr, px)  # bit-identical to pure path
    # grayscale lane
    g = (np.arange(35) * 3 % 256).astype(np.uint8).reshape(5, 7)
    got = MM._system_decode_pixels(MM.png_encode_pixels(g, color=0), "PNG")
    assert got is not None and got[2] == 1
    assert np.array_equal(got[3], g)


def test_system_codec_bridge_auto_caps_mirror_pure_path(monkeypatch):
    """Round-10 ADVICE fix: in auto mode the bridge applies EXACTLY the
    pure path's decode-bomb guards — PNG keeps the MAX_DECODE_PIXELS
    cap with NO RGB/4 tightening, BMP has no pixel cap at all. The old
    bridge raised on an RGB PNG between MAX/4 and MAX pixels, making
    query results depend on whether Pillow was installed."""
    import numpy as np

    class _Img:
        def __init__(self, w, h, ch, arr):
            self.size = (w, h)
            self.mode = "RGB" if ch == 3 else "L"
            self._a = (
                arr.reshape(h, w, ch) if ch == 3 else arr.reshape(h, w)
            )

        def convert(self, mode):
            return self

        def __array__(self, dtype=None, copy=None):
            return self._a

    class _FakeImage:
        @staticmethod
        def open(fobj):
            data = fobj.read()
            if data[:8] == b"\x89PNG\r\n\x1a\n":
                return _Img(*MM.png_decode_pixels(data))
            return _Img(*MM.bmp_decode_pixels(data))

    monkeypatch.setattr(MM, "_PIL_CACHE", [_FakeImage])
    monkeypatch.setattr(MM, "MAX_DECODE_PIXELS", 1 << 10)
    # RGB PNG with MAX/4 < w*h <= MAX: pure path accepts, bridge must too
    w, h = 32, 24  # 768 px: above 256 (=MAX/4), below 1024 (=MAX)
    px = (np.arange(h * w * 3) % 256).astype(np.uint8).reshape(h, w * 3)
    got = MM._system_decode_pixels(MM.png_encode_pixels(px, color=2), "PNG")
    assert got is not None and got[:3] == (w, h, 3)
    assert np.array_equal(got[3], px)
    # RGB PNG ABOVE MAX still raises (the pure guard, mirrored)
    import pytest as _pt

    with _pt.raises(ValueError, match="MAX_DECODE_PIXELS"):
        MM._system_decode_pixels(
            MM.png_encode_pixels(
                np.zeros((33, 33 * 3), dtype=np.uint8), color=2
            ),
            "PNG",
        )
    # BMP has NO pixel cap in the pure decoder: bridge must not add one
    bpx = (np.arange(40 * 30 * 3) % 256).astype(np.uint8).reshape(30, 120)
    got = MM._system_decode_pixels(MM.bmp_encode_pixels(bpx), "BMP")
    assert got is not None and got[:3] == (40, 30, 3)
    assert np.array_equal(got[3], bpx)


def test_system_codec_bridge_pillow_equality():
    """Where real Pillow exists: PNG/BMP decode through PIL must be
    bit-identical to the pure decoders (lossless formats)."""
    import numpy as np
    import pytest as _pt

    if MM._pil_image_module.__globals__:  # reset probe cache first
        MM._PIL_CACHE.clear()
    if MM._pil_image_module() is None:
        _pt.skip("Pillow not installed in this container")
    px = ((np.arange(300) * 11 % 256).astype(np.uint8)).reshape(10, 30)
    for blob, fmt in ((MM.png_encode_pixels(px, color=2), "PNG"),
                      (MM.bmp_encode_pixels(px), "BMP")):
        got = MM._system_decode_pixels(blob, fmt)
        assert got is not None
        pure = (MM.png_decode_pixels(blob) if fmt == "PNG"
                else MM.bmp_decode_pixels(blob))
        assert got[:3] == pure[:3]
        assert np.array_equal(got[3], pure[3])


def test_decoder_corrupt_streams_raise_valueerror_only():
    """Deterministic truncation + bit-flip fuzz over every pixel
    decoder (round 9): a corrupt stream must either decode (bit flips
    in pixel payloads are legal data changes; a truncated PROGRESSIVE
    stream is by design a valid lower-precision image) or raise
    ValueError — never a bare struct/zlib/Index/Key error and never a
    hang. This is the documented contract the Arrow stats kernel's
    guard row and direct callers both rely on."""
    import numpy as np

    px = (np.arange(16 * 24 * 3) * 7 % 256).astype(np.uint8).reshape(
        16, 24 * 3
    )
    gray = px[:, :24].astype(np.int64)
    samples = [
        MM.png_encode_pixels(px, color=2),
        MM.bmp_encode_pixels(px),
        MM.gif_encode_pixels(px),
        MM.jpeg_encode_gray(gray),
        MM.jpeg_encode_progressive(gray, successive=True),
    ]
    for blob in samples:
        n = len(blob)
        cases = [blob[:c] for c in range(1, n, max(1, n // 60))]
        for pos in range(0, n, max(1, n // 90)):
            b = bytearray(blob)
            b[pos] ^= 0x5A
            cases.append(bytes(b))
        for c in cases:
            try:
                MM._decode_image_pixels(bytes(c))
            except ValueError:
                pass  # includes UnknownContainer
