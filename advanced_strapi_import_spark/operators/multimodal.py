"""Multimodal column handling: image/audio/video as opaque binary
columns + typed metadata, with decode / feature-extract / resize /
frame-sample as Arrow-batched Pandas UDF stages over mapInPandas.

The container has no image/audio codecs, so the DECODE step is stubbed
(STUB: deterministic fake or NotImplementedError per the build spec);
everything Spark-side — schemas, partitioning, UDF signatures, Arrow
batch shapes — is real and tested. Swap `_fake_decode` for
PIL/libav in production; the plan shape does not change.

Scale notes: binary payloads ride in Arrow record batches; keep
``spark.sql.execution.arrow.maxRecordsPerBatch`` modest (payload-sized
batches) and partition by file, never collect. Feature extraction emits
fixed-width vectors so downstream similarity joins are column-pruned.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import types as T

IMAGE_META = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("format", T.StringType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("bucket", T.IntegerType()),
        T.StructField("count", T.LongType()),
    ]
)


def _have_pil() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def _fake_decode(data: bytes) -> tuple[int, int, str]:
    """STUB decode: deterministic fake dimensions derived from content
    length (real codecs are not in this container). Replace with
    PIL.Image.open for production."""
    n = len(data or b"")
    return (n % 512 + 1, (n * 7) % 512 + 1, "fake")


def _pil_open(data: bytes) -> tuple[int, int, str]:
    """Real-codec decode (runs worker-side; PIL imported lazily there)."""
    import io

    from PIL import Image

    im = Image.open(io.BytesIO(data))
    return im.width, im.height, im.format or ""


class UnknownContainer(ValueError):
    """Bytes whose container format the header sniffer does not know —
    distinct from a RECOGNIZED container with a corrupt header, which
    must surface as bad data (NULL), never fall through to a stub."""


def header_dimensions(data: bytes) -> tuple[int, int, str]:
    """REAL metadata decode with no codec library: parse width/height
    out of the container header for PNG / JPEG / GIF / BMP — the same
    header-sniff fast image-metadata tools use (no pixel decompression
    is needed to know dimensions). Raises ValueError on anything it
    cannot prove, so corrupt input surfaces as NULL meta, never as
    plausible fake numbers.

    Format references (public specs): PNG IHDR is the first chunk after
    the 8-byte signature (width/height big-endian u32 at offsets
    16/20); JPEG dimensions live in the first SOFn marker (height then
    width, big-endian u16); GIF87a/89a pack width/height little-endian
    u16 at offsets 6/8; BMP's BITMAPINFOHEADER has signed little-endian
    i32 at offsets 18/22 (height may be negative for top-down rows)."""
    import struct

    if data is None or len(data) < 10:
        raise UnknownContainer("too short")
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        if len(data) < 24 or data[12:16] != b"IHDR":
            raise ValueError("bad PNG IHDR")
        w, h = struct.unpack(">II", data[16:24])
        return w, h, "PNG"
    if data[:2] == b"\xff\xd8":  # JPEG SOI
        i = 2
        while i + 9 < len(data):
            if data[i] != 0xFF:
                raise ValueError("bad JPEG marker stream")
            marker = data[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            seg_len = struct.unpack(">H", data[i + 2:i + 4])[0]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w = struct.unpack(">HH", data[i + 5:i + 9])
                return w, h, "JPEG"
            i += 2 + seg_len
        raise ValueError("no JPEG SOF marker")
    if data[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", data[6:10])
        return w, h, "GIF"
    if data[:2] == b"BM":
        if len(data) < 26:
            raise ValueError("bad BMP header")
        # the i32-dims layout needs BITMAPINFOHEADER (size >= 40); the
        # ancient BITMAPCOREHEADER (size 12) packs u16 dims at other
        # offsets and would misparse as garbage -> corrupt, not fake
        (hsz,) = struct.unpack("<I", data[14:18])
        if hsz < 40:
            raise ValueError("unsupported BMP header variant")
        w, h = struct.unpack("<ii", data[18:26])
        return w, abs(h), "BMP"
    raise UnknownContainer("unknown container")


def decode_image_meta(
    df: DataFrame, binary_col: str = "content", opener=None
) -> DataFrame:
    """Attach image metadata struct via an Arrow-batched pandas stage.

    ``opener``: callable(bytes) -> (width, height, format), raising on
    corrupt input — the injection point for alternative codecs and for
    tests (a closure passed here is cloudpickled into the worker, where
    a driver-side monkeypatch would not reach).

    Default decode ladder (all worker-side):
      1. ``header_dimensions`` — REAL metadata decode, no codec
         library: PNG/JPEG/GIF/BMP dimensions parsed from the container
         header. A RECOGNIZED container with a corrupt header is bad
         data -> NULL image_meta, never fake numbers.
      2. unknown container + PIL importable -> PIL decode (failure ->
         NULL).
      3. unknown container, no codec in the environment -> the
         clearly-marked deterministic ``_fake_decode`` stub, so the
         Arrow plumbing stays exercisable in codec-less containers."""
    out_schema = T.StructType(df.schema.fields + [T.StructField("image_meta", IMAGE_META)])
    pil = _have_pil()

    def default_decode(data):
        try:
            return header_dimensions(data)
        except UnknownContainer:
            if pil:
                return _pil_open(data)  # failure propagates -> NULL
            return _fake_decode(data)

    real = opener if opener is not None else default_decode

    def stage(batches) -> Iterator:
        for pdf in batches:
            metas = []
            for data in pdf[binary_col]:
                try:
                    w, h, fmt = real(data)
                    metas.append({"width": w, "height": h, "format": fmt})
                except Exception:
                    metas.append(None)
            pdf = pdf.copy()
            pdf["image_meta"] = metas
            yield pdf

    return df.mapInPandas(stage, out_schema)


def byte_histogram(
    df: DataFrame, *, id_col: str = "doc_id", binary_col: str = "content",
    buckets: int = 16,
) -> DataFrame:
    """Feature extraction: 16-bucket byte-value histogram per document —
    the deterministic stand-in for an embedding/feature extractor, and a
    real Arrow round-trip (binary in, long rows out)."""

    def stage(batches) -> Iterator:
        import numpy as np
        import pandas as pd

        width = 256 // buckets
        for pdf in batches:
            ids, bks, cnts, lens = [], [], [], []
            for i, data in zip(pdf[id_col], pdf[binary_col]):
                data = data or b""
                arr = np.frombuffer(data, dtype=np.uint8)
                hist = np.bincount(arr // width, minlength=buckets)
                ids.extend([i] * buckets)
                bks.extend(range(buckets))
                cnts.extend(int(c) for c in hist)
                lens.extend([len(data)] * buckets)
            yield pd.DataFrame(
                {"doc_id": ids, "n_bytes": lens, "bucket": bks, "count": cnts}
            )

    return df.select(id_col, binary_col).mapInPandas(stage, FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("codec", T.StringType()),
        T.StructField("content", T.BinaryType()),
    ]
)


def resize_images(
    df: DataFrame, width: int, height: int,
    *, id_col: str = "doc_id", binary_col: str = "content",
) -> DataFrame:
    """Resize every image payload to width x height via an Arrow
    mapInPandas stage. The codec is STUBBED (no PIL/opencv in this
    container): the fake "resize" strides the payload bytes to exactly
    width*height output bytes — deterministic, size-correct, and
    partition-independent, so the Spark plumbing (schema, batch shape,
    binary out) is fully exercised. Swap the body for
    PIL.Image.resize in production; the plan does not change."""
    n_out = width * height

    def stage(batches) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = {"doc_id": [], "width": [], "height": [], "codec": [],
                    "content": []}
            for i, data in zip(pdf[id_col], pdf[binary_col]):
                data = data or b"\x00"
                arr = np.frombuffer(data, dtype=np.uint8)
                # STUB resample: nearest-neighbor over the byte stream
                idx = (np.arange(n_out) * len(arr)) // n_out
                rows["doc_id"].append(i)
                rows["width"].append(width)
                rows["height"].append(height)
                rows["codec"].append("fake-raw")
                rows["content"].append(arr[idx].tobytes())
            yield pd.DataFrame(rows)

    return df.select(id_col, binary_col).mapInPandas(stage, RESIZED_SCHEMA)


AUDIO_META = T.StructType(
    [
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("bits_per_sample", T.IntegerType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("format", T.StringType()),
    ]
)


def audio_header_meta(data: bytes) -> tuple[int, int, int, int, int, str]:
    """REAL audio-metadata decode with no codec library: parse sample
    rate / channels / bit depth / frame count out of a RIFF/WAVE header
    (public spec: RIFF container, ``fmt `` chunk holds PCM parameters
    little-endian, ``data`` chunk length gives the sample payload).
    Walks the chunk list, so non-canonical chunk orders (LIST/INFO
    before data) parse too. Duration is integer math —
    ``data_size * 1000 // byte_rate`` — so engines agree bit-for-bit.

    Raises :class:`UnknownContainer` for non-RIFF bytes and ValueError
    for a recognized RIFF/WAVE with a corrupt or missing fmt/data chunk
    (bad data must surface as NULL meta, never as fake numbers)."""
    import struct

    if data is None or len(data) < 12:
        raise UnknownContainer("too short")
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise UnknownContainer("not RIFF/WAVE")
    pos, fmt, data_size = 12, None, None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        (clen,) = struct.unpack("<I", data[pos + 4:pos + 8])
        if cid == b"fmt ":
            if clen < 16 or pos + 8 + 16 > len(data):
                raise ValueError("bad fmt chunk")
            fmt = struct.unpack("<HHIIHH", data[pos + 8:pos + 24])
        elif cid == b"data":
            data_size = clen
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None or data_size is None:
        raise ValueError("missing fmt/data chunk")
    _, channels, sample_rate, byte_rate, block_align, bits = fmt
    if not (channels and sample_rate and byte_rate and block_align):
        raise ValueError("zero-valued fmt field")
    n_frames = data_size // block_align
    duration_ms = data_size * 1000 // byte_rate
    return sample_rate, channels, bits, n_frames, duration_ms, "WAV"


def decode_audio_meta(
    df: DataFrame, binary_col: str = "content", opener=None
) -> DataFrame:
    """Attach an ``audio_meta`` struct via an Arrow mapInPandas stage —
    the audio face of :func:`decode_image_meta`, same decode ladder:

      1. :func:`audio_header_meta` — REAL RIFF/WAVE header parse, no
         codec library; recognized-but-corrupt -> NULL, never fake.
      2. unknown container -> the clearly-marked deterministic fake
         (no audio codec exists in this container), keeping the Arrow
         plumbing exercisable; swap ``opener`` for soundfile/libav in
         production without changing the plan."""
    out_schema = T.StructType(df.schema.fields + [T.StructField("audio_meta", AUDIO_META)])

    def default_decode(data):
        try:
            return audio_header_meta(data)
        except UnknownContainer:
            n = len(data or b"")
            return (8000, 1, 16, n, n * 1000 // 16000, "fake")

    real = opener if opener is not None else default_decode
    keys = ("sample_rate", "channels", "bits_per_sample", "n_frames",
            "duration_ms", "format")

    def stage(batches) -> Iterator:
        for pdf in batches:
            metas = []
            for data in pdf[binary_col]:
                try:
                    metas.append(dict(zip(keys, real(data))))
                except Exception:
                    metas.append(None)
            pdf = pdf.copy()
            pdf["audio_meta"] = metas
            yield pdf

    return df.mapInPandas(stage, out_schema)


VIDEO_META = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("total_frames", T.LongType()),
        T.StructField("fps_millis", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("format", T.StringType()),
    ]
)


def video_header_meta(data: bytes) -> tuple[int, int, int, int, int, str]:
    """REAL video-metadata decode with no codec library: parse
    width/height/frame count/frame rate out of a RIFF/AVI main header
    (public spec: RIFF form 'AVI ', 'LIST hdrl' holds the 56-byte
    'avih' MainAVIHeader — microseconds-per-frame, total frames, and
    dimensions, all little-endian). Completes the real-header trio:
    PNG/JPEG/GIF/BMP (image), RIFF/WAVE (audio), RIFF/AVI (video).

    fps is returned in integer MILLI-frames-per-second
    (1e9 // us_per_frame) and duration as
    total_frames * us_per_frame // 1000 — exact integer math any
    engine reproduces. Raises :class:`UnknownContainer` for non-AVI
    bytes and ValueError for a recognized AVI with a corrupt or
    missing header (NULL meta, never fake numbers)."""
    import struct

    if data is None or len(data) < 12:
        raise UnknownContainer("too short")
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise UnknownContainer("not RIFF/AVI")
    pos = 12
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        (clen,) = struct.unpack("<I", data[pos + 4:pos + 8])
        if cid == b"LIST" and data[pos + 8:pos + 12] == b"hdrl":
            inner = pos + 12
            if data[inner:inner + 4] == b"avih":
                (alen,) = struct.unpack("<I", data[inner + 4:inner + 8])
                if alen < 40 or inner + 8 + 40 > len(data):
                    raise ValueError("bad avih chunk")
                h = struct.unpack("<10I", data[inner + 8:inner + 48])
                us_per_frame, total_frames = h[0], h[4]
                width, height = h[8], h[9]
                if not us_per_frame:
                    raise ValueError("zero frame interval")
                fps_millis = 1_000_000_000 // us_per_frame
                duration_ms = total_frames * us_per_frame // 1000
                return (width, height, total_frames, fps_millis,
                        duration_ms, "AVI")
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    raise ValueError("missing hdrl/avih header")


def decode_video_meta(
    df: DataFrame, binary_col: str = "content", opener=None
) -> DataFrame:
    """Attach a ``video_meta`` struct via an Arrow mapInPandas stage —
    same decode ladder as the image/audio faces: real RIFF/AVI header
    parse first, recognized-but-corrupt -> NULL, unknown container ->
    the clearly-marked deterministic fake (no demuxer library exists
    in this container; swap ``opener`` for pyav in production)."""
    out_schema = T.StructType(df.schema.fields + [T.StructField("video_meta", VIDEO_META)])

    def default_decode(data):
        try:
            return video_header_meta(data)
        except UnknownContainer:
            n = len(data or b"")
            return (320, 240, n // 256, 25_000, (n // 256) * 40, "fake")

    real = opener if opener is not None else default_decode
    keys = ("width", "height", "total_frames", "fps_millis",
            "duration_ms", "format")

    def stage(batches) -> Iterator:
        for pdf in batches:
            metas = []
            for data in pdf[binary_col]:
                try:
                    metas.append(dict(zip(keys, real(data))))
                except Exception:
                    metas.append(None)
            pdf = pdf.copy()
            pdf["video_meta"] = metas
            yield pdf

    return df.mapInPandas(stage, out_schema)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_index", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(
    df: DataFrame, every_n: int,
    *, id_col: str = "doc_id", binary_col: str = "content",
    frame_bytes: int = 256,
) -> DataFrame:
    """Explode each video payload into every Nth frame via mapInPandas
    (one input row -> many output rows — the real batch shape a
    pyav-backed sampler needs). The DEMUXER is STUBBED (no
    libav/ffmpeg here): the fake treats the payload as fixed-size
    ``frame_bytes`` chunks. Swap the chunker for av.open in
    production; schema and fan-out stay identical."""

    def stage(batches) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = {"doc_id": [], "frame_index": [], "n_frames": [], "frame": []}
            for i, data in zip(pdf[id_col], pdf[binary_col]):
                data = data or b""
                frames = [data[o:o + frame_bytes]
                          for o in range(0, len(data), frame_bytes)]
                for fi in range(0, len(frames), every_n):
                    rows["doc_id"].append(i)
                    rows["frame_index"].append(fi)
                    rows["n_frames"].append(len(frames))
                    rows["frame"].append(frames[fi])
            yield pd.DataFrame(rows)

    return df.select(id_col, binary_col).mapInPandas(stage, FRAME_SCHEMA)


def sniff_media_meta(
    df: DataFrame, *, id_col: str = "doc_id", content_col: str = "content"
) -> DataFrame:
    """Mixed-modality manifest: magic-byte dispatch + the matching REAL
    header parser in ONE Arrow ``mapInPandas`` pass.

    The ingestion shape for a bucket of mixed media: nobody tells the
    pipeline which rows are images vs audio vs video — the payload's
    magic bytes do (RIFF/WAVE -> :func:`audio_header_meta`, RIFF/'AVI '
    -> :func:`video_header_meta`, anything else tried as an image
    container via :func:`header_dimensions`). Output is one row per
    payload: (id, media_type, primary_dim, payload_bytes), where
    primary_dim is the type's headline number (image/video width,
    audio sample rate). Unparseable payloads surface as
    media_type='unknown' with NULL primary_dim — never fake numbers,
    never a dropped row. Scale: dispatch + parse touch only the first
    bytes of each payload, row-local, no shuffle; the rollup that
    usually follows is a low-cardinality groupBy on media_type."""
    import pandas as pd

    # the id column passes through under ITS OWN name and Spark type
    # (a string/int32 id must not come back relabeled 'doc_id' bigint,
    # which would mislabel the column or fail the Arrow schema check)
    id_field = df.schema[id_col]
    out_schema = T.StructType(
        [
            T.StructField(id_col, id_field.dataType),
            T.StructField("media_type", T.StringType()),
            T.StructField("primary_dim", T.IntegerType()),
            T.StructField("payload_bytes", T.LongType()),
        ]
    )

    def stage(batches) -> Iterator:
        for pdf in batches:
            ids, types, dims, sizes = [], [], [], []
            for did, data in zip(pdf[id_col], pdf[content_col]):
                b = bytes(data) if data is not None else b""
                mt, pdim = "unknown", None
                try:
                    if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
                        mt, pdim = "WAV", audio_header_meta(b)[0]
                    elif b[:4] == b"RIFF" and b[8:12] == b"AVI ":
                        mt, pdim = "AVI", video_header_meta(b)[0]
                    else:
                        w, _h, fmt = header_dimensions(b)
                        mt, pdim = fmt, w
                except (UnknownContainer, ValueError):
                    pass
                ids.append(did)
                types.append(mt)
                dims.append(pdim)
                sizes.append(len(b))
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids),
                    "media_type": pd.Series(types, dtype="object"),
                    "primary_dim": pd.Series(dims, dtype="Int32"),
                    "payload_bytes": pd.Series(sizes, dtype="int64"),
                }
            )

    return df.mapInPandas(stage, out_schema)
