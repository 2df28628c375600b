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


def decode_image_meta(df: DataFrame, binary_col: str = "content") -> DataFrame:
    """Attach image metadata struct via an Arrow-batched pandas stage.

    Uses PIL when available; otherwise the clearly-marked deterministic
    fake so the plumbing stays testable."""
    out_schema = T.StructType(df.schema.fields + [T.StructField("image_meta", IMAGE_META)])
    use_pil = _have_pil()

    def stage(batches) -> Iterator:
        import pandas as pd

        for pdf in batches:
            metas = []
            for data in pdf[binary_col]:
                if use_pil:
                    import io

                    from PIL import Image

                    try:
                        im = Image.open(io.BytesIO(data))
                        metas.append({"width": im.width, "height": im.height,
                                      "format": im.format or ""})
                        continue
                    except Exception:
                        pass
                w, h, fmt = _fake_decode(data)
                metas.append({"width": w, "height": h, "format": fmt})
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
        import pandas as pd

        width = 256 // buckets
        for pdf in batches:
            ids, bks, cnts, lens = [], [], [], []
            for i, data in zip(pdf[id_col], pdf[binary_col]):
                data = data or b""
                hist = [0] * buckets
                for byte in data:
                    hist[byte // width] += 1
                for b, c in enumerate(hist):
                    ids.append(i)
                    bks.append(b)
                    cnts.append(c)
                    lens.append(len(data))
            yield pd.DataFrame(
                {"doc_id": ids, "n_bytes": lens, "bucket": bks, "count": cnts}
            )

    return df.select(id_col, binary_col).mapInPandas(stage, FEATURE_SCHEMA)


def resize_images(df: DataFrame, width: int, height: int,
                  binary_col: str = "content") -> DataFrame:
    """STUB: real resize needs an image codec not present here."""
    raise NotImplementedError(
        "image resize requires PIL/opencv (not in this container); "
        "the decode/feature plumbing above is the tested path"
    )


def sample_frames(df: DataFrame, every_n: int,
                  binary_col: str = "content") -> DataFrame:
    """STUB: video frame sampling needs libav/ffmpeg bindings."""
    raise NotImplementedError(
        "frame sampling requires pyav/ffmpeg (not in this container)"
    )
