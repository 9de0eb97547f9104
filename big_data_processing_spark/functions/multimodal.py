"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed by Arrow-batched Pandas UDFs
(north-star extension, SURVEY.md §7.4).

The Spark-side architecture here is real and tested — schemas,
partitioning, UDF signatures, batch shapes. For image decode there
are two kernels: ``decode_image_real`` REALLY decodes the
uncompressed classics (binary netpbm P5/P6 and BI_RGB BMP) with
numpy alone, raising ``NotImplementedError`` only for compressed
formats (JPEG/PNG/WebP), whose codec libraries are not in this
container; ``decode_image_stub`` remains the byte-statistics fake
for exercising the plumbing on arbitrary bytes. Swapping kernels
does not change any plan.

Scale notes
-----------
- Media bytes stay in executors end-to-end (mapInPandas streams
  Arrow record batches); nothing ever collects to the driver.
- ``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds batch
  memory when payloads are large (set ~64-256 for multi-MB media).
- Feature extraction shrinks data early (bytes → small vectors), so
  the shuffle after extraction carries features, not media.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

IMAGE_FEATURES_SCHEMA = (
    "media_id long, n_bytes int, checksum long, "
    "feat array<float>, decode_ok boolean"
)


def decode_image_stub(content: bytes, dim: int = 8) -> list[float]:
    """Deterministic fake decode: a ``dim``-length feature vector
    derived from byte statistics. Stands in for decode→resize→
    embed so the distributed plumbing is fully exercisable."""
    if not content:
        return [0.0] * dim
    step = max(len(content) // dim, 1)
    return [
        float(sum(content[i : i + step]) % 256) / 255.0
        for i in range(0, step * dim, step)
    ][:dim] + [0.0] * max(0, dim - len(range(0, step * dim, step)))


def extract_image_features(df: DataFrame, dim: int = 8) -> DataFrame:
    """mapInPandas feature extraction over binary image content.

    Arrow-batched: each batch arrives as a pandas DataFrame, the
    kernel runs vectorized per batch, and only (id, small-feature)
    rows leave the operator."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = pdf["content"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": content.map(
                        lambda b: len(b) if b is not None else 0
                    ).astype("int32"),
                    "checksum": content.map(
                        lambda b: sum(b) if b else 0
                    ).astype("int64"),
                    "feat": content.map(
                        lambda b: decode_image_stub(b or b"", dim)
                    ),
                    "decode_ok": content.notna(),
                }
            )

    return df.select("media_id", "content").mapInPandas(
        kernel, schema=IMAGE_FEATURES_SCHEMA
    )


def sample_video_frames(
    df: DataFrame, every_ms: int = 1000
) -> DataFrame:
    """Frame-sampling plan for video rows: one output row per
    sampled timestamp (the decode itself is the stubbed kernel's
    job). Demonstrates the explode-then-process shape that keeps
    per-frame work distributed."""
    frames = df.filter(F.col("kind") == "video").select(
        "media_id",
        "content",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
    )
    return frames


# ---------------------------------------------------------------------------
# Real decode path for container-friendly formats
# ---------------------------------------------------------------------------
# JPEG/PNG need codec libraries this container lacks, but the
# uncompressed classics decode with numpy alone — so the "real"
# decode hook IS real for PPM/PGM (netpbm binary) and BI_RGB BMP,
# and only falls back to NotImplementedError for compressed formats.


def decode_netpbm(content: bytes):
    """Decode binary netpbm: P5 (grayscale) → (h, w) uint8 array,
    P6 (RGB) → (h, w, 3). Pure numpy; maxval ≤ 255 only."""
    import numpy as np

    if not content.startswith((b"P5", b"P6")):
        raise ValueError("not a binary netpbm payload")
    # header = magic, width, height, maxval — whitespace/comment
    # separated, then ONE whitespace byte before the raster
    tokens: list[bytes] = []
    i = 2
    while len(tokens) < 3:
        while i < len(content) and content[i : i + 1].isspace():
            i += 1
        if content[i : i + 1] == b"#":  # comment to end of line
            while i < len(content) and content[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(content) and not content[j : j + 1].isspace():
            j += 1
        tokens.append(content[i:j])
        i = j
    i += 1  # the single whitespace after maxval
    w, h, maxval = (int(t) for t in tokens)
    if maxval > 255:
        raise ValueError("16-bit netpbm not supported")
    channels = 3 if content.startswith(b"P6") else 1
    raster = np.frombuffer(content, dtype=np.uint8, count=w * h * channels,
                           offset=i)
    img = raster.reshape((h, w, channels))
    return img[:, :, 0] if channels == 1 else img


def decode_bmp(content: bytes):
    """Decode an uncompressed (BI_RGB) 24/32-bit BMP → (h, w, 3)
    uint8 RGB array. Handles bottom-up and top-down rows and the
    4-byte row stride. Pure numpy."""
    import struct

    import numpy as np

    if content[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack_from("<I", content, 10)[0]
    header_size = struct.unpack_from("<I", content, 14)[0]
    if header_size < 40:
        raise ValueError("BMP core header not supported")
    w, h_raw = struct.unpack_from("<ii", content, 18)
    bpp = struct.unpack_from("<H", content, 28)[0]
    compression = struct.unpack_from("<I", content, 30)[0]
    if compression != 0 or bpp not in (24, 32):
        raise NotImplementedError(
            "compressed / paletted BMP needs a codec library"
        )
    h = abs(h_raw)
    nbytes = bpp // 8
    stride = (w * nbytes + 3) & ~3
    rows = np.frombuffer(
        content, dtype=np.uint8, count=stride * h, offset=data_offset
    ).reshape((h, stride))
    px = rows[:, : w * nbytes].reshape((h, w, nbytes))
    if h_raw > 0:  # bottom-up storage → flip to top-down
        px = px[::-1]
    # BGR(A) → RGB
    return px[:, :, 2::-1].copy()


def decode_image_real(content: bytes):
    """Real decode hook: netpbm (P5/P6) and uncompressed BMP decode
    with numpy alone; compressed formats (JPEG/PNG/WebP) raise until
    a codec library is present. Returns an (h, w[, 3]) uint8 array."""
    if content[:2] in (b"P5", b"P6"):
        return decode_netpbm(content)
    if content[:2] == b"BM":
        return decode_bmp(content)
    raise NotImplementedError(
        "compressed image codecs (JPEG/PNG) not available in this "
        "container; install PIL/opencv for those formats"
    )


def image_to_features(img, dim: int = 8) -> list[float]:
    """Mean-pooled grayscale profile: collapse to row means, then
    average-pool to ``dim`` buckets in [0, 1] — the deterministic
    resize→embed stand-in, now over REAL pixels."""
    import numpy as np

    arr = np.asarray(img, dtype=np.float64)
    if arr.ndim == 3:
        arr = arr.mean(axis=2)
    prof = arr.mean(axis=1)
    idx = (np.arange(dim) * len(prof)) // dim
    ends = np.append(idx[1:], len(prof))
    return [
        float(prof[a:b].mean()) / 255.0 if b > a else 0.0
        for a, b in zip(idx, ends)
    ]


def extract_image_features_real(df: DataFrame, dim: int = 8) -> DataFrame:
    """Like :func:`extract_image_features` but decoding REAL pixels
    (netpbm/BMP); rows whose format needs an absent codec yield
    ``decode_ok = False`` with zero features instead of failing the
    batch — per-row codec failures must never kill a 100 TB job."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def one(b):
            if b is None:
                return None
            try:
                return image_to_features(decode_image_real(b), dim)
            except (NotImplementedError, ValueError):
                return None
            except Exception:  # malformed payload
                return None

        for pdf in batches:
            content = pdf["content"]
            feats = content.map(one)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": content.map(
                        lambda b: len(b) if b is not None else 0
                    ).astype("int32"),
                    "checksum": content.map(
                        lambda b: sum(b) if b else 0
                    ).astype("int64"),
                    "feat": feats.map(
                        lambda f: f if f is not None else [0.0] * dim
                    ),
                    "decode_ok": feats.notna(),
                }
            )

    return df.select("media_id", "content").mapInPandas(
        kernel, schema=IMAGE_FEATURES_SCHEMA
    )


def make_ppm(width: int, height: int, seed: int) -> bytes:
    """Deterministic synthetic P6 image (pure bytes — fixture/demo
    generator; pixel (x, y, c) = (seed + 3x + 7y + 11c) mod 256)."""
    import numpy as np

    y, x, c = np.mgrid[0:height, 0:width, 0:3]
    px = ((seed + 3 * x + 7 * y + 11 * c) % 256).astype(np.uint8)
    return (
        f"P6\n{width} {height}\n255\n".encode() + px.tobytes()
    )
