"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed by Arrow-batched Pandas UDFs
(north-star extension, SURVEY.md §7.4).

The Spark-side architecture here is real and tested — schemas,
partitioning, UDF signatures, batch shapes. The actual media codecs
(PIL/ffmpeg/librosa) are NOT in this container, so the decode
kernels are cleanly stubbed: ``decode_image_stub`` produces a
deterministic fake "decode" from the bytes themselves, and
``decode_image_real`` raises ``NotImplementedError`` until a codec
library is installed. Swapping the kernel does not change any plan.

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


def decode_image_real(content: bytes) -> object:
    """Real codec hook — requires an image library not present in
    this environment."""
    raise NotImplementedError(
        "image codec not available in this container; "
        "install PIL/opencv and replace the stub kernel"
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
