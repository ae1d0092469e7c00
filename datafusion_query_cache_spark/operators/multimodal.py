"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns with typed metadata structs. The Spark
side — schema, partitioning, Arrow-batched UDF signatures, batch shapes — is
real and tested; the actual codec calls are STUBBED (``DecodeUnavailable`` /
deterministic fakes) because no image/audio libraries exist in this
container. Swap ``_fake_decode_*`` for PIL/ffmpeg calls in production; the
``mapInPandas`` plumbing (the hard part at scale) does not change.

Scale notes: decode is CPU-bound Python → ``mapInPandas`` with Arrow batches
keeps the transfer vectorized; ``spark.sql.files.maxPartitionBytes`` bounds
the bytes a single task holds; metadata-only ops (filtering by width, codec,
duration) stay in the JVM and never touch the blobs thanks to Parquet column
pruning — never ``select(*)`` a table with blob columns.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Typed metadata carried alongside every media blob.
IMAGE_META = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("format", T.StringType()),
    ]
)

IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("data", T.BinaryType()),
        T.StructField("meta", IMAGE_META),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


class DecodeUnavailable(NotImplementedError):
    """Raised where a real codec would be called (no media libs in env)."""


def codec_available() -> bool:
    """Environment probe: True when a real image codec (PIL) is
    importable. The operators below stay on the deterministic fake while
    this is False; the exit criterion for their ``partial`` status is
    exactly this probe flipping — swap ``_fake_decode_features`` /
    ``_fake_resize`` for the PIL calls sketched in their docstrings and
    the Spark-side plumbing (schemas, ``mapInPandas`` batch shapes,
    partitioning) needs no change (pinned by
    ``tests/test_multimodal.py::test_codec_probe_documents_swap_path``)."""
    try:  # pragma: no cover - environment-dependent
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def _fake_decode_features(data: bytes, n: int = 8) -> list:
    """Deterministic fake 'decoded features': byte histogram moments.

    Stands in for a real decode→resize→embed step; REAL decode goes here:

        from PIL import Image  # not available in this container
        raise DecodeUnavailable("PIL/ffmpeg not installed")
    """
    if data is None:
        return [0.0] * n
    buckets = [0] * n
    for i, b in enumerate(data):
        buckets[b % n] += 1
    total = max(len(data), 1)
    return [round(c / total, 6) for c in buckets]


def synthesize_media(spark, df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Build a deterministic fake media table from the documents table
    (binary payload = utf-8 text bytes) — exercises the real binary-column
    schema and partitioning without real media files."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "utf-8").alias("data"),
        F.struct(
            (F.length(F.col(text_col)) % 640).cast("int").alias("width"),
            (F.length(F.col(text_col)) % 480).cast("int").alias("height"),
            F.lit("fake/raw").alias("format"),
        ).alias("meta"),
    )


def extract_features(media: DataFrame, n_features: int = 8) -> DataFrame:
    """Decode + feature-extract via ``mapInPandas`` (Arrow batches).

    The UDF signature/batch shape is the production one; only the inner
    decode call is the deterministic fake.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": [m["width"] if m is not None else None for m in pdf["meta"]],
                    "height": [m["height"] if m is not None else None for m in pdf["meta"]],
                    "n_bytes": [len(d) if d is not None else 0 for d in pdf["data"]],
                    "features": [
                        _fake_decode_features(d, n_features) for d in pdf["data"]
                    ],
                }
            )
            yield out

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("data", T.BinaryType()),
        T.StructField("meta", IMAGE_META),
    ]
)


def resize_images(media: DataFrame, width: int = 224, height: int = 224) -> DataFrame:
    """Resize via ``mapInPandas`` — production signature, stubbed codec.

    The fake 'resize' deterministically re-samples the byte stream to
    ``width*height`` bytes (stride sampling), standing in for
    ``PIL.Image.resize``; metadata is updated for real. Partition sizing
    note: resized batches shrink memory, but the INPUT batch must fit —
    bound ``spark.sql.files.maxPartitionBytes`` by the largest source media.
    """

    target = width * height

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_data = []
            for d in pdf["data"]:
                if d is None:
                    out_data.append(None)
                elif len(d) == 0:
                    out_data.append(b"")
                else:
                    # REAL decode+resize goes here (PIL/ffmpeg unavailable):
                    # stride-sample bytes to the target size, deterministic
                    step = max(len(d) // target, 1)
                    out_data.append(bytes(d[::step][:target]))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "data": out_data,
                    "meta": [
                        {"width": width, "height": height, "format": "fake/resized"}
                        for _ in range(len(pdf))
                    ],
                }
            )

    return media.mapInPandas(run, schema=RESIZED_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame-sampling *plan*: pure-metadata expansion of frame indices
    (JVM-side sequence/explode); the per-frame decode would run in a
    ``mapInPandas`` over (media_id, frame_idx) batches."""
    n_frames = (F.length(F.col("data")) / 100).cast("int")  # fake: 1 frame/100 bytes
    return media.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(every_n))
        ).alias("frame_idx"),
    )
