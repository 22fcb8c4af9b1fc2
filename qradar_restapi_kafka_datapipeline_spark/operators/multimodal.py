"""Multimodal column plumbing (north-star M6).

Image/audio/video payloads are opaque ``binary`` columns with typed metadata;
heavy per-item work (decode, feature-extract, resize, frame-sample) runs as
Arrow-batched ``mapInPandas`` — vectorized Python at partition granularity, the
only sane shape for media work at 100 TB (the bytes never leave the executor,
batches amortize Python overhead).

The actual codecs (PIL/ffmpeg/librosa) are NOT in this container, so the decode
kernels are stubbed: ``decode_image``/``decode_audio`` raise
``NotImplementedError`` with the dependency named, and the deterministic fake
extractor exercises the real plumbing (schema, batching, partitioning) so the
pipeline around the stub is fully tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, LongType, StructField, StructType

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
    ]
)


def attach_binary_payload(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Synthesize an opaque binary payload column (stands in for image bytes)."""
    return df.select(
        F.col(id_col), F.encode(F.col(text_col), "UTF-8").alias("payload")
    )


def decode_image(payload: bytes):
    """Real image decode — requires PIL, absent in this container."""
    raise NotImplementedError(
        "image decode requires PIL/opencv (not installed); "
        "swap in a real kernel here — the mapInPandas plumbing is unchanged"
    )


def decode_audio(payload: bytes):
    raise NotImplementedError(
        "audio decode requires librosa/ffmpeg (not installed); "
        "swap in a real kernel here — the mapInPandas plumbing is unchanged"
    )


def extract_features(
    media: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    The kernel here is a deterministic fake (dimensions derived from payload
    bytes) standing in for decode_image; everything around it — partition-wise
    iteration, Arrow batch shape, output schema — is the production path.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_bytes = pdf[payload_col].map(len)
            first = pdf[payload_col].map(lambda b: b[0] if len(b) else 0)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": n_bytes.astype("int64"),
                    # fake "decoded" dims: deterministic function of content
                    "width": (64 + (n_bytes % 16) * 32).astype("int32"),
                    "height": (64 + (first.astype("int64") % 8) * 32).astype("int32"),
                    "n_frames": ((n_bytes % 7) + 1).astype("int32"),
                }
            )

    return media.mapInPandas(kernel, schema=FEATURE_SCHEMA)


def frame_sample(
    features: DataFrame, every_nth: int = 2
) -> DataFrame:
    """Frame-sampling plan over extracted frame counts: one row per kept frame.

    posexplode over a frame-index sequence — pure Spark, demonstrating how a
    video pipeline fans out per-frame work without Python in the loop.
    """
    return features.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_nth))
        ).alias("frame_idx"),
    )
