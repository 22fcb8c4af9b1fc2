"""Multimodal column plumbing (north-star M6).

Image/audio/video payloads are opaque ``binary`` columns with typed metadata;
heavy per-item work (decode, feature-extract, resize, frame-sample) runs as
Arrow-batched ``mapInPandas`` — vectorized Python at partition granularity, the
only sane shape for media work at 100 TB (the bytes never leave the executor,
batches amortize Python overhead).

The heavy codecs (PIL/ffmpeg/librosa) are NOT in this container, so those
decode kernels are stubbed: ``decode_image``/``decode_audio`` raise
``NotImplementedError`` with the dependency named, and the deterministic fake
extractor exercises the real plumbing (schema, batching, partitioning) so the
pipeline around the stub is fully tested.  BMP needs no codec — its decode
(:func:`decode_bmp`) is REAL byte parsing (magic, header offsets, stride-aware
pixel walk), value-gated against an SQL oracle recomputing the encoder's spec.
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


# ---------------------------------------------------------------------------
# Real binary decode: BMP (no external codec needed — pure struct parsing).
# PIL/ffmpeg formats stay behind the stubs above; BMP's fixed little-endian
# header makes it the honest, fully-testable member of the decode family.
# ---------------------------------------------------------------------------

BMP_CHECKSUM_MOD = 1_000_000_007


def encode_bmp(doc_id: int, text: str) -> bytes:
    """A VALID minimal 24-bit BMP whose dimensions derive deterministically
    from the document (width 4–11 from text length, height 2–6 from id) and
    whose pixels are a constant fill — so an SQL oracle can recompute every
    decoded property without touching bytes."""
    import struct

    w = 4 + len(text) % 8
    h = 2 + doc_id % 5
    row = 3 * w
    pad = (4 - row % 4) % 4
    fill = doc_id % 256
    data = (bytes([fill]) * row + b"\x00" * pad) * h
    size = 54 + len(data)
    header = struct.pack("<2sIHHI", b"BM", size, 0, 0, 54) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0
    )
    return header + data


def decode_bmp(payload: bytes) -> tuple[int, int, int, int, int]:
    """Parse a BMP from raw bytes: magic check, header-offset reads, and a
    stride-aware pixel walk (rows are padded to 4-byte boundaries — the
    checksum sums ONLY pixel bytes, proving the stride logic is real).
    Returns ``(width, height, bpp, n_bytes, pixel_checksum)``."""
    import struct

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    size = struct.unpack_from("<I", payload, 2)[0]
    offset = struct.unpack_from("<I", payload, 10)[0]
    w = struct.unpack_from("<i", payload, 18)[0]
    h = struct.unpack_from("<i", payload, 22)[0]
    bpp = struct.unpack_from("<H", payload, 28)[0]
    row = w * bpp // 8
    stride = (row + 3) // 4 * 4
    psum = 0
    for r in range(h):
        start = offset + r * stride
        psum += sum(payload[start : start + row])
    return w, h, bpp, size, psum % BMP_CHECKSUM_MOD


def attach_bmp_payload(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """``(id, payload)`` with a real BMP per document — Arrow-batched encode."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "payload": [
                        encode_bmp(int(i), t)
                        for i, t in zip(pdf[id_col], pdf[text_col])
                    ],
                }
            )

    return df.select(id_col, text_col).mapInPandas(
        kernel, schema="doc_id LONG, payload BINARY"
    )


def extract_bmp_features(
    media: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """The real-decode twin of :func:`extract_features`: every output value
    comes out of :func:`decode_bmp`'s byte parsing, not a formula — the gate
    oracle recomputes the expected values from the encoder's spec, so an
    off-by-one in either the header layout or the stride walk hash-fails."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                (int(i), *decode_bmp(bytes(b)))
                for i, b in zip(pdf[id_col], pdf[payload_col])
            ]
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height", "bpp", "n_bytes",
                    "pixel_checksum",
                ],
            )

    return media.mapInPandas(
        kernel,
        schema="doc_id LONG, width INT, height INT, bpp INT, "
        "n_bytes LONG, pixel_checksum LONG",
    )


def bmp_decode_oracle_sql(source: str = "documents") -> str:
    """DuckDB recomputation of every decoded property from the encoder spec."""
    return f"""
    WITH dims AS (
      SELECT doc_id,
             CAST(4 + length(text) % 8 AS INT) AS width,
             CAST(2 + doc_id % 5 AS INT) AS height
      FROM {source}
    )
    SELECT doc_id, width, height, CAST(24 AS INT) AS bpp,
           CAST(54 + (3 * width + (4 - (3 * width) % 4) % 4) * height
                AS BIGINT) AS n_bytes,
           CAST(((doc_id % 256) * 3 * width * height) % {BMP_CHECKSUM_MOD}
                AS BIGINT) AS pixel_checksum
    FROM dims
    """


# ---------------------------------------------------------------------------
# WAV: the audio member of the real-decode family (RIFF chunk walking + PCM
# sample checksum — pure stdlib byte parsing, same honesty contract as BMP;
# compressed codecs stay behind the decode_audio stub).
# ---------------------------------------------------------------------------


def encode_wav(doc_id: int, text: str) -> bytes:
    """A VALID 16-bit mono PCM WAV with deterministic rate/length/samples —
    every decoded property is recomputable by an SQL oracle.  Every third
    document carries a junk LIST chunk BEFORE fmt, so a decoder that assumes
    fixed offsets (instead of walking RIFF chunks) fails the gate."""
    import struct

    rate = 8000 + (doc_id % 4) * 4000
    n = 50 + len(text) % 100
    samples = [((doc_id * 31 + i * 17) % 65536) - 32768 for i in range(n)]
    data = struct.pack(f"<{n}h", *samples)
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    chunks = b""
    if doc_id % 3 == 0:
        junk = b"notacodecpayload"
        chunks += b"LIST" + struct.pack("<I", len(junk)) + junk
    chunks += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def decode_wav(payload: bytes) -> tuple[int, int, int, int, int, int]:
    """Parse a WAV from raw bytes by WALKING the RIFF chunk list (fmt may
    not be first — word-aligned skips over unknown chunks), returning
    ``(sample_rate, channels, bits, n_samples, duration_ms, checksum)``
    where the checksum sums the unsigned-offset PCM samples."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        clen = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen % 2)  # RIFF chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    _, channels, rate, _, _, bits = fmt
    n = len(data) // (bits // 8) // channels
    samples = struct.unpack(f"<{n * channels}h", data[: n * channels * 2])
    checksum = sum(s + 32768 for s in samples) % BMP_CHECKSUM_MOD
    duration_ms = n * 1000 // rate
    return rate, channels, bits, n, duration_ms, checksum


def attach_wav_payload(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """``(id, payload)`` with a real WAV per document — Arrow-batched encode."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "payload": [
                        encode_wav(int(i), t)
                        for i, t in zip(pdf[id_col], pdf[text_col])
                    ],
                }
            )

    return df.select(id_col, text_col).mapInPandas(
        kernel, schema="doc_id LONG, payload BINARY"
    )


def extract_wav_features(
    media: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Real-decode audio features: every value parsed out of the RIFF bytes
    by :func:`decode_wav` — the oracle recomputes them from the encoder
    spec, so a broken chunk walk or sample unpack hash-fails."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                (int(i), *decode_wav(bytes(b)))
                for i, b in zip(pdf[id_col], pdf[payload_col])
            ]
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "sample_rate", "channels", "bits",
                    "n_samples", "duration_ms", "sample_checksum",
                ],
            )

    return media.mapInPandas(
        kernel,
        schema="doc_id LONG, sample_rate INT, channels INT, bits INT, "
        "n_samples LONG, duration_ms LONG, sample_checksum LONG",
    )


def wav_decode_oracle_sql(source: str = "documents") -> str:
    """DuckDB recomputation of every decoded WAV property from the encoder
    spec, including the PCM sample checksum (correlated sum over the sample
    index — exact integer math in both engines)."""
    return f"""
    WITH dims AS (
      SELECT doc_id,
             CAST(8000 + (doc_id % 4) * 4000 AS INT) AS sample_rate,
             CAST(50 + length(text) % 100 AS BIGINT) AS n_samples
      FROM {source}
    )
    SELECT doc_id, sample_rate, CAST(1 AS INT) AS channels,
           CAST(16 AS INT) AS bits, n_samples,
           CAST(n_samples * 1000 // sample_rate AS BIGINT) AS duration_ms,
           CAST(list_sum(list_transform(
                  generate_series(0, CAST(n_samples AS INT) - 1),
                  i -> (doc_id * 31 + i * 17) % 65536))
                % {BMP_CHECKSUM_MOD} AS BIGINT) AS sample_checksum
    FROM dims
    """


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
