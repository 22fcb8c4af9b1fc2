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


def resize_bmp(
    media: DataFrame,
    scale_den: int = 2,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Nearest-neighbor downsample to ``(max(1, w//scale_den),
    max(1, h//scale_den))`` — the resize member of the
    decode/extract/resize/frame-sample verb set, and REAL work end to
    end: the kernel walks the source pixels stride-aware into an array,
    index-maps ``src = (dst · old) // new`` per axis, re-encodes a valid
    padded BMP, and re-decodes THAT to produce the emitted features — so
    the gate oracle (which recomputes dims/stride/checksum from the
    encoder spec) fails on any indexing slip that touches a padding byte
    or mis-sizes the output header.  Arrow-batched mapInPandas, no
    driver involvement; at 100 TB this is the shape every image-pipeline
    map stage takes (decode → transform → re-encode per partition)."""
    import struct

    def _resize_one(payload: bytes) -> tuple[int, int, int, int, int]:
        if payload[:2] != b"BM":
            raise ValueError("not a BMP payload")
        offset = struct.unpack_from("<I", payload, 10)[0]
        w = struct.unpack_from("<i", payload, 18)[0]
        h = struct.unpack_from("<i", payload, 22)[0]
        bpp = struct.unpack_from("<H", payload, 28)[0]
        row = w * bpp // 8
        stride = (row + 3) // 4 * 4
        px = [payload[offset + r * stride: offset + r * stride + row]
              for r in range(h)]
        nw, nh = max(1, w // scale_den), max(1, h // scale_den)
        nrow = 3 * nw
        npad = (4 - nrow % 4) % 4
        out_rows = []
        for r in range(nh):
            src_r = px[(r * h) // nh]
            buf = bytearray()
            for c in range(nw):
                sc = (c * w) // nw
                buf += src_r[3 * sc: 3 * sc + 3]
            out_rows.append(bytes(buf) + b"\x00" * npad)
        data = b"".join(out_rows)
        size = 54 + len(data)
        header = struct.pack("<2sIHHI", b"BM", size, 0, 0, 54) + struct.pack(
            "<IiiHHIIiiII", 40, nw, nh, 1, 24, 0, len(data), 2835, 2835, 0, 0
        )
        rw, rh, _, rsize, rsum = decode_bmp(header + data)
        return rw, rh, rsize, rsum, w * h

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                (int(i), *_resize_one(bytes(b)))
                for i, b in zip(pdf[id_col], pdf[payload_col])
            ]
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "width", "height", "n_bytes",
                         "pixel_checksum", "src_pixels"],
            )

    return media.mapInPandas(
        kernel,
        schema="doc_id LONG, width INT, height INT, n_bytes LONG, "
        "pixel_checksum LONG, src_pixels LONG",
    )


def bmp_resize_oracle_sql(
    scale_den: int = 2, source: str = "documents"
) -> str:
    """DuckDB recomputation of the resized-BMP properties from the encoder
    spec (constant-fill pixels make every resampled byte predictable —
    but only if the kernel's index math never strays into row padding,
    which is exactly what the checksum pins)."""
    return f"""
    WITH dims AS (
      SELECT doc_id,
             CAST(4 + length(text) % 8 AS INT) AS w,
             CAST(2 + doc_id % 5 AS INT) AS h
      FROM {source}
    ),
    nd AS (
      SELECT doc_id, w, h,
             CAST(GREATEST(1, w // {scale_den}) AS INT) AS nw,
             CAST(GREATEST(1, h // {scale_den}) AS INT) AS nh
      FROM dims
    )
    SELECT doc_id, nw AS width, nh AS height,
           CAST(54 + (3 * nw + (4 - (3 * nw) % 4) % 4) * nh
                AS BIGINT) AS n_bytes,
           CAST(((doc_id % 256) * 3 * nw * nh) % {BMP_CHECKSUM_MOD}
                AS BIGINT) AS pixel_checksum,
           CAST(w * h AS BIGINT) AS src_pixels
    FROM nd
    """


#: Textured-BMP pixel formula constants (see :func:`encode_bmp_textured`):
#: gray value at (row r, col c) = (seed·K_SEED + r·K_ROW + c·K_COL) % 256
#: with seed = doc_id % PHASH_SEED_MOD — so documents sharing
#: (width, height, seed) render IDENTICAL images and documents sharing
#: only (width, height) render NEAR-duplicates (the wraparound boundaries
#: shift with seed, flipping a few dHash bits), giving the dedup entry a
#: real distance spectrum to classify.
PHASH_SEED_MOD = 17
_K_SEED, _K_ROW, _K_COL = 53, 31, 7


def encode_bmp_textured(doc_id: int, text: str) -> bytes:
    """A valid 24-bit BMP with POSITION-DEPENDENT gray pixels (the
    constant-fill :func:`encode_bmp` is degenerate for perceptual
    hashing: every gradient is zero).  Same header/stride layout; pixel
    (r, c) carries the formula value in all three channels."""
    import struct

    w = 4 + len(text) % 8
    h = 2 + doc_id % 5
    seed = doc_id % PHASH_SEED_MOD
    row_len = 3 * w
    pad = (4 - row_len % 4) % 4
    rows = []
    for r in range(h):
        buf = bytearray()
        for c in range(w):
            v = (seed * _K_SEED + r * _K_ROW + c * _K_COL) % 256
            buf += bytes([v, v, v])
        rows.append(bytes(buf) + b"\x00" * pad)
    data = b"".join(rows)
    size = 54 + len(data)
    header = struct.pack("<2sIHHI", b"BM", size, 0, 0, 54) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0
    )
    return header + data


def attach_textured_bmp_payload(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """``(doc_id, payload)`` with a textured BMP per document."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "payload": [
                        encode_bmp_textured(int(i), t)
                        for i, t in zip(pdf[id_col], pdf[text_col])
                    ],
                }
            )

    return df.select(id_col, text_col).mapInPandas(
        kernel, schema="doc_id LONG, payload BINARY"
    )


def image_dhash(
    media: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """64-bit difference hash (dHash) per image, parsed from REAL bytes:
    stride-aware pixel walk → nearest-neighbor resample to 9×8 gray
    (``src = (dst · old) // new``, the same integer index map as
    :func:`resize_bmp`) → one bit per horizontally-adjacent comparison
    ``p(r, c+1) > p(r, c)`` (8 rows × 8 comparisons).  Emitted as two
    unsigned 32-bit halves in BIGINTs (``hash_hi``/``hash_lo``) so no
    engine ever sees a sign bit; bit k (row-major r·8+c) lands in half
    k div 32 at position k mod 32.

    The image-dedup fingerprint every multimodal training pipeline
    computes (dHash over an 8×8 downsample is the standard cheap
    perceptual hash); downstream, Hamming-banded pair generation stays
    NO-all-pairs (:func:`phash_pairs_sql`).  Arrow-batched mapInPandas.
    """
    import struct

    def _one(payload: bytes) -> tuple[int, int, int, int]:
        if payload[:2] != b"BM":
            raise ValueError("not a BMP payload")
        offset = struct.unpack_from("<I", payload, 10)[0]
        w = struct.unpack_from("<i", payload, 18)[0]
        h = struct.unpack_from("<i", payload, 22)[0]
        row_len = 3 * w
        stride = (row_len + 3) // 4 * 4
        px = [
            payload[offset + r * stride : offset + r * stride + row_len]
            for r in range(h)
        ]
        hi = lo = 0
        for r in range(8):
            src_r = px[(r * h) // 8]
            for c in range(8):
                v0 = src_r[3 * ((c * w) // 9)]
                v1 = src_r[3 * (((c + 1) * w) // 9)]
                if v1 > v0:
                    k = r * 8 + c
                    if k < 32:
                        lo |= 1 << k
                    else:
                        hi |= 1 << (k - 32)
        return hi, lo, w, h

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                (int(i), *_one(bytes(b)))
                for i, b in zip(pdf[id_col], pdf[payload_col])
            ]
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "hash_hi", "hash_lo", "width", "height"],
            )

    return media.mapInPandas(
        kernel,
        schema="doc_id LONG, hash_hi LONG, hash_lo LONG, "
        "width INT, height INT",
    )


def dhash_oracle_sql(dialect: str, source: str = "documents") -> str:
    """Recompute the dHash halves relationally from the encoder spec -
    shared by BOTH engines (the Spark side of the gate entry uses the
    real byte-walking kernel; this builder is its oracle and the pair
    stage's hash provider).  A constant 64-row (r, c) spine is broadcast
    against the corpus; all arithmetic is exact integer (resample index
    map, mod-256 texture, bit weights via integer shifts - POWER()'s
    float round-trip never appears), so the result is hash-checkable
    with no float discipline at all."""
    spine = " UNION ALL ".join(
        f"SELECT {k // 8} AS r, {k % 8} AS c" for k in range(64)
    )
    hint = "/*+ BROADCAST(g) */ " if dialect == "spark" else ""
    div = "DIV" if dialect == "spark" else "//"
    if dialect == "spark":
        shl = "SHIFTLEFT(CAST(1 AS BIGINT), {e})"
    else:
        shl = "(CAST(1 AS BIGINT) << ({e}))"
    gray = (
        f"(d.seed * {_K_SEED} + ((g.r * d.h) {div} 8) * {_K_ROW}"
        f" + (({{c}} * d.w) {div} 9) * {_K_COL}) % 256"
    )
    return f"""
    WITH grid AS ({spine}),
    dims AS (
      SELECT doc_id,
             CAST(4 + length(text) % 8 AS BIGINT) AS w,
             CAST(2 + doc_id % 5 AS BIGINT) AS h,
             CAST(doc_id % {PHASH_SEED_MOD} AS BIGINT) AS seed
      FROM {source}
    ),
    bits AS (
      SELECT {hint}d.doc_id, g.r * 8 + g.c AS k,
             CASE WHEN {gray.format(c="(g.c + 1)")}
                  > {gray.format(c="g.c")}
             THEN 1 ELSE 0 END AS bit
      FROM dims d CROSS JOIN grid g
    )
    SELECT doc_id,
           CAST(SUM(CASE WHEN k >= 32
                         THEN bit * {shl.format(e="k - 32")}
                         ELSE 0 END) AS BIGINT) AS hash_hi,
           CAST(SUM(CASE WHEN k < 32
                         THEN bit * {shl.format(e="k")}
                         ELSE 0 END) AS BIGINT) AS hash_lo
    FROM bits GROUP BY doc_id
    """


def _phash_fragments(dialect: str) -> tuple[str, str, str]:
    """Shared SQL fragments for the Hamming-banding family: the 8-row band
    spine, the per-(hash row h, band row b) one-byte band value, and the
    exact popcount over pre-aliased halves (hi_a/lo_a vs hi_b/lo_b) —
    one definition for both the doc-level pair join and the distinct-hash
    cluster join (per-engine logic written twice is how parity breaks)."""
    xor = "({a} ^ {b})" if dialect == "spark" else "xor({a}, {b})"
    shr = "SHIFTRIGHT({x}, {n})" if dialect == "spark" else "({x} >> ({n}))"
    band_spine = " UNION ALL ".join(f"SELECT {b} AS b" for b in range(8))
    band_val = (
        f"CASE WHEN b.b < 4 THEN {shr.format(x='h.hash_lo', n='8 * b.b')} & 255 "
        f"ELSE {shr.format(x='h.hash_hi', n='8 * (b.b - 4)')} & 255 END"
    )
    ham = (
        f"bit_count({xor.format(a='lo_a', b='lo_b')})"
        f" + bit_count({xor.format(a='hi_a', b='hi_b')})"
    )
    return band_spine, band_val, ham


def phash_pairs_sql(
    dialect: str,
    hash_rel: str,
    max_hamming: int = 2,
) -> str:
    """Near-duplicate image pairs from 64-bit perceptual hashes WITHOUT
    all-pairs (VERDICT r8 #4): the MinHash-banding motif on hash bytes.
    Split each hash into 8 one-byte bands; any two hashes within Hamming
    distance d < 8 must agree on at least one band (pigeonhole), so the
    banded equi-join on (band_id, band_val) is a LOSSLESS candidate
    generator for ``max_hamming`` ≤ 7 — candidates then pay one exact
    popcount (``bit_count`` over the XOR of each half, both engines
    native).  Shuffle keys are (band_id, band_val); per-bucket fan-out
    is bounded by texture-class sizes, never corpus².

    ``hash_rel`` is any relation/CTE body yielding
    ``(doc_id, hash_hi, hash_lo)`` — the Spark entry feeds the REAL
    byte-walking kernel's output through a temp view while the DuckDB
    oracle feeds :func:`dhash_oracle_sql`; identical pair logic on both
    sides makes the whole pipeline value-hash-checkable."""
    if not 0 <= max_hamming <= 7:
        raise ValueError("banding with 8 one-byte bands is lossless only "
                         "for max_hamming in [0, 7]")
    band_spine, band_val, ham = _phash_fragments(dialect)
    hint = "/*+ BROADCAST(b) */ " if dialect == "spark" else ""
    return f"""
    WITH hs AS ({hash_rel}),
    bands AS (
      SELECT {hint}h.doc_id, h.hash_hi, h.hash_lo, b.b AS band_id,
             {band_val} AS band_val
      FROM hs h CROSS JOIN ({band_spine}) b
    ),
    cand AS (
      SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
             x.hash_hi AS hi_a, x.hash_lo AS lo_a,
             y.hash_hi AS hi_b, y.hash_lo AS lo_b
      FROM bands x JOIN bands y
        ON x.band_id = y.band_id AND x.band_val = y.band_val
       AND x.doc_id < y.doc_id
    )
    SELECT doc_a, doc_b, CAST(hamming AS BIGINT) AS hamming
    FROM (SELECT doc_a, doc_b, {ham} AS hamming FROM cand) p
    WHERE hamming <= {max_hamming}
    """


def phash_pairs_expanded_sql(
    dialect: str,
    hash_rel: str,
    max_hamming: int = 2,
) -> str:
    """Doc-level near-dup pairs via GROUP EXPANSION (round 9, the
    production form): band only the DISTINCT hashes (bounded by hash
    diversity), then expand each near hash-pair into its member
    cross-product and each hash group into its internal distance-0
    pairs.  Value-identical to :func:`phash_pairs_sql` — the gate runs
    THIS on Spark against the simple banded form as the DuckDB oracle,
    so the two independent formulations check each other — but the cost
    is output-bound: the banded join never sees doc-level rows, and the
    expansion joins shuffle exactly the emitted pairs.  At 100 TB, where
    boilerplate-image duplicate classes are huge, the simple form's
    candidate join inflates with class size² per band while this form
    pays class size² only in the unavoidable output."""
    if not 0 <= max_hamming <= 7:
        raise ValueError("banding with 8 one-byte bands is lossless only "
                         "for max_hamming in [0, 7]")
    band_spine, band_val, ham = _phash_fragments(dialect)
    hint = "/*+ BROADCAST(b) */ " if dialect == "spark" else ""
    hint_np = "/*+ BROADCAST(np) */ " if dialect == "spark" else ""
    return f"""
    WITH hs AS ({hash_rel}),
    grp AS (
      SELECT hash_hi, hash_lo, CAST(MIN(doc_id) AS BIGINT) AS canonical
      FROM hs GROUP BY hash_hi, hash_lo
    ),
    bands AS (
      SELECT {hint}h.canonical, h.hash_hi, h.hash_lo,
             b.b AS band_id, {band_val} AS band_val
      FROM grp h CROSS JOIN ({band_spine}) b
    ),
    np AS (
      SELECT hi_a, lo_a, hi_b, lo_b, hamming FROM (
        SELECT DISTINCT x.hash_hi AS hi_a, x.hash_lo AS lo_a,
               y.hash_hi AS hi_b, y.hash_lo AS lo_b,
               {ham} AS hamming
        FROM bands x JOIN bands y
          ON x.band_id = y.band_id AND x.band_val = y.band_val
         AND x.canonical < y.canonical
      ) c WHERE hamming BETWEEN 1 AND {max_hamming}
    ),
    cross_pairs AS (
      SELECT {hint_np}LEAST(ma.doc_id, mb.doc_id) AS doc_a,
             GREATEST(ma.doc_id, mb.doc_id) AS doc_b,
             np.hamming
      FROM np
      JOIN hs ma ON ma.hash_hi = np.hi_a AND ma.hash_lo = np.lo_a
      JOIN hs mb ON mb.hash_hi = np.hi_b AND mb.hash_lo = np.lo_b
    ),
    within_pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, 0 AS hamming
      FROM hs a JOIN hs b
        ON a.hash_hi = b.hash_hi AND a.hash_lo = b.hash_lo
       AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b, CAST(hamming AS BIGINT) AS hamming
    FROM (SELECT * FROM cross_pairs
          UNION ALL SELECT * FROM within_pairs) u
    """


def image_phash_pairs(
    spark,
    docs: DataFrame,
    max_hamming: int = 2,
) -> DataFrame:
    """End-to-end perceptual-hash image dedup: textured-BMP payloads →
    REAL dHash kernel (:func:`image_dhash`) → group-expansion pair
    join (:func:`phash_pairs_expanded_sql`; the gate oracle stays the
    independent simple banded form, so the two formulations check
    each other).  The hash relation is tiny (two BIGINTs
    per image) but its lineage crosses two Python kernel stages AND the
    pair SQL references it through WITH-CTE definitions (both join
    sides) — the exact shape where cache substitution does not reach
    (round-4 CacheManager finding), so it is MATERIALIZED, not
    persisted: each band side scans compact parquet instead of
    re-running the encode+hash kernels."""
    from qradar_restapi_kafka_datapipeline_spark.engine import materialize_view

    hashes = image_dhash(attach_textured_bmp_payload(docs)).select(
        "doc_id", "hash_hi", "hash_lo"
    )
    name = materialize_view(spark, hashes, "__phash_hashes")
    return spark.sql(
        phash_pairs_expanded_sql(
            "spark",
            f"SELECT doc_id, hash_hi, hash_lo FROM {name}",
            max_hamming,
        )
    )


def phash_pairs_oracle_sql(max_hamming: int = 2) -> str:
    """DuckDB twin: hashes recomputed from the encoder spec, then the
    SAME pair logic."""
    return phash_pairs_sql(
        "duckdb", dhash_oracle_sql("duckdb"), max_hamming
    )


def phash_clusters_sql(
    dialect: str,
    hash_rel: str,
    max_hamming: int = 2,
) -> str:
    """The 100-TB shape of perceptual-hash dedup (round 9): collapse
    IDENTICAL hashes first (one linear groupBy — exact duplicates never
    enter the pair join), then band only the DISTINCT hashes.

    Why this exists alongside :func:`phash_pairs_sql`: doc-level pair
    output is quadratic in duplicate-class size (a crawl's boilerplate
    images form huge classes — this corpus's texture classes already
    produce 1.5M doc pairs at sf0.1 and would produce ~256x that at 16x
    amplification).  Here each hash group is one row — (canonical
    min-doc id, member count) — and the banded join runs over distinct
    hashes, whose population is bounded by hash diversity, NOT corpus
    size; the output is near-pairs BETWEEN groups (hamming ≥ 1; the
    distance-0 mass lives in ``n_members``).  Doc-level pairs are
    recoverable as the group cross-products, so no information is lost
    — the consistency is pinned by a pytest expanding one into the
    other."""
    if not 1 <= max_hamming <= 7:
        raise ValueError("cluster near-pairs need max_hamming in [1, 7] "
                         "(distance 0 is collapsed into the groups)")
    band_spine, band_val, ham = _phash_fragments(dialect)
    hint = "/*+ BROADCAST(b) */ " if dialect == "spark" else ""
    return f"""
    WITH hs AS ({hash_rel}),
    grp AS (
      SELECT hash_hi, hash_lo,
             CAST(COUNT(*) AS BIGINT) AS n_members,
             CAST(MIN(doc_id) AS BIGINT) AS canonical
      FROM hs GROUP BY hash_hi, hash_lo
    ),
    bands AS (
      SELECT {hint}h.canonical, h.hash_hi, h.hash_lo, h.n_members,
             b.b AS band_id, {band_val} AS band_val
      FROM grp h CROSS JOIN ({band_spine}) b
    ),
    cand AS (
      SELECT DISTINCT x.canonical AS canon_a, y.canonical AS canon_b,
             x.hash_hi AS hi_a, x.hash_lo AS lo_a, x.n_members AS n_a,
             y.hash_hi AS hi_b, y.hash_lo AS lo_b, y.n_members AS n_b
      FROM bands x JOIN bands y
        ON x.band_id = y.band_id AND x.band_val = y.band_val
       AND x.canonical < y.canonical
    )
    SELECT canon_a, canon_b, n_a, n_b, CAST(hamming AS BIGINT) AS hamming
    FROM (SELECT canon_a, canon_b, n_a, n_b, {ham} AS hamming FROM cand) p
    WHERE hamming BETWEEN 1 AND {max_hamming}
    """


def image_phash_clusters(
    spark,
    docs: DataFrame,
    max_hamming: int = 2,
) -> DataFrame:
    """End-to-end cluster form: real dHash kernel → identical-hash
    collapse → banded near-pairs over distinct hashes (same materialized
    hash relation posture as :func:`image_phash_pairs`)."""
    from qradar_restapi_kafka_datapipeline_spark.engine import materialize_view

    hashes = image_dhash(attach_textured_bmp_payload(docs)).select(
        "doc_id", "hash_hi", "hash_lo"
    )
    name = materialize_view(spark, hashes, "__phash_hashes")
    return spark.sql(
        phash_clusters_sql(
            "spark",
            f"SELECT doc_id, hash_hi, hash_lo FROM {name}",
            max_hamming,
        )
    )


def phash_clusters_oracle_sql(max_hamming: int = 2) -> str:
    """DuckDB twin of :func:`image_phash_clusters`."""
    return phash_clusters_sql(
        "duckdb", dhash_oracle_sql("duckdb"), max_hamming
    )


def phash_index_streaming(
    spark,
    max_hamming: int = 2,
    n_batches: int = 3,
    source: str = "documents",
    _crash_after_write_epoch: int | None = None,
    _parts_out: list | None = None,
):
    """Incrementally-maintained perceptual-hash index — the per-epoch
    parts motif (``bm25_index_streaming`` / ``chunk_index_streaming``,
    reference-free north star) applied to the MULTIMODAL dedup family:
    each document micro-batch encodes + dHashes its images (both REAL
    kernels, Arrow-batched) and lands ``(doc_id, hash_hi, hash_lo)`` as
    an immutable ``epoch=N`` part; hashing is per-image LOCAL, so a
    replayed batch rewrites exactly its own part and the merged parts
    equal a one-shot corpus hash pass row-for-row.  Serving runs the
    cluster dedup (:func:`phash_clusters_sql`) over the merged relation
    — group counts and banded near-pairs are aggregates over it, so the
    streamed index is value-identical to the one-shot build the static
    DuckDB oracle computes.  At 100 TB this is image-dedup FRESHNESS:
    a new crawl delivery contributes hashes with one bounded
    decode+hash pass, no corpus rescan."""
    import os

    from qradar_restapi_kafka_datapipeline_spark.engine import scratch_dir
    from qradar_restapi_kafka_datapipeline_spark.streaming.rollup_stream import (
        _write_split,
    )

    src = spark.table(source).select("doc_id", "text")
    base = scratch_dir("phash_ix_stream_")
    landing = os.path.join(base, "landing")
    os.makedirs(landing)
    keyed = src.withColumn(
        "__b", F.pmod(F.xxhash64("doc_id"), F.lit(n_batches))
    )
    now = 1_700_000_000
    for i in range(n_batches):
        path = os.path.join(landing, f"b{i}.parquet")
        _write_split(keyed.where(F.col("__b") == i).drop("__b"), path)
        os.utime(path, (now + 10 * i, now + 10 * i))

    parts = os.path.join(base, "hash_parts")
    ckpt = os.path.join(base, "ckpt")
    if _parts_out is not None:
        _parts_out.extend([parts, ckpt])
    armed = {"epoch": _crash_after_write_epoch}

    def fold(batch, epoch: int) -> None:
        if batch.isEmpty():
            return
        inc = image_dhash(attach_textured_bmp_payload(batch)).select(
            "doc_id", "hash_hi", "hash_lo"
        )
        inc.write.mode("overwrite").parquet(
            os.path.join(parts, f"epoch={epoch}")
        )
        if armed["epoch"] is not None and epoch >= armed["epoch"]:
            armed["epoch"] = None
            raise RuntimeError(
                "injected crash after increment write (replay test)"
            )

    def run() -> None:
        stream = (
            spark.readStream.schema(src.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(landing)
        )
        (
            stream.writeStream.foreachBatch(fold)
            .option("checkpointLocation", ckpt)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )

    try:
        run()
    except Exception:
        if _crash_after_write_epoch is None:
            raise
        run()  # replay overwrites its own epoch part — idempotent
    merged = (
        f"SELECT doc_id, hash_hi, hash_lo FROM parquet.`{parts}`"
    )
    return spark.sql(phash_clusters_sql("spark", merged, max_hamming))


def phash_index_delete_streaming(
    spark,
    max_hamming: int = 2,
    n_batches: int = 3,
    delete_pred: str = "doc_id % 9 = 0",
    n_delete_batches: int = 2,
    source: str = "documents",
    _crash_after_write_epoch: int | None = None,
    _parts_out: list | None = None,
):
    """Takedown for the maintained perceptual-hash index (round 12 —
    the text/chunk tombstone-stream protocol applied to the multimodal
    family, completing VERDICT r11 #1 across every maintained index):
    deletes land as per-epoch immutable tombstone parts
    (:func:`...text._stream_delete_parts` — replay overwrites its own
    part), serving anti-joins them, and the cluster dedup over the
    remaining hashes must equal a one-shot build over the remaining
    documents (the gate oracle) — group counts, canonical min-doc ids
    AND the banded near-pairs all shift when a member documents drops,
    so a leaked tombstone hash-fails."""
    from qradar_restapi_kafka_datapipeline_spark.operators.text import (
        _stream_delete_parts,
    )

    po: list = []
    phash_index_streaming(spark, max_hamming, n_batches, source,
                          _parts_out=po)
    parts = po[0]
    dels = spark.table(source).where(delete_pred).select("doc_id")
    del_parts = _stream_delete_parts(
        spark, dels, n_delete_batches,
        _crash_after_write_epoch=_crash_after_write_epoch,
    )
    if _parts_out is not None:
        _parts_out.extend([parts, del_parts])
    merged = (
        f"SELECT t.doc_id, t.hash_hi, t.hash_lo FROM parquet.`{parts}` t "
        f"LEFT ANTI JOIN (SELECT DISTINCT doc_id FROM "
        f"parquet.`{del_parts}`) d ON d.doc_id = t.doc_id"
    )
    return spark.sql(phash_clusters_sql("spark", merged, max_hamming))


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


#: Audio fingerprint geometry (round 11, VERDICT r10 #4): 65 frames of 4
#: PCM samples each — 64 consecutive-frame energy comparisons = one
#: 64-bit fingerprint, so the WHOLE Hamming-banding family
#: (:func:`phash_pairs_sql` / :func:`phash_clusters_sql`) is reused
#: verbatim.  The voiced encoder derives each frame's amplitude from the
#: WORD at that position of the document, so near-duplicate texts yield
#: near-duplicate audio — the fingerprint measures content, not doc_id.
AUDIO_FP_FRAMES = 65
AUDIO_FP_SPF = 4
_AUDIO_AMP_FALLBACK = 97
_K_WLEN, _K_WFIRST, _K_WLAST = 17, 31, 7


def _word_amp(words: list[str], f: int) -> int:
    """Frame ``f``'s amplitude: a cheap deterministic mix of the word at
    sampled position ``(f·nw)//FRAMES`` — length, first and last char —
    replicated in closed form by :func:`audio_fp_oracle_sql`."""
    if not words:
        return _AUDIO_AMP_FALLBACK
    w = words[(f * len(words)) // AUDIO_FP_FRAMES]
    return (_K_WLEN * len(w) + _K_WFIRST * ord(w[0])
            + _K_WLAST * ord(w[-1])) % 256


def encode_wav_voiced(doc_id: int, text: str) -> bytes:
    """A valid 16-bit mono PCM WAV whose samples are a function of the
    TEXT (the constant-formula :func:`encode_wav` is degenerate for
    fingerprinting: its samples depend only on doc_id, so no two
    documents ever sound alike).  Frame ``f`` (4 samples) carries
    ``(amp_f+1)·(s+1)·13 + 5·f − 32768`` — amplitudes small enough that
    the 16-bit lattice never wraps, so frame energy is the closed form
    ``130·(amp_f+1) + 20·f``.  Same RIFF layout as :func:`encode_wav`,
    including the junk LIST chunk before fmt on every third document
    (a decoder that assumes fixed offsets fails the gate)."""
    import struct

    rate = 8000 + (doc_id % 4) * 4000
    words = text.split()
    samples = []
    for f in range(AUDIO_FP_FRAMES):
        amp = _word_amp(words, f)
        for s in range(AUDIO_FP_SPF):
            samples.append((amp + 1) * (s + 1) * 13 + 5 * f - 32768)
    data = struct.pack(f"<{len(samples)}h", *samples)
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    chunks = b""
    if doc_id % 3 == 0:
        junk = b"notacodecpayload"
        chunks += b"LIST" + struct.pack("<I", len(junk)) + junk
    chunks += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def attach_voiced_wav_payload(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """``(doc_id, payload)`` with a voiced WAV per document."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "payload": [
                        encode_wav_voiced(int(i), t)
                        for i, t in zip(pdf[id_col], pdf[text_col])
                    ],
                }
            )

    return df.select(id_col, text_col).mapInPandas(
        kernel, schema="doc_id LONG, payload BINARY"
    )


def audio_fingerprint(
    media: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """64-bit frame-energy sign-hash per audio payload, parsed from REAL
    bytes: RIFF chunk walk (fmt may not be first), signed-PCM unpack,
    unsigned-offset per-frame energy sums, one bit per consecutive-frame
    comparison ``E(f+1) > E(f)`` — the audio sibling of
    :func:`image_dhash` (Chromaprint's sub-fingerprint idea reduced to
    the energy envelope).  Emitted as two unsigned 32-bit halves in
    BIGINTs (``hash_hi``/``hash_lo``), so the Hamming banding machinery
    is shared with the image family.  The kernel never sees the encoder
    formula — it walks bytes; :func:`audio_fp_oracle_sql` recomputes
    the fingerprint from the spec in closed form."""
    import struct

    def _one(payload: bytes) -> tuple[int, int]:
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
            pos += 8 + clen + (clen % 2)
        if fmt is None or data is None:
            raise ValueError("missing fmt/data chunk")
        n = len(data) // 2
        if n != AUDIO_FP_FRAMES * AUDIO_FP_SPF:
            raise ValueError(f"fingerprint expects "
                             f"{AUDIO_FP_FRAMES * AUDIO_FP_SPF} samples, "
                             f"got {n}")
        u = [s + 32768 for s in struct.unpack(f"<{n}h", data)]
        energies = [
            sum(u[f * AUDIO_FP_SPF : (f + 1) * AUDIO_FP_SPF])
            for f in range(AUDIO_FP_FRAMES)
        ]
        hi = lo = 0
        for k in range(AUDIO_FP_FRAMES - 1):
            if energies[k + 1] > energies[k]:
                if k < 32:
                    lo |= 1 << k
                else:
                    hi |= 1 << (k - 32)
        return hi, lo

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                (int(i), *_one(bytes(b)))
                for i, b in zip(pdf[id_col], pdf[payload_col])
            ]
            yield pd.DataFrame(rows, columns=["doc_id", "hash_hi", "hash_lo"])

    return media.mapInPandas(
        kernel, schema="doc_id LONG, hash_hi LONG, hash_lo LONG"
    )


def audio_fp_oracle_sql(source: str = "documents") -> str:
    """DuckDB recomputation of the audio fingerprint from the encoder
    spec in closed form — whitespace word split, per-frame word-amp mix,
    the exact integer energy ``130·(amp+1) + 20·f``, LEAD comparison
    bits, integer-shift bit weights.  All-integer: no float discipline
    needed anywhere."""
    amp = (
        f"({_K_WLEN} * length(w) + {_K_WFIRST} * ascii(w)"
        f" + {_K_WLAST} * ascii(substr(w, length(w)))) % 256"
    )
    return f"""
    WITH ws AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(text), '\\s+'),
                         x -> x <> '') AS words
      FROM {source}
    ),
    fw AS (
      SELECT doc_id, f.f AS f, len(words) AS nw,
             CASE WHEN len(words) = 0 THEN ''
                  ELSE words[(f.f * len(words)) // {AUDIO_FP_FRAMES} + 1]
             END AS w
      FROM ws CROSS JOIN
           UNNEST(generate_series(0, {AUDIO_FP_FRAMES - 1})) AS f(f)
    ),
    amps AS (
      SELECT doc_id, f,
             CASE WHEN nw = 0 THEN {_AUDIO_AMP_FALLBACK}
                  ELSE {amp} END AS amp
      FROM fw
    ),
    energies AS (
      SELECT doc_id, f, 130 * (amp + 1) + 20 * f AS energy FROM amps
    ),
    bits AS (
      SELECT doc_id, f AS k,
             CASE WHEN LEAD(energy) OVER (
                    PARTITION BY doc_id ORDER BY f) > energy
                  THEN 1 ELSE 0 END AS bit
      FROM energies
    )
    SELECT doc_id,
           CAST(SUM(CASE WHEN k >= 32 AND k < 64
                         THEN bit * (CAST(1 AS BIGINT) << (k - 32))
                         ELSE 0 END) AS BIGINT) AS hash_hi,
           CAST(SUM(CASE WHEN k < 32
                         THEN bit * (CAST(1 AS BIGINT) << k)
                         ELSE 0 END) AS BIGINT) AS hash_lo
    FROM bits GROUP BY doc_id
    """


def audio_fingerprint_pairs(
    spark,
    docs: DataFrame,
    max_hamming: int = 2,
) -> DataFrame:
    """End-to-end audio near-dup dedup: voiced-WAV payloads → REAL
    RIFF-walking fingerprint kernel → group-expansion pair join
    (:func:`phash_pairs_expanded_sql`; the gate oracle stays the
    independent simple banded form over the closed-form fingerprint
    recomputation, so kernel, encoder AND pair logic are all
    cross-checked).  Same materialize posture as the image twin: the
    hash relation's lineage crosses two Python kernel stages and feeds
    both join sides through CTE definitions."""
    from qradar_restapi_kafka_datapipeline_spark.engine import materialize_view

    hashes = audio_fingerprint(attach_voiced_wav_payload(docs)).select(
        "doc_id", "hash_hi", "hash_lo"
    )
    name = materialize_view(spark, hashes, "__audio_fp")
    return spark.sql(
        phash_pairs_expanded_sql(
            "spark",
            f"SELECT doc_id, hash_hi, hash_lo FROM {name}",
            max_hamming,
        )
    )


def audio_fp_pairs_oracle_sql(max_hamming: int = 2) -> str:
    """DuckDB twin of :func:`audio_fingerprint_pairs`: fingerprints from
    the encoder spec, then the simple banded pair form."""
    return phash_pairs_sql("duckdb", audio_fp_oracle_sql(), max_hamming)


def audio_fingerprint_clusters(
    spark,
    docs: DataFrame,
    max_hamming: int = 2,
) -> DataFrame:
    """Cluster form (the 100-TB shape, like :func:`image_phash_clusters`):
    identical fingerprints collapse in one linear groupBy, banding runs
    over DISTINCT fingerprints only."""
    from qradar_restapi_kafka_datapipeline_spark.engine import materialize_view

    hashes = audio_fingerprint(attach_voiced_wav_payload(docs)).select(
        "doc_id", "hash_hi", "hash_lo"
    )
    name = materialize_view(spark, hashes, "__audio_fp_cl")
    return spark.sql(
        phash_clusters_sql(
            "spark",
            f"SELECT doc_id, hash_hi, hash_lo FROM {name}",
            max_hamming,
        )
    )


def audio_fp_clusters_oracle_sql(max_hamming: int = 2) -> str:
    """DuckDB twin of :func:`audio_fingerprint_clusters`."""
    return phash_clusters_sql("duckdb", audio_fp_oracle_sql(), max_hamming)


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


# ---------------------------------------------------------------------------
# PNG: the third real-decode family member (VERDICT r2 #8) — stdlib zlib is
# the whole codec, so unlike BMP/WAV's fixed headers this one exercises a real
# compressed bitstream: chunk walking with CRC verification, multi-IDAT
# concatenation, inflate, and per-scanline filter REVERSAL (None/Sub/Up).
# ---------------------------------------------------------------------------


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body))
    )


def encode_png(doc_id: int, text: str) -> bytes:
    """A VALID 8-bit grayscale PNG with deterministic dimensions and pixels
    (``raw[y][x] = (doc_id*7 + y*13 + x*3) % 256``) so an SQL oracle can
    recompute the decoded checksum without touching bytes.  Deliberate
    decoder hazards: scanline filters CYCLE through None/Sub/Up (a decoder
    skipping filter reversal fails), every third doc carries a tEXt chunk
    before IDAT (fixed-offset readers fail), and every fourth doc splits the
    deflate stream across TWO IDAT chunks (per-chunk inflaters fail)."""
    import struct
    import zlib

    w = 4 + len(text) % 8
    h = 2 + doc_id % 5
    raw = [
        bytes((doc_id * 7 + y * 13 + x * 3) % 256 for x in range(w))
        for y in range(h)
    ]
    stream = bytearray()
    for y in range(h):
        f = y % 3
        stream.append(f)
        if f == 0:  # None
            stream += raw[y]
        elif f == 1:  # Sub: delta vs left neighbor
            stream += bytes(
                (raw[y][x] - (raw[y][x - 1] if x else 0)) % 256 for x in range(w)
            )
        else:  # Up: delta vs same column, prior row
            prior = raw[y - 1] if y else bytes(w)
            stream += bytes((raw[y][x] - prior[x]) % 256 for x in range(w))
    comp = zlib.compress(bytes(stream))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    out = b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
    if doc_id % 3 == 0:
        out += _png_chunk(b"tEXt", b"Comment\x00synthetic")
    if doc_id % 4 == 0 and len(comp) >= 2:
        mid = len(comp) // 2
        out += _png_chunk(b"IDAT", comp[:mid]) + _png_chunk(b"IDAT", comp[mid:])
    else:
        out += _png_chunk(b"IDAT", comp)
    return out + _png_chunk(b"IEND", b"")


def decode_png(payload: bytes) -> tuple[int, int, int, int, int, int]:
    """Parse a PNG from raw bytes: signature + chunk walk (verifying every
    CRC), IDAT concatenation, zlib inflate, and per-scanline filter reversal
    for filter types 0/1/2.  Returns ``(width, height, bit_depth,
    color_type, n_chunks, pixel_checksum)`` where the checksum positionally
    weights every RECONSTRUCTED pixel — a decode that skips filter reversal,
    transposes, or drops a scanline hash-fails."""
    import struct
    import zlib

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload")
    pos, n_chunks, idat, ihdr = 8, 0, b"", None
    while pos + 12 <= len(payload):
        clen = struct.unpack_from(">I", payload, pos)[0]
        ctype = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + clen]
        crc = struct.unpack_from(">I", payload, pos + 8 + clen)[0]
        if zlib.crc32(ctype + body) != crc:
            raise ValueError(f"CRC mismatch in {ctype!r} chunk")
        n_chunks += 1
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat += body
        pos += 12 + clen
        if ctype == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT chunk")
    w, h, depth, ctype_id, _, _, interlace = ihdr
    if depth != 8 or ctype_id != 0 or interlace != 0:
        raise ValueError("decoder supports 8-bit non-interlaced grayscale")
    stream = zlib.decompress(idat)
    if len(stream) != h * (w + 1):
        raise ValueError("inflated stream length mismatch")
    checksum, prior = 0, bytes(w)
    for y in range(h):
        f = stream[y * (w + 1)]
        filt = stream[y * (w + 1) + 1 : (y + 1) * (w + 1)]
        if f == 0:
            recon = bytearray(filt)
        elif f == 1:
            recon = bytearray(w)
            for x in range(w):
                recon[x] = (filt[x] + (recon[x - 1] if x else 0)) % 256
        elif f == 2:
            recon = bytearray((filt[x] + prior[x]) % 256 for x in range(w))
        else:
            raise ValueError(f"unsupported scanline filter {f}")
        for x in range(w):
            checksum += recon[x] * (1 + (y * w + x) % 97)
        prior = bytes(recon)
    return w, h, depth, ctype_id, n_chunks, checksum % BMP_CHECKSUM_MOD


def attach_png_payload(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """``(id, payload)`` with a real PNG per document — Arrow-batched encode."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "payload": [
                        encode_png(int(i), t)
                        for i, t in zip(pdf[id_col], pdf[text_col])
                    ],
                }
            )

    return df.select(id_col, text_col).mapInPandas(
        kernel, schema="doc_id LONG, payload BINARY"
    )


def extract_png_features(
    media: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Real-decode PNG features: every value comes out of
    :func:`decode_png`'s chunk walk + inflate + filter reversal — the oracle
    recomputes them from the encoder spec, so a wrong filter pass, skipped
    IDAT, or CRC shortcut hash-fails."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                (int(i), *decode_png(bytes(b)))
                for i, b in zip(pdf[id_col], pdf[payload_col])
            ]
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height", "bit_depth", "color_type",
                    "n_chunks", "pixel_checksum",
                ],
            )

    return media.mapInPandas(
        kernel,
        schema="doc_id LONG, width INT, height INT, bit_depth INT, "
        "color_type INT, n_chunks INT, pixel_checksum LONG",
    )


def png_decode_oracle_sql(source: str = "documents") -> str:
    """DuckDB recomputation of every decoded PNG property from the encoder
    spec — the pixel checksum re-derives each RECONSTRUCTED pixel from the
    deterministic fill formula with the same positional weights, so it
    value-checks the whole inflate + filter-reversal path."""
    return f"""
    WITH dims AS (
      SELECT doc_id,
             CAST(4 + length(text) % 8 AS INT) AS w,
             CAST(2 + doc_id % 5 AS INT) AS h
      FROM {source}
    )
    SELECT doc_id, w AS width, h AS height, CAST(8 AS INT) AS bit_depth,
           CAST(0 AS INT) AS color_type,
           CAST(3 + CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END
                  + CASE WHEN doc_id % 4 = 0 THEN 1 ELSE 0 END AS INT)
             AS n_chunks,
           CAST(list_sum(list_transform(generate_series(0, w * h - 1),
                i -> ((doc_id * 7 + (i // w) * 13 + (i % w) * 3) % 256)
                     * (1 + i % 97)))
                % {BMP_CHECKSUM_MOD} AS BIGINT) AS pixel_checksum
    FROM dims
    """


# ---------------------------------------------------------------------------
# JPEG (baseline DCT): the fourth real-decode family member (VERDICT r3 #8) —
# a true entropy-coded bitstream: canonical Huffman tables built from DHT,
# bit-level reads with 0xFF byte-unstuffing, DC difference decoding,
# dequantization, a general numpy float IDCT, MCU padding + crop.  The
# encoded coefficients are DC-only with q_dc = 16, so every reconstructed
# pixel is the INTEGER 128 + 2·DC (the float IDCT of a DC-only block is the
# constant F00/8 up to ~1e-14, which rounds exactly) — the SQL oracle
# recomputes the full pixel checksum without touching bytes while the
# decoder still runs the completely general baseline path.
# ---------------------------------------------------------------------------

# Custom canonical Huffman tables (JPEG allows any; these cover the emitted
# symbols): DC categories 0..6 as seven 3-bit codes, AC as the single 1-bit
# EOB code.  (bits[i] = number of codes of length i+1, then the value list —
# exactly the DHT wire layout.)
_JPEG_DC_BITS = [0, 0, 7, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_JPEG_DC_VALS = list(range(7))
_JPEG_AC_BITS = [1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_JPEG_AC_VALS = [0x00]  # EOB


def _jpeg_canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length) for a canonical JPEG Huffman table."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _jpeg_dims(doc_id: int, text: str) -> tuple[int, int]:
    return 5 + len(text) % 12, 3 + doc_id % 10


def _jpeg_dc(doc_id: int, k: int) -> int:
    """DC coefficient of block ``k`` — pixels are 128 + 2·dc ∈ [64, 190]."""
    return ((doc_id * 11 + k * 5) % 64) - 32


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, value: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:  # byte stuffing
                    self.out.append(0x00)
                self.acc, self.nbits = 0, 0

    def flush(self) -> bytes:
        if self.nbits:
            self.acc = (self.acc << (8 - self.nbits)) | ((1 << (8 - self.nbits)) - 1)
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
        return bytes(self.out)


def encode_jpeg(doc_id: int, text: str) -> bytes:
    """A VALID baseline 8-bit grayscale JFIF-less JPEG with deterministic
    dimensions and DC-only blocks.  Decoder hazards baked in: every third
    doc carries a COM segment; every fourth doc packs BOTH Huffman tables
    into ONE DHT segment (multi-table DHT — fixed-per-segment readers
    fail); dimensions are not MCU-aligned, so the decoder must pad to the
    8×8 grid and crop back; the entropy stream is byte-stuffed."""
    import struct

    w, h = _jpeg_dims(doc_id, text)
    bpr, bpc = (w + 7) // 8, (h + 7) // 8
    qtab = [16] + [17 + (i * 7) % 99 for i in range(1, 64)]  # q[0]=16: dc·16/8 exact

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    dht_dc = bytes([0x00] + _JPEG_DC_BITS + _JPEG_DC_VALS)
    dht_ac = bytes([0x10] + _JPEG_AC_BITS + _JPEG_AC_VALS)
    out = b"\xff\xd8"  # SOI
    if doc_id % 3 == 0:
        out += seg(0xFFFE, b"synthetic comment")  # COM
    out += seg(0xFFDB, bytes([0x00] + qtab))  # DQT, table 0, 8-bit
    if doc_id % 4 == 0:
        out += seg(0xFFC4, dht_dc + dht_ac)  # one DHT, two tables
    else:
        out += seg(0xFFC4, dht_dc) + seg(0xFFC4, dht_ac)
    out += seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))  # SOF0
    out += seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))  # SOS
    dc_codes = _jpeg_canonical_codes(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac_codes = _jpeg_canonical_codes(_JPEG_AC_BITS, _JPEG_AC_VALS)
    bw = _BitWriter()
    prev = 0
    for k in range(bpr * bpc):
        dc = _jpeg_dc(doc_id, k)
        diff = dc - prev
        prev = dc
        mag = abs(diff)
        cat = mag.bit_length()
        code, length = dc_codes[cat]
        bw.put(code, length)
        if cat:
            bw.put(diff if diff >= 0 else diff + (1 << cat) - 1, cat)
        code, length = ac_codes[0x00]  # EOB: all 63 AC coefficients zero
        bw.put(code, length)
    return out + bw.flush() + b"\xff\xd9"  # EOI


class _BitReader:
    """MSB-first entropy-segment reader with 0xFF00 unstuffing."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data, self.pos, self.acc, self.nbits = data, pos, 0, 0

    def bit(self) -> int:
        if self.nbits == 0:
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos]
                if nxt == 0x00:
                    self.pos += 1  # stuffed
                else:
                    raise ValueError("marker inside entropy stream")
            self.acc, self.nbits = b, 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v


def _jpeg_huff_decode(br: "_BitReader", codes: dict[int, tuple[int, int]]) -> int:
    inv = {(c, l): s for s, (c, l) in codes.items()}
    code, length = 0, 0
    while length <= 16:
        code = (code << 1) | br.bit()
        length += 1
        if (code, length) in inv:
            return inv[(code, length)]
    raise ValueError("invalid Huffman code")


def _jpeg_extend(v: int, cat: int) -> int:
    return v if cat == 0 or v >= (1 << (cat - 1)) else v - (1 << cat) + 1


def _jpeg_zigzag() -> list[int]:
    """Natural-order position for each zig-zag index (ITU T.81 Figure 5) —
    derived, not tabulated: walk the anti-diagonals, alternating direction."""
    order = []
    for s in range(15):
        diag = [(y, s - y) for y in range(max(0, s - 7), min(8, s + 1))]
        if s % 2 == 0:
            diag.reverse()  # even diagonals run bottom-left → top-right
        order.extend(y * 8 + x for y, x in diag)
    return order


def decode_jpeg(payload: bytes) -> tuple[int, int, int, int, int, int]:
    """Fully general baseline grayscale JPEG decode in pure numpy: segment
    walk, DHT canonical-table build, DQT read, bit-level entropy decode
    (DC diffs + AC run-length, byte-unstuffed), dequantization, float IDCT,
    round/clamp/level-shift, MCU-grid crop.  Returns ``(width, height,
    precision, n_segments, n_blocks, pixel_checksum)`` — the checksum
    positionally weights every RECONSTRUCTED pixel, so a wrong Huffman
    table, skipped dequantize, transposed IDCT, or missing crop hash-fails.
    """
    import struct

    import numpy as np

    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos, n_segments = 2, 1  # SOI counts
    qtabs: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], dict[int, tuple[int, int]]] = {}
    w = h = precision = -1
    br = None
    while pos + 2 <= len(payload):
        marker = struct.unpack_from(">H", payload, pos)[0]
        if marker == 0xFFD9:  # EOI
            n_segments += 1
            break
        length = struct.unpack_from(">H", payload, pos + 2)[0]
        body = payload[pos + 4 : pos + 2 + length]
        n_segments += 1
        if marker == 0xFFDB:  # DQT (possibly several tables per segment)
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0xF
                if pq != 0:
                    raise ValueError("only 8-bit quant tables supported")
                qtabs[tq] = list(body[i + 1 : i + 65])
                i += 65
        elif marker == 0xFFC4:  # DHT (possibly several tables per segment)
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                vals = list(body[i + 17 : i + 17 + n])
                huff[(tc, th)] = _jpeg_canonical_codes(bits, vals)
                i += 17 + n
        elif marker == 0xFFC0:  # SOF0 baseline
            precision, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if nc != 1:
                raise ValueError("decoder supports single-component (grayscale)")
        elif marker == 0xFFDA:  # SOS: entropy data follows the header
            br = _BitReader(payload, pos + 2 + length)
            break
        pos += 2 + length
    if br is None or w < 0 or 0 not in qtabs:
        raise ValueError("missing SOS/SOF0/DQT")
    zig = _jpeg_zigzag()
    q = np.zeros(64, dtype=np.float64)
    q[zig] = qtabs[0]  # DQT entries arrive in zig-zag order (T.81 B.2.4.1)
    q = q.reshape(8, 8)
    dc_codes, ac_codes = huff[(0, 0)], huff[(1, 0)]
    bpr, bpc = (w + 7) // 8, (h + 7) // 8
    # orthonormal DCT basis: C[u, x] = 0.5 * c(u) * cos((2x+1)uπ/16)
    u = np.arange(8).reshape(8, 1)
    x = np.arange(8).reshape(1, 8)
    C = 0.5 * np.cos((2 * x + 1) * u * np.pi / 16)
    C[0, :] *= 1 / np.sqrt(2)
    img = np.zeros((bpc * 8, bpr * 8), dtype=np.int64)
    prev, n_blocks = 0, 0
    for k in range(bpr * bpc):
        cat = _jpeg_huff_decode(br, dc_codes)
        if cat > 11:
            raise ValueError("DC category out of range (corrupt stream)")
        diff = _jpeg_extend(br.bits(cat), cat) if cat else 0
        prev += diff
        coef = np.zeros((8, 8), dtype=np.float64)
        coef[0, 0] = prev
        n_ac = 0
        while n_ac < 63:
            sym = _jpeg_huff_decode(br, ac_codes)
            if sym == 0x00:  # EOB
                break
            run, size = sym >> 4, sym & 0xF
            if size == 0 and run == 15:  # ZRL
                n_ac += 16
                continue
            n_ac += run + 1
            if n_ac > 63:
                raise ValueError("AC run past block end (corrupt stream)")
            val = _jpeg_extend(br.bits(size), size)
            nat = zig[n_ac]  # entropy order is zig-zag; place naturally
            coef[nat // 8, nat % 8] = val
        block = C.T @ (coef * q) @ C
        py, px = (k // bpr) * 8, (k % bpr) * 8
        img[py : py + 8, px : px + 8] = np.clip(
            np.rint(block + 128).astype(np.int64), 0, 255
        )
        n_blocks += 1
    # after the last block the reader sits on the byte boundary (padding bits
    # belong to the last consumed byte) — EOI must follow, and counts
    if payload[br.pos : br.pos + 2] != b"\xff\xd9":
        raise ValueError("missing EOI after entropy data")
    n_segments += 1
    crop = img[:h, :w]
    weights = 1 + (np.arange(h * w, dtype=np.int64) % 97).reshape(h, w)
    checksum = int((crop * weights).sum() % BMP_CHECKSUM_MOD)
    return w, h, precision, n_segments, n_blocks, checksum


def attach_jpeg_payload(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """``(id, payload)`` with a real baseline JPEG per document."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "payload": [
                        encode_jpeg(int(i), t)
                        for i, t in zip(pdf[id_col], pdf[text_col])
                    ],
                }
            )

    return df.select(id_col, text_col).mapInPandas(
        kernel, schema="doc_id LONG, payload BINARY"
    )


def extract_jpeg_features(
    media: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Real-decode JPEG features: every value comes out of
    :func:`decode_jpeg`'s entropy decode + IDCT."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                (int(i), *decode_jpeg(bytes(b)))
                for i, b in zip(pdf[id_col], pdf[payload_col])
            ]
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height", "precision", "n_segments",
                    "n_blocks", "pixel_checksum",
                ],
            )

    return media.mapInPandas(
        kernel,
        schema="doc_id LONG, width INT, height INT, precision INT, "
        "n_segments INT, n_blocks INT, pixel_checksum LONG",
    )


def jpeg_decode_oracle_sql(source: str = "documents") -> str:
    """DuckDB recomputation of every decoded JPEG property from the encoder
    spec: pixels are the integer 128 + 2·DC of the MCU block covering each
    (x, y) — the checksum therefore value-checks the Huffman DC chain, the
    dequantize-by-16, the IDCT constant, and the pad-and-crop geometry."""
    return f"""
    WITH dims AS (
      SELECT doc_id,
             CAST(5 + length(text) % 12 AS INT) AS w,
             CAST(3 + doc_id % 10 AS INT) AS h
      FROM {source}
    )
    SELECT doc_id, w AS width, h AS height, CAST(8 AS INT) AS precision,
           CAST(7 + CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END
                  - CASE WHEN doc_id % 4 = 0 THEN 1 ELSE 0 END AS INT)
             AS n_segments,
           CAST(((w + 7) // 8) * ((h + 7) // 8) AS INT) AS n_blocks,
           CAST(list_sum(list_transform(generate_series(0, w * h - 1),
                i -> (128 + 2 * (((doc_id * 11
                       + ((i // w) // 8 * ((w + 7) // 8) + (i % w) // 8) * 5)
                      % 64) - 32))
                     * (1 + i % 97)))
                % {BMP_CHECKSUM_MOD} AS BIGINT) AS pixel_checksum
    FROM dims
    """


# ---------------------------------------------------------------------------
# Video: the CONTAINER member of the real-decode family (round 10) — the
# frame-sample verb the task brief names for video pipelines, made real.
# The container is an MJPEG-shaped length-prefixed frame stream (magic +
# frame count + dims, then one 24-bit BMP per frame — per-frame fills VARY,
# so a frame-index bug changes checksums).  The sampling kernel SEEKS over
# unsampled frames via the length prefixes without parsing them — the honest
# video-pipeline optimization (decode cost ∝ kept frames, IO ∝ container) —
# proven by a test that corrupts an unsampled frame's interior and still
# samples cleanly while a corrupted SAMPLED frame raises.
# ---------------------------------------------------------------------------

VIDEO_MAGIC = b"VID0"


def _bmp_frame_bytes(w: int, h: int, fill: int) -> bytes:
    """A valid 24-bit BMP with a constant ``fill`` — :func:`encode_bmp`'s
    layout factored over explicit (w, h, fill) so container frames can
    vary per index while decoding through the same real parser."""
    import struct

    row = 3 * w
    pad = (4 - row % 4) % 4
    data = (bytes([fill % 256]) * row + b"\x00" * pad) * h
    size = 54 + len(data)
    header = struct.pack("<2sIHHI", b"BM", size, 0, 0, 54) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0
    )
    return header + data


def encode_video(doc_id: int, text: str) -> bytes:
    """A valid container: ``VID0 | n_frames u32 | w u16 | h u16`` then
    ``n_frames`` length-prefixed BMP frames.  Dimensions reuse the BMP
    derivation (width 4–11 from text, height 2–6 from id); frame count is
    2–5 from id; frame ``f``'s fill is ``(doc_id + 7·f) % 256`` so every
    frame's checksum is distinct and index-sensitive."""
    import struct

    w = 4 + len(text) % 8
    h = 2 + doc_id % 5
    n_frames = 2 + doc_id % 4
    parts = [VIDEO_MAGIC + struct.pack("<IHH", n_frames, w, h)]
    for f in range(n_frames):
        frame = _bmp_frame_bytes(w, h, doc_id + 7 * f)
        parts.append(struct.pack("<I", len(frame)) + frame)
    return b"".join(parts)


def decode_video_frame_samples(
    payload: bytes, every_nth: int = 2
) -> list[tuple[int, int, int, int]]:
    """Walk the container, decode every ``every_nth``-th frame through the
    REAL :func:`decode_bmp` parser, and SKIP the rest via their length
    prefixes (no parse — the seek is the point).  Returns
    ``[(frame_idx, width, height, pixel_checksum)]``; malformed magic,
    a truncated frame, or trailing bytes raise."""
    import struct

    if payload[:4] != VIDEO_MAGIC:
        raise ValueError("not a VID0 payload")
    n_frames, w, h = struct.unpack_from("<IHH", payload, 4)
    out = []
    off = 12
    for idx in range(n_frames):
        if off + 4 > len(payload):
            raise ValueError("truncated frame table")
        ln = struct.unpack_from("<I", payload, off)[0]
        off += 4
        if off + ln > len(payload):
            raise ValueError("truncated frame payload")
        if idx % every_nth == 0:
            fw, fh, _bpp, _sz, psum = decode_bmp(payload[off:off + ln])
            if (fw, fh) != (w, h):
                raise ValueError("frame dims disagree with container header")
            out.append((idx, fw, fh, psum))
        off += ln
    if off != len(payload):
        raise ValueError("trailing bytes after last frame")
    return out


def attach_video_payload(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """``(id, payload)`` with a real video container per document."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "payload": [
                        encode_video(int(i), t)
                        for i, t in zip(pdf[id_col], pdf[text_col])
                    ],
                }
            )

    return df.select(id_col, text_col).mapInPandas(
        kernel, schema="doc_id LONG, payload BINARY"
    )


def video_frame_sample_features(
    media: DataFrame,
    every_nth: int = 2,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """One row per SAMPLED frame, every value from the real byte walk —
    the gate oracle recomputes the expectation from the encoder spec in
    closed form, so an off-by-one in the seek arithmetic, the frame
    indexing, or the per-frame fill derivation hash-fails."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, b in zip(pdf[id_col], pdf[payload_col]):
                for idx, fw, fh, psum in decode_video_frame_samples(
                    bytes(b), every_nth
                ):
                    rows.append((int(i), idx, fw, fh, psum))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "frame_idx", "width", "height",
                    "pixel_checksum",
                ],
            )

    return media.mapInPandas(
        kernel,
        schema="doc_id LONG, frame_idx INT, width INT, height INT, "
        "pixel_checksum LONG",
    )


def video_frame_sample_oracle_sql(
    every_nth: int = 2, source: str = "documents"
) -> str:
    """DuckDB closed-form recomputation from the encoder spec: dims and
    frame count from (doc_id, text), sampled indices via the scalar
    generate_series list (the lateral-table form cannot take correlated
    arguments — CLAUDE.md), checksum = fill × pixel-bytes mod p."""
    return f"""
    WITH dims AS (
      SELECT doc_id,
             CAST(4 + length(text) % 8 AS INT) AS width,
             CAST(2 + doc_id % 5 AS INT) AS height,
             CAST(2 + doc_id % 4 AS INT) AS n_frames
      FROM {source}
    )
    SELECT doc_id, CAST(u.idx AS INT) AS frame_idx, width, height,
           CAST(((doc_id + 7 * u.idx) % 256) * 3 * width * height
                % {BMP_CHECKSUM_MOD} AS BIGINT) AS pixel_checksum
    FROM dims,
         UNNEST(list_transform(
           generate_series(0, n_frames - 1, {every_nth}), i -> i)) AS u(idx)
    """
