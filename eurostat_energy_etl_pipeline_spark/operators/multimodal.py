"""Multimodal column plumbing: image/audio/video as opaque `binary` columns
with typed metadata, processed via Arrow-batched `mapInPandas`.

The container has no image/audio codecs, so the decode kernels are stubbed:
`decode_image` raises NotImplementedError unless a decoder is importable,
and `fake_decode_features` is the deterministic stand-in used by tests. The
Spark-side plumbing — schema, batch iteration, partition sizing, UDF
signatures — is real and is what matters at 100 TB:

- media rows are processed in Arrow record batches (`mapInPandas`), so the
  Python worker sees columnar buffers, not per-row objects;
- binary payloads never pass through a shuffle: feature extraction is a
  narrow map, and downstream joins carry only (media_id, features);
- `maxRecordsPerBatch` bounds worker memory for multi-MB payloads.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from eurostat_energy_etl_pipeline_spark.functions.parallelism import widen_if_narrow
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("media_type", StringType()),  # image | audio | video
        StructField("format", StringType()),
        StructField("n_bytes", LongType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)


def media_table(documents: DataFrame) -> DataFrame:
    """Synthesize a media table from the documents fixture: the UTF-8 bytes
    of `text` stand in for an encoded payload. Schema and partitioning are
    exactly what a real ingest would produce."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.lit("raw").alias("format"),
        F.octet_length(F.encode(F.col("text"), "UTF-8")).cast("long").alias("n_bytes"),
    )


def decode_image(payload: bytes, dim: int = 8):
    """Decode one encoded image payload to ``(width, height, features)``
    where ``features`` is a length-``dim`` float64 vector of grayscale
    band means — the same shape contract as :func:`fake_decode_features`,
    so the two decoders are drop-in interchangeable in
    :func:`extract_features`.

    Requires PIL (not baked into this container — the gated test in
    tests/test_multimodal.py skips when it is absent); without a codec
    this raises NotImplementedError and callers fall back to the
    deterministic stub."""
    try:
        import PIL.Image
    except ImportError as e:  # pragma: no cover - env-dependent
        raise NotImplementedError(
            "image decoding requires an image codec (PIL); install one or use "
            "fake_decode_features for plumbing tests"
        ) from e
    import io

    with PIL.Image.open(io.BytesIO(payload)) as im:
        width, height = im.size
        gray = np.asarray(im.convert("L"), dtype=np.float64) / 255.0
    # dim vertical band means: deterministic, resolution-independent
    flat = gray.reshape(height, width).mean(axis=0) if height else np.zeros(1)
    edges = (np.arange(dim + 1) * len(flat)) // dim
    csum = np.concatenate(([0.0], np.cumsum(flat, dtype=np.float64)))
    widths = np.diff(edges)
    with np.errstate(invalid="ignore"):
        means = np.diff(csum[edges]) / widths
    return width, height, np.where(widths > 0, means, 0.0)


def pil_decode_features(payload: np.ndarray, dim: int = 8):
    """Batch twin of :func:`decode_image` for the mapInPandas kernel:
    returns (widths int32[n], heights int32[n], features float64[n, dim])."""
    ws = np.zeros(len(payload), dtype=np.int32)
    hs = np.zeros(len(payload), dtype=np.int32)
    out = np.zeros((len(payload), dim), dtype=np.float64)
    for i, buf in enumerate(payload):
        ws[i], hs[i], out[i] = decode_image(bytes(buf), dim=dim)
    return ws, hs, out


def fake_decode_features(payload: np.ndarray, dim: int = 8) -> np.ndarray:
    """Deterministic stand-in decoder: fixed-size features from byte
    statistics. Fully batch-vectorized (round 5): ONE cumsum over the
    batch's concatenated bytes + a 2-D gather at per-row slice edges —
    no per-row Python loop. Chunk sums are exact float64 integers
    (< 2^53), so the means are bit-identical to the per-row formulation.
    Shape-compatible with a real embedding extractor."""
    n = len(payload)
    if n == 0:
        return np.zeros((0, dim), dtype=np.float64)
    lens = np.fromiter((len(b) for b in payload), np.int64, count=n)
    buf = np.frombuffer(b"".join(payload), dtype=np.uint8)
    csum = np.concatenate(([0.0], np.cumsum(buf, dtype=np.float64)))
    starts = np.concatenate(([0], np.cumsum(lens)))[:-1]
    k = np.arange(dim + 1, dtype=np.int64)
    edges = starts[:, None] + (k[None, :] * lens[:, None]) // dim
    widths = np.diff(edges, axis=1)
    sums = np.diff(csum[edges], axis=1)
    return np.where(widths > 0, sums / np.maximum(widths, 1), 0.0)


def extract_features(
    media: DataFrame, batch_size: int | None = None, decoder: str = "fake"
) -> DataFrame:
    """mapInPandas feature extraction over Arrow batches. The iterator
    signature streams batches — worker memory stays O(batch), independent of
    partition size.

    `decoder` picks the kernel: "fake" (deterministic byte-statistics stub —
    the oracle-checkable default in this codec-less container) or "pil"
    (real image decode via :func:`pil_decode_features`; payloads must be
    encoded images and PIL importable on the workers).

    `batch_size` tunes `spark.sql.execution.arrow.maxRecordsPerBatch` for
    multi-MB payload corpora (256 rows x 4 MB payloads ~= 1 GB per batch
    otherwise). It is a SESSION-wide conf — Spark has no per-operator knob —
    so it is only touched when explicitly requested; silently pinning it
    here degraded every later Arrow-batched operator in the session (the
    default 10k-row batches are right for the fixture's ~300-byte
    payloads)."""
    if decoder not in ("fake", "pil"):
        raise ValueError(f"unknown decoder {decoder!r}; use 'fake' or 'pil'")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if decoder == "pil":
                ws, hs, feats = pil_decode_features(pdf["payload"].to_numpy())
            else:
                feats = fake_decode_features(pdf["payload"].to_numpy())
                # stubbed decode: dimensions derived deterministically
                ws = (pdf["n_bytes"] % 640).astype("int32")
                hs = (pdf["n_bytes"] % 480).astype("int32")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["n_bytes"],
                    "width": ws,
                    "height": hs,
                    "features": list(feats),
                }
            )

    if batch_size is not None:
        media.sparkSession.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_size)
        )
    # Decode cost is per-payload, not per-byte: widen a narrow scan so the
    # Arrow batches spread across cores (no-op on an already-wide input).
    return widen_if_narrow(media).mapInPandas(run, FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """'Frame sampling' plumbing: explode a payload into fixed-stride chunk
    offsets (what video frame extraction produces), all built-in — the
    payload itself is only sliced, never shuffled."""
    return media.select(
        "media_id",
        F.posexplode(
            F.transform(
                F.sequence(
                    F.lit(0),
                    F.greatest(
                        (F.col("n_bytes") / every_n_bytes).cast("int") - 1, F.lit(0)
                    ),
                ),
                lambda i: i * every_n_bytes,
            )
        ).alias("frame_idx", "byte_offset"),
    )


#: Signature width for the perceptual hashes — 60 bits (not 64) so the
#: integer signature stays positive in an int64 and a SQL engine can
#: rebuild it with plain `1 << j` arithmetic (the q26 portable-SimHash
#: contract); 4 x 15-bit bands give pigeonhole-complete candidate
#: recall at hamming <= 3.
PERCEPTUAL_HASH_BITS = 60

SIGNATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("ahash", LongType()),
        StructField("dhash", LongType()),
    ]
)


def ahash_dhash_kernel(payload: np.ndarray, d: int = PERCEPTUAL_HASH_BITS):
    """Batch perceptual hashes over the deterministic stub decode: the
    payload is split into `d` equal byte chunks (the fake_decode_features
    edge grid), then

    - aHash bit j = 1 iff chunk j's mean byte value exceeds the payload
      mean (cross-multiplied: chunk_sum*L > total_sum*chunk_len — pure
      int64, no division, so any engine replays it bit-for-bit);
    - dHash bit j = 1 iff chunk j's mean exceeds chunk j+1's mean
      (gradient sign, d-1 bits) — the classic dHash shape over the 1-D
      stub "image".

    Fully vectorized (one cumsum over the batch's concatenated bytes +
    a 2-D gather at per-row edges — the fake_decode_features recipe with
    integer accumulators). Empty payloads hash to 0. int64-safe for
    payloads up to ~1.5e9 bytes (255*L^2 < 2^63); a real image corpus
    swaps this kernel for a PIL decode + 8x8 downsample with the same
    signature contract."""
    n = len(payload)
    if n == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z
    lens = np.fromiter((len(b) for b in payload), np.int64, count=n)
    buf = np.frombuffer(b"".join(payload), dtype=np.uint8)
    csum = np.concatenate(([0], np.cumsum(buf, dtype=np.int64)))
    starts = np.concatenate(([0], np.cumsum(lens)))[:-1]
    k = np.arange(d + 1, dtype=np.int64)
    edges = starts[:, None] + (k[None, :] * lens[:, None]) // d
    cl = np.diff(edges, axis=1)
    cs = np.diff(csum[edges], axis=1)
    ts = cs.sum(axis=1, keepdims=True)
    abits = (cs * lens[:, None]) > (ts * cl)
    dbits = (cs[:, :-1] * cl[:, 1:]) > (cs[:, 1:] * cl[:, :-1])
    w = np.int64(1) << np.arange(d, dtype=np.int64)
    return (abits * w).sum(axis=1), (dbits * w[:-1]).sum(axis=1)


def media_signatures(media: DataFrame) -> DataFrame:
    """Per-media perceptual signatures (aHash + dHash as int64) via the
    same Arrow-batched mapInPandas shape as :func:`extract_features`:
    a narrow map — binary payloads never cross a shuffle; only the
    (media_id, 2 x int64) signatures flow downstream to the dedup band
    join."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ah, dh = ahash_dhash_kernel(pdf["payload"].to_numpy())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["n_bytes"],
                    "ahash": ah,
                    "dhash": dh,
                }
            )

    return widen_if_narrow(media).mapInPandas(run, SIGNATURE_SCHEMA)


QUALITY_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("byte_entropy", DoubleType()),
        StructField("distinct_bytes", IntegerType()),
        StructField("printable_ratio", DoubleType()),
    ]
)


def byte_quality_kernel(payload: np.ndarray):
    """Vectorized per-payload byte statistics for one Arrow batch (the
    q94 entropy-kernel recipe on raw bytes): Shannon entropy in bits over
    the byte histogram, distinct byte count, and printable-ASCII (32-126)
    ratio. One concat + ONE np.unique over packed (row_index << 8 | byte)
    keys — valid because bytes < 2^8 — no per-row histogram loop. Empty
    payloads report 0/0/0.0. Entropy <= 8 bits always; a payload that is
    compressed/encrypted media sits near 8, text near 4-5 — the
    binary-vs-text triage every multimodal ingest runs before routing
    payloads to decoders."""
    n = len(payload)
    lens = np.fromiter((len(b) for b in payload), np.int64, count=n)
    ent = np.zeros(n, dtype=np.float64)
    dis = np.zeros(n, dtype=np.int32)
    pr = np.zeros(n, dtype=np.float64)
    if n == 0 or lens.sum() == 0:
        return lens, ent, dis, pr
    buf = np.frombuffer(b"".join(payload), dtype=np.uint8)
    doc = np.repeat(np.arange(n, dtype=np.uint64), lens)
    key = (doc << np.uint64(8)) | buf.astype(np.uint64)
    uniq, cnt = np.unique(key, return_counts=True)
    udoc = (uniq >> np.uint64(8)).astype(np.int64)
    ub = (uniq & np.uint64(0xFF)).astype(np.int64)
    p = cnt / lens[udoc]
    np.add.at(ent, udoc, -p * np.log2(p))
    np.add.at(dis, udoc, 1)
    printable = (ub >= 32) & (ub <= 126)
    np.add.at(pr, udoc[printable], cnt[printable])
    with np.errstate(invalid="ignore"):
        pr = np.where(lens > 0, pr / np.maximum(lens, 1), 0.0)
    return lens, ent, dis, pr


def media_byte_quality(media: DataFrame) -> DataFrame:
    """Per-media byte-quality table via the same narrow Arrow-batched
    mapInPandas shape as :func:`media_signatures` — payloads never cross
    a shuffle; only per-item scalars leave the scan."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            _, ent, dis, pr = byte_quality_kernel(pdf["payload"].to_numpy())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["n_bytes"],
                    "byte_entropy": ent,
                    "distinct_bytes": dis,
                    "printable_ratio": pr,
                }
            )

    return widen_if_narrow(media).mapInPandas(run, QUALITY_SCHEMA)
