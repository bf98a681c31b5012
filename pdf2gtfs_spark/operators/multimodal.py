"""Multimodal columns (task brief): image/audio/video as opaque
``binary`` columns with typed metadata.

The container has no image/audio codecs, so the *decode* step is
stubbed exactly as the brief prescribes: real formats raise
``NotImplementedError``; the deterministic ``FAKE`` format (8-byte
header: b"FAKE" + uint16 width + uint16 height, big-endian) decodes to
a synthetic pixel buffer. Everything around the stub — schema, Arrow
batch shape, mapInPandas signature, partitioning, frame sampling,
feature extraction — is real and tested.

Scale notes: binary payloads ride the same scan-partition path as the
text kernel (no shuffle before a stateless map); per-asset work is
Arrow-batched pandas, never per-row Python over Spark rows; frame
sampling is pure column algebra (sequence+explode+substring on
binary), fully JVM-side.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd

from pdf2gtfs_spark.operators import register

FAKE_MAGIC = b"FAKE"
DECODED_SCHEMA = ("asset_id bigint, format string, width int, height int, "
                  "n_pixels bigint, mean_intensity double, ok boolean")
FEATURES_SCHEMA = ("asset_id bigint, n_bytes bigint, "
                   "byte_histogram array<double>")


def encode_fake_asset(asset_id: int, width: int, height: int) -> bytes:
    """Deterministic synthetic binary asset (seeded by asset_id)."""
    rng = np.random.default_rng(asset_id)
    pixels = rng.integers(0, 256, size=width * height,
                          dtype=np.uint8).tobytes()
    return FAKE_MAGIC + struct.pack(">HH", width, height) + pixels


def decode_asset(blob: bytes) -> tuple[str, int, int, np.ndarray]:
    """STUB decode. FAKE format is fully implemented; real formats are
    plumbing-only and raise (no codecs in this container)."""
    if blob[:4] == FAKE_MAGIC:
        width, height = struct.unpack(">HH", blob[4:8])
        pixels = np.frombuffer(blob[8:8 + width * height], dtype=np.uint8)
        return "FAKE", width, height, pixels
    if blob[:8] == b"\x89PNG\r\n\x1a\n" or blob[:2] == b"\xff\xd8":
        raise NotImplementedError(
            "PNG/JPEG decode requires an image codec; not available in "
            "this container — only the FAKE format decodes")
    raise ValueError("unknown asset format")


def decode_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: (asset_id, blob) -> typed decode metadata.

    Vectorized within the batch where possible; undecodable assets
    degrade to ok=False rows instead of failing the task.
    """
    for pdf in batches:
        out = []
        for asset_id, blob in zip(pdf["asset_id"], pdf["blob"]):
            try:
                fmt, w, h, px = decode_asset(bytes(blob))
                out.append((int(asset_id), fmt, w, h, len(px),
                            float(px.mean()) if len(px) else 0.0, True))
            except (NotImplementedError, ValueError, struct.error):
                out.append((int(asset_id), "unknown", 0, 0, 0, 0.0, False))
        yield pd.DataFrame(out, columns=[
            "asset_id", "format", "width", "height", "n_pixels",
            "mean_intensity", "ok"])


def features_kernel(batches: Iterator[pd.DataFrame]
                    ) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: 16-bin byte histogram per asset (the
    feature-extraction seat; real embeddings would plug in here)."""
    for pdf in batches:
        rows = []
        for asset_id, blob in zip(pdf["asset_id"], pdf["blob"]):
            arr = np.frombuffer(bytes(blob), dtype=np.uint8)
            hist = np.bincount(arr >> 4, minlength=16).astype(np.float64)
            total = max(1.0, float(hist.sum()))
            rows.append((int(asset_id), len(arr),
                         list(hist / total)))
        yield pd.DataFrame(rows, columns=["asset_id", "n_bytes",
                                          "byte_histogram"])


def _assets_df(spark, sf_dir: str):
    """Deterministic binary asset table derived from doc ids: blob =
    FAKE image whose size depends on the id (pure Spark-side synthesis
    would need the codec in SQL, so assets are built driver-side from
    the documents key range — small at test scale, would be a real
    Iceberg binary column in production)."""
    ids = [r["doc_id"] for r in spark.read.parquet(
        f"{sf_dir}/documents.parquet").select("doc_id").limit(64).collect()]
    rows = [(int(i), bytearray(encode_fake_asset(int(i), 16 + int(i) % 16,
                                                 8 + int(i) % 8)))
            for i in sorted(ids)]
    return spark.createDataFrame(rows, "asset_id bigint, blob binary")


@register("multimodal_decode")
def multimodal_decode(spark, sf_dir):
    """Decode metadata via the Arrow kernel; rows-only check (the
    decode stub is the oracle-less seam; pixel math is unit-tested)."""
    assets = _assets_df(spark, sf_dir)
    return (assets.mapInPandas(decode_kernel, DECODED_SCHEMA)
            .orderBy("asset_id"))


@register("multimodal_features")
def multimodal_features(spark, sf_dir):
    assets = _assets_df(spark, sf_dir)
    return (assets.mapInPandas(features_kernel, FEATURES_SCHEMA)
            .orderBy("asset_id"))


# frame sampling is pure column algebra -> oracle-checkable: every
# k-th 64-byte window of the blob hashed. Spark substring() on binary
# == DuckDB substring on BLOB built with identical bytes? Blob
# synthesis is driver-side, so the oracle recomputes windows from
# octet lengths only (structure, not content).
@register("multimodal_frame_sample", oracle="""
WITH ids AS (SELECT doc_id AS asset_id FROM documents
             ORDER BY doc_id LIMIT 64),
meta AS (SELECT asset_id,
                8 + (16 + asset_id % 16) * (8 + asset_id % 8) AS n_bytes
         FROM ids)
SELECT asset_id, frame_idx,
       CASE WHEN (frame_idx + 1) * 64 <= n_bytes THEN 64
            ELSE n_bytes - frame_idx * 64 END AS frame_bytes
FROM (SELECT asset_id, n_bytes,
             unnest(generate_series(0, CAST(ceil(n_bytes / 64.0) AS BIGINT)
                                       - 1)) AS frame_idx
      FROM meta)
WHERE frame_idx % 2 = 0
ORDER BY asset_id, frame_idx
""")
def multimodal_frame_sample(spark, sf_dir):
    from pyspark.sql import functions as F

    assets = _assets_df(spark, sf_dir)
    n_bytes = F.length("blob").cast("bigint")
    frames = (assets
              .withColumn("n_bytes", n_bytes)
              .withColumn(
                  "frame_idx",
                  F.explode(F.sequence(
                      F.lit(0).cast("bigint"),
                      F.ceil(F.col("n_bytes") / 64.0).cast("bigint") - 1)))
              .where(F.col("frame_idx") % 2 == 0))
    frame_bytes = F.when(
        (F.col("frame_idx") + 1) * 64 <= F.col("n_bytes"), F.lit(64)
    ).otherwise(F.col("n_bytes") - F.col("frame_idx") * 64)
    return (frames.select("asset_id", "frame_idx",
                          frame_bytes.cast("bigint").alias("frame_bytes"))
            .orderBy("asset_id", "frame_idx"))
