"""Multimodal column plumbing (training-data-pipeline extension).

Images/audio/video travel as opaque `binary` columns with typed metadata.
The Spark-side plumbing — schemas, batch shapes, partition-friendly
signatures — is real and tested; the actual codec work is stubbed behind
deterministic fakes because the sandbox has no image/audio libraries
(swap `_fake_decode` for PIL/ffmpeg calls in production).

Pattern: mapInPandas over (id, media, meta) so each Arrow batch carries
the raw bytes once; per-batch numpy work; output is a feature row per
asset (or per sampled frame).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (BinaryType, IntegerType, LongType, StringType,
                               StructField, StructType)

MEDIA_SCHEMA = StructType([
    StructField("asset_id", LongType()),
    StructField("kind", StringType()),        # image | audio | video
    StructField("media", BinaryType()),       # opaque encoded bytes
    StructField("width", IntegerType()),      # typed metadata
    StructField("height", IntegerType()),
    StructField("duration_ms", IntegerType()),
])

FEATURE_SCHEMA = (
    "asset_id long, kind string, n_bytes int, content_sha string, "
    "feat array<float>, frame_idx int"
)


def _fake_decode(data: bytes, dim: int = 8) -> np.ndarray:
    """Deterministic stand-in for decode + feature-extract: features are a
    seeded hash-expansion of the bytes. Replace with a real decoder
    (raises NotImplementedError if you need true pixels here)."""
    if data is None:
        raise NotImplementedError("real decode requires an image/audio codec")
    h = hashlib.sha256(data).digest()
    return (np.frombuffer(h[: dim * 4], dtype=np.uint32).astype(np.float32)
            / np.float32(2**32))


def extract_features(assets: DataFrame, frames_per_video: int = 3) -> DataFrame:
    """(asset_id, kind, media, ...) -> one feature row per asset (images/
    audio) or per sampled frame (video). Deterministic fake features."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:  # pragma: no cover
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                data = bytes(r.media) if r.media is not None else b""
                sha = hashlib.sha256(data).hexdigest()[:16]
                n_frames = frames_per_video if r.kind == "video" else 1
                for fi in range(n_frames):
                    feat = _fake_decode(data + fi.to_bytes(2, "big"))
                    rows.append(dict(asset_id=r.asset_id, kind=r.kind,
                                     n_bytes=len(data), content_sha=sha,
                                     feat=feat.tolist(), frame_idx=fi))
            yield pd.DataFrame(rows, columns=["asset_id", "kind", "n_bytes",
                                              "content_sha", "feat", "frame_idx"])

    return assets.mapInPandas(run, schema=FEATURE_SCHEMA)


def synth_assets(spark, n: int = 32) -> DataFrame:
    """Deterministic synthetic media table for tests (seeded bytes)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        blob = hashlib.sha256(f"asset-{i}".encode()).digest() * (4 + i % 3)
        rows.append((i, kind, bytearray(blob), 64 + i, 48 + i,
                     1000 * (i + 1) if kind != "image" else 0))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def dedupe_assets(assets: DataFrame) -> DataFrame:
    """Exact media dedup on content hash (binary columns hash JVM-side)."""
    h = assets.select("asset_id", F.sha2(F.col("media"), 256).alias("content_hash"))
    canon = h.groupBy("content_hash").agg(F.min("asset_id").alias("canonical_asset"))
    return h.join(canon, "content_hash").select("asset_id", "content_hash", "canonical_asset")
