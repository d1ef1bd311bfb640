"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The container ships no image/audio libraries, so the DECODE step is a
deterministic fake behind `decode_stub` (clearly marked; swap for
PIL/librosa/ffmpeg on a real cluster — the NotImplementedError path guards
accidental production use). Everything Spark-side is real and tested:
schema, Arrow batch shape, mapInPandas iterator contract, partition sizing.

Design for 100 TB of media:
- media rows are WIDE (MBs each): maxRecordsPerBatch is capped so one
  Arrow batch of decoded frames fits executor memory;
- feature extraction emits NARROW rows (url + feature vector) — project
  the binary away as early as possible so downstream shuffles never move
  payload bytes;
- mapInPandas (iterator of batches) not a scalar UDF: per-batch setup
  (model load, codec init) amortizes across the batch stream.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

MEDIA_SCHEMA = (
    "url string, media_type string, payload binary, width int, height int, "
    "duration_ms int"
)

FEATURE_DIM = 16

_REAL_DECODERS = False  # no PIL/librosa in this container


def decode_stub(payload: bytes, media_type: str) -> np.ndarray:
    """STUB decoder: deterministic fake features from the payload bytes.

    Replace with a real decode (PIL image -> pixels, librosa -> spectro)
    on a cluster with media libraries. Raises if someone flips the flag
    without providing a decoder.
    """
    if _REAL_DECODERS:
        raise NotImplementedError("wire a real decoder (PIL/librosa/ffmpeg) here")
    h = hashlib.sha256(payload or b"").digest()
    arr = np.frombuffer((h * ((FEATURE_DIM * 4) // len(h) + 1))[: FEATURE_DIM * 4],
                        dtype=np.uint32)
    return (arr % 1000).astype(np.float32) / 1000.0


def extract_features(media: DataFrame, batch_hint: int = 256) -> DataFrame:
    """Binary payload -> FEATURE_DIM float features via mapInPandas.

    The iterator contract lets per-partition init happen once; the output
    drops the payload (narrow rows out)."""

    out_schema = "url string, media_type string, n_bytes long, features array<float>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # per-partition init happens HERE (codec/model load in production)
        for pdf in batches:
            feats = [
                decode_stub(p if p is None or isinstance(p, bytes) else bytes(p), mt).tolist()
                for p, mt in zip(pdf["payload"], pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "url": pdf["url"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "features": feats,
                }
            )

    pruned = media.select("url", "media_type", "payload")
    return pruned.mapInPandas(run, schema=out_schema)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling PLAN: one output row per sampled timestamp
    (explode of a sequence — pure JVM); actual frame decode is the stub.
    Shows the row-explosion shape a real sampler would produce."""
    n_frames = (F.coalesce(F.col("duration_ms"), F.lit(0)) / every_ms).cast("int")
    return (
        media.where(F.col("media_type") == "video")
        .select(
            "url",
            F.explode(F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)))).alias(
                "frame_idx"
            ),
        )
        .withColumn("frame_ts_ms", F.col("frame_idx") * every_ms)
    )


def synth_media(spark, n_rows: int = 200, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (binary payloads + typed metadata)."""
    rng = np.random.default_rng(seed)
    types = ["image", "audio", "video"]
    rows = []
    for i in range(n_rows):
        mt = types[i % 3]
        payload = bytes(rng.integers(0, 256, size=64 + (i % 128), dtype=np.uint8))
        rows.append(
            (
                f"https://media.example.org/{mt}/{i}",
                mt,
                payload,
                64 if mt == "image" else None,
                64 if mt == "image" else None,
                3000 if mt == "video" else (1500 if mt == "audio" else None),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
