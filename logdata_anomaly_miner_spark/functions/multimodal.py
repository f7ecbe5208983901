"""Multimodal column plumbing (north-star training-pipeline addition).

Media payloads are opaque ``binary`` columns with typed metadata:

    media_blobs(media_id string, media_kind string, payload binary,
                meta struct<width:int, height:int, duration_ms:int,
                            sample_rate:int, codec:string>)

Decode / feature-extraction runs as Arrow-batched ``mapInPandas`` so the
expensive per-blob work streams through Python in columnar batches without
materializing the whole partition. The actual image/audio decoding libraries
are NOT in this container, so the decode step is STUBBED:

- with ``fake=True`` (default) a deterministic hash-derived feature vector /
  frame set is produced — schema, partitioning, UDF signature, and batch
  shape are fully real and tested;
- with ``fake=False`` the stub raises NotImplementedError pointing at the
  integration seam where PIL/librosa/pyav would plug in.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id string, media_kind string, payload binary, "
    "meta struct<width:int, height:int, duration_ms:int, sample_rate:int, codec:string>"
)

FEATURE_DIM = 16
FEATURES_SCHEMA = f"media_id string, media_kind string, feature array<float>"
FRAMES_SCHEMA = "media_id string, frame_idx int, frame_payload binary"


def gen_media_blobs(spark: SparkSession, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = hash bytes) for tests."""
    h = F.sha2(F.concat(F.lit(seed), F.col("id").cast("string")), 256)
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("id") % 3 + 1).cast("int"),
    )
    return spark.range(n).select(
        F.format_string("m%06d", F.col("id")).alias("media_id"),
        kind.alias("media_kind"),
        F.to_binary(h, F.lit("hex")).alias("payload"),
        F.struct(
            (F.col("id") % 640 + 1).cast("int").alias("width"),
            (F.col("id") % 480 + 1).cast("int").alias("height"),
            (F.col("id") * 33 % 60000).cast("int").alias("duration_ms"),
            F.lit(16000).cast("int").alias("sample_rate"),
            F.lit("fake").alias("codec"),
        ).alias("meta"),
    )


def _fake_features(payload: bytes) -> np.ndarray:
    """Deterministic FEATURE_DIM-dim float vector from the payload digest."""
    d = hashlib.sha256(payload or b"").digest()
    arr = np.frombuffer(d[: FEATURE_DIM * 2], dtype=np.uint16).astype(np.float32)
    return arr / 65535.0


def extract_features(df: DataFrame, fake: bool = True) -> DataFrame:
    """payload -> feature vector via Arrow-batched mapInPandas.
    Real decoders plug in where NotImplementedError is raised."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real media decoding requires PIL/librosa/pyav - not in container"
                )
            feats = [
                _fake_features(p if p is not None else b"").tolist()
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_kind": pdf["media_kind"],
                    "feature": feats,
                }
            )

    return df.mapInPandas(fn, schema=FEATURES_SCHEMA)


def sample_frames(df: DataFrame, n_frames: int = 3, fake: bool = True) -> DataFrame:
    """video payload -> n deterministic 'frames' (byte slices in fake mode).
    Real frame extraction (pyav) plugs into the same batch shape."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError("real frame sampling requires pyav")
            ids, idxs, payloads = [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                blob = p if p is not None else b""
                for i in range(n_frames):
                    ids.append(mid)
                    idxs.append(i)
                    start = (i * 7) % max(len(blob) - 8, 1)
                    payloads.append(bytes(blob[start : start + 8]))
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_payload": payloads}
            )

    return df.filter(F.col("media_kind") == "video").mapInPandas(
        fn, schema=FRAMES_SCHEMA
    )


def media_feature_table(spark: SparkSession, blobs: DataFrame) -> DataFrame:
    """Features joined back to metadata — the table the similarity layer
    (functions/similarity.py) consumes for embedding-based dedup."""
    feats = extract_features(blobs)
    return feats.join(
        blobs.select("media_id", "meta"), "media_id", "left"
    )
