"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed in Arrow-batched ``mapInPandas`` stages.

The decode kernels themselves need codec libraries that are NOT in this
environment, so each kernel has two modes:
  - ``deterministic_fake`` (default in tests): a seeded, shape-correct
    stand-in so the Spark-side plumbing — schema, batching, partitioning,
    UDF signatures — is real and testable.
  - real mode: raises NotImplementedError with the dependency named.

At scale the binary payloads dominate I/O: keep them in their own parquet
column (never in the shuffle key), process with mapInPandas so each Arrow
batch holds few rows (binary-heavy), and carry only extracted features
forward.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), True),
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
    ]
)

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("feature", ArrayType(FloatType()), False),
        StructField("n_bytes", LongType(), False),
    ]
)


def _fake_feature(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in feature: seeded by content digest."""
    digest = hashlib.sha256(payload or b"").digest()
    seed = int.from_bytes(digest[:4], "little")
    rng = np.random.RandomState(seed)
    return rng.normal(size=dim).astype(np.float32)


def extract_features(
    media: DataFrame,
    dim: int = 64,
    deterministic_fake: bool = True,
    batch_rows: int = 32,
) -> DataFrame:
    """media (MEDIA_SCHEMA) -> (media_id, feature[dim], n_bytes).

    Real mode would decode (PIL/ffmpeg) + embed; not available here.
    """
    if not deterministic_fake:
        raise NotImplementedError(
            "real decode requires pillow/ffmpeg/torchvision — not installed "
            "in this environment; use deterministic_fake=True"
        )

    def _extract(batches):
        for pdf in batches:
            feats = [
                _fake_feature(p, dim).tolist() for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "feature": feats,
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                }
            )

    return (
        media.select("media_id", "payload")
        .mapInPandas(_extract, schema=FEATURES_SCHEMA)
    )


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("frame_feature", ArrayType(FloatType()), False),
    ]
)


def sample_frames(
    video: DataFrame,
    every_ms: int = 1000,
    dim: int = 32,
    deterministic_fake: bool = True,
) -> DataFrame:
    """video rows -> one feature row per sampled frame (1 row in, N out —
    the mapInPandas fan-out shape for frame extraction)."""
    if not deterministic_fake:
        raise NotImplementedError(
            "real frame sampling requires ffmpeg — not installed; "
            "use deterministic_fake=True"
        )

    def _frames(batches):
        for pdf in batches:
            ids, idxs, feats = [], [], []
            for mid, payload, dur in zip(
                pdf["media_id"], pdf["payload"], pdf["duration_ms"]
            ):
                n_frames = max(1, int((dur or 0) // every_ms))
                for i in range(n_frames):
                    ids.append(mid)
                    idxs.append(i)
                    feats.append(
                        _fake_feature((payload or b"") + i.to_bytes(4, "little"), dim).tolist()
                    )
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_feature": feats}
            )

    return (
        video.select("media_id", "payload", "duration_ms")
        .mapInPandas(_frames, schema=FRAME_SCHEMA)
    )
