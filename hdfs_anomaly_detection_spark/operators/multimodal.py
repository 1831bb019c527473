"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images / audio / video ride as ``binary`` columns with a struct of
metadata; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` operators. The decode step itself is
STUBBED (no image/audio libs in this container): ``decode_stub``
produces a deterministic fake feature vector from the bytes so the
Spark-side plumbing — schema, partition sizing, UDF signature, batch
shape — is real and testable end-to-end, and a real decoder slots in
by replacing one function.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id bigint, kind string, payload binary, "
    "meta struct<width:int, height:int, duration_ms:int, codec:string>"
)
FEATURE_SCHEMA = "media_id bigint, kind string, n_bytes int, feature array<float>"


def synthesize_media(spark, n: int = 256, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (binary payload = seeded bytes)."""
    kinds = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        F.pmod(F.col("id"), F.lit(3)).cast("int") + 1,
    )
    payload = F.unhex(F.sha2(F.concat(F.lit(str(seed)), F.col("id").cast("string")), 256))
    meta = F.struct(
        (F.pmod(F.col("id"), F.lit(16)) * 64 + 64).cast("int").alias("width"),
        (F.pmod(F.col("id"), F.lit(9)) * 64 + 64).cast("int").alias("height"),
        (F.pmod(F.col("id"), F.lit(100)) * 250).cast("int").alias("duration_ms"),
        F.lit("stub").alias("codec"),
    )
    return spark.range(n).select(
        F.col("id").alias("media_id"), kinds.alias("kind"),
        payload.alias("payload"), meta.alias("meta"),
    )


def decode_stub(payload: bytes, dim: int = 8) -> np.ndarray:
    """Deterministic fake 'decode': bytes → unit-norm float vector.
    Replace with a real decoder (PIL/librosa/ffmpeg) in production;
    raising NotImplementedError here would be the other documented
    choice — we prefer a deterministic fake so tests assert values."""
    h = hashlib.sha256(payload or b"").digest()
    v = np.frombuffer(h[: dim * 4], dtype=np.uint32).astype(np.float64)
    v = v / np.linalg.norm(v)
    return v.astype(np.float32)


def extract_features(
    media: DataFrame,
    decoder: Callable[[bytes], np.ndarray] = decode_stub,
    batch_size_hint: int = 1024,
) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    The per-batch loop is the real shape a GPU/CPU decoder needs
    (amortized model load per batch, bounded memory per task)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decoder(p).tolist() if p is not None else None for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(lambda b: len(b) if b is not None else 0),
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling PLAN: explode per-media timestamps to sample
    (pure Catalyst; the actual frame grab would happen in the decoder).
    Returns (media_id, frame_ts_ms)."""
    n_frames = F.greatest((F.col("meta.duration_ms") / every_ms).cast("int"), F.lit(1))
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.transform(F.sequence(F.lit(0), n_frames - 1), lambda i: i * every_ms)
            ).alias("frame_ts_ms"),
        )
    )
