"""Multimodal columns: image/audio/video as opaque `binary` + typed
metadata, processed through Arrow-batched kernels.

The decode step itself is STUBBED (no image/audio libraries in this
container): `decode_image` raises NotImplementedError unless
`fake=True`, in which case a clearly-marked deterministic fake decoder
(bytes → pseudo-pixel stats) exercises the REAL Spark plumbing —
schema, batching, partitioning, UDF signatures — end to end.  Swapping
the fake for Pillow/ffmpeg is a one-function change on a cluster that
has them.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),        # image|audio|video
    T.StructField("payload", T.BinaryType(), True),      # opaque bytes
    T.StructField("mime", T.StringType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_ms", T.IntegerType(), True),
])

FEATURES_SCHEMA = (
    "media_id long, kind string, n_bytes int, sha256 string,"
    " feat array<float>, decode_status string"
)


def decode_image(payload: bytes, *, fake: bool = False) -> np.ndarray:
    """STUB: real decode needs an image library not present here.

    fake=True → deterministic pseudo-decode: bytes are hashed into a
    fixed 8-dim feature vector.  The distribution plumbing around this
    call is real and tested."""
    if not fake:
        raise NotImplementedError(
            "image decode requires Pillow/opencv — not available in this "
            "container; pass fake=True for the deterministic stub"
        )
    digest = hashlib.sha256(payload or b"").digest()
    # float64 mean then a single float32 cast: feat[j] =
    # f32((d[j]+d[8+j]+d[16+j]+d[24+j]) / 4 / 255) — exact integer sums
    # in f64, so any engine doing the same double arithmetic + one
    # narrowing cast reproduces the value bit-for-bit (the driver
    # oracle does, in SQL)
    d = np.frombuffer(digest, dtype=np.uint8).astype(np.float64)
    return (d.reshape(4, 8).mean(axis=0) / 255.0).astype(np.float32)


def extract_features(media: DataFrame, *, fake: bool = True) -> DataFrame:
    """mapInPandas feature extraction over binary payloads: Arrow ships
    the bytes in batches; the kernel is pure per-batch NumPy."""

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in it:
            feats, shas, status = [], [], []
            for payload in batch["payload"].values:
                raw = bytes(payload) if payload is not None else b""
                shas.append(hashlib.sha256(raw).hexdigest())
                try:
                    feats.append([float(x) for x in decode_image(raw, fake=fake)])
                    status.append("ok")
                except NotImplementedError:
                    feats.append(None)
                    status.append("decoder_unavailable")
            yield pd.DataFrame({
                "media_id": batch["media_id"].astype("int64"),
                "kind": batch["kind"],
                "n_bytes": batch["payload"].map(
                    lambda p: len(p) if p is not None else 0).astype("int32"),
                "sha256": shas,
                "feat": feats,
                "decode_status": status,
            })

    return media.select("media_id", "kind", "payload").mapInPandas(
        kernel, schema=FEATURES_SCHEMA
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per frame to decode
    (media_id, frame_idx, ts_ms) — the explode that fans a video row out
    to per-frame work items, partition-balanced by hashing frame keys.
    The actual frame decode is the stubbed kernel above."""
    n_frames = (F.col("duration_ms") / every_ms).cast("int")
    return (
        media.where(F.col("kind") == "video")
        .where(F.col("duration_ms").isNotNull() & (F.col("duration_ms") > 0))
        .select(
            "media_id",
            F.explode(F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0))))
            .alias("frame_idx"),
        )
        .withColumn("ts_ms", F.col("frame_idx") * every_ms)
        .repartition(F.col("media_id"), F.col("frame_idx"))
    )


def synth_media(spark, n: int = 64, seed: int = 5) -> DataFrame:
    """Deterministic fake media table for tests."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        payload = bytes(rng.integers(0, 256, size=int(rng.integers(64, 512)),
                                     dtype=np.uint8))
        rows.append((
            i, kind, payload, f"application/x-{kind}",
            int(rng.integers(16, 256)) if kind == "image" else None,
            int(rng.integers(16, 256)) if kind == "image" else None,
            int(rng.integers(1000, 20000)) if kind == "video" else None,
        ))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
