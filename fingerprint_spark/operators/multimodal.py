"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is REAL and tested: schemas, Arrow batch shapes,
mapInPandas signatures, partition sizing. The codec layer is STUBBED —
this container ships no image/audio libraries, so ``decode_image`` etc.
raise NotImplementedError unless the deterministic fake decoder is
selected (the fake derives stable pseudo-content from the bytes hash so
pipelines and tests exercise the full data path).

Design for 100 TB: media bytes NEVER shuffle — every operator here is a
narrow mapInPandas producing compact features (dims, hashes, frame
samples as offsets); joins downstream happen on the feature columns.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),       # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.MapType(T.StringType(), T.StringType()),
            True,
        ),
    ]
)

IMAGE_FEATURES_DDL = (
    "media_id string, width int, height int, n_channels int, "
    "content_hash string, mean_luma double"
)

FRAME_SAMPLE_DDL = (
    "media_id string, frame_index int, frame_ts_ms long, frame_hash string"
)


def decode_image(payload: bytes):  # pragma: no cover - stub
    """STUB: real decode requires an image library not present in this
    container. Wire Pillow/opencv here on a real cluster."""
    raise NotImplementedError(
        "image codec not available in this environment; "
        "use fake_decode_image for the deterministic test path"
    )


def fake_decode_image(payload: bytes) -> dict:
    """Deterministic fake decoder: stable pseudo-dimensions and luma from
    the payload digest. Keeps the full Spark data path testable."""
    d = hashlib.sha256(payload or b"").digest()
    return {
        "width": 64 + d[0] * 8,
        "height": 64 + d[1] * 8,
        "n_channels": 1 + (d[2] % 4),
        "mean_luma": d[3] / 255.0,
    }


def image_features(
    df: DataFrame, use_fake_codec: bool = True, batch_hint: int = 256
) -> DataFrame:
    """binary payload -> compact feature rows (mapInPandas, Arrow
    batches). Output carries NO media bytes."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decode = fake_decode_image if use_fake_codec else decode_image
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload) if payload is not None else b""
                f = decode(raw)
                rows.append(
                    {
                        "media_id": mid,
                        "width": f["width"],
                        "height": f["height"],
                        "n_channels": f["n_channels"],
                        "content_hash": "sha256:" + hashlib.sha256(raw).hexdigest(),
                        "mean_luma": f["mean_luma"],
                    }
                )
            yield pd.DataFrame(rows)

    return df.select("media_id", "payload").mapInPandas(
        op, schema=IMAGE_FEATURES_DDL
    )


def resize_plan(df: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Resize as plumbing: computes the scale plan (JVM exprs over the
    feature columns); the pixel transform itself is the stubbed codec."""
    return df.select(
        "media_id",
        "width",
        "height",
        F.least(
            F.lit(target_w) / F.col("width"), F.lit(target_h) / F.col("height")
        ).alias("scale"),
        F.lit(target_w).alias("target_w"),
        F.lit(target_h).alias("target_h"),
    )


def frame_sample(
    df: DataFrame,
    every_ms: int = 1000,
    max_frames: int = 8,
    use_fake_codec: bool = True,
) -> DataFrame:
    """Video frame sampling plumbing: one output row per sampled frame.
    The fake codec derives a deterministic duration from the payload hash
    and emits frame digests; a real codec plugs into the same shape."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if not use_fake_codec:  # pragma: no cover - stub
            raise NotImplementedError("video codec not available")
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload) if payload is not None else b""
                d = hashlib.sha256(raw).digest()
                duration_ms = 500 + int.from_bytes(d[:2], "big") * 4
                n = min(max_frames, max(1, duration_ms // every_ms))
                for i in range(n):
                    ts = i * every_ms
                    fh = hashlib.sha256(raw + ts.to_bytes(8, "big")).hexdigest()[:16]
                    rows.append(
                        {
                            "media_id": mid,
                            "frame_index": i,
                            "frame_ts_ms": ts,
                            "frame_hash": fh,
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "frame_index", "frame_ts_ms", "frame_hash"],
            )

    return df.select("media_id", "payload").mapInPandas(op, schema=FRAME_SAMPLE_DDL)


def synth_media(spark, n: int, kind: str = "image") -> DataFrame:
    """Deterministic synthetic media table matching MEDIA_SCHEMA."""
    rows = []
    for i in range(n):
        payload = hashlib.sha256(f"{kind}-{i}".encode()).digest() * 32
        rows.append(
            (
                f"{kind}-{i:06d}",
                kind,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                payload,
                {"source": "synthetic", "idx": str(i)},
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
