"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Codec status (round 3): PNG, BMP and baseline JPEG image decode,
nearest-neighbor resize, and WAV audio decode are REAL, stdlib-only
implementations (operators/media_codecs.py + jpeg_codec.py — zlib+
struct for PNG, huffman+IDCT from the T.81 spec for JPEG, the wave
module for audio). MP3/MP4 genuinely require codec libraries this
container doesn't ship; those paths keep the deterministic fake decoder
(stable pseudo-content from the bytes hash) so the full Spark data path
stays testable, and real-codec calls on unsupported bytes are a ROW
outcome (null features), never a task failure.

Design for 100 TB: media bytes NEVER shuffle — every operator here is a
narrow mapInPandas producing compact features (dims, hashes, frame
samples as offsets); joins downstream happen on the feature columns.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
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


def decode_image(payload: bytes) -> dict:
    """REAL decode for PNG, BMP and baseline JPEG (stdlib codecs, see
    media_codecs.py / jpeg_codec.py); mean_luma from actual pixel data.
    WebP/AVIF genuinely need codec libraries absent from this container
    — those bytes raise ValueError (callers map to a decode-failure
    row, never a task failure)."""
    from .media_codecs import decode_image_bytes

    d = decode_image_bytes(payload)
    px = d["pixels"].astype(np.float64)
    luma = px.mean() / 255.0 if px.size else 0.0
    return {
        "width": d["width"],
        "height": d["height"],
        "n_channels": d["n_channels"],
        "mean_luma": float(luma),
    }


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
                try:
                    f = decode(raw)
                except ValueError:
                    # pixel decode unavailable — but WebP DIMENSIONS are
                    # plain header fields (media_meta): metadata-real,
                    # luma honestly null
                    try:
                        from .media_meta import parse_webp

                        m = parse_webp(raw)
                        f = {"width": m["width"], "height": m["height"],
                             "n_channels": None, "mean_luma": None}
                    except ValueError:  # undecodable: a row outcome
                        f = {"width": None, "height": None,
                             "n_channels": None, "mean_luma": None}
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

    use_fake_codec=True: duration derived from the payload hash.
    use_fake_codec=False: the REAL mp4 box structure is parsed
    (media_meta.parse_mp4 — mvhd duration), so sample COUNT and
    timestamps are genuine; frame PIXELS would need an H.264 decoder
    the container doesn't ship, so frame_hash stays a deterministic
    digest of (bytes, ts) — the plumbing contract, honestly labeled.
    Unparseable bytes contribute zero rows (a row outcome)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .media_meta import parse_mp4  # once per task, not per row

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload) if payload is not None else b""
                if use_fake_codec:
                    d = hashlib.sha256(raw).digest()
                    duration_ms = 500 + int.from_bytes(d[:2], "big") * 4
                else:
                    try:
                        duration_ms = parse_mp4(raw)["duration_ms"]
                    except ValueError:
                        continue  # undecodable: no frames for this row
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


AUDIO_FEATURES_DDL = (
    "media_id string, sample_rate int, n_channels int, n_frames long, "
    "duration_ms long, rms double"
)


def audio_features(df: DataFrame) -> DataFrame:
    """Per-clip audio features: REAL WAV decode (stdlib wave module,
    sample-accurate rms), REAL FLAC-subset decode (flac_codec.py —
    bit-exact, CRC+md5-verified, sample-accurate rms), or REAL MP3
    frame-header walk (media_meta: duration/rate/channels from every
    frame header; rms honestly null — MP3 PCM needs a codec library).
    Undecodable payloads yield null features (decode failure is a row
    outcome, not a task failure). Media bytes never shuffle."""
    from .flac_codec import decode_flac
    from .media_codecs import decode_wav
    from .media_meta import parse_mp3

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload) if payload is not None else b""
                try:
                    f = decode_wav(raw)
                    rows.append({"media_id": mid, **{k: f[k] for k in (
                        "sample_rate", "n_channels", "n_frames",
                        "duration_ms", "rms")}})
                    continue
                except ValueError:
                    pass
                try:
                    a = decode_flac(raw)
                    s = a["samples"].astype(np.float64) / 32768.0
                    rows.append({
                        "media_id": mid, "sample_rate": a["rate"],
                        "n_channels": a["channels"],
                        "n_frames": a["n_samples"],
                        "duration_ms": int(
                            a["n_samples"] * 1000 / a["rate"]
                        ) if a["rate"] else 0,
                        "rms": float(np.sqrt(np.mean(s * s)))
                        if s.size else 0.0,
                    })
                    continue
                except ValueError:
                    pass
                try:
                    m = parse_mp3(raw)
                    rows.append({
                        "media_id": mid, "sample_rate": m["sample_rate"],
                        "n_channels": m["channels"],
                        "n_frames": m["n_frames"],
                        "duration_ms": m["duration_ms"], "rms": None,
                    })
                except ValueError:
                    rows.append({
                        "media_id": mid, "sample_rate": None,
                        "n_channels": None, "n_frames": None,
                        "duration_ms": None, "rms": None,
                    })
            yield pd.DataFrame(rows)

    return df.select("media_id", "payload").mapInPandas(
        op, schema=AUDIO_FEATURES_DDL
    )


RESIZED_DDL = "media_id string, out_w int, out_h int, out_hash string"


def resize_images(df: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """REAL pixel resize (nearest-neighbor over decoded PNG/BMP arrays);
    emits the resized-content hash, never the pixels — at 100 TB the
    resized artifacts would be WRITTEN per-partition, not collected."""
    from .media_codecs import decode_image_bytes, resize_nearest

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload) if payload is not None else b""
                try:
                    d = decode_image_bytes(raw)
                    out = resize_nearest(d["pixels"], target_w, target_h)
                    rows.append({
                        "media_id": mid, "out_w": int(out.shape[1]),
                        "out_h": int(out.shape[0]),
                        "out_hash": "sha256:"
                        + hashlib.sha256(out.tobytes()).hexdigest(),
                    })
                except ValueError:
                    rows.append({
                        "media_id": mid, "out_w": None, "out_h": None,
                        "out_hash": None,
                    })
            yield pd.DataFrame(rows)

    return df.select("media_id", "payload").mapInPandas(op, schema=RESIZED_DDL)


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
