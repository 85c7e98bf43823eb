"""struct-check, multimodal plumbing, and witness ledger tests."""

import pytest
from pyspark.sql import functions as F

from fingerprint_spark.operators.multimodal import (
    decode_image,
    frame_sample,
    image_features,
    resize_plan,
    synth_media,
)
from fingerprint_spark.operators.structcheck import StructRule, struct_check
from fingerprint_spark.witness import (
    append_witness,
    count_witness,
    last_witness,
    query_witness,
)


def test_struct_check_outcomes(spark):
    manifest = spark.createDataFrame(
        [
            ("/data/deal_a/report.pdf",),
            ("/data/deal_a/summary.csv",),
            ("/data/deal_a/notes.txt",),       # unexpected
            ("/data/deal_b/report.pdf",),       # partial: no csv
            ("/data/deal_c/other.bin",),        # empty: nothing required
            ("/other/x/report.pdf",),           # not selected by group_by
        ],
        ["path"],
    )
    rules = [
        StructRule(
            name="deal_complete",
            group_by="/data/deal_*",
            required=("*.pdf", "*.csv"),
            allowed=(),
        )
    ]
    out = {r["dir"]: r for r in struct_check(manifest, rules).collect()}
    assert set(out) == {"/data/deal_a", "/data/deal_b", "/data/deal_c"}
    assert out["/data/deal_a"]["outcome"] == "complete"
    assert out["/data/deal_a"]["unexpected"] == ["notes.txt"]
    assert out["/data/deal_b"]["outcome"] == "partial"
    assert out["/data/deal_b"]["missing"] == ["*.csv"]
    assert out["/data/deal_c"]["outcome"] == "empty"


def test_image_features_plumbing(spark):
    media = synth_media(spark, 20, "image")
    feats = image_features(media).collect()
    assert len(feats) == 20
    for r in feats:
        assert r["width"] >= 64 and r["height"] >= 64
        assert 1 <= r["n_channels"] <= 4
        assert r["content_hash"].startswith("sha256:")
    # deterministic: same payloads -> same features
    again = image_features(synth_media(spark, 20, "image")).collect()
    assert sorted(map(tuple, feats)) == sorted(map(tuple, again))
    # resize plan is pure JVM over features
    plan = resize_plan(image_features(media), 224, 224).collect()
    assert all(0 < r["scale"] <= 224 / 64 for r in plan)


def test_frame_sample_plumbing(spark):
    media = synth_media(spark, 5, "video")
    frames = frame_sample(media, every_ms=1000, max_frames=4).collect()
    assert len(frames) > 5  # multiple frames per video
    by_media = {}
    for r in frames:
        by_media.setdefault(r["media_id"], []).append(r)
    for mid, rows in by_media.items():
        idxs = sorted(r["frame_index"] for r in rows)
        assert idxs == list(range(len(idxs)))


def test_real_codec_decodes_png_and_rejects_unknown():
    """decode_image is REAL for png/bmp (stdlib codecs) and raises
    ValueError (a row-level decode failure upstream) for formats that
    genuinely need codec libraries."""
    import numpy as np

    from fingerprint_spark.operators.media_codecs import encode_png

    f = decode_image(encode_png(np.full((4, 6, 3), 90, dtype=np.uint8)))
    assert (f["width"], f["height"], f["n_channels"]) == (6, 4, 3)
    assert abs(f["mean_luma"] - 90 / 255) < 1e-9
    with pytest.raises(ValueError):
        decode_image(b"bytes")


def test_witness_ledger(spark, tmp_path):
    path = str(tmp_path / "witness.jsonl")
    append_witness("run", {"sf": "0.01"}, {"rules": ["a.v1"]}, "OK", path=path)
    append_witness("run", {"sf": "0.1"}, {"rules": ["a.v1"]}, "PARTIAL", path=path)
    append_witness("infer", {"dir": "x"}, {}, "INFERRED", path=path)

    assert count_witness(spark, path=path) == 3
    assert count_witness(spark, path=path, tool="run") == 2
    assert count_witness(spark, path=path, outcome="PARTIAL") == 1
    last = last_witness(spark, tool="infer", path=path)
    assert last["outcome"] == "INFERRED"
    q = query_witness(spark, tool="run", outcome="OK", path=path).collect()
    assert len(q) == 1 and q[0]["inputs"]["sf"] == "0.01"


# ---------------------------------------------------------------------------
# REAL stdlib media codecs (round 2): PNG/BMP decode, resize, WAV audio
# ---------------------------------------------------------------------------


def test_png_roundtrip_and_filters():
    """encode_png -> decode_png roundtrips exact pixels for gray/GA/RGB/
    RGBA; the unfilter path handles all five PNG filter types."""
    import numpy as np

    from fingerprint_spark.operators.media_codecs import decode_png, encode_png

    rng = np.random.RandomState(7)
    for nch in (1, 2, 3, 4):
        px = rng.randint(0, 256, size=(13, 9, nch), dtype=np.uint8)
        d = decode_png(encode_png(px))
        assert (d["width"], d["height"], d["n_channels"]) == (9, 13, nch)
        assert (d["pixels"] == px).all()
    with pytest.raises(ValueError):
        decode_png(b"not a png")


def test_wav_decode_features():
    import numpy as np

    from fingerprint_spark.operators.media_codecs import decode_wav, encode_wav

    t = np.arange(1600)
    samples = (np.sin(t / 10.0) * 8000).astype(np.int16)
    f = decode_wav(encode_wav(samples, 16000, 1))
    assert f["sample_rate"] == 16000
    assert f["n_frames"] == 1600
    assert f["duration_ms"] == 100
    assert 0.15 < f["rms"] < 0.20  # sin rms = 0.707 * 8000/32768 ~ 0.173
    with pytest.raises(ValueError):
        decode_wav(b"RIFFgarbage")


def test_image_features_real_codec_on_real_png_bytes(spark):
    """image_features with the REAL codec over actual PNG bytes: true
    dimensions and pixel-derived luma; undecodable bytes degrade to null
    features, never a task failure."""
    import numpy as np

    from fingerprint_spark.operators.media_codecs import encode_png
    from fingerprint_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        image_features,
        resize_images,
    )

    dark = encode_png(np.zeros((10, 20, 3), dtype=np.uint8))
    light = encode_png(np.full((8, 8, 1), 200, dtype=np.uint8))
    rows = [
        ("img-1", "image", "image/png", bytearray(dark), {}),
        ("img-2", "image", "image/png", bytearray(light), {}),
        ("img-3", "image", "image/jpeg", bytearray(b"\xff\xd8\xffjpegish"), {}),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in image_features(df, use_fake_codec=False).collect()}
    assert (got["img-1"]["width"], got["img-1"]["height"]) == (20, 10)
    assert got["img-1"]["mean_luma"] == 0.0
    assert abs(got["img-2"]["mean_luma"] - 200 / 255) < 1e-9
    assert got["img-3"]["width"] is None  # jpeg: honest decode failure

    rs = {r["media_id"]: r for r in resize_images(df, 4, 4).collect()}
    assert (rs["img-1"]["out_w"], rs["img-1"]["out_h"]) == (4, 4)
    assert rs["img-1"]["out_hash"].startswith("sha256:")
    assert rs["img-3"]["out_hash"] is None
    # determinism of the resized-content hash
    rs2 = {r["media_id"]: r for r in resize_images(df, 4, 4).collect()}
    assert rs2["img-1"]["out_hash"] == rs["img-1"]["out_hash"]


def test_audio_features_real_wav(spark):
    import numpy as np

    from fingerprint_spark.operators.media_codecs import encode_wav
    from fingerprint_spark.operators.multimodal import MEDIA_SCHEMA, audio_features

    samples = (np.sin(np.arange(3200) / 8.0) * 12000).astype(np.int16)
    rows = [
        ("aud-1", "audio", "audio/wav", bytearray(encode_wav(samples, 16000)), {}),
        ("aud-2", "audio", "audio/mpeg", bytearray(b"ID3 not wav"), {}),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in audio_features(df).collect()}
    assert got["aud-1"]["sample_rate"] == 16000
    assert got["aud-1"]["duration_ms"] == 200
    assert got["aud-1"]["rms"] > 0.2
    assert got["aud-2"]["sample_rate"] is None
