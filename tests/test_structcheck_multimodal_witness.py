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


def test_real_codec_is_explicit_stub():
    with pytest.raises(NotImplementedError):
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
