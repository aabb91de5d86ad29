"""Multimodal binary-column plumbing: schema, decode stub, mapInPandas
feature/resize/frame stages (deterministic fake decode — no codecs in
the container)."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pytest

from cdc_from_sql_and_nosql_to_data_warehouse_spark.functions import multimodal as MM


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma"),          # image (0 % 3)
            (1, "hello world"),               # audio
            (2, "one two three four five"),   # video
            (3, ""),                          # image, empty payload
        ],
        ["doc_id", "text"],
    )
    return MM.synthesize_media(docs)


def test_media_schema(media):
    assert [f.name for f in media.schema.fields] == [
        "media_id",
        "kind",
        "payload",
        "metadata",
    ]
    assert media.schema["payload"].dataType.typeName() == "binary"
    meta = {f.name for f in media.schema["metadata"].dataType.fields}
    assert {"width", "height", "sample_rate", "n_samples", "fps", "n_frames"} <= meta


def test_synthesize_deterministic(media):
    rows = {r["media_id"]: r for r in media.collect()}
    assert rows[0]["kind"] == "image" and rows[1]["kind"] == "audio"
    assert bytes(rows[0]["payload"]) == b"alpha beta gamma"
    assert rows[0]["metadata"]["width"] == len("alpha beta gamma") % 64 + 1
    assert rows[1]["metadata"]["n_samples"] == len("hello world") * 4
    assert rows[2]["metadata"]["n_frames"] == len("one two three four five") % 300 + 1


def test_decode_media_is_stubbed():
    with pytest.raises(NotImplementedError):
        MM.decode_media(b"\x00\x01", "audio")


def test_fake_decode_shape_and_determinism():
    a = MM.fake_decode(b"abcdef", 4, 3)
    b = MM.fake_decode(b"abcdef", 4, 3)
    assert a.shape == (3, 4, 3) and a.dtype == np.uint8
    np.testing.assert_array_equal(a, b)
    # tiling starts from the payload bytes themselves
    assert bytes(a.flat[:6]) == b"abcdef"
    # empty payload still yields the contracted shape
    assert MM.fake_decode(b"", 2, 2).shape == (2, 2, 3)


def test_extract_features_values(media):
    feats = {r["media_id"]: r for r in MM.extract_features(media).collect()}
    payload = b"alpha beta gamma"
    assert feats[0]["n_bytes"] == len(payload)
    assert feats[0]["sha256_hex"] == hashlib.sha256(payload).hexdigest()
    assert feats[0]["mean_byte"] == pytest.approx(
        float(np.frombuffer(payload, np.uint8).mean())
    )
    counts = np.bincount(np.frombuffer(payload, np.uint8), minlength=256)
    p = counts[counts > 0] / len(payload)
    assert feats[0]["byte_entropy"] == pytest.approx(float(-(p * np.log2(p)).sum()))
    # empty payload: defined, not NaN
    assert feats[3]["n_bytes"] == 0 and feats[3]["byte_entropy"] == 0.0


def test_resize_images(media):
    out = {r["media_id"]: r for r in MM.resize_images(media, 8, 6).collect()}
    # only image assets survive the kind filter
    assert set(out) == {0, 3}
    r = out[0]
    assert (r["out_width"], r["out_height"]) == (8, 6)
    pixels = np.frombuffer(bytes(r["pixels"]), np.uint8).reshape(6, 8, 3)
    # reproduce the nearest-neighbor math independently
    w = len("alpha beta gamma") % 64 + 1
    h = len("alpha beta gamma") % 48 + 1
    img = MM.fake_decode(b"alpha beta gamma", w, h)
    yi = np.minimum((np.arange(6) * h) // 6, h - 1)
    xi = np.minimum((np.arange(8) * w) // 8, w - 1)
    np.testing.assert_array_equal(pixels, img[yi][:, xi])


def test_sample_frames(media):
    frames = MM.sample_frames(media, every_n=10).collect()
    # only the video doc (id=2) fans out
    assert {r["media_id"] for r in frames} == {2}
    n_frames = len("one two three four five") % 300 + 1
    want = list(range(0, n_frames, 10))
    assert sorted(r["frame_index"] for r in frames) == want
    checksums = {r["frame_index"]: r["frame_checksum"] for r in frames}
    b = b"one two three four five"
    lo = 0
    assert checksums[0] == hashlib.md5(b[lo : lo + 64] + b"0").hexdigest()


def test_fake_decode_audio_contract():
    """Shape/dtype/range contract of a real soundfile decode."""
    from cdc_from_sql_and_nosql_to_data_warehouse_spark.functions.multimodal import fake_decode_audio

    wave = fake_decode_audio(b"hello world", 1000)
    assert wave.shape == (1000,) and wave.dtype.name == "float32"
    assert float(wave.min()) >= -1.0 and float(wave.max()) <= 1.0
    assert (fake_decode_audio(b"hello world", 1000) == wave).all()  # deterministic
    assert fake_decode_audio(b"", 8).shape == (8,)  # empty payload safe


def test_fake_decode_video_contract():
    """Frame-stack + seekable-decode contract of a real ffmpeg decode."""
    import numpy as np

    from cdc_from_sql_and_nosql_to_data_warehouse_spark.functions.multimodal import fake_decode_video

    vid = fake_decode_video(b"payload-bytes", 5, 4, 3)
    assert vid.shape == (5, 3, 4, 3) and vid.dtype.name == "uint8"
    assert not (vid[0] == vid[1]).all()  # frames differ
    # any frame reproducible in isolation (seek contract)
    again = fake_decode_video(b"payload-bytes", 5, 4, 3)
    assert (again[3] == vid[3]).all()
    assert fake_decode_video(b"", 2, 2, 2).shape == (2, 2, 2, 3)


def test_decode_media_raises_without_codecs():
    import pytest as _pytest

    from cdc_from_sql_and_nosql_to_data_warehouse_spark.functions.multimodal import decode_media

    for kind in ("image", "audio", "video"):
        with _pytest.raises(NotImplementedError):
            decode_media(b"\x00\x01", kind)


def test_extract_audio_stats_plumbing(spark):
    """mapInPandas audio stage: audio assets only, exact duration from
    metadata, RMS/peak from the decoded waveform."""
    from cdc_from_sql_and_nosql_to_data_warehouse_spark.functions.multimodal import (
        extract_audio_stats,
        synthesize_media,
    )

    docs = spark.createDataFrame(
        [(i, "word " * (i + 1)) for i in range(6)], ["doc_id", "text"]
    )
    media = synthesize_media(docs)
    out = {r["media_id"]: r for r in extract_audio_stats(media).collect()}
    # kinds cycle image/audio/video by id -> audio ids are 1 and 4
    assert set(out) == {1, 4}
    r = out[1]
    n_chars = len("word " * 2)
    assert r["n_samples"] == n_chars * 4
    assert r["duration_s"] == (n_chars * 4) / 16000
    assert 0.0 < r["rms"] <= 1.0 and 0.0 < r["peak"] <= 1.0
