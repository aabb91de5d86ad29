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


def _make_wav(samples, rate=8000, width=2, channels=1):
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(width)
        w.setframerate(rate)
        w.writeframes(samples.tobytes())
    return buf.getvalue()


def test_decode_wav_real_bytes():
    """Synthesized 16-bit PCM WAV decodes to the exact float samples."""
    ints = np.array([0, 16384, -16384, 32767, -32768], dtype="<i2")
    payload = _make_wav(ints, rate=8000)
    x, rate = MM.decode_wav(payload)
    assert rate == 8000 and x.dtype == np.float32 and x.shape == (5,)
    np.testing.assert_allclose(x, ints.astype(np.float32) / 32768.0)
    # decode_media routes by RIFF magic
    np.testing.assert_allclose(MM.decode_media(payload, "audio"), x)


def test_decode_wav_stereo_8bit():
    ints = np.array([0, 255, 128, 64], dtype=np.uint8)  # 2 frames x 2 ch
    payload = _make_wav(ints, rate=4000, width=1, channels=2)
    x, rate = MM.decode_wav(payload)
    assert x.shape == (2, 2)
    np.testing.assert_allclose(
        x, ((ints.astype(np.float32) - 128.0) / 128.0).reshape(2, 2)
    )


def test_decode_ppm_real_bytes():
    """Hand-built binary P6 decodes to the exact pixel array."""
    pixels = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    payload = b"P6\n# comment\n3 2\n255\n" + pixels.tobytes()
    img = MM.decode_ppm(payload)
    np.testing.assert_array_equal(img, pixels)
    np.testing.assert_array_equal(MM.decode_media(payload, "image"), pixels)


def test_decode_bmp_real_bytes():
    """Hand-built 24-bit bottom-up BMP decodes to the exact RGB array."""
    w, h = 2, 2
    rgb = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [10, 20, 30]]], dtype=np.uint8
    )
    stride = (w * 3 + 3) & ~3
    rows = []
    for y in range(h - 1, -1, -1):  # bottom-up
        row = rgb[y][:, ::-1].tobytes()  # RGB -> BGR
        rows.append(row + b"\x00" * (stride - len(row)))
    pix = b"".join(rows)
    header = (
        b"BM"
        + (54 + len(pix)).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + (54).to_bytes(4, "little")  # data offset
        + (40).to_bytes(4, "little")  # DIB header size
        + w.to_bytes(4, "little")
        + h.to_bytes(4, "little")
        + (1).to_bytes(2, "little")   # planes
        + (24).to_bytes(2, "little")  # bpp
        + (0).to_bytes(4, "little")   # compression
        + b"\x00" * 20
    )
    payload = header + pix
    np.testing.assert_array_equal(MM.decode_bmp(payload), rgb)
    np.testing.assert_array_equal(MM.decode_media(payload, "image"), rgb)


def test_resize_images_real_ppm(spark):
    """The resize stage decodes a REAL PPM payload (not the byte-tile
    stand-in): a solid 4x4 red image resized to 2x2 stays solid red."""
    pixels = np.zeros((4, 4, 3), dtype=np.uint8)
    pixels[:, :, 0] = 200
    payload = b"P6\n4 4\n255\n" + pixels.tobytes()
    df = spark.createDataFrame(
        [(1, "image", bytearray(payload), {"width": 9, "height": 9, "channels": 3,
          "sample_rate": None, "n_samples": None, "fps": None, "n_frames": None})],
        MM.MEDIA_SCHEMA,
    )
    rows = MM.resize_images(df, 2, 2).collect()
    out = np.frombuffer(bytes(rows[0]["pixels"]), dtype=np.uint8).reshape(2, 2, 3)
    assert (out[:, :, 0] == 200).all() and (out[:, :, 1:] == 0).all()


def test_audio_stats_real_wav(spark):
    """The audio-stats stage decodes a REAL WAV payload: a constant
    half-scale signal has rms == peak == 0.5 and the WAV's own
    length/rate win over the metadata."""
    ints = np.full(8000, 16384, dtype="<i2")  # 1 s at 8 kHz, amp 0.5
    payload = _make_wav(ints, rate=8000)
    df = spark.createDataFrame(
        [(7, "audio", bytearray(payload), {"width": None, "height": None,
          "channels": None, "sample_rate": 1, "n_samples": 5, "fps": None,
          "n_frames": None})],
        MM.MEDIA_SCHEMA,
    )
    r = MM.extract_audio_stats(df).collect()[0]
    assert r["n_samples"] == 8000
    assert abs(r["duration_s"] - 1.0) < 1e-9
    assert abs(r["rms"] - 0.5) < 1e-6 and abs(r["peak"] - 0.5) < 1e-6


def make_avi(frames: "np.ndarray", fps: int = 24) -> bytes:
    """Minimal uncompressed AVI writer (test-side inverse of
    MM.decode_avi): RIFF(AVI ) { LIST hdrl { avih, LIST strl { strh,
    strf } }, LIST movi { 00db ... } } with 24-bit bottom-up BGR DIB
    frames, rows 4-byte aligned."""
    n, h, w, _ = frames.shape
    stride = (w * 3 + 3) & ~3

    def chunk(fcc: bytes, data: bytes) -> bytes:
        return fcc + len(data).to_bytes(4, "little") + data + (
            b"\x00" if len(data) % 2 else b""
        )

    def lst(kind: bytes, data: bytes) -> bytes:
        return chunk(b"LIST", kind + data)

    avih = chunk(
        b"avih",
        (1_000_000 // fps).to_bytes(4, "little")  # usec/frame
        + b"\x00" * 12
        + n.to_bytes(4, "little")                  # total frames
        + b"\x00" * 4
        + (1).to_bytes(4, "little")                # streams
        + b"\x00" * 4
        + w.to_bytes(4, "little")
        + h.to_bytes(4, "little")
        + b"\x00" * 16,
    )
    strh = chunk(
        b"strh",
        b"vids" + b"DIB " + b"\x00" * 12
        + (1).to_bytes(4, "little")                # dwScale
        + fps.to_bytes(4, "little")                # dwRate
        + b"\x00" * 4
        + n.to_bytes(4, "little")                  # dwLength
        + b"\x00" * 16,
    )
    strf = chunk(
        b"strf",
        (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + (stride * h).to_bytes(4, "little")
        + b"\x00" * 16,
    )
    movi_frames = []
    for f in frames:
        rows = []
        for y in range(h - 1, -1, -1):  # bottom-up
            row = f[y][:, ::-1].tobytes()  # RGB -> BGR
            rows.append(row + b"\x00" * (stride - len(row)))
        movi_frames.append(chunk(b"00db", b"".join(rows)))
    body = lst(b"hdrl", avih + lst(b"strl", strh + strf)) + lst(
        b"movi", b"".join(movi_frames)
    )
    return b"RIFF" + (len(body) + 4).to_bytes(4, "little") + b"AVI " + body


def test_decode_avi_real_bytes():
    """Hand-built uncompressed AVI round-trips: exact frames and fps."""
    rng = np.random.default_rng(11)
    frames = rng.integers(0, 256, size=(3, 2, 5, 3), dtype=np.uint8)
    payload = make_avi(frames, fps=24)
    got, fps = MM.decode_avi(payload)
    assert fps == 24.0
    np.testing.assert_array_equal(got, frames)
    np.testing.assert_array_equal(MM.decode_media(payload, "video"), frames)


def test_sample_frames_real_avi(spark):
    """sample_frames over a real AVI payload checksums the DECODED RGB
    pixels of exactly the sampled frame (seek-decode, not the payload
    window stand-in)."""
    import hashlib

    from pyspark.sql import functions as F

    rng = np.random.default_rng(13)
    frames = rng.integers(0, 256, size=(5, 4, 3, 3), dtype=np.uint8)
    payload = make_avi(frames, fps=10)
    media = spark.createDataFrame(
        [(1, "video", bytearray(payload), (3, 4, None, None, None, 10.0, 5))],
        MM.MEDIA_SCHEMA,
    )
    got = {
        r["frame_index"]: r["frame_checksum"]
        for r in MM.sample_frames(media, every_n=2).collect()
    }
    want = {
        i: hashlib.md5(frames[i].tobytes()).hexdigest() for i in (0, 2, 4)
    }
    assert got == want


def test_decode_avi_roundtrip_property():
    """Round-trip across widths that exercise row padding (stride %4),
    frame counts, and degenerate 1x1: decode(encode(x)) == x exactly."""
    rng = np.random.default_rng(29)
    for w, h, n in [(1, 1, 1), (2, 3, 4), (3, 2, 2), (5, 4, 3), (8, 1, 6), (7, 5, 2)]:
        frames = rng.integers(0, 256, size=(n, h, w, 3), dtype=np.uint8)
        payload = make_avi(frames, fps=12)
        got, fps = MM.decode_avi(payload)
        assert fps == 12.0
        np.testing.assert_array_equal(got, frames, err_msg=f"w={w} h={h} n={n}")
        gw, gh, gfps, chunks = MM.parse_avi(payload)
        assert (gw, gh, len(chunks)) == (w, h, n)
