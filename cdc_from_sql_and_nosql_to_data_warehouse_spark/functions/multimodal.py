"""Multimodal (image/audio/video) column support for LLM-data pipelines.

North-star NEW operators (no reference counterpart — required by
BASELINE.json): media are **opaque ``binary`` columns with typed
metadata structs**, processed by Arrow-batched ``mapInPandas`` /
``pandas_udf`` stages. The container has no image/audio codecs, so the
actual decode step is STUBBED: ``decode_media`` raises
``NotImplementedError`` unless a real codec (PIL / soundfile) is
importable, and ``fake_decode`` provides a deterministic byte-derived
stand-in so every downstream stage (feature extraction, resize, frame
sampling) is real, runs, and is tested. The Spark-side plumbing —
schema, partition behavior, UDF signatures, Arrow batch shape — is the
contract this module owns.

Scale design (100 TB of media): payloads never enter a shuffle — every
stage here is a narrow ``mapInPandas`` over the scan partitioning, and
aggregations happen on the extracted (small, fixed-width) features
only. ``spark.sql.files.maxPartitionBytes`` bounds per-task memory; the
per-batch work is bounded by Arrow's ``maxRecordsPerBatch``.
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Canonical media schema: one row per asset; payload opaque; metadata typed.
# ---------------------------------------------------------------------------

MEDIA_METADATA_TYPE = T.StructType(
    [
        T.StructField("width", T.IntegerType()),        # image/video
        T.StructField("height", T.IntegerType()),       # image/video
        T.StructField("channels", T.IntegerType()),     # image
        T.StructField("sample_rate", T.IntegerType()),  # audio
        T.StructField("n_samples", T.LongType()),       # audio
        T.StructField("fps", T.DoubleType()),           # video
        T.StructField("n_frames", T.LongType()),        # video
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("metadata", MEDIA_METADATA_TYPE),
    ]
)


def synthesize_media(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic media table derived from ``documents`` — the test
    harness for the binary plumbing (no codecs in the container).

    payload = utf-8 bytes of the text; kind cycles image/audio/video by
    id; metadata fields are derived integer functions of the payload
    length, so every value is reproducible in ANSI SQL for the oracle.
    """
    n = F.length(F.col(text_col)).cast("long")
    kind = (
        F.when(F.col(id_col) % 3 == 0, "image")
        .when(F.col(id_col) % 3 == 1, "audio")
        .otherwise("video")
    )
    return docs.select(
        F.col(id_col).alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.struct(
            F.when(kind == "image", (n % 64 + 1).cast("int")).alias("width"),
            F.when(kind == "image", (n % 48 + 1).cast("int")).alias("height"),
            F.when(kind == "image", F.lit(3)).alias("channels"),
            F.when(kind == "audio", F.lit(16000)).alias("sample_rate"),
            F.when(kind == "audio", n * 4).alias("n_samples"),
            F.when(kind == "video", F.lit(24.0)).alias("fps"),
            F.when(kind == "video", n % 300 + 1).alias("n_frames"),
        ).alias("metadata"),
    )


# ---------------------------------------------------------------------------
# Decode: stubbed behind import-try; deterministic fake for tests.
# ---------------------------------------------------------------------------

try:  # pragma: no cover - codecs absent in this container
    from PIL import Image as _PIL_Image  # noqa: N812
except ImportError:
    _PIL_Image = None

try:  # pragma: no cover - codecs absent in this container
    import soundfile as _soundfile
except ImportError:
    _soundfile = None


def decode_media(payload: bytes, kind: str) -> np.ndarray:
    """Decode a real media payload to an ndarray. STUB: the container
    ships no codecs, so without PIL (image) / soundfile (audio) this
    raises — callers use the ``fake_decode*`` family (same
    signature/shape contracts) in tests. Video always raises here (a
    real implementation would shell out to ffmpeg/pyav)."""
    if kind == "image" and _PIL_Image is not None:  # pragma: no cover
        import io

        return np.asarray(_PIL_Image.open(io.BytesIO(payload)))
    if kind == "audio" and _soundfile is not None:  # pragma: no cover
        import io

        data, _rate = _soundfile.read(io.BytesIO(payload), dtype="float32")
        return np.asarray(data)
    raise NotImplementedError(
        f"no codec available for kind={kind!r}; install PIL/soundfile or "
        "use the fake_decode* stand-ins (deterministic, byte-derived)"
    )


def fake_decode(payload: bytes, width: int, height: int, channels: int = 3) -> np.ndarray:
    """Deterministic stand-in image decoder: tile the payload bytes into
    a (height, width, channels) uint8 array. Same shape contract as a
    real image decode, fully reproducible."""
    need = max(width * height * channels, 1)
    buf = np.frombuffer(payload, dtype=np.uint8) if payload else np.zeros(1, np.uint8)
    tiled = np.resize(buf, need)
    return tiled.reshape(height, width, channels)


def fake_decode_audio(payload: bytes, n_samples: int) -> np.ndarray:
    """Deterministic stand-in audio decoder: (n_samples,) float32 PCM in
    [-1, 1] — the shape/dtype/range contract of ``soundfile.read``.
    Samples derive from the payload bytes (tiled, centered, scaled)."""
    need = max(int(n_samples), 1)
    buf = np.frombuffer(payload, dtype=np.uint8) if payload else np.zeros(1, np.uint8)
    tiled = np.resize(buf, need).astype(np.float32)
    return ((tiled - 127.5) / 127.5).astype(np.float32)


def fake_decode_video(
    payload: bytes, n_frames: int, width: int, height: int, channels: int = 3
) -> np.ndarray:
    """Deterministic stand-in video decoder: (n_frames, height, width,
    channels) uint8 — the frame-stack contract of a real ffmpeg/pyav
    decode. Frame i is the payload tiling rolled by i bytes, so frames
    differ deterministically and any frame is reproducible in isolation
    (seekable-decode contract: ``fake_decode_video(p, n, w, h)[i]`` ==
    roll(tile, i))."""
    f = max(int(n_frames), 1)
    per = max(int(width) * int(height) * int(channels), 1)
    buf = np.frombuffer(payload, dtype=np.uint8) if payload else np.zeros(1, np.uint8)
    base = np.resize(buf, per)
    frames = np.stack([np.roll(base, i) for i in range(f)])
    return frames.reshape(f, height, width, channels)


# ---------------------------------------------------------------------------
# Feature extraction: mapInPandas — Arrow batches in, narrow features out.
# ---------------------------------------------------------------------------

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha256_hex", T.StringType()),
        T.StructField("byte_entropy", T.DoubleType()),
        T.StructField("mean_byte", T.DoubleType()),
    ]
)


def _byte_entropy(buf: bytes) -> float:
    if not buf:
        return 0.0
    counts = np.bincount(np.frombuffer(buf, dtype=np.uint8), minlength=256)
    p = counts[counts > 0] / len(buf)
    return float(-(p * np.log2(p)).sum())


def extract_features(media: DataFrame) -> DataFrame:
    """Byte-level features per asset via ``mapInPandas``.

    One pass over the scan partitioning (narrow — no shuffle); payloads
    die inside the stage, only ~60 B of features per asset survive.

    The generator is self-contained (its own imports, no references to
    this module's globals) so cloudpickle ships it by value — workers
    never need this package importable on their ``sys.path``.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        import numpy as _np
        import pandas as _pd

        def entropy(buf: bytes) -> float:
            if not buf:
                return 0.0
            counts = _np.bincount(_np.frombuffer(buf, dtype=_np.uint8), minlength=256)
            p = counts[counts > 0] / len(buf)
            return float(-(p * _np.log2(p)).sum())

        for pdf in batches:
            n_bytes, sha, ent, mean = [], [], [], []
            for b in pdf["payload"]:
                b = b or b""
                n_bytes.append(len(b))
                sha.append(_hashlib.sha256(b).hexdigest())
                ent.append(entropy(b))
                arr = _np.frombuffer(b if b else b"\x00", _np.uint8)
                mean.append(float(arr.mean()))
            yield _pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": _pd.Series(n_bytes, dtype="int64"),
                    "sha256_hex": sha,
                    "byte_entropy": ent,
                    "mean_byte": mean,
                }
            )

    return media.mapInPandas(gen, schema=FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# Resize / frame-sample: decode-dependent stages over the fake decoder.
# ---------------------------------------------------------------------------

RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("out_width", T.IntegerType()),
        T.StructField("out_height", T.IntegerType()),
        T.StructField("pixels", T.BinaryType()),  # raw HxWxC uint8 buffer
    ]
)


def resize_images(media: DataFrame, out_width: int, out_height: int) -> DataFrame:
    """Nearest-neighbor resize of image assets to a fixed size.

    Decode (fake in this container — see ``decode_media``) + resize per
    Arrow batch; output is the raw pixel buffer, again an opaque binary
    column. Real-codec swap-in changes only the ``fake_decode`` call.
    """

    out_cols = [f.name for f in RESIZED_SCHEMA.fields]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # self-contained for cloudpickle-by-value (see extract_features)
        import numpy as _np
        import pandas as _pd

        def decode(payload: bytes, width: int, height: int, channels: int = 3):
            need = max(width * height * channels, 1)
            buf = (
                _np.frombuffer(payload, dtype=_np.uint8)
                if payload
                else _np.zeros(1, _np.uint8)
            )
            return _np.resize(buf, need).reshape(height, width, channels)

        for pdf in batches:
            rows: list[dict[str, Any]] = []
            for _, r in pdf.iterrows():
                md = r["metadata"]
                w = int(md["width"] or 1)
                h = int(md["height"] or 1)
                img = decode(r["payload"], w, h)
                yi = _np.minimum((_np.arange(out_height) * h) // out_height, h - 1)
                xi = _np.minimum((_np.arange(out_width) * w) // out_width, w - 1)
                out = img[yi][:, xi]
                rows.append(
                    {
                        "media_id": r["media_id"],
                        "out_width": out_width,
                        "out_height": out_height,
                        "pixels": out.tobytes(),
                    }
                )
            yield _pd.DataFrame(rows, columns=out_cols)

    return media.filter(F.col("kind") == "image").mapInPandas(gen, schema=RESIZED_SCHEMA)


AUDIO_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("peak", T.DoubleType()),
    ]
)


def extract_audio_stats(media: DataFrame) -> DataFrame:
    """Waveform-level stats of audio assets (duration, RMS, peak) via
    ``mapInPandas`` over the decode contract (fake decoder here — a real
    soundfile decode drops in without touching the plan).

    Narrow stage: payloads decode and die inside the task; ~40 B of
    stats per asset survive. Self-contained closure (cloudpickle by
    value), like every stage in this module.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as _np
        import pandas as _pd

        def decode_audio(payload: bytes, n_samples: int):
            need = max(int(n_samples), 1)
            buf = (
                _np.frombuffer(payload, dtype=_np.uint8)
                if payload
                else _np.zeros(1, _np.uint8)
            )
            tiled = _np.resize(buf, need).astype(_np.float32)
            return ((tiled - 127.5) / 127.5).astype(_np.float32)

        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                md = r["metadata"]
                n = int(md["n_samples"] or 0)
                rate = int(md["sample_rate"] or 1)
                wave = decode_audio(r["payload"], n)
                rows.append(
                    {
                        "media_id": r["media_id"],
                        "n_samples": n,
                        "duration_s": n / rate,
                        "rms": float(_np.sqrt((wave.astype(_np.float64) ** 2).mean())),
                        "peak": float(_np.abs(wave).max()),
                    }
                )
            yield _pd.DataFrame(
                rows, columns=[f.name for f in AUDIO_STATS_SCHEMA.fields]
            )

    return media.filter(F.col("kind") == "audio").mapInPandas(
        gen, schema=AUDIO_STATS_SCHEMA
    )


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_index", T.LongType()),
        T.StructField("frame_checksum", T.StringType()),
    ]
)


def sample_frames(media: DataFrame, every_n: int = 24) -> DataFrame:
    """Sample every ``every_n``-th frame index of video assets.

    Frame *extraction* needs a codec (stubbed); the sampling plan —
    which indices, per-frame fan-out shape, checksum column — is real.
    Fan-out happens JVM-side with ``sequence``+``explode`` so the
    payload is not replicated per frame; the per-frame stage is a
    pandas_udf over (payload slice hash, index).
    """
    frames = (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            "payload",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("metadata.n_frames") - 1, F.lit(0)),
                    F.lit(every_n),
                )
            ).alias("frame_index"),
        )
    )

    @F.pandas_udf(T.StringType())
    def frame_checksum(payload: pd.Series, idx: pd.Series) -> pd.Series:
        # stand-in for "decode frame idx and checksum it": hash of the
        # payload window the frame would occupy (deterministic)
        def one(b: bytes | None, i: int) -> str:
            b = b or b""
            lo = (i * 37) % max(len(b), 1)
            return hashlib.md5(b[lo : lo + 64] + str(i).encode()).hexdigest()

        return pd.Series([one(b, i) for b, i in zip(payload, idx)])

    return frames.select(
        "media_id",
        "frame_index",
        frame_checksum("payload", "frame_index").alias("frame_checksum"),
    )
