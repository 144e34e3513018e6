"""Audio / video as opaque binary columns with typed metadata — the
multimodal plumbing a training-data pipeline needs beyond the images table
(round brief; generalizes the reference's binary image handling,
``/root/reference/src/cinescrapers/__main__.py:221-284``, to the other
payload types).

The Spark-side shape is REAL and tested — schemas, Arrow-batched UDF
signatures, per-batch decode loops, partition-friendly binary columns. The
codecs are split honestly:

* ``pcm16`` audio and ``rawrgb`` video are genuinely decoded with numpy
  (they are trivially self-describing given the metadata columns);
* compressed formats (mp3/aac, h264) have NO decoder in this sandbox —
  they raise ``NotImplementedError`` behind a clearly-marked gate, so the
  operator's error path is exercised instead of silently faked.

At 100 TB the binary columns ride parquet as-is (no decode on ingest);
decode/feature/sample stages run where the consumer needs them, batched by
Arrow, with per-row byte sizes bounded by the metadata columns.
"""

from __future__ import annotations

import random
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from cinescrapers_spark.functions.hashing import get_hashed_py

AUDIO = StructType(
    [
        StructField("audio_id", StringType(), False),
        StructField("bytes", BinaryType(), True),
        StructField("sample_rate", IntegerType(), True),
        StructField("n_samples", IntegerType(), True),
        StructField("fmt", StringType(), True),  # pcm16 | mp3 (stubbed)
        StructField("caption", StringType(), True),
    ]
)

VIDEO = StructType(
    [
        StructField("video_id", StringType(), False),
        StructField("bytes", BinaryType(), True),
        StructField("w", IntegerType(), True),
        StructField("h", IntegerType(), True),
        StructField("fps", DoubleType(), True),
        StructField("n_frames", IntegerType(), True),
        StructField("fmt", StringType(), True),  # rawrgb | h264 (stubbed)
        StructField("caption", StringType(), True),
    ]
)

SUPPORTED_AUDIO = {"pcm16"}
SUPPORTED_VIDEO = {"rawrgb"}


# --------------------------------------------------------------------------
# codecs (decode gate: real for self-describing raw formats, stub otherwise)
# --------------------------------------------------------------------------
def decode_audio(data: bytes, fmt: str) -> np.ndarray:
    """bytes → float32 waveform in [-1, 1]. pcm16 = little-endian int16."""
    if fmt == "pcm16":
        return np.frombuffer(data, dtype="<i2").astype(np.float32) / 32768.0
    # STUB: no compressed-audio codec ships in this sandbox — real
    # deployments plug libsndfile/ffmpeg here; the operator surface and
    # error path are what this repo tests.
    raise NotImplementedError(f"no decoder for audio fmt={fmt!r} in sandbox")


def decode_video_frame(
    data: bytes, w: int, h: int, frame_idx: int, fmt: str
) -> np.ndarray:
    """bytes → (h, w, 3) uint8 frame. rawrgb = frames concatenated."""
    if fmt == "rawrgb":
        stride = w * h * 3
        off = frame_idx * stride
        return (
            np.frombuffer(data, dtype=np.uint8, count=stride, offset=off)
            .reshape(h, w, 3)
            .copy()
        )
    raise NotImplementedError(f"no decoder for video fmt={fmt!r} in sandbox")


# --------------------------------------------------------------------------
# synthetic tables (deterministic; no external data)
# --------------------------------------------------------------------------
def generate_audio_pdf(n: int = 100, seed: int = 42) -> pd.DataFrame:
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        sr = rng.choice([8000, 16000])
        n_samp = sr // rng.choice([4, 8, 10])  # 0.1-0.25 s clips
        t = np.arange(n_samp, dtype=np.float64) / sr
        freq = 110.0 * (1 + i % 8)
        wave = 0.5 * np.sin(2 * np.pi * freq * t)
        pcm = (wave * 32767).astype("<i2").tobytes()
        fmt = "mp3" if i % 10 == 9 else "pcm16"  # 10% stubbed-codec rows
        rows.append(
            {
                "audio_id": get_hashed_py(f"audio/{i}"),
                "bytes": pcm,  # for mp3 rows the bytes are opaque (undecodable)
                "sample_rate": sr,
                "n_samples": n_samp,
                "fmt": fmt,
                "caption": f"tone {110 * (1 + i % 8)} hz clip {i}",
            }
        )
    return pd.DataFrame(rows)


def generate_video_pdf(n: int = 40, seed: int = 42) -> pd.DataFrame:
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        w, h = rng.choice([(32, 24), (48, 32)])
        n_frames = rng.choice([8, 12])
        frames = []
        for f in range(n_frames):
            y = np.linspace(0, 255, h)[:, None]
            x = np.linspace(0, 255, w)[None, :]
            frame = np.stack(
                [
                    np.broadcast_to((x + f * 10) % 256, (h, w)),
                    np.broadcast_to((y + i * 5) % 256, (h, w)),
                    np.full((h, w), (f * 30) % 256, dtype=np.float64),
                ],
                axis=2,
            ).astype(np.uint8)
            frames.append(frame.tobytes())
        fmt = "h264" if i % 8 == 7 else "rawrgb"
        rows.append(
            {
                "video_id": get_hashed_py(f"video/{i}"),
                "bytes": b"".join(frames),
                "w": w,
                "h": h,
                "fps": 12.0,
                "n_frames": n_frames,
                "fmt": fmt,
                "caption": f"synthetic clip {i}",
            }
        )
    return pd.DataFrame(rows)


def audio_df(spark: SparkSession, n: int = 100, seed: int = 42) -> DataFrame:
    pdf = generate_audio_pdf(n, seed)
    for c in ("sample_rate", "n_samples"):
        pdf[c] = pdf[c].astype("int32")
    return spark.createDataFrame(pdf, schema=AUDIO)


def video_df(spark: SparkSession, n: int = 40, seed: int = 42) -> DataFrame:
    pdf = generate_video_pdf(n, seed)
    for c in ("w", "h", "n_frames"):
        pdf[c] = pdf[c].astype("int32")
    return spark.createDataFrame(pdf, schema=VIDEO)


# --------------------------------------------------------------------------
# operators (Arrow-batched; decode errors surface as a column, not a crash)
# --------------------------------------------------------------------------
AUDIO_STATS_SCHEMA = (
    "audio_id string, duration_sec double, rms double, zero_crossings int, "
    "decode_error string"
)


def audio_stats(audio: DataFrame) -> DataFrame:
    """Per-clip waveform features (duration, RMS, zero-crossing count).
    Undecodable formats yield NULL features + the error string — failure
    isolation per row, like the crawl's per-URL failed state."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                try:
                    wave = decode_audio(bytes(r.bytes), r.fmt)
                    out.append(
                        {
                            "audio_id": r.audio_id,
                            "duration_sec": len(wave) / r.sample_rate,
                            "rms": float(np.sqrt(np.mean(wave**2))),
                            "zero_crossings": int(
                                np.count_nonzero(np.diff(np.signbit(wave)))
                            ),
                            "decode_error": None,
                        }
                    )
                except NotImplementedError as e:
                    out.append(
                        {
                            "audio_id": r.audio_id,
                            "duration_sec": None,
                            "rms": None,
                            "zero_crossings": None,
                            "decode_error": str(e),
                        }
                    )
            yield pd.DataFrame(
                out,
                columns=[
                    "audio_id",
                    "duration_sec",
                    "rms",
                    "zero_crossings",
                    "decode_error",
                ],
            )

    return audio.select(
        "audio_id", "bytes", "sample_rate", "fmt"
    ).mapInPandas(run, schema=AUDIO_STATS_SCHEMA)


FRAME_SAMPLE_SCHEMA = (
    "video_id string, frame_idx int, frame_bytes binary, mean_lum double, "
    "decode_error string"
)


def sample_frames(video: DataFrame, every_k: int = 4) -> DataFrame:
    """Every k-th frame per clip as its own row (binary frame + mean luma)
    — the frame-sampling stage of a video-training pipeline; one input row
    explodes to ceil(n_frames / k) rows."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                if r.fmt not in SUPPORTED_VIDEO:
                    out.append(
                        {
                            "video_id": r.video_id,
                            "frame_idx": None,
                            "frame_bytes": None,
                            "mean_lum": None,
                            "decode_error": f"no decoder for video fmt={r.fmt!r} in sandbox",
                        }
                    )
                    continue
                for f in range(0, int(r.n_frames), every_k):
                    frame = decode_video_frame(bytes(r.bytes), r.w, r.h, f, r.fmt)
                    lum = frame.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
                    out.append(
                        {
                            "video_id": r.video_id,
                            "frame_idx": f,
                            "frame_bytes": frame.tobytes(),
                            "mean_lum": float(lum.mean()),
                            "decode_error": None,
                        }
                    )
            yield pd.DataFrame(
                out,
                columns=[
                    "video_id",
                    "frame_idx",
                    "frame_bytes",
                    "mean_lum",
                    "decode_error",
                ],
            )

    return video.select(
        "video_id", "bytes", "w", "h", "n_frames", "fmt"
    ).mapInPandas(run, schema=FRAME_SAMPLE_SCHEMA)
