"""Synthetic ``images`` table generator — the input_hint shape, verbatim:
(image_id string, bytes binary, w int32, h int32, fmt string,
 caption string, phash int64). Pure function of (seed, n) per FIXTURES.md.

Pixel content is structured (gradient background + bright rectangle +
border) so the stand-in detector and the smart crop have real work to do;
non-square sizes exercise the crop clamp. Captions draw from the title
vocabulary so the caption-equality invariant runs through the same strings
the normalizer golden tests use.
"""

from __future__ import annotations

import random

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from cinescrapers_spark.functions.hashing import get_hashed_py
from cinescrapers_spark.images.codecs import encode_image
from cinescrapers_spark.images.ops import phash64
from cinescrapers_spark.schemas import IMAGES

SIZES = [64, 96, 128, 150, 256]

CAPTION_VOCAB = [
    "Bar Trash: Summer Nights",
    "Barry Lyndon (50th Anniversary)",
    "Lilo & Stitch",
    "Parent & Baby: A Quiet Place",
    "Members' Screening: Barry Lyndon - 50th Anniversary",
    "Amélie",
    "Crème brûlée: A Film",
    "Spider–Man",
    "The Great Outdoors",
    "Casablanca",
    "X–Men: Days of Future—Past",
    "Œuvre (Subtitled)",
]


def make_pixels(rng: random.Random, w: int, h: int) -> np.ndarray:
    """Deterministic structured image: gradient + bright blob + border."""
    y = np.linspace(0, 255, h)[:, None]
    x = np.linspace(0, 255, w)[None, :]
    base = np.stack(
        [
            (y * 0.5 + x * 0.5),
            np.broadcast_to((255 - x) * rng.uniform(0.3, 1.0), (h, w)),
            np.broadcast_to(y * rng.uniform(0.3, 1.0), (h, w)),
        ],
        axis=2,
    )
    arr = np.clip(base, 0, 255).astype(np.uint8)
    # bright rectangle (the "object") at a deterministic offset
    bw, bh = max(4, w // 5), max(4, h // 5)
    bx = rng.randrange(0, max(1, w - bw))
    by = rng.randrange(0, max(1, h - bh))
    arr[by : by + bh, bx : bx + bw] = [250, 245, 240]
    arr[0, :] = 10
    arr[-1, :] = 10
    return arr


DEFAULT_FORMATS = ("qimg", "ppm", "png")


def generate_images_pdf(
    n: int = 200, seed: int = 42, formats: tuple[str, ...] = DEFAULT_FORMATS
) -> pd.DataFrame:
    """``formats`` picks the corpus codec mix (uniform over the tuple).
    The default tuple reproduces the historical byte-exact fixtures; pass
    e.g. ("qimg", "ppm", "png", "jpeg") to exercise the entropy-coded
    decoders through the same harvest plumbing."""
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        w = rng.choice(SIZES)
        h = rng.choice(SIZES)  # independent → non-square mixes
        arr = make_pixels(rng, w, h)
        r = rng.random()
        fmt = formats[min(int(r * len(formats)), len(formats) - 1)]
        data = encode_image(arr, fmt)
        caption = CAPTION_VOCAB[i % len(CAPTION_VOCAB)]
        image_src = f"https://img.example.com/poster/{i}.{fmt}"
        rows.append(
            {
                "image_id": get_hashed_py(image_src),
                "bytes": data,
                "w": w,
                "h": h,
                "fmt": fmt,
                "caption": caption,
                "phash": phash64(arr),
                "_pixels": arr,  # generator-side ground truth (dropped for Spark)
            }
        )
    return pd.DataFrame(rows)


def images_df(spark: SparkSession, n: int = 200, seed: int = 42) -> DataFrame:
    pdf = generate_images_pdf(n, seed).drop(columns=["_pixels"])
    pdf["w"] = pdf["w"].astype("int32")
    pdf["h"] = pdf["h"].astype("int32")
    return spark.createDataFrame(pdf, schema=IMAGES)
