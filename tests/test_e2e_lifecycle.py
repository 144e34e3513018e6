"""Full reference-lifecycle integration test (§3.1 scrape → §3.3 export):
crawl schedules URLs → fixture pages fetched → extractors parse → enrich
(incl. content-addressed thumbnail join) → MERGE upsert → current-showtimes
export + stats. The complete path a reference user runs, on Spark."""

import datetime

import pandas as pd
import pytest
from pyspark.sql import functions as F

from cinescrapers_spark.dims import CINEMA_SITES
from cinescrapers_spark.functions.hashing import get_hashed_py
from cinescrapers_spark.images.codecs import encode_qimg
from cinescrapers_spark.images.ops import phash64
from cinescrapers_spark.images.table import make_pixels
from cinescrapers_spark.schemas import IMAGES, PAGE
from cinescrapers_spark.sources.fixtures import generate_pages
from cinescrapers_spark.streaming.ingest import (
    ShowtimesStore,
    thumbnail_blobs,
)

NOW = datetime.datetime(1998, 8, 1, 9, 0, 0)


@pytest.fixture()
def lifecycle(spark, tmp_path):
    pages, expected = generate_pages(n_per_site=2)
    pages_df = spark.createDataFrame(pd.DataFrame(pages), schema=PAGE)

    # content-addressed images table covering HALF the fixture image_srcs
    # (the other half exercises the thumbnail-miss path)
    import random

    srcs = sorted({e["image_src"] for e in expected if e["image_src"]})
    rng = random.Random(0)
    rows = []
    for i, src in enumerate(srcs):
        if i % 2 == 1:
            continue
        arr = make_pixels(rng, 96, 64)
        rows.append(
            {
                "image_id": get_hashed_py(src),
                "bytes": encode_qimg(arr),
                "w": 96,
                "h": 64,
                "fmt": "qimg",
                "caption": "fixture",
                "phash": phash64(arr),
            }
        )
    images_df = spark.createDataFrame(pd.DataFrame(rows), schema=IMAGES)
    dim = spark.createDataFrame(
        pd.DataFrame([{"site": s, "cinema_shortcode": c} for c, s, _ in CINEMA_SITES])
    ).dropDuplicates(["site"])
    store = ShowtimesStore(spark, str(tmp_path / "st"), dim)
    n = store.ingest_pages(pages_df, now=NOW, tick=1, images=images_df)
    return store, images_df, srcs, n


def test_lifecycle_end_to_end(spark, lifecycle):
    store, images_df, srcs, n = lifecycle
    assert n > 0
    df = store.read()
    covered = {r.image_id for r in images_df.select("image_id").collect()}
    got = df.select("image_src", "thumbnail").filter(F.col("image_src").isNotNull())
    for r in got.collect():
        key = get_hashed_py(r.image_src)
        if key in covered:
            assert r.thumbnail == f"thumb-{key}"  # hit: content-addressed ref
        else:
            assert r.thumbnail is None  # miss path (ref would fetch it)
    # export read path still shaped right
    exported = store.export_rows(NOW)
    assert "description" in exported.columns
    assert exported.count() > 0


def test_thumbnail_blob_sink(spark, lifecycle):
    store, images_df, srcs, _ = lifecycle
    blobs = thumbnail_blobs(images_df).collect()
    assert blobs
    from cinescrapers_spark.images.codecs import sniff_format
    from cinescrapers_spark.images.jpeg import decode_jpeg

    for b in blobs:
        assert b.thumb_id.startswith("thumb-")
        # the sink format is JPEG like the reference's thumbnails folder
        assert sniff_format(bytes(b.thumb_bytes)) == "jpeg"
        thumb = decode_jpeg(bytes(b.thumb_bytes))
        assert thumb.shape == (64, 64, 3)  # the reference's size×size invariant
