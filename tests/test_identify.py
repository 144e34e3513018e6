"""Film-identification lifecycle tests (ref §3.4 grab_tmdb_ids):
cache short-circuit, candidate retrieval with year window, top-1 scoring,
cache append — over the ingested fixture store."""

import datetime

import pandas as pd
import pytest
from pyspark.sql import functions as F

from cinescrapers_spark.dims import CINEMA_SITES
from cinescrapers_spark.operators.identify import identify_films, synthetic_candidates
from cinescrapers_spark.schemas import PAGE
from cinescrapers_spark.sources.fixtures import generate_pages
from cinescrapers_spark.streaming.ingest import ShowtimesStore

NOW = datetime.datetime(1998, 8, 1, 9, 0, 0)


@pytest.fixture(scope="module")
def store_df(spark, tmp_path_factory):
    pages, _ = generate_pages(n_per_site=2)
    pages_df = spark.createDataFrame(pd.DataFrame(pages), schema=PAGE)
    dim = spark.createDataFrame(
        pd.DataFrame([{"site": s, "cinema_shortcode": c} for c, s, _ in CINEMA_SITES])
    ).dropDuplicates(["site"])
    store = ShowtimesStore(spark, str(tmp_path_factory.mktemp("st")), dim)
    store.ingest_pages(pages_df, now=NOW, tick=1)
    return store.read().cache()


def test_identify_matches_and_caches(spark, store_df):
    titles = [r.norm_title for r in store_df.select("norm_title").distinct().collect()]
    cands = synthetic_candidates(spark, titles, seed_year=1998)

    updated, new_cache = identify_films(store_df, None, cands, current_year=1998)
    matched = updated.filter(F.col("tmdb_id").isNotNull())
    n_matched = matched.count()
    assert n_matched > 0
    # true candidates (1000-range), not decoys (5000-range)
    ids = {r.tmdb_id for r in matched.select("tmdb_id").distinct().collect()}
    assert all(i < 5000 for i in ids), f"decoy matched: {ids}"
    # row count preserved (identification never drops showtimes)
    assert updated.count() == store_df.count()

    cache = new_cache.cache()
    assert cache.count() == cache.select("movie_hash").distinct().count()

    # second pass with the cache: all previously-matched rows resolve via
    # the hit path and the result is identical
    updated2, new_cache2 = identify_films(store_df, cache, cands, current_year=1998)
    assert updated2.filter(F.col("tmdb_id").isNotNull()).count() == n_matched
    got1 = {(r.id, r.tmdb_id) for r in updated.select("id", "tmdb_id").collect()}
    got2 = {(r.id, r.tmdb_id) for r in updated2.select("id", "tmdb_id").collect()}
    assert got1 == got2


def test_identify_year_window(spark, store_df):
    """Candidates outside year±1 must not match rows that carry a
    release_year (ref film_identification.py:194-202)."""
    titles = [r.norm_title for r in store_df.select("norm_title").distinct().collect()]
    cands = synthetic_candidates(spark, titles, seed_year=1998).filter(
        F.col("cand_year") <= 1968  # only the far-era decoys remain
    )
    with_year = store_df.filter(F.col("release_year").isNotNull())
    if with_year.count() == 0:
        pytest.skip("no fixture rows with release_year")
    updated, _ = identify_films(with_year, None, cands, current_year=1998)
    assert updated.filter(F.col("tmdb_id").isNotNull()).count() == 0


def test_identify_fallback_without_exact_title(spark):
    """A showtime with a release_year but zero exact-title candidates must
    retry year-window-only retrieval (ref film_identification.py:213-216)."""
    import pandas as pd

    from cinescrapers_spark.images.ops import embed_text

    st = spark.createDataFrame(
        pd.DataFrame(
            [
                {
                    "id": "x1",
                    "title": "The Substance",
                    "norm_title": "THE SUBSTANCE",
                    "description": "body horror",
                    "image_src": None,
                    "release_year": 1997,
                    "tmdb_id": None,
                }
            ]
        )
    )
    # candidate dim has NO row titled THE SUBSTANCE — only a same-era film
    cands = spark.createDataFrame(
        pd.DataFrame(
            [
                {
                    "norm_title": "OTHER FILM",
                    "cand_tmdb_id": 42,
                    "cand_year": 1997,
                    "text_emb": [float(x) for x in embed_text("body horror")],
                    "img_emb": [float(x) for x in embed_text("poster")],
                },
                {
                    "norm_title": "FAR ERA",
                    "cand_tmdb_id": 43,
                    "cand_year": 1950,  # outside year window: excluded
                    "text_emb": [float(x) for x in embed_text("body horror")],
                    "img_emb": [float(x) for x in embed_text("poster")],
                },
            ]
        )
    )
    updated, cache = identify_films(st, None, cands, current_year=1997)
    got = updated.collect()
    assert len(got) == 1 and got[0]["tmdb_id"] == 42
    # and a row with NO release_year must NOT take the fallback
    st2 = st.withColumn("release_year", F.lit(None).cast("long"))
    updated2, _ = identify_films(st2, None, cands, current_year=1997)
    assert updated2.first()["tmdb_id"] is None
