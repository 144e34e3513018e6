"""End-to-end ingest lifecycle tests (ref §3.1 scrape path + §3.3 export):
extract → enrich → MERGE upsert → read paths; re-ingest must upsert, not
duplicate (ref __main__.py:330-344)."""

import datetime

import pandas as pd
import pytest
from pyspark.sql import functions as F

from cinescrapers_spark.dims import CINEMA_SITES
from cinescrapers_spark.schemas import PAGE
from cinescrapers_spark.sources.fixtures import generate_pages
from cinescrapers_spark.streaming.ingest import ShowtimesStore

NOW = datetime.datetime(1998, 8, 1, 9, 0, 0)


@pytest.fixture()
def site_dim(spark):
    rows = [{"site": s, "cinema_shortcode": c} for c, s, _ in CINEMA_SITES]
    # fixture sites not in the 27 (none currently) would be dropped by the
    # FK join — the reference asserts instead (__main__.py:384-385)
    return spark.createDataFrame(pd.DataFrame(rows)).dropDuplicates(["site"])


def _pages_df(spark):
    pages, expected = generate_pages(n_per_site=3)
    return spark.createDataFrame(pd.DataFrame(pages), schema=PAGE), expected


def test_ingest_and_upsert(spark, tmp_path, site_dim):
    pages_df, expected = _pages_df(spark)
    store = ShowtimesStore(spark, str(tmp_path / "showtimes"), site_dim)

    n1 = store.ingest_pages(pages_df, now=NOW, tick=1)
    assert n1 > 0
    df = store.read()
    # id is the primary key (ref DDL __main__.py:186-207)
    assert df.select("id").distinct().count() == n1
    # enriched columns present and populated
    row = df.first()
    assert len(row.id) == 32
    assert row.norm_title == row.norm_title.strip()

    # re-ingest same pages one tick later: upsert, not duplicate
    later = NOW + datetime.timedelta(days=1)
    n2 = store.ingest_pages(pages_df, now=later, tick=2)
    assert n2 == n1, "re-crawl duplicated rows instead of upserting"
    assert store.read().agg(F.max("last_updated")).first()[0] == later


def test_titlecase_fixup_semantics(spark):
    from cinescrapers_spark.operators.enrich import titlecase_fixup

    df = spark.createDataFrame(
        [("DON'T LOOK NOW",), ("Normal Title",), ("ALL CAPS",)], "title string"
    ).select(titlecase_fixup(F.col("title")).alias("t"))
    got = [r.t for r in df.collect()]
    # Python str.title() semantics: apostrophe starts a new "word"
    assert got == ["Don'T Look Now", "Normal Title", "All Caps"]


def test_current_showtimes_window_and_export(spark, tmp_path, site_dim):
    pages_df, _ = _pages_df(spark)
    store = ShowtimesStore(spark, str(tmp_path / "st"), site_dim)
    store.ingest_pages(pages_df, now=NOW, tick=1)

    cur = store.current_showtimes(NOW).collect()
    assert cur, "fixture datetimes are inside the 90-day window"
    t0 = NOW.replace(hour=0, minute=0, second=0)
    t1 = NOW + datetime.timedelta(days=90)
    for r in cur:
        assert t0 <= r.datetime <= t1
    exported = store.export_rows(NOW)
    assert "description" in exported.columns
    stats = store.stats(NOW)
    assert stats["total"] >= len(cur)
    assert stats["per_scraper"]


def test_merge_preserves_tmdb_id_across_reingest(spark, tmp_path, site_dim):
    """The reference's ON CONFLICT(id) DO UPDATE does not SET tmdb_id
    (__main__.py:333-341): a re-scrape (fresh rows carry tmdb_id=NULL)
    must not wipe previously-identified ids."""
    pages_df, _ = _pages_df(spark)
    store = ShowtimesStore(spark, str(tmp_path / "st"), site_dim)
    store.ingest_pages(pages_df, now=NOW, tick=1)

    # simulate identification: stamp a tmdb_id on every row, re-commit
    identified = store.read().withColumn(
        "tmdb_id", F.pmod(F.xxhash64("id"), F.lit(100000)).cast("int")
    )
    store.table.commit(identified, tick=2, row_count=identified.count())
    n_ids = store.read().filter(F.col("tmdb_id").isNotNull()).count()
    assert n_ids > 0

    # re-ingest the same pages (tmdb_id=NULL on every fresh row)
    store.ingest_pages(pages_df, now=NOW + datetime.timedelta(days=1), tick=3)
    after = store.read()
    assert after.filter(F.col("tmdb_id").isNotNull()).count() == n_ids
    # and the refresh still applied (last_updated moved)
    assert (
        after.agg(F.max("last_updated")).first()[0]
        == NOW + datetime.timedelta(days=1)
    )


def test_merge_tiebreak_is_content_deterministic(spark):
    """Two updates with the same key and equal order_col must pick a stable
    winner regardless of partitioning/arrival order (SURVEY §7.3)."""
    from cinescrapers_spark.operators.merge import latest_per_key

    rows = [("k", 1, "alpha"), ("k", 1, "beta"), ("k", 1, "gamma")]
    base = spark.createDataFrame(rows, "id string, last_updated int, payload string")
    winners = set()
    for nparts in (1, 2, 3):
        got = latest_per_key(base.repartition(nparts), "id", "last_updated").collect()
        assert len(got) == 1
        winners.add(got[0]["payload"])
    assert len(winners) == 1, f"tiebreak unstable across partitionings: {winners}"


def test_export_json_gzip_artifact(spark, tmp_path, site_dim):
    """The gzip JSON export (ref upload.py:23-40 gz_compression=True) must
    produce .json.gz part files that read back to the export rows."""
    import glob

    pages_df, _ = _pages_df(spark)
    store = ShowtimesStore(spark, str(tmp_path / "st"), site_dim)
    store.ingest_pages(pages_df, now=NOW, tick=1)
    out = str(tmp_path / "export")
    store.export_json(out, now=NOW, gzip_compress=True)
    parts = glob.glob(out + "/*.json.gz")
    assert parts, "no gzipped json parts written"
    back = spark.read.json(out)
    want = store.export_rows(NOW)
    assert back.count() == want.count()
    assert set(back.columns) == set(want.columns)
