"""Ingest pipeline: fetched pages → ShowTime rows → enrich → MERGE upsert.

This is ``scrape_to_sqlite`` (``/root/reference/src/cinescrapers/__main__.py:291-344``)
as one declarative plan per batch, plus the analytical read paths
(``grab_current_showtimes`` :347-366, ``export_json`` :369-391,
``print_stats`` :69-178) over the resulting showtimes table.

Runs identically under batch-incremental ticks (SnapshotTable commits — the
reference's refresh model) and under Structured Streaming (same transforms
inside ``foreachBatch``; see streaming/stream.py).
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cinescrapers_spark.crawl.snapshots import SnapshotTable
from cinescrapers_spark.operators.enrich import enrich_showtimes
from cinescrapers_spark.operators.merge import merge_upsert
from cinescrapers_spark.sources.extractors import extract_showtimes


def attach_thumbnails(enriched: DataFrame, images: DataFrame) -> DataFrame:
    """Thumbnail enrichment (ref __main__.py:302-323 get_thumbnail step):
    the images table is content-addressed by ``image_id =
    get_hashed(image_src)`` (the reference's cache key, __main__.py:218);
    rows whose image exists get a smart-crop thumbnail reference
    ``thumb-<image_id>`` — the seen-check-before-fetch becomes this join.
    """
    from cinescrapers_spark.functions.hashing import get_hashed_udf

    keyed = enriched.withColumn(
        "__img_key",
        F.when(F.col("image_src").isNotNull(), get_hashed_udf(F.col("image_src"))),
    )
    hit = (
        images.select(F.col("image_id").alias("__img_key"))
        .distinct()
        .withColumn("__have_img", F.lit(True))
    )
    return (
        keyed.join(F.broadcast(hit), "__img_key", "left_outer")
        .withColumn(
            "thumbnail",
            F.when(
                F.col("__have_img"), F.concat(F.lit("thumb-"), F.col("__img_key"))
            ).otherwise(F.lit(None).cast("string")),
        )
        .drop("__img_key", "__have_img")
    )


def thumbnail_blobs(images: DataFrame) -> DataFrame:
    """Materialize the thumbnail blob sink: content-addressed 64×64 JPEG
    thumbnails for every image row (the reference's thumbnails folder,
    __main__.py:26-28, as a binary-column table; the reference saves
    JPEG, thumbnailing.py:58-97 — real encode via images/jpeg.py)."""
    from cinescrapers_spark.images.ops import thumbnail_jpeg_udf

    return images.select(
        F.concat(F.lit("thumb-"), F.col("image_id")).alias("thumb_id"),
        thumbnail_jpeg_udf(F.col("bytes"), F.col("fmt")).alias("thumb_bytes"),
    )


class ShowtimesStore:
    """Snapshot-backed showtimes table with MERGE-by-id ingestion."""

    def __init__(self, spark: SparkSession, path: str, site_shortcodes: DataFrame):
        self.spark = spark
        self.table = SnapshotTable(path)
        # site → cinema_shortcode dimension (broadcast in every ingest)
        self.site_dim = site_shortcodes

    def read(self) -> DataFrame | None:
        if self.table.latest() is None:
            return None
        return self.table.read(self.spark)

    def ingest_pages(
        self,
        pages: DataFrame,
        now: datetime.datetime,
        tick: int,
        images: DataFrame | None = None,
    ) -> int:
        extracted = extract_showtimes(pages, now=now)
        with_code = extracted.join(
            F.broadcast(self.site_dim), "site", "inner"
        )  # FK join replaces the assert (ref __main__.py:384-385)
        enriched = enrich_showtimes(with_code, now=now).filter(
            F.col("title").isNotNull() & F.col("datetime").isNotNull()
        )
        if images is not None:
            enriched = attach_thumbnails(enriched, images)
        # preserve=["tmdb_id"]: the reference's ON CONFLICT DO UPDATE does
        # not SET tmdb_id (__main__.py:333-341) — re-scraped rows must not
        # wipe previously-identified TMDB ids with their fresh NULLs
        merged = merge_upsert(
            self.read(),
            enriched,
            key="id",
            order_col="last_updated",
            preserve=["tmdb_id"],
        )
        merged = merged.cache()
        n = merged.count()
        self.table.commit(merged, tick=tick, metrics={"rows": n}, row_count=n)
        merged.unpersist()
        return n

    # -- read paths ---------------------------------------------------------
    def current_showtimes(self, now: datetime.datetime, days: int = 90) -> DataFrame:
        """this_morning ≤ datetime ≤ now+days, ordered (ref :347-366)."""
        t0 = now.replace(hour=0, minute=0, second=0, microsecond=0)
        t1 = now + datetime.timedelta(days=days)
        return (
            self.read()
            .filter((F.col("datetime") >= F.lit(t0)) & (F.col("datetime") <= F.lit(t1)))
            .orderBy("datetime", "id")
        )

    def export_rows(self, now: datetime.datetime) -> DataFrame:
        """Export projection with description truncation (ref :386)."""
        return self.current_showtimes(now).select(
            "id",
            "cinema_shortcode",
            "title",
            "norm_title",
            "link",
            "datetime",
            F.substring("description", 1, 210).alias("description"),
            "image_src",
            "scraper",
        )

    def export_json(
        self, path: str, now: datetime.datetime, gzip_compress: bool = True
    ) -> None:
        """Write the export projection as (gzipped) JSON — the reference's
        showtimes.json artifact + gzip upload (ref __main__.py:369-391;
        upload.py:23-40 gz_compression=True). Dates serialize ISO via
        Spark's JSON writer; gzip is the codec the CDN path expects."""
        writer = self.export_rows(now).write.mode("overwrite")
        if gzip_compress:
            writer = writer.option("compression", "gzip")
        writer.json(path)

    def stats(self, now: datetime.datetime) -> dict:
        """The print_stats aggregates (ref :69-178) as one cached pass."""
        from cinescrapers_spark.functions.dates import next_month_boundary

        df = self.read().cache()
        month = next_month_boundary(now)
        total = df.count()
        next_month = df.filter(
            (F.col("datetime") >= F.lit(now)) & (F.col("datetime") < F.lit(month))
        )
        daily = (
            next_month.groupBy(F.to_date("datetime").alias("d"))
            .agg(F.countDistinct("norm_title").alias("c"))
        )
        row = daily.agg(
            F.floor(F.avg("c")).cast("long").alias("avg_daily"),
        ).first()
        titles = next_month.agg(F.countDistinct("norm_title")).first()[0]
        per_scraper = {
            r["scraper"]: (r["cnt"], r["mx"])
            for r in df.groupBy("scraper")
            .agg(F.count("*").alias("cnt"), F.max("last_updated").alias("mx"))
            .collect()
        }
        df.unpersist()
        return {
            "total": total,
            "distinct_titles_next_month": titles,
            "avg_daily_titles": row["avg_daily"] if row["avg_daily"] is not None else 0,
            "per_scraper": per_scraper,
        }
