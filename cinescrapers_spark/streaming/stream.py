"""Structured Streaming binding for the ingest pipeline.

The engine's native operational mode is batch-incremental (snapshot ticks —
the reference's refresh loop, SURVEY §2.10). This module runs the SAME
transforms under ``readStream`` for deployments that want a continuous
pipeline: a file-source stream of fetched pages → extract → enrich →
``foreachBatch`` MERGE into the ShowtimesStore, plus a watermarked windowed
aggregate (late-data handling for the showtimes-per-window stat).
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from cinescrapers_spark.schemas import PAGE
from cinescrapers_spark.streaming.ingest import ShowtimesStore


def stream_pages(spark: SparkSession, pages_dir: str) -> DataFrame:
    """File-source stream of page batches (one parquet drop per tick)."""
    return spark.readStream.schema(PAGE).parquet(pages_dir)


def start_ingest_stream(
    spark: SparkSession,
    pages_dir: str,
    store: ShowtimesStore,
    checkpoint_dir: str,
    now: datetime.datetime,
) -> StreamingQuery:
    """pages stream → extract/enrich/MERGE per micro-batch.

    MERGE is not stream-native (needs the whole target), so it runs in
    ``foreachBatch`` — the standard Spark pattern for streaming upserts
    into a table store."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        store.ingest_pages(batch_df, now=now, tick=int(batch_id))

    return (
        stream_pages(spark, pages_dir)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


CARD = "url string, caption string"


def start_harvest_stream(
    spark: SparkSession,
    cards_dir: str,
    harvester,
    checkpoint_dir: str,
) -> StreamingQuery:
    """Streaming phrasing of the image+caption harvest (crawl/harvest.py):
    a file-source stream of parsed-card drops → per micro-batch, probe the
    image seen-set and acquire only first-ever-seen posters.

    foreachBatch is at-least-once, but ``harvest_tick`` commits are
    idempotent per tick and probe state as-of tick-1 — a replayed batch
    recomputes byte-identical rows and skips the landed commit, so the
    images table is effectively exactly-once."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        harvester.harvest_tick(batch_df, tick=int(batch_id) + 1)

    return (
        spark.readStream.schema(CARD)
        .parquet(cards_dir)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def windowed_event_counts(
    events_stream: DataFrame,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Watermarked tumbling-window distinct-ish count — the streaming
    phrasing of the daily-films stat (__main__.py:89-98); late rows beyond
    the watermark are dropped, duplicates by (window, event_id) survive
    at-least-once sources via dropDuplicates."""
    return (
        events_stream.withWatermark("ts", watermark)
        .dropDuplicates(["event_id"])
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("cnt"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "cnt",
        )
    )


DOC = "doc_id long, source string, text string"


def start_neardup_stream(
    spark: SparkSession,
    docs_dir: str,
    index,
    checkpoint_dir: str,
) -> StreamingQuery:
    """Streaming phrasing of incremental near-dup dedup
    (``plans/incremental.IncrementalNearDupIndex``): a file-source stream
    of document-batch drops → per micro-batch, probe + extend the
    persisted LSH index and commit the batch's verified pairs as a run.

    Exactly-once by the same argument as the harvest stream: foreachBatch
    is at-least-once, but ``add_batch`` probes state as-of tick-1 and all
    three commits (bands, toks, pairs) are idempotent per tick — a
    replayed batch recomputes byte-identical rows and skips landed
    commits."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        from cinescrapers_spark.plans.dedup import LSH_BUCKET_CAP

        tick = int(batch_id) + 1
        # unbounded ingest is exactly where boilerplate mega-buckets show
        # up, so the streaming binding probes with the batch suite's cap
        # (skipped buckets surface via index.skipped_buckets_last_batch)
        pairs = index.add_batch(batch_df, tick=tick, bucket_cap=LSH_BUCKET_CAP)
        index.pairs_table.commit(
            pairs, tick=tick, row_count=-2, tag="run", idempotent=True
        )
        pairs.unpersist()

    return (
        spark.readStream.schema(DOC)
        .parquet(docs_dir)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


EMB = "vec_id long, label long, embedding array<double>"


def start_ann_index_stream(
    spark: SparkSession,
    vecs_dir: str,
    index,
    checkpoint_dir: str,
    schema: str = EMB,
) -> StreamingQuery:
    """Streaming phrasing of incremental ANN indexing
    (``plans/incremental_ivf.IncrementalIVFIndex``): a file-source stream
    of embedding-batch drops → per micro-batch, assign against the
    persisted centroid generation and commit the batch's cell run
    (first batch trains the quantizer, exactly as in batch mode).

    Exactly-once by the same argument as the near-dup stream: foreachBatch
    is at-least-once, but ``add_batch`` is a pure function of (batch,
    persisted centroids) and both its commits are idempotent per
    (tick, tag) — a replayed batch recomputes byte-identical assignments
    and skips commits that already landed, so a kill at ANY point (between
    the centroid and cell commits included) resumes to the identical
    index state."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        index.add_batch(batch_df, tick=int(batch_id) + 1)

    return (
        spark.readStream.schema(schema)
        .parquet(vecs_dir)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def start_dedup_pipeline_stream(
    spark: SparkSession,
    docs_dir: str,
    index,
    components,
    checkpoint_dir: str,
) -> StreamingQuery:
    """The full streaming dedup pipeline: document-batch drops →
    per micro-batch, probe + extend the persisted LSH index
    (``IncrementalNearDupIndex``), commit the batch's verified pairs,
    and fold them into the persisted canonical labels
    (``plans.incremental_cc.IncrementalComponents``) — so the
    training-data question "which canonical document does this belong
    to" is answerable as data arrives, merges included.

    Exactly-once: foreachBatch is at-least-once, and every step is an
    idempotent per-tick commit over as-of-prior-tick reads (pairs:
    bands/toks/pairs tables; labels: nodes run + roots snapshot) — a
    replayed batch recomputes byte-identical rows and skips landed
    commits."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        from cinescrapers_spark.plans.dedup import LSH_BUCKET_CAP

        tick = int(batch_id) + 1
        pairs = index.add_batch(batch_df, tick=tick, bucket_cap=LSH_BUCKET_CAP)
        index.pairs_table.commit(
            pairs, tick=tick, row_count=-2, tag="run", idempotent=True
        )
        components.add_pairs(pairs.select("doc_a", "doc_b"), tick=tick)
        pairs.unpersist()

    return (
        spark.readStream.schema(DOC)
        .parquet(docs_dir)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
