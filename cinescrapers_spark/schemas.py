"""Fixed StructType schemas for the engine.

The reference declares its row types as pydantic models
(``/root/reference/src/cinescrapers/cinescrapers_types.py:8-45``); here the
same shapes are declared as Spark ``StructType``s — validation moves from
construct-time exceptions to PERMISSIVE parsing with a ``_corrupt`` bucket.

The authoritative input shape (BASELINE.json ``input_hint``) is the
``images`` table: ``(image_id string, bytes binary, w int, h int,
fmt string, caption string, phash bigint)``.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

# ShowTime — the unit every extractor emits
# (ref: cinescrapers_types.py:27-35).
SHOWTIME = StructType(
    [
        StructField("cinema_shortcode", StringType(), False),
        StructField("title", StringType(), False),
        StructField("link", StringType(), False),
        StructField("datetime", TimestampNTZType(), False),
        StructField("description", StringType(), True),
        StructField("image_src", StringType(), True),
        StructField("release_year", IntegerType(), True),
    ]
)

# EnrichedShowTime — ShowTime + derived columns
# (ref: cinescrapers_types.py:38-45; enrichment at __main__.py:302-323).
ENRICHED_SHOWTIME = StructType(
    list(SHOWTIME.fields)
    + [
        StructField("id", StringType(), False),
        StructField("norm_title", StringType(), False),
        StructField("thumbnail", StringType(), True),
        StructField("last_updated", TimestampNTZType(), False),
        StructField("scraper", StringType(), False),
        StructField("tmdb_id", IntegerType(), True),
    ]
)

# Cinema dimension (ref: cinescrapers_types.py:8-24, 27 static rows).
CINEMA = StructType(
    [
        StructField("shortcode", StringType(), False),
        StructField("shortname", StringType(), False),
        StructField("name", StringType(), False),
        StructField("url", StringType(), False),
        StructField("address", StringType(), False),
        StructField("phone", StringType(), True),
        StructField("latitude", DoubleType(), False),
        StructField("longitude", DoubleType(), False),
        StructField("postcode", StringType(), True),  # computed (utils.py:28-47)
    ]
)

# images — authoritative input table (BASELINE.json input_hint, verbatim).
IMAGES = StructType(
    [
        StructField("image_id", StringType(), False),
        StructField("bytes", BinaryType(), True),
        StructField("w", IntegerType(), True),
        StructField("h", IntegerType(), True),
        StructField("fmt", StringType(), True),
        StructField("caption", StringType(), True),
        StructField("phash", LongType(), True),
    ]
)

# frontier — the crawl state table (generalizes the refresh scheduler,
# __main__.py:497-548). One row per known URL.
FRONTIER = StructType(
    [
        StructField("url", StringType(), False),          # raw discovered form
        StructField("url_norm", StringType(), False),     # RFC3986-canonical
        StructField("url_hash", LongType(), False),       # xxhash64(url_norm)
        StructField("host", StringType(), False),
        StructField("host_salt", IntegerType(), False),   # skew-kill partition key
        StructField("host_rank", DoubleType(), False),
        StructField("crawl_delay", DoubleType(), False),  # robots politeness (sec)
        StructField("priority", DoubleType(), False),     # host_rank * recency
        StructField("discovered_tick", IntegerType(), False),
        StructField("last_fetch_tick", IntegerType(), True),
        StructField("state", StringType(), False),        # pending|fetched|failed
        StructField("retries", IntegerType(), False),
        StructField("depth", IntegerType(), False),       # crawl depth budget
    ]
)

# hosts — politeness dimension (generalizes the 27-row cinemas table into
# host → robots rules; broadcast-joined).
HOST = StructType(
    [
        StructField("host", StringType(), False),
        StructField("host_rank", DoubleType(), False),
        StructField("crawl_delay", DoubleType(), False),
        StructField("robots_disallow", ArrayType(StringType()), True),
        StructField("max_per_tick", IntegerType(), False),
    ]
)

# pages — synthetic fetch corpus (FIXTURES.md §3).
PAGE = StructType(
    [
        StructField("url", StringType(), False),
        StructField("site", StringType(), False),
        StructField("family", StringType(), False),
        StructField("body", StringType(), True),
        StructField("fetched_tick", IntegerType(), True),
    ]
)
