"""Per-site extractor registry: fetched page bodies → ShowTime rows.

The reference has 27 imperative Playwright scrapers; structurally they
collapse into 6 families (SURVEY §2.1/§7.1-M4). Each family here is a
DataFrame transform ``pages → showtime rows`` (the UDTF analogue: one page
explodes into 0..n performances). Families whose encoding is structured
(embedded JSON, JSON-LD, meta tags, fixed-format tables) are parsed with
JVM built-ins (``from_json`` / ``regexp_extract_all`` / ``to_timestamp``)
— no Python at all; the free-form DOM families use one Arrow-batched
``mapInPandas`` regex parser.

Family → reference exemplar:
  events_json     arzner/rio/lexi        (arzner/scrape.py:21-44)
  og_meta_h2      actone/regentstreet/phoenix/throwleyyard (regentstreet/scrape.py:35-58)
  json_ld         coldharbourblue/castle (castle/scrape.py:60-71)
  calendar_table  close_up_film_centre   (close_up_film_centre/scrape.py:51-76)
  paginated_cards bertha/barbican/kiln   (bertha/scrape.py:19-30)
  bespoke_dom     ica/garden/genesis/…   (ica/scrape.py:19-87)
"""

from __future__ import annotations

import datetime
import re
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

from cinescrapers_spark.functions.dates import (
    parse_freetext_datetime_py,
    release_year_col,
    year_rollover,
)
from cinescrapers_spark.functions.text import html_unescape_udf

# Injected clock for fixture/test paths (the fixture epoch). Every extractor
# takes ``now`` explicitly — wall-clock never appears inside a plan.
DEFAULT_NOW = datetime.datetime(1998, 8, 1)

# kiln strips a rating suffix like " (PG)" from titles before anything else
# (ref scrapers/kiln/scrape.py:12,69-71)
_RATING_RE = re.compile(r"^(?P<title>.*) \([^\)]+\)$")
RATING_SUFFIX_SITES = {"kiln"}

# extractor output = ShowTime minus cinema_shortcode (joined from the site
# dimension afterwards), plus the page url for lineage
EXTRACTED = StructType(
    [
        StructField("url", StringType(), False),
        StructField("site", StringType(), False),
        StructField("title", StringType(), True),
        StructField("link", StringType(), True),
        StructField("datetime", TimestampNTZType(), True),
        StructField("description", StringType(), True),
        StructField("image_src", StringType(), True),
        StructField("release_year", IntegerType(), True),
    ]
)

_OUT_COLS = [f.name for f in EXTRACTED.fields]


# --------------------------------------------------------------------------
# events_json — page.evaluate("Events") (arzner:21-34): JSON global with
# html-escaped strings and split date/time ("%Y-%m-%d %H%M", arzner:34)
# --------------------------------------------------------------------------
_EVENTS_SCHEMA = (
    "struct<Events: array<struct<Title: string, URL: string, Synopsis: string,"
    " ImageURL: string, Performances: array<struct<StartDate: string,"
    " StartTime: string>>>>>"
)


def extract_events_json(
    pages: DataFrame, now: datetime.datetime = DEFAULT_NOW
) -> DataFrame:
    blob = F.regexp_extract(F.col("body"), r"Events\s*=\s*(\{.*\})", 1)
    ev = (
        pages.withColumn("__j", F.from_json(blob, _EVENTS_SCHEMA))
        .select("url", "site", F.explode("__j.Events").alias("e"))
        .select(
            "url",
            "site",
            F.col("e.Title").alias("ev_title"),
            F.col("e.URL").alias("ev_link"),  # struct URL ≠ page url (case-insensitive resolver)
            F.col("e.Synopsis").alias("ev_desc"),
            F.col("e.ImageURL").alias("ev_img"),
            F.explode("e.Performances").alias("p"),
        )
    )
    return ev.select(
        "url",
        "site",
        html_unescape_udf(F.col("ev_title")).alias("title"),
        F.col("ev_link").alias("link"),
        F.to_timestamp(
            F.concat_ws(" ", "p.StartDate", "p.StartTime"), "yyyy-MM-dd HHmm"
        ).cast("timestamp_ntz").alias("datetime"),
        html_unescape_udf(F.col("ev_desc")).alias("description"),
        F.col("ev_img").alias("image_src"),
        F.lit(None).cast("int").alias("release_year"),
    )


# --------------------------------------------------------------------------
# og_meta_h2 — og: meta tags + <h2>dd MMM HH:mm</h2> showtimes
# (regentstreet:35-58); release year from the description
# (utils.py:9 regex); year injected + rollover (utils.py:16-25)
# --------------------------------------------------------------------------
def _meta(prop: str):
    return F.regexp_extract(
        F.col("body"), rf'<meta property="og:{prop}" content="([^"]*)"', 1
    )


def extract_og_meta_h2(
    pages: DataFrame, now: datetime.datetime = DEFAULT_NOW
) -> DataFrame:
    now_year = now.year
    base = pages.select(
        "url",
        "site",
        F.nullif(_meta("title"), F.lit("")).alias("title"),
        F.nullif(_meta("url"), F.lit("")).alias("link"),
        F.nullif(_meta("description"), F.lit("")).alias("description"),
        F.nullif(_meta("image"), F.lit("")).alias("image_src"),
        F.expr(r"regexp_extract_all(body, '<h2>([^<]+)</h2>', 1)").alias("slots"),
    )
    ex = base.select(
        "*", F.explode("slots").alias("slot")
    ).withColumn(
        "dt_raw",
        F.to_timestamp(
            F.concat(F.regexp_extract("slot", r"(\d{1,2} \w{3} \d{2}:\d{2})", 1),
                     F.lit(f" {now_year}")),
            "d MMM HH:mm yyyy",
        ),
    )
    # year-rollover rule (utils.py:23-24): a year-less slot parsed late in
    # the year (now.month>6) with an early month (<3) belongs to next year —
    # the January-listing-scraped-in-November case
    rolled = year_rollover(F.col("dt_raw"), now)
    return ex.select(
        "url",
        "site",
        "title",
        F.coalesce("link", "url").alias("link"),
        rolled.cast("timestamp_ntz").alias("datetime"),
        "description",
        "image_src",
        release_year_col(F.col("description")).alias("release_year"),
    ).filter(F.col("datetime").isNotNull())


# --------------------------------------------------------------------------
# json_ld — <script type="application/ld+json"> ScreeningEvent blocks
# (castle:60-71): ISO startDate, filter on @type
# --------------------------------------------------------------------------
_LD_SCHEMA = (
    "struct<`@type`: string, name: string, startDate: string, url: string,"
    " image: string, description: string>"
)


def extract_json_ld(
    pages: DataFrame, now: datetime.datetime = DEFAULT_NOW
) -> DataFrame:
    scripts = F.expr(
        r"""regexp_extract_all(body,
            '<script type="application/ld\\+json">(.*?)</script>', 1)"""
    )
    ev = (
        pages.select("url", "site", F.explode(scripts).alias("raw"))
        .withColumn("__j", F.from_json(F.col("raw"), _LD_SCHEMA))
        .filter(F.col("__j.`@type`") == "ScreeningEvent")
    )
    return ev.select(
        "url",
        "site",
        F.col("__j.name").alias("title"),
        F.coalesce(F.col("__j.url"), F.col("url")).alias("link"),
        F.to_timestamp(F.col("__j.startDate")).cast("timestamp_ntz").alias("datetime"),
        F.col("__j.description").alias("description"),
        F.col("__j.image").alias("image_src"),
        F.lit(None).cast("int").alias("release_year"),
    )


# --------------------------------------------------------------------------
# calendar_table — "%d.%m.%y %I:%M %p" cells (close_up_film_centre:74-76)
# --------------------------------------------------------------------------
def extract_calendar_table(
    pages: DataFrame, now: datetime.datetime = DEFAULT_NOW
) -> DataFrame:
    rows = F.expr(r"regexp_extract_all(body, '<tr class=.day.>(.*?)</tr>', 1)")
    ex = pages.select("url", "site", F.explode(rows).alias("row"))
    parsed = F.to_timestamp(
        F.regexp_extract("row", r"(\d{2}\.\d{2}\.\d{2} \d{1,2}:\d{2} [AP]M)", 1),
        "dd.MM.yy h:mm a",
    )
    # Spark's `yy` pivots at 2000..2099; the reference parses with Python
    # strptime %y (69..99 → 19xx). Re-apply the Python pivot.
    pivoted = F.when(F.year(parsed) >= 2069, parsed - F.expr("INTERVAL 100 YEARS")).otherwise(
        parsed
    )
    return ex.select(
        "url",
        "site",
        F.regexp_extract("row", r'<a href="[^"]*">([^<]+)</a>', 1).alias("title"),
        F.regexp_extract("row", r'<a href="([^"]*)"', 1).alias("link"),
        pivoted.cast("timestamp_ntz").alias("datetime"),
        F.lit(None).cast("string").alias("description"),
        F.regexp_extract("row", r'<img src="([^"]*)"', 1).alias("image_src"),
        F.lit(None).cast("int").alias("release_year"),
    ).filter(F.col("datetime").isNotNull() & (F.col("title") != ""))


# --------------------------------------------------------------------------
# paginated_cards + bespoke_dom — free-form DOM: one Arrow-batched
# mapInPandas regex parser (the honest stand-in for a DOM walk)
# --------------------------------------------------------------------------
_CARD_RE = re.compile(
    r'<div class="card">.*?<h3>(?P<title>[^<]*)</h3>.*?'
    r'<a href="(?P<link>[^"]*)".*?datetime="(?P<dt>[^"]*)"'
    r'(?:.*?<img src="(?P<img>[^"]*)")?.*?</div>',
    re.S,
)
_ARTICLE_RE = re.compile(
    r"<article>.*?<h3>(?P<title>[^<]*)</h3>.*?"
    r'<a href="(?P<link>[^"]*)".*?'
    r'<time(?: datetime="(?P<dt>[^"]*)")?>(?P<dttext>[^<]*)</time>.*?</a>'
    r'(?:<p class="desc">(?P<desc>[^<]*)</p>)?.*?</article>',
    re.S,
)


def _dom_extractor(pattern: re.Pattern) -> Callable[..., DataFrame]:
    def run(pages: DataFrame, now: datetime.datetime = DEFAULT_NOW) -> DataFrame:
        def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                out = []
                for url, site, body in zip(pdf["url"], pdf["site"], pdf["body"]):
                    if not body:
                        continue
                    strip_rating = site in RATING_SUFFIX_SITES
                    for m in pattern.finditer(body):
                        g = m.groupdict()
                        title = g.get("title")
                        if strip_rating and title:
                            rm = _RATING_RE.match(title)
                            if rm:
                                title = rm.group("title")
                        if g.get("dt"):  # machine-readable attr: ISO parse
                            dt = pd.to_datetime(g["dt"], errors="coerce")
                            if dt is not pd.NaT and dt.tzinfo is not None:
                                # tz-aware instant → naive London wall time
                                # (ref barbican/scrape.py:74-77)
                                dt = dt.tz_convert("Europe/London").tz_localize(
                                    None
                                )
                        else:  # free-text date (the dateparser call sites)
                            dt = parse_freetext_datetime_py(g.get("dttext"), now)
                        out.append(
                            {
                                "url": url,
                                "site": site,
                                "title": title,
                                "link": g.get("link"),
                                "datetime": dt,
                                "description": g.get("desc"),
                                "image_src": g.get("img"),
                                "release_year": None,
                            }
                        )
                yield pd.DataFrame(out, columns=_OUT_COLS) if out else pd.DataFrame(
                    columns=_OUT_COLS
                )

        return pages.select("url", "site", "body").mapInPandas(parse, schema=EXTRACTED)

    return run


extract_paginated_cards = _dom_extractor(_CARD_RE)
extract_bespoke_dom = _dom_extractor(_ARTICLE_RE)


EXTRACTORS: dict[str, Callable[[DataFrame], DataFrame]] = {
    "events_json": extract_events_json,
    "og_meta_h2": extract_og_meta_h2,
    "json_ld": extract_json_ld,
    "calendar_table": extract_calendar_table,
    "paginated_cards": extract_paginated_cards,
    "bespoke_dom": extract_bespoke_dom,
}


def extract_showtimes(
    pages: DataFrame, now: datetime.datetime = DEFAULT_NOW
) -> DataFrame:
    """Dispatch pages to their family extractor and union the results —
    the registry dispatch mirror of get_scrapers (__main__.py:38-66).
    ``now`` is the injected clock for year-less date parses (rollover)."""
    parts = [
        fn(pages.filter(F.col("family") == fam), now=now)
        for fam, fn in EXTRACTORS.items()
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
