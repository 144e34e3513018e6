"""Enrichment: ShowTime → EnrichedShowTime.

Clones the reference's per-row enrichment loop
(``/root/reference/src/cinescrapers/__main__.py:302-323``) as one column
pipeline: all-caps title fixup (:309-313, Python ``str.title`` semantics —
NOT initcap, which differs on apostrophes), ``norm_title``, content id
(:320 ← :181-183), ``last_updated`` (injected clock), ``scraper``.
"""

from __future__ import annotations

import datetime

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cinescrapers_spark.functions.hashing import showtime_id
from cinescrapers_spark.functions.titles import normalize_title_udf
from cinescrapers_spark.functions.udf import lazy_pandas_udf


@lazy_pandas_udf("string")
def py_title_udf(s: pd.Series) -> pd.Series:
    # pandas .str.title() == Python str.title per element — exact clone of
    # the reference's fixup; initcap("DON'T") would give "Don't" vs "Don'T"
    return s.str.title()


def titlecase_fixup(title_col) -> F.Column:
    """if title == title.upper(): title.title() (ref __main__.py:309-313)."""
    return F.when(title_col == F.upper(title_col), py_title_udf(title_col)).otherwise(
        title_col
    )


def enrich_showtimes(
    showtimes: DataFrame,
    now: datetime.datetime,
    scraper_col: str = "site",
) -> DataFrame:
    """Extractor output (+cinema_shortcode) → EnrichedShowTime columns."""
    fixed = showtimes.withColumn("title", titlecase_fixup(F.col("title")))
    return (
        fixed.withColumn("norm_title", normalize_title_udf("title"))
        .withColumn(
            "id",
            showtime_id(F.col("cinema_shortcode"), F.col("title"), F.col("datetime")),
        )
        .withColumn("last_updated", F.lit(now).cast("timestamp_ntz"))
        .withColumn("scraper", F.col(scraper_col))
        .withColumn("thumbnail", F.lit(None).cast("string"))
        .withColumn("tmdb_id", F.lit(None).cast("int"))
    )
