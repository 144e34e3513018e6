"""Vectorized scalar-function library (Arrow-batched pandas UDFs + built-in
column expressions). Per ``input_hint``: no per-row Python anywhere."""

from cinescrapers_spark.functions.hashing import get_hashed_udf, showtime_id, movie_hash
from cinescrapers_spark.functions.titles import normalize_title_udf
from cinescrapers_spark.functions.urls import canonicalize_url_udf, url_host
from cinescrapers_spark.functions.text import extract_uk_postcode_udf, html_unescape_udf

__all__ = [
    "get_hashed_udf",
    "showtime_id",
    "movie_hash",
    "normalize_title_udf",
    "canonicalize_url_udf",
    "url_host",
    "extract_uk_postcode_udf",
    "html_unescape_udf",
]
