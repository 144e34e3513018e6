"""Content-addressed hashing.

The reference derives every identity — row ids, image cache keys, movie
identity — from one helper: sha256 → urlsafe-b64 → first 32 chars
(``/root/reference/src/cinescrapers/utils.py:50-53``; callers at
``__main__.py:183,218,428``). Byte-compatibility matters (ids must match
the reference's ids for the same logical row), and urlsafe base64 with
``=``-stripping has no exact Spark built-in chain, so this is a vectorized
pandas UDF. Frontier-scale hashing (the URL-seen set) uses Spark's native
``xxhash64`` instead — JVM-side, codegen'd, 64-bit — because the seen-set
needs speed, not reference byte-compat.
"""

from __future__ import annotations

import base64
import hashlib

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from cinescrapers_spark.functions.udf import lazy_pandas_udf


def get_hashed_py(s: str) -> str:
    """Reference-exact scalar (utils.py:50-53): 32-char urlsafe-b64 sha256."""
    digest = hashlib.sha256(s.encode("utf-8")).digest()
    return base64.urlsafe_b64encode(digest).decode("utf-8").rstrip("=")[:32]


@lazy_pandas_udf("string")
def get_hashed_udf(s: pd.Series) -> pd.Series:
    # hashlib releases the GIL per call and the strings are short; a
    # python-level map inside an Arrow batch is the honest vectorization
    # (sha256 has no columnar kernel in pandas/pyarrow).
    return s.map(lambda x: None if x is None else get_hashed_py(x))


def encode_cache_path_py(path: str) -> str:
    """Round-trippable cache key for an API path: urlsafe-b64, padding
    stripped (ref scrapers/rapidapi/scrape.py:38-39)."""
    return base64.urlsafe_b64encode(path.encode("utf-8")).decode("ascii").rstrip("=")


def decode_cache_path_py(encoded: str) -> str:
    """Inverse of encode_cache_path_py (ref rapidapi/scrape.py:42-44)."""
    padded = encoded + "=" * ((4 - len(encoded) % 4) % 4)
    return base64.urlsafe_b64decode(padded.encode("ascii")).decode("utf-8")


def encode_cache_path(path_col: Column) -> Column:
    """Column form, JVM-side: base64 is built-in (MIME-chunked at 76 chars
    in this Spark build — strip the line breaks); translate +/ → -_ and
    strip padding to match the urlsafe variant byte-for-byte."""
    unchunked = F.regexp_replace(F.base64(path_col.cast("binary")), "[\\r\\n]", "")
    return F.regexp_replace(F.translate(unchunked, "+/", "-_"), "=+$", "")


def fstr(c: Column) -> Column:
    """Python f-string rendering of a nullable value: None → the literal
    string "None" (``f"{None}"``), everything else via cast to string.
    ``concat_ws`` would silently *drop* NULL fields, splitting identities
    the reference's f-strings keep distinct."""
    return F.coalesce(c.cast("string"), F.lit("None"))


def py_datetime_str(dt: Column) -> Column:
    """``str(datetime)`` exactly: "YYYY-MM-DD HH:MM:SS" when microsecond==0,
    else "YYYY-MM-DD HH:MM:SS.ffffff" (6-digit zero-padded fraction)."""
    base = F.date_format(dt, "yyyy-MM-dd HH:mm:ss")
    micros = F.date_format(dt, "SSSSSS")
    rendered = F.when(
        micros != "000000", F.concat(base, F.lit("."), micros)
    ).otherwise(base)
    # NULL datetime → "None", like any other f-string field
    return F.coalesce(rendered, F.lit("None"))


def showtime_id(shortcode: Column, title: Column, dt: Column) -> Column:
    """Row id = hash(f"{shortcode}-{title}-{datetime}") (ref __main__.py:181-183),
    byte-compatible including str(datetime) microsecond rendering and
    f-string "None" for NULL fields."""
    key = F.concat(
        fstr(shortcode), F.lit("-"), fstr(title), F.lit("-"), py_datetime_str(dt)
    )
    return get_hashed_udf(key)


def movie_hash(norm_title: Column, description: Column, image_src: Column) -> Column:
    """Movie identity key = hash(f"{norm_title}-{description}-{image_src}")
    (ref __main__.py:425-428). NULL description/image_src render as "None",
    matching the Python f-string — every imageless listing hits this path."""
    return get_hashed_udf(
        F.concat(
            fstr(norm_title), F.lit("-"), fstr(description), F.lit("-"), fstr(image_src)
        )
    )
