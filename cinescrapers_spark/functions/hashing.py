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


def showtime_id(shortcode: Column, title: Column, dt: Column) -> Column:
    """Row id = hash(f"{shortcode}-{title}-{datetime}") (ref __main__.py:181-183).

    The reference formats the datetime via str(datetime) == "YYYY-MM-DD HH:MM:SS".
    """
    key = F.concat_ws(
        "-", shortcode, title, F.date_format(dt, "yyyy-MM-dd HH:mm:ss")
    )
    return get_hashed_udf(key)


def movie_hash(norm_title: Column, description: Column, image_src: Column) -> Column:
    """Movie identity key = hash(f"{norm_title}-{description}-{image_src}")
    (ref __main__.py:425-428)."""
    return get_hashed_udf(F.concat_ws("-", norm_title, description, image_src))
