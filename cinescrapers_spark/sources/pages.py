"""Synthetic fetch model — the sandbox stand-in for HTTP.

The reference fetches listing pages with a browser and expands pagination
in while-loops (``/root/reference/src/cinescrapers/scrapers/bertha/scrape.py:19-30``,
``barbican/scrape.py:21-28``). Here a "fetch" is a pure function of the
canonical URL: a deterministic hash decides whether the URL resolves and
which same-host outlinks the page exposes. The SAME function drives the
Spark engine (inside an Arrow-batched UDF) and the single-threaded Python
reference model, so crawl-equivalence tests compare semantics, not RNG.
"""

from __future__ import annotations

import hashlib

import pandas as pd

from cinescrapers_spark.functions.udf import lazy_pandas_udf

FAIL_MOD = 10          # 1 in 10 URLs "404"s
OUTLINKS_PER_PAGE = 3
PATH_SPACE = 400       # distinct /whats-on/pageN paths per host


def _h(s: str) -> int:
    return int.from_bytes(hashlib.sha256(s.encode()).digest()[:8], "big")


def fetch_ok(url_norm: str) -> bool:
    return _h("ok:" + url_norm) % FAIL_MOD != 0


def page_outlinks(url_norm: str) -> list[str]:
    """Deterministic same-host outlinks for a fetched page (raw forms —
    they go through the canonicalizer like any discovered URL)."""
    if not fetch_ok(url_norm):
        return []
    host = url_norm.split("://", 1)[1].split("/", 1)[0]
    out = []
    for i in range(OUTLINKS_PER_PAGE):
        n = _h(f"link:{url_norm}:{i}") % PATH_SPACE
        out.append(f"https://{host}/whats-on/page{n}")
    return out


@lazy_pandas_udf("array<string>")
def page_outlinks_udf(url_norm: pd.Series) -> pd.Series:
    return url_norm.map(page_outlinks)


@lazy_pandas_udf("boolean")
def fetch_ok_udf(url_norm: pd.Series) -> pd.Series:
    return url_norm.map(fetch_ok)
