"""URL canonicalization (RFC 3986-style) — the frontier's identity function.

The reference canonicalizes URLs piecemeal per scraper — ``//`` → ``https:``
(``/root/reference/src/cinescrapers/scrapers/ica/scrape.py:49-50``), relative
→ absolute (``close_up_film_centre/scrape.py:37,42``), ``startswith("http")``
guards (``castle/scrape.py:33-34``). The north rule requires one engine-level
canonicalizer: resolve relative refs, lowercase scheme+host, drop fragments,
strip tracking params, drop default ports, normalize empty path to ``/``.

Implemented as a pandas UDF (urllib parsing is Python-only), plus cheap
JVM-side helpers (``parse_url``) for host extraction on already-canonical
URLs so the hot scheduling path stays in codegen.
"""

from __future__ import annotations

from urllib.parse import parse_qsl, urlencode, urljoin, urlsplit, urlunsplit

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from cinescrapers_spark.functions.udf import lazy_pandas_udf

# Tracking params stripped by canonicalization (north_rule: "strip tracking
# params"). Prefix match for utm_*; exact match otherwise.
TRACKING_PREFIXES = ("utm_",)
TRACKING_EXACT = frozenset(
    {"fbclid", "gclid", "dclid", "msclkid", "mc_cid", "mc_eid", "igshid", "ref"}
)

_DEFAULT_PORTS = {"http": "80", "https": "443"}


def canonicalize_url_py(url: str, base: str | None = None) -> str | None:
    """Scalar canonicalizer. Returns None for unusable URLs (data:, mailto:,
    javascript:, empty) — the engine routes those to _corrupt, mirroring the
    reference's skip of ``data:`` URIs (``__main__.py:215-217``)."""
    if url is None:
        return None
    url = url.strip()
    if not url:
        return None
    low = url.lower()
    if low.startswith(("data:", "mailto:", "javascript:", "tel:", "about:")):
        return None
    if url.startswith("//"):
        url = "https:" + url  # scheme-relative (ref ica/scrape.py:49-50)
    if base:
        url = urljoin(base, url)
    try:
        parts = urlsplit(url)
    except ValueError:
        return None
    scheme = parts.scheme.lower()
    if scheme not in ("http", "https"):
        return None
    host = parts.hostname
    if not host:
        return None
    host = host.lower().rstrip(".")
    port = parts.port
    netloc = host
    if port is not None and str(port) != _DEFAULT_PORTS.get(scheme):
        netloc = f"{host}:{port}"
    path = parts.path or "/"
    # collapse duplicate slashes but keep the path otherwise verbatim
    while "//" in path:
        path = path.replace("//", "/")
    q = [
        (k, v)
        for k, v in parse_qsl(parts.query, keep_blank_values=True)
        if not (k.lower().startswith(TRACKING_PREFIXES) or k.lower() in TRACKING_EXACT)
    ]
    q.sort()  # param order is not identity
    query = urlencode(q)
    return urlunsplit((scheme, netloc, path, query, ""))  # fragment dropped


@lazy_pandas_udf("string")
def canonicalize_url_udf(url: pd.Series, base: pd.Series) -> pd.Series:
    return pd.Series(
        [canonicalize_url_py(u, b) for u, b in zip(url, base)],
        index=url.index,
        dtype=object,
    )


def url_host(url_col: Column) -> Column:
    """JVM-side host extraction for already-canonical URLs (stays in
    whole-stage codegen; used on the hot scheduling path)."""
    return F.lower(F.parse_url(url_col, F.lit("HOST")))
