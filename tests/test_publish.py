"""Golden tests for publish.py (sitemap + IndexNow sinks) against the
reference's generate_sitemap / submit_indexnow semantics
(/root/reference/src/cinescrapers/__main__.py:613-658, indexnow.py:12-30).
"""

from __future__ import annotations

import json
import re

from cinescrapers_spark.dims import cinemas_df
from cinescrapers_spark.publish import (
    STATIC_PAGES,
    indexnow_payloads,
    map_markers,
    render_map,
    render_sitemap,
    sitemap_entries,
    submit_indexnow,
)

TODAY = "2026-08-16"


def test_sitemap_structure(spark, tmp_path):
    cin = cinemas_df(spark)
    n_cinemas = cin.count()
    xml = render_sitemap(sitemap_entries(cin, TODAY))

    # header/footer shape of the reference template
    assert xml.startswith('<?xml version="1.0" encoding="UTF-8"?>\n<urlset')
    assert xml.rstrip().endswith("</urlset>")
    # one <url> block per static page + two per cinema
    assert xml.count("<url>") == len(STATIC_PAGES) + 2 * n_cinemas
    assert xml.count("<url>") == xml.count("</url>")
    # every lastmod is the injected date — never a wall-clock read
    assert set(re.findall(r"<lastmod>([^<]+)</lastmod>", xml)) == {TODAY}
    # the reference's per-cinema pair with its changefreq/priority
    locs = re.findall(r"<loc>([^<]+)</loc>", xml)
    shortnames = [r["shortname"] for r in cin.select("shortname").collect()]
    shortcodes = [r["shortcode"] for r in cin.select("shortcode").collect()]
    for sn in shortnames:
        assert f"https://filmhose.uk/cinemas/{sn}" in locs
    for sc in shortcodes:
        assert f"https://filmhose.uk/cinema-listings/{sc}" in locs
    # per-cinema blocks carry monthly/0.6 and daily/0.6 respectively
    blocks = re.findall(r"<url>(.*?)</url>", xml, re.S)
    for b in blocks:
        if "/cinemas/" in b and "/cinemas</loc>" not in b:
            assert "<changefreq>monthly</changefreq>" in b
            assert "<priority>0.6</priority>" in b
        if "/cinema-listings/" in b:
            assert "<changefreq>daily</changefreq>" in b
            assert "<priority>0.6</priority>" in b
    # static head pages in template order at the top
    assert locs[: len(STATIC_PAGES)] == [
        f"https://filmhose.uk{p}" for p, _, _ in STATIC_PAGES
    ]
    # reference per-cinema PAIR order (__main__.py:620-633): each cinema's
    # /cinemas/{shortname} page is immediately followed by its
    # /cinema-listings/{shortcode} page (cinemas with a unique shortname —
    # duplicate-shortname sites like the two electriccinema screens group
    # their pages adjacently instead)
    by_sn = {}
    for r in cin.select("shortname", "shortcode").collect():
        by_sn.setdefault(r["shortname"], []).append(r["shortcode"])
    for sn, codes in by_sn.items():
        if len(codes) != 1:
            continue
        i = locs.index(f"https://filmhose.uk/cinemas/{sn}")
        assert locs[i + 1] == f"https://filmhose.uk/cinema-listings/{codes[0]}"


def test_sitemap_deterministic(spark):
    cin = cinemas_df(spark)
    assert render_sitemap(sitemap_entries(cin, TODAY)) == render_sitemap(
        sitemap_entries(cin, TODAY)
    )


def test_indexnow_pair_order(spark):
    """Reference submit order (__main__.py:651-658): root, /cinemas, then
    per-cinema (detail page, listings page) pairs."""
    cin = cinemas_df(spark)
    posted = []
    submit_indexnow(cin, lambda api, body: posted.append(json.loads(body)) or 200)
    urls = [p["urlList"][0] for p in posted]
    assert urls[:2] == ["https://filmhose.uk/", "https://filmhose.uk/cinemas"]
    by_sn = {}
    for r in cin.select("shortname", "shortcode").collect():
        by_sn.setdefault(r["shortname"], []).append(r["shortcode"])
    for sn, codes in by_sn.items():
        if len(codes) != 1:
            continue
        i = urls.index(f"https://filmhose.uk/cinemas/{sn}")
        assert urls[i + 1] == f"https://filmhose.uk/cinema-listings/{codes[0]}"


def test_cinema_map(spark):
    """Map sink vs cinemap.py semantics: midpoint centre, one marker +
    label per cinema, popup fields, deterministic output."""
    cin = cinemas_df(spark)
    rows = cin.collect()
    html = render_map(map_markers(cin))
    lats = [r["latitude"] for r in rows]
    lons = [r["longitude"] for r in rows]
    center = [(min(lats) + max(lats)) / 2, (min(lons) + max(lons)) / 2]
    assert json.dumps(center) in html
    assert html.count('"name":') == len(rows)
    for r in rows:
        assert f'/cinemas/{r["shortname"]}' in html
        assert r["name"] in html
    # N/A fallback for null phone (cinemap.py:31)
    assert "<strong>Phone:</strong> N/A" in html
    assert html == render_map(map_markers(cin))


def test_indexnow_payloads_and_driver(spark):
    cin = cinemas_df(spark)
    n_cinemas = cin.count()
    rows = indexnow_payloads(cin, host="example.org", key="k123").collect()
    # reference submits root + /cinemas + 2 per cinema (__main__.py:651-658)
    assert len(rows) == 2 + 2 * n_cinemas
    for r in rows:
        p = json.loads(r["payload"])
        assert p["host"] == "example.org"
        assert p["key"] == "k123"
        assert p["keyLocation"] == "https://example.org/k123.txt"
        assert p["urlList"] == [r["url"]]

    posted = []
    n = submit_indexnow(cin, lambda api, body: posted.append((api, body)) or 200)
    assert n == len(posted) == 2 + 2 * n_cinemas
    assert posted[0][0] == "https://api.indexnow.org/IndexNow"
    assert json.loads(posted[0][1])["urlList"] == ["https://filmhose.uk/"]
    assert json.loads(posted[1][1])["urlList"] == ["https://filmhose.uk/cinemas"]
