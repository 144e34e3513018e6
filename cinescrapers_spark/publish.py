"""Publishing sinks — sitemap.xml generation and IndexNow submission
payloads, re-expressed as DataFrame programs.

Reference analogue: ``/root/reference/src/cinescrapers/__main__.py:613-658``
(generate_sitemap: two <url> entries per cinema spliced into a static
template with today's date) and ``indexnow.py:12-30`` (one POST payload per
site URL). Both are tiny driver-side artifacts in the reference; here the
entry/payload *derivation* is a DataFrame over the cinemas dimension (so at
a 10^5-site scale the per-site expansion, ordering, and rendering distribute
and only the final XML assembly lands on the driver — an export artifact,
not a data plane), and the network POST is injected (the sandbox has no
network; production passes a real ``post_fn``).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SITE = "https://filmhose.uk"

# (path, changefreq, priority) — the static head of the reference template
# (sitemap.xml.template), in template order.
STATIC_PAGES = [
    ("/", "weekly", "1.0"),
    ("/distilled", "daily", "0.9"),
    ("/hosepipe", "daily", "0.8"),
    ("/cinemas", "monthly", "0.8"),
    ("/titles", "daily", "0.7"),
    ("/about", "monthly", "0.5"),
    ("/help", "monthly", "0.5"),
]


def sitemap_entries(cinemas: DataFrame, today: str) -> DataFrame:
    """cinemas(shortcode, shortname, ...) → one row per sitemap <url> entry.

    Per cinema, the reference's two pages (__main__.py:620-633):
    /cinemas/{shortname} (monthly, 0.6) and /cinema-listings/{shortcode}
    (daily, 0.6). ``today`` is injected (never now() inside the plan —
    determinism discipline, SURVEY §7.3).

    Columns: loc, lastmod, changefreq, priority, ord, shortname, kind
    (stable output order: static pages in template order, then the
    reference's per-cinema PAIRS — /cinemas/{shortname} immediately
    followed by /cinema-listings/{shortcode} — cinemas alphabetical by
    shortname, deterministic where the reference inherits Python-list
    definition order).
    """
    static = cinemas.sparkSession.createDataFrame(
        [
            (f"{SITE}{path}", changefreq, priority, i)
            for i, (path, changefreq, priority) in enumerate(STATIC_PAGES)
        ],
        ["loc", "changefreq", "priority", "ord"],
    ).select(
        "loc",
        F.lit(today).alias("lastmod"),
        "changefreq",
        "priority",
        "ord",
        F.lit("").alias("shortname"),
        F.lit(0).alias("kind"),
    )

    per_cinema = (
        cinemas.select(
            F.col("shortname").alias("sn"),
            F.explode(
                F.array(
                    F.struct(
                        F.concat(F.lit(f"{SITE}/cinemas/"), F.col("shortname")).alias(
                            "loc"
                        ),
                        F.lit("monthly").alias("changefreq"),
                        F.lit("0.6").alias("priority"),
                        F.lit(0).alias("kind"),
                    ),
                    F.struct(
                        F.concat(
                            F.lit(f"{SITE}/cinema-listings/"), F.col("shortcode")
                        ).alias("loc"),
                        F.lit("daily").alias("changefreq"),
                        F.lit("0.6").alias("priority"),
                        F.lit(1).alias("kind"),
                    ),
                )
            ).alias("e"),
        )
        .select(
            F.col("e.loc").alias("loc"),
            F.lit(today).alias("lastmod"),
            F.col("e.changefreq").alias("changefreq"),
            F.col("e.priority").alias("priority"),
            F.lit(len(STATIC_PAGES)).alias("ord"),
            F.col("sn").alias("shortname"),
            F.col("e.kind").alias("kind"),
        )
    )
    return static.unionByName(per_cinema)


def render_sitemap(entries: DataFrame) -> str:
    """Entries → the sitemap.xml document (reference template shape)."""
    blocks = [
        (
            "    <url>\n"
            f"        <loc>{r['loc']}</loc>\n"
            f"        <lastmod>{r['lastmod']}</lastmod>\n"
            f"        <changefreq>{r['changefreq']}</changefreq>\n"
            f"        <priority>{r['priority']}</priority>\n"
            "    </url>"
        )
        for r in entries.orderBy("ord", "shortname", "kind", "loc").collect()
    ]
    return (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n\n'
        + "\n\n".join(blocks)
        + "\n\n</urlset>\n"
    )


def write_sitemap(cinemas: DataFrame, today: str, path: str) -> int:
    """Generate and write sitemap.xml; returns the entry count."""
    entries = sitemap_entries(cinemas, today)
    xml = render_sitemap(entries)
    with open(path, "w", encoding="utf-8") as f:
        f.write(xml)
    return len(xml.split("<url>")) - 1


def map_markers(cinemas: DataFrame) -> DataFrame:
    """cinemas → one map-marker row per cinema with the reference's popup
    content (``cinemap.py:27-44``: name, address/phone with N/A fallback,
    a /cinemas/{shortname} detail link and the official-site link) plus the
    shortname label (``cinemap.py:55-62``).

    The marker *derivation* is a DataFrame (at a 10^5-venue scale the popup
    rendering distributes); only the final HTML assembly lands on the
    driver — an export artifact, like the sitemap.
    """
    popup = F.concat(
        F.lit('<div style="width: 300px; font-family: Arial, sans-serif;">'),
        F.lit('<h3 style="margin: 0 0 10px 0; color: #333;">'),
        F.col("name"),
        F.lit("</h3><p><strong>Address:</strong> "),
        F.coalesce(F.col("address"), F.lit("N/A")),
        F.lit("</p><p><strong>Phone:</strong> "),
        F.coalesce(F.col("phone"), F.lit("N/A")),
        F.lit('</p><a href="/cinemas/'),
        F.col("shortname"),
        F.lit('" target="_blank">View Cinema Details</a> <a href="'),
        F.col("url"),
        F.lit('" target="_blank">Official Website</a></div>'),
    )
    return cinemas.select(
        "shortcode",
        "shortname",
        "name",
        "latitude",
        "longitude",
        popup.alias("popup_html"),
    )


def render_map(markers: DataFrame) -> str:
    """Markers → a self-contained Leaflet HTML document (the same library
    folium emits; tiles/JS load from CDN in a browser — the document itself
    is deterministic). Map centre = midpoint of the lat/lon extremes
    (``cinemap.py:12-15``), zoom 10, one marker + one shortname label per
    cinema (``cinemap.py:47-62``)."""
    import json as _json

    b = markers.agg(
        F.min("latitude").alias("lat0"),
        F.max("latitude").alias("lat1"),
        F.min("longitude").alias("lon0"),
        F.max("longitude").alias("lon1"),
    ).first()
    center = [(b["lat0"] + b["lat1"]) / 2, (b["lon0"] + b["lon1"]) / 2]
    rows = [
        {
            "lat": r["latitude"],
            "lon": r["longitude"],
            "name": r["name"],
            "label": r["shortname"],
            "popup": r["popup_html"],
        }
        for r in markers.orderBy("shortname", "shortcode").collect()
    ]
    return (
        "<!DOCTYPE html>\n<html>\n<head>\n<meta charset=\"utf-8\"/>\n"
        "<title>Cinema map</title>\n"
        '<link rel="stylesheet" href="https://unpkg.com/leaflet@1.9.4/dist/leaflet.css"/>\n'
        '<script src="https://unpkg.com/leaflet@1.9.4/dist/leaflet.js"></script>\n'
        "<style>#map{height:100vh;margin:0}</style>\n</head>\n<body>\n"
        '<div id="map"></div>\n<script>\n'
        f"var center = {_json.dumps(center)};\n"
        f"var markers = {_json.dumps(rows, sort_keys=True)};\n"
        "var map = L.map('map').setView(center, 10);\n"
        "L.tileLayer('https://tile.openstreetmap.org/{z}/{x}/{y}.png',"
        " {attribution: '&copy; OpenStreetMap'}).addTo(map);\n"
        "markers.forEach(function (m) {\n"
        "  L.marker([m.lat, m.lon], {title: m.name}).addTo(map)"
        ".bindPopup(m.popup, {maxWidth: 350}).bindTooltip(m.name);\n"
        "  L.marker([m.lat, m.lon], {icon: L.divIcon({html:"
        " '<div style=\"font-size:1.5rem;font-weight:bold;color:#333;"
        "white-space:nowrap;text-align:center;"
        "text-shadow:0px 0px 4px rgba(255,255,255,1);\">' + m.label + '</div>',"
        " iconSize: [100, 20], iconAnchor: [50, 0]})}).addTo(map);\n"
        "});\n</script>\n</body>\n</html>\n"
    )


def write_map(cinemas: DataFrame, path: str) -> int:
    """Generate and write the cinema map HTML; returns the marker count."""
    markers = map_markers(cinemas)
    html = render_map(markers)
    with open(path, "w", encoding="utf-8") as f:
        f.write(html)
    return markers.count()


def indexnow_payloads(
    cinemas: DataFrame, host: str = "filmhose.uk", key: str = "KEY"
) -> DataFrame:
    """One IndexNow POST payload per site URL (reference order:
    __main__.py:651-658 — root, /cinemas, then per-cinema page PAIRS:
    /cinemas/{shortname} immediately followed by
    /cinema-listings/{shortcode}; cinemas alphabetical by shortname,
    deterministic where the reference inherits list definition order).

    Columns: url, payload (the JSON body indexnow.py:20-25 builds:
    host/key/keyLocation/urlList=[url]).
    """
    spark = cinemas.sparkSession
    head = spark.createDataFrame(
        [(f"{SITE}/", 0, "", 0), (f"{SITE}/cinemas", 1, "", 0)],
        ["url", "ord", "shortname", "kind"],
    )
    per_cinema = cinemas.select(
        F.col("shortname").alias("sn"),
        F.explode(
            F.array(
                F.struct(
                    F.concat(F.lit(f"{SITE}/cinemas/"), F.col("shortname")).alias("url"),
                    F.lit(0).alias("kind"),
                ),
                F.struct(
                    F.concat(
                        F.lit(f"{SITE}/cinema-listings/"), F.col("shortcode")
                    ).alias("url"),
                    F.lit(1).alias("kind"),
                ),
            )
        ).alias("e"),
    ).select(
        F.col("e.url").alias("url"),
        F.lit(2).alias("ord"),
        F.col("sn").alias("shortname"),
        F.col("e.kind").alias("kind"),
    )
    urls = head.unionByName(per_cinema)
    payload = F.to_json(
        F.struct(
            F.lit(host).alias("host"),
            F.lit(key).alias("key"),
            F.lit(f"https://{host}/{key}.txt").alias("keyLocation"),
            F.array(F.col("url")).alias("urlList"),
        )
    )
    return urls.select("url", "ord", "shortname", "kind", payload.alias("payload"))


def submit_indexnow(
    cinemas: DataFrame,
    post_fn: Callable[[str, str], int],
    host: str = "filmhose.uk",
    key: str = "KEY",
) -> int:
    """Drive the IndexNow submissions through ``post_fn(api_url, payload)``
    (injected: tests pass a recorder; production passes requests.post).
    Returns the number of submissions."""
    rows = (
        indexnow_payloads(cinemas, host=host, key=key)
        .orderBy("ord", "shortname", "kind", "url")
        .collect()
    )
    for r in rows:
        post_fn("https://api.indexnow.org/IndexNow", r["payload"])
    return len(rows)
