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

    Columns: loc, lastmod, changefreq, priority, ord (stable output order:
    static pages in template order, then cinema pages per kind,
    alphabetical by loc — deterministic where the reference inherits
    Python-list definition order).
    """
    static = cinemas.sparkSession.createDataFrame(
        [
            (f"{SITE}{path}", changefreq, priority, i)
            for i, (path, changefreq, priority) in enumerate(STATIC_PAGES)
        ],
        ["loc", "changefreq", "priority", "ord"],
    ).select("loc", F.lit(today).alias("lastmod"), "changefreq", "priority", "ord")

    per_cinema = (
        cinemas.select(
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
            (F.lit(len(STATIC_PAGES)) + F.col("e.kind")).alias("ord"),
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
        for r in entries.orderBy("ord", "loc").collect()
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


def indexnow_payloads(
    cinemas: DataFrame, host: str = "filmhose.uk", key: str = "KEY"
) -> DataFrame:
    """One IndexNow POST payload per site URL (reference order:
    __main__.py:651-658 — root, /cinemas, then per-cinema page pairs).

    Columns: url, payload (the JSON body indexnow.py:20-25 builds:
    host/key/keyLocation/urlList=[url]).
    """
    spark = cinemas.sparkSession
    head = spark.createDataFrame(
        [(f"{SITE}/", 0), (f"{SITE}/cinemas", 1)], ["url", "ord"]
    )
    per_cinema = cinemas.select(
        F.explode(
            F.array(
                F.concat(F.lit(f"{SITE}/cinemas/"), F.col("shortname")),
                F.concat(F.lit(f"{SITE}/cinema-listings/"), F.col("shortcode")),
            )
        ).alias("url"),
        F.lit(2).alias("ord"),
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
    return urls.select("url", "ord", payload.alias("payload"))


def submit_indexnow(
    cinemas: DataFrame,
    post_fn: Callable[[str, str], int],
    host: str = "filmhose.uk",
    key: str = "KEY",
) -> int:
    """Drive the IndexNow submissions through ``post_fn(api_url, payload)``
    (injected: tests pass a recorder; production passes requests.post).
    Returns the number of submissions."""
    rows = indexnow_payloads(cinemas, host=host, key=key).orderBy("ord", "url").collect()
    for r in rows:
        post_fn("https://api.indexnow.org/IndexNow", r["payload"])
    return len(rows)
