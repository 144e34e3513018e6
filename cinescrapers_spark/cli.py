"""User-facing CLI — every command a reference user runs today
(``/root/reference/src/cinescrapers/__main__.py:395-668``), backed by the
Spark engine. A reference user switches repos and keeps their workflow:

    python -m cinescrapers_spark.cli list-scrapers
    python -m cinescrapers_spark.cli scrape rio        --store /tmp/st
    python -m cinescrapers_spark.cli refresh [-a]      --store /tmp/st
    python -m cinescrapers_spark.cli stats             --store /tmp/st
    python -m cinescrapers_spark.cli list-films        --store /tmp/st
    python -m cinescrapers_spark.cli export-json       --store /tmp/st --out /tmp/showtimes.json
    python -m cinescrapers_spark.cli grab-tmdb-ids     --store /tmp/st
    python -m cinescrapers_spark.cli generate-sitemap  --out /tmp/sitemap.xml
    python -m cinescrapers_spark.cli generate-map      --out /tmp/cinema_map.html
    python -m cinescrapers_spark.cli submit-indexnow   --dry-run

The sandbox has no network, so "fetching" a site yields its deterministic
fixture pages (``sources/fixtures.py`` — the same page corpus the golden
tests gate) and IndexNow runs --dry-run by default; production swaps the
fetch/post functions. ``--now`` pins the clock for determinism (refresh
staleness, stats windows, export horizon) — defaults to the fixture epoch.
"""

from __future__ import annotations

import argparse
import datetime
import sys

import pandas as pd

MAX_STALENESS_DAYS = 5  # ref __main__.py:34-35

FIXTURE_NOW = datetime.datetime(1998, 8, 1, 9, 0, 0)


def _spark():
    from cinescrapers_spark.session import get_spark

    spark = get_spark(app_name="cinescrapers-cli")
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _store(spark, path: str):
    from pyspark.sql import functions as F  # noqa: F401

    from cinescrapers_spark.dims import CINEMA_SITES
    from cinescrapers_spark.streaming.ingest import ShowtimesStore

    dim = spark.createDataFrame(
        pd.DataFrame(
            [{"site": s, "cinema_shortcode": c} for c, s, _ in CINEMA_SITES]
        )
    ).dropDuplicates(["site"])
    return ShowtimesStore(spark, path, dim)


def _pages_for(spark, sites: list[str] | None):
    from cinescrapers_spark.schemas import PAGE
    from cinescrapers_spark.sources.fixtures import generate_pages

    pages, _ = generate_pages(n_per_site=2)
    if sites is not None:
        pages = [p for p in pages if p["site"] in sites]
    if not pages:
        # guard on the Python list: a columnless pandas frame vs the 5-field
        # PAGE schema raises inside createDataFrame, so the caller could
        # never reach a count()==0 check (ADVICE r2)
        return None
    return spark.createDataFrame(pd.DataFrame(pages), schema=PAGE)


def cmd_list_scrapers(args) -> int:
    from cinescrapers_spark.sources.fixtures import FAMILY_SITES

    print("Available scrapers:\n")
    for family, sites in sorted(FAMILY_SITES.items()):
        for site in sites:
            print(f" - {site}  ({family})")
    print()
    return 0


def cmd_scrape(args) -> int:
    spark = _spark()
    store = _store(spark, args.store)
    now = args.now
    pages = _pages_for(spark, [args.scraper])
    if pages is None:
        print(f"unknown scraper: {args.scraper}", file=sys.stderr)
        return 2
    n = store.ingest_pages(pages, now=now, tick=args.tick)
    print(f"{args.scraper}: upserted into store ({n} rows total)")
    return 0


def cmd_refresh(args) -> int:
    """Staleness-driven re-scrape (ref __main__.py:497-548): a scraper runs
    iff its MAX(last_updated) is older than MAX_STALENESS_DAYS or it has
    never run; -a forces all."""
    from cinescrapers_spark.sources.fixtures import FAMILY_SITES

    spark = _spark()
    store = _store(spark, args.store)
    now = args.now
    all_sites = sorted(s for sites in FAMILY_SITES.values() for s in sites)
    if args.all or store.read() is None:
        due = all_sites
    else:
        per = store.stats(now)["per_scraper"]
        cutoff = now - datetime.timedelta(days=MAX_STALENESS_DAYS)
        due = [
            s
            for s in all_sites
            if s not in per or per[s][1] is None or per[s][1] < cutoff
        ]
    pages = None if not due else _pages_for(spark, due)
    if pages is None:
        print("all scrapers fresh — nothing to do")
        return 0
    n = store.ingest_pages(pages, now=now, tick=args.tick)
    print(f"refreshed {len(due)} scrapers: {', '.join(due)} ({n} rows total)")
    return 0


def cmd_stats(args) -> int:
    spark = _spark()
    store = _store(spark, args.store)
    if store.read() is None:
        print("empty store", file=sys.stderr)
        return 2
    now = args.now
    s = store.stats(now)
    month = s.get("distinct_titles_next_month", 0)
    print(f"Total showtimes in db: {s['total']}")
    print(f"Average number of films showing per day for the next month: "
          f"{s['avg_daily_titles']}")
    print(f"Total films for the next month: {month}")
    print(f"Scrapers with data: {len(s['per_scraper'])}")
    # per-scraper blocks (ref __main__.py:140-157), incl. the reference's
    # doubled " ago" (naturaltime already ends in "ago")
    from cinescrapers_spark.functions.dates import naturaltime_py

    for scraper in sorted(s["per_scraper"]):
        count, latest = s["per_scraper"][scraper]
        print()
        print(scraper)
        print("-" * len(scraper))
        print(f"Showtimes: {count}")
        if latest is None:
            print("No updates found")
        else:
            print(f"Last updated: {naturaltime_py(now - latest)} ago")
    return 0


def cmd_list_films(args) -> int:
    """Sorted distinct normalized titles (ref __main__.py:485-495)."""
    from pyspark.sql import functions as F

    spark = _spark()
    store = _store(spark, args.store)
    if store.read() is None:
        print("empty store", file=sys.stderr)
        return 2
    for r in (
        store.read().select("norm_title").distinct().orderBy("norm_title").collect()
    ):
        print(r["norm_title"])
    return 0


def cmd_export_json(args) -> int:
    spark = _spark()
    store = _store(spark, args.store)
    if store.read() is None:
        print("empty store", file=sys.stderr)
        return 2
    store.export_json(args.out, now=args.now, gzip_compress=not args.no_gzip)
    print(f"exported current showtimes to {args.out}")
    return 0


def cmd_grab_tmdb_ids(args) -> int:
    """Film-identification lifecycle (ref grab_tmdb_ids, __main__.py:406-466)
    over the store; the candidate index is the deterministic synthetic dim
    (production points this at a real TMDB snapshot table)."""
    from pyspark.sql import functions as F

    from cinescrapers_spark.operators.identify import (
        identify_films,
        synthetic_candidates_from,
    )

    spark = _spark()
    store = _store(spark, args.store)
    df = store.read()
    if df is None:
        print("empty store", file=sys.stderr)
        return 2
    # candidate dim derived distributively from the store itself — no
    # driver-side title collect (dies at web-scale cardinality)
    cands = synthetic_candidates_from(df, seed_year=args.now.year)
    identified, new_cache = identify_films(df, None, cands, args.now.year)
    identified = identified.cache()
    total = identified.count()  # single materialization; reused for commit
    n = identified.filter(F.col("tmdb_id").isNotNull()).count()
    next_tick = store.table.latest()["tick"] + 1
    store.table.commit(identified, tick=next_tick, row_count=total)
    print(f"identified tmdb_id for {n} showtimes; cache +{new_cache.count()} rows")
    identified.unpersist()
    return 0


def cmd_generate_sitemap(args) -> int:
    from cinescrapers_spark.dims import cinemas_df
    from cinescrapers_spark.publish import write_sitemap

    spark = _spark()
    n = write_sitemap(cinemas_df(spark), args.now.date().isoformat(), args.out)
    print(f"Sitemap generated at {args.out} ({n} url entries)")
    return 0


def cmd_generate_map(args) -> int:
    """Cinema map HTML (ref generate_cinema_map, cinemap.py:6-65 /
    __main__.py:607-610) — Leaflet document, one marker + label per cinema."""
    from cinescrapers_spark.dims import cinemas_df
    from cinescrapers_spark.publish import write_map

    spark = _spark()
    n = write_map(cinemas_df(spark), args.out)
    print(f"Cinema map saved to: {args.out} ({n} markers)")
    return 0


def cmd_submit_indexnow(args) -> int:
    from cinescrapers_spark.dims import cinemas_df
    from cinescrapers_spark.publish import submit_indexnow

    spark = _spark()
    sent = []

    def post(api_url: str, payload: str) -> int:
        sent.append(payload)
        if args.dry_run:
            return 200
        raise RuntimeError(
            "no network in this environment — run with --dry-run, or wire a "
            "real requests.post in production"
        )

    n = submit_indexnow(cinemas_df(spark), post, host=args.host, key=args.key)
    print(f"{'would submit' if args.dry_run else 'submitted'} {n} urls to IndexNow")
    return 0


def _parse_now(s: str) -> datetime.datetime:
    return datetime.datetime.fromisoformat(s)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="cinescrapers_spark.cli")
    sub = ap.add_subparsers(dest="cmd", required=True)

    def common(p, store=True):
        if store:
            p.add_argument("--store", required=True)
        p.add_argument("--now", type=_parse_now, default=FIXTURE_NOW)
        p.add_argument("--tick", type=int, default=1)

    sub.add_parser("list-scrapers").set_defaults(fn=cmd_list_scrapers)

    p = sub.add_parser("scrape")
    p.add_argument("scraper")
    common(p)
    p.set_defaults(fn=cmd_scrape)

    p = sub.add_parser("refresh")
    p.add_argument("-a", "--all", action="store_true")
    common(p)
    p.set_defaults(fn=cmd_refresh)

    p = sub.add_parser("stats")
    common(p)
    p.set_defaults(fn=cmd_stats)

    p = sub.add_parser("list-films")
    common(p)
    p.set_defaults(fn=cmd_list_films)

    p = sub.add_parser("export-json")
    p.add_argument("--out", required=True)
    p.add_argument("--no-gzip", action="store_true")
    common(p)
    p.set_defaults(fn=cmd_export_json)

    p = sub.add_parser("grab-tmdb-ids")
    common(p)
    p.set_defaults(fn=cmd_grab_tmdb_ids)

    p = sub.add_parser("generate-sitemap")
    p.add_argument("--out", required=True)
    p.add_argument("--now", type=_parse_now, default=FIXTURE_NOW)
    p.set_defaults(fn=cmd_generate_sitemap)

    p = sub.add_parser("generate-map")
    p.add_argument("--out", required=True)
    p.set_defaults(fn=cmd_generate_map)

    p = sub.add_parser("submit-indexnow")
    # --dry-run/--no-dry-run (default dry): store_true+default=True made the
    # live branch unreachable (ADVICE r2); the live path still raises in the
    # no-network sandbox, production wires a real requests.post
    p.add_argument(
        "--dry-run", action=argparse.BooleanOptionalAction, default=True
    )
    p.add_argument("--host", default="filmhose.uk")
    p.add_argument("--key", default="KEY")
    p.set_defaults(fn=cmd_submit_indexnow)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
