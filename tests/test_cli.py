"""CLI parity tests — the reference's command surface
(__main__.py:395-668) driven through cinescrapers_spark.cli in-process."""

import gzip
import glob
import json

from cinescrapers_spark.cli import main


def test_list_scrapers(spark, capsys):
    assert main(["list-scrapers"]) == 0
    out = capsys.readouterr().out
    assert "Available scrapers" in out
    for site in ("rio", "barbican", "ica", "kiln"):
        assert f" - {site}" in out


def test_scrape_stats_films_export_roundtrip(spark, tmp_path, capsys):
    store = str(tmp_path / "store")
    assert main(["scrape", "rio", "--store", store]) == 0
    assert main(["scrape", "barbican", "--store", store, "--tick", "2"]) == 0

    assert main(["stats", "--store", store]) == 0
    out = capsys.readouterr().out
    assert "Total showtimes in db:" in out
    # per-scraper blocks with humanized staleness (ref __main__.py:140-157,
    # incl. the reference's trailing " ago" after naturaltime: at the
    # pinned fixture clock elapsed is <1s, so naturaltime says "now")
    assert "\nrio\n---\n" in out and "\nbarbican\n--------\n" in out
    assert "Last updated: now ago" in out

    assert main(["list-films", "--store", store]) == 0
    films = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    assert films == sorted(films)
    assert films

    out_dir = str(tmp_path / "export")
    assert main(["export-json", "--store", store, "--out", out_dir]) == 0
    parts = glob.glob(f"{out_dir}/*.json.gz")
    assert parts
    rows = [
        json.loads(line)
        for p in parts
        for line in gzip.open(p, "rt").read().splitlines()
        if line
    ]
    assert rows and all("id" in r and "cinema_shortcode" in r for r in rows)
    assert all(len(r.get("description") or "") <= 210 for r in rows)


def test_refresh_staleness(spark, tmp_path, capsys):
    store = str(tmp_path / "store")
    # empty store → everything due
    assert main(["refresh", "--store", store]) == 0
    first = capsys.readouterr().out
    assert "refreshed" in first
    # immediately after: everything fresh
    assert main(["refresh", "--store", store]) == 0
    assert "nothing to do" in capsys.readouterr().out
    # 6 days later (> MAX_STALENESS_DAYS): due again
    assert main(["refresh", "--store", store, "--now", "1998-08-07T09:00:00",
                 "--tick", "2"]) == 0
    assert "refreshed" in capsys.readouterr().out


def test_scrape_unknown_scraper_exits_2(spark, tmp_path, capsys):
    store = str(tmp_path / "store")
    assert main(["scrape", "nosuch", "--store", store]) == 2
    assert "unknown scraper: nosuch" in capsys.readouterr().err


def test_grab_tmdb_ids(spark, tmp_path, capsys):
    store = str(tmp_path / "store")
    assert main(["scrape", "rio", "--store", store]) == 0
    assert main(["grab-tmdb-ids", "--store", store]) == 0
    out = capsys.readouterr().out
    assert "identified tmdb_id" in out
    # the distributed candidate dim actually matches: >0 identified
    n = int(out.split("identified tmdb_id for ")[1].split(" ")[0])
    assert n > 0


def test_sitemap_and_indexnow(spark, tmp_path, capsys):
    out = str(tmp_path / "sitemap.xml")
    assert main(["generate-sitemap", "--out", out]) == 0
    xml = open(out).read()
    assert xml.count("<url>") > 20
    assert main(["submit-indexnow", "--dry-run"]) == 0
    assert "would submit" in capsys.readouterr().out


def test_generate_map(spark, tmp_path, capsys):
    out = str(tmp_path / "cinema_map.html")
    assert main(["generate-map", "--out", out]) == 0
    assert "Cinema map saved to" in capsys.readouterr().out
    html = open(out).read()
    # one marker object per cinema; popup carries the reference's fields
    assert html.count('"name":') == 27
    assert "View Cinema Details" in html and "Official Website" in html
    assert "L.map('map').setView(center, 10)" in html
