"""Per-scraper fixture tests (north_star: "verified end-to-end against
cinescrapers' per-scraper fixture tests"): every extractor family must
reproduce its golden ShowTime rows exactly."""

import pandas as pd
import pytest

from cinescrapers_spark.schemas import PAGE
from cinescrapers_spark.sources.extractors import EXTRACTORS, extract_showtimes
from cinescrapers_spark.sources.fixtures import FAMILY_SITES, generate_pages

KEY = ["url", "site", "title", "link", "datetime", "description", "image_src",
       "release_year"]


def _norm(rows):
    out = set()
    for r in rows:
        d = r if isinstance(r, dict) else r.asDict()
        out.add(
            (
                d["url"], d["site"], d["title"], d["link"],
                pd.Timestamp(d["datetime"]).isoformat() if d["datetime"] else None,
                d["description"], d["image_src"],
                int(d["release_year"]) if d["release_year"] is not None else None,
            )
        )
    return out


@pytest.fixture(scope="module")
def fixture_data(spark):
    pages, expected = generate_pages(n_per_site=4)
    pages_df = spark.createDataFrame(pd.DataFrame(pages), schema=PAGE)
    return pages_df, expected


@pytest.mark.parametrize("family", list(EXTRACTORS))
def test_family_golden(spark, fixture_data, family):
    pages_df, expected = fixture_data
    from pyspark.sql import functions as F

    got = EXTRACTORS[family](pages_df.filter(F.col("family") == family)).collect()
    sites = set(FAMILY_SITES[family])
    want = [e for e in expected if e["site"] in sites]
    assert _norm(got) == _norm(want), f"{family}: extraction != golden"


def test_union_dispatch_covers_all(spark, fixture_data):
    pages_df, expected = fixture_data
    got = extract_showtimes(pages_df).collect()
    assert _norm(got) == _norm(expected)


def test_empty_page_yields_no_rows(spark):
    """Pagination terminator: an empty cards page explodes to zero rows
    without failing the job (ref bertha:28-30 break-on-empty)."""
    import pandas as pd

    pages = pd.DataFrame(
        [{"url": "u", "site": "bertha", "family": "paginated_cards",
          "body": "<div class='empty'>none</div>", "fetched_tick": 0}]
    )
    df = spark.createDataFrame(pages, schema=PAGE)
    assert EXTRACTORS["paginated_cards"](df).count() == 0


def test_freetext_date_parser_pattern_table():
    """The dateparser stand-in must cover the reference's listing-date
    shapes (ica/scrape.py:67, genesis/scrape.py:75, utils.py:16-25)."""
    import datetime

    from cinescrapers_spark.functions.dates import parse_freetext_datetime_py

    now = datetime.datetime(1998, 11, 15)
    cases = {
        "Fri 18 Jul 18:30": datetime.datetime(1998, 7, 18, 18, 30),
        "Friday 18 July 18:30": datetime.datetime(1998, 7, 18, 18, 30),
        "18 Jul 18:30": datetime.datetime(1998, 7, 18, 18, 30),
        "February 12th": datetime.datetime(1999, 2, 12),  # rollover: Nov→Feb
        "12 February 1997 6.30pm": datetime.datetime(1997, 2, 12, 18, 30),
        "Sat 3 Jan 14:00": datetime.datetime(1999, 1, 3, 14, 0),  # rollover
        "Tue 1 Dec, 8pm": datetime.datetime(1998, 12, 1, 20, 0),
        "12:30": None,  # no date
        "complete gibberish": None,
    }
    for s, want in cases.items():
        assert parse_freetext_datetime_py(s, now) == want, s
    # early-year `now`: no rollover
    assert parse_freetext_datetime_py(
        "February 12", datetime.datetime(1998, 3, 1)
    ) == datetime.datetime(1998, 2, 12)


def test_og_meta_year_rollover_through_extractor(spark):
    """A January listing scraped in November must land next year, through
    the extractor itself (ref utils.py:16-25) — both rollover directions."""
    import datetime

    from cinescrapers_spark.sources.extractors import extract_og_meta_h2

    body = (
        '<meta property="og:title" content="Winter Film">'
        '<meta property="og:url" content="https://x.example.com/f/1">'
        '<meta property="og:description" content="d">'
        '<meta property="og:image" content="https://x.example.com/i.jpg">'
        "<h2>Sat 10 Jan 18:00</h2><h2>Sat 10 Aug 18:00</h2>"
    )
    pages = spark.createDataFrame(
        [("https://x.example.com/p", "actone", "og_meta_h2", body, 0)],
        "url string, site string, family string, body string, fetched_tick int",
    )
    nov = extract_og_meta_h2(pages, now=datetime.datetime(1998, 11, 20))
    got = {r["datetime"] for r in nov.collect()}
    assert got == {
        datetime.datetime(1999, 1, 10, 18, 0),  # rolled forward
        datetime.datetime(1998, 8, 10, 18, 0),  # untouched
    }
    mar = extract_og_meta_h2(pages, now=datetime.datetime(1998, 3, 20))
    got2 = {r["datetime"] for r in mar.collect()}
    assert got2 == {
        datetime.datetime(1998, 1, 10, 18, 0),
        datetime.datetime(1998, 8, 10, 18, 0),
    }


def test_kiln_rating_suffix_and_ica_freetext(spark):
    """Fixture-level checks: kiln titles come out bare; ica free-text time
    parses to the same datetime as machine-readable siblings."""
    import pandas as pd

    from cinescrapers_spark.schemas import PAGE
    from cinescrapers_spark.sources.extractors import extract_showtimes
    from cinescrapers_spark.sources.fixtures import generate_pages

    pages, expected = generate_pages(n_per_site=2)
    df = spark.createDataFrame(pd.DataFrame(pages), schema=PAGE)
    got = extract_showtimes(df).filter("site in ('kiln', 'ica')").collect()
    assert got, "kiln/ica fixtures extracted nothing"
    want = {
        (e["site"], e["title"], e["datetime"])
        for e in expected
        if e["site"] in ("kiln", "ica")
    }
    assert {(r["site"], r["title"], r["datetime"]) for r in got} == want
    assert all("(" not in r["title"] for r in got if r["site"] == "kiln")
