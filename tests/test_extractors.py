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
