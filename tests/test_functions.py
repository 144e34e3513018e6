"""Golden-pair unit tests for the scalar function library.

Inputs/outputs ported from the reference's own tests
(/root/reference/tests/test_normalize_title.py, test_postcode_extraction.py)
but asserted through our vectorized implementations.
"""

import pandas as pd
import pytest

from cinescrapers_spark.functions.hashing import get_hashed_py
from cinescrapers_spark.functions.text import extract_uk_postcode_py
from cinescrapers_spark.functions.titles import (
    fold_accents,
    normalize_title_py,
    normalize_title_series,
)
from cinescrapers_spark.functions.urls import canonicalize_url_py

TITLE_GOLDEN = [
    ("Bar Trash: Summer Nights", "SUMMER NIGHTS"),
    ("CAMP CLASSICS presents: The Great Outdoors", "THE GREAT OUTDOORS"),
    ("Parent & Baby: A Quiet Place", "A QUIET PLACE"),
    ("Senior Community Screening: The Notebook", "THE NOTEBOOK"),
    ("Funeral Parade Presents 'The Last Picture Show'", "THE LAST PICTURE SHOW"),
    ("Classic Matinee: Casablanca", "CASABLANCA"),
    ("Barry Lyndon (50th Anniversary)", "BARRY LYNDON"),
    ("Barry Lyndon - 50th Anniversary", "BARRY LYNDON"),
    # double strip: prefix AND suffix (ref test :24)
    ("Members' Screening: Barry Lyndon - 50th Anniversary", "BARRY LYNDON"),
]


@pytest.mark.parametrize("raw,expected", TITLE_GOLDEN)
def test_normalize_title_golden(raw, expected):
    assert normalize_title_py(raw) == expected


def test_normalize_title_amp_equivalence():
    assert normalize_title_py("Lilo & Stitch") == normalize_title_py("LILO AND STITCH")


def test_normalize_title_vectorized_batch():
    raws = [r for r, _ in TITLE_GOLDEN] * 10
    expecteds = [e for _, e in TITLE_GOLDEN] * 10
    out = normalize_title_series(pd.Series(raws))
    assert list(out) == expecteds


def test_fold_accents():
    assert fold_accents("Amélie") == "Amelie"
    assert fold_accents("Crème brûlée") == "Creme brulee"
    assert (
        fold_accents("àáâãäåæçèéêëìíîïñòóôõöùúûüý") == "aaaaaaaeceeeeiiiinooooouuuuy"
    )
    assert fold_accents("Æon") == "AEon"
    assert fold_accents("Œuvre") == "OEuvre"
    assert fold_accents("Straße") == "Strasse"
    assert fold_accents("Hello World") == "Hello World"


POSTCODE_GOLDEN = [
    ("Visit us at SW1A 1AA for tickets", "SW1A 1AA"),
    ("Located at M1 1AA in Manchester", "M1 1AA"),
    ("Address: B33 8TH Birmingham", "B33 8TH"),
    ("Visit us at SW1A1AA for tickets", "SW1A 1AA"),
    ("Located at M11AA in Manchester", "M1 1AA"),
    ("Postcode: W1R 0AB", "W1R 0AB"),
    ("Located at W1R0AB", "W1R 0AB"),
    ("visit us at sw1a 1aa", "SW1A 1AA"),
    ("address: b338th birmingham", "B33 8TH"),
    ("Address: (SW1A 1AA)", "SW1A 1AA"),
    ("Location: M1 1AA.", "M1 1AA"),
    ("no postcode here", None),  # ref raises; we map to NULL (SURVEY §1.3)
    ("", None),
]


@pytest.mark.parametrize("raw,expected", POSTCODE_GOLDEN)
def test_extract_uk_postcode(raw, expected):
    assert extract_uk_postcode_py(raw) == expected


def test_get_hashed_matches_reference_construction():
    # Recompute the reference algorithm inline (sha256 → urlsafe b64 → :32)
    import base64
    import hashlib

    for s in ["hello", "IC-Amélie-2025-08-01 18:30:00", ""]:
        digest = hashlib.sha256(s.encode("utf-8")).digest()
        exp = base64.urlsafe_b64encode(digest).decode().rstrip("=")[:32]
        assert get_hashed_py(s) == exp
        assert len(get_hashed_py(s)) == 32


CANON_GOLDEN = [
    ("HTTPS://WWW.Example.COM/Path/?b=2&a=1#frag", None,
     "https://www.example.com/Path/?a=1&b=2"),
    ("//cdn.example.com/img.png", None, "https://cdn.example.com/img.png"),
    ("/whats-on/", "https://thearzner.com/films", "https://thearzner.com/whats-on/"),
    ("https://example.com", None, "https://example.com/"),
    ("https://example.com:443/x", None, "https://example.com/x"),
    ("https://example.com:8080/x", None, "https://example.com:8080/x"),
    ("https://example.com/x?utm_source=tw&fbclid=1&id=5", None,
     "https://example.com/x?id=5"),
    ("data:image/png;base64,xyz", None, None),
    ("mailto:a@b.com", None, None),
    ("", None, None),
]


@pytest.mark.parametrize("url,base,expected", CANON_GOLDEN)
def test_canonicalize_url(url, base, expected):
    assert canonicalize_url_py(url, base) == expected


def test_canonicalize_dedups_variants():
    variants = [
        "https://EXAMPLE.com/a?utm_campaign=x",
        "https://example.com:443/a",
        "//example.com/a#section",
    ]
    canon = {canonicalize_url_py(v) for v in variants}
    assert canon == {"https://example.com/a"}


def test_identity_hashes_null_and_microsecond_fidelity(spark):
    """movie_hash / showtime_id must be byte-equal to the reference's
    f-string formulas (ref __main__.py:181-183, 425-428) including
    f"{None}" -> "None" rendering and str(datetime) microseconds."""
    import datetime

    from pyspark.sql import functions as F

    from cinescrapers_spark.functions.hashing import movie_hash, showtime_id

    rows = [
        # (shortcode, title, datetime, norm_title, description, image_src)
        ("IC", "Amélie", datetime.datetime(2025, 8, 1, 18, 30, 0), "AMELIE", "desc", "img.jpg"),
        # NULL description + image_src: the imageless-listing case
        ("PC", "Dune", datetime.datetime(2025, 8, 2, 20, 0, 0), "DUNE", None, None),
        # microsecond-bearing timestamp: str(datetime) keeps ".ffffff"
        ("RG", "Heat", datetime.datetime(2025, 8, 3, 21, 15, 0, 123), "HEAT", "d", None),
    ]
    df = spark.createDataFrame(
        rows, "shortcode string, title string, dt timestamp_ntz, nt string, de string, im string"
    ).select(
        showtime_id(F.col("shortcode"), F.col("title"), F.col("dt")).alias("sid"),
        movie_hash(F.col("nt"), F.col("de"), F.col("im")).alias("mh"),
    )
    got = df.collect()
    for (sc, ti, dt, nt, de, im), r in zip(rows, got):
        assert r["sid"] == get_hashed_py(f"{sc}-{ti}-{dt}")
        assert r["mh"] == get_hashed_py(f"{nt}-{de}-{im}")


def test_cache_path_codec_roundtrip_and_column(spark):
    """urlsafe-b64 cache keys (ref rapidapi/scrape.py:38-44): python and
    column forms agree byte-for-byte and round-trip."""
    from pyspark.sql import functions as F

    from cinescrapers_spark.functions.hashing import (
        decode_cache_path_py,
        encode_cache_path,
        encode_cache_path_py,
    )

    paths = ["/film/search?title=Amélie&year=2001", "/x", "a" * 200, "/?&=~"]
    for p in paths:
        assert decode_cache_path_py(encode_cache_path_py(p)) == p
        assert "=" not in encode_cache_path_py(p)
    df = spark.createDataFrame([(p,) for p in paths], "p string").select(
        encode_cache_path(F.col("p")).alias("k"), "p"
    )
    for r in df.collect():
        assert r["k"] == encode_cache_path_py(r["p"])


def test_to_naive_london_wall_time(spark):
    """TZ-aware instant → naive Europe/London wall clock (ref
    barbican/scrape.py:74-77), across BST and GMT."""
    import datetime

    from pyspark.sql import functions as F

    from cinescrapers_spark.functions.dates import to_naive_london

    rows = [("2025-08-01 18:30:00",), ("2025-01-15 18:30:00",)]  # UTC instants
    df = spark.createDataFrame(rows, "t string").select(
        to_naive_london(F.to_timestamp("t")).alias("ldn")
    )
    got = [r["ldn"] for r in df.collect()]
    assert got == [
        datetime.datetime(2025, 8, 1, 19, 30),  # BST = UTC+1
        datetime.datetime(2025, 1, 15, 18, 30),  # GMT = UTC+0
    ]


def test_naturaldelta_humanize_ladder():
    """Reference prints durations via humanize.naturaldelta/naturaltime
    (__main__.py:156,298,548); goldens mirror the library's default
    ladder."""
    import datetime

    from cinescrapers_spark.functions.dates import naturaldelta_py, naturaltime_py

    assert naturaldelta_py(0.4) == "a moment"
    assert naturaldelta_py(1) == "a second"
    assert naturaldelta_py(45) == "45 seconds"
    assert naturaldelta_py(60) == "a minute"
    assert naturaldelta_py(150) == "2 minutes"
    assert naturaldelta_py(3600) == "an hour"
    assert naturaldelta_py(7200) == "2 hours"
    assert naturaldelta_py(86400) == "a day"
    assert naturaldelta_py(5 * 86400) == "5 days"
    assert naturaldelta_py(40 * 86400) == "a month"
    assert naturaldelta_py(100 * 86400) == "3 months"
    assert naturaldelta_py(365 * 86400) == "a year"
    assert naturaldelta_py(3 * 365 * 86400) == "3 years"
    assert naturaltime_py(datetime.timedelta(seconds=0.5)) == "now"
    assert naturaltime_py(datetime.timedelta(minutes=3)) == "3 minutes ago"
