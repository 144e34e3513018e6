"""Date/time scalar functions.

The reference's date handling (SURVEY §2.8): fixed strptime formats →
``to_timestamp`` built-ins; free-text parses → a small pandas UDF;
``parse_date_without_year``'s "if now.month>6 and parsed.month<3 → next
year" rollover (``/root/reference/src/cinescrapers/utils.py:16-25``) →
column expression with an injected ``now`` (never wall-clock inside the
plan — determinism is a schema property, SURVEY §7.3).

Everything is tz-naive London wall time (TimestampNTZ end-to-end).
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import Column
from pyspark.sql import functions as F

RELEASE_YEAR_RE = r"\b((19\d{2})|(20[0-2]\d))\b"  # ref utils.py:9


def release_year_col(text: Column) -> Column:
    """First 1900-2029 year in the text, as int; NULL when absent."""
    y = F.regexp_extract(text, RELEASE_YEAR_RE, 1)
    return F.when(y == "", None).otherwise(y).cast("int")


def year_rollover(parsed: Column, now: _dt.datetime) -> Column:
    """Apply the reference's year-rollover rule (utils.py:23-24): a date
    parsed without a year lands in `now`'s year; if it's late in the year
    (month>6) and the parsed month is early (<3), bump to next year."""
    if now.month > 6:
        bumped = F.make_timestamp_ntz(
            F.lit(now.year + 1),
            F.month(parsed),
            F.day(parsed),
            F.hour(parsed),
            F.minute(parsed),
            F.second(parsed).cast("decimal(8,6)"),
        )
        return F.when(F.month(parsed) < 3, bumped).otherwise(parsed)
    return parsed


def to_naive_london(ts_utc: Column) -> Column:
    """TZ-aware instant → naive Europe/London wall time (ref
    barbican/scrape.py:74-77: astimezone(London).replace(tzinfo=None))."""
    return F.from_utc_timestamp(ts_utc, "Europe/London").cast("timestamp_ntz")


def next_month_boundary(now: _dt.datetime) -> _dt.datetime:
    """Month rollover incl. December wrap (ref __main__.py:71-76):
    same day/time next month."""
    if now.month == 12:
        return now.replace(year=now.year + 1, month=1)
    return now.replace(month=now.month + 1)


def this_morning(now: _dt.datetime) -> _dt.datetime:
    """Midnight today (ref __main__.py:354-356 grab_current_showtimes)."""
    return now.replace(hour=0, minute=0, second=0, microsecond=0)
