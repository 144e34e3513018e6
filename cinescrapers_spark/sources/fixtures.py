"""Per-family synthetic page fixtures + golden expected rows (FIXTURES.md §3).

Each generator is a pure function of (site, index) and returns the page
body AND the exact ShowTime rows an extractor must produce — including the
edge cases the reference trips on: HTML entities (arzner:25-27), missing
images (ica:51-52), empty pages (pagination terminator, bertha:28-30).
"""

from __future__ import annotations

import datetime
import html
import json

FIXTURE_TITLES = [
    "Barry Lyndon",
    "Amélie & Friends",
    "The Great Outdoors",
    "Casablanca",
    "Summer Nights",
]


def _title(i: int) -> str:
    return FIXTURE_TITLES[i % len(FIXTURE_TITLES)]


def _dt(i: int, j: int) -> datetime.datetime:
    return datetime.datetime(1998, 8, 1 + (i % 20), 12 + (j % 8), 30)


def gen_events_json(site: str, i: int) -> tuple[str, list[dict]]:
    events, expected = [], []
    for e in range(2):
        title = _title(i + e)
        desc = f"A film about {title} & more"  # & → &amp; roundtrip
        link = f"https://{site}.example.com/event/{i}-{e}"
        img = f"https://{site}.example.com/img/{i}-{e}.jpg"
        perfs = []
        for j in range(2):
            d = _dt(i + e, j)
            perfs.append(
                {"StartDate": d.strftime("%Y-%m-%d"), "StartTime": d.strftime("%H%M")}
            )
            expected.append(
                {
                    "title": title,
                    "link": link,
                    "datetime": d,
                    "description": desc,
                    "image_src": img,
                    "release_year": None,
                }
            )
        events.append(
            {
                "Title": html.escape(title),
                "URL": link,
                "Synopsis": html.escape(desc),
                "ImageURL": img,
                "Performances": perfs,
            }
        )
    body = f"<script>var Events = {json.dumps({'Events': events})};</script>"
    return body, expected


def gen_og_meta_h2(site: str, i: int) -> tuple[str, list[dict]]:
    title = _title(i)
    desc = f"{title} (1972) restored classic"
    link = f"https://{site}.example.com/movie/{i}"
    img = f"https://{site}.example.com/og/{i}.jpg"
    slots, expected = [], []
    for j in range(3):
        d = _dt(i, j)
        slots.append(f"<h2>Sat {d.strftime('%-d %b %H:%M')}</h2>")
        expected.append(
            {
                "title": title,
                "link": link,
                "datetime": d,
                "description": desc,
                "image_src": img,
                "release_year": 1972,
            }
        )
    body = (
        f'<meta property="og:title" content="{title}">'
        f'<meta property="og:url" content="{link}">'
        f'<meta property="og:description" content="{desc}">'
        f'<meta property="og:image" content="{img}">'
        "<h1>Showtimes</h1>" + "".join(slots)
    )
    return body, expected


def gen_json_ld(site: str, i: int) -> tuple[str, list[dict]]:
    title = _title(i)
    link = f"https://{site}.example.com/f/{i}"
    img = f"https://{site}.example.com/p/{i}.jpg" if i % 3 else None  # missing image edge
    scripts, expected = [], []
    for j in range(2):
        d = _dt(i, j)
        ev = {
            "@type": "ScreeningEvent",
            "name": title,
            "startDate": d.isoformat(),
            "url": link,
            "image": img,
            "description": f"Screening of {title}",
        }
        scripts.append(
            f'<script type="application/ld+json">{json.dumps(ev)}</script>'
        )
        expected.append(
            {
                "title": title,
                "link": link,
                "datetime": d,
                "description": f"Screening of {title}",
                "image_src": img,
                "release_year": None,
            }
        )
    noise = '<script type="application/ld+json">{"@type": "Organization", "name": "x"}</script>'
    return "<html>" + noise + "".join(scripts) + "</html>", expected


def gen_calendar_table(site: str, i: int) -> tuple[str, list[dict]]:
    rows, expected = [], []
    for j in range(3):
        d = _dt(i, j)
        title = _title(i + j)
        link = f"/films/{i}-{j}"
        img = f"/img/{i}-{j}.png"
        cell = d.strftime("%d.%m.%y") + " " + d.strftime("%I:%M %p").lstrip("0")
        rows.append(
            f'<tr class="day"><td>{cell}</td>'
            f'<td><a href="{link}">{title}</a><img src="{img}"></td></tr>'
        )
        expected.append(
            {
                "title": title,
                "link": link,
                "datetime": d,
                "description": None,
                "image_src": img,
                "release_year": None,
            }
        )
    return "<table>" + "".join(rows) + "</table>", expected


def gen_paginated_cards(site: str, i: int) -> tuple[str, list[dict]]:
    if i % 7 == 6:  # empty page: pagination terminator (bertha:28-30)
        return "<div class='empty'>No results</div>", []
    cards, expected = [], []
    for j in range(2):
        d = _dt(i, j)
        title = _title(i + j)
        link = f"https://{site}.example.com/whats-on/{i}-{j}"
        img = f"https://{site}.example.com/c/{i}-{j}.jpg" if j == 0 else None
        img_tag = f'<img src="{img}">' if img else ""
        # kiln renders a rating suffix the extractor must strip
        # (ref kiln/scrape.py:12,69-71); expected title stays bare
        shown = f"{title} (PG)" if site == "kiln" else title
        # barbican publishes tz-aware UTC instants; the extractor must
        # convert to naive London wall time (ref barbican/scrape.py:74-77)
        if site == "barbican":
            import zoneinfo

            aware = d.replace(tzinfo=zoneinfo.ZoneInfo("Europe/London"))
            attr = aware.astimezone(datetime.timezone.utc).isoformat()
        else:
            attr = d.isoformat()
        cards.append(
            f'<div class="card"><h3>{shown}</h3>'
            f'<a href="{link}" datetime="{attr}">book</a>{img_tag}</div>'
        )
        expected.append(
            {
                "title": title,
                "link": link,
                "datetime": d,
                "description": None,
                "image_src": img,
                "release_year": None,
            }
        )
    return "".join(cards), expected


def gen_bespoke_dom(site: str, i: int) -> tuple[str, list[dict]]:
    arts, expected = [], []
    for j in range(2):
        d = _dt(i, j)
        title = _title(i + 2 * j)
        link = f"/event/{i}/{j}"
        desc = f"About {title}" if j == 0 else None
        desc_tag = f'<p class="desc">{desc}</p>' if desc else ""
        # ica renders free-text dates the reference feeds to dateparser
        # (ica/scrape.py:67): no machine-readable datetime attribute
        if site == "ica":
            freetext = d.strftime("%a %d %b %H:%M").replace(" 0", " ")
            time_tag = f"<time>{freetext}</time>"
        else:
            time_tag = f'<time datetime="{d.isoformat()}">{d}</time>'
        arts.append(
            f'<article><h3>{title}</h3><a href="{link}">'
            f"{time_tag}</a>{desc_tag}</article>"
        )
        expected.append(
            {
                "title": title,
                "link": link,
                "datetime": d,
                "description": desc,
                "image_src": None,
                "release_year": None,
            }
        )
    return "<main>" + "".join(arts) + "</main>", expected


GENERATORS = {
    "events_json": gen_events_json,
    "og_meta_h2": gen_og_meta_h2,
    "json_ld": gen_json_ld,
    "calendar_table": gen_calendar_table,
    "paginated_cards": gen_paginated_cards,
    "bespoke_dom": gen_bespoke_dom,
}

FAMILY_SITES = {
    "events_json": ["arzner", "rio", "lexi"],
    "og_meta_h2": ["actone", "regentstreet", "phoenix", "throwleyyard"],
    "json_ld": ["coldharbourblue", "castle"],
    "calendar_table": ["close_up_film_centre"],
    "paginated_cards": ["bertha", "barbican", "kiln"],
    "bespoke_dom": ["ica", "garden", "genesis"],
}


def generate_pages(n_per_site: int = 4) -> tuple[list[dict], list[dict]]:
    """→ (pages rows, expected showtime rows); both deterministic."""
    pages, expected = [], []
    for family, gen in GENERATORS.items():
        for site in FAMILY_SITES[family]:
            for i in range(n_per_site):
                url = f"https://{site}.example.com/listings/p{i}"
                body, exp = gen(site, i)
                pages.append(
                    {"url": url, "site": site, "family": family, "body": body,
                     "fetched_tick": 0}
                )
                for row in exp:
                    expected.append({"url": url, "site": site, **row})
    return pages, expected
