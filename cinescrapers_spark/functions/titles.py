"""Title normalization — vectorized clone of the reference semantics.

The reference normalizes titles with an order-sensitive, first-match list of
92 regexes applied twice, sandwiched by quote/dash/accent folding and
punctuation collapse (``/root/reference/src/cinescrapers/title_normalization.py:162-180``;
pattern list at ``:6-92``).  The 92-pattern first-match semantics are not
honestly expressible as nested ``regexp_replace`` built-ins, so this is a
pandas UDF: each pattern is applied as ONE vectorized ``Series.str.extract``
over the rows still unresolved — 92 columnar passes per batch, never
per-row Python.

The pattern list below is behavioural DATA copied for fidelity (the golden
tests at ``/root/reference/tests/test_normalize_title.py`` gate it); the
execution strategy is new.
"""

from __future__ import annotations

import re
import unicodedata

import pandas as pd
from cinescrapers_spark.functions.udf import lazy_pandas_udf

# Order-sensitive, first-match-wins (ref title_normalization.py:6-92).
TITLE_PATTERNS: list[str] = [
    r"^All out of bubblegum film club: *(.*)$",
    r"^Bad Movie Night: (.*)$",
    r"^Bar Trash: (.*)$",
    r"^Brazilian Summer Nights: *(.*)$",
    r"^CAMP CLASSICS presents: (.*)$",
    r"^Carers & Babies: (.*)$",
    r"^Category H: *(.*)$",
    r"^Cine-real presents: (.*)$",
    r"^Cinematix Escapes Presents: (.*)$",
    r"^Classic Matinee: (.*)$",
    r"^Dog friendly: (.*)$",
    r"^Experiments in film: (.*)$",
    r"^Exhibition on screen: (.*)$",
    r"^Family film week: (.*)$",
    r"^Family Films: (.*)$",
    r"^Funeral Parade Presents '(.*)'$",
    r"^Girls in Film: (.*)$",
    r"^Japanese Film Club: *(.*)$",
    r"^Member exclusive: (.*)$",
    r"^Member Picks: (.*)$",
    r"^Members' Screening: (.*)$",
    r"^Outdoor Cinema: (.*)$",
    r"^Parent & Baby: (.*)$",
    r"^Parent & Baby Screening: (.*)$",
    r"^Phoenix Classics: *(.*)$",
    r"^Pink Palace: *(.*)$",
    r"^Pitchblack Pictures: *(.*)$",
    r"^Reborn India Film Presents:? *(.*)$",
    r"^Relaxed Screening: (.*)$",
    r"^Senior Community Screening: (.*)$",
    r"^Seniors' Free Matinee: (.*)$",
    r"^Seniors' Paid Matinee: (.*)$",
    r"^Staff Selects: *(.*)$",
    r"^UK Premiere:? *(.*)$",
    r"^Sing-A-Long-A *(.*)$",
    r"^[a-zA-Z ]+ Film Festival: *(.*)$",
    r"^(.*) *\+ intro by .*$",
    r"^(.*) *\(UK Theatrical Premiere\)$",
    r"^(.*) *\(Theatrical Cut\)$",
    r"^(.*) *\[Theatrical Cut\]$",
    r"^(.*) *\(Director'?s Cut\)$",
    r"^(.*) *\[Director'?s Cut\]$",
    r"^(.*) *\(4k restoration\)$",
    r"^(.*) *4k restoration$",
    r"^(.*) *\(4k restoration re[ -]?release\)$",
    r"^(.*) *\+ Introduction$",
    r"^(.*) *\+ introduction by .*$",
    r"^(.*) *plus intro by .*$",
    r"^(.*) *with intro by .*$",
    r"^(.*) *\+ pre-recorded intro by .*$",
    r"^(.*) *\+ Panel discussion\b.*$",
    r"^(.*) *plus Panel discussion\b.*$",
    r"^(.*) *+ ScreenTalk$",
    r"^(.*) *\+ Q&A\b.*$",
    r"^(.*) *plus Q&A\b.*$",
    r"^(.*) *\+ recorded Q&A\b.*$",
    r"^(.*) *plus recorded Q&A\b.*$",
    r"^(.*) *\+ director Q&A\b.*$",
    r"^(.*) *plus director Q&A\b.*$",
    r"^(.*) *\+ Live Organ$",
    r"^(.*) \d\dth anniversary$",
    r"^(.*) \d\dth anniversary edition$",
    r"^(.*) \(\d\dth anniversary\)$",
    r"^(.*) \(\d\d\dth anniversary\)$",
    r"^(.*) \(\d\dth anniversary 4K Restoration\)$",
    r"^(.*) \[\d\dth anniversary\]$",
    r"^(.*) *- *\d\dth anniversary$",
    r"^(.*) *\(Subtitled\) *$",
    r"^(.*) *\[Subtitled\] *$",
    r"^(.*) *\[English Subtitles\] *$",
    r"^(.*) *\(English Subtitles\) *$",
    r"^(.*) *\[SUBBED\] *$",
    r"^(.*) *\[DUBBED\] *$",
    r"^(.*) *\(DUBBED\) *$",
    r"^(.*) *\[English language dub\] *$",
    r"^(.*) *\[[a-zA-Z ]+ version\] *$",
    r"^(.*) *\(2D\) *$",
    r"^(.*) *\[2D\] *$",
    r"^(.*) *\(3D\) *$",
    r"^(.*) *\[3D\] *$",
    r"^(.*) *Classics Presented in 35mm$",
    r"^(.*) *\(IMAX\)",
    r"^(.*) *\[IMAX\]",
    r"^(.*) *- *The Chiswick Cinema$",
    r"^(.*)$",
]

_COMPILED = [re.compile(p, re.I) for p in TITLE_PATTERNS]

# Char-translation tables (ref :98-126) — applied via pandas .str.translate.
_QUOTE_TABLE = {
    ord("‘"): "'", ord("’"): "'", ord("‚"): "'",
    ord("‛"): "'", ord("“"): '"', ord("”"): '"',
    ord("„"): '"', ord("‟"): '"', ord("‹"): "'",
    ord("›"): "'", ord("«"): '"', ord("»"): '"',
}
_DASH_TABLE = {
    ord("–"): "-", ord("—"): "-", ord("―"): "-",
    ord("‒"): "-", ord("−"): "-",
}
_LIGATURES = {"æ": "ae", "Æ": "AE", "œ": "oe", "Œ": "OE", "ß": "ss", "ẞ": "SS"}


def fold_accents(text: str) -> str:
    """Ligature replace → NFD → drop combining marks (ref :129-148)."""
    for lig, rep in _LIGATURES.items():
        text = text.replace(lig, rep)
    nfd = unicodedata.normalize("NFD", text)
    return "".join(ch for ch in nfd if unicodedata.category(ch) != "Mn")


def _strip_series(s: pd.Series) -> pd.Series:
    """One first-match pass of the 92-pattern table over a whole Series.

    Vectorized per pattern: each regex runs as a single str.extract over the
    rows not yet matched by an earlier pattern.
    """
    out = pd.Series([None] * len(s), index=s.index, dtype=object)
    unresolved = s.copy()
    for pat in _COMPILED:
        if unresolved.empty:
            break
        # re.match semantics == anchored-at-start search; all patterns are
        # ^-anchored so extract(expand=False) matches exactly.
        hit = unresolved.str.extract(pat, expand=False)
        matched = hit.notna()
        if matched.any():
            out.loc[hit.index[matched]] = hit[matched].str.strip()
            unresolved = unresolved[~matched]
    return out


def normalize_title_series(s: pd.Series) -> pd.Series:
    """Full pipeline on a Series (ref normalize_title, :162-180)."""
    t = s.str.strip().str.upper()
    t = t.str.translate(_QUOTE_TABLE).str.translate(_DASH_TABLE)
    t = t.map(lambda x: None if x is None else fold_accents(x))
    t = _strip_series(t)
    t = _strip_series(t)  # twice: prefix AND suffix (ref :168-170)
    t = t.str.replace(r"[\.\!,:-]", " ", regex=True)
    t = t.str.replace(" & ", " AND ", regex=False)
    t = t.str.replace(r"\s+", " ", regex=True).str.strip()
    return t


@lazy_pandas_udf("string")
def normalize_title_udf(s: pd.Series) -> pd.Series:
    return normalize_title_series(s)


def normalize_title_py(title: str) -> str:
    """Scalar convenience for tests/fixtures."""
    return normalize_title_series(pd.Series([title])).iloc[0]
