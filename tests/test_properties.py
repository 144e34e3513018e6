"""Property-based gates (hypothesis) for the invariants the engine's
correctness argument leans on but goldens can't sweep:

* canonicalize_url_py is IDEMPOTENT — canon(canon(u)) == canon(u). The
  whole URL-seen design keys on canonical forms; a non-idempotent
  canonicalizer would let the same page re-enter the frontier forever.
* canonical equivalence classes: tracking params, host case, scheme-
  relative forms, default ports all collapse to one representative.
* winnowing fingerprints are ORDER-INSENSITIVE to whitespace runs and
  deterministic; every doc with ≥ k tokens fingerprints to ≥ 1 value and
  every fingerprint is one of its k-gram hashes (the containment that
  makes winnow sets comparable across documents).
* BPE pretokenizer: token count is additive over concatenation with a
  space (the property that makes per-partition token counting sum
  correctly in a distributed agg).
"""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from cinescrapers_spark.crawl.reference_model import xxhash64_spark
from cinescrapers_spark.functions.urls import canonicalize_url_py
from cinescrapers_spark.plans.pipeline_ops import BPE_PATTERN, WINNOW_K, WINNOW_W

# -- URL strategies ----------------------------------------------------------
hosts = st.from_regex(r"[a-zA-Z0-9]([a-zA-Z0-9-]{0,10}[a-zA-Z0-9])?\.(com|org|uk)", fullmatch=True)
paths = st.lists(
    st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789._-", min_size=1, max_size=8),
    max_size=4,
).map(lambda segs: "/" + "/".join(segs))
params = st.dictionaries(
    st.text(alphabet="abcdefghijklmnopqrstuvwxyz_", min_size=1, max_size=8),
    st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789", max_size=6),
    max_size=4,
)


def _mk_url(scheme, host, path, q):
    qs = "&".join(f"{k}={v}" for k, v in q.items())
    return f"{scheme}://{host}{path}" + (f"?{qs}" if qs else "")


urls = st.builds(
    _mk_url,
    st.sampled_from(["http", "https", "HTTP", "Https"]),
    hosts,
    paths,
    params,
)


@settings(max_examples=300, deadline=None)
@given(urls)
def test_canonicalize_idempotent(u):
    c = canonicalize_url_py(u)
    if c is not None:
        assert canonicalize_url_py(c) == c


@settings(max_examples=200, deadline=None)
@given(hosts, paths)
def test_canonical_equivalence_classes(host, path):
    rep = canonicalize_url_py(f"https://{host}{path}")
    assert rep is not None
    variants = [
        f"https://{host.upper()}{path}",
        f"//{host}{path}",
        f"https://{host}:443{path}",
        f"https://{host}{path}?utm_source=x&utm_campaign=y",
    ]
    for v in variants:
        assert canonicalize_url_py(v) == rep, v


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet="abc", max_size=30))
def test_canonicalize_never_crashes_on_garbage(s):
    canonicalize_url_py(s)  # None or a string; never raises


# -- winnowing ----------------------------------------------------------------
TOKEN_RE = re.compile(r"[^a-z0-9]+")


def py_winnow(text: str, k: int = WINNOW_K, w: int = WINNOW_W) -> list[int]:
    toks = [t for t in TOKEN_RE.split(text.lower()) if t]
    kgrams = [
        xxhash64_spark(" ".join(toks[i : i + k])) for i in range(len(toks) - k + 1)
    ]
    if not kgrams:
        return []
    nw = max(len(kgrams) - w + 1, 1)
    return sorted({min(kgrams[j : j + w]) for j in range(nw)})


words = st.lists(
    st.text(alphabet="abcdefghij", min_size=1, max_size=5), min_size=0, max_size=40
)


@settings(max_examples=150, deadline=None)
@given(words)
def test_winnow_whitespace_insensitive_and_contained(ws):
    doc = " ".join(ws)
    noisy = "  ".join(ws) + " "
    fps = py_winnow(doc)
    assert py_winnow(noisy) == fps
    toks = [t for t in TOKEN_RE.split(doc.lower()) if t]
    if len(toks) >= WINNOW_K:
        assert fps, "≥k tokens must yield ≥1 fingerprint"
        kg = {
            xxhash64_spark(" ".join(toks[i : i + WINNOW_K]))
            for i in range(len(toks) - WINNOW_K + 1)
        }
        assert set(fps) <= kg, "every fingerprint is one of the doc's k-gram hashes"
    else:
        assert fps == []


# -- BPE pretokenizer ----------------------------------------------------------
texts = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz0123456789 .,'!?-", max_size=60
)


@settings(max_examples=200, deadline=None)
@given(texts, texts)
def test_bpe_count_additive_over_space_concat(a, b):
    pat = re.compile(BPE_PATTERN)
    n = lambda s: len(pat.findall(s.lower()))  # noqa: E731
    if a.strip() and b.strip():
        assert n(a.strip() + " " + b.strip()) == n(a.strip()) + n(b.strip())


# -- PNG codec ----------------------------------------------------------------
# The harvest path's storage invariant: encode→decode is the IDENTITY for
# arbitrary uint8 RGB arrays (any loss would silently corrupt harvested
# pixels AND break the phash-exactness gates that key on decoded bytes).
@settings(max_examples=60, deadline=None)
@given(
    st.integers(min_value=1, max_value=24),
    st.integers(min_value=1, max_value=24),
    st.integers(min_value=0, max_value=2**32 - 1),
)
def test_png_roundtrip_identity(h, w, seed):
    import numpy as np

    from cinescrapers_spark.images.codecs import decode_png, encode_png

    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(arr)), arr)


# ADPCM invariants: sample count is preserved exactly for arbitrary input
# (duration math in audio_stats depends on it), and the quantizer CONVERGES
# — on any constant tail the step adapts down and reconstruction locks to
# the signal within a bounded settle window. (No per-sample bound exists
# for adversarial input: a full-scale jump against a small step takes
# several samples to track — that's inherent to the IMA scheme.)
@settings(max_examples=60, deadline=None)
@given(st.lists(st.integers(min_value=-32768, max_value=32767), min_size=1, max_size=400))
def test_adpcm_length_preserved(samples):
    import numpy as np

    from cinescrapers_spark.images.multimodal import decode_adpcm, encode_adpcm

    pcm = np.array(samples, dtype=np.int16)
    dec = decode_adpcm(encode_adpcm(pcm))
    assert dec.shape == pcm.shape and dec.dtype == np.int16


@settings(max_examples=60, deadline=None)
@given(
    st.integers(min_value=-32000, max_value=32000),
    st.integers(min_value=-32000, max_value=32000),
)
def test_adpcm_converges_on_constant_tail(start, const):
    import numpy as np

    from cinescrapers_spark.images.multimodal import decode_adpcm, encode_adpcm

    # a worst-case jump, then a constant tail long enough for the index to
    # walk anywhere in [0, 88] and back down (index moves ≥ -1 per sample)
    pcm = np.array([start] + [const] * 120, dtype=np.int16)
    dec = decode_adpcm(encode_adpcm(pcm))
    # once adapted, error is bounded by a few minimum steps
    assert abs(int(dec[-1]) - const) <= 32
