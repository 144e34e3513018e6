"""Exactness gates for plans/pipeline_ops.py — the batch-2 training-data
operators (n-gram Jaccard, embedding-cosine near-dup, winnowing
fingerprints, BPE-ish token counts).

The winnowing gate is the load-bearing one: the Spark fps sets are held
byte-equal to a pure-Python winnower built on the same xxhash64 mirror the
crawl equivalence tests already trust (crawl/reference_model.py).
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from cinescrapers_spark.crawl.reference_model import xxhash64_spark
from cinescrapers_spark.plans.pipeline_ops import (
    BPE_PATTERN,
    EMBED_NEAR_THRESHOLD,
    NGRAM_N,
    WINNOW_K,
    WINNOW_W,
    doc_winnow,
    q_dedup_embed_cosine,
    q_dedup_ngram,
    q_token_count_bpe,
)

TOKEN_RE = re.compile(r"[^a-z0-9]+")


def py_tokens(text: str) -> list[str]:
    return [t for t in TOKEN_RE.split(text.lower()) if t]


def py_winnow(text: str, k: int = WINNOW_K, w: int = WINNOW_W) -> list[int]:
    toks = py_tokens(text)
    kgrams = [
        xxhash64_spark(" ".join(toks[i : i + k])) for i in range(len(toks) - k + 1)
    ]
    if not kgrams:
        return []
    n_windows = max(len(kgrams) - w + 1, 1)
    return sorted({min(kgrams[j : j + w]) for j in range(n_windows)})


def py_shingles(text: str, n: int = NGRAM_N) -> set[str]:
    toks = py_tokens(text)
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def test_winnow_matches_python_reference(spark, sf_dir):
    got = {
        r["doc_id"]: list(r["fps"])
        for r in doc_winnow(spark, sf_dir).collect()
    }
    texts = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    assert set(got) == set(texts)
    for doc_id, text in texts.items():
        assert got[doc_id] == py_winnow(text), f"fps mismatch doc {doc_id}"


def test_winnow_edge_cases(spark):
    # fewer tokens than k → no k-grams → empty fps; k..k+w-1 tokens → 1 window
    df = spark.createDataFrame(
        [(1, "a b"), (2, "a b c d"), (3, "one two three four five six")],
        ["doc_id", "text"],
    ).select(
        "doc_id",
        F.lit("s").alias("source"),
        F.col("text"),
    )
    from cinescrapers_spark.plans.pipeline_ops import (
        _ordered_tokens,
        kgram_hashes,
        winnow_minima,
    )

    out = {
        r["doc_id"]: list(r["fps"])
        for r in df.select(
            "doc_id", _ordered_tokens(F.col("text")).alias("toks")
        )
        .select("doc_id", kgram_hashes(F.col("toks")).alias("kg"))
        .select("doc_id", winnow_minima(F.col("kg")).alias("fps"))
        .collect()
    }
    assert out[1] == []
    assert out[2] == py_winnow("a b c d")
    assert out[3] == py_winnow("one two three four five six")


def test_ngram_pairs_match_python_brute_force(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    by_source: dict[str, list] = {}
    for r in docs:
        by_source.setdefault(r["source"], []).append(r)
    expected = set()
    from cinescrapers_spark.plans.pipeline_ops import NGRAM_THRESHOLD

    for rows in by_source.values():
        rows = sorted(rows, key=lambda r: r["doc_id"])
        sh = {r["doc_id"]: py_shingles(r["text"]) for r in rows}
        for i, a in enumerate(rows):
            for b in rows[i + 1 :]:
                sa, sb = sh[a["doc_id"]], sh[b["doc_id"]]
                if not sa or not sb:
                    continue
                j = len(sa & sb) / len(sa | sb)
                if round(j, 4) >= NGRAM_THRESHOLD:
                    expected.add((a["doc_id"], b["doc_id"]))
    got = {
        (r["doc_a"], r["doc_b"]) for r in q_dedup_ngram(spark, sf_dir).collect()
    }
    assert got == expected
    assert expected, "corpus should contain at least one 3-gram near-dup pair"


def test_embed_cosine_threshold_and_symmetry(spark, sf_dir):
    rows = q_dedup_embed_cosine(spark, sf_dir).collect()
    assert rows, "corpus should contain near pairs at the corpus threshold"
    for r in rows:
        assert r["cosine"] >= EMBED_NEAR_THRESHOLD
        assert r["vec_a"] < r["vec_b"]


def test_bpe_token_count_matches_python_regex(spark, sf_dir):
    pat = re.compile(BPE_PATTERN)
    got = {
        r["doc_id"]: (r["n_ws_tokens"], r["n_bpe_tokens"])
        for r in q_token_count_bpe(spark, sf_dir).collect()
    }
    for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect():
        n_ws = len(r["text"].split())
        n_bpe = len(pat.findall(r["text"].lower()))
        assert got[r["doc_id"]] == (n_ws, n_bpe), r["doc_id"]


def test_bpe_pretokenizer_contractions(spark):
    df = spark.createDataFrame(
        [(1, "It's John's dog — we'll've seen 42 of them, won't we?")],
        ["doc_id", "text"],
    )
    n = df.select(
        F.size(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit(BPE_PATTERN), F.lit(0))
        ).alias("n")
    ).first()["n"]
    toks = re.findall(BPE_PATTERN, "It's John's dog — we'll've seen 42 of them, won't we?".lower())
    assert n == len(toks)
    assert "'s" in toks and "'ll" in toks and " 42" in toks
