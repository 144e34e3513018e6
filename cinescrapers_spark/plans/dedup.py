"""Deduplication plans — exact, token-set Jaccard, MinHash+LSH, SimHash.

The reference's dedup story is content-addressed hashing + upsert-by-id
(SURVEY §2.4 "URL-seen membership", __main__.py:218-220,330-344). Here it
generalizes to the training-data dedup suite over ``documents``:

* exact dedup: hash-groupBy on a canonicalized-text digest (md5 so the
  DuckDB oracle matches byte-for-byte);
* near-dup, exact metric: token-set Jaccard self-join within `source`
  (the oracle-checkable ground truth);
* near-dup, scale path: MinHash signatures + LSH banding — candidates come
  from band-bucket joins (shuffle ∝ rows×bands, never O(n²)), then exact
  Jaccard verification on the candidates only. At 100 TB, the banding join
  is THE dedup plan; the exact self-join exists to prove it correct.
* SimHash: 64-bit fingerprint, hamming-bucket grouping.

All token/array work is JVM-side (split/array_* built-ins); the only Python
is in none of them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cinescrapers_spark.plans import load

JACCARD_THRESHOLD = 0.8
TOKEN_SPLIT = "[^a-z0-9]+"

# MinHash config: 16 hash functions, 8 bands × 2 rows.
# Pr[candidate | j=0.8] per band = 0.8² = .64; miss prob (1-.64)^8 ≈ 3e-4.
MINHASH_K = 16
LSH_BANDS = 8
LSH_ROWS = 2
# Pair generation inside one band bucket is quadratic in bucket size: a
# boilerplate-heavy corpus (one near-identical template in millions of docs)
# creates mega-buckets that turn the band join into n². Buckets above this
# cap are excluded from pair generation (their pairs usually surface via
# another band; lsh_oversized_buckets reports what was skipped — no silent
# truncation). Testdata buckets are tiny, so the default never fires there.
LSH_BUCKET_CAP = 1000


def _tokens(col):
    return F.array_distinct(
        F.filter(F.split(F.lower(col), TOKEN_SPLIT), lambda x: x != "")
    )


def q_dedup_exact(spark: SparkSession, sf: str) -> DataFrame:
    """Exact dedup census: distinct canonical-text digests vs total rows."""
    docs = load(spark, sf, "documents")
    canon = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    return docs.select(F.md5(canon).alias("fp")).agg(
        F.countDistinct("fp").alias("n_unique"), F.count("*").alias("n_total")
    )


def q_dedup_exact_groups(spark: SparkSession, sf: str) -> DataFrame:
    """Representative-per-duplicate-group (keep min doc_id), like the
    reference's ON CONFLICT(id) upsert keeping one row per identity."""
    docs = load(spark, sf, "documents")
    canon = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    return (
        docs.select(F.md5(canon).alias("fp"), "doc_id")
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("group_size"))
        .filter(F.col("group_size") > 1)
    )


def q_dedup_jaccard(spark: SparkSession, sf: str) -> DataFrame:
    """Exact token-set Jaccard near-dup pairs within source (ground truth).

    Self-join is partitioned by `source` (bounded groups). This is the
    correctness oracle for the LSH plan below — at scale you never run it.
    """
    docs = load(spark, sf, "documents", spread=True).select(
        "doc_id", "source", _tokens(F.col("text")).alias("toks")
    )
    a = docs.alias("a")
    b = docs.alias("b")
    inter = F.size(F.array_intersect(F.col("a.toks"), F.col("b.toks"))).cast("double")
    union = (
        F.size(F.col("a.toks")) + F.size(F.col("b.toks"))
    ).cast("double") - inter
    jac = inter / union
    return (
        a.join(
            b,
            (F.col("a.source") == F.col("b.source"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.source").alias("source"),
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.round(jac, 4).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    )


LONG_MAX = (1 << 63) - 1


def minhash_signature(tokens_col, k: int = MINHASH_K):
    """k-permutation MinHash over a token array, all JVM-side:
    sig[i] = min over tokens of xxhash64(token, seed=i).

    Round 6: ONE traversal folding a k-wide running-min accumulator
    (zip_with/least) instead of k transform+array_min passes — k fewer
    array materializations per document, measured 0.46 s → 0.31 s per
    evaluation at sf1.0 (and the expression is evaluated on both sides of
    the band self-join). Values are identical: the same xxhash64(t, i)
    minima. Edge cases match the old form where it matters: a NULL token
    array still yields a NULL signature (aggregate over null is null);
    an EMPTY array yields LONG_MAX sentinels where the old form yielded
    nulls — in both forms ALL empty docs share one identical signature,
    so they land in exactly the same buckets as each other and their
    0-token candidate pairs are rejected by verification identically
    (candidate-set equality re-proven at all four SFs)."""
    init = F.array_repeat(F.lit(LONG_MAX).cast("long"), k)
    return F.aggregate(
        tokens_col,
        init,
        lambda acc, t: F.zip_with(
            acc,
            F.array(*[F.xxhash64(t, F.lit(i)) for i in range(k)]),
            lambda a, b: F.least(a, b),
        ),
    )


def _bands(docs: DataFrame) -> DataFrame:
    """documents(doc_id, source, toks) → one row per (doc, band) with the
    band's hash — the LSH banding shuffle key."""
    sig = docs.withColumn("sig", minhash_signature(F.col("toks")))
    return sig.select(
        "doc_id",
        "source",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.xxhash64(
                            *[F.col("sig")[b * LSH_ROWS + r] for r in range(LSH_ROWS)]
                        ).alias("band_hash"),
                    )
                    for b in range(LSH_BANDS)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "source", "band.band_id", "band.band_hash")


def lsh_candidate_pairs(
    docs: DataFrame,
    bucket_cap: int | None = LSH_BUCKET_CAP,
    dedup: bool = True,
) -> DataFrame:
    """documents(doc_id, source, toks) → candidate id-pairs via LSH banding.

    Shuffle key = (source, band_id, band_hash): rows agreeing on one full
    band collide in a bucket; pairs are generated per bucket. Cost is
    rows × bands, never O(n²) — this is the 100 TB plan shape.

    Only (doc_id, band) rows travel through the band shuffle and the pair
    dedup — token arrays stay home and are re-joined by the verifier
    (shipping arrays through an 8× explode was a measured 50× slowdown at
    sf0.1).

    ``bucket_cap`` bounds the quadratic pair blowup inside a single bucket
    (mega-bucket skew kill); skipped buckets are reported by
    ``lsh_oversized_buckets`` with the same cap.

    Round 6 cap mechanics (same pair set, cheaper plan): the cap used to
    be a ``count(*) over (partition by bucket)`` window — a full
    Exchange + Sort of the bands table on EACH side of the self-join.
    Mega-buckets are by construction rare (that is why a cap exists), so
    the filter is now a broadcast LEFT ANTI join against the (usually
    EMPTY) set of oversized buckets: one map-side-combined groupBy
    produces the tiny blocklist, and the bands rows stream through the
    anti probe with no exchange and no sort. Identical survivor set —
    a row survives iff its bucket's count ≤ cap.

    (A bucket-groupBy + in-bucket combination expression was measured as
    the alternative shape and LOST to the broadcast self-join — 6.5 s vs
    2.9 s at sf1.0 — the collect_list exchange plus nested array allocs
    cost more than streaming the codegen'd hash-probe join.)
    """
    bands = _bands(docs)
    if bucket_cap:
        big = (
            bands.groupBy("source", "band_id", "band_hash")
            .agg(F.count("*").alias("__bn"))
            .filter(F.col("__bn") > bucket_cap)
            .drop("__bn")
        )
        bands = bands.join(
            F.broadcast(big), ["source", "band_id", "band_hash"], "left_anti"
        )
    a = bands.alias("a")
    b = bands.alias("b")
    out = (
        a.join(
            b,
            (F.col("a.source") == F.col("b.source"))
            & (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.source").alias("source"),
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
    )
    # full-row dedup (the projection IS the pair key): a subset
    # dropDuplicates compiles to first()-aggregates that trip
    # INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND when composed under
    # exceptAll/intersectAll in Spark 4.1.2. ``dedup=False`` lets a
    # caller that verifies candidates anyway (q_dedup_minhash_lsh) skip
    # this exchange entirely and dedup its (much smaller) verified
    # output instead — band-duplicate candidates cost ~18% extra
    # verify probes but save a full shuffle of the candidate set.
    return out.dropDuplicates() if dedup else out


def lsh_oversized_buckets(
    docs: DataFrame, bucket_cap: int = LSH_BUCKET_CAP
) -> DataFrame:
    """The buckets the cap excluded from pair generation — surface these as
    a metric next to any capped LSH run (coverage must never silently
    shrink). Columns: source, band_id, band_hash, bucket_size."""
    return (
        _bands(docs)
        .groupBy("source", "band_id", "band_hash")
        .agg(F.count("*").alias("bucket_size"))
        .filter(F.col("bucket_size") > bucket_cap)
    )


SCRATCH_BUCKETS = 32


def doc_token_table(spark: SparkSession, sf: str) -> DataFrame:
    """Scratch layout for shuffle-free dedup verification: ``documents``
    re-materialized as (doc_id, source, thash: sorted array<bigint>, ntoks),
    BUCKETED BY doc_id (VERDICT r2 #3 — the LSH verify stage previously
    re-joined the raw corpus twice, two full-corpus shuffles at 100 TB).

    * bucketed-by-doc_id: both verify joins key on doc_id, so the corpus
      side of each join reads its buckets in place with NO exchange — only
      the skinny candidate rows shuffle (∝ near-dup density, not corpus
      size). At 100 TB this is the layout you'd write documents in anyway.
    * token HASHES, not strings: xxhash64 per distinct token, sorted.
      |intersect(ha, hb)| = |intersect(toks_a, toks_b)| unless two distinct
      tokens of the union collide in 64 bits (p ≈ |union|²/2⁶⁴ — at 10⁵
      tokens/doc that is <1e-9 per pair), so the verified Jaccard is the
      exact token Jaccard; the pair-shuffle payload drops to 8 B/token.

    Created once per (session, sf) via saveAsTable and reused by every
    subsequent dedup query in the session (bench warm runs and the grouped
    variant hit the cached layout — Spark's bucketing metadata only
    attaches to catalog tables, which is why this is a table, not a
    parquet path).
    """
    import hashlib
    import shutil
    from urllib.parse import urlparse

    name = "docs_thash_" + hashlib.md5(sf.encode()).hexdigest()[:10]
    if not spark.catalog.tableExists(name):
        # the catalog is session-scoped but the warehouse dir persists: a
        # stale location from a previous session must be cleared before
        # saveAsTable (regeneration is deterministic and one scan)
        wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
        shutil.rmtree(f"{wh}/{name.lower()}", ignore_errors=True)
        # Hash-repartition by the bucket key before the bucketed write:
        # tokenize+hash+sort runs cluster-wide instead of at the input
        # file layout's parallelism, and each task holds exactly the rows
        # of its buckets, so the table lands as one file per bucket
        # (guide §6 — bucketed writes want hash-clustered input, else
        # every task writes nbuckets small files).
        docs = (
            load(spark, sf, "documents")
            .repartition(SCRATCH_BUCKETS, "doc_id")
            .select(
                "doc_id",
                "source",
                F.array_sort(
                    F.array_distinct(
                        F.transform(_tokens(F.col("text")), lambda t: F.xxhash64(t))
                    )
                ).alias("thash"),
            )
            .withColumn("ntoks", F.size("thash"))
        )
        (
            docs.write.bucketBy(SCRATCH_BUCKETS, "doc_id")
            .sortBy("doc_id")
            .mode("overwrite")
            .format("parquet")
            .saveAsTable(name)
        )
    return spark.table(name)


def q_dedup_minhash_lsh(spark: SparkSession, sf: str) -> DataFrame:
    """MinHash+LSH near-dup pairs, exact-verified: candidates from band
    buckets, then true Jaccard ≥ θ filter. With the band config above the
    expected miss rate at θ=0.8 is ~3e-4, so the output should equal
    q_dedup_jaccard (the driver's rows-only check + our pytest assert the
    containment).

    Banding runs over the raw string tokens (identical candidate set and
    recall to the canonical minhash family); verification joins the
    doc_id-bucketed token-hash layout (``doc_token_table``) so neither
    verify join shuffles the corpus.

    Round 6: candidates are pruned by an EXACT token-count necessary
    condition before the (expensive) array_intersect runs — J ≥ θ forces
    min(na,nb)/max(na,nb) ≥ θ (because |∩| ≤ min and J ≥ θ ⟹ min ≥
    θ'·max), and the prune uses integer arithmetic at θ' = 0.79994, just
    under the round(·,4) ≥ 0.8 boundary (0.79995), so no pair the jaccard
    filter would keep can be dropped. Measured 50% of candidates pruned at
    sf1.0 — half the intersect work for two long multiplies per pair
    (guide §2.3: don't compute what you throw away)."""
    docs = load(spark, sf, "documents", spread=True).select(
        "doc_id", "source", _tokens(F.col("text")).alias("toks")
    )
    # dedup=False: a candidate that collided in k bands is verified k
    # times (mean k ≈ 1.2 here) and deduplicated AFTER the θ filter —
    # the post-filter survivor set is far smaller than the candidate
    # set, so this trades ~18% extra hash-probe/intersect work for
    # skipping a full exchange of every candidate row (measured
    # 3.4 s → 2.6 s at sf1.0; identical output).
    cand = lsh_candidate_pairs(docs, dedup=False)
    tt = doc_token_table(spark, sf)
    ta = tt.select(
        F.col("doc_id").alias("doc_a"),
        F.col("thash").alias("ha"),
        F.col("ntoks").alias("na"),
    )
    tb = tt.select(
        F.col("doc_id").alias("doc_b"),
        F.col("thash").alias("hb"),
        F.col("ntoks").alias("nb"),
    )
    pairs = (
        cand.join(ta, "doc_a")
        .join(tb, "doc_b")
        .filter(
            F.least("na", "nb").cast("long") * 50000
            >= F.greatest("na", "nb").cast("long") * 39997
        )
    )
    inter = F.size(F.array_intersect(F.col("ha"), F.col("hb"))).cast("double")
    union = (F.col("na") + F.col("nb")).cast("double") - inter
    return (
        pairs.select(
            "source",
            "doc_a",
            "doc_b",
            F.round(inter / union, 4).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .dropDuplicates()
    )


def q_dedup_minhash_lsh_grouped(spark: SparkSession, sf: str) -> DataFrame:
    """MinHash+LSH near-dup pairs with EXACT-DUPLICATE COLLAPSE first —
    same output as q_dedup_minhash_lsh, the 100 TB plan shape.

    Boilerplate corpora hold large clusters of token-identical documents;
    every member of a cluster lands in the same bucket of EVERY band, so
    the band join generates |cluster|²×bands candidate pairs for
    information one representative carries. Collapsing token-set-identical
    docs first (group key = xxhash64(source, sorted token set)) runs the
    banding over one representative per group, then expands:

    * cross-group pairs: rep-pair jaccard applies to every member pair
      (identical token sets ⇒ identical jaccard);
    * within-group pairs: jaccard 1.0 ≥ θ by construction.

    The group key is the sorted token array ITSELF (Spark group/join keys
    support arrays), not a 64-bit hash of it: at the 10^9-doc regime a
    birthday-bound xxhash64 collision would silently merge two distinct
    documents and emit false jaccard=1.0 pairs (ADVICE r2). Exactness costs
    nothing here — the grouping shuffle already carried the token arrays
    for the representative min(struct(doc_id, toks)).

    Candidate volume drops from Σ|cluster|²×bands to distinct²-level; the
    quadratic member expansion only materializes OUTPUT rows (pairs that
    are genuinely near-dups). Oracle: identical to q_dedup_minhash_lsh —
    the exact-Jaccard pairs SQL.

    On THIS testdata the win is modest (5,000 docs hold only 413 exact
    dups → candidates 554k → 460k, wall parity) — the collapse pays off on
    boilerplate corpora where exact-dup clusters dominate (template pages,
    mirrored sites), which is the common-crawl regime the 100 TB target
    implies. Both plans stay registered; pick by corpus shape."""
    # text IS NOT NULL + coalesce: the membership join below keys on the
    # COMPUTED gkey; a nullable key makes the optimizer infer
    # isnotnull(<whole tokenize+sort expression>) and push it below the
    # spread exchange (the q_dedup_simhash_band pathology — the heavy
    # expression would run twice, once single-threaded). A null text never
    # produced a joinable gkey, so the pair set is unchanged.
    docs = (
        load(spark, sf, "documents", spread=True)
        .filter(F.col("text").isNotNull())
        .select("doc_id", "source", _tokens(F.col("text")).alias("toks"))
    )
    keyed = docs.withColumn(
        "gkey", F.coalesce(F.array_sort("toks"), F.array())
    )
    groups = keyed.groupBy("source", "gkey").agg(
        F.min(F.col("doc_id")).alias("rep_doc_id"),
        F.count("*").alias("gsize"),
    )
    reps = groups.select(
        "source",
        "gkey",
        F.col("rep_doc_id").alias("doc_id"),
        F.col("gkey").alias("toks"),
    )
    membership = keyed.join(
        groups.select("source", "gkey", F.col("rep_doc_id").alias("rep_id")),
        ["source", "gkey"],
    ).select("source", "rep_id", "doc_id", F.size("toks").alias("ntoks"))

    # rep-level LSH + exact verify (same machinery as the ungrouped plan)
    cand = lsh_candidate_pairs(reps.select("doc_id", "source", "toks"))
    ta = reps.select(F.col("doc_id").alias("doc_a"), F.col("toks").alias("toks_a"))
    tb = reps.select(F.col("doc_id").alias("doc_b"), F.col("toks").alias("toks_b"))
    inter = F.size(F.array_intersect(F.col("toks_a"), F.col("toks_b"))).cast("double")
    union = (F.size("toks_a") + F.size("toks_b")).cast("double") - inter
    # same exact size-ratio prune as the ungrouped plan: J ≥ θ forces
    # min/max token-count ratio ≥ θ' (θ' = 0.79994 < the round(·,4) ≥ 0.8
    # boundary), integer math, no pair the jaccard filter keeps is dropped
    ratio_ok = (
        F.least(F.size("toks_a"), F.size("toks_b")).cast("long") * 50000
        >= F.greatest(F.size("toks_a"), F.size("toks_b")).cast("long") * 39997
    )
    rep_pairs = (
        cand.join(ta, "doc_a")
        .join(tb, "doc_b")
        .filter(ratio_ok)
        .select(
            "source",
            F.col("doc_a").alias("rep_a"),
            F.col("doc_b").alias("rep_b"),
            F.round(inter / union, 4).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    )

    ma = membership.select(
        "source", F.col("rep_id").alias("rep_a"), F.col("doc_id").alias("da")
    )
    mb = membership.select(
        "source", F.col("rep_id").alias("rep_b"), F.col("doc_id").alias("db")
    )
    cross = (
        rep_pairs.join(ma, ["source", "rep_a"])
        .join(mb, ["source", "rep_b"])
        .select(
            "source",
            F.least("da", "db").alias("doc_a"),
            F.greatest("da", "db").alias("doc_b"),
            "jaccard",
        )
    )
    # within-group pairs: identical token sets ⇒ jaccard 1.0 ≥ θ (empty
    # token sets excluded — 0/0 is NaN in the ungrouped plan, never a pair)
    mm = membership.filter(F.col("ntoks") >= 1)
    within = (
        mm.alias("x")
        .join(
            mm.alias("y"),
            (F.col("x.source") == F.col("y.source"))
            & (F.col("x.rep_id") == F.col("y.rep_id"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.source").alias("source"),
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
            F.lit(1.0).alias("jaccard"),
        )
    )
    return cross.unionByName(within)


def simhash64(tokens_col):
    """64-bit SimHash, JVM-side: per-bit majority vote over token hashes.

    bit_j(sig) = 1 iff #(tokens with bit_j(xxhash64(tok)) set) * 2 > n.

    Single-pass fold (VERDICT r2 #4 — previously 64 whole-array F.filter
    traversals, each re-hashing every token): ``transform`` hashes each
    token ONCE, one ``aggregate`` traversal folds the hash array into 64
    bit-counters (the zip_with extracts 64 bits from the already-bound
    element value — no re-hash), then a constant 64-element pass assembles
    the fingerprint. Token-array work drops from 64·n hashes to n."""
    hashes = F.transform(tokens_col, lambda t: F.xxhash64(t))
    zeros = F.array_repeat(F.lit(0).cast("long"), 64)
    counts = F.aggregate(
        hashes,
        zeros,
        lambda acc, h: F.zip_with(
            acc,
            F.array(*[F.shiftright(h, j).bitwiseAND(F.lit(1)) for j in range(64)]),
            lambda a, b: a + b,
        ),
    )
    n = F.size(tokens_col).cast("long")
    # bit j contributes 2^j when set; j=63 is the sign bit of a signed long
    powers = F.array(
        *[F.lit((1 << j) if j < 63 else -(1 << 63)).cast("long") for j in range(64)]
    )
    return F.aggregate(
        F.zip_with(
            counts,
            powers,
            lambda c, p: F.when(c * 2 > n, p).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda a, b: a.bitwiseOR(b),
    )


def q_dedup_simhash(spark: SparkSession, sf: str) -> DataFrame:
    """SimHash fingerprint groups: documents sharing an identical 64-bit
    simhash (hamming-0 bucket; banding over bit-ranges generalizes to k>0)."""
    docs = load(spark, sf, "documents", spread=True).select(
        "doc_id", _tokens(F.col("text")).alias("toks")
    )
    sims = docs.select("doc_id", simhash64(F.col("toks")).alias("simhash"))
    return (
        sims.groupBy("simhash")
        .agg(F.count("*").alias("group_size"), F.min("doc_id").alias("keep_doc_id"))
        .filter(F.col("group_size") > 1)
    )


SIMHASH_BANDS = 4  # 16 bits per band; pigeonhole: hamming ≤ 3 ⇒ ≥1 equal band
SIMHASH_MAX_HAMMING = 3


def q_dedup_simhash_band(spark: SparkSession, sf: str) -> DataFrame:
    """SimHash near-dup pairs at hamming ≤ 3 — the hamming>0 generalization
    of q_dedup_simhash: candidates from banded bucket joins, exact
    bit_count(xor) filter verifies. Complete for hamming ≤ 3 by
    construction; pytest checks against the brute-force hamming pairs.
    Rows-only (bit-level ops; no SQL oracle).

    Round 6 banding (same output, collision-proof buckets): 4×16-bit
    bands put two RANDOM fingerprints in the same bucket with p = 4/2¹⁶ —
    a birthday blowup of ~n²/2¹⁴ candidate pairs (measured 50 s at sf1.0:
    50k docs → ~76M candidates, all junk). The classic block-permutation
    scheme (Manku et al.) keys on TRIPLES of 6 blocks instead: any pair
    within hamming 3 leaves ≥ 3 of the 6 blocks intact (pigeonhole), so
    keying every C(6,3) = 20 block-triple (~32 intact bits per key) is
    still complete, while random collisions drop to ~n²·20/2³². 5× the
    band rows, ~2000× fewer junk candidates; the exact verify filter is
    unchanged, so the pair set is identical. Measured 49.7 s → see
    OPTIMIZATION_r06.md."""
    import itertools

    # text IS NOT NULL up front (pushed to the parquet scan) + coalesce
    # makes the simhash key NON-NULLABLE — otherwise the optimizer infers
    # isnotnull(<whole simhash expression>) from the join keys below and
    # pushes it BELOW the spread repartition: the 64-wide fold would run
    # TWICE per side, once single-threaded before the exchange (measured
    # 44 s for the self-join alone at sf1.0; same pair set — a null-text
    # doc has a null fingerprint and never joined anyway)
    docs = (
        load(spark, sf, "documents", spread=True)
        .filter(F.col("text").isNotNull())
        .select("doc_id", _tokens(F.col("text")).alias("toks"))
    )
    sims = docs.select(
        "doc_id",
        F.coalesce(simhash64(F.col("toks")), F.lit(0)).alias("simhash"),
    )
    # 6 blocks: 4×11 bits + 2×10 bits, offsets over the 64-bit fingerprint
    widths = [11, 11, 11, 11, 10, 10]
    offs = [0, 11, 22, 33, 44, 54]

    def blk(j):
        return F.shiftright(F.col("simhash"), offs[j]).bitwiseAND(
            F.lit((1 << widths[j]) - 1)
        )

    combos = list(itertools.combinations(range(6), 3))
    reps = sims.select("simhash").distinct()
    bands = reps.select(
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(ci).alias("band_id"),
                        (
                            blk(i)
                            .bitwiseOR(F.shiftleft(blk(j), 16))
                            .bitwiseOR(F.shiftleft(blk(k), 32))
                        ).alias("band_val"),
                    )
                    for ci, (i, j, k) in enumerate(combos)
                ]
            )
        ).alias("band"),
    ).select("simhash", "band.band_id", "band.band_val")
    # IDENTICAL-FINGERPRINT COLLAPSE (the decisive move on a clustered
    # corpus): a 2,525-doc identical-fingerprint cluster makes every
    # banded self-join over DOCS enumerate its ~3.2M pairs once per
    # matching band — ~20× the output volume through the join and the
    # dedup (measured 50 s at sf1.0 either banding). Distinct
    # fingerprints are banded instead (each cluster weighs 1), and the
    # output pairs are enumerated exactly once by output-sized hash
    # joins: within-cluster pairs from a simhash self-equi-join
    # (hamming 0), cross-cluster pairs from the rep-pair set expanded
    # through two membership joins (hamming = the reps' hamming).
    a = bands.alias("a")
    b = bands.alias("b")
    ham = F.bit_count(F.col("s_a").bitwiseXOR(F.col("s_b")))
    rep_pairs = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.simhash") < F.col("b.simhash")),
        )
        .select(
            F.col("a.simhash").alias("s_a"), F.col("b.simhash").alias("s_b")
        )
        .dropDuplicates(["s_a", "s_b"])
        .filter(ham <= SIMHASH_MAX_HAMMING)
    )
    docs_sims = sims.select("doc_id", "simhash")
    within = (
        docs_sims.alias("x")
        .join(
            docs_sims.alias("y"),
            (F.col("x.simhash") == F.col("y.simhash"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
            F.lit(0).alias("hamming"),
        )
    )
    cross = (
        rep_pairs.withColumn("hamming", ham)
        .join(
            docs_sims.select(
                F.col("simhash").alias("s_a"), F.col("doc_id").alias("da")
            ),
            "s_a",
        )
        .join(
            docs_sims.select(
                F.col("simhash").alias("s_b"), F.col("doc_id").alias("db")
            ),
            "s_b",
        )
        .select(
            F.least("da", "db").alias("doc_a"),
            F.greatest("da", "db").alias("doc_b"),
            "hamming",
        )
    )
    return within.unionByName(cross)


CC_MAX_ITERS = 20  # label propagation rounds; near-dup clusters are shallow


def q_dedup_components(spark: SparkSession, sf: str) -> DataFrame:
    """Near-dup CONNECTED-COMPONENTS collapse: the operation a real
    training-data pipeline runs AFTER pair generation — transitive
    closure of the near-dup relation, one canonical id (the component's
    min doc_id) per document, so an A~B~C chain dedupes to ONE keeper
    even when A~C was never itself a pair.

    Spark-first iterative min-label propagation over the symmetric edge
    list: each round every node takes min(own label, neighbors' labels);
    converges in O(component diameter) rounds (near-dup families are
    shallow — the cap is an assert, not a truncation). Each round
    ``localCheckpoint``s to truncate the lineage a loop of joins would
    otherwise stack (the classic iterative-algorithm failure mode on a
    real cluster). At 100 TB the same loop runs with the edge list
    bucketed by node and the alternative large-star/small-star variant
    kicks in for power-law components; the corpus is never touched —
    input is the (tiny) pair set from the bucketed LSH plan.

    Oracle: transitive closure as a recursive CTE over the exact-Jaccard
    pair SQL (DuckDB WITH RECURSIVE), min reachable id per node."""
    pairs = q_dedup_minhash_lsh(spark, sf).select("doc_a", "doc_b")
    return connected_components(pairs)


def connected_components(pairs: DataFrame) -> DataFrame:
    """(doc_a, doc_b) edge list → (doc_id, component_id) via iterative
    min-label propagation (see q_dedup_components for the scale notes)."""
    edges = pairs.unionByName(
        pairs.select(
            F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b")
        )
    ).localCheckpoint(eager=True)
    labels = (
        edges.select(F.col("doc_a").alias("doc_id"))
        .distinct()
        .withColumn("component_id", F.col("doc_id"))
        .localCheckpoint(eager=True)
    )
    for _ in range(CC_MAX_ITERS):
        nbr = (
            edges.join(
                labels.select(
                    F.col("doc_id").alias("doc_b"),
                    F.col("component_id").alias("nbr_comp"),
                ),
                "doc_b",
            )
            .groupBy("doc_a")
            .agg(F.min("nbr_comp").alias("min_nbr"))
            .withColumnRenamed("doc_a", "doc_id")
        )
        new = (
            labels.join(nbr, "doc_id", "left")
            .select(
                "doc_id",
                F.least(
                    F.col("component_id"),
                    F.coalesce(F.col("min_nbr"), F.col("component_id")),
                ).alias("component_id"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new.alias("n")
            .join(labels.alias("o"), "doc_id")
            .filter(F.col("n.component_id") != F.col("o.component_id"))
            .count()
        )
        labels = new
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"near-dup components did not converge in {CC_MAX_ITERS} rounds"
        )
    return labels


_JACCARD_ORACLE = f"""
    WITH t AS (
      SELECT doc_id, source,
             list_distinct(list_filter(
               string_split_regex(lower(text), '{TOKEN_SPLIT}'), x -> x <> '')) AS toks
      FROM documents)
    SELECT a.source AS source, a.doc_id AS doc_a, b.doc_id AS doc_b,
           round(len(list_intersect(a.toks, b.toks)) * 1.0 /
                 (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))), 4)
             AS jaccard
    FROM t a JOIN t b ON a.source = b.source AND a.doc_id < b.doc_id
    WHERE len(list_intersect(a.toks, b.toks)) * 1.0 /
          (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)))
          >= {JACCARD_THRESHOLD}"""

ORACLES = {
    "q_dedup_exact": r"""
        SELECT count(DISTINCT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')))
                 AS n_unique,
               count(*) AS n_total
        FROM documents""",
    "q_dedup_exact_groups": r"""
        SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
               min(doc_id) AS keep_doc_id, count(*) AS group_size
        FROM documents GROUP BY 1 HAVING count(*) > 1""",
    "q_dedup_jaccard": _JACCARD_ORACLE,
    # LSH output is exact-verified, so the exact-pairs SQL is its oracle too;
    # any hash mismatch = a genuine LSH recall miss, which the band math
    # bounds at ~3e-4 — treat a failure here as a real signal.
    "q_dedup_minhash_lsh": _JACCARD_ORACLE,
    "q_dedup_minhash_lsh_grouped": _JACCARD_ORACLE,
    # transitive closure over the exact pair set: min reachable doc_id
    "q_dedup_components": f"""
        WITH RECURSIVE pr AS (SELECT * FROM ({_JACCARD_ORACLE})),
        edges AS (
          SELECT doc_a AS a, doc_b AS b FROM pr
          UNION ALL SELECT doc_b, doc_a FROM pr),
        nodes AS (SELECT DISTINCT a AS n FROM edges),
        walk(n, m) AS (
          SELECT n, n FROM nodes
          UNION
          SELECT e.b, w.m FROM walk w JOIN edges e ON e.a = w.n)
        SELECT n AS doc_id, MIN(m) AS component_id FROM walk GROUP BY n""",
    # q_dedup_simhash: no SQL equivalent (bit-level majority votes) — rows-only.
}

QUERIES = {
    name: (fn, ORACLES.get(name))
    for name, fn in [
        ("q_dedup_exact", q_dedup_exact),
        ("q_dedup_exact_groups", q_dedup_exact_groups),
        ("q_dedup_jaccard", q_dedup_jaccard),
        ("q_dedup_minhash_lsh", q_dedup_minhash_lsh),
        ("q_dedup_minhash_lsh_grouped", q_dedup_minhash_lsh_grouped),
        ("q_dedup_components", q_dedup_components),
        ("q_dedup_simhash", q_dedup_simhash),
        ("q_dedup_simhash_band", q_dedup_simhash_band),
    ]
}
