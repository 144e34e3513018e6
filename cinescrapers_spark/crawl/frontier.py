"""Frontier table: generation, priority scoring, politeness scheduling.

Generalizes the reference's staleness-driven refresh scheduler
(``/root/reference/src/cinescrapers/__main__.py:34-35,497-548``: run a
source iff MAX(last_updated) older than 5 days) and its per-site page caps
(``scrapers/bfi/scrape.py:117`` Semaphore(25); pagination bounds
``barbican/scrape.py:25``) into a web-scale priority scheduler:

* ``priority = host_rank × recency_score`` (north_star formula); recency
  generalizes MAX_STALENESS — never-fetched URLs score 1.0, recently
  fetched decay toward 0 and recover as ticks pass;
* politeness budget per host per tick =
  ``min(max_per_tick, tick_seconds / crawl_delay)`` (robots crawl-delay);
* selection = top-budget per host by ``(priority DESC, url_hash ASC)`` —
  a total order, so the schedule is a pure function of the frontier
  snapshot (determinism is a schema property, SURVEY §7.3);
* skew kill: the per-host top-k runs in two phases — per ``(host, salt)``
  top-budget first (bounds any partition to the salt's share of a
  mega-domain), then per-host top-budget over the ≤ S×budget survivors.
  Phase 1 never drops a row that phase 2 would keep (per-salt top-B is a
  superset of that salt's members of the host-global top-B), so salting is
  invisible in the result — only in the shuffle sizes.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cinescrapers_spark.schemas import FRONTIER

STALENESS_TICKS = 5  # mirrors MAX_STALENESS = 5 days (ref __main__.py:34-35)
DEFAULT_SALTS = 8


# --------------------------------------------------------------------------
# synthetic frontier (bench + tests; FIXTURES.md §2)
# --------------------------------------------------------------------------
def synthetic_seed_urls(
    n_urls: int,
    seed: int = 42,
    mega_host_frac: float = 0.5,
    n_extra_hosts: int = 0,
) -> list[dict]:
    """Deterministic raw seed URLs over the 27 cinema hosts (+ optional
    synthetic hosts for web-scale-shaped benches) + one mega-domain taking
    ``mega_host_frac`` of all URLs (skew fixture). Raw forms include
    uppercase hosts, tracking params, scheme-relative and duplicate
    variants — canonicalizer fodder."""
    from cinescrapers_spark.dims import seed_hosts

    rng = random.Random(seed)
    hosts = seed_hosts() + [f"host-{i}.example.com" for i in range(n_extra_hosts)]
    mega = "megacinema.example.com"
    rows = []
    for i in range(n_urls):
        if rng.random() < mega_host_frac:
            host = mega
        else:
            host = hosts[rng.randrange(len(hosts))]
        path = f"/whats-on/page{rng.randrange(max(2, n_urls // 20))}"
        url = f"https://{host}{path}"
        style = rng.random()
        if style < 0.1:
            url = url.replace("https://", "https://", 1).replace(host, host.upper())
        elif style < 0.2:
            url += "?utm_source=feed&utm_campaign=x"
        elif style < 0.25:
            url = "//" + url.split("://", 1)[1]
        rows.append({"url": url, "discovered_tick": 0})
    return rows


def init_frontier(
    spark: SparkSession,
    raw_urls: DataFrame,
    hosts: DataFrame,
    tick: int = 0,
    n_salts: int = DEFAULT_SALTS,
    base_url: str | None = None,
    already_canonical: bool = False,
) -> DataFrame:
    """raw urls(url [,discovered_tick]) → canonical frontier rows (dedup by
    url_norm keeping the lexicographically-first raw form).

    ``already_canonical=True`` skips the canonicalizer UDF for inputs that
    come out of a fused kernel (page_outlinks_canon_udf) — one less Python
    eval stage on the per-tick hot path."""
    from cinescrapers_spark.functions.urls import canonicalize_url_udf, url_host

    if already_canonical:
        canon = raw_urls.withColumn("url_norm", F.col("url"))
    else:
        canon = raw_urls.withColumn(
            "url_norm", canonicalize_url_udf(F.col("url"), F.lit(base_url))
        ).filter(F.col("url_norm").isNotNull())
    # one frontier row per canonical URL; keep min(url) as the raw exemplar
    tick_col = (
        F.min("discovered_tick") if "discovered_tick" in raw_urls.columns else F.lit(tick)
    )
    dedup = canon.groupBy("url_norm").agg(
        F.min("url").alias("url"), tick_col.alias("discovered_tick")
    )
    f = (
        dedup.withColumn("url_hash", F.xxhash64("url_norm"))
        .withColumn("host", url_host(F.col("url_norm")))
        .withColumn(
            "host_salt", F.pmod(F.col("url_hash"), F.lit(n_salts)).cast("int")
        )
        .join(
            F.broadcast(hosts.select("host", "host_rank", "crawl_delay")),
            "host",
            "left",
        )
        .withColumn("host_rank", F.coalesce("host_rank", F.lit(0.5)))
        .withColumn("crawl_delay", F.coalesce("crawl_delay", F.lit(1.0)))
        .withColumn("priority", F.lit(0.0))
        .withColumn("last_fetch_tick", F.lit(None).cast("int"))
        .withColumn("state", F.lit("pending"))
        .withColumn("retries", F.lit(0))
        .withColumn("depth", F.lit(0))
        .withColumn("discovered_tick", F.col("discovered_tick").cast("int"))
    )
    return f.select(*[c.name for c in FRONTIER.fields])


# --------------------------------------------------------------------------
# priority + scheduling
# --------------------------------------------------------------------------
def recency_score(tick: int):
    """1.0 for never-fetched; after a fetch, 0 until STALENESS_TICKS have
    passed, then back to 1.0 — the reference's binary staleness predicate
    (__main__.py:519-524) as a column expression."""
    age = F.lit(tick) - F.col("last_fetch_tick")
    return (
        F.when(F.col("last_fetch_tick").isNull(), 1.0)
        .when(age >= STALENESS_TICKS, 1.0)
        .otherwise(0.0)
    )


def with_priority(frontier: DataFrame, tick: int) -> DataFrame:
    return frontier.withColumn(
        "priority", F.round(F.col("host_rank") * recency_score(tick), 9)
    )


def host_budget_col(tick_seconds: float = 60.0, max_per_tick: int = 25):
    """Politeness budget per host per tick (crawl-delay + hard cap)."""
    return F.least(
        F.lit(max_per_tick),
        F.floor(F.lit(tick_seconds) / F.col("crawl_delay")).cast("int"),
    )


def schedule_tick(
    frontier: DataFrame,
    tick: int,
    tick_seconds: float = 60.0,
    max_per_tick: int = 25,
) -> DataFrame:
    """Select this tick's fetch set: eligible rows (priority>0, pending or
    stale), two-phase per-host top-budget with salted skew kill."""
    scored = with_priority(frontier, tick).filter(F.col("priority") > 0)
    budget = host_budget_col(tick_seconds, max_per_tick)

    # phase 1: per (host, salt) top-budget — bounds every window partition
    w_salt = Window.partitionBy("host", "host_salt").orderBy(
        F.desc("priority"), F.asc("url_hash")
    )
    survivors = (
        scored.withColumn("__rs", F.row_number().over(w_salt))
        .filter(F.col("__rs") <= budget)
        .drop("__rs")
    )
    # phase 2: per-host top-budget over ≤ S×budget survivors — exact result
    w_host = Window.partitionBy("host").orderBy(F.desc("priority"), F.asc("url_hash"))
    return (
        survivors.withColumn("__r", F.row_number().over(w_host))
        .filter(F.col("__r") <= budget)
        .drop("__r")
    )
