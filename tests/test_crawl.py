"""Crawl-semantics tests (SURVEY §5.2): the Spark engine's per-tick
schedule, URL-seen membership, and final frontier must equal the
single-threaded Python reference model under the same seed list and
politeness budget. Plus seen-set unit behavior and snapshot resume."""

import numpy as np
import pytest

from cinescrapers_spark.crawl.engine import CrawlEngine
from cinescrapers_spark.crawl.frontier import synthetic_seed_urls
from cinescrapers_spark.crawl.reference_model import ReferenceCrawl
from cinescrapers_spark.crawl.seen import (
    SeenSet,
    bloom_add,
    bloom_maybe,
    decode_shard,
    encode_shard,
)
from cinescrapers_spark.crawl.snapshots import SnapshotTable
from cinescrapers_spark.dims import hosts_df

N_TICKS = 3
N_SEEDS = 300


def test_shard_codec_roundtrip():
    keys = np.sort(np.random.default_rng(1).integers(0, 2**63, 1000, dtype=np.uint64))
    bloom = np.zeros(4096, dtype=np.uint8)
    bloom_add(bloom, keys)
    k2, b2 = decode_shard(encode_shard(keys, bloom))
    assert np.array_equal(keys, k2)
    assert np.array_equal(bloom, b2)
    assert bloom_maybe(b2, keys).all()  # no false negatives, ever
    probe = np.random.default_rng(2).integers(0, 2**63, 2000, dtype=np.uint64)
    fresh = probe[~np.isin(probe, keys)]
    fpr = bloom_maybe(b2, fresh).mean()
    assert fpr < 0.05


def test_seen_set_probe_insert(spark, tmp_path):
    from pyspark.sql import functions as F

    seen = SeenSet(SnapshotTable(str(tmp_path / "shards")), num_shards=8)
    df1 = spark.range(0, 500).select(F.xxhash64("id").alias("url_hash"))
    assert seen.filter_unseen(df1).count() == 500  # empty set: all unseen
    seen.add(df1, tick=0)
    assert seen.filter_unseen(df1).count() == 0  # now all seen (exact)
    df2 = spark.range(250, 750).select(F.xxhash64("id").alias("url_hash"))
    assert seen.filter_unseen(df2).count() == 250  # overlap handled exactly
    seen.add(df2, tick=1)
    assert seen.total_keys(spark) == 750


@pytest.fixture(scope="module")
def crawl_pair(spark, tmp_path_factory):
    """Run engine and reference model on identical input; return both."""
    hosts = hosts_df(spark, extra_hosts=["megacinema.example.com"])
    host_info = {
        r.host: (r.host_rank, r.crawl_delay) for r in hosts.collect()
    }
    seeds = synthetic_seed_urls(N_SEEDS, seed=7, mega_host_frac=0.5)
    raw = spark.createDataFrame(seeds)

    eng = CrawlEngine(
        spark,
        str(tmp_path_factory.mktemp("crawl")),
        hosts,
        num_shards=16,
        tick_seconds=30.0,
        max_per_tick=10,
    )
    eng.bootstrap(raw)
    eng_metrics = eng.run(N_TICKS)

    ref = ReferenceCrawl(host_info, tick_seconds=30.0, max_per_tick=10)
    ref.bootstrap([s["url"] for s in seeds])
    ref_metrics = ref.run(N_TICKS)
    return eng, eng_metrics, ref, ref_metrics


def test_crawl_schedule_matches_reference(spark, crawl_pair):
    eng, em, ref, rm = crawl_pair
    for t in range(1, N_TICKS + 1):
        got = sorted(r.url_norm for r in eng.scheduled_set(t).collect())
        assert got == ref.schedules[t - 1], f"tick {t} schedule diverges"


def test_crawl_metrics_match_reference(crawl_pair):
    eng, em, ref, rm = crawl_pair
    for e, r in zip(em, rm):
        assert e["scheduled"] == r["scheduled"]
        assert e["fetch_failed"] == r["fetch_failed"]
        assert e["new_unseen"] == r["new_unseen"]


def test_final_frontier_matches_reference(spark, crawl_pair):
    eng, _, ref, _ = crawl_pair
    got = {
        (r.url_norm, r.state, r.last_fetch_tick)
        for r in eng.frontier().collect()
    }
    want = {
        (r.url_norm, r.state, r.last_fetch_tick) for r in ref.frontier.values()
    }
    assert got == want


def test_seen_membership_matches_reference(spark, crawl_pair):
    eng, _, ref, _ = crawl_pair
    assert eng.seen.total_keys(spark) == len(ref.seen)
    # spot probe: every reference-seen hash must be seen by the engine
    from pyspark.sql import functions as F

    probes = spark.createDataFrame(
        [(h,) for h in sorted(ref.seen)[:500]], "url_hash long"
    )
    assert eng.seen.filter_unseen(probes).count() == 0


def test_resume_equivalence(spark, tmp_path):
    """Kill after tick k, resume from snapshot: final frontier identical to
    an uninterrupted run (north_rule resumability)."""
    hosts = hosts_df(spark, extra_hosts=["megacinema.example.com"])
    seeds = synthetic_seed_urls(150, seed=11)
    raw = spark.createDataFrame(seeds)

    a = CrawlEngine(spark, str(tmp_path / "a"), hosts, num_shards=8,
                    tick_seconds=30.0, max_per_tick=10)
    a.bootstrap(raw)
    a.run(4)

    b = CrawlEngine(spark, str(tmp_path / "b"), hosts, num_shards=8,
                    tick_seconds=30.0, max_per_tick=10)
    b.bootstrap(raw)
    b.run(2)
    # "restart": a brand-new engine object over the same workdir picks up
    # from the latest snapshots
    b2 = CrawlEngine(spark, str(tmp_path / "b"), hosts, num_shards=8,
                     tick_seconds=30.0, max_per_tick=10)
    assert b2.current_tick() == 2
    b2.run(2)

    fa = {(r.url_norm, r.state, r.last_fetch_tick) for r in a.frontier().collect()}
    fb = {(r.url_norm, r.state, r.last_fetch_tick) for r in b2.frontier().collect()}
    assert fa == fb
    assert a.seen.total_keys(spark) == b2.seen.total_keys(spark)
