"""The crawl loop: schedule → fetch → expand → dedup → commit, per tick.

This is the reference's refresh loop (``__main__.py:497-548``: staleness
select → fan-out scrape → upsert) re-expressed as iterative dataflow over
snapshot tables:

    frontier_{t+1} = frontier_t[fetched-marks] ∪ (outlinks(fetch(sched_t)) ∖ seen)

Every tick commits frontier + seen-shard snapshots with per-partition
lineage and fetch/parse/dedup metrics → the crawl is resumable from any
tick (kill + restart reads the latest manifests), per north_rule.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cinescrapers_spark.crawl.frontier import (
    DEFAULT_SALTS,
    init_frontier,
    schedule_tick,
)
from cinescrapers_spark.crawl.seen import SeenSet
from cinescrapers_spark.crawl.snapshots import SnapshotTable
from cinescrapers_spark.schemas import FRONTIER
from cinescrapers_spark.sources.pages import fetch_ok_udf, page_outlinks_udf


class CrawlEngine:
    def __init__(
        self,
        spark: SparkSession,
        workdir: str,
        hosts: DataFrame,
        num_shards: int = 64,
        n_salts: int = DEFAULT_SALTS,
        tick_seconds: float = 60.0,
        max_per_tick: int = 25,
    ):
        self.spark = spark
        self.workdir = workdir
        self.hosts = hosts
        self.n_salts = n_salts
        self.tick_seconds = tick_seconds
        self.max_per_tick = max_per_tick
        self.frontier_table = SnapshotTable(os.path.join(workdir, "frontier"))
        self.seen = SeenSet(
            SnapshotTable(os.path.join(workdir, "seen_shards")), num_shards=num_shards
        )
        self.metrics_path = os.path.join(workdir, "metrics.jsonl")

    # -- lifecycle -------------------------------------------------------------
    def bootstrap(self, raw_seed_urls: DataFrame) -> dict:
        """Tick 0: canonicalize seeds, build frontier snapshot 0, register
        every frontier URL in the seen set."""
        frontier = init_frontier(
            self.spark, raw_seed_urls, self.hosts, tick=0, n_salts=self.n_salts
        )
        frontier = frontier.cache()
        n = frontier.count()
        self.seen.add(frontier.select("url_hash"), tick=0)
        self.frontier_table.commit(frontier, tick=0, metrics={"seeded": n})
        frontier.unpersist()
        return {"tick": 0, "seeded": n}

    def current_tick(self) -> int:
        latest = self.frontier_table.latest()
        return latest["tick"] if latest else -1

    # -- one tick ----------------------------------------------------------------
    def tick(self) -> dict:
        """Run the next tick; returns its metrics dict."""
        t = self.current_tick() + 1
        t0 = time.time()
        frontier = self.frontier_table.read(self.spark)

        # 1. politeness-scheduled fetch set (deterministic top-budget per host)
        sched = schedule_tick(
            frontier, t, tick_seconds=self.tick_seconds, max_per_tick=self.max_per_tick
        ).cache()
        n_sched = sched.count()

        # 2. "fetch" + expand: outlinks of ok pages (Arrow-batched UDF)
        fetched = sched.withColumn("__ok", fetch_ok_udf(F.col("url_norm"))).cache()
        discovered = (
            fetched.filter(F.col("__ok"))
            .select(F.explode(page_outlinks_udf(F.col("url_norm"))).alias("url"))
        )
        n_fail = fetched.filter(~F.col("__ok")).count()

        # 3. canonicalize + frontier-shape the discoveries, then seen-filter.
        #    init_frontier dedups within the batch; the SeenSet kills
        #    everything already known from prior ticks.
        new_rows = init_frontier(
            self.spark, discovered, self.hosts, tick=t, n_salts=self.n_salts
        )
        unseen = self.seen.filter_unseen(new_rows, hash_col="url_hash").cache()
        n_discovered = new_rows.count()
        n_new = unseen.count()

        # 4. register the new URLs as seen (commits a seen-shard snapshot)
        self.seen.add(unseen.select("url_hash"), tick=t)

        # 5. fold fetch results back into the frontier + append new rows
        marks = fetched.select(
            F.col("url_hash").alias("m_hash"),
            F.when(F.col("__ok"), F.lit("fetched")).otherwise(F.lit("failed")).alias(
                "m_state"
            ),
        )
        updated = (
            frontier.join(F.broadcast(marks), frontier.url_hash == marks.m_hash, "left")
            .withColumn(
                "state",
                F.when(F.col("m_state").isNotNull(), F.col("m_state")).otherwise(
                    F.col("state")
                ),
            )
            .withColumn(
                "last_fetch_tick",
                F.when(F.col("m_state").isNotNull(), F.lit(t)).otherwise(
                    F.col("last_fetch_tick")
                ),
            )
            .withColumn(
                "retries",
                F.when(F.col("m_state") == "failed", F.col("retries") + 1).otherwise(
                    F.col("retries")
                ),
            )
            .select(*[c.name for c in FRONTIER.fields])
        )
        next_frontier = updated.unionByName(unseen.select(*[c.name for c in FRONTIER.fields]))

        wall = time.time() - t0
        metrics = {
            "tick": t,
            "scheduled": n_sched,
            "fetch_failed": n_fail,
            "discovered": n_discovered,
            "new_unseen": n_new,
            "dedup_dropped": n_discovered - n_new,
            "sched_and_dedup_urls": n_sched + n_discovered,
            "wall_sec": round(wall, 3),
        }
        self.frontier_table.commit(next_frontier, tick=t, metrics=metrics)
        with open(self.metrics_path, "a") as f:
            f.write(json.dumps(metrics) + "\n")
        sched.unpersist()
        fetched.unpersist()
        unseen.unpersist()
        return metrics

    def run(self, n_ticks: int) -> list[dict]:
        out = []
        for _ in range(n_ticks):
            m = self.tick()
            out.append(m)
            if m["scheduled"] == 0:  # empty-schedule termination
                break
        return out

    # -- introspection ------------------------------------------------------------
    def frontier(self) -> DataFrame:
        return self.frontier_table.read(self.spark)

    def scheduled_set(self, tick: int) -> DataFrame:
        """Recompute the (deterministic) schedule of a given tick from that
        tick's parent snapshot — used by equivalence tests and resume
        audits; identical output to what the tick actually fetched."""
        parent = self.frontier_table.read(self.spark, snapshot_id=tick - 1)
        return schedule_tick(
            parent, tick, tick_seconds=self.tick_seconds, max_per_tick=self.max_per_tick
        )
