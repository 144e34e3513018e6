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
from cinescrapers_spark.sources.pages import fetch_parse_expand_udf


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
        light_metrics: bool = False,
    ):
        self.spark = spark
        self.workdir = workdir
        self.hosts = hosts
        self.n_salts = n_salts
        self.tick_seconds = tick_seconds
        self.max_per_tick = max_per_tick
        # light_metrics drops the discovered-count job from the hot path
        # (bench mode); full mode keeps the exact dedup_dropped metric
        self.light_metrics = light_metrics
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
        self.frontier_table.commit(frontier, tick=0, metrics={"seeded": n}, row_count=n)
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

        # 1. politeness-scheduled fetch set (deterministic top-budget per
        #    host) + "fetch" outcome in one cached pass; scheduled and
        #    failed counts come from a single aggregate job
        sched = schedule_tick(
            frontier, t, tick_seconds=self.tick_seconds, max_per_tick=self.max_per_tick
        )
        # 2. fetch + parse + expand in ONE fused Arrow kernel per row:
        #    resolve → body → field parse → canonical outlinks
        fetched = (
            sched.withColumn("__f", fetch_parse_expand_udf(F.col("url_norm")))
            .select(
                "url_hash",
                F.col("__f.ok").alias("__ok"),
                F.col("__f.outlinks").alias("__outlinks"),
                F.col("__f.n_items").alias("__n_items"),
            )
            .cache()
        )
        agg = fetched.agg(
            F.count("*").alias("n"),
            F.sum(F.when(~F.col("__ok"), 1).otherwise(0)).alias("nf"),
            F.sum("__n_items").alias("ni"),
            F.sum(F.size("__outlinks")).alias("nl"),
        ).first()
        n_sched, n_fail = int(agg["n"]), int(agg["nf"] or 0)
        n_items = int(agg["ni"] or 0)
        n_links = int(agg["nl"] or 0)  # raw discovered links (pre-dedup)

        discovered = fetched.select(F.explode("__outlinks").alias("url"))

        # 3. frontier-shape the discoveries, then seen-filter. init_frontier
        #    dedups within the batch; the SeenSet kills everything already
        #    known from prior ticks. new_rows is cached: it feeds both the
        #    discovered-count and the seen probe.
        new_rows = init_frontier(
            self.spark,
            discovered,
            self.hosts,
            tick=t,
            n_salts=self.n_salts,
            already_canonical=True,
        )
        if not self.light_metrics:
            new_rows = new_rows.cache()
            n_discovered = new_rows.count()
        else:
            n_discovered = n_links  # raw link count stands in (no extra job)

        # 4. fused seen probe + insert: one cogroup shuffle yields both the
        #    unseen rows and the updated shard blobs; the shard-snapshot
        #    write materializes it, and n_new comes from parquet footers
        #    (driver-side) instead of a count job
        prev_total = self.seen.total_keys(self.spark)
        unseen, new_shards, fused = self.seen.probe_and_add(new_rows, tick=t)
        total = self.seen.commit_shards(new_shards, tick=t)
        n_new = total - prev_total

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
            "parsed_items": n_items,
            "raw_links": n_links,
            "discovered": n_discovered,
            "new_unseen": n_new,
            "dedup_dropped": n_discovered - n_new,
            "sched_and_dedup_urls": n_sched + n_links,
            "wall_sec": round(wall, 3),
        }
        # frontier rows are never deleted → next count is prev + n_new;
        # avoids a read-back count per commit
        prev_count = self.frontier_table.latest()["row_count"]
        self.frontier_table.commit(
            next_frontier, tick=t, metrics=metrics, row_count=prev_count + n_new
        )
        metrics["wall_sec"] = round(time.time() - t0, 3)
        with open(self.metrics_path, "a") as f:
            f.write(json.dumps(metrics) + "\n")
        fetched.unpersist()
        new_rows.unpersist()
        fused.unpersist()
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
