"""Frontier-throughput bench worker: run T scheduling+dedup ticks at a given
parallelism level and print one JSON line.

Invoked as a subprocess by bench.py once per cluster size (local[8] /
local[32]) — the sandbox evidence protocol for the north-rule's two-cluster
scaling criterion (BASELINE.md §C). Throughput = URLs scheduled + discovered
-and-deduped per second of tick wall-clock (JVM startup and bootstrap are
excluded: they are per-job constants, not per-URL costs).

Usage: python -m cinescrapers_spark.bench_crawl --cpus 8 --urls 120000 --ticks 3
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import tempfile


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, required=True)
    ap.add_argument("--urls", type=int, default=1_000_000)
    ap.add_argument("--ticks", type=int, default=3)
    ap.add_argument("--shards", type=int, default=64)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--hosts", type=int, default=10_000)
    ap.add_argument("--budget", type=int, default=100)
    ap.add_argument("--harvest", action="store_true",
                    help="also run the image+caption harvest stage per tick")
    ap.add_argument("--exec-cores", type=int, default=2,
                    help="cores per executor JVM (executors = cpus // exec_cores)")
    args = ap.parse_args()

    import os

    from cinescrapers_spark.crawl.engine import CrawlEngine
    from cinescrapers_spark.crawl.frontier import synthetic_seed_urls
    from cinescrapers_spark.dims import hosts_df
    from cinescrapers_spark.session import get_spark

    # local-cluster[N,C,mem]: N real executor JVMs × C cores — the honest
    # stand-in for "N vs 4N executors" (single-JVM local[k] conflates all
    # executors into one heap, whose GC/scheduler contention inverts
    # scaling measurements). The default pair is 1 vs 4 executors × 1
    # core: this VM's 32 vCPUs are backed by ~12-16 physical cores' worth
    # of cycles whose spare capacity DRIFTS, so the pair must sit deep
    # inside the always-available region — 1-vs-4 procs spin at ≥0.95
    # capacity even on degraded nights, where 2-vs-8 dips to ~0.85 and
    # 8-vs-32 is capped at ~0.6 — see BASELINE.md §C/§D0.2.
    os.environ.setdefault("SPARK_HOME", "/opt/spark")
    n_exec = max(1, args.cpus // args.exec_cores)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spark = get_spark(
        app_name=f"bench-crawl-{args.cpus}",
        master=f"local-cluster[{n_exec},{args.exec_cores},6144]",
        shuffle_partitions=args.cpus * 2,
        extra_conf={
            "spark.executor.memory": "5g",
            "spark.executorEnv.PYTHONPATH": repo_root,
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    wd = tempfile.mkdtemp(prefix=f"bench-crawl-{args.cpus}-")
    try:
        extra = ["megacinema.example.com"] + [
            f"host-{i}.example.com" for i in range(args.hosts)
        ]
        hosts = hosts_df(spark, extra_hosts=extra)
        # realistic politeness: per-host budget = min(cap, tick/delay) —
        # the cap mirrors the reference's Semaphore(25); the web-scale
        # shape comes from the host COUNT, not from uncapped budgets
        eng = CrawlEngine(
            spark,
            wd,
            hosts,
            num_shards=args.shards,
            tick_seconds=60.0,
            max_per_tick=args.budget,
            light_metrics=True,
            harvest_images=args.harvest,
        )
        if args.urls >= 2_000_000:
            # web-scale inputs generate distributed (a driver-side Python
            # list of 10M dicts is its own bottleneck); same distribution,
            # different RNG — see synthetic_seed_df
            from cinescrapers_spark.crawl.frontier import synthetic_seed_df

            raw = synthetic_seed_df(
                spark, args.urls, seed=args.seed,
                mega_host_frac=0.3, n_extra_hosts=args.hosts,
                partitions=args.cpus * 2,
            )
        else:
            import pandas as pd

            seeds = synthetic_seed_urls(
                args.urls, seed=args.seed, mega_host_frac=0.3,
                n_extra_hosts=args.hosts,
            )
            raw = spark.createDataFrame(pd.DataFrame(seeds)).repartition(
                args.cpus * 2
            )
        eng.bootstrap(raw)
        # tick 1 is a warmup (JVM JIT + Python-worker pool spin-up) —
        # excluded from steady-state throughput, same exclusion at both
        # cluster sizes; it runs with a tiny budget so the thrown-away
        # work is small while still touching every stage
        eng.max_per_tick = 2
        warm = eng.run(1)
        eng.max_per_tick = args.budget
        metrics = eng.run(args.ticks)
        total_urls = sum(m["sched_and_dedup_urls"] for m in metrics)
        total_wall = sum(m["wall_sec"] for m in metrics)
        out = {
            "cpus": args.cpus,
            "urls_in": args.urls,
            "warmup_tick": warm,
            "ticks": metrics,
            "total_urls": total_urls,
            "total_wall_sec": round(total_wall, 3),
            "throughput_urls_per_sec": round(total_urls / total_wall, 1),
        }
        if args.harvest:
            n_img = sum(m.get("new_images", 0) for m in metrics)
            n_cand = sum(m.get("image_candidates", 0) for m in metrics)
            h_wall = sum(m["timings"].get("harvest", 0.0) for m in metrics)
            out["harvested_images"] = n_img
            out["image_candidates"] = n_cand
            out["image_dedup_factor"] = round(n_cand / n_img, 2) if n_img else None
            out["images_per_sec"] = round(n_img / h_wall, 1) if h_wall else None
        print(json.dumps(out))
        sys.stdout.flush()
    finally:
        shutil.rmtree(wd, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
