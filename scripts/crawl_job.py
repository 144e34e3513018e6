"""spark-submit entry point for the crawl engine (north_rule: "launched via
spark-submit --py-files on multi-executor clusters").

The session comes from spark-submit's conf (no master hardcoded); the
package ships as a --py-files zip. Example:

    ./scripts/run_crawl.sh --urls 400000 --ticks 3 --workdir /tmp/crawl

On a real cluster the same command line runs with --master yarn/k8s and
executors; nothing in the job is local-mode-specific.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--urls", type=int, default=100_000)
    ap.add_argument("--ticks", type=int, default=3)
    ap.add_argument("--hosts", type=int, default=1000)
    ap.add_argument("--shards", type=int, default=64)
    ap.add_argument("--budget", type=int, default=25)
    ap.add_argument("--tick-seconds", type=float, default=60.0)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--harvest", action="store_true",
                    help="harvest image+caption pairs into the images table")
    ap.add_argument("--resume", action="store_true",
                    help="continue from the latest snapshot in --workdir")
    args = ap.parse_args()

    from cinescrapers_spark.crawl.engine import CrawlEngine
    from cinescrapers_spark.crawl.frontier import synthetic_seed_urls
    from cinescrapers_spark.dims import hosts_df

    spark = SparkSession.builder.appName("cinescrapers-crawl").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    extra = ["megacinema.example.com"] + [
        f"host-{i}.example.com" for i in range(args.hosts)
    ]
    hosts = hosts_df(spark, extra_hosts=extra)
    eng = CrawlEngine(
        spark,
        args.workdir,
        hosts,
        num_shards=args.shards,
        tick_seconds=args.tick_seconds,
        max_per_tick=args.budget,
        harvest_images=args.harvest,
    )
    if not args.resume:
        seeds = synthetic_seed_urls(
            args.urls, seed=args.seed, mega_host_frac=0.3, n_extra_hosts=args.hosts
        )
        raw = spark.createDataFrame(seeds)
        print(json.dumps(eng.bootstrap(raw)))
    else:
        print(json.dumps({"resumed_at_tick": eng.current_tick()}))
    for m in eng.run(args.ticks):
        print(json.dumps(m))
    spark.stop()


if __name__ == "__main__":
    main()
