"""Data-parallel stage scaling bench: the fused fetch+parse+expand kernel
alone (one Arrow mapInPandas pass, no shuffles, no commits) at a given
core count. This isolates the engine's scalable path from per-tick
scheduling latency — on a real cluster each tick is orders of magnitude
wider, so this stage's scaling is what governs throughput there.

Usage: python -m cinescrapers_spark.bench_parse --cpus 8 --urls 400000
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, required=True)
    ap.add_argument("--urls", type=int, default=400_000)
    ap.add_argument("--exec-cores", type=int, default=2,
                    help="cores per executor JVM (executors = cpus // exec_cores)")
    ap.add_argument("--reps", type=int, default=2,
                    help="timed kernel repetitions; reported wall is the lower median")
    args = ap.parse_args()

    import os

    import pandas as pd
    from pyspark.sql import functions as F

    from cinescrapers_spark.session import get_spark
    from cinescrapers_spark.sources.pages import fetch_parse_expand_udf

    # same executor shape as bench_crawl: cpus // exec_cores executor JVMs
    os.environ.setdefault("SPARK_HOME", "/opt/spark")
    n_exec = max(1, args.cpus // args.exec_cores)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spark = get_spark(
        app_name=f"bench-parse-{args.cpus}",
        master=f"local-cluster[{n_exec},{args.exec_cores},6144]",
        shuffle_partitions=args.cpus,
        extra_conf={
            "spark.executor.memory": "5g",
            "spark.executorEnv.PYTHONPATH": repo_root,
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    urls = pd.DataFrame(
        {
            "url_norm": [
                f"https://host-{i % 5000}.example.com/whats-on/page{i % 400}"
                for i in range(args.urls)
            ]
        }
    )
    # ~2 tasks per core: each extra wave of tasks re-pays the Arrow
    # pipeline spin-up (measured: 32 tasks on 8 cores cost ~20%)
    df = spark.createDataFrame(urls).repartition(args.cpus * 2).cache()
    df.count()

    def kernel_sum(frame):
        return frame.withColumn(
            "__f", fetch_parse_expand_udf(F.col("url_norm"))
        ).select(
            F.sum(F.size("__f.outlinks")).alias("links"),
            F.sum("__f.n_items").alias("items"),
        )

    # warmup on a DISJOINT small input (same-plan reruns would reuse the
    # materialized shuffle stage and time ~nothing)
    warm = spark.createDataFrame(urls.head(20_000)).repartition(args.cpus)
    kernel_sum(warm).collect()
    # LOWER-median of --reps (default 2, conservative): this VM's
    # hypervisor-shared CPUs add ±15% run-to-run noise (BASELINE.md §C),
    # which a single sample can't separate from real scaling. Round 4 cut
    # the default from 3 reps — at 600k URLs the N-side rep costs ~166 s
    # and the 3-rep × 3-round worst case alone blew the harness bench
    # wall; cross-ROUND medians in bench.py carry the drift cancellation.
    # The kernel recomputes fully each rep (aggregation over a cached
    # input; no shuffle reuse of the timed stage).
    walls = []
    for _ in range(args.reps):
        t0 = time.time()
        row = kernel_sum(df).collect()[0]
        walls.append(time.time() - t0)
    wall = sorted(walls)[(len(walls) - 1) // 2]
    print(
        json.dumps(
            {
                "cpus": args.cpus,
                "urls": args.urls,
                "links": int(row["links"]),
                "items": int(row["items"]),
                "wall_sec": round(wall, 3),
                "walls": [round(w, 3) for w in walls],
                "urls_per_sec": round(args.urls / wall, 1),
            }
        )
    )
    sys.stdout.flush()
    spark.stop()


if __name__ == "__main__":
    main()
