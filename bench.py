"""Per-round benchmark. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Two parts:
1. Headline relational queries at $SPARK_GRAFT_SF_DIR (default sf0.1) on
   local[$SPARK_GRAFT_CPUS]; per-query wall seconds in "queries".
2. Frontier throughput (URLs scheduled+deduped/sec) on a synthetic frontier
   at local[8] vs local[32] — subprocess per cluster size (the sandbox
   evidence protocol for the north-rule scaling criterion, BASELINE.md §C).
   Reported in "frontier" with scaling efficiency = (thr_32/thr_8)/4.

"value" is the total wall of the headline queries (sec, lower = better).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q_pricing_summary",
    "q_broadcast_join_revenue",
    "q_three_way_join",
    "q_current_window",
    "q_daily_distinct",
    "q_top1_per_group",
    "q_dedup_minhash_lsh",
    "q_ann_bruteforce",
    "q_token_count",
]

BENCH_URLS = int(os.environ.get("SPARK_GRAFT_BENCH_URLS", "1000000"))
BENCH_TICKS = int(os.environ.get("SPARK_GRAFT_BENCH_TICKS", "2"))


def _run_module(module: str, cpus: int, extra: list[str]) -> dict:
    out = subprocess.run(
        [sys.executable, "-m", module, "--cpus", str(cpus), *extra],
        capture_output=True,
        text=True,
        cwd=os.path.dirname(os.path.abspath(__file__)),
        timeout=1200,
    )
    for line in reversed(out.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"{module}({cpus}) produced no JSON: {out.stderr[-2000:]}")


def run_crawl_bench(cpus: int) -> dict:
    return _run_module(
        "cinescrapers_spark.bench_crawl",
        cpus,
        ["--urls", str(BENCH_URLS), "--ticks", str(BENCH_TICKS)],
    )


def run_parse_bench(cpus: int) -> dict:
    return _run_module("cinescrapers_spark.bench_parse", cpus, [])


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from cinescrapers_spark.plans import registry
    from cinescrapers_spark.session import get_spark

    spark = get_spark(
        app_name="bench-relational",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus) if cpus.isdigit() else 32,
    )
    spark.sparkContext.setLogLevel("ERROR")
    reg = registry()

    queries: dict[str, float] = {}
    for name in HEADLINE:
        fn, _ = reg[name]
        df = fn(spark, sf_dir)
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        queries[name] = round(time.time() - t0, 3)
    total = round(sum(queries.values()), 3)
    spark.stop()

    b8 = run_crawl_bench(8)
    b32 = run_crawl_bench(32)
    thr8 = b8["throughput_urls_per_sec"]
    thr32 = b32["throughput_urls_per_sec"]
    efficiency = round((thr32 / thr8) / 4.0, 3)
    p8 = run_parse_bench(8)
    p32 = run_parse_bench(32)
    p_eff = round((p32["urls_per_sec"] / p8["urls_per_sec"]) / 4.0, 3)

    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": queries,
                "sf": sf_dir,
                # end-to-end frontier ticks at N=2 vs 4N=8 executors
                # (local-cluster; includes per-tick commit/schedule latency,
                # which amortizes on real clusters — see BASELINE.md §D)
                "frontier": {
                    "urls_in": b8["urls_in"],
                    "ticks": BENCH_TICKS,
                    "throughput_at_8": thr8,
                    "throughput_at_32": thr32,
                    "scaling_efficiency_8_to_32": efficiency,
                    "wall_at_8": b8["total_wall_sec"],
                    "wall_at_32": b32["total_wall_sec"],
                },
                # the engine's data-parallel path in isolation (fetch+parse+
                # expand kernel): governs cluster-scale throughput
                "parse_stage": {
                    "urls": p8["urls"],
                    "urls_per_sec_at_8": p8["urls_per_sec"],
                    "urls_per_sec_at_32": p32["urls_per_sec"],
                    "scaling_efficiency_8_to_32": p_eff,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
