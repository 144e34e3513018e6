"""Per-step wall profile of steady crawl ticks at a given parallelism —
drives the real engine and reports its built-in per-step timings (the
metrics.jsonl "timings" dict) plus tick walls.

Usage: python tools/profile_tick.py <cpus> [n_urls] [ticks]
"""

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cinescrapers_spark.crawl.engine import CrawlEngine  # noqa: E402
from cinescrapers_spark.crawl.frontier import synthetic_seed_urls  # noqa: E402
from cinescrapers_spark.dims import hosts_df  # noqa: E402
from cinescrapers_spark.session import get_spark  # noqa: E402

cpus = int(sys.argv[1])
n_urls = int(sys.argv[2]) if len(sys.argv) > 2 else 600_000
ticks = int(sys.argv[3]) if len(sys.argv) > 3 else 2

os.environ.setdefault("SPARK_HOME", "/opt/spark")
n_exec = max(1, cpus // 4)
repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
spark = get_spark(
    master=f"local-cluster[{n_exec},4,6144]",
    shuffle_partitions=cpus * 2,
    extra_conf={
        "spark.executor.memory": "5g",
        "spark.executorEnv.PYTHONPATH": repo_root,
    },
)
spark.sparkContext.setLogLevel("ERROR")
extra = ["megacinema.example.com"] + [f"host-{i}.example.com" for i in range(4000)]
hosts = hosts_df(spark, extra_hosts=extra)
wd = tempfile.mkdtemp()
try:
    eng = CrawlEngine(spark, wd, hosts, num_shards=64, tick_seconds=60.0,
                      max_per_tick=100, light_metrics=True)
    seeds = synthetic_seed_urls(n_urls, n_extra_hosts=4000, mega_host_frac=0.3)
    raw = spark.createDataFrame(seeds).repartition(cpus * 2)
    eng.bootstrap(raw)
    eng.max_per_tick = 2
    eng.run(1)  # warmup tick
    eng.max_per_tick = 100
    for m in eng.run(ticks):
        print(json.dumps({"cpus": cpus, **m}))
finally:
    shutil.rmtree(wd, ignore_errors=True)
    spark.stop()
