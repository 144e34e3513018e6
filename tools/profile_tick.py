"""Per-step wall profile of one steady crawl tick at a given parallelism.
Usage: python tools/profile_tick.py <cpus>"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from cinescrapers_spark.crawl.engine import CrawlEngine  # noqa: E402
from cinescrapers_spark.crawl.frontier import (  # noqa: E402
    init_frontier,
    schedule_tick,
    synthetic_seed_urls,
)
from cinescrapers_spark.dims import hosts_df  # noqa: E402
from cinescrapers_spark.schemas import FRONTIER  # noqa: E402
from cinescrapers_spark.session import get_spark  # noqa: E402
from cinescrapers_spark.sources.pages import fetch_parse_expand_udf  # noqa: E402

cpus = int(sys.argv[1])
spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=cpus * 2)
spark.sparkContext.setLogLevel("ERROR")
extra = ["megacinema.example.com"] + [f"host-{i}.example.com" for i in range(4000)]
hosts = hosts_df(spark, extra_hosts=extra)
wd = tempfile.mkdtemp()
eng = CrawlEngine(spark, wd, hosts, num_shards=64, tick_seconds=60.0,
                  max_per_tick=100, light_metrics=True)
seeds = synthetic_seed_urls(600_000, n_extra_hosts=4000, mega_host_frac=0.3)
raw = spark.createDataFrame(seeds).repartition(cpus * 2)
eng.bootstrap(raw)
eng.run(1)  # warmup tick

steps = {}
t_all = time.time()
frontier = eng.frontier_table.read(spark)
t = time.time()
sched = schedule_tick(frontier, 2, 60.0, 100)
fetched = sched.withColumn("__f", fetch_parse_expand_udf(F.col("url_norm"))).select(
    "url_hash",
    F.col("__f.ok").alias("__ok"),
    F.col("__f.outlinks").alias("__outlinks"),
    F.col("__f.n_items").alias("__n_items"),
).cache()
agg = fetched.agg(F.count("*").alias("n"), F.sum(F.size("__outlinks")).alias("nl")).first()
steps["1_sched+fetch+parse"] = time.time() - t
t = time.time()
discovered = fetched.select(F.explode("__outlinks").alias("url"))
new_rows = init_frontier(spark, discovered, hosts, tick=2, n_salts=8, already_canonical=True)
unseen = eng.seen.filter_unseen(new_rows, hash_col="url_hash").cache()
n_new = unseen.count()
steps["2_init+probe"] = time.time() - t
t = time.time()
eng.seen.add(unseen.select("url_hash"), tick=2)
steps["3_seen_add"] = time.time() - t
t = time.time()
marks = fetched.select(F.col("url_hash").alias("m_hash"),
                       F.when(F.col("__ok"), F.lit("fetched")).otherwise(F.lit("failed")).alias("m_state"))
updated = (frontier.join(F.broadcast(marks), frontier.url_hash == marks.m_hash, "left")
    .withColumn("state", F.when(F.col("m_state").isNotNull(), F.col("m_state")).otherwise(F.col("state")))
    .withColumn("last_fetch_tick", F.when(F.col("m_state").isNotNull(), F.lit(2)).otherwise(F.col("last_fetch_tick")))
    .withColumn("retries", F.col("retries"))
    .select(*[c.name for c in FRONTIER.fields]))
next_frontier = updated.unionByName(unseen.select(*[c.name for c in FRONTIER.fields]))
eng.frontier_table.commit(next_frontier, tick=2, row_count=0)
steps["4_update+commit"] = time.time() - t
steps["total"] = time.time() - t_all
print(json.dumps({"cpus": cpus, "sched": int(agg['n']), "links": int(agg['nl'] or 0),
                  "n_new": n_new, **{k: round(v, 2) for k, v in steps.items()}}))
