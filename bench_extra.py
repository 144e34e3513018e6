"""Round-6 measurement harness (bench.py is FROZEN for measurement; this
file holds the extra instrumentation the optimization guide §1 asks for).

Times the HEADLINE queries with exactly bench.py's methodology (same
session config, same warmup, noop sink, min-of-2 reps) and additionally:

* per-query job descriptions (guide §1.5) so the SQL tab is readable;
* ``--explain DIR`` writes ``<query>_<tag>.txt`` with .explain("formatted")
  for each query (the plan evidence for plans/r06/);
* ``--reps N`` and ``--queries a,b,c`` to isolate one query (guide §1.4);
* raw reps are always recorded (VERDICT r5 wrong #2).

Usage:
  SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py \
      [--reps 2] [--queries q_a,q_b] [--explain plans/r06 --tag before]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cinescrapers_spark.plans import HEADLINE_QUERIES


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--queries", type=str, default=None)
    ap.add_argument("--explain", type=str, default=None)
    ap.add_argument("--tag", type=str, default="before")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    names = args.queries.split(",") if args.queries else list(HEADLINE_QUERIES)

    from pyspark.sql import functions as F  # noqa: N812

    from cinescrapers_spark.plans import registry
    from cinescrapers_spark.session import get_spark

    spark = get_spark(
        app_name="bench-extra",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus) if cpus.isdigit() else 32,
    )
    spark.sparkContext.setLogLevel("ERROR")
    reg = registry()

    # identical warmup to bench.py
    warm = (
        spark.read.parquet(f"{sf_dir}/region.parquet")
        .join(spark.range(100).withColumnRenamed("id", "r_regionkey"), "r_regionkey")
        .groupBy("r_name")
        .agg(F.count("*").alias("n"))
    )
    warm.write.format("noop").mode("overwrite").save()

    queries: dict[str, float] = {}
    samples: dict[str, list[float]] = {}
    for name in names:
        fn, _ = reg[name]
        if args.explain:
            os.makedirs(args.explain, exist_ok=True)
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(f"{args.explain}/{name}_{args.tag}.txt", "w") as fh:
                fh.write(plan)
        reps = []
        for i in range(args.reps):
            spark.sparkContext.setJobDescription(f"{name} rep{i}")
            df = fn(spark, sf_dir)
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            reps.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        queries[name] = round(min(reps), 3)
        samples[name] = reps
        print(f"# {name}: min={queries[name]} reps={reps}", file=sys.stderr, flush=True)
    total = round(sum(queries.values()), 3)
    spark.stop()
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": queries,
                "samples": samples,
                "per_query_rule": "min_of_%d_reps" % args.reps,
                "sf": sf_dir,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
