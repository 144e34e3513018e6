"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The actual plans live in ``cinescrapers_spark/plans/`` — this module is
a thin adapter over ``cinescrapers_spark.plans.registry()``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference's
    "current showtimes" read path (grab_current_showtimes + export,
    /root/reference/src/cinescrapers/__main__.py:347-391) — a 90-day
    date window over the fact table, broadcast dimension join, ordered
    projection with truncation."""
    import datetime

    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    t0 = datetime.datetime(1998, 8, 1)
    t1 = t0 + datetime.timedelta(days=90)
    orders = spark.read.parquet(f"{sf}/orders.parquet")
    cust = spark.read.parquet(f"{sf}/customer.parquet")
    return (
        orders.filter((F.col("o_orderdate") >= F.lit(t0)) & (F.col("o_orderdate") <= F.lit(t1)))
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey, "left")
        .orderBy("o_orderdate", "o_orderkey")
        .select(
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).alias("total"),
            F.coalesce("c_mktsegment", F.lit("UNKNOWN")).alias("segment"),
            F.substring("o_orderpriority", 1, 3).alias("prio"),
        )
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from cinescrapers_spark.plans import registry

    return {name: fn for name, (fn, _) in registry().items()}


def oracle_sql() -> dict[str, str]:
    from cinescrapers_spark.plans import registry

    return {name: sql for name, (_, sql) in registry().items() if sql is not None}
