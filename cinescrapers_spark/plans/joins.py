"""Join plans (SURVEY §2.4). The reference never issues a SQL JOIN — its
joins are Python dict/set probes; each maps to a first-class Spark join.
Small dimensions are broadcast explicitly (the reference's dict-build step
IS a broadcast); Catalyst/AQE would pick the same under the threshold, but
we state intent so the plan survives a 100× scale-up of the fact side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cinescrapers_spark.plans import load


# --- broadcast hash join: listings ⋈ hoisted film-info dict
#     (ref kiln/scrape.py:25-48 build, :77-87 probe; inner semantics) -------
def q_broadcast_join_revenue(spark: SparkSession, sf: str) -> DataFrame:
    li = load(spark, sf, "lineitem")
    part = load(spark, sf, "part")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey, "inner")
        .groupBy("p_brand")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count("*").alias("n_items"),
        )
    )


# --- two-dim chain: fact ⋈ dim ⋈ dim (region rollup) ------------------------
def q_dim_chain(spark: SparkSession, sf: str) -> DataFrame:
    cust = load(spark, sf, "customer")
    nat = load(spark, sf, "nation")
    reg = load(spark, sf, "region")
    return (
        cust.join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.avg("c_acctbal"), 4).alias("avg_bal"),
        )
    )


# --- left outer join + coalesce fallback (TMDB cache probe,
#     ref __main__.py:436-447) ------------------------------------------------
def q_left_join_coalesce(spark: SparkSession, sf: str) -> DataFrame:
    orders = load(spark, sf, "orders")
    cust = load(spark, sf, "customer").filter(F.col("c_acctbal") > 5000)  # sparse "cache"
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey, "left")
        .select(
            "o_orderkey",
            F.coalesce(F.col("c_mktsegment"), F.lit("UNCACHED")).alias("segment"),
        )
        .groupBy("segment")
        .agg(F.count("*").alias("cnt"))
    )


# --- left anti join: skip-already-uploaded diff (ref __main__.py:593-604) ---
def q_anti_join_customers(spark: SparkSession, sf: str) -> DataFrame:
    cust = load(spark, sf, "customer")
    orders = load(spark, sf, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_inactive"))
    )


# --- left semi join: set intersection membership (ref __main__.py:163) ------
def q_semi_join_nations(spark: SparkSession, sf: str) -> DataFrame:
    nat = load(spark, sf, "nation")
    sup = load(spark, sf, "supplier")
    return nat.join(sup, nat.n_nationkey == sup.s_nationkey, "left_semi").select(
        "n_nationkey", "n_name"
    )


# --- FK-validation join (ref __main__.py:384-385): fact rows whose FK is
#     missing from the dimension → must be empty ------------------------------
def q_fk_orphans(spark: SparkSession, sf: str) -> DataFrame:
    li = load(spark, sf, "lineitem")
    part = load(spark, sf, "part")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey, "left_anti")
        .agg(F.count("*").alias("n_orphans"))
    )


# --- multi-way fact join: order revenue with customer + supplier dims -------
def q_three_way_join(spark: SparkSession, sf: str) -> DataFrame:
    li = load(spark, sf, "lineitem")
    orders = load(spark, sf, "orders")
    sup = load(spark, sf, "supplier")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .groupBy("o_orderpriority", "s_nationkey")
        .agg(
            F.round(F.sum("l_extendedprice"), 2).alias("gross"),
            F.count("*").alias("n"),
        )
    )


ORACLES = {
    "q_broadcast_join_revenue": """
        SELECT p_brand,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               count(*) AS n_items
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand""",
    "q_dim_chain": """
        SELECT r_name, count(*) AS n_customers, round(avg(c_acctbal), 4) AS avg_bal
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name""",
    "q_left_join_coalesce": """
        SELECT coalesce(c.c_mktsegment, 'UNCACHED') AS segment, count(*) AS cnt
        FROM orders o
        LEFT JOIN (SELECT * FROM customer WHERE c_acctbal > 5000) c
          ON o.o_custkey = c.c_custkey
        GROUP BY 1""",
    "q_anti_join_customers": """
        SELECT c_mktsegment, count(*) AS n_inactive FROM customer
        WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
        GROUP BY c_mktsegment""",
    "q_semi_join_nations": """
        SELECT n_nationkey, n_name FROM nation
        WHERE n_nationkey IN (SELECT s_nationkey FROM supplier)""",
    "q_fk_orphans": """
        SELECT count(*) AS n_orphans FROM lineitem
        WHERE l_partkey NOT IN (SELECT p_partkey FROM part)""",
    "q_three_way_join": """
        SELECT o_orderpriority, s_nationkey,
               round(sum(l_extendedprice), 2) AS gross, count(*) AS n
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        GROUP BY o_orderpriority, s_nationkey""",
}

QUERIES = {
    name: (fn, ORACLES.get(name))
    for name, fn in [
        ("q_broadcast_join_revenue", q_broadcast_join_revenue),
        ("q_dim_chain", q_dim_chain),
        ("q_left_join_coalesce", q_left_join_coalesce),
        ("q_anti_join_customers", q_anti_join_customers),
        ("q_semi_join_nations", q_semi_join_nations),
        ("q_fk_orphans", q_fk_orphans),
        ("q_three_way_join", q_three_way_join),
    ]
}
