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


# --- as-of join: each error event attributed to the user's most recent
#     STRICTLY preceding click. The scale-idiomatic distributed as-of: NO
#     range join at all — a single (user_id)-partitioned window carries the
#     last click forward, so the plan is one shuffle however wide the fact
#     side is (two distinct sources union-tag into the same window; here
#     both sides live in `events`, so no union is even needed). A naive
#     theta-join (e.ts > c.ts) would compile to a per-user cross product.
#
#     Tie rule (explicit, identical on both sides — ADVICE r3): a click
#     sharing the error's exact ts does NOT match (strict c.ts < e.ts);
#     among clicks tied at the same earlier ts the one with the largest
#     event_id wins. In the window this is encoded by sorting errors
#     BEFORE clicks at equal ts (so same-ts clicks fall outside the
#     error's unboundedPreceding..currentRow frame) and clicks ascending
#     by event_id (so last() picks the max). No session-state mutation:
#     epoch conversion only ever feeds ts DIFFERENCES, which are
#     independent of the session timezone (get_spark pins UTC anyway).
def q_asof_join(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load(spark, sf, "events").filter(
        F.col("event_type").isin("click", "error")
    )
    clicks_last = F.when(F.col("event_type") == "click", F.lit(1)).otherwise(F.lit(0))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", clicks_last, "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    click_id = F.when(F.col("event_type") == "click", F.col("event_id"))
    click_ts = F.when(F.col("event_type") == "click", F.col("ts"))
    epoch = lambda c: c.cast("timestamp").cast("double")  # noqa: E731
    return (
        ev.withColumn("last_click_id", F.last(click_id, ignorenulls=True).over(w))
        .withColumn("last_click_ts", F.last(click_ts, ignorenulls=True).over(w))
        .filter(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("error_id"),
            "user_id",
            "last_click_id",
            F.round(epoch(F.col("ts")) - epoch(F.col("last_click_ts")), 2).alias(
                "secs_since_click"
            ),
        )
    )


# --- range join, binned: click→purchase pairs within a 10-minute window.
#     The scale plan is bin-and-equi-join: bucket both sides to the window
#     width, explode the click side to (bin, bin+1), equi-join on
#     (user_id, bin), then apply the exact range filter. Catalyst gets a
#     shuffled equi-join (locked by tests/test_plan_shapes.py — a raw
#     BETWEEN theta-join would compile to BroadcastNestedLoopJoin and die
#     at 100 TB); each purchase bin matches exactly one exploded bin, so
#     no dedup pass is needed.
RANGE_JOIN_WINDOW_SEC = 600


def q_range_join_binned(spark: SparkSession, sf: str) -> DataFrame:
    # No session-state mutation (ADVICE r3): the join predicate and the
    # reported avg use only ts DIFFERENCES, which cancel any fixed session
    # timezone offset; get_spark pins UTC at construction regardless.
    ev = load(spark, sf, "events")
    epoch = F.col("ts").cast("timestamp").cast("double")
    bin_col = F.floor(epoch / RANGE_JOIN_WINDOW_SEC)
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id"),
            epoch.alias("c_epoch"),
            F.explode(F.array(bin_col, bin_col + 1)).alias("bin"),
        )
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id"), epoch.alias("p_epoch"), bin_col.alias("bin")
    )
    delta = F.col("p_epoch") - F.col("c_epoch")
    return (
        clicks.join(purchases, ["user_id", "bin"])
        .filter((delta >= 0) & (delta <= RANGE_JOIN_WINDOW_SEC))
        .agg(
            F.count("*").alias("n_pairs"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.avg(delta), 2).alias("avg_delay_sec"),
        )
    )


ORACLES = {
    "q_asof_join": """
        SELECT e.event_id AS error_id, e.user_id, c.event_id AS last_click_id,
               round(epoch(e.ts) - epoch(c.ts), 2) AS secs_since_click
        FROM (SELECT * FROM events WHERE event_type = 'error') e
        LEFT JOIN LATERAL (
            SELECT * FROM events c
            WHERE c.event_type = 'click' AND c.user_id = e.user_id
              AND c.ts < e.ts
            ORDER BY c.ts DESC, c.event_id DESC LIMIT 1
        ) c ON true""",
    "q_range_join_binned": """
        SELECT count(*) AS n_pairs,
               count(DISTINCT c.user_id) AS n_users,
               round(avg(epoch(p.ts) - epoch(c.ts)), 2) AS avg_delay_sec
        FROM (SELECT * FROM events WHERE event_type = 'click') c
        JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
          ON c.user_id = p.user_id
         AND p.ts >= c.ts
         AND epoch(p.ts) - epoch(c.ts) <= 600""",
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
        ("q_asof_join", q_asof_join),
        ("q_range_join_binned", q_range_join_binned),
    ]
}
