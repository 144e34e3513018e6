"""Aggregation / filter / sort / set-op plans (SURVEY §2.2, §2.3, §2.6, §2.7).

Every query mirrors a reference operation (cited per query) mapped onto the
driver's testdata star schema. Determinism rules: fixed NOW (no wall-clock in
plans), every double aggregate rounded, every computed column aliased
identically in Spark and oracle SQL.

All of these compile to single-pass hash aggregates / codegen'd filters —
partial (map-side) + final aggregation for free via Catalyst; no UDFs.
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cinescrapers_spark.plans import load

# Fixed analysis clock: inside the orders/lineitem date range (1995..2001).
NOW = datetime.datetime(1998, 8, 1)
NOW_SQL = "TIMESTAMP '1998-08-01 00:00:00'"
# next-month boundary (ref __main__.py:71-76): same day next month
MONTH = datetime.datetime(1998, 9, 1)
MONTH_SQL = "TIMESTAMP '1998-09-01 00:00:00'"


# --- counts (ref __main__.py:80-86: total + horizon-filtered COUNT) --------
def q_count_total(spark: SparkSession, sf: str) -> DataFrame:
    return load(spark, sf, "lineitem").agg(F.count("*").alias("cnt"))


def q_count_horizon(spark: SparkSession, sf: str) -> DataFrame:
    # "showtimes within the next month" (ref :83-86) on orders
    return (
        load(spark, sf, "orders")
        .filter((F.col("o_orderdate") >= F.lit(NOW)) & (F.col("o_orderdate") < F.lit(MONTH)))
        .agg(F.count("*").alias("cnt"))
    )


# --- GROUP BY date + COUNT(DISTINCT) (ref __main__.py:89-98) ---------------
def q_daily_distinct(spark: SparkSession, sf: str) -> DataFrame:
    # show_date emitted as 'yyyy-MM-dd' string: engines agree on DATE
    # semantics but disagree on the wire type; string is hash-stable.
    #
    # Round 6 shape: explicit two-phase distinct with the DATE-typed key —
    # both shuffles carry a 4-byte date instead of a 10-char string
    # (guide §2.3 "narrower types"), and the cast to the wire string runs
    # once per OUTPUT row instead of once per input row. count("user_id")
    # over the distinct (date, user) rows equals countDistinct(user_id)
    # per date (both ignore NULL user_id). Measured 1.20 s → 0.68 s at
    # sf1.0 with identical output.
    per_user = (
        load(spark, sf, "events")
        .select(F.to_date("ts").alias("_d"), "user_id")
        .distinct()
    )
    return (
        per_user.groupBy("_d")
        .agg(F.count("user_id").alias("daily_users"))
        .select(F.col("_d").cast("string").alias("show_date"), "daily_users")
    )


# --- floor-div mean of daily counts (ref __main__.py:100-105, `//`) --------
def q_avg_daily_floor(spark: SparkSession, sf: str) -> DataFrame:
    daily = (
        load(spark, sf, "events")
        .groupBy(F.to_date("ts").alias("show_date"))
        .agg(F.countDistinct("user_id").alias("daily_users"))
    )
    return daily.agg(F.floor(F.avg("daily_users")).cast("long").alias("avg_daily_users"))


# --- per-group COUNT + MAX (staleness pattern, ref __main__.py:140-145,514-517)
def q_group_count_max(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "events")
        .groupBy("event_type")
        .agg(F.count("*").alias("cnt"), F.max("ts").alias("max_ts"))
    )


# --- staleness predicate (ref __main__.py:504-524): groups whose max(ts) is
#     older than a cutoff → "due for refresh"
def q_stale_groups(spark: SparkSession, sf: str) -> DataFrame:
    cutoff = datetime.datetime(2024, 1, 30, 12, 0, 0)
    return (
        load(spark, sf, "events")
        .groupBy("user_id")
        .agg(F.max("ts").alias("last_seen"))
        .filter(F.col("last_seen") < F.lit(cutoff))
    )


# --- SELECT DISTINCT (ref __main__.py:117-118) ------------------------------
def q_distinct_segments(spark: SparkSession, sf: str) -> DataFrame:
    return load(spark, sf, "customer").select("c_mktsegment").distinct()


# --- TPC-H-Q1-shaped pricing summary: the dense hash-agg workhorse ---------
def q_pricing_summary(spark: SparkSession, sf: str) -> DataFrame:
    li = load(spark, sf, "lineitem").filter(
        F.col("l_shipdate") <= F.lit(datetime.datetime(1998, 9, 2))
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# --- min/max midpoint (ref cinemap.py:13-15) --------------------------------
def q_minmax_midpoint(spark: SparkSession, sf: str) -> DataFrame:
    return load(spark, sf, "customer").agg(
        F.round(F.min("c_acctbal"), 2).alias("bal_min"),
        F.round(F.max("c_acctbal"), 2).alias("bal_max"),
        F.round((F.min("c_acctbal") + F.max("c_acctbal")) / 2, 4).alias("bal_mid"),
    )


# --- conditional-sum accumulators (ref __main__.py:416-465 counters) --------
def q_conditional_counts(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events")
    return ev.agg(
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("num_purchases"),
        F.sum(F.when(F.col("value") > 100.0, 1).otherwise(0))
        .cast("long")
        .alias("num_high_value"),
    )


# --- date-range window + ORDER BY + truncating projection
#     (the flagship read path: grab_current_showtimes + export,
#      ref __main__.py:347-366,386) -----------------------------------------
def q_current_window(spark: SparkSession, sf: str) -> DataFrame:
    t0, t1 = NOW, NOW + datetime.timedelta(days=90)
    return (
        load(spark, sf, "orders")
        .filter((F.col("o_orderdate") >= F.lit(t0)) & (F.col("o_orderdate") <= F.lit(t1)))
        .orderBy("o_orderdate", "o_orderkey")
        .select(
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).alias("total"),
            F.substring("o_orderpriority", 1, 3).alias("prio"),
        )
    )


# --- regex predicate (movie-link filter, ref actone/scrape.py:14,26-30) ----
def q_regex_filter(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "part")
        .filter(F.col("p_name").rlike("^(red|blue) .*t$"))
        .select("p_partkey", "p_name", "p_brand")
    )


# --- bbox + membership predicates (ref rapidapi/scrape.py:149-170) ---------
def q_bbox_membership(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "customer")
        .filter(
            F.col("c_acctbal").between(1000.0, 5000.0)
            & F.col("c_nationkey").isin(1, 5, 9)
        )
        .select("c_custkey", "c_nationkey", F.round("c_acctbal", 2).alias("bal"))
    )


# --- null/validity guard (ref __main__.py:215-217) ---------------------------
def q_null_guard(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "events")
        .filter(F.col("props").isNotNull() & (F.col("value") > 0))
        .groupBy("event_type")
        .agg(F.count("*").alias("cnt"))
    )


# --- ORDER BY + LIMIT top-k (ref film_identification.py:231-232; LIMIT 100
#     fixture tests/film_id/test_film_id.py:22) ------------------------------
def q_topk_orders(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "orders")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
        .select("o_orderkey", F.round("o_totalprice", 2).alias("total"))
    )


# --- set ops (ref __main__.py:163-164: & and - on shortcode sets) ----------
def q_intersect_nations(spark: SparkSession, sf: str) -> DataFrame:
    c = load(spark, sf, "customer").select(F.col("c_nationkey").alias("nationkey")).distinct()
    s = load(spark, sf, "supplier").select(F.col("s_nationkey").alias("nationkey")).distinct()
    return c.intersect(s)


def q_except_nations(spark: SparkSession, sf: str) -> DataFrame:
    c = load(spark, sf, "customer").select(F.col("c_nationkey").alias("nationkey")).distinct()
    s = load(spark, sf, "supplier").select(F.col("s_nationkey").alias("nationkey")).distinct()
    return c.subtract(s)


# --- union fan-in (ref __main__.py:528-542: extend across scrapers) ---------
def q_union_all_counts(spark: SparkSession, sf: str) -> DataFrame:
    c = load(spark, sf, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.unionByName(s).groupBy("nationkey").agg(F.count("*").alias("cnt"))


# --- uniqueness assertion (ref __main__.py:373-374; cinema_details.py:280) --
def q_key_uniqueness(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "part")
        .groupBy("p_partkey")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") > 1)
    )


ORACLES = {
    "q_count_total": "SELECT count(*) AS cnt FROM lineitem",
    "q_count_horizon": f"""
        SELECT count(*) AS cnt FROM orders
        WHERE o_orderdate >= {NOW_SQL} AND o_orderdate < {MONTH_SQL}""",
    "q_daily_distinct": """
        SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS show_date,
               count(DISTINCT user_id) AS daily_users
        FROM events GROUP BY 1""",
    "q_avg_daily_floor": """
        SELECT CAST(floor(avg(daily_users)) AS BIGINT) AS avg_daily_users FROM (
          SELECT CAST(ts AS DATE) AS show_date,
                 count(DISTINCT user_id) AS daily_users
          FROM events GROUP BY 1)""",
    "q_group_count_max": """
        SELECT event_type, count(*) AS cnt, max(ts) AS max_ts
        FROM events GROUP BY event_type""",
    "q_stale_groups": """
        SELECT user_id, max(ts) AS last_seen FROM events
        GROUP BY user_id
        HAVING max(ts) < TIMESTAMP '2024-01-30 12:00:00'""",
    "q_distinct_segments": "SELECT DISTINCT c_mktsegment FROM customer",
    "q_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
               round(avg(l_quantity), 4) AS avg_qty,
               round(avg(l_discount), 4) AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus""",
    "q_minmax_midpoint": """
        SELECT round(min(c_acctbal), 2) AS bal_min,
               round(max(c_acctbal), 2) AS bal_max,
               round((min(c_acctbal) + max(c_acctbal)) / 2, 4) AS bal_mid
        FROM customer""",
    "q_conditional_counts": """
        SELECT CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
                 AS num_purchases,
               CAST(sum(CASE WHEN value > 100.0 THEN 1 ELSE 0 END) AS BIGINT)
                 AS num_high_value
        FROM events""",
    "q_current_window": f"""
        SELECT o_orderkey, o_orderdate,
               round(o_totalprice, 2) AS total,
               substring(o_orderpriority, 1, 3) AS prio
        FROM orders
        WHERE o_orderdate >= {NOW_SQL}
          AND o_orderdate <= {NOW_SQL} + INTERVAL 90 DAY
        ORDER BY o_orderdate, o_orderkey""",
    "q_regex_filter": r"""
        SELECT p_partkey, p_name, p_brand FROM part
        WHERE regexp_matches(p_name, '^(red|blue) .*t$')""",
    "q_bbox_membership": """
        SELECT c_custkey, c_nationkey, round(c_acctbal, 2) AS bal
        FROM customer
        WHERE c_acctbal BETWEEN 1000.0 AND 5000.0
          AND c_nationkey IN (1, 5, 9)""",
    "q_null_guard": """
        SELECT event_type, count(*) AS cnt FROM events
        WHERE props IS NOT NULL AND value > 0
        GROUP BY event_type""",
    "q_topk_orders": """
        SELECT o_orderkey, round(o_totalprice, 2) AS total FROM orders
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""",
    "q_intersect_nations": """
        SELECT DISTINCT c_nationkey AS nationkey FROM customer
        INTERSECT
        SELECT DISTINCT s_nationkey AS nationkey FROM supplier""",
    "q_except_nations": """
        SELECT DISTINCT c_nationkey AS nationkey FROM customer
        EXCEPT
        SELECT DISTINCT s_nationkey AS nationkey FROM supplier""",
    "q_union_all_counts": """
        SELECT nationkey, count(*) AS cnt FROM (
          SELECT c_nationkey AS nationkey FROM customer
          UNION ALL
          SELECT s_nationkey AS nationkey FROM supplier)
        GROUP BY nationkey""",
    "q_key_uniqueness": """
        SELECT p_partkey, count(*) AS cnt FROM part
        GROUP BY p_partkey HAVING count(*) > 1""",
}

QUERIES = {
    name: (fn, ORACLES.get(name))
    for name, fn in [
        ("q_count_total", q_count_total),
        ("q_count_horizon", q_count_horizon),
        ("q_daily_distinct", q_daily_distinct),
        ("q_avg_daily_floor", q_avg_daily_floor),
        ("q_group_count_max", q_group_count_max),
        ("q_stale_groups", q_stale_groups),
        ("q_distinct_segments", q_distinct_segments),
        ("q_pricing_summary", q_pricing_summary),
        ("q_minmax_midpoint", q_minmax_midpoint),
        ("q_conditional_counts", q_conditional_counts),
        ("q_current_window", q_current_window),
        ("q_regex_filter", q_regex_filter),
        ("q_bbox_membership", q_bbox_membership),
        ("q_null_guard", q_null_guard),
        ("q_topk_orders", q_topk_orders),
        ("q_intersect_nations", q_intersect_nations),
        ("q_except_nations", q_except_nations),
        ("q_union_all_counts", q_union_all_counts),
        ("q_key_uniqueness", q_key_uniqueness),
    ]
}
