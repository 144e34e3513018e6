"""Advanced relational plans: SQL-API queries (subqueries, rollup),
sessionization, percentiles, edit-distance matching, upsert-latest
semantics, approximate aggregates. Several run through ``spark.sql`` over
temp views — exercising the SQL surface of the engine alongside the
DataFrame surface (same Catalyst plans underneath).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cinescrapers_spark.plans import load


def _view(spark: SparkSession, sf: str, name: str) -> None:
    load(spark, sf, name).createOrReplaceTempView(name)


# --- EXISTS subquery (SQL surface) ------------------------------------------
def q_exists_subquery(spark: SparkSession, sf: str) -> DataFrame:
    _view(spark, sf, "customer")
    _view(spark, sf, "orders")
    return spark.sql(
        """
        SELECT c_mktsegment, count(*) AS n_active
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 300000)
        GROUP BY c_mktsegment
        """
    )


# --- scalar subquery + HAVING ------------------------------------------------
def q_above_avg_orders(spark: SparkSession, sf: str) -> DataFrame:
    _view(spark, sf, "orders")
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS n_big
        FROM orders
        WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
        GROUP BY o_orderpriority
        """
    )


# --- ROLLUP (subtotal hierarchy) ----------------------------------------------
def q_rollup_revenue(spark: SparkSession, sf: str) -> DataFrame:
    li = load(spark, sf, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_extendedprice"), 2).alias("gross"),
            F.count("*").alias("n"),
        )
    )


# --- gap-based sessionization (streaming-adjacent; lag + cumulative sum) ------
def q_sessionize(spark: SparkSession, sf: str) -> DataFrame:
    """Sessions = runs of events per user with gaps < 30 min; classic
    lag → gap flag → running sum → session id, then per-session rollup."""
    # session TZ pinned UTC by session.get_spark (see q_lag_delta note)
    ev = load(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("timestamp").cast("long") - F.lag(
        F.col("ts").cast("timestamp").cast("long")
    ).over(w)
    sess = (
        ev.withColumn("new_sess", F.when(gap.isNull() | (gap >= 1800), 1).otherwise(0))
        .withColumn(
            "session_no",
            F.sum("new_sess").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )
    return (
        sess.groupBy("user_id", "session_no")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("session_value"),
        )
        .groupBy("user_id")
        .agg(
            F.max("session_no").cast("long").alias("n_sessions"),
            F.max("n_events").alias("max_session_events"),
            F.round(F.max("session_value"), 4).alias("max_session_value"),
        )
    )


# --- percentiles ---------------------------------------------------------------
def q_percentiles(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 4).alias("p90"),
        F.round(F.expr("percentile(value, 0.99)"), 4).alias("p99"),
    )


# --- edit-distance candidate matching (title-matching analogue,
#     ref film_identification.py:190-222 exact-title filter + fallback) --------
def q_levenshtein_match(spark: SparkSession, sf: str) -> DataFrame:
    # deterministic candidate slice (LIMIT without ORDER BY is
    # execution-order-dependent in both engines)
    parts = load(spark, sf, "part").select("p_partkey", "p_name").filter(
        F.col("p_partkey") < 200
    )
    a = parts.alias("a")
    b = parts.alias("b")
    return (
        a.join(b, F.col("a.p_partkey") < F.col("b.p_partkey"))
        .select(
            F.col("a.p_partkey").alias("key_a"),
            F.col("b.p_partkey").alias("key_b"),
            F.levenshtein(F.col("a.p_name"), F.col("b.p_name")).alias("dist"),
        )
        .filter(F.col("dist") <= 2)
    )


# --- upsert-latest (MERGE semantics as a query; ref __main__.py:330-344) -------
def q_upsert_latest(spark: SparkSession, sf: str) -> DataFrame:
    """Latest event per user — the keep-newest half of the MERGE upsert,
    with deterministic (ts DESC, event_id DESC) tiebreak."""
    ev = load(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type", F.round("value", 4).alias("val"))
    )


# --- approximate distinct (HLL — the 10^10-scale form of COUNT(DISTINCT)) -----
def q_approx_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """approx_count_distinct per day; sketch output is engine-specific so
    there is no cross-engine oracle — pytest bounds its error vs exact."""
    ev = load(spark, sf, "events")
    return ev.groupBy(F.to_date("ts").cast("string").alias("d")).agg(
        F.approx_count_distinct("user_id", 0.02).alias("approx_users")
    )


ORACLES = {
    "q_exists_subquery": """
        SELECT c_mktsegment, count(*) AS n_active
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 300000)
        GROUP BY c_mktsegment""",
    "q_above_avg_orders": """
        SELECT o_orderpriority, count(*) AS n_big
        FROM orders
        WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
        GROUP BY o_orderpriority""",
    "q_rollup_revenue": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_extendedprice), 2) AS gross, count(*) AS n
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)""",
    "q_sessionize": """
        WITH g AS (
          SELECT user_id, event_id, value, ts,
                 CASE WHEN lag(ts) OVER w IS NULL
                        OR CAST(floor(epoch(ts)) AS BIGINT)
                           - lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER w >= 1800
                      THEN 1 ELSE 0 END AS new_sess
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), s AS (
          SELECT user_id, event_id, value,
                 sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
          FROM g
        ), per AS (
          SELECT user_id, session_no, count(*) AS n_events,
                 round(sum(value), 4) AS session_value
          FROM s GROUP BY user_id, session_no
        )
        SELECT user_id, CAST(max(session_no) AS BIGINT) AS n_sessions,
               max(n_events) AS max_session_events,
               round(max(session_value), 4) AS max_session_value
        FROM per GROUP BY user_id""",
    "q_percentiles": """
        SELECT event_type,
               round(quantile_cont(value, 0.5), 4) AS p50,
               round(quantile_cont(value, 0.9), 4) AS p90,
               round(quantile_cont(value, 0.99), 4) AS p99
        FROM events GROUP BY event_type""",
    "q_levenshtein_match": """
        WITH p AS (SELECT p_partkey, p_name FROM part WHERE p_partkey < 200)
        SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
               CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist
        FROM p a JOIN p b ON a.p_partkey < b.p_partkey
        WHERE levenshtein(a.p_name, b.p_name) <= 2""",
    "q_upsert_latest": """
        SELECT user_id, event_id, event_type, round(value, 4) AS val
        FROM events
        QUALIFY row_number() OVER (
          PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1""",
    # q_approx_distinct: HLL sketch — engine-specific, rows-only.
}

QUERIES = {
    name: (fn, ORACLES.get(name))
    for name, fn in [
        ("q_exists_subquery", q_exists_subquery),
        ("q_above_avg_orders", q_above_avg_orders),
        ("q_rollup_revenue", q_rollup_revenue),
        ("q_sessionize", q_sessionize),
        ("q_percentiles", q_percentiles),
        ("q_levenshtein_match", q_levenshtein_match),
        ("q_upsert_latest", q_upsert_latest),
        ("q_approx_distinct", q_approx_distinct),
    ]
}
