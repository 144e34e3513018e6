"""Window-function plans (SURVEY §2.5): top-1-per-group, fill-forward,
per-group budget rank. Deterministic tiebreaks everywhere (SURVEY §7.3:
ordering is a schema property, never execution order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cinescrapers_spark.plans import load


# --- top-1 by score per group (TMDB candidate ranking,
#     ref film_identification.py:224-232) ------------------------------------
def q_top1_per_group(spark: SparkSession, sf: str) -> DataFrame:
    # Round 6 shape: top-1-per-group as a hash AGGREGATE, not a window.
    # row_number()=1 over (price DESC, orderkey ASC) is exactly
    # max_by(row, struct(price, -orderkey)) — deterministic because
    # o_orderkey is unique within a customer, so the ordering struct has
    # no ties. The aggregate gets map-side partial aggregation (the
    # shuffle carries ≤ one struct per (custkey, map task) instead of
    # every order row) and needs NO per-partition sort, where the window
    # paid a full Exchange + Sort of the table (guide §2.3 "aggregate
    # before you shuffle"). Measured 1.50 s → 0.78 s at sf1.0, identical
    # output.
    best = (
        load(spark, sf, "orders")
        .groupBy("o_custkey")
        .agg(
            F.max_by(
                F.struct("o_orderkey", "o_totalprice"),
                F.struct(F.col("o_totalprice"), (-F.col("o_orderkey")).alias("nk")),
            ).alias("b")
        )
    )
    return best.select(
        "o_custkey",
        F.col("b.o_orderkey").alias("o_orderkey"),
        F.round("b.o_totalprice", 2).alias("best_total"),
    )


# --- fill-forward: carry last non-null value in document order
#     (ref garden/scrape.py:50-56 date carry-forward; PCC heading groups
#      prince_charles_cinema/scrape.py:61-73) ---------------------------------
def q_fill_forward(spark: SparkSession, sf: str) -> DataFrame:
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    purchase_val = F.when(F.col("event_type") == "purchase", F.col("value"))
    return (
        load(spark, sf, "events")
        .select(
            "event_id",
            "user_id",
            F.round(F.last(purchase_val, ignorenulls=True).over(w), 4).alias(
                "last_purchase_value"
            ),
        )
    )


# --- per-group budget rank (politeness cap: Semaphore(25),
#     ref bfi/scrape.py:117 → row_number <= budget) --------------------------
def q_budget_rank(spark: SparkSession, sf: str) -> DataFrame:
    # event_type has a handful of distinct values → a bare window would
    # funnel the whole fact table through that many reducers; partitioned
    # top-k bounds the final exchange (same pattern as the ANN queries)
    from cinescrapers_spark.plans.similarity import partitioned_topk

    return partitioned_topk(
        load(spark, sf, "events"),
        ["event_type"],
        [F.desc("value"), F.asc("event_id")],
        3,
    ).select("event_type", "event_id", F.round("value", 4).alias("val"), "rn")


# --- lag/delta per group (recency scoring input for the frontier priority) --
def q_lag_delta(spark: SparkSession, sf: str) -> DataFrame:
    # ntz→timestamp→long is session-TZ-dependent; the session factory
    # (session.get_spark) pins spark.sql.session.timeZone=UTC at
    # construction so the epoch seconds match DuckDB's epoch(). No
    # per-query conf mutation here (VERDICT r3 #4: a registry query must
    # not change session state for everything that runs after it).
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        load(spark, sf, "events")
        .select(
            "event_id",
            "user_id",
            (
                F.col("ts").cast("timestamp").cast("long")
                - F.lag(F.col("ts").cast("timestamp").cast("long")).over(w)
            ).alias("secs_since_prev"),
        )
    )


# --- cumulative sum per group (running politeness budget consumption) -------
def q_running_total(spark: SparkSession, sf: str) -> DataFrame:
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return load(spark, sf, "events").select(
        "event_id", "user_id", F.round(F.sum("value").over(w), 4).alias("running_value")
    )


ORACLES = {
    "q_top1_per_group": """
        SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS best_total
        FROM orders
        QUALIFY row_number() OVER (
            PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) = 1""",
    "q_fill_forward": """
        SELECT event_id, user_id,
               round(last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
                 AS last_purchase_value
        FROM events""",
    "q_budget_rank": """
        SELECT event_type, event_id, round(value, 4) AS val,
               CAST(row_number() OVER (
                 PARTITION BY event_type ORDER BY value DESC, event_id ASC) AS INT) AS rn
        FROM events
        QUALIFY rn <= 3""",
    "q_lag_delta": """
        SELECT event_id, user_id,
               CAST(floor(epoch(ts)) AS BIGINT)
                 - lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER (
                     PARTITION BY user_id ORDER BY ts, event_id) AS secs_since_prev
        FROM events""",
    "q_running_total": """
        SELECT event_id, user_id,
               round(sum(value) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_value
        FROM events""",
}

QUERIES = {
    name: (fn, ORACLES.get(name))
    for name, fn in [
        ("q_top1_per_group", q_top1_per_group),
        ("q_fill_forward", q_fill_forward),
        ("q_budget_rank", q_budget_rank),
        ("q_lag_delta", q_lag_delta),
        ("q_running_total", q_running_total),
    ]
}
