"""Upsert / MERGE emulation.

The reference persists with ``INSERT ... ON CONFLICT(id) DO UPDATE``
(``/root/reference/src/cinescrapers/__main__.py:330-344``): conflict keeps
the newest row for an id, but the DO UPDATE clause is *column-selective* —
``tmdb_id`` is not in the SET list, so a matched row keeps the target's
previously-identified TMDB id even though the fresh ingest row carries NULL
(enrichment always inserts tmdb_id=NULL; identification fills it later).
With Iceberg jars this is one ``MERGE INTO target USING updates ON
t.id=u.id WHEN MATCHED THEN UPDATE SET <cols> WHEN NOT MATCHED THEN
INSERT``; the parquet emulation is the classic dedup-union plan below (same
shuffle shape a MERGE compiles to: hash repartition both sides by key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_per_key(updates: DataFrame, key: str, order_col: str) -> DataFrame:
    """One row per key: max(order_col); ties broken by a content hash of
    the whole row (execution order must never decide, SURVEY §7.3 — the
    key itself is constant within its partition, so ordering by it would
    be a no-op and leave the winner to Spark's arrival order)."""
    w = Window.partitionBy(key).orderBy(
        F.desc(order_col), F.asc(F.xxhash64(F.struct(*updates.columns)))
    )
    return (
        updates.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def merge_upsert(
    target: DataFrame | None,
    updates: DataFrame,
    key: str = "id",
    order_col: str = "last_updated",
    preserve: list[str] | None = None,
) -> DataFrame:
    """target ⟵ upsert(updates): updated keys replace, new keys insert,
    untouched target rows survive.

    ``preserve``: columns the MERGE's UPDATE clause does *not* set (the
    reference excludes ``tmdb_id``, __main__.py:333-341) — on matched keys
    the target's value wins via coalesce(target, fresh)."""
    fresh = latest_per_key(updates, key, order_col)
    if target is None:
        return fresh
    if preserve:
        keep = [c for c in preserve if c in target.columns and c in fresh.columns]
        prev = target.select(
            key, *[F.col(c).alias(f"__prev_{c}") for c in keep]
        )
        fresh = fresh.join(prev, key, "left")
        for c in keep:
            fresh = fresh.withColumn(c, F.coalesce(f"__prev_{c}", c)).drop(
                f"__prev_{c}"
            )
    kept = target.join(fresh.select(key), key, "left_anti")
    return kept.unionByName(fresh)
