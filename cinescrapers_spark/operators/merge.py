"""Upsert / MERGE emulation.

The reference persists with ``INSERT ... ON CONFLICT(id) DO UPDATE``
(``/root/reference/src/cinescrapers/__main__.py:330-344``): conflict keeps
the newest row for an id. With Iceberg jars this is one
``MERGE INTO target USING updates ON t.id=u.id WHEN MATCHED THEN UPDATE
WHEN NOT MATCHED THEN INSERT``; the parquet emulation is the classic
dedup-union plan below (same shuffle shape a MERGE compiles to: hash
repartition both sides by key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_per_key(updates: DataFrame, key: str, order_col: str) -> DataFrame:
    """One row per key: max(order_col), deterministic tiebreak on the key
    itself (execution order must never decide, SURVEY §7.3)."""
    w = Window.partitionBy(key).orderBy(F.desc(order_col), F.asc(key))
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
) -> DataFrame:
    """target ⟵ upsert(updates): updated keys replace, new keys insert,
    untouched target rows survive."""
    fresh = latest_per_key(updates, key, order_col)
    if target is None:
        return fresh
    kept = target.join(fresh.select(key), key, "left_anti")
    return kept.unionByName(fresh)
