"""Named query plans (the operator inventory of SURVEY.md §2 re-expressed
as DataFrame programs) plus their ANSI-SQL oracles for the DuckDB harness.

Each module exposes ``QUERIES: dict[name, (spark_fn, oracle_sql | None)]``;
``registry()`` merges them. ``spark_fn(spark, sf_dir) -> DataFrame``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


def registry() -> dict[str, tuple[QueryFn, str | None]]:
    from cinescrapers_spark.plans import (
        advanced,
        aggregates,
        dedup,
        images_plans,
        joins,
        pipeline_ops,
        similarity,
        textops,
        windows,
    )

    out: dict[str, tuple[QueryFn, str | None]] = {}
    for mod in (
        aggregates,
        joins,
        windows,
        dedup,
        similarity,
        textops,
        images_plans,
        advanced,
        pipeline_ops,
    ):
        overlap = set(out) & set(mod.QUERIES)
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        out.update(mod.QUERIES)
    # Oracle-backed queries enumerate FIRST: the driver's CORRECTNESS gate
    # samples the first 50 registry entries, so rows-only queries must not
    # occupy slots an oracle-checkable query could use (VERDICT r2 #1).
    ordered = {k: v for k, v in out.items() if v[1] is not None}
    ordered.update({k: v for k, v in out.items() if v[1] is None})
    return ordered


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")
