"""Incremental connected components — canonical near-dup labels
maintained as crawl batches ARRIVE, the companion of
``plans/incremental.IncrementalNearDupIndex`` (which emits each batch's
verified pair set) and the incremental counterpart of
``plans/dedup.q_dedup_components``.

The 100 TB shape is a DISTRIBUTED UNION-FIND WITH DEFERRED PATH
COMPRESSION, persisted as two snapshot tables (same idempotent
per-(tick, tag) machinery as the frontier/LSH/IVF state,
``crawl/snapshots.py``):

* ``nodes`` runs — (doc_id, comp): the component a document was assigned
  ON ARRIVAL. Append-only, O(new docs) per batch; never rewritten by
  later merges (that's the roots table's job).
* ``roots`` — (comp, root): the flattened forest mapping superseded
  component labels to their current canonical root. Rewritten per batch,
  but its size is O(components ever merged), not O(corpus) — merging is
  rare relative to arrival, and compaction clears it.

Per batch: resolve the batch's endpoints through (nodes ∘ roots) — only
rows whose doc_ids appear in the batch are touched, so the lookup join
prunes to O(batch) against the bucketed runs at scale — then run the
BATCH-LOCAL label propagation on the component-level graph (edges whose
endpoints resolve to different roots), which is tiny: its nodes are
component labels, not documents. Compose the resulting merge map into
``roots`` (flat ∘ flat = flat, one join), append the new documents'
(doc_id, comp) rows, done. A crashed batch re-runs to the identical
state (pure function of batch + prior snapshots; both commits idempotent
per tick). ``compact`` flattens everything into one nodes run and an
empty roots table, LSM-style.

Labels equal the FULL-BATCH ``connected_components`` exactly (min doc_id
per component), regardless of how edges are split across batches —
equivalence-gated in tests/test_plans.py, any split, plus crash-resume.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cinescrapers_spark.crawl.snapshots import SnapshotTable
from cinescrapers_spark.plans.dedup import connected_components

NODES_COLS = ["doc_id", "comp"]
ROOTS_COLS = ["comp", "root"]


class IncrementalComponents:
    """Persisted incremental CC over ``workdir``; one ``add_pairs`` per
    tick of (doc_a, doc_b) near-dup edges."""

    def __init__(self, workdir: str):
        self.nodes_table = SnapshotTable(os.path.join(workdir, "cc_nodes"))
        self.roots_table = SnapshotTable(os.path.join(workdir, "cc_roots"))

    # -- state ---------------------------------------------------------------
    def _runs(self, spark: SparkSession, table: SnapshotTable, upto: int):
        entries = [
            e for e in table.manifest() if e.get("tick", 0) <= upto
        ]
        live: list[dict] = []
        for e in entries:
            if e.get("tag") == "compact":
                live = [e]
            else:
                live.append(e)
        if not live:
            return None
        legs = [
            spark.read.parquet(table.snapshot_dir(e["snapshot_id"]))
            for e in live
        ]
        df = legs[0]
        for leg in legs[1:]:
            df = df.unionByName(leg)
        return df

    def _latest_roots(self, spark: SparkSession, upto: int):
        entries = [
            e for e in self.roots_table.manifest() if e.get("tick", 0) <= upto
        ]
        if not entries:
            return None
        return spark.read.parquet(
            self.roots_table.snapshot_dir(entries[-1]["snapshot_id"])
        ).select(*ROOTS_COLS)

    def labels(self, spark: SparkSession, upto: int = 10**9) -> DataFrame:
        """(doc_id, component_id): every indexed document's canonical
        label — nodes resolved through the flattened roots forest."""
        nodes = self._runs(spark, self.nodes_table, upto)
        if nodes is None:
            return spark.createDataFrame(
                [], "doc_id long, component_id long"
            )
        roots = self._latest_roots(spark, upto)
        if roots is None:
            return nodes.select(
                "doc_id", F.col("comp").alias("component_id")
            )
        return (
            nodes.join(roots, "comp", "left")
            .select(
                "doc_id",
                F.coalesce("root", "comp").alias("component_id"),
            )
        )

    # -- writes --------------------------------------------------------------
    def add_pairs(self, pairs: DataFrame, tick: int) -> None:
        """Fold one batch of (doc_a, doc_b) edges into the persisted
        labels. O(batch + merged components), never O(corpus)."""
        spark = pairs.sparkSession
        e = pairs.select("doc_a", "doc_b").dropDuplicates()
        prior = self.labels(spark, upto=tick - 1)
        la = prior.select(
            F.col("doc_id").alias("doc_a"), F.col("component_id").alias("ca")
        )
        lb = prior.select(
            F.col("doc_id").alias("doc_b"), F.col("component_id").alias("cb")
        )
        # endpoints resolve to their current root; unseen docs label = own id
        em = (
            e.join(la, "doc_a", "left")
            .join(lb, "doc_b", "left")
            .select(
                "doc_a",
                "doc_b",
                F.coalesce("ca", F.col("doc_a")).alias("ra"),
                F.coalesce("cb", F.col("doc_b")).alias("rb"),
            )
            .localCheckpoint(eager=True)
        )
        # component-level graph: tiny (labels, not documents)
        comp_edges = (
            em.filter(F.col("ra") != F.col("rb"))
            .select(
                F.col("ra").alias("doc_a"), F.col("rb").alias("doc_b")
            )
            .dropDuplicates()
        )
        merge = connected_components(comp_edges).select(
            F.col("doc_id").alias("old_root"),
            F.col("component_id").alias("new_root"),
        )  # flat min-root map over the merged labels

        # new documents arriving this batch: comp = resolved-and-merged root
        batch_docs = (
            em.select(F.col("doc_a").alias("doc_id"), F.col("ra").alias("r"))
            .unionByName(
                em.select(
                    F.col("doc_b").alias("doc_id"), F.col("rb").alias("r")
                )
            )
            .groupBy("doc_id")
            .agg(F.min("r").alias("r"))
        )
        new_docs = (
            batch_docs.join(
                prior.select("doc_id"), "doc_id", "left_anti"
            )
            .join(merge, batch_docs.r == F.col("old_root"), "left")
            .select(
                "doc_id", F.coalesce("new_root", "r").alias("comp")
            )
        )
        self.nodes_table.commit(
            new_docs.select(*NODES_COLS),
            tick=tick,
            row_count=-2,
            tag="run",
            idempotent=True,
        )
        # roots' = roots ∘ merge (flat ∘ flat = flat): remap existing
        # entries, add merge entries for labels that were themselves roots
        old_roots = self._latest_roots(spark, tick - 1)
        if old_roots is None:
            old_roots = spark.createDataFrame([], "comp long, root long")
        remapped = (
            old_roots.join(
                merge, old_roots.root == F.col("old_root"), "left"
            )
            .select(
                "comp", F.coalesce("new_root", "root").alias("root")
            )
        )
        fresh = merge.join(
            old_roots.select("comp"),
            merge.old_root == F.col("comp"),
            "left_anti",
        ).select(
            F.col("old_root").alias("comp"), F.col("new_root").alias("root")
        )
        roots_new = (
            remapped.unionByName(fresh)
            .filter(F.col("comp") != F.col("root"))
            .dropDuplicates(["comp"])
        )
        self.roots_table.commit(
            roots_new.select(*ROOTS_COLS),
            tick=tick,
            row_count=-2,
            tag="roots",
            idempotent=True,
        )

    def compact(self, spark: SparkSession, tick: int) -> None:
        """LSM compaction: one flattened nodes run (comp = canonical
        label), empty roots — reads afterwards touch one run + no join."""
        flat = self.labels(spark, upto=tick - 1).select(
            "doc_id", F.col("component_id").alias("comp")
        )
        self.nodes_table.commit(
            flat, tick=tick, row_count=-2, tag="compact", idempotent=True
        )
        self.roots_table.commit(
            spark.createDataFrame([], "comp long, root long"),
            tick=tick,
            row_count=-2,
            tag="roots",
            idempotent=True,
        )
