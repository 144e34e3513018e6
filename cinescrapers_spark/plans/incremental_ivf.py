"""Incremental ANN — IVF as a PERSISTED index (the similarity-search
counterpart of ``plans/incremental.py``'s near-dup index).

``plans/similarity.ivf_topk`` builds its coarse quantizer and cell
assignment from scratch per query; the operation a 100 TB training-data
pipeline actually runs is "index the NEW embedding batch against the
centroids we already trained" without touching the stored corpus. This
module persists the IVF state as snapshot tables (same idempotent
per-(tick, tag) run/commit machinery as the crawl frontier and the
incremental LSH index, ``crawl/snapshots.py``):

* ``centroids`` runs: (cell, c_emb) — the K-row coarse quantizer, one
  generation per (re)train;
* ``cells`` runs: (vec_id, cell, emb) — per-batch assignments, written
  ``partitionBy("cell")`` so a search's probe list prunes the scan to
  the probed cells' files (dynamic partition pruning at cluster scale —
  the corpus side is never read outside the probed cells, let alone
  shuffled).

Per-batch cost is O(new batch): assignment is the Arrow-batched numpy
matmul (``nearest_cell_vectorized``) against the broadcast-sized
persisted centroid dim; nothing stored is re-read. A periodic
``refresh`` retrains the quantizer on the accumulated corpus (Lloyd from
the current centroids) and rewrites assignments as ONE compacted run —
LSM-style, so reads afterwards see the compaction plus later batch runs
only. Commits are idempotent per (tick, tag): a crashed batch re-runs to
the identical index state (gated by
``tests/test_plans.py::test_incremental_ivf_*``).

Generalizes the reference's one-shot embedding match
(``/root/reference/src/cinescrapers/film_identification.py:116-158``)
into the persisted-index regime; no counterpart exists in the reference
(its corpus fits in one pickle) — this is the scale path.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cinescrapers_spark.crawl.snapshots import SnapshotTable
from cinescrapers_spark.plans.similarity import (
    IVF_LLOYD_ITERS,
    IVF_NPROBE,
    TOPK,
    _as_double,
    _cell_means,
    cosine,
    lloyd_iterations,
    nearest_cell_vectorized,
    partitioned_topk,
)

CELLS_COLS = ["vec_id", "cell", "emb"]


class IncrementalIVFIndex:
    """Persisted IVF index over ``workdir``; one ``add_batch`` per tick."""

    def __init__(self, workdir: str, lloyd_iters: int = IVF_LLOYD_ITERS):
        self.cent_table = SnapshotTable(os.path.join(workdir, "ivf_centroids"))
        self.cells_table = SnapshotTable(os.path.join(workdir, "ivf_cells"))
        self.lloyd_iters = lloyd_iters

    # -- state ---------------------------------------------------------------
    def centroids(self, spark: SparkSession) -> DataFrame | None:
        """The latest centroid generation (K rows), or None pre-training."""
        latest = self.cent_table.latest()
        if latest is None:
            return None
        return self.cent_table.read(spark, latest["snapshot_id"])

    def _live_cell_runs(self, spark: SparkSession) -> DataFrame | None:
        """Stored assignments: the last compaction (if any) + every batch
        run after it — the LSM read set (mirrors ``crawl/seen``)."""
        entries = self.cells_table.manifest()
        live: list[dict] = []
        for e in entries:
            if e.get("tag") == "compact":
                live = [e]  # compaction supersedes everything before it
            else:
                live.append(e)
        if not live:
            return None
        # one discovery root per snapshot (cell=… dirs live under each),
        # unioned: partition pruning applies per scan leg. cell is a
        # partition DIRECTORY column, so inference reads numeric labels
        # back as int — re-pin string so joins against the centroid dim
        # stay same-type equi-joins (pruning still sees the cast key).
        legs = [
            spark.read.parquet(self.cells_table.snapshot_dir(e["snapshot_id"]))
            .withColumn("cell", F.col("cell").cast("string"))
            .select(*CELLS_COLS)
            for e in live
        ]
        df = legs[0]
        for leg in legs[1:]:
            df = df.unionByName(leg)
        return df

    def _train(self, c: DataFrame, seed: DataFrame | None, iters: int) -> DataFrame:
        """Lloyd-refined centroid dim from candidates ``c`` (vec_id, cell?,
        emb). Seed = per-label means when no prior generation exists (the
        same seed protocol as ``ivf_topk``), else the prior centroids."""
        if seed is None:
            seed = _cell_means(c.select("cell", "vec_id", "emb")).localCheckpoint(
                eager=True
            )
        return lloyd_iterations(
            c.select("vec_id", "emb"), seed, iters, assign_fn=nearest_cell_vectorized
        )

    # -- writes --------------------------------------------------------------
    def add_batch(self, vecs: DataFrame, tick: int) -> None:
        """vecs(vec_id, label, embedding) → assign to the persisted
        centroid generation and append the batch's cell run.

        First batch trains the quantizer on itself (per-label mean seed +
        ``lloyd_iters`` k-means refinements — identical protocol to the
        full-build ``ivf_topk``) and commits it as centroid generation 0.
        Every batch's assignment touches ONLY the new vectors: the K-row
        centroid dim ships in the matmul kernel's closure, the stored
        corpus is not read. Both commits are idempotent per (tick, tag),
        so a crashed batch re-runs to the identical index state: the
        assignment is a pure function of (batch, persisted centroids),
        and whichever commit already landed is skipped."""
        spark = vecs.sparkSession
        c = vecs.select(
            "vec_id",
            F.col("label").cast("string").alias("cell"),
            _as_double(F.col("embedding")).alias("emb"),
        )
        cent = self.centroids(spark)
        if cent is None:
            cent = self._train(c, None, self.lloyd_iters)
            self.cent_table.commit(
                cent, tick=tick, row_count=-2, tag="cent", idempotent=True
            )
            cent = self.centroids(spark)  # re-read: lineage = the files
        assigned = c.select("vec_id", "emb").join(
            nearest_cell_vectorized(c, cent), "vec_id"
        )
        self.cells_table.commit(
            assigned.select(*CELLS_COLS),
            tick=tick,
            row_count=-2,
            partition_by=["cell"],
            tag="run",
            idempotent=True,
        )

    def refresh(self, spark: SparkSession, tick: int, lloyd_iters: int = 1) -> None:
        """Periodic Lloyd refresh: retrain the quantizer on the accumulated
        corpus (seeded from the current generation — warm start), commit
        the new generation, re-assign everything stored against it and
        commit ONE compacted cell run superseding all prior runs. This is
        the O(corpus) step — run it every N batches, amortized; batches
        stay O(new). Idempotent like every commit here."""
        stored = self._live_cell_runs(spark)
        if stored is None:
            return
        cent = self._train(stored, self.centroids(spark), lloyd_iters)
        self.cent_table.commit(
            cent, tick=tick, row_count=-2, tag="cent", idempotent=True
        )
        cent = self.centroids(spark)
        reassigned = stored.select("vec_id", "emb").join(
            nearest_cell_vectorized(stored, cent), "vec_id"
        )
        self.cells_table.commit(
            reassigned.select(*CELLS_COLS),
            tick=tick,
            row_count=-2,
            partition_by=["cell"],
            tag="compact",
            idempotent=True,
        )

    # -- reads ---------------------------------------------------------------
    def search(
        self, queries: DataFrame, k: int = TOPK, nprobe: int = IVF_NPROBE
    ) -> DataFrame:
        """queries(q_id, embedding) → (q_id, vec_id, cosine) top-k over the
        probed cells of the stored corpus. Identical probe/re-rank plan to
        ``ivf_topk`` steps 3-4: the probe list (queries × nprobe rows) is
        broadcast into the cell-partitioned scan, so the corpus side is
        partition-pruned to the probed cells and never shuffles; exact
        cosine re-rank via ``partitioned_topk``."""
        spark = queries.sparkSession
        cent = self.centroids(spark)
        stored = self._live_cell_runs(spark)
        if cent is None or stored is None:
            raise FileNotFoundError("empty IVF index: add_batch first")
        q = queries.select(
            F.col("q_id"), _as_double(F.col("embedding")).alias("q_emb")
        )
        qsims = q.join(F.broadcast(cent)).select(
            "q_id", "q_emb", "cell", cosine(F.col("q_emb"), F.col("c_emb")).alias("sim")
        )
        probes = partitioned_topk(
            qsims, ["q_id"], [F.desc("sim"), F.asc("cell")], nprobe
        ).select("q_id", "q_emb", "cell")
        scored = stored.join(F.broadcast(probes), "cell").select(
            "q_id", "vec_id", cosine(F.col("emb"), F.col("q_emb")).alias("cos_raw")
        )
        return partitioned_topk(
            scored, ["q_id"], [F.desc("cos_raw"), F.asc("vec_id")], k
        ).select("q_id", "vec_id", F.round("cos_raw", 4).alias("cosine"))
