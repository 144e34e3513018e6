"""Iceberg-shaped snapshot layer over parquet.

No Iceberg jars in the sandbox (SURVEY §7.0), so tables are emulated as
``table_dir/snap-<k>/part-*.parquet`` + ``manifest.json`` carrying snapshot
lineage and per-partition metrics — the same commit/read-latest/time-travel
interface we would bind to ``df.writeTo(...)`` with real Iceberg. Swapping
in Iceberg is a config change: every caller goes through SnapshotTable.

This generalizes the reference's idempotent file caches + "flush every 100"
checkpointing (``/root/reference/src/cinescrapers/__main__.py:218-220,
457-460``) into resumable table snapshots (north_rule: "resumable from
checkpoint with per-partition lineage + metrics").
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession

# commit(bloom_col=...) skips the sidecar above this row count (≈24 MB of
# bloom bits at 10 bits/key) — a run that big is a compaction, and reading
# it unconditionally is the documented post-compact behavior
BLOOM_MAX_N = 20_000_000


@dataclass
class SnapshotInfo:
    snapshot_id: int
    parent_id: int | None
    tick: int
    row_count: int
    metrics: dict[str, Any] = field(default_factory=dict)
    lineage: list[dict[str, Any]] = field(default_factory=list)  # per-partition
    wall_clock: float = 0.0


class SnapshotTable:
    """An append-only chain of table snapshots with manifest metadata."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(path, exist_ok=True)

    # -- manifest ------------------------------------------------------------
    def _manifest_path(self) -> str:
        return os.path.join(self.path, "manifest.json")

    def manifest(self) -> list[dict]:
        p = self._manifest_path()
        if not os.path.exists(p):
            return []
        with open(p) as f:
            return json.load(f)

    def latest(self) -> dict | None:
        m = self.manifest()
        return m[-1] if m else None

    def snapshot_dir(self, snapshot_id: int) -> str:
        return os.path.join(self.path, f"snap-{snapshot_id:06d}")

    # -- commit / read -------------------------------------------------------
    def entry_for(self, tick: int, tag: str | None = None) -> dict | None:
        """The manifest entry committed for (tick, tag), if any — the
        idempotency key for re-runnable tick commits."""
        for e in self.manifest():
            if e["tick"] == tick and e.get("tag") == tag:
                return e
        return None

    def commit(
        self,
        df: DataFrame,
        tick: int,
        metrics: dict | None = None,
        partition_by: list[str] | None = None,
        row_count: int | None = None,
        tag: str | None = None,
        idempotent: bool = False,
        bloom_col: str | None = None,
    ) -> SnapshotInfo:
        """Write df as the next snapshot (atomic via tmp-dir rename) and
        append manifest entry with per-partition lineage.

        Pass ``row_count`` when the caller already knows it — the read-back
        count is an extra Spark job per commit (measured tick overhead).
        ``row_count=-2`` sums the written parquet FOOTERS driver-side
        (exact, no Spark job — lets a commit run concurrently with the
        job that would otherwise supply the count).

        ``idempotent=True`` makes the commit a no-op when an entry for
        (tick, tag) already exists (returns the existing info): a crashed
        tick can be re-run from its parent state and each table skips the
        commits that already landed — resumable from ANY point, not just
        tick boundaries.

        ``bloom_col`` additionally builds a Bloom filter over that int64
        column of the WRITTEN snapshot (driver-side footer+column read —
        O(this run), not O(table)) and stores it as ``_bloom_<col>.npz``
        inside the snapshot dir (underscore-prefixed: Spark's scan skips
        it), recording the params in ``metrics["bloom"]``. Readers use it
        to PRUNE runs that provably contain none of a lookup's keys
        (``plans/incremental_cc``). The sidecar lands before the manifest
        append, so a committed entry always has its bloom."""
        if idempotent:
            existing = self.entry_for(tick, tag)
            if existing is not None:
                return SnapshotInfo(
                    snapshot_id=existing["snapshot_id"],
                    parent_id=existing.get("parent_id"),
                    tick=tick,
                    row_count=existing.get("row_count", -1),
                    metrics=existing.get("metrics", {}),
                    lineage=existing.get("lineage", []),
                )
        prev = self.latest()
        sid = (prev["snapshot_id"] + 1) if prev else 0
        final = self.snapshot_dir(sid)
        tmp = final + ".tmp"
        t0 = time.time()
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(tmp)
        os.rename(tmp, final)

        # per-partition lineage: the files this snapshot is made of, plus
        # their on-disk sizes (footer stats carry row counts per file)
        lineage = []
        for root, _dirs, files in os.walk(final):
            for fname in sorted(files):
                if fname.endswith(".parquet"):
                    p = os.path.join(root, fname)
                    lineage.append(
                        {
                            "file": os.path.relpath(p, self.path),
                            "bytes": os.path.getsize(p),
                        }
                    )
        if row_count == -2:
            import pyarrow.parquet as pq

            row_count = sum(
                pq.ParquetFile(os.path.join(self.path, e["file"])).metadata.num_rows
                for e in lineage
            )
        elif row_count is None:
            row_count = df.sparkSession.read.parquet(final).count()
        metrics = dict(metrics or {})
        if bloom_col is not None:
            import numpy as np
            import pyarrow.parquet as pq

            from cinescrapers_spark.plans.bloom import IntBloom

            cols = [
                pq.read_table(
                    os.path.join(self.path, e["file"]), columns=[bloom_col]
                )[bloom_col].to_numpy(zero_copy_only=False)
                for e in lineage
            ]
            ids = np.concatenate(cols) if cols else np.array([], dtype=np.int64)
            # cap: a bloom over a corpus-sized run (e.g. a compaction)
            # would not fit driver memory or prune anything useful —
            # readers treat a bloom-less run as "always read" (safe)
            if len(ids) <= BLOOM_MAX_N:
                bloom_file = os.path.join(final, f"_bloom_{bloom_col}.npz")
                IntBloom.build(ids).save(bloom_file)
                # min/max range travels with the bloom: readers mask a
                # probe set to the run's range BEFORE the bloom probe, so
                # a million out-of-range keys cannot false-positive the
                # run into being read (ids are often arrival-ordered, so
                # range alone prunes most old runs)
                metrics["bloom"] = {
                    "col": bloom_col,
                    "file": os.path.relpath(bloom_file, self.path),
                    "n": int(len(ids)),
                    "idmin": int(ids.min()) if len(ids) else 0,
                    "idmax": int(ids.max()) if len(ids) else -1,
                }
        info = SnapshotInfo(
            snapshot_id=sid,
            parent_id=prev["snapshot_id"] if prev else None,
            tick=tick,
            row_count=row_count,
            metrics=metrics,
            lineage=lineage,
            wall_clock=time.time() - t0,
        )
        entry = info.__dict__ | {"tag": tag}
        entries = self.manifest()
        entries.append(entry)
        tmp_manifest = self._manifest_path() + ".tmp"
        with open(tmp_manifest, "w") as f:
            json.dump(entries, f, indent=1, default=str)
        os.replace(tmp_manifest, self._manifest_path())
        return info

    def read(self, spark: SparkSession, snapshot_id: int | None = None) -> DataFrame:
        """Read a snapshot (latest by default) — time travel by id."""
        if snapshot_id is None:
            latest = self.latest()
            if latest is None:
                raise FileNotFoundError(f"no snapshots in {self.path}")
            snapshot_id = latest["snapshot_id"]
        return spark.read.parquet(self.snapshot_dir(snapshot_id))

    def prune(self, keep_last: int = 3) -> None:
        """Drop old snapshot data dirs (manifest keeps full lineage)."""
        import shutil

        entries = self.manifest()
        for e in entries[:-keep_last]:
            d = self.snapshot_dir(e["snapshot_id"])
            if os.path.exists(d):
                shutil.rmtree(d)
