"""Partitioned URL-seen set: bloom pre-filter + exact sorted-hash authority,
stored as an LSM of per-shard segment runs.

Generalizes the reference's seen-checks — ``filepath.exists()`` on a hashed
URL before fetching (``/root/reference/src/cinescrapers/__main__.py:218-220``)
and ``ON CONFLICT(id)`` upsert (``:330-344``) — to 10^10 keys.

Design (SURVEY §4.3):

* identity = ``xxhash64(url_norm)`` (64-bit, JVM-computed);
* shard key = ``pmod(url_hash, P)`` — the SAME hash partitioning is used for
  the shard state and the candidate shuffle, so probe and state colocate
  (one shuffle of the candidates, zero shuffle of the state);
* per shard: a numpy bloom filter (fast negative; never authoritative) in
  front of a SORTED uint64 array probed by binary search — exact membership
  over the 64-bit hashes, FPR=0 on the authoritative path (a bloom- or
  cuckoo-only design would let false positives silently drop URLs, which
  the "URL-seen membership must match the reference" gate forbids);
* probe and insert run inside ``cogroup().applyInPandas`` — Arrow-batched,
  no per-row Python, state in/out as binary blobs;
* **storage is merge-on-read**: each tick commits a *run* — one blob per
  TOUCHED shard holding only that tick's fresh keys — so per-tick write
  bytes are O(new keys), not O(total keys) (a full-state rewrite per tick
  is ~78 GB at 10^10 keys / P=4096 and would dominate tick wall-clock).
  Probes union the newest base with the runs after it; ``compact`` folds
  base+runs into a fresh base, mirroring the frontier's MOR compaction;
* every commit is idempotent per (tick, kind) → a crashed tick re-runs
  against the state *as of its parent tick* and re-commits safely.

At 10^10 URLs / P=4096 shards: ~2.4M hashes/shard = 19 MB exact + ~3 MB
bloom in the compacted base — comfortably an executor-memory object; P
scales linearly with the frontier.
"""

from __future__ import annotations

import glob
import json
import os
import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cinescrapers_spark.crawl.snapshots import SnapshotTable

SHARD_SCHEMA = "shard_id int, data binary, n_keys long"

_MAGIC = b"SEEN1"


# --------------------------------------------------------------------------
# shard blob codec: [magic][n_bloom_bytes][bloom bits][n_keys][sorted u64 keys]
# --------------------------------------------------------------------------
def encode_shard(keys: np.ndarray, bloom: np.ndarray) -> bytes:
    return (
        _MAGIC
        + struct.pack("<q", len(bloom))
        + bloom.tobytes()
        + struct.pack("<q", len(keys))
        + keys.tobytes()
    )


def decode_shard(blob: bytes) -> tuple[np.ndarray, np.ndarray]:
    assert blob[:5] == _MAGIC, "bad shard blob"
    off = 5
    (nb,) = struct.unpack_from("<q", blob, off)
    off += 8
    bloom = np.frombuffer(blob, dtype=np.uint8, count=nb, offset=off).copy()
    off += nb
    (nk,) = struct.unpack_from("<q", blob, off)
    off += 8
    keys = np.frombuffer(blob, dtype=np.uint64, count=nk, offset=off).copy()
    return keys, bloom


# -- bloom over uint64 keys: k=4 index functions from splitmix64 remixes -----
def _bloom_positions(keys: np.ndarray, m_bits: int) -> list[np.ndarray]:
    x = keys.copy()
    out = []
    for _ in range(4):
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        x = x ^ (x >> np.uint64(31))
        out.append((x % np.uint64(m_bits)).astype(np.uint64))
    return out


def bloom_add(bloom: np.ndarray, keys: np.ndarray) -> None:
    m_bits = len(bloom) * 8
    for pos in _bloom_positions(keys, m_bits):
        np.bitwise_or.at(bloom, (pos >> np.uint64(3)).astype(np.int64),
                         (np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8)))


def bloom_maybe(bloom: np.ndarray, keys: np.ndarray) -> np.ndarray:
    """Vector of bools: True = possibly seen, False = definitely new."""
    m_bits = len(bloom) * 8
    res = np.ones(len(keys), dtype=bool)
    for pos in _bloom_positions(keys, m_bits):
        byte = bloom[(pos >> np.uint64(3)).astype(np.int64)]
        bit = (byte >> (pos & np.uint64(7)).astype(np.uint8)) & 1
        res &= bit.astype(bool)
    return res


def _membership(blobs: list[bytes], h: np.ndarray) -> np.ndarray:
    """Exact membership of hashes ``h`` across a list of segment blobs
    (base + runs): bloom rejects per segment, binary search settles."""
    seen = np.zeros(len(h), dtype=bool)
    for blob in blobs:
        keys, bloom = decode_shard(blob)
        if not len(keys):
            continue
        todo = ~seen
        if not todo.any():
            break
        ht = h[todo]
        maybe = bloom_maybe(bloom, ht) if len(bloom) else np.ones(len(ht), bool)
        hit = np.zeros(len(ht), dtype=bool)
        if maybe.any():
            idx = np.searchsorted(keys, ht[maybe])
            idx = np.clip(idx, 0, len(keys) - 1)
            hit[maybe] = keys[idx] == ht[maybe]
        seen[todo.nonzero()[0][hit]] = True
    return seen


class SeenSet:
    """Sharded seen-set backed by a SnapshotTable of binary shard blobs,
    committed as per-tick runs with periodic base compaction."""

    def __init__(
        self,
        table: SnapshotTable,
        num_shards: int = 64,
        bloom_bytes_per_shard: int = 1 << 16,
    ):
        self.table = table
        self.P = num_shards
        self.bloom_bytes = bloom_bytes_per_shard

    # -- column helpers -------------------------------------------------------
    @staticmethod
    def hash_col(url_norm_col):
        return F.xxhash64(url_norm_col)

    def shard_col(self, url_hash_col):
        return F.pmod(url_hash_col, F.lit(self.P)).cast("int")

    # -- state selection (merge-on-read) ---------------------------------------
    def _entries_as_of(self, as_of: int | None) -> list[dict]:
        """Newest base with tick ≤ as_of plus the runs after it (≤ as_of).
        as_of=None means 'latest'."""
        entries = self.table.manifest()
        if as_of is not None:
            entries = [e for e in entries if e["tick"] <= as_of]
        bases = [e for e in entries if e.get("metrics", {}).get("kind") == "base"]
        floor = bases[-1]["tick"] if bases else -1
        picked = ([bases[-1]] if bases else []) + [
            e
            for e in entries
            if e.get("metrics", {}).get("kind") != "base" and e["tick"] > floor
        ]
        return picked

    def _state_df(self, spark: SparkSession, as_of: int | None = None) -> DataFrame:
        entries = self._entries_as_of(as_of)
        if not entries:
            return spark.createDataFrame([], SHARD_SCHEMA)
        dirs = [self.table.snapshot_dir(e["snapshot_id"]) for e in entries]
        return spark.read.schema(SHARD_SCHEMA).parquet(*dirs)

    # -- probe ----------------------------------------------------------------
    def filter_unseen(
        self,
        candidates: DataFrame,
        hash_col: str = "url_hash",
        as_of: int | None = None,
    ) -> DataFrame:
        """Return candidate rows whose hash is NOT in the seen set (as of
        the given tick; latest by default).

        One shuffle: candidates are hash-partitioned by shard_id and
        cogrouped with their state segments (base + runs); inside each
        group blooms reject definite-news cheaply, then binary search
        settles the rest exactly.
        """
        spark = candidates.sparkSession
        shards = self._state_df(spark, as_of)
        cand = candidates.withColumn("__shard", self.shard_col(F.col(hash_col)))
        out_schema = cand.schema
        hname = hash_col

        def probe(key, cdf: pd.DataFrame, sdf: pd.DataFrame) -> pd.DataFrame:
            if len(cdf) == 0 or len(sdf) == 0:
                return cdf
            h = cdf[hname].to_numpy().astype(np.uint64)
            seen = _membership(list(sdf["data"]), h)
            return cdf[~seen]

        unseen = (
            cand.groupBy("__shard")
            .cogroup(shards.groupBy("shard_id"))
            .applyInPandas(probe, schema=out_schema)
        )
        return unseen.drop("__shard")

    # -- insert ---------------------------------------------------------------
    def add(self, new_urls: DataFrame, tick: int, hash_col: str = "url_hash") -> None:
        """Register new hashes: probe against state as of tick-1, write the
        fresh keys as this tick's run (touched shards only — O(new keys))."""
        _, new_shards, fused = self.probe_and_add(new_urls, tick, hash_col)
        self.commit_shards(new_shards, tick=tick)
        fused.unpersist()

    # -- fused probe+insert -----------------------------------------------------
    def probe_and_add(
        self, candidates: DataFrame, tick: int, hash_col: str = "url_hash"
    ):
        """ONE cogroup pass against the state as of ``tick - 1``: filter
        candidates AND produce this tick's run blobs (fresh keys only, per
        touched shard). Output is a tagged union — run rows plus the unseen
        candidate rows — split by the caller. Halves the candidate shuffle
        vs probe-then-add and drops a barrier from the tick.

        Within-batch duplicates (the same URL discovered on two pages this
        tick) collide in their shard and are deduped here, keeping the
        lexicographically-first exemplar row — the reference model's
        ``min(url)`` rule (reference_model.py _add_urls). Reading state
        as-of the parent tick makes a re-run of a crashed tick recompute
        byte-identical outputs (torn-commit safety).

        Returns (unseen_df, run_shards_df, fused_cached): the first two are
        filters over one CACHED cogroup output; call ``commit_shards`` with
        the run, then unpersist the cache.
        """
        spark = candidates.sparkSession
        shards = self._state_df(spark, as_of=tick - 1)
        cand = candidates.withColumn("__shard", self.shard_col(F.col(hash_col)))
        cand_fields = [f"`{c}`" for c in candidates.columns]
        out_schema = (
            "__kind string, shard_id int, data binary, n_keys long, "
            + ", ".join(
                f"{f.name} {f.dataType.simpleString()}" for f in candidates.schema.fields
            )
        )
        bloom_bytes = self.bloom_bytes
        cand_cols = list(candidates.columns)
        hname = hash_col
        # exemplar rule for within-batch duplicates: min (depth, url) per
        # hash — BFS shortest-path depth first, then the lexicographic url
        # (mirrors the reference model's _add_urls); caption joins the key
        # for the image-harvest instance (two pages captioning the same
        # poster differently must resolve deterministically)
        sort_keys = [hname] + [
            c for c in ("depth", "url", "caption") if c in cand_cols
        ]

        def fused(key, cdf: pd.DataFrame, sdf: pd.DataFrame) -> pd.DataFrame:
            shard_id = int(key[0])
            empty = pd.DataFrame(
                columns=["__kind", "shard_id", "data", "n_keys"] + cand_cols
            )
            if not len(cdf):
                return empty
            cdf = (
                cdf.drop(columns=["__shard"])
                .sort_values(sort_keys)
                .drop_duplicates(subset=[hname])
            )
            h = cdf[hname].to_numpy().astype(np.uint64)
            seen = _membership(list(sdf["data"]), h) if len(sdf) else np.zeros(
                len(h), dtype=bool
            )
            fresh_rows = cdf[~seen]
            if not len(fresh_rows):
                return empty
            fresh = np.sort(fresh_rows[hname].to_numpy().astype(np.uint64))
            bloom = np.zeros(bloom_bytes, dtype=np.uint8)
            bloom_add(bloom, fresh)
            shard_row = pd.DataFrame(
                {
                    "__kind": ["shard"],
                    "shard_id": [shard_id],
                    "data": [encode_shard(fresh, bloom)],
                    "n_keys": [len(fresh)],
                    **{c: [None] for c in cand_cols},
                }
            )
            url_rows = fresh_rows.copy()
            url_rows["__kind"] = "url"
            url_rows["shard_id"] = None
            url_rows["data"] = None
            url_rows["n_keys"] = None
            return pd.concat([shard_row, url_rows], ignore_index=True)[
                ["__kind", "shard_id", "data", "n_keys"] + cand_cols
            ]

        fused_out = (
            cand.groupBy("__shard")
            .cogroup(shards.groupBy("shard_id"))
            .applyInPandas(fused, schema=out_schema)
            .cache()
        )
        unseen = fused_out.filter(F.col("__kind") == "url").select(*cand_fields)
        new_shards = fused_out.filter(F.col("__kind") == "shard").select(
            "shard_id", "data", "n_keys"
        )
        return unseen, new_shards, fused_out

    def commit_shards(self, new_shards: DataFrame, tick: int) -> int:
        """Write this tick's run snapshot (idempotent per tick); return the
        total key count as of this tick. Runs hold only fresh keys, so
        total = total(tick-1) + run size, both read from parquet footers /
        the manifest — no Spark job."""
        existing = self.table.entry_for(tick, tag="run")
        if existing is not None:
            return int(existing["metrics"]["total_keys"])
        prev_total = self.total_keys_as_of(tick - 1)
        info = self.table.commit(
            new_shards,
            tick=tick,
            row_count=-1,
            tag="run",
            metrics={"kind": "run"},
        )
        fresh = self._sum_keys_from_snapshot(info.snapshot_id)
        total = prev_total + fresh
        self._stash_total(total)
        return total

    def compact(self, spark: SparkSession, tick: int) -> None:
        """Fold base+runs into a fresh base snapshot (idempotent per tick).
        Probe cost and manifest length reset; run history before the base
        is subsumed. Mirrors the frontier's compaction cadence."""
        if self.table.entry_for(tick, tag="base") is not None:
            return
        state = self._state_df(spark, as_of=tick)
        bloom_bytes = self.bloom_bytes

        def merge_all(key, sdf):
            parts = [decode_shard(b)[0] for b in sdf["data"]]
            keys = (
                np.unique(np.concatenate(parts))
                if parts
                else np.empty(0, dtype=np.uint64)
            )
            bloom = np.zeros(bloom_bytes, dtype=np.uint8)
            if len(keys):
                bloom_add(bloom, keys)
            return pd.DataFrame(
                {
                    "shard_id": [int(key[0])],
                    "data": [encode_shard(keys, bloom)],
                    "n_keys": [len(keys)],
                }
            )

        merged = state.groupBy("shard_id").applyInPandas(merge_all, schema=SHARD_SCHEMA)
        total = self.total_keys_as_of(tick)
        self.table.commit(
            merged,
            tick=tick,
            row_count=-1,
            tag="base",
            metrics={"kind": "base", "total_keys": total},
        )

    def _stash_total(self, total: int) -> None:
        """Record the running total on the just-written manifest entry, so
        later ticks read it without a Spark job."""
        entries = self.table.manifest()
        entries[-1]["metrics"]["total_keys"] = total
        tmp = self.table._manifest_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(entries, f, indent=1, default=str)
        os.replace(tmp, self.table._manifest_path())

    def _sum_keys_from_snapshot(self, snapshot_id: int) -> int:
        import pyarrow.parquet as pq

        total = 0
        for f in glob.glob(
            os.path.join(self.table.snapshot_dir(snapshot_id), "**", "*.parquet"),
            recursive=True,
        ):
            t = pq.read_table(f, columns=["n_keys"])
            total += int(t.column("n_keys").to_pandas().sum() or 0)
        return total

    def total_keys_as_of(self, as_of: int) -> int:
        entries = [e for e in self.table.manifest() if e["tick"] <= as_of]
        for e in reversed(entries):
            if "total_keys" in e.get("metrics", {}):
                return int(e["metrics"]["total_keys"])
        return 0

    def total_keys(self, spark: SparkSession = None) -> int:
        latest = self.table.latest()
        if latest is None:
            return 0
        return self.total_keys_as_of(latest["tick"])
