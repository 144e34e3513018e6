"""Partitioned URL-seen set: bloom pre-filter + exact sorted-hash authority.

Generalizes the reference's seen-checks — ``filepath.exists()`` on a hashed
URL before fetching (``/root/reference/src/cinescrapers/__main__.py:218-220``)
and ``ON CONFLICT(id)`` upsert (``:330-344``) — to 10^10 keys.

Design (SURVEY §4.3):

* identity = ``xxhash64(url_norm)`` (64-bit, JVM-computed);
* shard key = ``pmod(url_hash, P)`` — the SAME hash partitioning is used for
  the shard table and the candidate shuffle, so probe and state colocate
  (one shuffle of the candidates, zero shuffle of the state);
* per shard: a numpy bloom filter (fast negative; never authoritative) in
  front of a SORTED uint64 array probed by binary search — exact membership
  over the 64-bit hashes, FPR=0 on the authoritative path (a bloom- or
  cuckoo-only design would let false positives silently drop URLs, which
  the "URL-seen membership must match the reference" gate forbids);
* probe and insert run inside ``cogroup().applyInPandas`` — Arrow-batched,
  no per-row Python, state in/out as binary blobs;
* shard blobs live in a SnapshotTable → seen-set state is checkpointed and
  resumable per tick like every other table.

At 10^10 URLs / P=4096 shards: ~2.4M hashes/shard = 19 MB exact + ~3 MB
bloom — comfortably an executor-memory object; P scales linearly with the
frontier.
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


class SeenSet:
    """Sharded seen-set backed by a SnapshotTable of binary shard blobs."""

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

    def _shards_df(self, spark: SparkSession) -> DataFrame:
        if self.table.latest() is None:
            return spark.createDataFrame([], SHARD_SCHEMA)
        return self.table.read(spark)

    # -- probe ----------------------------------------------------------------
    def filter_unseen(self, candidates: DataFrame, hash_col: str = "url_hash") -> DataFrame:
        """Return candidate rows whose hash is NOT in the seen set.

        One shuffle: candidates are hash-partitioned by shard_id and
        cogrouped with their (single-row) state shard; inside each group a
        bloom rejects definite-news cheaply, then binary search settles the
        rest exactly.
        """
        spark = candidates.sparkSession
        shards = self._shards_df(spark)
        cand = candidates.withColumn("__shard", self.shard_col(F.col(hash_col)))
        out_schema = cand.schema
        bloom_bytes = self.bloom_bytes
        hname = hash_col

        def probe(key, cdf: pd.DataFrame, sdf: pd.DataFrame) -> pd.DataFrame:
            if len(cdf) == 0:
                return cdf
            if len(sdf) == 0:
                return cdf
            keys, bloom = decode_shard(sdf["data"].iloc[0])
            h = cdf[hname].to_numpy().astype(np.uint64)
            maybe = bloom_maybe(bloom, h) if len(bloom) else np.ones(len(h), bool)
            seen = np.zeros(len(h), dtype=bool)
            if maybe.any() and len(keys):
                idx = np.searchsorted(keys, h[maybe])
                idx = np.clip(idx, 0, len(keys) - 1)
                seen[maybe] = keys[idx] == h[maybe]
            return cdf[~seen]

        unseen = (
            cand.groupBy("__shard")
            .cogroup(shards.groupBy("shard_id"))
            .applyInPandas(probe, schema=out_schema)
        )
        return unseen.drop("__shard")

    # -- insert ---------------------------------------------------------------
    def add(self, new_urls: DataFrame, tick: int, hash_col: str = "url_hash") -> None:
        """Merge new hashes into shards and commit the next snapshot.

        Same colocated cogroup; each shard's sorted array is union-merged
        once per tick (O(shard + batch log batch)).
        """
        spark = new_urls.sparkSession
        shards = self._shards_df(spark)
        add = (
            new_urls.select(F.col(hash_col).alias("h"))
            .withColumn("__shard", self.shard_col(F.col("h")))
        )
        bloom_bytes = self.bloom_bytes

        def merge(key, cdf: pd.DataFrame, sdf: pd.DataFrame) -> pd.DataFrame:
            shard_id = int(key[0])
            if len(sdf):
                keys, bloom = decode_shard(sdf["data"].iloc[0])
            else:
                keys = np.empty(0, dtype=np.uint64)
                bloom = np.zeros(bloom_bytes, dtype=np.uint8)
            if len(cdf):
                h = np.unique(cdf["h"].to_numpy().astype(np.uint64))
                fresh = h[~np.isin(h, keys, assume_unique=False)] if len(keys) else h
                if len(fresh):
                    keys = np.sort(np.concatenate([keys, fresh]))
                    bloom_add(bloom, fresh)
            return pd.DataFrame(
                {
                    "shard_id": [shard_id],
                    "data": [encode_shard(keys, bloom)],
                    "n_keys": [len(keys)],
                }
            )

        merged = (
            add.groupBy("__shard")
            .cogroup(shards.groupBy("shard_id"))
            .applyInPandas(merge, schema=SHARD_SCHEMA)
        )
        # untouched shards carry over via the cogroup (empty add side);
        # single write job; row_count=-1 = "not recounted" (≤P by
        # construction — a read-back count would double the shuffle)
        self.table.commit(merged, tick=tick, row_count=-1)

    # -- fused probe+insert -----------------------------------------------------
    def probe_and_add(self, candidates: DataFrame, tick: int, hash_col: str = "url_hash"):
        """ONE cogroup pass: filter candidates against the shard state AND
        merge the unseen hashes into it. Output is a tagged union —
        one 'shard' row per group plus the unseen candidate rows — split by
        the caller. Halves the candidate shuffle vs probe-then-add and
        drops a barrier from the tick.

        Returns (unseen_df, shards_df, n_new): unseen_df/shards_df are two
        filters over one CACHED cogroup output; call ``commit_shards`` with
        shards_df to persist, then read n_new cheaply from the manifest.
        """
        spark = candidates.sparkSession
        shards = self._shards_df(spark)
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

        def fused(key, cdf: pd.DataFrame, sdf: pd.DataFrame) -> pd.DataFrame:
            shard_id = int(key[0])
            if len(sdf):
                keys, bloom = decode_shard(sdf["data"].iloc[0])
            else:
                keys = np.empty(0, dtype=np.uint64)
                bloom = np.zeros(bloom_bytes, dtype=np.uint8)
            if len(cdf):
                cdf = cdf.drop(columns=["__shard"])
                h = cdf[hname].to_numpy().astype(np.uint64)
                maybe = bloom_maybe(bloom, h) if len(bloom) else np.ones(len(h), bool)
                seen = np.zeros(len(h), dtype=bool)
                if maybe.any() and len(keys):
                    idx = np.searchsorted(keys, h[maybe])
                    idx = np.clip(idx, 0, len(keys) - 1)
                    seen[maybe] = keys[idx] == h[maybe]
                fresh_rows = cdf[~seen]
                fresh = np.unique(h[~seen])
                if len(fresh):
                    keys = np.sort(np.concatenate([keys, fresh]))
                    bloom_add(bloom, fresh)
            else:
                fresh_rows = cdf.iloc[0:0].drop(columns=["__shard"], errors="ignore")
            shard_row = pd.DataFrame(
                {
                    "__kind": ["shard"],
                    "shard_id": [shard_id],
                    "data": [encode_shard(keys, bloom)],
                    "n_keys": [len(keys)],
                    **{c: [None] for c in cand_cols},
                }
            )
            if len(fresh_rows):
                url_rows = fresh_rows.copy()
                url_rows["__kind"] = "url"
                url_rows["shard_id"] = None
                url_rows["data"] = None
                url_rows["n_keys"] = None
                return pd.concat([shard_row, url_rows], ignore_index=True)[
                    ["__kind", "shard_id", "data", "n_keys"] + cand_cols
                ]
            return shard_row[["__kind", "shard_id", "data", "n_keys"] + cand_cols]

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
        """Write the shard snapshot; return the total key count (summed
        driver-side from the written parquet footers — no Spark job)."""
        info = self.table.commit(new_shards, tick=tick, row_count=-1)
        total = self._sum_keys_from_snapshot(info.snapshot_id)
        # stash the running total in the manifest for cheap n_new deltas
        entries = self.table.manifest()
        entries[-1]["metrics"]["total_keys"] = total
        tmp = self.table._manifest_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(entries, f, indent=1, default=str)
        os.replace(tmp, self.table._manifest_path())
        return total

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

    def total_keys(self, spark: SparkSession) -> int:
        latest = self.table.latest()
        if latest is None:
            return 0
        if "total_keys" in latest.get("metrics", {}):
            return int(latest["metrics"]["total_keys"])
        return self._shards_df(spark).agg(F.sum("n_keys")).first()[0] or 0
