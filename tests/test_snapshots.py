"""SnapshotTable tests: commit chain, time travel, atomicity, prune."""

import json
import os

import pytest

from cinescrapers_spark.crawl.snapshots import SnapshotTable


def test_commit_chain_and_time_travel(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    df1 = spark.range(0, 10).toDF("v")
    df2 = spark.range(0, 25).toDF("v")
    i0 = t.commit(df1, tick=0, metrics={"a": 1})
    i1 = t.commit(df2, tick=1)
    assert (i0.snapshot_id, i1.snapshot_id) == (0, 1)
    assert i1.parent_id == 0
    # time travel
    assert t.read(spark, snapshot_id=0).count() == 10
    assert t.read(spark).count() == 25
    man = t.manifest()
    assert [e["tick"] for e in man] == [0, 1]
    assert man[0]["metrics"] == {"a": 1}
    assert all(e["lineage"] for e in man)  # per-partition file lineage
    assert man[0]["row_count"] == 10


def test_row_count_passthrough_skips_recount(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    t.commit(spark.range(0, 7).toDF("v"), tick=0, row_count=7)
    assert t.latest()["row_count"] == 7


def test_prune_keeps_manifest(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    for k in range(4):
        t.commit(spark.range(0, k + 1).toDF("v"), tick=k)
    t.prune(keep_last=2)
    assert len(t.manifest()) == 4  # lineage survives pruning
    assert not os.path.exists(t.snapshot_dir(0))
    assert os.path.exists(t.snapshot_dir(3))
    assert t.read(spark).count() == 4


def test_no_tmp_dirs_left_behind(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    t.commit(spark.range(0, 3).toDF("v"), tick=0)
    leftovers = [d for d in os.listdir(str(tmp_path / "tbl")) if d.endswith(".tmp")]
    assert leftovers == []


def test_manifest_is_valid_json_after_many_commits(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    for k in range(3):
        t.commit(spark.range(0, 2).toDF("v"), tick=k)
    with open(os.path.join(str(tmp_path / "tbl"), "manifest.json")) as f:
        assert len(json.load(f)) == 3
