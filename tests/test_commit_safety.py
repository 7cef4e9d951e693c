"""Optimistic-concurrency commit claim (LakeTable._commit).

The VERSION pointer flip is the commit point; the v(N+1) manifest file
is the CLAIM. Before this, two writers racing from the same base
version would both write v(N+1) — the second silently overwriting the
first, orphaning its data files and erasing its exactly-once batch
markers (so a replayed epoch would double-apply). Now exactly one
writer wins the atomic ``os.link`` claim; the loser gets
ConcurrentCommitError, reloads, and retries safely.
"""

import glob
import json
import os

import pytest
from pyspark.sql import types as T

from sap_spark.plans.lake import ConcurrentCommitError, LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("content", T.StringType(), True),
    ]
)


def _make(spark, path):
    return LakeTable.create(
        spark, path, SCHEMA, key_columns=["repo", "path"], num_buckets=4
    )


def _changes(spark, rows):
    return spark.createDataFrame(
        rows, "repo string, path string, content string, op string, event_seq long"
    )


def _state(table):
    return {(r["repo"], r["path"]): r["content"] for r in table.read().collect()}


def test_racing_writers_one_wins_one_fails_loudly(spark, tmpdir_path):
    path = f"{tmpdir_path}/t"
    _make(spark, path)
    h1 = LakeTable(spark, path)
    h2 = LakeTable(spark, path)  # same base version as h1
    assert h1.version == h2.version

    h1.merge_cdc(_changes(spark, [("r", "a", "v1", "I", 1)]), "b1")
    with pytest.raises(ConcurrentCommitError, match="another writer"):
        h2.merge_cdc(_changes(spark, [("r", "b", "v2", "I", 2)]), "b2")

    # the winner's commit is intact: pointer, state, and batch marker
    fresh = LakeTable(spark, path)
    assert fresh.version == h1.version
    assert _state(fresh) == {("r", "a"): "v1"}
    assert "b1" in fresh.committed_batches()
    # no tmp litter from the failed claim
    assert not glob.glob(os.path.join(path, "_meta", "*.tmp-*"))

    # the loser reloads and retries — both commits land
    h2 = LakeTable(spark, path)
    assert h2.merge_cdc(_changes(spark, [("r", "b", "v2", "I", 2)]), "b2")
    assert _state(LakeTable(spark, path)) == {
        ("r", "a"): "v1", ("r", "b"): "v2",
    }


def test_torn_commit_blocks_then_clears(spark, tmpdir_path):
    path = f"{tmpdir_path}/t"
    table = _make(spark, path)
    table.merge_cdc(_changes(spark, [("r", "a", "v1", "I", 1)]), "b1")

    # a writer died after writing v(N+1) but before the pointer flip
    torn = os.path.join(path, "_meta", f"v{table.version + 1:08d}.json")
    with open(torn, "w") as f:
        json.dump({**table.manifest, "version": table.version + 1}, f)

    with pytest.raises(ConcurrentCommitError):
        table.merge_cdc(_changes(spark, [("r", "b", "v2", "I", 2)]), "b2")
    # the torn manifest was never committed: readers are unaffected
    assert _state(LakeTable(spark, path)) == {("r", "a"): "v1"}

    removed = table.clear_torn_commits()
    assert removed == [torn]
    table = LakeTable(spark, path)
    assert table.merge_cdc(_changes(spark, [("r", "b", "v2", "I", 2)]), "b2")
    assert _state(table) == {("r", "a"): "v1", ("r", "b"): "v2"}


def test_clear_torn_commits_never_touches_committed_chain(spark, tmpdir_path):
    path = f"{tmpdir_path}/t"
    table = _make(spark, path)
    table.merge_cdc(_changes(spark, [("r", "a", "v1", "I", 1)]), "b1")
    table.merge_cdc(_changes(spark, [("r", "a", "v2", "U", 2)]), "b2")
    assert table.clear_torn_commits() == []
    assert [h["version"] for h in table.history()] == [2, 1, 0]


def test_pipeline_merge_self_heals_own_torn_commit(spark, tmpdir_path):
    """The streaming restart story: a driver that died between the
    manifest claim and the pointer flip must not wedge its own replayed
    epoch — the pipeline proves OWNERSHIP (the claim carries its own
    writer_id) before clearing and retrying. A claim stamped by anyone
    else, or one on a table whose pointer moved, is a real conflict and
    still propagates."""
    from sap_spark.streaming.pipeline import _merge_self_healing

    path = f"{tmpdir_path}/t"
    table = _make(spark, path)
    table.writer_id = "pipe-1"  # what CdcPipeline.__init__ does
    table.merge_cdc(_changes(spark, [("r", "a", "v1", "I", 1)]), "b1")
    torn = os.path.join(path, "_meta", f"v{table.version + 1:08d}.json")

    # 1. a torn claim from a FOREIGN writer (a maintenance job
    # mid-commit): never cleared, even with the pointer unmoved
    with open(torn, "w") as f:
        json.dump(
            {**table.manifest, "version": table.version + 1,
             "writer_id": "maintenance-7"},
            f,
        )
    with pytest.raises(ConcurrentCommitError):
        _merge_self_healing(
            table, _changes(spark, [("r", "b", "v2", "I", 2)]), "b2"
        )
    os.remove(torn)

    # 2. this pipeline's OWN debris (same writer_id — the id is stable
    # across restarts): cleared and retried
    with open(torn, "w") as f:
        json.dump(
            {**table.manifest, "version": table.version + 1,
             "writer_id": "pipe-1"},
            f,
        )
    ok = _merge_self_healing(
        table, _changes(spark, [("r", "b", "v2", "I", 2)]), "b2"
    )
    assert ok is True
    fresh = LakeTable(spark, path)
    assert fresh.version == 2
    assert "b2" in fresh.committed_batches()
    assert _state(fresh) == {("r", "a"): "v1", ("r", "b"): "v2"}
    # the handle stays usable: the next epoch merges cleanly
    assert _merge_self_healing(
        table, _changes(spark, [("r", "c", "v3", "I", 3)]), "b3"
    )

    # 3. genuine concurrency (pointer moved since this handle loaded)
    # is NOT repaired: never clear another writer's committed claim
    stale = LakeTable(spark, path, version=1)
    stale.writer_id = "pipe-1"
    with pytest.raises(ConcurrentCommitError):
        _merge_self_healing(
            stale, _changes(spark, [("r", "d", "v4", "I", 4)]), "b4"
        )
    assert _state(LakeTable(spark, path)) == {
        ("r", "a"): "v1", ("r", "b"): "v2", ("r", "c"): "v3",
    }
