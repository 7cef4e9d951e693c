"""Single-step commit point + optimistic concurrency (LakeTable._commit).

The atomic ``os.link`` of the v(N+1) manifest IS the commit: data files
are complete before it, so a writer either committed (its manifest
exists) or left nothing — no claim-then-flip window, hence no torn
state to detect, no repair op, and no ownership heuristic that could
misfire and delete a slow live writer's claim. The same link is the
concurrency CAS: exactly one writer per version; the loser reloads and
retries, with batch markers making a retry of an already-won commit a
no-op.
"""

import glob
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


def test_crash_after_link_is_simply_committed(spark, tmpdir_path):
    """The restart story that motivates the single-step design: a driver
    that died right after the manifest link (e.g. before refreshing the
    advisory VERSION cache) has COMMITTED — a fresh handle resolves the
    highest manifest, not the stale cache, and the replayed epoch
    no-ops on its batch marker instead of wedging or double-applying."""
    path = f"{tmpdir_path}/t"
    table = _make(spark, path)
    table.merge_cdc(_changes(spark, [("r", "a", "v1", "I", 1)]), "b1")
    table.merge_cdc(_changes(spark, [("r", "b", "v2", "I", 2)]), "b2")

    # simulate the crash window: the advisory cache never got refreshed
    with open(os.path.join(path, "_meta", "VERSION"), "w") as f:
        f.write("1")

    fresh = LakeTable(spark, path)
    assert fresh.version == 2, "highest manifest wins, not the stale cache"
    assert _state(fresh) == {("r", "a"): "v1", ("r", "b"): "v2"}
    # the replayed epoch is the normal exactly-once no-op
    assert fresh.merge_cdc(_changes(spark, [("r", "b", "v2", "I", 2)]), "b2") is False
    # and the next commit repairs the cache as a side effect
    fresh.merge_cdc(_changes(spark, [("r", "c", "v3", "I", 3)]), "b3")
    with open(os.path.join(path, "_meta", "VERSION")) as f:
        assert int(f.read()) == 3


def test_stale_handle_conflict_then_reload_retry(spark, tmpdir_path):
    """A handle pinned at an old version that tries to write reports the
    conflict; reload-and-retry is the documented recovery."""
    path = f"{tmpdir_path}/t"
    table = _make(spark, path)
    table.merge_cdc(_changes(spark, [("r", "a", "v1", "I", 1)]), "b1")
    table.merge_cdc(_changes(spark, [("r", "a", "v2", "U", 2)]), "b2")

    stale = LakeTable(spark, path, version=1)
    with pytest.raises(ConcurrentCommitError):
        stale.merge_cdc(_changes(spark, [("r", "d", "v4", "I", 4)]), "b4")
    # nothing was disturbed by the failed attempt
    assert _state(LakeTable(spark, path)) == {("r", "a"): "v2"}
    retry = LakeTable(spark, path)
    assert retry.merge_cdc(_changes(spark, [("r", "d", "v4", "I", 4)]), "b4")
    assert _state(LakeTable(spark, path)) == {
        ("r", "a"): "v2", ("r", "d"): "v4",
    }


def test_overwrite_replayed_batch_id_is_noop(spark, tmpdir_path):
    """overwrite shares merge_cdc's exactly-once contract: a restarted
    backfill re-running an already-committed epoch must not burn a
    version or re-spill the table."""
    table = _make(spark, f"{tmpdir_path}/t")
    df = spark.createDataFrame(
        [("r1", "p1", "body")], "repo string, path string, content string"
    )
    table.overwrite(df, batch_id="seed")
    v1 = table.version
    files1 = sorted(e["path"] for es in table.manifest["buckets"].values() for e in es)
    table.overwrite(df, batch_id="seed")  # replay: no-op
    assert table.version == v1
    files2 = sorted(e["path"] for es in table.manifest["buckets"].values() for e in es)
    assert files1 == files2
    # a NEW batch_id still overwrites
    table.overwrite(df, batch_id="seed2")
    assert table.version == v1 + 1
