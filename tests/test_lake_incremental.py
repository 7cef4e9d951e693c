"""Dirty-only compaction and row-level change feed (plans/lake.py)."""

import glob

import pyspark.sql.functions as F
from pyspark.sql import types as T

from sap_spark.config import EngineConfig
from sap_spark.plans.lake import LakeTable
from sap_spark.streaming.pipeline import ingest_batch

SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("content", T.StringType(), True),
    ]
)
CFG = EngineConfig(payload_columns=("content",), num_buckets=8).validate()


def _seed(spark, table, n=200):
    rows = spark.createDataFrame(
        [(f"r{i}", f"p{i}", f"c{i}") for i in range(n)],
        "repo string, path string, content string",
    )
    table.overwrite(rows, batch_id="seed")


def _chg(spark, rows):
    return spark.createDataFrame(
        rows, "repo string, path string, content string, op string, event_seq long"
    )


def test_compact_rewrites_only_dirty_buckets(spark, tmpdir_path):
    table = LakeTable.create(
        spark, f"{tmpdir_path}/t", SCHEMA, ["repo", "path"], 8, merge_mode="mor"
    )
    _seed(spark, table)
    ingest_batch(_chg(spark, [("r1", "p1", "new", "U", 999)]), table, CFG, "b1")
    table = LakeTable(spark, table.path)
    files_before = {
        b: [e["path"] for e in es] for b, es in table.manifest["buckets"].items()
    }
    dirty = table.compact()
    assert len(dirty) == 1  # only the delta-bearing bucket rewritten
    after = LakeTable(spark, table.path)
    for b, paths in files_before.items():
        entries = after.manifest["buckets"][b]
        if int(b) in dirty:
            assert [e["path"] for e in entries] != paths
            assert all(e.get("kind") != "delta" for e in entries)
        else:
            assert [e["path"] for e in entries] == paths  # carried by reference
    rows = {(r["repo"], r["path"]): r["content"] for r in after.read().collect()}
    assert rows[("r1", "p1")] == "new" and len(rows) == 200


def test_compact_purges_tombstones_and_noops_when_clean(spark, tmpdir_path):
    table = LakeTable.create(spark, f"{tmpdir_path}/t2", SCHEMA, ["repo", "path"], 8)
    _seed(spark, table)
    ingest_batch(_chg(spark, [("r2", "p2", None, "D", 999)]), table, CFG, "b1")
    table = LakeTable(spark, table.path)
    before = table.read().orderBy("repo", "path").collect()
    dirty = table.compact()
    assert len(dirty) == 1  # only the tombstone's bucket
    assert table.read().orderBy("repo", "path").collect() == before
    # tombstone physically gone
    internal = table.read_internal(buckets=dirty)
    assert internal.where(F.coalesce(F.col("_deleted"), F.lit(False))).count() == 0
    # clean table → compaction is a version-preserving no-op
    v = table.version
    assert table.compact() == []
    assert table.version == v


def test_changes_between_versions(spark, tmpdir_path):
    table = LakeTable.create(spark, f"{tmpdir_path}/t3", SCHEMA, ["repo", "path"], 8)
    _seed(spark, table, n=100)
    v0 = table.version
    ingest_batch(
        _chg(
            spark,
            [
                ("r1", "p1", "v2", "U", 1001),
                ("r2", "p2", None, "D", 1002),
                ("rX", "pX", "brand-new", "I", 1003),
            ],
        ),
        table, CFG, "b1",
    )
    ingest_batch(_chg(spark, [("r1", "p1", "v3", "U", 2001)]), table, CFG, "b2")
    table = LakeTable(spark, table.path)

    feed = {
        (r["repo"], r["path"]): (r["op"], r["content"])
        for r in table.changes_between(v0).collect()
    }
    assert feed == {
        ("r1", "p1"): ("U", "v3"),        # two updates collapse to the net one
        ("r2", "p2"): ("D", None),
        ("rX", "pX"): ("I", "brand-new"),
    }
    # intermediate span: only the second epoch's net effect
    mid = {
        (r["repo"], r["path"]): (r["op"], r["content"])
        for r in table.changes_between(table.version - 1).collect()
    }
    assert mid == {("r1", "p1"): ("U", "v3")}
    # applying the feed to the old image reproduces the new image
    from sap_spark.operators.snapshot import snapshot_diff  # noqa: F401

    old = LakeTable(spark, table.path, version=v0).read()
    replay = LakeTable.create(
        spark, f"{tmpdir_path}/replay", SCHEMA, ["repo", "path"], 8
    )
    replay.overwrite(old, batch_id="seed")
    replay.merge_cdc(
        table.changes_between(v0).withColumn("event_seq", F.lit(1)), "feed"
    )
    got = {
        (r["repo"], r["path"]): r["content"] for r in replay.read().collect()
    }
    want = {
        (r["repo"], r["path"]): r["content"] for r in table.read().collect()
    }
    assert got == want


def _mor_with_history(spark, path):
    """MOR table + a messy multi-epoch history: inserts, updates,
    deletes, out-of-order/stale events, re-insert after delete."""
    table = LakeTable.create(
        spark, path, SCHEMA, ["repo", "path"], 8, merge_mode="mor"
    )
    _seed(spark, table, n=60)
    versions = [table.version]
    epochs = [
        [("r1", "p1", "e1", "U", 1001), ("rA", "pA", "new-a", "I", 1002)],
        [("r2", "p2", None, "D", 2001), ("r1", "p1", "e2", "U", 2002)],
        # stale + out-of-order: seq 1500 must lose to r1/p1's 2002
        [("r1", "p1", "stale", "U", 1500), ("rB", "pB", "new-b", "I", 2003)],
        # delete then re-insert in later epoch
        [("rA", "pA", None, "D", 3001)],
        [("rA", "pA", "back", "I", 4001), ("r3", "p3", "e3", "U", 4002)],
    ]
    for i, rows in enumerate(epochs):
        ingest_batch(_chg(spark, rows), table, CFG, f"e{i}")
        versions.append(table.version)
    return LakeTable(spark, table.path), versions


def test_incremental_changes_match_snapshot_diff(spark, tmpdir_path):
    """The MOR fast path (added-delta-files-only) must be row-identical
    to the full snapshot diff over EVERY version pair of a history with
    stale events, deletes and re-inserts."""
    table, versions = _mor_with_history(spark, f"{tmpdir_path}/m1")
    for i, v_from in enumerate(versions):
        for v_to in versions[i + 1 :]:
            fast = sorted(
                map(tuple, table.changes_between(v_from, v_to, incremental=True).collect())
            )
            slow = sorted(
                map(tuple, table.changes_between(v_from, v_to, incremental=False).collect())
            )
            assert fast == slow, (v_from, v_to)
    # auto picks the fast path silently and stays correct
    auto = sorted(map(tuple, table.changes_between(versions[0]).collect()))
    slow = sorted(
        map(tuple, table.changes_between(versions[0], incremental=False).collect())
    )
    assert auto == slow


def test_incremental_stale_event_shielded_by_tombstone(spark, tmpdir_path):
    """A v1 tombstone must shield against a stale (lower-seq) event in
    the range: the fast path folds old tombstones INTO the v2 image."""
    table = LakeTable.create(
        spark, f"{tmpdir_path}/m2", SCHEMA, ["repo", "path"], 8, merge_mode="mor"
    )
    _seed(spark, table, n=4)
    ingest_batch(_chg(spark, [("r1", "p1", None, "D", 100)]), table, CFG, "e0")
    v1 = table.version
    ingest_batch(_chg(spark, [("r1", "p1", "zombie", "U", 50)]), table, CFG, "e1")
    table = LakeTable(spark, table.path)
    assert table.changes_between(v1, incremental=True).count() == 0
    assert table.changes_between(v1, incremental=False).count() == 0


def test_incremental_raises_on_rewrite_range(spark, tmpdir_path):
    """COW merges and compactions rewrite file lists; incremental=True
    must refuse loudly, auto must fall back and stay correct."""
    import pytest

    cow = LakeTable.create(
        spark, f"{tmpdir_path}/c1", SCHEMA, ["repo", "path"], 8
    )
    _seed(spark, cow, n=20)
    v0 = cow.version
    ingest_batch(_chg(spark, [("r1", "p1", "x", "U", 10)]), cow, CFG, "b1")
    cow = LakeTable(spark, cow.path)
    with pytest.raises(ValueError, match="pure delta appends"):
        cow.changes_between(v0, incremental=True)
    feed = {
        (r["repo"], r["path"]): (r["op"], r["content"])
        for r in cow.changes_between(v0).collect()
    }
    assert feed == {("r1", "p1"): ("U", "x")}

    # MOR + compact inside the range: same refusal, same fallback
    mor, versions = _mor_with_history(spark, f"{tmpdir_path}/m3")
    mor.compact()
    mor = LakeTable(spark, mor.path)
    with pytest.raises(ValueError, match="pure delta appends"):
        mor.changes_between(versions[0], incremental=True)
    fast_span = mor.changes_between(versions[0])  # auto: falls back
    slow_span = mor.changes_between(versions[0], incremental=False)
    assert sorted(map(tuple, fast_span.collect())) == sorted(
        map(tuple, slow_span.collect())
    )


def test_incremental_reads_added_files_plus_old_buckets_only(spark, tmpdir_path):
    """Plan evidence: the fast path's scan set is exactly (added delta
    files) ∪ (old entries of changed buckets) — the new image is never
    re-read in full."""
    table, versions = _mor_with_history(spark, f"{tmpdir_path}/m4")
    v_from, v_to = versions[-2], versions[-1]
    old_t = LakeTable(spark, table.path, version=v_from)
    new_t = LakeTable(spark, table.path, version=v_to)
    changed = {
        b
        for b in set(old_t.manifest["buckets"]) | set(new_t.manifest["buckets"])
        if old_t.manifest["buckets"].get(b) != new_t.manifest["buckets"].get(b)
    }
    allowed = {
        e["path"]
        for b in changed
        for e in new_t.manifest["buckets"].get(b, [])
    }
    df = table.changes_between(v_from, v_to, incremental=True)
    opened = {f.removeprefix("file://") for f in df.inputFiles()}
    assert opened and opened <= allowed
    # inputFiles() is a SET, so "old files scanned once here vs twice in
    # the snapshot path" doesn't show there; what does show is the row-
    # pruning mechanism — the old image must sit under a semi join on
    # the added files' keys before any payload moves
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan


def test_incremental_true_on_idle_range_returns_empty(spark, tmpdir_path):
    """An idle or schema-only range is trivially pure-append: pinned
    incremental=True must yield the empty feed, not a rewrite error."""
    table = LakeTable.create(
        spark, f"{tmpdir_path}/idle", SCHEMA, ["repo", "path"], 8,
        merge_mode="mor",
    )
    _seed(spark, table, n=4)
    v = table.version
    assert table.changes_between(v, v, incremental=True).count() == 0
