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
