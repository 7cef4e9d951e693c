"""Snapshot-diff CDC bootstrap (operators/snapshot.py)."""

import pytest
from pyspark.sql import functions as F

from sap_spark.operators.snapshot import snapshot_diff


def test_diff_iud_and_unchanged_dropped(spark):
    old = spark.createDataFrame(
        [("r", "a", "v1"), ("r", "b", "v1"), ("r", "c", "v1"), ("r", "n", None)],
        "repo string, path string, content string",
    )
    new = spark.createDataFrame(
        [("r", "a", "v2"), ("r", "c", "v1"), ("r", "d", "v1"), ("r", "n", None)],
        "repo string, path string, content string",
    )
    got = {
        (r["repo"], r["path"]): (r["op"], r["content"])
        for r in snapshot_diff(old, new, ["repo", "path"]).collect()
    }
    assert got == {
        ("r", "a"): ("U", "v2"),   # changed
        ("r", "b"): ("D", None),   # gone
        ("r", "d"): ("I", "v1"),   # new
        # c unchanged, n unchanged (null == null is null-safe) → dropped
    }


def test_diff_null_transitions_are_updates(spark):
    old = spark.createDataFrame([("k1", None), ("k2", "x")], "k string, v string")
    new = spark.createDataFrame([("k1", "x"), ("k2", None)], "k string, v string")
    got = {
        r["k"]: (r["op"], r["v"])
        for r in snapshot_diff(old, new, ["k"]).collect()
    }
    assert got == {"k1": ("U", "x"), "k2": ("U", None)}


def test_diff_feeds_merge_to_new_state(spark, tmpdir_path):
    """The bootstrap contract: applying the diff through the normal MERGE
    path transforms the old table into the new snapshot exactly."""
    from pyspark.sql import types as T
    from sap_spark.plans.lake import LakeTable

    schema = T.StructType(
        [
            T.StructField("repo", T.StringType(), False),
            T.StructField("path", T.StringType(), False),
            T.StructField("content", T.StringType(), True),
        ]
    )
    old = spark.createDataFrame(
        [("r", f"p{i}", f"v{i}") for i in range(40)],
        "repo string, path string, content string",
    )
    new = spark.createDataFrame(
        [
            ("r", f"p{i}", f"v{i}-new" if i % 3 == 0 else f"v{i}")
            for i in range(5, 45)
        ],
        "repo string, path string, content string",
    )
    table = LakeTable.create(
        spark, f"{tmpdir_path}/t", schema, ["repo", "path"], num_buckets=4
    )
    table.overwrite(old, batch_id="seed")
    diff = snapshot_diff(old, new, ["repo", "path"]).withColumn(
        "event_seq", F.lit(1)
    )
    table.merge_cdc(diff, "diff-1")
    got = {
        (r["repo"], r["path"]): r["content"] for r in table.read().collect()
    }
    want = {(r["repo"], r["path"]): r["content"] for r in new.collect()}
    assert got == want


def test_diff_missing_columns_raise(spark):
    old = spark.createDataFrame([("a",)], "k string")
    new = spark.createDataFrame([("a", 1)], "k string, v int")
    with pytest.raises(ValueError, match="absent"):
        snapshot_diff(old, new, ["k"])
