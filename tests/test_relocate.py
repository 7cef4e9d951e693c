"""Table directories are relocatable: manifest entry paths are re-rooted
onto the opening handle's table root at load time (the data layout under
``data/<uuid>/__bucket=N/`` is fixed), so a restored backup / renamed
directory reads, merges, audits and maintains exactly like the original."""

import os
import shutil

import pyspark.sql.functions as F
from pyspark.sql import types as T

from sap_spark.plans.doctor import check_table, table_fingerprint
from sap_spark.plans.lake import LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("commit", T.StringType(), True),
        T.StructField("v", T.StringType(), True),
    ]
)

FULL = T.StructType(
    list(SCHEMA.fields)
    + [
        T.StructField("op", T.StringType(), True),
        T.StructField("event_seq", T.LongType(), True),
    ]
)


def _build(spark, path, merge_mode="cow"):
    table = LakeTable.create(
        spark, path, SCHEMA, key_columns=["id"], num_buckets=4,
        bloom_columns=["commit"], merge_mode=merge_mode,
    )
    for i in range(2):
        batch = spark.createDataFrame(
            [(j, f"sha{j}", f"v{i}", "I", i * 100 + j) for j in range(20)],
            FULL,
        )
        table.merge_cdc(batch, f"b{i}")
    return table


import pytest


@pytest.mark.parametrize("merge_mode", ["cow", "mor"])
def test_moved_table_reads_merges_and_audits(spark, tmpdir_path, merge_mode):
    src = f"{tmpdir_path}/orig"
    dst = f"{tmpdir_path}/restored"
    table = _build(spark, src, merge_mode)
    before = table_fingerprint(spark, table)

    shutil.move(src, dst)
    moved = LakeTable(spark, dst)
    # read path follows the new root (incl. bloom sidecars + point lookup)
    assert moved.read().count() == 20
    assert moved.read(where="id = 7").collect()[0]["v"] == "v1"
    assert moved.read(where="commit = 'sha3'").count() == 1
    after = table_fingerprint(spark, moved)
    assert after["fingerprint"] == before["fingerprint"]

    # doctor finds every referenced file at the new location
    report = check_table(dst, spark=spark, deep=True)
    assert report["ok"], report["checks"]

    # writes continue: merge + compact + expiry at the new root
    batch = spark.createDataFrame([(99, "sha99", "new", "I", 999)], FULL)
    assert moved.merge_cdc(batch, "b-after-move")
    assert moved.read().count() == 21
    moved.compact(only_dirty=False)
    removed = moved.expire_snapshots(keep_last=1)
    assert removed > 0  # old-version files are found (and reclaimed) too
    assert LakeTable(spark, dst).read().count() == 21


def test_relative_vs_absolute_root_spellings_agree(spark, tmpdir_path):
    path = f"{tmpdir_path}/t"
    table = _build(spark, path)
    rel = os.path.relpath(path)
    # the SAME table opened under a different spelling of its root
    by_rel = LakeTable(spark, rel)
    assert by_rel.read().count() == table.read().count()
    assert (
        table_fingerprint(spark, by_rel)["fingerprint"]
        == table_fingerprint(spark, table)["fingerprint"]
    )
