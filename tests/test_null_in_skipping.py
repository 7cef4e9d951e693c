"""IS NULL / IS NOT NULL / IN pruning (plans/stats.py extensions).

Null-count skipping is the Iceberg null_value_counts analog: an
all-null file can satisfy NO value predicate (3VL), and a zero-null
file can never satisfy IS NULL. IN-lists prune through both the bounds
(keep iff any member may fit) and the blooms (drop iff every member is
a definite miss). All three keep the identity law: pruning must be
invisible in results.
"""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sap_spark.plans.lake import LakeTable
from sap_spark.plans.stats import (
    bloom_may_match,
    entry_may_match,
    file_may_match,
    nulls_may_match,
    parse_conjuncts,
)

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType(), False),
        T.StructField("x", T.LongType(), True),
        T.StructField("s", T.StringType(), True),
    ]
)


def _survivors(table, conjuncts):
    entries = [e for es in table.manifest["buckets"].values() for e in es]
    kept = sum(1 for e in entries if entry_may_match(e, conjuncts, True))
    return kept, len(entries)


def test_parse_conjuncts_new_shapes(spark):
    got = parse_conjuncts(
        spark,
        "x IS NULL AND s IS NOT NULL AND k IN (1, 2, NULL) "
        "AND s IN ('a', 'b') AND x > 5",
    )
    assert ("x", "isnull", None) in got
    assert ("s", "isnotnull", None) in got
    assert ("k", "in", (1, 2)) in got  # NULL member dropped: never satisfies
    assert ("s", "in", ("a", "b")) in got
    assert ("x", ">", 5) in got
    # NOT (x IS NULL) is an un-carried shape: siblings still prune
    got = parse_conjuncts(spark, "NOT (x IS NULL) AND k = 3")
    assert got == [("k", "=", 3)]
    # a non-literal IN member poisons only that conjunct
    got = parse_conjuncts(spark, "k IN (1, k + 1) AND s = 'q'")
    assert got == [("s", "=", "q")]


def test_nulls_and_in_unit_evaluation():
    nulls = {"rows": 100, "counts": {"x": 100, "s": 0}}
    assert not nulls_may_match(nulls, [("x", "isnotnull", None)])
    assert not nulls_may_match(nulls, [("x", "=", 5)])  # all-null: 3VL
    assert not nulls_may_match(nulls, [("x", "in", (1, 2))])
    assert not nulls_may_match(nulls, [("s", "isnull", None)])
    assert nulls_may_match(nulls, [("s", "isnotnull", None)])
    assert nulls_may_match(nulls, [("y", "isnull", None)])  # unknown: keep
    # bounds: IN keeps iff any member may fit
    stats = {"x": [10, 20]}
    assert file_may_match(stats, [("x", "in", (1, 15))])
    assert not file_may_match(stats, [("x", "in", (1, 2, 30))])
    assert file_may_match(stats, [("x", "in", (1, "weird"))])  # undecidable


def test_end_to_end_null_and_in_skipping(spark, tmpdir_path):
    table = LakeTable.create(
        spark, f"{tmpdir_path}/t", SCHEMA, key_columns=["k"],
        num_buckets=1, max_records_per_file=64,
        stats_columns=["k", "x", "s"], sort_columns=["x"],
        bloom_columns=["s"],
    )
    # first half: x present, s = sha-ish strings; second half: both null
    df = spark.range(512).select(
        F.col("id").alias("k"),
        F.when(F.col("id") < 256, F.col("id")).alias("x"),
        F.when(F.col("id") < 256, F.sha2(F.col("id").cast("string"), 256)).alias("s"),
    )
    table.overwrite(df, batch_id="seed")
    _, total = _survivors(table, [])
    assert total >= 8

    # IS NOT NULL drops the all-null files; IS NULL drops the value files
    kept_nn, _ = _survivors(table, [("x", "isnotnull", None)])
    kept_n, _ = _survivors(table, [("x", "isnull", None)])
    assert kept_nn < total and kept_n < total
    assert kept_nn + kept_n <= total + 1  # halves barely overlap

    # IN over the sorted x bounds keeps only the overlapping files
    kept_in, _ = _survivors(table, [("x", "in", (3, 200))])
    assert kept_in <= max(2, total // 3)

    # IN through the bloom: present member keeps, all-absent drops
    import hashlib

    present = hashlib.sha256(b"7").hexdigest()
    absent1 = hashlib.sha256(b"nope1").hexdigest()
    absent2 = hashlib.sha256(b"nope2").hexdigest()
    kept_b, _ = _survivors(table, [("s", "in", (absent1, absent2))])
    kept_p, _ = _survivors(table, [("s", "in", (present, absent1))])
    # all-null files carry no bloom for s (no values) and ARE dropped by
    # the null layer riding the same conjunct; value files bloom-drop
    assert kept_b == 0
    assert kept_p >= 1

    # identity law across every new predicate shape
    for w in (
        "x IS NULL",
        "x IS NOT NULL",
        "x IN (3, 200)",
        f"s IN ('{present}', '{absent1}')",
        f"s IN ('{absent1}', '{absent2}')",
        "x IS NOT NULL AND x IN (1, 2, 3)",
        "k IN (5, 505)",
    ):
        got = sorted(map(tuple, table.read(where=w).collect()))
        expect = sorted(map(tuple, table.read().where(w).collect()))
        assert got == expect, w


def test_mor_null_conjuncts_never_prune_fold_inputs(spark, tmpdir_path):
    """IS NULL on a non-key column must not drop a delta-bearing
    bucket's files: key k's x changed NULL -> 7 in a delta; pruning the
    delta on `x IS NULL` would resurrect the null image."""
    table = LakeTable.create(
        spark, f"{tmpdir_path}/t", SCHEMA, key_columns=["k"],
        num_buckets=1, merge_mode="mor", stats_columns=["k", "x"],
    )
    table.overwrite(
        spark.range(20).select(
            F.col("id").alias("k"),
            F.lit(None).cast("long").alias("x"),
            F.lit("v0").alias("s"),
        ),
        batch_id="seed",
    )
    changes = spark.createDataFrame(
        [(7, 7, "v1", "U", 10)],
        "k long, x long, s string, op string, event_seq long",
    )
    table.merge_cdc(changes, "b2")
    got = {r["k"]: r["x"] for r in table.read(where="x IS NULL").collect()}
    assert 7 not in got and len(got) == 19


def test_key_membership_literals_unit():
    from sap_spark.plans.stats import key_membership_literals as kml

    assert kml([("k", "=", 5)], ["k"]) == [{"k": 5}]
    assert kml([("k", "in", (1, 2))], ["k"]) == [{"k": 1}, {"k": 2}]
    assert kml([("a", "in", (1, 2)), ("b", "=", "x")], ["a", "b"]) == [
        {"a": 1, "b": "x"}, {"a": 2, "b": "x"},
    ]
    # intersecting pins narrow; contradictions yield None (honest empty
    # comes from the post-filter over all buckets)
    assert kml([("k", "in", (1, 2, 3)), ("k", "in", (2, 9))], ["k"]) == [{"k": 2}]
    assert kml([("k", "=", 1), ("k", "=", 2)], ["k"]) is None
    # unpinned key / range-only pin / oversized product: no pruning
    assert kml([("a", "=", 1)], ["a", "b"]) is None
    assert kml([("k", ">", 5)], ["k"]) is None
    assert kml([("k", "in", tuple(range(100)))], ["k"]) is None


def test_point_in_set_lookup_prunes_buckets(spark, tmpdir_path):
    """`k IN (...)` over the key prunes the read to the union of the
    member buckets — the 'fetch these N keys' shape at 10^10 rows."""
    table = LakeTable.create(
        spark, f"{tmpdir_path}/t", SCHEMA, key_columns=["k"], num_buckets=32
    )
    table.overwrite(
        spark.range(2000).select(
            F.col("id").alias("k"),
            F.col("id").alias("x"),
            F.lit("v").alias("s"),
        ),
        batch_id="seed",
    )
    combos = [{"k": 5}, {"k": 505}, {"k": 1999}]
    expect_buckets = table._buckets_for_key_combos(combos)
    assert expect_buckets and len(expect_buckets) <= 3

    got = table.read(where="k IN (5, 505, 1999)")
    assert sorted(r["k"] for r in got.collect()) == [5, 505, 1999]
    # the plan's scan reads only the pruned buckets' files
    files = {f.removeprefix("file://") for f in got.inputFiles()}
    allowed = {
        e["path"]
        for b in expect_buckets
        for e in table.manifest["buckets"].get(str(b), [])
    }
    assert files and files <= allowed
