"""Z-order clustering (plans/clustering.py) + bounded file sizes.

The headline test is the skipping one: a file layout linearly sorted by
``x`` can never skip on a ``y`` predicate (every file spans all of
``y``), while the z-ordered rewrite of the SAME rows bounds both
columns per file, so the manifest min/max machinery that already
exists starts pruning on either dimension. That is the whole point of
``compact(zorder=[...])`` at 100 TB: the long-lived base files become
skippable for the 2-3 columns analysts actually filter on.
"""

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sap_spark.plans.clustering import with_zorder
from sap_spark.plans.lake import LakeTable
from sap_spark.plans.stats import file_may_match

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType(), False),
        T.StructField("x", T.LongType(), True),
        T.StructField("y", T.LongType(), True),
    ]
)


def _grid_df(spark, side=64):
    # x and y are independent: a linear sort on one says nothing about
    # the other — the adversarial shape for 1-D clustering
    return spark.range(side * side).select(
        F.col("id").alias("k"),
        (F.col("id") % side).alias("x"),
        (F.col("id") / side).cast("long").alias("y"),
    )


def _survivors(table, conjuncts):
    entries = [e for es in table.manifest["buckets"].values() for e in es]
    kept = sum(
        1 for e in entries if file_may_match(e.get("stats") or {}, conjuncts, True)
    )
    return kept, len(entries)


def test_zorder_rank_monotone_per_dimension(spark):
    df = spark.createDataFrame([(float(i),) for i in range(100)], "v double")
    rows = with_zorder(df, ["v"], bits=4).orderBy("v").collect()
    zvals = [r["__zval"] for r in rows]
    assert zvals == sorted(zvals), "1-D z-value must preserve the dimension order"
    assert len(set(zvals)) > 8, "quantile ranks must actually spread"


def test_zorder_string_prefix_preserves_lexicographic_order(spark):
    words = ["", "a", "aa", "ab", "b", "ba", "z", "zz", "middle", "mzzzzzzzzz"]
    df = spark.createDataFrame([(w,) for w in words], "s string")
    rows = with_zorder(df, ["s"], bits=4).orderBy("s").collect()
    zvals = [r["__zval"] for r in rows]
    assert zvals == sorted(zvals)


def test_zorder_nulls_cluster_at_the_low_end(spark):
    df = spark.createDataFrame(
        [(None,), (5.0,), (1.0,), (None,), (9.0,)], "v double"
    )
    rows = with_zorder(df, ["v"], bits=4).collect()
    null_z = {r["__zval"] for r in rows if r["v"] is None}
    value_z = {r["__zval"] for r in rows if r["v"] is not None}
    assert max(null_z) <= min(value_z)


def test_zorder_validation(spark):
    df = spark.createDataFrame([(1.0, "s")], "v double, s string")
    with pytest.raises(ValueError, match="at least one"):
        with_zorder(df, [])
    with pytest.raises(ValueError, match="not in dataframe"):
        with_zorder(df, ["nope"])
    with pytest.raises(ValueError, match="fit a long"):
        with_zorder(df, ["v", "s"], bits=32)


def test_max_records_per_file_bounds_file_sizes(spark, tmpdir_path):
    table = LakeTable.create(
        spark, f"{tmpdir_path}/t", SCHEMA, key_columns=["k"],
        num_buckets=1, max_records_per_file=256,
        stats_columns=["k", "x", "y"],
    )
    table.overwrite(_grid_df(spark), batch_id="seed")
    entries = table.manifest["buckets"]["0"]
    assert len(entries) >= 16, "4096 rows / 256 per file"
    for e in entries:
        assert pq.ParquetFile(e["path"]).metadata.num_rows <= 256
    assert table.read().count() == 4096


def test_zorder_compact_skips_where_linear_sort_cannot(spark, tmpdir_path):
    common = dict(
        key_columns=["k"], num_buckets=1, max_records_per_file=256,
        stats_columns=["k", "x", "y"],
    )
    linear = LakeTable.create(
        spark, f"{tmpdir_path}/lin", SCHEMA, sort_columns=["x"], **common
    )
    linear.overwrite(_grid_df(spark), batch_id="seed")
    zordered = LakeTable.create(spark, f"{tmpdir_path}/zo", SCHEMA, **common)
    zordered.overwrite(_grid_df(spark), batch_id="seed")
    zordered.compact(only_dirty=False, zorder=["x", "y"])

    y_band = [("y", ">=", 10), ("y", "<=", 12)]
    lin_kept, lin_total = _survivors(linear, y_band)
    z_kept, z_total = _survivors(zordered, y_band)
    # x-sorted files each span ALL of y: nothing can be skipped
    assert lin_kept == lin_total >= 16
    # z-ordered files bound y too: most of the table is skipped
    assert z_kept <= z_total // 2, (z_kept, z_total)

    # and on x the z-order still skips (less sharply than pure x-sort)
    x_band = [("x", ">=", 0), ("x", "<=", 3)]
    zx_kept, _ = _survivors(zordered, x_band)
    assert zx_kept <= z_total // 2

    # skipping must be invisible in results (law 8 shape)
    for t in (linear, zordered):
        got = t.read(where="y >= 10 AND y <= 12").count()
        assert got == 64 * 3
    # the rewrite is self-describing
    assert zordered.history()[0]["op"]["zorder"] == ["x", "y"]


def test_zorder_compact_rejects_unknown_column(spark, tmpdir_path):
    table = LakeTable.create(
        spark, f"{tmpdir_path}/t", SCHEMA, key_columns=["k"], num_buckets=1
    )
    table.overwrite(_grid_df(spark, side=4), batch_id="seed")
    with pytest.raises(ValueError, match="zorder"):
        table.compact(only_dirty=False, zorder=["nope"])


def test_cli_maintain_zorder(spark, tmpdir_path):
    from sap_spark import cli

    path = f"{tmpdir_path}/t"
    table = LakeTable.create(
        spark, path, SCHEMA, key_columns=["k"], num_buckets=2,
        stats_columns=["k", "x", "y"],
    )
    table.overwrite(_grid_df(spark, side=8), batch_id="seed")

    class Args:
        pass

    args = Args()
    args.table = path
    args.compact = True
    args.zorder = "x,y"
    args.expire_keep = None
    args.expire_grace = 0.0
    args.rebucket = None
    summary = cli.run_maintain(args, spark=spark)
    assert summary["compacted"] is True
    assert summary["rows"] == 64
    assert LakeTable(spark, path).history()[0]["op"]["zorder"] == ["x", "y"]

    st_args = Args()
    st_args.table = path
    st_args.pipeline_id = None
    st_args.count = False
    status = cli.run_status(st_args, spark=spark)
    assert status["file_stats"]["last_layout_op"]["zorder"] == ["x", "y"]


def test_rebucket_with_zorder_single_pass(spark, tmpdir_path):
    table = LakeTable.create(
        spark, f"{tmpdir_path}/t", SCHEMA, key_columns=["k"],
        num_buckets=1, max_records_per_file=256,
        stats_columns=["k", "x", "y"],
    )
    table.overwrite(_grid_df(spark), batch_id="seed")
    v_before = table.version
    table.rebucket(2, zorder=["x", "y"])
    assert table.version == v_before + 1, "reshard + clustering = ONE commit"
    assert table.history()[0]["op"] == {
        "type": "rebucket", "from": 1, "to": 2, "zorder": ["x", "y"],
    }
    # both new buckets' files bound y (skipping works after the reshard)
    kept, total = _survivors(table, [("y", ">=", 10), ("y", "<=", 12)])
    assert kept <= total // 2, (kept, total)
    assert table.read().count() == 4096
    with pytest.raises(ValueError, match="zorder"):
        table.rebucket(4, zorder=["nope"])


def test_zorder_time_typed_columns(spark):
    import datetime as dt

    rows = [
        (dt.datetime(2024, 1, 1) + dt.timedelta(hours=i), dt.date(2024, 1, 1 + i))
        for i in range(20)
    ]
    df = spark.createDataFrame(rows, "ts timestamp, d date")
    out = with_zorder(df, ["ts"], bits=4).orderBy("ts").collect()
    zvals = [r["__zval"] for r in out]
    assert zvals == sorted(zvals)
    ntz = spark.createDataFrame(rows, "ts timestamp_ntz, d date")
    out = with_zorder(ntz, ["ts", "d"], bits=4).collect()
    assert len(out) == 20


def test_zorder_proxy_not_inlined_into_rank_lambda(spark):
    """The string proxy (conv/rpad/hex/substring chain) must ride the
    aggregate's zero slot — evaluated once per row — not be inlined
    into the per-element lambda where it would re-run once per
    boundary (255x per row at bits=8)."""
    df = spark.createDataFrame([(f"s{i}",) for i in range(50)], "s string")
    out = with_zorder(df, ["s"], bits=8)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("substring") == 1, plan


def test_cli_zorder_without_rewrite_is_loud(spark, tmpdir_path):
    from sap_spark import cli

    path = f"{tmpdir_path}/t"
    LakeTable.create(spark, path, SCHEMA, key_columns=["k"], num_buckets=1)

    class Args:
        pass

    args = Args()
    args.table = path
    args.compact = False
    args.zorder = "x,y"
    args.expire_keep = 5
    args.expire_grace = 0.0
    args.rebucket = None
    with pytest.raises(SystemExit, match="--zorder requires"):
        cli.run_maintain(args, spark=spark)


def test_alter_properties_metadata_only_commit(spark, tmpdir_path):
    table = LakeTable.create(
        spark, f"{tmpdir_path}/t", SCHEMA, key_columns=["k"], num_buckets=1
    )
    table.overwrite(_grid_df(spark, side=8), batch_id="seed")
    v = table.version
    files_before = [
        e["path"] for es in table.manifest["buckets"].values() for e in es
    ]
    assert table.alter_properties(
        stats_columns=["k", "x", "y"], sort_columns=["y"],
        max_records_per_file=16,
    ) is True
    # metadata-only: one commit, zero files touched
    assert table.version == v + 1
    files_after = [
        e["path"] for es in table.manifest["buckets"].values() for e in es
    ]
    assert files_after == files_before
    assert table.history()[0]["op"]["type"] == "alter"
    assert table.stats_columns == ["k", "x", "y"]
    assert table.sort_columns == ["y"]
    assert table.max_records_per_file == 16
    # a no-op alter commits nothing
    assert table.alter_properties(sort_columns=["y"]) is False
    assert table.version == v + 1
    # the next full rewrite adopts the new layout: several y-sorted
    # files whose bounds now skip on y
    table.compact(only_dirty=False)
    kept, total = _survivors(table, [("y", ">=", 7), ("y", "<=", 7)])
    assert total >= 4 and kept < total, (kept, total)
    # unknown columns fail loudly
    with pytest.raises(ValueError, match="not in schema"):
        table.alter_properties(stats_columns=["nope"])
    assert table.read().count() == 64
