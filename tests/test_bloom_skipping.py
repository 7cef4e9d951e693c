"""Per-file bloom skipping (plans/stats.py bloom layer).

Min/max bounds can't skip on a high-cardinality UNCLUSTERED column —
every file spans the whole domain. The per-file bloom closes exactly
that gap for equality predicates: the north-rule table's `commit` sha
(not a key, not sorted) is the canonical "needle in 10^6 files" lookup.
"""

import hashlib

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sap_spark.plans.lake import LakeTable
from sap_spark.plans.stats import (
    _bloom_hashes,
    bloom_may_match,
    collect_parquet_bloom,
    entry_may_match,
)

SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("commit", T.StringType(), True),
        T.StructField("content", T.StringType(), True),
    ]
)


def _sha(i: int) -> str:
    return hashlib.sha256(str(i).encode()).hexdigest()


def _rows_df(spark, n=2000):
    # commit shas are uniformly scattered: min/max bounds are useless
    return spark.range(n).select(
        F.concat(F.lit("r"), F.col("id") % 5).alias("repo"),
        F.concat(F.lit("p"), F.col("id")).alias("path"),
        F.sha2(F.col("id").cast("string"), 256).alias("commit"),
        F.concat(F.lit("body-"), F.col("id")).alias("content"),
    )


def _survivors(table, conjuncts):
    entries = [e for es in table.manifest["buckets"].values() for e in es]
    kept = sum(1 for e in entries if entry_may_match(e, conjuncts, True))
    return kept, len(entries)


def _make(spark, path, **kw):
    defaults = dict(
        key_columns=["repo", "path"], num_buckets=2,
        max_records_per_file=250, bloom_columns=["commit"],
    )
    defaults.update(kw)
    return LakeTable.create(spark, path, SCHEMA, **defaults)


def test_bloom_unit_contains_and_excludes(spark, tmpdir_path):
    p = f"{tmpdir_path}/f.parquet"
    spark.createDataFrame(
        [(_sha(i),) for i in range(500)], "commit string"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmpdir_path}/d")
    import glob

    f = glob.glob(f"{tmpdir_path}/d/*.parquet")[0]
    blooms = collect_parquet_bloom(f, ["commit", "nope"])
    assert set(blooms) == {"commit"}
    for i in (0, 250, 499):  # every present value must hit
        assert bloom_may_match(blooms, [("commit", "=", _sha(i))])
    misses = sum(
        not bloom_may_match(blooms, [("commit", "=", _sha(10_000 + i))])
        for i in range(200)
    )
    assert misses >= 190, f"false-positive rate too high: {200 - misses}/200"
    # non-equality ops and unbloomable literals keep the file
    assert bloom_may_match(blooms, [("commit", ">=", "zzz")])
    assert bloom_may_match(blooms, [("commit", "=", 3.14)])
    assert _bloom_hashes(True) is None and _bloom_hashes(None) is None


def test_point_lookup_on_unclustered_column_skips_files(spark, tmpdir_path):
    table = _make(spark, f"{tmpdir_path}/t")
    table.overwrite(_rows_df(spark), batch_id="seed")
    _, total = _survivors(table, [])
    assert total >= 8, "need several files for skipping to mean anything"

    needle = _sha(1234)  # present
    kept, _ = _survivors(table, [("commit", "=", needle)])
    assert kept <= max(2, total // 4), (kept, total)
    got = table.read(where=f"commit = '{needle}'").collect()
    assert [(r["repo"], r["path"]) for r in got] == [("r4", "p1234")]

    absent = _sha(999_999)
    got = table.read(where=f"commit = '{absent}'").count()
    assert got == 0
    # identity law: skipping is invisible in results
    for needle2 in (needle, absent):
        w = f"commit = '{needle2}'"
        assert sorted(map(tuple, table.read(where=w).collect())) == sorted(
            map(tuple, table.read().where(w).collect())
        )


def test_bloom_never_prunes_mor_fold_inputs(spark, tmpdir_path):
    """A non-key equality must not drop a delta-bearing bucket's files:
    key k's commit changed c_old -> c_new in a delta; pruning the delta
    file on `commit = c_old` would resurrect the old image."""
    table = _make(spark, f"{tmpdir_path}/t", merge_mode="mor")
    table.overwrite(_rows_df(spark, n=100), batch_id="seed")
    changes = spark.createDataFrame(
        [("r4", "p14", "NEWSHA", "x", "U", 10)],
        "repo string, path string, commit string, content string, "
        "op string, event_seq long",
    )
    table.merge_cdc(changes, "b2")
    old = _sha(14)
    # the old sha matches nothing post-fold, and the fold must have seen
    # the delta file even though its bloom lacks the old sha
    assert table.read(where=f"commit = '{old}'").count() == 0
    assert (
        table.read(where="commit = 'NEWSHA'").select("path").first()["path"]
        == "p14"
    )


def test_bloom_alter_and_status(spark, tmpdir_path):
    from sap_spark import cli

    path = f"{tmpdir_path}/t"
    table = _make(spark, path, bloom_columns=None)
    table.overwrite(_rows_df(spark, n=100), batch_id="seed")
    entries = [e for es in table.manifest["buckets"].values() for e in es]
    assert not any(e.get("bloom") or e.get("bloom_ref") for e in entries)
    assert table.alter_properties(bloom_columns=["commit"]) is True
    table.compact(only_dirty=False)
    entries = [e for es in table.manifest["buckets"].values() for e in es]
    assert all("commit" in (e.get("bloom_ref") or []) for e in entries)

    class Args:
        pass

    args = Args()
    args.table = path
    args.pipeline_id = None
    args.count = False
    assert cli.run_status(args, spark=spark)["file_stats"]["bloom_columns"] == [
        "commit"
    ]
    with pytest.raises(ValueError, match="bloom_columns"):
        table.alter_properties(bloom_columns=["nope"])
    with pytest.raises(ValueError, match="bloom_columns"):
        LakeTable.create(
            spark, f"{tmpdir_path}/bad", SCHEMA,
            key_columns=["repo", "path"], bloom_columns=["nope"],
        )


def test_bloom_cross_type_literal_never_prunes(spark, tmpdir_path):
    """WHERE y = '7' on a bigint column carries a str literal in the
    unresolved parse tree; Spark's analyzer casts and matches, so the
    bloom must KEEP on the type mismatch (identity law), exactly like
    the bounds layer's _coerce does."""
    schema = T.StructType(
        [
            T.StructField("k", T.LongType(), False),
            T.StructField("y", T.LongType(), True),
        ]
    )
    table = LakeTable.create(
        spark, f"{tmpdir_path}/t", schema, key_columns=["k"],
        num_buckets=1, max_records_per_file=64, bloom_columns=["y"],
        stats_columns=[],
    )
    table.overwrite(
        spark.range(256).select(
            F.col("id").alias("k"), (F.col("id") * 3).alias("y")
        ),
        batch_id="seed",
    )
    for w in ("y = '21'", "y = 21"):
        got = sorted(r["k"] for r in table.read(where=w).collect())
        expect = sorted(r["k"] for r in table.read().where(w).collect())
        assert got == expect == [7], w
    # int-typed lookups still skip: most files lack the needle
    kept, total = _survivors(table, [("y", "=", 21)])
    assert total >= 4 and kept <= max(1, total // 4), (kept, total)
    # a string literal against the int bloom keeps every file
    kept_s, _ = _survivors(table, [("y", "=", "21")])
    assert kept_s == total


def test_cli_ingest_layout_flags(spark, tmpdir_path):
    """The ingest surface exposes the layout knobs at creation and
    applies explicit flags to a pre-existing table as an alter."""
    import json

    from sap_spark.cli import main
    from sap_spark.sources.datagen import gen_change_events, write_change_log

    log_dir = f"{tmpdir_path}/log"
    events = gen_change_events(spark, n_events=300, n_keys=60)
    write_change_log(events, log_dir)
    table_dir = f"{tmpdir_path}/t"

    main([
        "ingest", "--log", log_dir, "--table", table_dir,
        "--checkpoint", f"{tmpdir_path}/ckpt", "--buckets", "4",
        "--bloom-columns", "commit", "--max-records-per-file", "500",
    ])
    table = LakeTable(spark, table_dir)
    assert table.bloom_columns == ["commit"]
    assert table.max_records_per_file == 500
    entries = [e for es in table.manifest["buckets"].values() for e in es]
    assert any("commit" in (e.get("bloom_ref") or []) for e in entries)

    # explicit flags on re-ingest of an EXISTING table apply as an alter
    main([
        "ingest", "--log", log_dir, "--table", table_dir,
        "--checkpoint", f"{tmpdir_path}/ckpt2",
        "--bloom-columns", "commit,lang",
    ])
    assert LakeTable(spark, table_dir).bloom_columns == ["commit", "lang"]


def test_bloom_no_false_negatives_property():
    """THE soundness property, through the real pyarrow write path: any
    value present in a parquet file must hit the file's bloom when
    queried as the same Python value (write-side pyarrow values and
    query-side Catalyst literals canonicalize identically)."""
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq
    from hypothesis import given, settings, strategies as st

    scalar = st.one_of(
        st.integers(min_value=-(2**62), max_value=2**62),
        st.text(max_size=40),
    )

    @settings(max_examples=25, deadline=None)
    @given(st.lists(scalar, min_size=1, max_size=50))
    def run(values):
        # one arrow type per column, like any real table
        ints = [v for v in values if isinstance(v, int)]
        strs = [v for v in values if isinstance(v, str)]
        for name, arr, vals in (
            ("i", pa.int64(), ints),
            ("s", pa.string(), strs),
        ):
            if not vals:
                continue
            with tempfile.NamedTemporaryFile(suffix=".parquet") as f:
                pq.write_table(pa.table({name: pa.array(vals, type=arr)}), f.name)
                blooms = collect_parquet_bloom(f.name, [name])
                for v in vals:
                    assert bloom_may_match(blooms, [(name, "=", v)])

    run()


def test_bloom_sidecars_keep_manifest_small_and_share_lifecycle(
    spark, tmpdir_path
):
    """Bitmaps live OUT-OF-LINE (per-file ``.bloom`` sidecars): the
    manifest JSON carries only the bloomed-column list at any file
    count, a lost/corrupt sidecar degrades to keep-the-file (identity
    law intact), and expire_snapshots removes sidecars with their data
    files."""
    import glob
    import json
    import os

    table = _make(spark, f"{tmpdir_path}/t")
    table.overwrite(_rows_df(spark), batch_id="seed")

    with open(table._manifest_path(table.version)) as f:
        text = f.read()
    assert '"bloom_ref"' in text and '"b":' not in text
    data_files = glob.glob(f"{tmpdir_path}/t/data/*/__bucket=*/*.parquet")
    assert data_files
    assert all(os.path.exists(p + ".bloom") for p in data_files)
    with open(data_files[0] + ".bloom") as f:
        sc = json.load(f)
    assert sc["commit"]["t"] == "s" and sc["commit"]["b"]

    # a corrupt or missing sidecar keeps the file — results unchanged
    with open(data_files[0] + ".bloom", "w") as f:
        f.write("{not json")
    os.remove(data_files[1] + ".bloom")
    needle = _sha(77)
    w = f"commit = '{needle}'"
    assert sorted(map(tuple, table.read(where=w).collect())) == sorted(
        map(tuple, table.read().where(w).collect())
    )

    # expiry deletes each removed data file's sidecar alongside it
    table.overwrite(_rows_df(spark, n=100), batch_id="again")
    assert table.expire_snapshots(keep_last=1) > 0
    live = set(glob.glob(f"{tmpdir_path}/t/data/*/__bucket=*/*.parquet"))
    for s in glob.glob(f"{tmpdir_path}/t/data/*/__bucket=*/*.parquet.bloom"):
        assert s[: -len(".bloom")] in live, f"orphaned sidecar {s}"


def test_bloom_sidecar_loaded_lazily(spark, tmpdir_path, monkeypatch):
    """The read path touches a sidecar only when an equality/IN
    conjunct names a bloomed column — a range scan never pays the
    sidecar IO."""
    import sap_spark.plans.stats as stats

    table = _make(spark, f"{tmpdir_path}/t", num_buckets=1)
    table.overwrite(_rows_df(spark, n=500), batch_id="seed")
    entries = [e for es in table.manifest["buckets"].values() for e in es]
    assert entries and all(e.get("bloom_ref") == ["commit"] for e in entries)

    calls = {"n": 0}
    real = stats.load_bloom_sidecar

    def counting(p):
        calls["n"] += 1
        return real(p)

    monkeypatch.setattr(stats, "load_bloom_sidecar", counting)
    for e in entries:
        entry_may_match(e, [("content", ">=", "zzz")], True)
        entry_may_match(e, [("commit", ">=", "zzz")], True)  # not equality
    assert calls["n"] == 0
    assert entry_may_match(entries[0], [("commit", "=", _sha(1))], True)
    assert calls["n"] == 1
