"""plans/doctor.check_table: read-only lake fsck — a healthy table audits
clean (shallow and deep), and each durable-invariant violation is caught by
exactly the check that owns it at the right severity."""

import glob
import json
import os
import shutil

import pyspark.sql.functions as F
import pytest
from pyspark.sql import types as T

from sap_spark.config import EngineConfig
from sap_spark.plans.doctor import check_table
from sap_spark.plans.lake import LakeTable
from sap_spark.sources.datagen import gen_change_events
from sap_spark.streaming.pipeline import ingest_batch

CFG = EngineConfig().validate()

TARGET_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("commit", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("content", T.StringType(), True),
    ]
)


def _built_table(spark, tmpdir_path, **create_kwargs) -> LakeTable:
    events = gen_change_events(
        spark, n_events=1500, n_keys=200, events_per_token=500
    ).cache()
    table = LakeTable.create(
        spark,
        f"{tmpdir_path}/repos",
        TARGET_SCHEMA,
        key_columns=["repo", "path"],
        num_buckets=4,
        **create_kwargs,
    )
    for tok in sorted(
        r[0] for r in events.select("delta_token").distinct().collect()
    ):
        ingest_batch(
            events.where(F.col("delta_token") == tok),
            table,
            CFG,
            batch_id=f"b-{tok}",
        )
    return table


def _by_name(report: dict) -> dict:
    return {c["name"]: c for c in report["checks"]}


def _rewrite_manifest(table: LakeTable, mutate) -> None:
    mpath = table._manifest_path(table.version)
    with open(mpath) as f:
        m = json.load(f)
    mutate(m)
    with open(mpath, "w") as f:
        json.dump(m, f)


def test_healthy_table_audits_clean_shallow_and_deep(spark, tmpdir_path):
    table = _built_table(spark, tmpdir_path)
    report = check_table(table.path, spark=spark, deep=True)
    assert report["ok"], report
    checks = _by_name(report)
    for name in (
        "manifest_chain", "manifest_strict_json", "version_cache", "schema",
        "bucket_map", "data_files", "file_stats", "bloom_layers",
        "batch_ledger", "orphans", "deep_footers", "deep_buckets",
    ):
        assert name in checks, f"missing check {name}"
        assert checks[name]["ok"], checks[name]
    # the deep passes actually covered the CURRENT snapshot's files (older
    # retained versions' files stay on disk but are not part of the snapshot)
    n_files = sum(len(es) for es in table.manifest["buckets"].values())
    assert checks["deep_footers"]["detail"] == f"{n_files} footers verified"
    assert checks["deep_buckets"]["detail"].startswith(f"{n_files} files")


def test_missing_data_file_is_an_error(spark, tmpdir_path):
    table = _built_table(spark, tmpdir_path)
    victim = table.manifest["buckets"][next(iter(table.manifest["buckets"]))][0][
        "path"
    ]
    os.remove(victim)
    report = check_table(table.path)
    assert not report["ok"]
    assert not _by_name(report)["data_files"]["ok"]


def test_dangling_manifest_chain_is_an_error(spark, tmpdir_path):
    table = _built_table(spark, tmpdir_path)
    assert table.version >= 2
    os.remove(table._manifest_path(table.version - 1))
    report = check_table(table.path)
    assert not report["ok"]
    chain = _by_name(report)["manifest_chain"]
    assert not chain["ok"] and "dangles" in chain["problems"][0]


def test_duplicate_batch_marker_is_an_error(spark, tmpdir_path):
    table = _built_table(spark, tmpdir_path)
    _rewrite_manifest(table, lambda m: m["commits"].append(m["commits"][0]))
    report = check_table(table.path)
    assert not report["ok"]
    assert not _by_name(report)["batch_ledger"]["ok"]


def test_orphans_are_informational_not_failures(spark, tmpdir_path):
    table = _built_table(spark, tmpdir_path)
    # fabricate crash debris: a data file no manifest references
    some = glob.glob(os.path.join(table.path, "data", "*", "__bucket=*", "*.parquet"))[0]
    stray_dir = os.path.join(table.path, "data", "deadbeef", "__bucket=0")
    os.makedirs(stray_dir)
    shutil.copy(some, os.path.join(stray_dir, "stray.parquet"))
    report = check_table(table.path)
    assert report["ok"]
    orphans = _by_name(report)["orphans"]
    assert orphans["ok"] and "1 unreferenced" in orphans["detail"]


def test_missing_bloom_sidecar_is_a_warning_not_failure(spark, tmpdir_path):
    table = _built_table(
        spark, tmpdir_path, bloom_columns=["commit"], stats_columns=["commit"]
    )
    # the audit covers the CURRENT snapshot: remove a sidecar the current
    # manifest actually references (the glob would also see prior
    # versions' sidecars, which the audit rightly ignores)
    current = [
        e["path"] + ".bloom"
        for es in table.manifest["buckets"].values()
        for e in es
        if e.get("bloom_ref")
    ]
    assert current, "expected bloom sidecars on a bloom-opted table"
    os.remove(current[0])
    report = check_table(table.path)
    assert report["ok"]  # skipping degrades; data is intact
    bloom = _by_name(report)["bloom_layers"]
    assert not bloom["ok"] and "sidecar missing" in bloom["problems"][0]


def test_deep_catches_row_count_and_bucket_lies(spark, tmpdir_path):
    table = _built_table(spark, tmpdir_path)

    def lie(m):
        buckets = sorted(m["buckets"])
        entry = m["buckets"][buckets[0]][0]
        if entry.get("nulls"):
            entry["nulls"]["rows"] = (entry["nulls"].get("rows") or 0) + 7
        else:
            entry["nulls"] = {"rows": 7, "counts": {}}
        # misfile another bucket's entry under the wrong bucket id
        moved = m["buckets"][buckets[1]].pop(0)
        m["buckets"][buckets[0]].append(moved)

    _rewrite_manifest(table, lie)
    report = check_table(table.path, spark=spark, deep=True)
    assert not report["ok"]
    checks = _by_name(report)
    assert not checks["deep_footers"]["ok"]
    assert not checks["deep_buckets"]["ok"]


def test_cli_doctor_exits_nonzero_on_broken_table(spark, tmpdir_path, capsys):
    from sap_spark.cli import main

    table = _built_table(spark, tmpdir_path)
    main(["doctor", "--table", table.path])
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["ok"] and report["version"] == table.version

    victim = table.manifest["buckets"][next(iter(table.manifest["buckets"]))][0][
        "path"
    ]
    os.remove(victim)
    with pytest.raises(SystemExit):
        main(["doctor", "--table", table.path])


def test_fingerprint_layout_independent_and_row_sensitive(spark, tmpdir_path):
    """The north-star parity check, distributed: equal row multisets ⇒
    equal fingerprints across bucket counts, merge modes, and
    compaction; one changed row flips it."""
    from sap_spark.plans.doctor import table_fingerprint

    events = gen_change_events(
        spark, n_events=1200, n_keys=150, events_per_token=400
    ).cache()
    tables = {}
    for name, kwargs in (
        ("a", dict(num_buckets=4, merge_mode="cow")),
        ("b", dict(num_buckets=7, merge_mode="mor")),
    ):
        t = LakeTable.create(
            spark,
            f"{tmpdir_path}/{name}",
            TARGET_SCHEMA,
            key_columns=["repo", "path"],
            **kwargs,
        )
        for tok in sorted(
            r[0] for r in events.select("delta_token").distinct().collect()
        ):
            ingest_batch(
                events.where(F.col("delta_token") == tok),
                t, CFG, batch_id=f"b-{tok}",
            )
        tables[name] = t

    fp_a = table_fingerprint(spark, tables["a"].path)
    fp_b = table_fingerprint(spark, tables["b"].path)
    assert fp_a["rows"] == fp_b["rows"] > 0
    assert fp_a["fingerprint"] == fp_b["fingerprint"]

    # physical maintenance must not move it: fold MOR deltas + expire
    b = LakeTable(spark, tables["b"].path)
    b.compact()
    b.expire_snapshots(keep_last=1)
    assert (
        table_fingerprint(spark, tables["b"].path)["fingerprint"]
        == fp_b["fingerprint"]
    )

    # one deleted row flips it
    victim = tables["a"].read().select("repo", "path").limit(1).collect()[0]
    delete = spark.createDataFrame(
        [
            (
                "D9999999", 10**9, "D", False, None,
                victim["repo"], victim["path"], None, None, None,
            )
        ],
        "delta_token string, event_seq long, op string, rocancel boolean, "
        "cancel_seq long, repo string, path string, commit string, "
        "lang string, content string",
    )
    a = LakeTable(spark, tables["a"].path)
    ingest_batch(delete, a, CFG, batch_id="del-1")
    fp_a2 = table_fingerprint(spark, a.path)
    assert fp_a2["rows"] == fp_a["rows"] - 1
    assert fp_a2["fingerprint"] != fp_a["fingerprint"]

    # column-subset fingerprints: key-only prints still agree between the
    # (now diverged) tables only on the shared keys — and an unknown
    # column fails loudly
    with pytest.raises(ValueError, match="not in schema"):
        table_fingerprint(spark, a.path, columns=["nope"])


def test_cli_doctor_fingerprint_flag(spark, tmpdir_path, capsys):
    from sap_spark.cli import main

    table = _built_table(spark, tmpdir_path)
    main(
        [
            "doctor", "--table", table.path,
            "--fingerprint", "--fingerprint-columns", "repo,path,content",
        ]
    )
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["ok"]
    fp = report["fingerprint"]
    assert fp["columns"] == ["content", "path", "repo"]
    assert fp["rows"] > 0 and len(fp["fingerprint"]) == 64
