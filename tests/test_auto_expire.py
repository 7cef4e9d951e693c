"""In-stream snapshot auto-expiry (CdcPipeline auto_expire_keep).

Every applied epoch commits one manifest; without expiry the metadata
directory grows forever — every table open globs all manifests and
orphan walks are O(versions × entries). The opt-in auto-expiry runs
``expire_snapshots`` from the epoch tail once the ON-DISK manifest count
(a restart-proof watermark — no in-memory cadence counter) exceeds
``keep + slack``. The exactly-once story survives expiry because the
batch ledger rides the HEAD manifest, which is always retained.
"""

import pyspark.sql.functions as F
import pytest
from pyspark.sql import types as T

from sap_spark.config import ConfigError, EngineConfig
from sap_spark.plans.doctor import check_table
from sap_spark.plans.lake import LakeTable
from sap_spark.sources.datagen import gen_change_events, write_change_log
from sap_spark.streaming.pipeline import CdcPipeline

from tests.oracle import fold_to_frame

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


def _run(spark, table, log_dir, ckpt, **kw):
    pipe = CdcPipeline(
        spark, CFG, table, log_dir,
        checkpoint_dir=ckpt,
        max_files_per_trigger=1,  # one delta token per epoch
        pipeline_id="exp-e2e",
        auto_expire_keep=2,
        auto_expire_slack=1,
        auto_expire_grace_seconds=0.0,
        **kw,
    )
    pipe.run_available_now(timeout_sec=300)
    return pipe


def test_auto_expire_bounds_metadata_and_preserves_state(spark, tmpdir_path):
    events = gen_change_events(
        spark, n_events=6000, n_keys=500, events_per_token=1000
    ).cache()
    log_dir = f"{tmpdir_path}/log"
    write_change_log(events, log_dir)
    table = LakeTable.create(
        spark, f"{tmpdir_path}/repos", TARGET_SCHEMA,
        key_columns=["repo", "path"], num_buckets=8,
    )
    pipe = _run(spark, table, log_dir, f"{tmpdir_path}/ckpt")

    table = LakeTable(spark, table.path)
    # 6 epochs committed but metadata growth is bounded: the count can
    # reach keep+slack+1 right after a commit, and expiry trims to keep
    assert table.retained_manifest_count() <= 2 + 1 + 1
    # expiry actually fired and rode the lineage record
    applied = [r for r in pipe.lineage() if r["applied"]]
    assert len(applied) == 6
    fired = [r for r in applied if r.get("expired_files") is not None]
    assert fired, "expiry never triggered despite 6 epochs at keep=2 slack=1"

    # final state is untouched by expiry: exact sequential-fold parity
    got = table.read().orderBy("repo", "path").toPandas().reset_index(drop=True)
    assert got.equals(fold_to_frame(events.toPandas()))

    # the chain doctor sees is intact (trimmed parent, no dangling walk)
    report = check_table(table.path)
    assert report["ok"], report

    # exactly-once survives expiry: the ledger rides the retained head,
    # so a replayed committed epoch is still a no-op
    version = table.version
    some_batch = events.where(F.col("delta_token") == "D0000005")
    pipe.table = table
    pipe._process_batch(some_batch, epoch_id=5)
    assert table.version == version


def test_auto_expire_resume_tail_ingest(spark, tmpdir_path):
    """Expiry mid-stream must not disturb checkpoint resume: append new
    tokens after an expired run, resume, and converge to the full fold."""
    events = gen_change_events(
        spark, n_events=6000, n_keys=400, events_per_token=1000
    ).cache()
    first = events.where(F.col("event_seq") < 4000)
    rest = events.where(F.col("event_seq") >= 4000)
    log_dir = f"{tmpdir_path}/log"
    write_change_log(first, log_dir)
    table = LakeTable.create(
        spark, f"{tmpdir_path}/repos", TARGET_SCHEMA,
        key_columns=["repo", "path"], num_buckets=8,
    )
    _run(spark, table, log_dir, f"{tmpdir_path}/ckpt")

    rest.repartition("delta_token").write.mode("append").partitionBy(
        "delta_token"
    ).parquet(log_dir)
    _run(spark, LakeTable(spark, table.path), log_dir, f"{tmpdir_path}/ckpt")

    table = LakeTable(spark, table.path)
    got = table.read().orderBy("repo", "path").toPandas().reset_index(drop=True)
    assert got.equals(fold_to_frame(events.toPandas()))
    assert table.retained_manifest_count() <= 2 + 1 + 1


def test_auto_expire_validation(spark, tmpdir_path):
    table = LakeTable.create(
        spark, f"{tmpdir_path}/t", TARGET_SCHEMA,
        key_columns=["repo", "path"], num_buckets=4,
    )
    with pytest.raises(ValueError, match="auto_expire_keep"):
        CdcPipeline(
            spark, CFG, table, f"{tmpdir_path}/log", f"{tmpdir_path}/c",
            auto_expire_keep=0,
        )
    with pytest.raises(ValueError, match="auto_expire_slack"):
        CdcPipeline(
            spark, CFG, table, f"{tmpdir_path}/log", f"{tmpdir_path}/c",
            auto_expire_keep=2, auto_expire_slack=0,
        )
    with pytest.raises(ValueError, match="auto_expire_grace_seconds"):
        CdcPipeline(
            spark, CFG, table, f"{tmpdir_path}/log", f"{tmpdir_path}/c",
            auto_expire_keep=2, auto_expire_grace_seconds=-1,
        )


def test_multitable_target_auto_expire(spark, tmpdir_path):
    """Per-target expiry in the router: the target that opts in stays
    bounded, the one that doesn't keeps its full history."""
    from sap_spark.streaming.multitable import (
        MultiTableCdcPipeline,
        TableTarget,
    )

    ev = gen_change_events(
        spark, n_events=5000, n_keys=300, events_per_token=1000
    ).cache()
    log = ev.withColumn("table_name", F.lit("repos")).unionByName(
        ev.withColumn("table_name", F.lit("mirror"))
        .withColumn("repo", F.concat(F.lit("m/"), F.col("repo"))),
    )
    log_dir = f"{tmpdir_path}/log"
    write_change_log(log, log_dir)

    t_a = LakeTable.create(
        spark, f"{tmpdir_path}/a", TARGET_SCHEMA,
        key_columns=["repo", "path"], num_buckets=4,
    )
    t_b = LakeTable.create(
        spark, f"{tmpdir_path}/b", TARGET_SCHEMA,
        key_columns=["repo", "path"], num_buckets=4,
    )
    targets = {
        "repos": TableTarget(
            t_a, CFG, auto_expire_keep=1, auto_expire_slack=1,
            auto_expire_grace_seconds=0.0,
        ),
        "mirror": TableTarget(t_b, CFG),
    }
    pipe = MultiTableCdcPipeline(
        spark, targets, log_dir,
        checkpoint_dir=f"{tmpdir_path}/ckpt",
        max_files_per_trigger=1,
        pipeline_id="mt-exp",
    )
    pipe.run_available_now(timeout_sec=300)

    t_a = LakeTable(spark, t_a.path)
    t_b = LakeTable(spark, t_b.path)
    assert t_a.retained_manifest_count() <= 1 + 1 + 1
    # 5 epochs + the create: the non-opted target retains everything
    assert t_b.retained_manifest_count() == 6
    ev_pdf = ev.toPandas()
    got_a = t_a.read().orderBy("repo", "path").toPandas().reset_index(drop=True)
    assert got_a.equals(fold_to_frame(ev_pdf))
    mirrored = ev_pdf.copy()
    mirrored["repo"] = "m/" + mirrored["repo"]
    got_b = t_b.read().orderBy("repo", "path").toPandas().reset_index(drop=True)
    assert got_b.equals(fold_to_frame(mirrored))

    with pytest.raises(ConfigError, match="auto_expire_keep"):
        TableTarget(t_a, CFG, auto_expire_keep=0).validate("x")
    with pytest.raises(ValueError, match="TableTarget"):
        MultiTableCdcPipeline(
            spark, targets, log_dir,
            checkpoint_dir=f"{tmpdir_path}/c2",
            auto_expire_keep=2,
        )
