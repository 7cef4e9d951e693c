"""Dead-letter quarantine (streaming/quality.py + CdcPipeline wiring).

A change log salted with malformed events (null key, null seq, unknown
op code) must: (1) apply the VALID side exactly — final table state
equals the sequential oracle folded over valid events only; (2) land
every malformed event under <dlq>/epoch=*/ with machine-readable
reasons; (3) stay idempotent when an epoch is replayed; (4) never let
a null key collapse unrelated rows into one MERGE group.
"""

import pyspark.sql.functions as F
from pyspark.sql import types as T

import pytest

from sap_spark.config import EngineConfig
from sap_spark.plans.lake import LakeTable
from sap_spark.sources.datagen import gen_change_events, write_change_log
from sap_spark.streaming.pipeline import CdcPipeline
from sap_spark.streaming.quality import split_quarantine

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


def _salted_log(spark):
    """Valid synthetic log + 5 malformed rows spread across tokens."""
    events = gen_change_events(
        spark, n_events=3000, n_keys=300, events_per_token=1000
    )
    bad = spark.createDataFrame(
        [
            # (repo, path, commit, lang, content, event_seq, op,
            #  delta_token, rocancel, cancel_seq) — one violation each
            (None, "p0", "c", "py", "x", 90_001, "I", "D0000000", False, None),
            ("r1", None, "c", "py", "x", 90_002, "U", "D0000001", False, None),
            ("r2", "p2", "c", "py", "x", None, "I", "D0000001", False, None),
            ("r3", "p3", "c", "py", "x", 90_004, "UPSERT", "D0000002", False, None),
            ("r4", "p4", "c", "py", "x", 90_005, None, "D0000002", False, None),
            # truncated row: rocancel flag itself NULL — would be
            # silently 3VL-dropped by drop_cancelled without the DLQ
            ("r5", "p5", "c", "py", "x", 90_006, "I", "D0000000", None, None),
            # cancel event with no target seq — cancellation intent lost
            ("r6", "p6", "c", "py", "x", 90_007, "U", "D0000001", True, None),
        ],
        schema=T.StructType(
            [
                T.StructField("repo", T.StringType(), True),
                T.StructField("path", T.StringType(), True),
                T.StructField("commit", T.StringType(), True),
                T.StructField("lang", T.StringType(), True),
                T.StructField("content", T.StringType(), True),
                T.StructField("event_seq", T.LongType(), True),
                T.StructField("op", T.StringType(), True),
                T.StructField("delta_token", T.StringType(), True),
                T.StructField("rocancel", T.BooleanType(), True),
                T.StructField("cancel_seq", T.LongType(), True),
            ]
        ),
    )
    valid_cast = events.select(*bad.columns)  # align column order/nullability
    return valid_cast.unionByName(bad), events


def test_split_quarantine_null_safe(spark):
    """Every malformed row is quarantined with ALL its reasons; no valid
    row is lost to three-valued-logic NULLs."""
    log, valid = _salted_log(spark)
    ok, dlq = split_quarantine(log, CFG)
    assert ok.count() == valid.count()
    got = {
        r["event_seq"]: r["dlq_reasons"]
        for r in dlq.select("event_seq", "dlq_reasons").collect()
    }
    assert got[90_001] == "null_key:repo"
    assert got[90_002] == "null_key:path"
    assert got[90_004] == "bad_op"
    assert got[90_005] == "bad_op"
    assert got[90_006] == "null_rocancel"
    assert got[90_007] == "null_cancel_seq"
    # the null-seq row keys on None
    (null_seq_reason,) = [v for k, v in got.items() if k is None]
    assert null_seq_reason == "null_seq"
    # multi-reason row reports every violation
    multi = spark.createDataFrame(
        [(None, "p", None, "NOPE", 0)],
        "repo string, path string, event_seq long, op string, delta_token long",
    )
    (row,) = split_quarantine(multi, CFG)[1].collect()
    assert row["dlq_reasons"] == "null_key:repo,null_seq,bad_op"


def test_pipeline_quarantines_and_applies_valid_side(spark, tmpdir_path):
    log, valid = _salted_log(spark)
    log_dir = f"{tmpdir_path}/log"
    write_change_log(log, log_dir)

    table = LakeTable.create(
        spark, f"{tmpdir_path}/repos", TARGET_SCHEMA,
        key_columns=["repo", "path"], num_buckets=8,
    )
    dlq_dir = f"{tmpdir_path}/dlq"
    pipe = CdcPipeline(
        spark, CFG, table, log_dir,
        checkpoint_dir=f"{tmpdir_path}/ckpt",
        pipeline_id="dlq-e2e",
        dead_letter_dir=dlq_dir,
    )
    pipe.run_available_now(timeout_sec=300)

    # (1) final state == oracle over VALID events only
    table = LakeTable(spark, table.path)
    got = table.read().orderBy("repo", "path").toPandas().reset_index(drop=True)
    assert got.equals(fold_to_frame(valid.toPandas()))

    # (2) the 7 malformed rows landed with reasons; lineage counted them
    dl = pipe.dead_letters()
    assert dl.count() == 7
    assert set(dl.select("dlq_reasons").toPandas()["dlq_reasons"]) == {
        "null_key:repo", "null_key:path", "null_seq", "bad_op",
        "null_rocancel", "null_cancel_seq",
    }
    assert "epoch" in dl.columns
    lineage = pipe.lineage()
    assert sum(r.get("quarantined") or 0 for r in lineage) == 7

    # (3) a second pipeline sharing the dlq_dir writes its own
    # pipeline=<id> namespace — neither run can overwrite or double-
    # count the other's epochs
    pipe2 = CdcPipeline(
        spark, CFG, table, log_dir,
        checkpoint_dir=f"{tmpdir_path}/ckpt2",
        pipeline_id="dlq-e2e-replay",
        dead_letter_dir=dlq_dir,
    )
    pipe2.run_available_now(timeout_sec=300)
    assert pipe2.dead_letters().count() == 7
    assert pipe.dead_letters().count() == 7  # first namespace untouched
    got2 = (
        LakeTable(spark, table.path).read()
        .orderBy("repo", "path").toPandas().reset_index(drop=True)
    )
    assert got2.equals(fold_to_frame(valid.toPandas()))


def test_clean_epochs_leave_no_dlq_dirs(spark, tmpdir_path):
    events = gen_change_events(
        spark, n_events=1000, n_keys=100, events_per_token=500
    )
    log_dir = f"{tmpdir_path}/log"
    write_change_log(events, log_dir)
    table = LakeTable.create(
        spark, f"{tmpdir_path}/repos", TARGET_SCHEMA,
        key_columns=["repo", "path"], num_buckets=4,
    )
    dlq_dir = f"{tmpdir_path}/dlq"
    pipe = CdcPipeline(
        spark, CFG, table, log_dir,
        checkpoint_dir=f"{tmpdir_path}/ckpt",
        pipeline_id="dlq-clean",
        dead_letter_dir=dlq_dir,
    )
    pipe.run_available_now(timeout_sec=300)
    assert sum(r.get("quarantined") or 0 for r in pipe.lineage()) == 0
    with pytest.raises(ValueError, match="no dead letters"):
        pipe.dead_letters()
    # and the valid side was applied untouched
    table = LakeTable(spark, table.path)
    assert table.read().count() == fold_to_frame(events.toPandas()).shape[0]


def test_wiped_checkpoint_clears_stale_epoch_dirs(spark, tmpdir_path):
    """Re-running after a checkpoint wipe re-slices the log into
    different epoch ids; epoch 0 of the fresh run clears the pipeline's
    DLQ namespace so stale epoch dirs can't double-count."""
    import shutil

    log, _ = _salted_log(spark)
    log_dir = f"{tmpdir_path}/log"
    # many files per token → with max_files_per_trigger=1 the first run
    # spreads its dead letters over several epoch ids
    write_change_log(log, log_dir, files_per_token=4)
    table = LakeTable.create(
        spark, f"{tmpdir_path}/repos", TARGET_SCHEMA,
        key_columns=["repo", "path"], num_buckets=4,
    )
    dlq_dir = f"{tmpdir_path}/dlq"
    ckpt = f"{tmpdir_path}/ckpt"
    pipe = CdcPipeline(
        spark, CFG, table, log_dir, checkpoint_dir=ckpt,
        pipeline_id="dlq-wipe", dead_letter_dir=dlq_dir,
        max_files_per_trigger=1,
    )
    pipe.run_available_now(timeout_sec=300)
    first = pipe.dead_letters().count()
    assert first == 7
    n_epoch_dirs_first = len(
        {r["epoch"] for r in pipe.dead_letters().select("epoch").collect()}
    )
    assert n_epoch_dirs_first > 1  # precondition: spread across epochs

    # operator wipes the checkpoint, reruns with the default trigger:
    # the whole log lands in epoch 0
    shutil.rmtree(ckpt)
    pipe2 = CdcPipeline(
        spark, CFG, table, log_dir, checkpoint_dir=ckpt,
        pipeline_id="dlq-wipe", dead_letter_dir=dlq_dir,
    )
    pipe2.run_available_now(timeout_sec=300)
    assert pipe2.dead_letters().count() == 7  # not first + 7


def test_extra_rules_compose(spark):
    """Deployment-specific payload rules ride alongside the envelope
    rules (e.g. oversized content quarantined before it bloats a
    bucket)."""
    df = spark.createDataFrame(
        [("r", "p", 1, "I", 0, "ok"), ("r", "p2", 2, "I", 0, "x" * 100)],
        "repo string, path string, event_seq long, op string, "
        "delta_token long, content string",
    )
    ok, dlq = split_quarantine(
        df, CFG, extra_rules=[
            ("content_too_big",
             F.coalesce(F.length("content") > 50, F.lit(False))),
        ],
    )
    assert ok.count() == 1
    (row,) = dlq.collect()
    assert row["path"] == "p2" and row["dlq_reasons"] == "content_too_big"


def test_null_predicate_extra_rule_cannot_vanish_rows(spark):
    """A non-null-safe extra rule (its predicate NULLs on some row)
    breaks the contract — but the split must degrade to "rule doesn't
    fire", never to silent row loss. Raw NULL in the OR fails BOTH
    filter(bad) and filter(~bad); pre-fix such rows vanished from both
    sides."""
    df = spark.createDataFrame(
        [("r", "p", 1, "I", 0, "x"), ("r", "p2", 2, "I", 0, None)],
        "repo string, path string, event_seq long, op string, "
        "delta_token long, routing string",
    )
    ok, dlq = split_quarantine(
        df, CFG, extra_rules=[
            # NULL routing ⇒ (NULL == 'a') & TRUE = NULL, not false
            ("scoped", (F.col("routing") == "a") & F.col("repo").isNotNull()),
        ],
    )
    assert ok.count() + dlq.count() == df.count()
    # the NULL-predicate row stays on the VALID side (observable
    # downstream), it is not quarantined with an empty reason
    assert ok.where(F.col("path") == "p2").count() == 1
