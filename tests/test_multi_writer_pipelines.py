"""Two independent streaming CDC pipelines feeding ONE merge-on-read
LakeTable concurrently — the no-coordination multi-writer topology the
optimistic rebase enables (MOR delta appends compose under the
event_seq read fold, so every commit interleaving is correct).

Each pipeline has its own checkpoint, pipeline_id and change log; their
epochs race on the table's manifest CAS and the losers rebase
metadata-only. The final table state must equal the sequential fold of
the UNION of both logs, and both pipelines must apply every epoch."""

import threading

import pyspark.sql.functions as F
from pyspark.sql import types as T

from sap_spark.config import EngineConfig
from sap_spark.plans.doctor import check_table
from sap_spark.plans.lake import LakeTable
from sap_spark.sources.datagen import gen_change_events, write_change_log
from sap_spark.streaming.pipeline import CdcPipeline

from tests.oracle import fold_to_frame

SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("commit", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("content", T.StringType(), True),
    ]
)


def test_two_pipelines_one_mor_table_concurrently(spark, tmpdir_path):
    # Two feeds: same generator, the second shifted to a disjoint
    # event_seq range and a disjoint repo namespace (two source systems
    # replicating into one lake table).
    feed1 = gen_change_events(
        spark, n_events=4000, n_keys=200, events_per_token=1000
    ).cache()
    feed2 = (
        gen_change_events(spark, n_events=4000, n_keys=200, events_per_token=1000)
        .withColumn("event_seq", F.col("event_seq") + F.lit(10_000_000))
        .withColumn(
            "cancel_seq", F.col("cancel_seq") + F.lit(10_000_000)
        )
        .withColumn("repo", F.concat(F.lit("x-"), F.col("repo")))
        .withColumn("delta_token", F.concat(F.lit("X"), F.col("delta_token")))
        .cache()
    )
    log1, log2 = f"{tmpdir_path}/log1", f"{tmpdir_path}/log2"
    write_change_log(feed1, log1)
    write_change_log(feed2, log2)

    table = LakeTable.create(
        spark, f"{tmpdir_path}/t", SCHEMA, key_columns=["repo", "path"],
        num_buckets=8, merge_mode="mor",
    )
    cfg = EngineConfig().validate()
    pipes = [
        CdcPipeline(
            spark, cfg, LakeTable(spark, table.path), log,
            checkpoint_dir=f"{tmpdir_path}/ckpt{i}",
            max_files_per_trigger=1,  # many epochs → many commit races
            pipeline_id=f"writer-{i}",
        )
        for i, log in enumerate((log1, log2))
    ]

    errors = []

    def run(p):
        try:
            p.run_available_now(timeout_sec=600)
        except Exception as e:  # noqa: BLE001 — surfaced below
            errors.append(e)

    threads = [threading.Thread(target=run, args=(p,)) for p in pipes]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors

    # every epoch of both pipelines applied (no conflicts in MOR topology)
    for p in pipes:
        records = p.lineage()
        assert records and all(r["applied"] for r in records)

    # final state == sequential fold of the UNION of both logs
    union = feed1.unionByName(feed2)
    expected = fold_to_frame(union.toPandas())
    got = (
        LakeTable(spark, table.path).read()
        .orderBy("repo", "path").toPandas().reset_index(drop=True)
    )
    assert got.equals(expected)

    # both writers' batch ledgers landed; the table audits clean
    fresh = LakeTable(spark, table.path)
    committed = fresh.committed_batches()
    assert any(b.startswith("writer-0") for b in committed)
    assert any(b.startswith("writer-1") for b in committed)
    report = check_table(table.path, spark=spark, deep=True)
    assert report["ok"], report["checks"]
