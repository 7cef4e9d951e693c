"""The auto strategy's hot-key probe fuses into the bucket-discovery agg:
one job per epoch yields the affected set, per-bucket lineage offsets AND
the hottest-key count (max over buckets == max over keys). These tests pin
the fused math and the lineage surface."""

import pyspark.sql.functions as F
from pyspark.sql import types as T

from sap_spark.config import EngineConfig
from sap_spark.plans.lake import LakeTable
from sap_spark.sources.datagen import gen_change_events, write_change_log
from sap_spark.streaming.pipeline import CdcPipeline

from tests.oracle import fold_to_frame

REPO_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("commit", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("content", T.StringType(), True),
    ]
)


def test_offsets_with_count_column_match_direct_agg(spark, tmpdir_path):
    table = LakeTable.create(
        spark, f"{tmpdir_path}/t", REPO_SCHEMA, key_columns=["repo", "path"],
        num_buckets=8,
    )
    events = gen_change_events(spark, n_events=2000, n_keys=150,
                               events_per_token=1000)
    winners = (
        events.groupBy("repo", "path")
        .agg(
            F.max("event_seq").alias("event_seq"),
            F.count(F.lit(1)).alias("__n_events"),
        )
    )
    offsets = table.affected_bucket_offsets(
        winners, seq_column="event_seq", count_column="__n_events"
    )
    # the plain call's fields are untouched by the fusion
    plain = table.affected_bucket_offsets(winners, seq_column="event_seq")
    assert sorted(offsets) == sorted(plain)
    for b in plain:
        assert offsets[b]["max_seq"] == plain[b]["max_seq"]
        assert offsets[b]["n_rows"] == plain[b]["n_rows"]
    # max over buckets IS the batch's hottest-key count
    true_hot = winners.agg(F.max("__n_events")).collect()[0][0]
    assert max(o["max_key_events"] for o in offsets.values()) == true_hot
    # absent count column: field simply not emitted (legacy shape)
    assert "max_key_events" not in next(iter(plain.values()))


def test_auto_pipeline_lineage_carries_max_key_events(spark, tmpdir_path):
    """Under the default auto strategy every applied epoch's bucket_offsets
    carry max_key_events (the fused probe's output doubles as per-bucket
    skew observability), the recorded hot_key_count equals the max over
    buckets, and the final state is still the exact sequential fold."""
    events = gen_change_events(
        spark, n_events=3000, n_keys=200, events_per_token=1000
    ).cache()
    log_dir = f"{tmpdir_path}/log"
    write_change_log(events, log_dir)
    table = LakeTable.create(
        spark, f"{tmpdir_path}/repos", REPO_SCHEMA,
        key_columns=["repo", "path"], num_buckets=8,
    )
    cfg = EngineConfig().validate()
    pipe = CdcPipeline(
        spark, cfg, table, log_dir,
        checkpoint_dir=f"{tmpdir_path}/ckpt",
        pipeline_id="fused",
    )
    pipe.run_available_now(timeout_sec=300)
    applied = [r for r in pipe.lineage() if r["applied"]]
    assert applied
    for r in applied:
        offsets = r["bucket_offsets"]
        assert offsets  # fused discovery recorded per-bucket offsets
        counts = [o["max_key_events"] for o in offsets.values()]
        assert all(isinstance(c, int) and c >= 1 for c in counts)
        assert r["fold"]["hot_key_count"] == max(counts)
        assert r["fold"]["strategy"] == "fetch"  # mild batch stays on fetch

    table = LakeTable(spark, table.path)
    got = table.read().orderBy("repo", "path").toPandas().reset_index(drop=True)
    assert got.equals(fold_to_frame(events.toPandas()))
