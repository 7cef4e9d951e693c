"""Streaming windowed aggregation: watermark plumbing + batch parity."""

import pyspark.sql.functions as F

from sap_spark.sources.datagen import gen_change_events, write_change_log
from sap_spark.sources.changelog import read_changelog_stream
from sap_spark.streaming.aggregates import op_rates, token_progress


def test_token_progress(spark):
    events = gen_change_events(spark, n_events=3000, n_keys=300, events_per_token=1000)
    prog = token_progress(events).collect()
    assert [r["delta_token"] for r in prog] == ["D0000000", "D0000001", "D0000002"]
    base = events.toPandas().drop_duplicates("event_seq")
    assert sum(r["n_events"] for r in prog) == len(events.toPandas())
    assert prog[0]["min_seq"] == 0
    r0 = prog[0]
    assert r0["n_insert"] + r0["n_update"] + r0["n_delete"] == r0["n_events"]
    assert r0["n_rocancel"] > 0
    # the HLL column is excluded from the driver contract's hash check
    # (engine-specific sketch) — its accuracy is pinned HERE instead:
    # Spark documents ~2-5% default relative error; assert 10% slack
    exact = {
        r["delta_token"]: r["n"]
        for r in events.groupBy("delta_token")
        .agg(F.countDistinct("repo", "path").alias("n"))
        .collect()
    }
    for r in prog:
        assert abs(r["approx_keys"] - exact[r["delta_token"]]) <= max(
            0.10 * exact[r["delta_token"]], 2
        )


def test_op_rates_streaming_matches_batch(spark, tmpdir_path):
    events = gen_change_events(spark, n_events=2000, n_keys=300, events_per_token=1000)
    # deterministic event time derived from seq so stream and batch agree
    with_ts = events.withColumn(
        "ingest_ts",
        F.timestamp_seconds(F.lit(1_700_000_000) + (F.col("event_seq") / 50).cast("long")),
    )
    log_dir = f"{tmpdir_path}/log"
    with_ts.write.mode("overwrite").parquet(log_dir)

    batch_out = op_rates(spark.read.parquet(log_dir), window="1 minute")
    expected = sorted(
        map(tuple, batch_out.collect())
    )

    stream = (
        spark.readStream.schema(with_ts.schema).parquet(log_dir)
    )
    q = (
        op_rates(stream, window="1 minute")
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("rates")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(map(tuple, spark.sql("select * from rates").collect()))
    assert got == expected
    assert len(got) > 1  # multiple windows actually formed


def test_session_rollup_streaming_matches_batch(spark, tmpdir_path):
    """Native session_window sessions: streaming (watermarked, availableNow)
    equals the batch run on the same frame, and gaps actually split."""
    from sap_spark.streaming.aggregates import session_rollup

    events = gen_change_events(spark, n_events=1500, n_keys=40, events_per_token=1500)
    # per-key bursts with >10-minute gaps between bursts
    with_ts = events.withColumn(
        "ingest_ts",
        F.timestamp_seconds(
            F.lit(1_700_000_000)
            + (F.col("event_seq") % 7) * 30          # 30s intra-burst spacing
            + (F.col("event_seq") / 200).cast("long") * 3600  # hourly bursts
        ),
    )
    log_dir = f"{tmpdir_path}/sess_log"
    with_ts.write.mode("overwrite").parquet(log_dir)

    batch_out = session_rollup(
        spark.read.parquet(log_dir), ["repo", "path"], "ingest_ts", gap="10 minutes"
    )
    expected = sorted(map(tuple, batch_out.collect()))

    stream = spark.readStream.schema(with_ts.schema).parquet(log_dir)
    q = (
        session_rollup(stream, ["repo", "path"], "ingest_ts", gap="10 minutes")
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("sessions")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(map(tuple, spark.sql("select * from sessions").collect()))
    assert got == expected
    # sessions split on the hourly gaps: more sessions than keys
    keys = {(t[0], t[1]) for t in got}
    assert len(got) > len(keys)
