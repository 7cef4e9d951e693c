"""Streaming aggregation operators: windowed metrics over the change stream.

The reference is batch-only; these provide the streaming metrics surface
required by north_rule ("per-partition lineage offsets and throughput
metrics") as first-class streaming queries — watermarked, late-data
tolerant, usable with any sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def op_rates(
    events: DataFrame,
    time_col: str = "ingest_ts",
    window: str = "1 minute",
    watermark: str = "5 minutes",
) -> DataFrame:
    """Events/sec per op-code over tumbling windows (streaming or batch).

    For a log without an event-time column, attach processing time first:
    ``events.withColumn("ingest_ts", F.current_timestamp())``.
    Watermark bounds state: windows older than `watermark` are finalized
    and late events beyond it are dropped (documented-late-data policy).
    """
    df = events
    if time_col not in df.columns:
        df = df.withColumn(time_col, F.current_timestamp())
    if df.isStreaming:
        df = df.withWatermark(time_col, watermark)
    return (
        df.groupBy(F.window(F.col(time_col), window).alias("w"), F.col("op"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "op",
            "n_events",
        )
    )


def token_progress(events: DataFrame) -> DataFrame:
    """Per-delta-token progress: event counts, key cardinality estimate,
    op mix — the table a CDC operator watches during a backfill.

    approx_count_distinct: at 10^10 events an exact distinct per token is
    a full shuffle; HLL is the right tool and is mergeable across epochs.
    """
    return (
        events.groupBy("delta_token")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.approx_count_distinct(F.concat_ws("|", "repo", "path")).alias(
                "approx_keys"
            ),
            F.sum(F.when(F.col("op") == "I", 1).otherwise(0)).alias("n_insert"),
            F.sum(F.when(F.col("op") == "U", 1).otherwise(0)).alias("n_update"),
            F.sum(F.when(F.col("op") == "D", 1).otherwise(0)).alias("n_delete"),
            F.sum(F.when(F.col("rocancel"), 1).otherwise(0)).alias("n_rocancel"),
            F.min("event_seq").alias("min_seq"),
            F.max("event_seq").alias("max_seq"),
        )
        .orderBy("delta_token")
    )


def session_rollup(
    events: DataFrame,
    key_cols: list[str],
    time_col: str,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Gap-based session aggregation via Spark's native session_window —
    the STREAMING form of the batch sessionization operator
    (__spark_entry__.events_sessionize): sessions merge as events arrive,
    the watermark finalizes a session once no event can extend it, and
    state is bounded by (keys × open sessions), not history.

    Works on batch frames too (same code path, no watermark) — the
    parity between the two is pinned in tests/test_streaming_aggregates.
    """
    df = events
    if df.isStreaming:
        df = df.withWatermark(time_col, watermark)
    return (
        df.groupBy(
            F.session_window(F.col(time_col), gap).alias("s"), *key_cols
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            *key_cols,
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "n_events",
        )
    )
