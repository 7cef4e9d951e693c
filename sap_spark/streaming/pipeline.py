"""The CDC ingest pipeline: change-log tail → fold → exactly-once MERGE.

Architecture (SURVEY.md §3.4, BASELINE.json north_star):

    readStream(change log)                 # delta tokens ≈ micro-batches
      → foreachBatch:
          observe lineage (token range, counts)     # no extra pass
          drop_cancelled → LWW dedup (fold_changes) # operators/dedup.py
          evolution gate → bucketed COW MERGE       # plans/lake.py
          commit marker = (pipeline, epoch_id)      # exactly-once
      → checkpointLocation                          # resumable delta token

Exactly-once: Structured Streaming replays a failed epoch with the same
``epoch_id`` and the same input slice; ``LakeTable.merge_cdc`` commits the
``batch_id`` marker atomically with the data, so a replayed epoch is a
no-op. Together: effectively-once end-to-end.

Resume: the checkpoint's offset log records which log files (= delta
tokens) are consumed — the delta token IS the resumable checkpoint, as in
SAP ODP (delta tokens per BASELINE.json; the reference's batch source has
no resume at all).

Lineage + metrics (north_rule "per-partition lineage offsets and
throughput metrics"): each epoch appends a JSON line to
``<table>/_meta/lineage.jsonl`` with the token range, event/key counts and
timing, computed via ``DataFrame.observe`` during the merge job itself (no
second pass over the batch).
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from sap_spark.config import EngineConfig
from sap_spark.operators.dedup import fold_changes
from sap_spark.plans.lake import LakeTable
from sap_spark.sources.changelog import read_changelog_stream


def ingest_batch(
    events: DataFrame,
    table: LakeTable,
    cfg: EngineConfig,
    batch_id: str,
    strategy: str = "fetch",
) -> bool:
    """Apply one batch of raw change events to a LakeTable (idempotent).

    Fetch strategy (default): the winner set (key, seq, token — O(keys) of
    ~100 B rows) is computed once from a payload-pruned scan and persisted;
    bucket discovery reads it (exact affected set, one tiny job) and the
    fetch join broadcasts it — the payload-heavy fold stays single-pass
    inside the MERGE write job.

    Other strategies: bucket discovery falls back to a key-pruned scan of
    the raw events; a superset (keys fully cancelled in-batch) only
    rewrites an unchanged bucket, never corrupts.
    """
    from sap_spark.operators.dedup import (
        _payload_cols,
        fetch_winner_payloads,
        lww_winners,
    )

    winners = None
    if strategy == "fetch" and cfg.token_column in events.columns:
        winners = lww_winners(events, cfg).persist()
        affected = table.affected_buckets(winners.select(*cfg.key_columns))
        folded = fetch_winner_payloads(events, winners, cfg)
        keep = [
            *cfg.key_columns, cfg.order_column, cfg.op_column,
            *_payload_cols(events, cfg),
        ]
        folded = folded.select(*[c for c in keep if c in folded.columns])
    else:
        folded = fold_changes(events, cfg, strategy=strategy)
        affected = table.affected_buckets(events.select(*cfg.key_columns))
    try:
        return table.merge_cdc(
            folded,
            batch_id,
            op_column=cfg.op_column,
            seq_column=cfg.order_column,
            affected_buckets=affected,
        )
    finally:
        if winners is not None:
            winners.unpersist()


class CdcPipeline:
    """Streaming CDC ingest of a change-log directory into a LakeTable."""

    def __init__(
        self,
        spark: SparkSession,
        cfg: EngineConfig,
        table: LakeTable,
        log_path: str,
        checkpoint_dir: str,
        max_files_per_trigger: int | None = None,
        strategy: str = "fetch",
        pipeline_id: str | None = None,
        transform=None,
    ):
        """``transform``: optional DataFrame → DataFrame decode stage applied
        to each micro-batch before fold/merge — the slot for the SAP-style
        field-decode kernels (functions/decode.py ``decode_entity`` /
        per-field kernels, vectorized expressions or Arrow pandas UDFs; see
        north_star). It must preserve the envelope columns (key, op, seq,
        token, rocancel) and runs inside the same per-epoch job — no extra
        pass over the batch."""
        cfg.validate()
        self.spark = spark
        self.cfg = cfg
        self.table = table
        self.log_path = log_path
        self.checkpoint_dir = checkpoint_dir
        self.max_files_per_trigger = max_files_per_trigger
        self.strategy = strategy
        self.transform = transform
        self.pipeline_id = pipeline_id or f"cdc-{uuid.uuid4().hex[:8]}"
        self.lineage_path = os.path.join(table.path, "_meta", "lineage.jsonl")

    # -- lineage ---------------------------------------------------------

    def _record_lineage(self, record: dict) -> None:
        os.makedirs(os.path.dirname(self.lineage_path), exist_ok=True)
        with open(self.lineage_path, "a") as f:
            f.write(json.dumps(record) + "\n")

    def lineage(self) -> list[dict]:
        if not os.path.exists(self.lineage_path):
            return []
        with open(self.lineage_path) as f:
            return [json.loads(line) for line in f if line.strip()]

    # -- the per-epoch apply ----------------------------------------------

    def _reroot(self, batch_df: DataFrame) -> DataFrame:
        """Rebase the micro-batch onto a fresh batch scan of its exact files.

        A foreachBatch DataFrame carries streaming lineage, which disables
        AQE on every derived job — measured 3-6x slower epochs (bad join
        strategies, no partition coalescing) on identical data. The offset
        log has already pinned the file set, so re-reading those files as a
        plain batch source is semantically identical (same rows on retry)
        while restoring the adaptive planner. basePath keeps the
        delta_token partition column. Non-file sources fall back unchanged.

        Note: the file source hands out whole files (= whole delta tokens)
        but not necessarily in token order. The merge is event_seq-
        version-gated and delete-tombstoned, so applying delta units out of
        order still converges to the exact sequential-fold state — stronger
        than the SLT contract, and it removes any ordering coordination at
        scale.
        """
        try:
            files = batch_df.inputFiles()
        except Exception:  # noqa: BLE001 - non-file source
            return batch_df
        if not files:
            return batch_df
        return (
            self.spark.read.option("basePath", self.log_path)
            .schema(batch_df.schema)
            .parquet(*files)
        )

    def _process_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        cfg = self.cfg
        batch_df = self._reroot(batch_df)
        if self.transform is not None:
            batch_df = self.transform(batch_df)
        t0 = time.monotonic()
        obs = Observation(f"lineage-{epoch_id}")
        observed = batch_df.observe(
            obs,
            F.count(F.lit(1)).alias("n_events"),
            F.min(cfg.token_column).alias("min_token"),
            F.max(cfg.token_column).alias("max_token"),
            F.max(cfg.order_column).alias("max_seq"),
        )
        batch_id = f"{self.pipeline_id}-epoch-{epoch_id}"
        applied = ingest_batch(observed, self.table, cfg, batch_id, self.strategy)
        elapsed = time.monotonic() - t0
        metrics = obs.get if applied else {}
        n = int(metrics.get("n_events") or 0)
        self._record_lineage(
            {
                "pipeline_id": self.pipeline_id,
                "epoch_id": epoch_id,
                "batch_id": batch_id,
                "applied": applied,
                "n_events": n,
                "min_token": metrics.get("min_token"),
                "max_token": metrics.get("max_token"),
                "max_seq": metrics.get("max_seq"),
                "elapsed_sec": round(elapsed, 4),
                "merge_phases": getattr(self.table, "last_merge_metrics", None),
                "events_per_sec": round(n / elapsed, 1) if elapsed > 0 and n else None,
                "table_version": self.table.version,
                "wall_time": time.time(),
            }
        )

    # -- run --------------------------------------------------------------

    def run_available_now(self, timeout_sec: float | None = None) -> None:
        """Consume everything currently in the log, then stop (bounded
        replay; Trigger.AvailableNow still honors maxFilesPerTrigger by
        splitting the backlog into multiple epochs)."""
        stream = read_changelog_stream(
            self.spark, self.log_path, self.max_files_per_trigger
        )
        query = (
            stream.writeStream.foreachBatch(self._process_batch)
            .option("checkpointLocation", self.checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination(timeout_sec)
        if query.isActive:
            query.stop()
        if query.exception() is not None:
            raise query.exception()
