"""Endurance bench: many consecutive CDC epochs over one long change log.

The scaling benches (BENCH/SCALING_r*.md) prove throughput parallelism at
a fixed, small epoch count; this tool pins the orthogonal 100x property —
**per-epoch cost stays flat as the table and the replayed history grow**.
A CDC engine whose epoch N costs more than epoch 1 (state leak, manifest
growth on the read path, unbounded delta-file accumulation) fails at
10^10 events no matter how well it scales across executors.

Protocol: one deterministic log of ``--events`` events split into
``--epochs`` delta tokens (one file per token, maxFilesPerTrigger=1, so
the streaming source delivers exactly one token per micro-batch — the
production cadence). The pipeline runs with its defaults (strategy=auto,
token atomicity on) plus auto-compaction at the documented delta-file
threshold, exactly as a long-lived deployment would. Per-epoch walls,
events/sec, merge phases and table_version come from the pipeline's own
lineage records (streaming/pipeline.py::_record_lineage) — no extra
instrumentation is added to the measured path.

Output: one JSON line (machine-readable) plus a markdown table on stdout;
the driver-facing evidence lands in BENCH/ENDURANCE_r5.md.

Flatness metric: median(last quartile of epochs) / median(first quartile)
— 1.0 means epoch cost is independent of accumulated history. Values
well above 1 localize the leak via the per-epoch merge/compaction
columns.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=96_000_000)
    ap.add_argument("--epochs", type=int, default=24)
    ap.add_argument("--cores", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--auto-expire-keep", type=int, default=None,
                    help="run with in-stream snapshot expiry (grace=0: "
                         "the bench owns its table exclusively) and report "
                         "retained-manifest / expired-file evidence")
    ap.add_argument("--auto-expire-slack", type=int, default=8)
    ap.add_argument("--keep-workdir", action="store_true")
    args = ap.parse_args()

    from sap_spark.config import EngineConfig, get_spark
    from sap_spark.plans.lake import LakeTable, derive_num_buckets
    from sap_spark.sources.datagen import gen_change_events, write_change_log
    from sap_spark.streaming.pipeline import CdcPipeline
    from pyspark.sql import types as T

    spark = get_spark(
        master=f"local[{args.cores}]",
        shuffle_partitions=max(args.cores, 32),
    )
    workdir = tempfile.mkdtemp(prefix="sap_spark_endurance_")
    try:
        log_path = f"{workdir}/log"
        # one token per epoch: events_per_token = events/epochs, one file
        # per token, maxFilesPerTrigger=1 → exactly `epochs` micro-batches
        log = gen_change_events(
            spark,
            n_events=args.events,
            n_keys=min(max(args.events // 80, 1000), 500_000),
            events_per_token=max(args.events // args.epochs, 1),
            num_partitions=64,
        )
        write_change_log(log, log_path, files_per_token=1)
        n_rows = spark.read.parquet(log_path).count()

        schema = T.StructType([
            T.StructField("repo", T.StringType(), False),
            T.StructField("path", T.StringType(), False),
            T.StructField("commit", T.StringType(), True),
            T.StructField("lang", T.StringType(), True),
            T.StructField("content", T.StringType(), True),
        ])
        log_bytes = sum(
            os.path.getsize(os.path.join(dp, f))
            for dp, _, fs in os.walk(log_path) for f in fs
        )
        num_buckets = derive_num_buckets(log_bytes, min_buckets=32)
        cfg = EngineConfig(num_buckets=num_buckets).validate()
        merge_mode = os.environ.get("SPARK_GRAFT_MERGE_MODE", "cow")
        table = LakeTable.create(
            spark, f"{workdir}/repos", schema,
            key_columns=["repo", "path"], num_buckets=num_buckets,
            merge_mode=merge_mode,
        )
        pipe = CdcPipeline(
            spark, cfg, table, log_path,
            checkpoint_dir=f"{workdir}/ckpt",
            max_files_per_trigger=1,
            pipeline_id="endurance",
            # long-lived MOR deployments compact as they go (8 = the
            # documented read-amplification knee); COW rewrites buckets
            # in place, so there is nothing to compact
            auto_compact_delta_files=8 if merge_mode == "mor" else None,
            auto_expire_keep=args.auto_expire_keep,
            auto_expire_slack=args.auto_expire_slack,
            auto_expire_grace_seconds=0.0,
        )
        t0 = time.monotonic()
        pipe.run_available_now(timeout_sec=4 * 3600)
        total_wall = time.monotonic() - t0
        final_rows = LakeTable(spark, table.path).read().count()
        assert final_rows > 0

        epochs = []
        with open(pipe.lineage_path) as f:
            for line in f:
                rec = json.loads(line)
                if rec.get("applied") and rec.get("n_events"):
                    epochs.append(rec)
        epochs.sort(key=lambda r: r["epoch_id"])

        walls = [e["elapsed_sec"] for e in epochs]
        # epoch 0 pays one-time JIT/codegen warmup (2-3x the steady wall);
        # flatness is a statement about history growth, so it compares
        # steady-state quartiles — epoch 0 stays in the table and the
        # overall-throughput number, it just doesn't define the baseline
        steady = walls[1:] if len(walls) > 4 else walls
        quart = max(len(steady) // 4, 1)
        head = statistics.median(steady[:quart])
        tail = statistics.median(steady[-quart:])
        flatness = tail / head if head else float("nan")

        print("| epoch | events | wall (s) | ev/s | merged buckets | "
              "compacted | compact (s) | table version |")
        print("|---|---|---|---|---|---|---|---|")
        for e in epochs:
            mp = e.get("merge_phases") or {}
            print(f"| {e['epoch_id']} | {e['n_events']:,} | "
                  f"{e['elapsed_sec']:.2f} | {e['events_per_sec']:,.0f} | "
                  f"{len(e.get('bucket_offsets') or {})} | "
                  f"{len(e.get('compacted_buckets') or [])} | "
                  f"{e.get('compact_sec') or 0} | {e['table_version']} |")
        summary = {
            "metric": "cdc_endurance_flatness",
            "events": n_rows,
            "epochs": len(epochs),
            "cores": args.cores,
            "total_wall_sec": round(total_wall, 1),
            "events_per_sec_overall": round(n_rows / total_wall, 1),
            "epoch_wall_first_quartile_median": round(head, 3),
            "epoch_wall_last_quartile_median": round(tail, 3),
            "flatness_last_over_first": round(flatness, 4),
            "final_rows": final_rows,
            "num_buckets": num_buckets,
            "epoch_walls": [round(w, 3) for w in walls],
            # metadata-growth evidence (the axis auto-expiry bounds):
            # manifests left on disk and how much expiry reclaimed
            "retained_manifests": LakeTable(
                spark, table.path
            ).retained_manifest_count(),
            "auto_expire_keep": args.auto_expire_keep,
            "expire_events": [
                {
                    "epoch": e["epoch_id"],
                    "expired_files": e["expired_files"],
                    "expire_sec": e["expire_sec"],
                }
                for e in epochs
                if e.get("expired_files") is not None
            ],
        }
        print(json.dumps(summary))
        return 0
    finally:
        if args.keep_workdir:
            print(f"workdir kept: {workdir}", file=sys.stderr)
        else:
            shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
