"""Dead-letter quarantine for malformed change events.

A 10^10-event change log WILL contain garbage — a upstream extractor
bug emitting null keys, an op code outside the I/U/D vocabulary, a
truncated row missing its sequence number. Without a quarantine path
one poisoned event either kills the epoch (fail-the-job) or silently
corrupts the fold (null key collapses unrelated rows into one MERGE
group). The reference plugins fail the whole pipeline run on the first
invalid record (SapODataTransformer.java error paths); at CDC scale
the right behavior is: **split the batch, apply the valid side, land
the invalid side in an epoch-keyed dead-letter sink with machine-
readable reasons, and count it in lineage**.

Scale shape:
- the VALID-side predicate fuses into the epoch's existing single scan
  (one codegen filter — no extra pass, no cache);
- the INVALID side is a second filtered scan of the same parquet files;
  its null-based predicates prune row groups via parquet null-count
  statistics, so a clean log pays almost nothing beyond footer reads;
- the dead-letter write is ``epoch=<id>`` directory overwrite — a
  replayed epoch rewrites the identical rows (idempotent, same
  exactly-once story as the commit marker).

All rules are null-safe three-valued-logic-wise: every violation
predicate evaluates to true/false, never NULL, so ``~violations`` on
the valid side cannot silently drop rows.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sap_spark.config import EngineConfig

VALID_OPS = ("I", "U", "D")


def violation_rules(
    df: DataFrame,
    cfg: EngineConfig,
    extra_rules: "list[tuple[str, Column]] | None" = None,
) -> "list[tuple[str, Column]]":
    """(reason, predicate) pairs; predicate true ⇒ the event is
    quarantined for that reason. Only envelope columns present in the
    frame are checked, so the rules work on pre- and post-transform
    schemas alike. ``extra_rules`` lets a deployment add payload checks
    (e.g. content size caps) — predicates must be null-safe."""
    cols = set(df.columns)
    rules: list[tuple[str, Column]] = []
    for k in cfg.key_columns:
        if k in cols:
            rules.append((f"null_key:{k}", F.col(k).isNull()))
    if cfg.order_column in cols:
        rules.append(("null_seq", F.col(cfg.order_column).isNull()))
    if cfg.token_column in cols:
        rules.append(("null_token", F.col(cfg.token_column).isNull()))
    if cfg.op_column in cols:
        op = F.col(cfg.op_column)
        # isNull first so the isin() NULL never reaches the OR as the
        # only branch; NULL | true = true, non-null op decides normally
        rules.append(("bad_op", op.isNull() | ~op.isin(*VALID_OPS)))
    if extra_rules:
        rules.extend(extra_rules)
    return rules


def split_quarantine(
    df: DataFrame,
    cfg: EngineConfig,
    extra_rules: "list[tuple[str, Column]] | None" = None,
) -> "tuple[DataFrame, DataFrame]":
    """(valid, quarantined) split. ``quarantined`` carries every
    original column plus ``dlq_reasons`` — a comma-joined list of ALL
    matched rule names (not just the first), so one pass over the
    dead-letter sink shows which upstream defects co-occur."""
    rules = violation_rules(df, cfg, extra_rules)
    if not rules:
        return df, df.limit(0).withColumn("dlq_reasons", F.lit(""))
    bad = reduce(lambda a, b: a | b, (c for _, c in rules))
    reasons = F.concat_ws(
        ",", F.array_compact(F.array(*[F.when(c, F.lit(n)) for n, c in rules]))
    )
    return (
        df.filter(~bad),
        df.filter(bad).withColumn("dlq_reasons", reasons),
    )


def write_dead_letters(
    quarantined: DataFrame, dlq_dir: str, epoch_id: int
) -> int:
    """Land the quarantined side under ``<dlq_dir>/epoch=<id>`` and
    return the row count, measured by an Observation inside the write
    job itself — no second pass. Directory overwrite keeps a replayed
    epoch idempotent."""
    from pyspark.sql import Observation

    obs = Observation(f"dlq-{epoch_id}")
    observed = quarantined.observe(obs, F.count(F.lit(1)).alias("n"))
    target = f"{dlq_dir}/epoch={epoch_id}"
    observed.write.mode("overwrite").parquet(target)
    n = int(obs.get.get("n") or 0)
    if n == 0:
        # a clean epoch leaves no empty partition dir behind (an
        # all-empty epoch=* glob would break schema inference on read)
        import shutil
        from urllib.parse import urlparse

        p = urlparse(target)
        if p.scheme in ("", "file"):
            shutil.rmtree(p.path or target, ignore_errors=True)
    return n


def read_dead_letters(spark, dlq_dir: str) -> DataFrame:
    """All quarantined events across epochs; ``epoch`` recovered from
    the partition directory. Raises ValueError (with a clear message)
    if no epoch has quarantined anything — check lineage's
    ``quarantined`` counts first."""
    import glob
    import os
    from urllib.parse import urlparse

    p = urlparse(dlq_dir)
    if p.scheme in ("", "file") and not glob.glob(
        os.path.join(p.path or dlq_dir, "epoch=*")
    ):
        raise ValueError(f"no dead letters recorded under {dlq_dir}")
    return spark.read.option("basePath", dlq_dir).parquet(f"{dlq_dir}/epoch=*")
