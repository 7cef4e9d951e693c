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
- the INVALID side is a second scan of the same parquet files, pruned
  to the envelope columns only (key/seq/token/op/rocancel — a few
  bytes/row next to the payload). The null rules prune row groups via
  parquet null-count statistics, but ``bad_op`` (a NOT-IN) can never be
  statistically disproven, so a clean epoch still decodes its envelope
  columns once — that, not "footer reads", is the clean-log cost;
- a clean epoch pays only a count aggregation (no write job, no
  directory): the write job runs only when the count is non-zero, as an
  ``epoch=<id>`` directory overwrite — a replayed epoch rewrites the
  identical rows (idempotent, same exactly-once story as the commit
  marker).

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
    if cfg.rocancel_column in cols:
        rc = F.col(cfg.rocancel_column)
        # a NULL rocancel flag (truncated row) would otherwise be
        # silently swallowed downstream: drop_cancelled's
        # ``where(~rocancel)`` evaluates NULL under 3VL and drops the
        # row with no trace — neither applied nor dead-lettered
        rules.append(("null_rocancel", rc.isNull()))
        if cfg.cancel_seq_column in cols:
            # a cancel event with no target: the cancellation intent
            # is lost (cancelled_seqs filters isNotNull) — surface it.
            # coalesce keeps this rule 3VL-false when rocancel is NULL
            # (the null_rocancel rule owns that row)
            rules.append((
                "null_cancel_seq",
                F.coalesce(rc, F.lit(False))
                & F.col(cfg.cancel_seq_column).isNull(),
            ))
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
    # Defense against a non-null-safe extra rule: a NULL predicate is
    # treated as "rule doesn't fire". Raw NULL in the OR would make
    # ``bad`` NULL for the row, which fails BOTH filter(~bad) and
    # filter(bad) — the row would silently vanish from valid AND
    # quarantined sides, the one outcome a quarantine must never
    # produce. Coalesced-to-false, the row stays on the VALID side
    # where downstream checks (fold, routing policy) still see it.
    safe = [(n, F.coalesce(c, F.lit(False))) for n, c in rules]
    bad = reduce(lambda a, b: a | b, (c for _, c in safe))
    reasons = F.concat_ws(
        ",", F.array_compact(F.array(*[F.when(c, F.lit(n)) for n, c in safe]))
    )
    return (
        df.filter(~bad),
        df.filter(bad).withColumn("dlq_reasons", reasons),
    )


def write_dead_letters(
    quarantined: DataFrame, dlq_dir: str, epoch_id: int
) -> int:
    """Land the quarantined side under ``<dlq_dir>/epoch=<id>`` and
    return the row count. Count-first: the expected case is a clean
    epoch, which pays one envelope-pruned count aggregation and nothing
    else — no write job, no output committer, and no directory on ANY
    filesystem scheme (an all-empty ``epoch=*`` glob would break schema
    inference on object stores, where empty dirs can't be cleaned up
    reliably). A dirty epoch pays a second scan for the write; directory
    overwrite keeps a replayed epoch idempotent."""
    n = quarantined.count()
    if n:
        quarantined.write.mode("overwrite").parquet(
            f"{dlq_dir}/epoch={epoch_id}"
        )
    return n


def read_dead_letters(spark, dlq_dir: str) -> DataFrame:
    """All quarantined events across epochs; ``epoch`` recovered from
    the partition directory. Raises ValueError (with a clear message)
    on every filesystem scheme if no epoch has quarantined anything —
    check lineage's ``quarantined`` counts first."""
    import glob
    import os
    from urllib.parse import urlparse

    p = urlparse(dlq_dir)
    if p.scheme in ("", "file") and not glob.glob(
        os.path.join(p.path or dlq_dir, "epoch=*")
    ):
        raise ValueError(f"no dead letters recorded under {dlq_dir}")
    try:
        return spark.read.option("basePath", dlq_dir).parquet(
            f"{dlq_dir}/epoch=*"
        )
    except Exception as e:  # non-local scheme: no cheap existence probe
        if "PATH_NOT_FOUND" in str(e) or "unable to infer" in str(e).lower():
            raise ValueError(
                f"no dead letters recorded under {dlq_dir}"
            ) from e
        raise
