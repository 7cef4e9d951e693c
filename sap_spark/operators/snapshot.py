"""Snapshot-diff CDC: derive a change log from two table snapshots.

SLT/ODP-style sources emit a change log; plain tables don't. The
bootstrap (and the fallback when a source can only be polled) is
snapshot diffing: given yesterday's and today's images of a keyed table,
emit the I/U/D events that transform one into the other. The result
feeds the same fold/MERGE machinery as a real log (operators/dedup,
plans/lake), so a polling source and a log source share one pipeline.

Shape: ONE full-outer shuffle join on the key — no window, no collect.
On bucketed/co-partitioned inputs Catalyst elides the exchange; AQE
handles skew. Change detection is a single null-safe struct comparison
(JVM-side), so wide payloads don't multiply the expression count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_columns: list[str],
    compare_columns: list[str] | None = None,
    op_col: str = "op",
) -> DataFrame:
    """Rows that differ between ``old`` and ``new``:

    - key only in ``new``  → op 'I' with the new payload;
    - key only in ``old``  → op 'D' with the old key (payload nulls);
    - key in both with any ``compare_columns`` difference (null-safe)
      → op 'U' with the new payload;
    - identical rows are dropped.

    ``compare_columns`` defaults to every non-key column of ``new``.
    Output schema: key columns, compare columns, ``op_col``.
    """
    compare_columns = compare_columns or [
        c for c in new.columns if c not in key_columns
    ]
    for side, frame in (("old", old), ("new", new)):
        missing = [
            c for c in key_columns + compare_columns if c not in frame.columns
        ]
        if missing:
            raise ValueError(f"columns absent from {side} snapshot: {missing}")

    o = old.select(
        *key_columns, *compare_columns, F.lit(True).alias("__in_old")
    ).alias("o")
    n = new.select(
        *key_columns, *compare_columns, F.lit(True).alias("__in_new")
    ).alias("n")
    joined = o.join(n, on=key_columns, how="full_outer")

    in_old = F.col("o.__in_old").isNotNull()
    in_new = F.col("n.__in_new").isNotNull()
    o_payload = F.struct(*[F.col(f"o.{c}") for c in compare_columns])
    n_payload = F.struct(*[F.col(f"n.{c}") for c in compare_columns])
    changed = ~o_payload.eqNullSafe(n_payload)

    op = (
        F.when(~in_old, F.lit("I"))
        .when(~in_new, F.lit("D"))
        .when(changed, F.lit("U"))
    )
    return (
        joined.select(
            *key_columns,
            *[
                F.when(in_new, F.col(f"n.{c}")).otherwise(F.lit(None)).alias(c)
                for c in compare_columns
            ],
            op.alias(op_col),
        )
        .where(F.col(op_col).isNotNull())
    )
