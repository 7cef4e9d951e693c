"""Sequence packing: assign documents to ~max_tokens context bins.

A training-data pipeline ends by packing tokenized documents into
fixed-size context windows. The exactly-first-fit formulation is
inherently sequential (each bin's remaining capacity depends on every
prior decision), so the distributed-standard variant used here is
**greedy offset chunking**: documents in a chosen order accumulate token
counts, and a document's bin is the bin its *starting offset* falls in
(``floor((cumsum - own_tokens) / max_tokens)``). Bins can overflow by at
most one document — the standard streaming-packing tradeoff — and
documents longer than ``max_tokens`` span bins by construction (their
followers start a later bin).

Scale shape: with ``partition_cols`` (e.g. a hash shard), packing runs
independently per partition — one window per shard, embarrassingly
parallel, bin ids unique per (shard, bin). Without it, the single
global-order window is one partition: fine for a corpus that fits one
executor's sort, wrong at 100 TB — shard first.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    docs: DataFrame,
    token_col: str,
    max_tokens: int,
    order_cols: list[str],
    partition_cols: list[str] | None = None,
    pack_col: str = "pack_id",
    offset_col: str = "pack_offset",
) -> DataFrame:
    """Add ``pack_col`` (bin id, 0-based per partition) and ``offset_col``
    (the document's token offset within the packing stream) to ``docs``.

    ``order_cols`` must order documents uniquely within a partition —
    nondeterministic order would make bin assignment nondeterministic.
    """
    if max_tokens <= 0:
        raise ValueError("max_tokens must be positive")
    parts: list[Column] = (
        [F.col(c) for c in partition_cols] if partition_cols else [F.lit(0)]
    )
    w = (
        Window.partitionBy(*parts)
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = (F.sum(F.col(token_col)).over(w) - F.col(token_col)).cast("long")
    return docs.withColumn(offset_col, start).withColumn(
        pack_col, F.floor(F.col(offset_col) / F.lit(max_tokens)).cast("long")
    )
