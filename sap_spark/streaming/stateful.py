"""Custom stateful streaming operators (applyInPandasWithState).

Cross-batch exactly-once needs more than per-batch dedup when a transport
can re-deliver events across micro-batch boundaries and the sink is not
version-gated. ``seen_seq_filter`` keeps per-key high-watermark state
(max applied event_seq) inside the streaming state store, emitting only
events strictly above it — a stateful idempotence guard usable in front of
any append-only sink.

(The LakeTable sink doesn't need this — its per-row _event_seq gate is
stronger — but append-only sinks like Kafka/console/files do.)
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T


def seen_seq_filter(
    events: DataFrame,
    key_columns: list[str],
    seq_column: str = "event_seq",
) -> DataFrame:
    """Drop events at-or-below each key's applied high watermark.

    State per key: one long (max seq seen). Output schema == input schema.
    Works on streaming DataFrames (state store backed, checkpointed) — the
    state survives restarts with the query checkpoint.
    """
    out_schema = events.schema
    state_schema = T.StructType([T.StructField("max_seq", T.LongType())])
    cols = list(out_schema.fieldNames())

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        max_seen = state.get[0] if state.exists else -1
        for pdf in pdfs:
            fresh = pdf[pdf[seq_column] > max_seen]
            if len(fresh):
                max_seen = max(max_seen, int(fresh[seq_column].max()))
                yield fresh[cols]
        state.update((max_seen,))

    return events.groupBy(*key_columns).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
