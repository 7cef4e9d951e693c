"""Operators: CDC dedup/fold, merge planning, and training-data-pipeline
operators (exact/near dedup, similarity search)."""

from sap_spark.operators.dedup import (
    drop_cancelled,
    lww_window,
    lww_agg,
    fold_changes,
    replay,
)

__all__ = ["drop_cancelled", "lww_window", "lww_agg", "fold_changes", "replay"]
