"""sap_spark — a PySpark-native CDC / incremental-ingest analytics engine.

A brand-new engine (not a port) reproducing the query and data-processing
capabilities of the reference CDAP "SAP plugins" repo (an OData V2/V4 batch
source: schema inference, EDM type mapping, query-option pushdown, per-field
decode/validation, schema-compat rules — see SURVEY.md) re-expressed
Spark-first, and extended into a CDC engine: ordered change-event log →
key-partitioned, deduplicated, exactly-once MERGE upserts into lake tables
of source-code repositories.

Layout
------
- ``sap_spark.schema``     EDM-style type registry + schema compat/evolution rules
- ``sap_spark.functions``  decode kernels (vectorized), text analysis, similarity
- ``sap_spark.operators``  CDC dedup (LWW + ROCANCEL fold, salted), merge planning,
                           dedup/similarity operators for training-data pipelines
- ``sap_spark.sources``    change-log readers (batch + streaming), query-option
                           pushdown surface, deterministic data generators
- ``sap_spark.plans``      LakeTable: bucketed, snapshot-isolated parquet table
                           format with atomic commits, commit markers, evolution
- ``sap_spark.streaming``  Structured Streaming CDC pipeline (foreachBatch,
                           checkpoint resume, metrics)
"""

from sap_spark.config import get_spark, EngineConfig

__version__ = "0.1.0"

__all__ = ["get_spark", "EngineConfig", "__version__"]
