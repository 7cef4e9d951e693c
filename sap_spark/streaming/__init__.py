"""Structured Streaming CDC pipeline."""

from sap_spark.streaming.pipeline import CdcPipeline, ingest_batch

__all__ = ["CdcPipeline", "ingest_batch"]
