"""FIXTURES.md §4: a change log whose later delta tokens introduce a new
nullable column (license) and a widened column (size int→long), flowing
through the streaming pipeline with a source-schema restart — the
SAP-metadata-driven evolution path of the north_star.

Streaming reality check: a running file-source query has a fixed schema;
new source columns arrive via a *pipeline restart with the re-inferred
schema* (exactly how the reference behaves: schema re-inference happens at
pipeline (re)deploy, SapODataSource.configurePipeline). The checkpoint
survives the restart; the evolution gate ALTERs the table before the first
merge of the new-schema batch; pre-evolution rows read back with nulls.
"""

import pyspark.sql.functions as F
from pyspark.sql import types as T

from sap_spark.config import EngineConfig
from sap_spark.plans.lake import LakeTable
from sap_spark.streaming.pipeline import CdcPipeline

CFG = EngineConfig(payload_columns=("size",)).validate()

V1 = T.StructType(
    [
        T.StructField("delta_token", T.StringType(), False),
        T.StructField("event_seq", T.LongType(), False),
        T.StructField("op", T.StringType(), False),
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("size", T.IntegerType(), True),
    ]
)
V2 = T.StructType(
    [
        T.StructField("delta_token", T.StringType(), False),
        T.StructField("event_seq", T.LongType(), False),
        T.StructField("op", T.StringType(), False),
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("size", T.LongType(), True),       # widened
        T.StructField("license", T.StringType(), True),  # added
    ]
)

TABLE_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("size", T.IntegerType(), True),
    ]
)


def _run(spark, schema, log_dir, ck, table):
    pipe = CdcPipeline(
        spark, CFG, table, log_dir, checkpoint_dir=ck, pipeline_id="evo"
    )
    # narrow the source schema to this phase's schema
    import sap_spark.sources.changelog as cl

    orig = cl.CHANGE_EVENT_SCHEMA
    cl.CHANGE_EVENT_SCHEMA = schema
    try:
        pipe.run_available_now(timeout_sec=300)
    finally:
        cl.CHANGE_EVENT_SCHEMA = orig
    return LakeTable(spark, table.path)


def test_mid_stream_schema_evolution(spark, tmpdir_path):
    log_dir = f"{tmpdir_path}/log"
    ck = f"{tmpdir_path}/ck"

    v1_rows = [("D0000000", 1, "I", "r1", "a.py", 100), ("D0000000", 2, "I", "r1", "b.py", 200)]
    spark.createDataFrame(v1_rows, V1).repartition("delta_token").write.partitionBy(
        "delta_token"
    ).mode("overwrite").parquet(log_dir)

    table = LakeTable.create(
        spark, f"{tmpdir_path}/t", TABLE_SCHEMA, ["repo", "path"], 2
    )
    table = _run(spark, V1, log_dir, ck, table)
    assert [f.name for f in table.schema.fields] == ["repo", "path", "size"]
    assert table.schema["size"].dataType == T.IntegerType()

    # later delta token introduces license + widened size; restart pipeline
    # with the re-inferred (v2) schema against the SAME checkpoint
    v2_rows = [
        ("D0000001", 3, "I", "r1", "c.py", 2**40, "MIT"),
        ("D0000001", 4, "U", "r1", "a.py", 150, "Apache-2.0"),
    ]
    spark.createDataFrame(v2_rows, V2).repartition("delta_token").write.partitionBy(
        "delta_token"
    ).mode("append").parquet(log_dir)

    table = _run(spark, V2, log_dir, ck, table)

    # gate applied: add + widen, as one metadata commit before the merge
    assert [f.name for f in table.schema.fields] == ["repo", "path", "size", "license"]
    assert table.schema["size"].dataType == T.LongType()

    got = {(r["repo"], r["path"]): r for r in table.read().collect()}
    assert got[("r1", "b.py")]["license"] is None          # pre-evolution row
    assert got[("r1", "b.py")]["size"] == 200              # upcast int→long
    assert got[("r1", "c.py")]["size"] == 2**40            # needs long
    assert got[("r1", "a.py")]["license"] == "Apache-2.0"  # updated in v2
    assert got[("r1", "a.py")]["size"] == 150

    # incompatible drift is rejected (narrowing size back to int via bool)
    from sap_spark.schema.compat import SchemaCompatError
    import pytest

    bad = spark.createDataFrame(
        [("r1", "x.py", 9, "I", True)],
        "repo string, path string, event_seq long, op string, size boolean",
    )
    with pytest.raises(SchemaCompatError):
        table.merge_cdc(bad, "bad-batch")