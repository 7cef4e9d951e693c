"""Change-log source: batch + streaming readers, and the OData-style
query-option pushdown surface.

The reference's entire relational algebra is forwarding OData query options
($select/$filter/$top/$skip/$orderby) to the server (SURVEY.md §2.2;
reference: SapODataConfig.java:117-155, odata/ODataClient.java:80-90).
Here the "server" is Catalyst: the same options become DataFrame operations,
and Catalyst pushes filters/projections into the parquet scan (visible as
PushedFilters / ReadSchema in `.explain("formatted")`), so pushdown is
preserved — but now distributed over N splits instead of the reference's
single NoOpSplit (ODataEntityInputFormat.java:33-36).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from urllib.parse import parse_qsl

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sap_spark.sources.odata_filter import ODataFilterError, parse_odata_filter

# Change-event envelope schema (FIXTURES.md §2).
CHANGE_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("delta_token", T.StringType(), False),
        T.StructField("event_seq", T.LongType(), False),
        T.StructField("op", T.StringType(), False),
        T.StructField("rocancel", T.BooleanType(), False),
        T.StructField("cancel_seq", T.LongType(), True),
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("commit", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("content", T.StringType(), True),
    ]
)


def _split_orderby(value: str) -> list[str]:
    """Split an $orderby list on commas NOT inside parentheses or string
    literals, so multi-argument sort expressions (`substring(name, 2)
    desc`) stay whole."""
    from sap_spark.sources.odata_filter import _split_top_level

    return _split_top_level(value, ",")


@dataclass
class ODataQueryOptions:
    """Parsed OData-style query options.

    Mirrors the reference's pass-through surface (SapODataConfig.getQuery,
    SapODataConfig.java:117-134: leading '?'s stripped; $select list parsed
    out at :136-155). $filter accepts the OData expression language the
    reference's server consumes (`BuyerName eq 'TECUM'`,
    odata/ODataClient.java:58; docs/SapEcc-batchsource.md:30-33) —
    translated to Catalyst by sources/odata_filter.py — and falls back to
    Spark SQL expression syntax when the string is not valid OData (so
    both a ported OData query and a native Spark predicate work).
    """

    select: list[str] | None = None
    filter: str | None = None
    top: int | None = None
    skip: int | None = None
    orderby: list[tuple[str, str]] | None = None  # (column, 'asc'|'desc')
    apply: str | None = None  # OData $apply aggregation pipeline

    @classmethod
    def parse(cls, query: str | None) -> "ODataQueryOptions":
        if not query:
            return cls()
        query = query.lstrip("?")  # reference strips leading '?'s
        opts = cls()
        for key, value in parse_qsl(query, keep_blank_values=False):
            key = key.strip()
            if key == "$select":
                opts.select = [c.strip() for c in value.split(",") if c.strip()]
            elif key == "$filter":
                opts.filter = value
            elif key == "$top":
                opts.top = int(value)
            elif key == "$skip":
                opts.skip = int(value)
            elif key == "$orderby":
                parsed = []
                for part in _split_orderby(value):
                    part = part.strip()
                    if not part:
                        continue
                    direction = "asc"
                    m = re.search(r"\s+(asc|desc)\s*$", part, re.IGNORECASE)
                    if m:
                        direction = m.group(1).lower()
                        part = part[: m.start()].rstrip()
                    parsed.append((part, direction))
                opts.orderby = parsed or None
            elif key == "$apply":
                opts.apply = value
            elif key == "$format":
                pass  # response-encoding choice; irrelevant for parquet
        return opts


def apply_query_options(df: DataFrame, opts: ODataQueryOptions) -> DataFrame:
    """Apply OData-style options as DataFrame ops (Catalyst pushes them down).

    Order matches OData evaluation semantics: apply → filter → orderby →
    skip → top → select ($apply is the aggregation-extension pipeline,
    evaluated before the system query options per the spec).
    """
    if opts.apply:
        from sap_spark.sources.odata_filter import parse_odata_apply

        df = parse_odata_apply(opts.apply)(df)
    if opts.filter:
        try:
            cond = parse_odata_filter(opts.filter)
        except ODataFilterError as odata_err:
            # not OData grammar — treat as a native Spark SQL predicate.
            # If Spark can't parse it either (a typo'd OData expression,
            # e.g. a misspelled function name), surface BOTH diagnostics:
            # the Spark parse error alone is deeply confusing for a user
            # who wrote OData.
            try:
                df = df.filter(opts.filter)
            except Exception as spark_err:
                raise ODataFilterError(
                    f"$filter {opts.filter!r} is neither valid OData "
                    f"({odata_err}) nor valid Spark SQL ({spark_err})"
                ) from spark_err
        else:
            df = df.filter(cond)
    if opts.orderby:
        def sort_key(expr: str):
            # plain column fast-path; otherwise an OData expression
            # (`length(name)`, `value mul -1`, …), same grammar as $filter
            if expr in df.columns:
                return F.col(expr)
            try:
                return parse_odata_filter(expr)
            except ODataFilterError:
                return F.col(expr)

        df = df.orderBy(
            *[
                sort_key(c).desc() if d == "desc" else sort_key(c).asc()
                for c, d in opts.orderby
            ]
        )
    if opts.skip:
        df = df.offset(opts.skip)
    if opts.top is not None:
        df = df.limit(opts.top)
    if opts.select:
        missing = [c for c in opts.select if c not in df.columns]
        if missing:
            # reference behavior: selected columns must exist in the schema
            raise ValueError(f"$select references unknown columns: {missing}")
        df = df.select(*opts.select)
    return df


def read_changelog(
    spark: SparkSession, path: str, query: str | None = None
) -> DataFrame:
    """Batch read of a change-event log with optional OData-style query."""
    df = spark.read.schema(CHANGE_EVENT_SCHEMA).parquet(path)
    return apply_query_options(df, ODataQueryOptions.parse(query))


def parse_schema(schema_str: str) -> T.StructType:
    """User-provided schema parse (C2, SapODataConfig.getParsedSchema,
    SapODataConfig.java:179-186): accepts a StructType JSON document or a
    DDL string; validates against the engine's allowed-type set."""
    from sap_spark.schema.compat import validate_schema_types

    try:
        if schema_str.lstrip().startswith("{"):
            import json

            schema = T.StructType.fromJson(json.loads(schema_str))
        else:
            parsed = T._parse_datatype_string(schema_str)
            if not isinstance(parsed, T.StructType):
                raise ValueError("DDL must describe a struct")
            schema = parsed
    except Exception as e:  # noqa: BLE001
        # reference message: "Unable to parse output schema"
        raise ValueError(f"Unable to parse output schema: {e}") from e
    validate_schema_types(schema)
    return schema


def preflight(spark: SparkSession, path: str) -> dict:
    """Connection-validation probe (S8, SapODataSource.java:66-74,91-99):
    can the source be reached and does it look like a change log? Runs a
    metadata-only check (schema + file listing via limit(0)) — no data
    scan — and returns what a FailureCollector would report."""
    import os

    result = {"path": path, "ok": False, "errors": [], "columns": []}
    if not os.path.exists(path):
        result["errors"].append(f"source path does not exist: {path}")
        return result
    try:
        probe = spark.read.parquet(path).limit(0)
        result["columns"] = probe.columns
        missing = [
            c for c in ("delta_token", "event_seq", "op") if c not in probe.columns
        ]
        if missing:
            result["errors"].append(f"missing change-log columns: {missing}")
        else:
            result["ok"] = True
    except Exception as e:  # noqa: BLE001
        result["errors"].append(str(e))
    return result


def read_changelog_stream(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int | None = None,
    schema: T.StructType | None = None,
) -> DataFrame:
    """Streaming read of a change-event log directory.

    Server paging in the reference (V4 @odata.nextLink,
    OData4Client.java:64-73) maps to micro-batching here: each trigger
    consumes a bounded set of files; a delta_token-partitioned log yields
    ~token-aligned batches. The checkpoint (offset log) IS the delta token:
    a resumable, monotone position in the change stream.

    ``schema`` overrides the change-event envelope for alternative staged
    layouts (e.g. OData delta-response pages, streaming/pipeline
    ``odata_delta_pipeline``).
    """
    reader = spark.readStream.schema(schema or CHANGE_EVENT_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(path)
