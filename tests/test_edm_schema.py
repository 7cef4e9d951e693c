"""EDM type registry + schema inference + compat rules (reference parity:
SapODataSource.convertPropertyType l.146-213, SapODataConfig l.179-298)."""

import pytest
from pyspark.sql import types as T

from sap_spark.config import ConfigError, EngineConfig
from sap_spark.schema.compat import (
    SchemaCompatError,
    apply_cast_plan,
    plan_evolution,
    validate_fields_match,
    validate_schema_types,
)
from sap_spark.schema.edm import (
    EntityType,
    PropertyMetadata,
    UnsupportedTypeError,
    edm_to_spark_type,
    infer_schema,
)
from sap_spark.sources.changelog import ODataQueryOptions


def test_edm_mapping_table():
    """The §1.2 mapping, including the deliberate quirks."""
    cases = {
        "Edm.Binary": T.BinaryType(),
        "Edm.Boolean": T.BooleanType(),
        "Edm.Byte": T.IntegerType(),
        "Edm.SByte": T.IntegerType(),
        "Edm.Int16": T.IntegerType(),
        "Edm.Int32": T.IntegerType(),
        "Edm.Int64": T.LongType(),
        "Edm.Single": T.FloatType(),
        "Edm.Double": T.DoubleType(),
        "Edm.String": T.StringType(),
        "Edm.Guid": T.StringType(),
        "Edm.DateTime": T.TimestampType(),
        "Edm.Date": T.TimestampType(),       # NOT DateType (l.200-201)
        "Edm.DateTimeOffset": T.StringType(),  # offset preserved (l.158-160)
        "Edm.Time": T.LongType(),             # micros-of-day
        "Edm.TimeOfDay": T.LongType(),
        "Edm.Duration": T.StringType(),
    }
    for edm, expected in cases.items():
        assert edm_to_spark_type(edm) == expected, edm
    assert edm_to_spark_type("Edm.Decimal", 16, 3) == T.DecimalType(16, 3)
    point = edm_to_spark_type("Edm.GeographyPoint")
    assert [f.name for f in point.fields] == ["dimension", "x", "y", "z"]
    stream = edm_to_spark_type("Edm.Stream")
    assert [f.name for f in stream.fields] == [
        "mediaEtag", "mediaContentType", "mediaReadLink", "mediaEditLink"
    ]
    poly = edm_to_spark_type("Edm.GeometryPolygon")
    assert "numberOfInteriorRings" in [f.name for f in poly.fields]
    with pytest.raises(UnsupportedTypeError):
        edm_to_spark_type("Edm.Unknown")


def test_infer_schema_select_pruning():
    ent = EntityType(
        "E",
        [
            PropertyMetadata("a", "Edm.Int32", nullable=False),
            PropertyMetadata("b", "Edm.String"),
            PropertyMetadata("c", "Edm.Double"),
        ],
    )
    full = infer_schema(ent)
    assert [f.name for f in full.fields] == ["a", "b", "c"]
    assert not full["a"].nullable
    pruned = infer_schema(ent, select=["c", "a"])
    assert [f.name for f in pruned.fields] == ["c", "a"]
    with pytest.raises(UnsupportedTypeError, match="nope"):
        infer_schema(ent, select=["nope"])


def test_query_options_parse():
    """$select parsing at start/middle/end + leading-? strip
    (SapODataConfigTest l.66-291 behaviors)."""
    q = ODataQueryOptions.parse("??$select=a,b&$filter=x gt 1&$top=5&$skip=2")
    assert q.select == ["a", "b"] and q.top == 5 and q.skip == 2
    assert q.filter == "x gt 1"
    q2 = ODataQueryOptions.parse("$top=10&$select=z&$orderby=y desc, x")
    assert q2.select == ["z"]
    assert q2.orderby == [("y", "desc"), ("x", "asc")]
    assert ODataQueryOptions.parse(None).select is None
    assert ODataQueryOptions.parse("").top is None


def test_engine_config_validation():
    EngineConfig().validate()
    with pytest.raises(ConfigError, match="reference name"):
        EngineConfig(reference_name="bad name!").validate()
    with pytest.raises(ConfigError, match="key_columns"):
        EngineConfig(key_columns=()).validate()
    with pytest.raises(ConfigError, match="order_column"):
        EngineConfig(key_columns=("a",), order_column="a").validate()


def test_schema_type_allowlist():
    ok = T.StructType(
        [
            T.StructField("a", T.IntegerType()),
            T.StructField("b", T.ArrayType(T.StringType())),
            T.StructField(
                "c", T.StructType([T.StructField("d", T.DecimalType(10, 2))])
            ),
        ]
    )
    validate_schema_types(ok)
    with pytest.raises(SchemaCompatError, match="c.d"):
        validate_schema_types(
            T.StructType(
                [
                    T.StructField(
                        "c",
                        T.StructType(
                            [T.StructField("d", T.MapType(T.StringType(), T.StringType()))]
                        ),
                    )
                ]
            )
        )


def test_validate_fields_match_reference_rules():
    inferred = T.StructType(
        [
            T.StructField("a", T.IntegerType(), False),
            T.StructField("b", T.StringType(), True),
        ]
    )
    # rule 1: must exist
    with pytest.raises(SchemaCompatError, match="absent"):
        validate_fields_match(
            inferred, T.StructType([T.StructField("z", T.StringType())])
        )
    # rule 2: types must match (strict mode)
    with pytest.raises(SchemaCompatError, match="type"):
        validate_fields_match(
            inferred, T.StructType([T.StructField("a", T.LongType())])
        )
    # ...unless widening is allowed (engine mode)
    validate_fields_match(
        inferred,
        T.StructType([T.StructField("a", T.LongType(), False)]),
        allow_widening=True,
    )
    # rule 3: must not relax non-null to nullable
    with pytest.raises(SchemaCompatError, match="nullable"):
        validate_fields_match(
            inferred, T.StructType([T.StructField("a", T.IntegerType(), True)])
        )


def test_plan_evolution():
    cur = T.StructType(
        [
            T.StructField("k", T.StringType(), False),
            T.StructField("size", T.IntegerType(), True),
        ]
    )
    inc = T.StructType(
        [
            T.StructField("k", T.StringType(), False),
            T.StructField("size", T.LongType(), True),
            T.StructField("license", T.StringType(), True),
        ]
    )
    plan = plan_evolution(cur, inc)
    assert [f.name for f in plan.add_columns] == ["license"]
    assert plan.widen_columns == [("size", T.LongType())]
    evolved = plan.apply_to(cur)
    assert evolved["size"].dataType == T.LongType()
    assert evolved["license"].nullable
    # narrowing rejected
    with pytest.raises(SchemaCompatError):
        plan_evolution(
            T.StructType([T.StructField("x", T.LongType())]),
            T.StructType([T.StructField("x", T.BooleanType())]),
        )
    # incoming narrower than current: no DDL, handled by read-time cast
    assert plan_evolution(
        T.StructType([T.StructField("x", T.LongType())]),
        T.StructType([T.StructField("x", T.IntegerType())]),
    ).is_noop


def test_apply_cast_plan(spark):
    df = spark.createDataFrame([(1, "a")], "x int, y string")
    target = T.StructType(
        [
            T.StructField("x", T.LongType()),
            T.StructField("y", T.StringType()),
            T.StructField("z", T.DoubleType()),
        ]
    )
    out = apply_cast_plan(df, target)
    assert out.schema == target or [f.dataType for f in out.schema.fields] == [
        T.LongType(), T.StringType(), T.DoubleType()
    ]
    row = out.collect()[0]
    assert row["x"] == 1 and row["z"] is None


def test_parse_schema_and_preflight(spark, sf_dir):
    from sap_spark.sources.changelog import parse_schema, preflight

    s = parse_schema("a int, b string")
    assert s.simpleString() == "struct<a:int,b:string>"
    assert parse_schema(s.json()) == s
    with pytest.raises(SchemaCompatError):
        parse_schema("a map<string,string>")  # allow-list rejects map
    with pytest.raises(ValueError, match="Unable to parse output schema"):
        parse_schema("not a schema{{{")
    ok = preflight(spark, f"{sf_dir}/events.parquet")
    assert not ok["ok"] and "missing change-log columns" in ok["errors"][0]
    assert preflight(spark, "/nonexistent")["errors"]
