"""Extended geospatial decode: MultiLineString, MultiPolygon,
GeometryCollection (T18/T19) + V4 collection properties (T21)."""

import pytest
from pyspark.sql import functions as F

from sap_spark.functions.decode import (
    UnexpectedFormatError,
    decode_collection,
    decode_entity,
    decode_geo_collection,
    decode_geo_multilinestring,
    decode_geo_multipolygon,
)
from sap_spark.schema.edm import EntityType, PropertyMetadata, edm_to_spark_type


def one(spark, value, expr):
    df = spark.createDataFrame([(value,)], "raw string")
    return df.select(expr.alias("out")).collect()[0]["out"]


MLS = (
    '{"type":"MultiLineString","coordinates":'
    "[[[1.0,2.0],[3.0,4.0]],[[5.0,6.0],[7.0,8.0]]]}"
)
MPOLY = (
    '{"type":"MultiPolygon","coordinates":'
    "[[[[0.0,0.0],[4.0,0.0],[4.0,4.0],[0.0,0.0]]],"
    "[[[10.0,10.0],[14.0,10.0],[14.0,14.0],[10.0,10.0]],"
    "[[11.0,11.0],[12.0,11.0],[12.0,12.0],[11.0,11.0]]]]}"
)
COLLECTION = (
    '{"type":"GeometryCollection","geometries":['
    '{"type":"Point","coordinates":[1.0,2.0,3.0]},'
    '{"type":"LineString","coordinates":[[1.0,2.0],[3.0,4.0]]},'
    '{"type":"Polygon","coordinates":[[[0.0,0.0],[1.0,0.0],[1.0,1.0],[0.0,0.0]]]},'
    '{"type":"MultiPoint","coordinates":[[9.0,9.0]]},'
    '{"type":"MultiLineString","coordinates":[[[1.0,1.0],[2.0,2.0]]]},'
    '{"type":"MultiPolygon","coordinates":[[[[5.0,5.0],[6.0,5.0],[6.0,6.0],[5.0,5.0]]]]}'
    "]}"
)


def test_multilinestring(spark):
    v = one(spark, MLS, decode_geo_multilinestring("g", F.col("raw"), "GEOMETRY"))
    assert v["type"] == "MultiLineString"
    assert len(v["coordinates"]) == 2
    assert v["coordinates"][1]["coordinates"][0]["x"] == 5.0


def test_multipolygon(spark):
    v = one(spark, MPOLY, decode_geo_multipolygon("g", F.col("raw"), "GEOGRAPHY"))
    assert v["type"] == "MultiPolygon"
    assert len(v["coordinates"]) == 2
    assert v["coordinates"][0]["numberOfInteriorRings"] == 0
    assert v["coordinates"][1]["numberOfInteriorRings"] == 1
    assert v["coordinates"][1]["interior"][0]["coordinates"][0]["x"] == 11.0


def test_geometry_collection_partitioned_into_typed_arrays(spark):
    v = one(spark, COLLECTION, decode_geo_collection("g", F.col("raw"), "GEOMETRY"))
    assert v["type"] == "GeometryCollection"
    assert len(v["points"]) == 1 and v["points"][0]["z"] == 3.0
    assert len(v["lineStrings"]) == 1
    assert v["lineStrings"][0]["coordinates"][1]["y"] == 4.0
    assert len(v["polygons"]) == 1 and v["polygons"][0]["numberOfInteriorRings"] == 0
    assert len(v["multiPoints"]) == 1 and v["multiPoints"][0]["type"] == "MultiPoint"
    assert len(v["multiLineStrings"]) == 1
    assert len(v["multiPolygons"]) == 1
    assert v["multiPolygons"][0]["coordinates"][0]["exterior"][0]["x"] == 5.0


def test_geo_collection_schema_matches_edm_registry(spark):
    """decode output struct == the registry's Edm.GeometryCollection type."""
    df = spark.createDataFrame([(COLLECTION,)], "raw string")
    out = df.select(decode_geo_collection("g", F.col("raw")).alias("g"))
    # simpleString ignores nullability: decode literals are non-null while
    # the registry declares everything nullable — shape must match exactly
    assert (
        out.schema["g"].dataType.simpleString()
        == edm_to_spark_type("Edm.GeometryCollection").simpleString()
    )


def test_entity_decode_with_geo_and_collection(spark):
    entity = EntityType(
        "E",
        [
            PropertyMetadata("id", "Edm.String"),
            PropertyMetadata("shape", "Edm.GeometryMultiPolygon"),
            PropertyMetadata("all", "Edm.GeographyCollection"),
        ],
    )
    raw = spark.createDataFrame([("a", MPOLY, COLLECTION)], "id string, shape string, all string")
    row = decode_entity(raw, entity).collect()[0]
    assert row["shape"]["type"] == "MultiPolygon"
    assert row["all"]["dimension"] == "GEOGRAPHY"


def test_v4_collection_property(spark):
    df = spark.createDataFrame([('["a","b"]', "[1,2,3]")], "s string, i string")
    out = df.select(
        decode_collection("s", F.col("s"), "Edm.String").alias("s"),
        decode_collection("i", F.col("i"), "Edm.Int64").alias("i"),
    ).collect()[0]
    assert out["s"] == ["a", "b"] and out["i"] == [1, 2, 3]
    # complex element types rejected (ODataEntity.java:100-102 parity)
    with pytest.raises(UnexpectedFormatError, match="not supported"):
        decode_collection("c", F.col("s"), "Edm.ComplexThing")
