"""Golden-value tests per decode kernel — the pytest analog of the
reference's ODataEntryToRecordTransformerTest (732 LoC of per-field
equality asserts over an AllDataTypes entity; SURVEY.md §5)."""

import datetime
from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from sap_spark.functions.decode import (
    build_stream_property,
    decode_entity,
    decode_geo_linestring,
    decode_geo_point,
    decode_geo_polygon,
    make_decimal_decoder,
)
from sap_spark.schema.edm import EntityType, PropertyMetadata


def one(spark, value, expr):
    df = spark.createDataFrame([(value,)], "raw string")
    return df.select(expr.alias("out")).collect()[0]["out"]


# -- simple types (reference testTransformOData2Types, l.66-157) --------------


def test_simple_types_golden(spark):
    entity = EntityType(
        "AllDataTypes",
        [
            PropertyMetadata("b", "Edm.Boolean"),
            PropertyMetadata("byte_v", "Edm.Byte"),
            PropertyMetadata("i16", "Edm.Int16"),
            PropertyMetadata("i32", "Edm.Int32"),
            PropertyMetadata("i64", "Edm.Int64"),
            PropertyMetadata("f32", "Edm.Single"),
            PropertyMetadata("f64", "Edm.Double"),
            PropertyMetadata("s", "Edm.String"),
            PropertyMetadata("guid", "Edm.Guid"),
            PropertyMetadata("bin", "Edm.Binary"),
            PropertyMetadata("dt", "Edm.DateTime"),
            PropertyMetadata("nullable_str", "Edm.String"),
        ],
    )
    raw = spark.createDataFrame(
        [
            (
                "true", "127", "-32768", "2147483647", "9223372036854775807",
                "3.5", "2.25", "hello", "6f9619ff-8b86-d011-b42d-00c04fc964ff",
                "aGVsbG8=", "2019-08-29 14:52:08.155", None,
            )
        ],
        "b string, byte_v string, i16 string, i32 string, i64 string, "
        "f32 string, f64 string, s string, guid string, bin string, "
        "dt string, nullable_str string",
    )
    row = decode_entity(raw, entity).collect()[0]
    assert row["b"] is True
    assert row["byte_v"] == 127 and row["i16"] == -32768
    assert row["i32"] == 2147483647
    assert row["i64"] == 9223372036854775807
    assert row["f32"] == 3.5 and row["f64"] == 2.25
    assert row["s"] == "hello"
    assert row["guid"] == "6f9619ff-8b86-d011-b42d-00c04fc964ff"
    assert bytes(row["bin"]) == b"hello"
    assert row["dt"] == datetime.datetime(2019, 8, 29, 14, 52, 8, 155000)
    assert row["nullable_str"] is None  # T1 null propagation (l.93-95)
    # output schema types match the EDM mapping
    got = dict((f.name, f.dataType.simpleString()) for f in decode_entity(raw, entity).schema.fields)
    assert got["byte_v"] == "int" and got["i64"] == "bigint"
    assert got["f32"] == "float" and got["dt"] == "timestamp"


def test_invalid_value_raises_named_error(spark):
    entity = EntityType("E", [PropertyMetadata("i32", "Edm.Int32")])
    raw = spark.createDataFrame([("notanint",)], "i32 string")
    with pytest.raises(Exception, match="Field 'i32' is expected to be of type 'int'"):
        decode_entity(raw, entity).collect()


# -- temporal kernels ----------------------------------------------------------


def test_time_micros(spark):
    entity = EntityType("E", [PropertyMetadata("t", "Edm.TimeOfDay")])
    raw = spark.createDataFrame(
        [("23:59:59.999999",), ("00:00:00",), ("08:30:15.5",)], "t string"
    )
    got = [r["t"] for r in decode_entity(raw, entity).collect()]
    assert got[0] == 86_399_999_999
    assert got[1] == 0
    assert got[2] == (8 * 3600 + 30 * 60 + 15) * 1_000_000 + 500_000


def test_time_invalid_raises(spark):
    entity = EntityType("E", [PropertyMetadata("t", "Edm.Time")])
    raw = spark.createDataFrame([("25:00:00",)], "t string")
    with pytest.raises(Exception, match="time-micros"):
        decode_entity(raw, entity).collect()


def test_datetimeoffset_preserves_offset(spark):
    """Docs golden: 2019-08-29T14:52:08.155+02:00 (SapEcc-batchsource.md:61)."""
    entity = EntityType("E", [PropertyMetadata("o", "Edm.DateTimeOffset")])
    raw = spark.createDataFrame(
        [
            ("2019-08-29T14:52:08.155+02:00",),
            ("2019-08-29T14:52:08Z",),
            ("2019-08-29T14:52:08.500000-05:30",),
            (None,),
        ],
        "o string",
    )
    got = [r["o"] for r in decode_entity(raw, entity).collect()]
    assert got[0] == "2019-08-29T14:52:08.155+02:00"
    assert got[1] == "2019-08-29T14:52:08+00:00"
    assert got[2] == "2019-08-29T14:52:08.5-05:30"  # value-derived precision
    assert got[3] is None


def test_duration_render(spark):
    """Docs golden: P12DT23H59M59.999999999999S (SapEcc-batchsource.md:82)."""
    entity = EntityType("E", [PropertyMetadata("d", "Edm.Duration")])
    raw = spark.createDataFrame(
        [("1123199.999999999999",), ("0",), ("93784.5",), ("86400",)], "d string"
    )
    got = [r["d"] for r in decode_entity(raw, entity).collect()]
    assert got[0] == "P12DT23H59M59.999999999999S"
    assert got[1] == "PT0S"
    assert got[2] == "P1DT2H3M4.5S"
    assert got[3] == "P1D"


# -- decimal kernel (T12, l.370-421) -------------------------------------------


def test_decimal_golden(spark):
    dec = make_decimal_decoder("d", 4, 2)
    df = spark.createDataFrame([("12.34",), ("1",), (None,)], "raw string")
    got = [r["out"] for r in df.select(dec(F.col("raw")).alias("out")).collect()]
    assert got[0] == Decimal("12.34")
    assert got[1] == Decimal("1.00")  # re-scaled to declared scale
    assert got[2] is None


def test_decimal_half_even_rounding_for_float_input(spark):
    dec = make_decimal_decoder("d", 4, 2)
    df = spark.createDataFrame([("12.345",), ("12.355",)], "raw string")
    got = [r["out"] for r in df.select(dec(F.col("raw")).alias("out")).collect()]
    assert got[0] == Decimal("12.34")  # HALF_EVEN down (4 even)
    assert got[1] == Decimal("12.36")  # HALF_EVEN up (5 odd)


def test_decimal_precision_overflow_raises(spark):
    """Overflow must RAISE, not null out (reference l.374-384; Spark's
    default cast would silently null)."""
    dec = make_decimal_decoder("d", 4, 2)
    df = spark.createDataFrame([("123.45",)], "raw string")
    with pytest.raises(Exception, match="precision"):
        df.select(dec(F.col("raw")).alias("out")).collect()


# -- stream property (T13) ------------------------------------------------------


def test_stream_property_struct(spark):
    df = spark.createDataFrame(
        [("W/\"etag\"", "image/png", "http://r", "http://e")],
        "etag string, ct string, rl string, el string",
    )
    row = df.select(
        build_stream_property(
            F.col("etag"), F.col("ct"), F.col("rl"), F.col("el")
        ).alias("sp")
    ).collect()[0]["sp"]
    assert row["mediaEtag"] == 'W/"etag"'
    assert row["mediaContentType"] == "image/png"
    assert row["mediaReadLink"] == "http://r"
    assert row["mediaEditLink"] == "http://e"


# -- geospatial kernels (T15-T17) ------------------------------------------------


def test_geo_point(spark):
    v = one(
        spark,
        '{"type":"Point","coordinates":[100.0,0.5,3.0]}',
        decode_geo_point("g", F.col("raw"), "GEOMETRY"),
    )
    assert v["dimension"] == "GEOMETRY"
    assert (v["x"], v["y"], v["z"]) == (100.0, 0.5, 3.0)


def test_geo_linestring_and_multipoint_share_schema(spark):
    ls = one(
        spark,
        '{"type":"LineString","coordinates":[[1.0,2.0],[3.0,4.0]]}',
        decode_geo_linestring("g", F.col("raw"), "GEOGRAPHY", "LineString"),
    )
    mp = one(
        spark,
        '{"type":"MultiPoint","coordinates":[[1.0,2.0]]}',
        decode_geo_linestring("g", F.col("raw"), "GEOGRAPHY", "MultiPoint"),
    )
    assert ls["type"] == "LineString" and mp["type"] == "MultiPoint"
    assert ls["coordinates"][1]["y"] == 4.0
    assert ls["coordinates"][0]["z"] == 0.0  # 2D point: z defaults to 0


def test_geo_polygon_rings(spark):
    v = one(
        spark,
        '{"type":"Polygon","coordinates":['
        "[[0.0,0.0],[4.0,0.0],[4.0,4.0],[0.0,0.0]],"
        "[[1.0,1.0],[2.0,1.0],[2.0,2.0],[1.0,1.0]]]}",
        decode_geo_polygon("g", F.col("raw"), "GEOMETRY"),
    )
    assert v["type"] == "Polygon"
    assert len(v["exterior"]) == 4
    assert v["numberOfInteriorRings"] == 1
    assert v["interior"][0]["type"] == "LineString"
    assert v["interior"][0]["coordinates"][1]["x"] == 2.0
