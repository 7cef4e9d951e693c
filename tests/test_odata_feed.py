"""OData wire-format feed parsing validated against the reference's own
golden fixtures (the analog of SapOData2SourceETLTest /
SapOData4SourceETLTest + ODataEntryToRecordTransformerTest): parse the
byte-identical response documents the reference's WireMock server serves
(/root/reference/src/test/resources/odata{2,4}/AllDataTypes.*), decode
through the typed kernels, and assert golden values per field."""

import base64
import decimal
import os
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from sap_spark.functions.decode import decode_entity
from sap_spark.schema.metadata import parse_edmx, resolve_entity_type, sniff_version
from sap_spark.sources.odata_feed import (
    detect_format,
    feed_control,
    parse_document,
    parse_feed,
    parse_feed_documents,
    wire_schema,
)

FIXTURES = "/root/reference/src/test/resources"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(FIXTURES), reason="reference fixtures not available"
)


def _read(rel: str) -> str:
    with open(os.path.join(FIXTURES, rel)) as f:
        return f.read()


@pytest.fixture(scope="module")
def v2_entity():
    return resolve_entity_type(_read("odata2/metadata.xml"), "AllDataTypes")


@pytest.fixture(scope="module")
def v4_entity():
    return resolve_entity_type(_read("odata4/metadata.xml"), "AllDataTypes")


def test_version_sniff_on_reference_metadata():
    assert sniff_version(_read("odata2/metadata.xml")) == "2.0"
    assert sniff_version(_read("odata4/metadata.xml")) == "4.0"


def test_detect_format():
    assert detect_format(_read("odata2/AllDataTypes.xml")) == "atom-xml"
    assert detect_format(_read("odata2/AllDataTypes.json")) == "json"
    assert detect_format(_read("odata4/AllDataTypes.json")) == "json"


V2_TIME_MICROS = (11 * 3600 + 10 * 60 + 59) * 1_000_000  # PT11H10M59S


def _check_v2_decoded(rows):
    """Golden values from odata2/AllDataTypes.{xml,json} (3 records, the
    count SapOData2SourceETLTest asserts; values per
    ODataEntryToRecordTransformerTest.testTransformOData2Types)."""
    assert [r["Id"] for r in rows] == ["500000000", "500000001", "500000002"]
    r = rows[0]
    assert r["Boolean"] is True
    assert r["Byte"] == 127
    assert r["Int16"] == 32767
    assert r["Int32"] == 2147483647
    assert r["Int64"] == 9223372036854775807
    assert r["SByte"] == -128
    assert r["String"] == "Some string"
    assert r["Guid"] == "484f2eb4-f60d-4652-8673-6517d7c64d0e"
    assert r["Decimal"] == decimal.Decimal("123.456")
    assert r["Double"] == pytest.approx(1.7976931348623157e308)
    assert r["Single"] == pytest.approx(3.4028235e38, rel=1e-6)
    assert r["Time"] == V2_TIME_MICROS
    assert r["DateTime"] == datetime(1984, 12, 8, 1, 1, 1)
    assert r["DateTimeOffset"] == "2002-10-10T17:00:01+01:00"
    assert isinstance(r["Binary"], (bytes, bytearray)) and len(r["Binary"]) > 1000


@pytest.mark.parametrize("rel", ["odata2/AllDataTypes.xml", "odata2/AllDataTypes.json"])
def test_v2_feed_decode_golden(spark, v2_entity, rel):
    wire = parse_feed(spark, _read(rel), v2_entity, version="2.0")
    decoded = decode_entity(wire, v2_entity).orderBy("Id").collect()
    _check_v2_decoded(decoded)


def test_v2_xml_json_format_parity(spark, v2_entity):
    """The reference's $format matrix (xml vs json over the same records,
    SapOData2SourceETLTest.java:88-110): both encodings must decode to the
    identical typed frame."""
    via_xml = decode_entity(
        parse_feed(spark, _read("odata2/AllDataTypes.xml"), v2_entity), v2_entity
    ).orderBy("Id").collect()
    via_json = decode_entity(
        parse_feed(spark, _read("odata2/AllDataTypes.json"), v2_entity, "2.0"),
        v2_entity,
    ).orderBy("Id").collect()
    assert via_xml == via_json


def test_v4_feed_decode_golden(spark, v4_entity):
    wire = parse_feed(spark, _read("odata4/AllDataTypes.json"), v4_entity, "4.0")
    rows = decode_entity(wire, v4_entity).orderBy("Int32").collect()
    assert len(rows) == 2  # the count SapOData4SourceETLTest asserts
    r = rows[0]
    assert r["Binary"] == base64.b64decode("T0RhdGE=")
    assert r["Boolean"] is True
    assert r["Byte"] == 127
    assert r["Date"] == datetime(2012, 12, 3, 0, 0, 0)  # timestamp, not date
    assert r["DateTimeOffset"] == "2002-10-10T17:00:01+01:00"
    assert r["Decimal"] == decimal.Decimal("123.456")
    assert r["Duration"] == "P12DT23H59M59.999999999999S"
    assert r["Int64"] == 9223372036854775807
    assert r["SByte"] == -128
    assert r["Single"] == pytest.approx(3.14, rel=1e-6)
    assert r["String"] == "DEMO"
    assert r["TimeOfDay"] == (7 * 3600 + 59 * 60 + 59) * 1_000_000 + 999_000
    # stream links merged by property name (T14) into the struct (T13)
    s = r["Stream"]
    assert s["mediaReadLink"].endswith("?read")
    assert s["mediaEditLink"].endswith("?edit")
    assert s["mediaContentType"] == "image/jpeg"
    assert s["mediaEtag"] == 'W/"####"'
    # geospatial (T15): GeoJSON payload → reference struct
    p = r["GeographyPoint"]
    assert p["dimension"] == "GEOGRAPHY"
    assert (p["x"], p["y"], p["z"]) == (142.1, 64.1, 0.0)
    poly = r["GeometryPolygon"]
    assert poly["numberOfInteriorRings"] == 1
    assert len(poly["exterior"]) == 5
    gc = r["GeographyCollection"]
    assert len(gc["points"]) == 1 and len(gc["lineStrings"]) == 1


def test_v4_second_record_differs(spark, v4_entity):
    wire = parse_feed(spark, _read("odata4/AllDataTypes.json"), v4_entity, "4.0")
    rows = decode_entity(wire, v4_entity).orderBy("Int32").collect()
    ints = {r["Int32"] for r in rows}
    assert len(ints) == 2  # really two distinct entities, not a dup parse


def test_distributed_parse_over_document_corpus(spark, v2_entity):
    """The scale path: many staged pages in one DataFrame → mapInPandas
    parse → one wire frame. 6 copies of the 3-record page → 18 rows, with
    partition-parallel parsing."""
    payload = _read("odata2/AllDataTypes.xml")
    docs = spark.createDataFrame([(payload,)] * 6, "payload string").repartition(3)
    wire = parse_feed_documents(docs, v2_entity, version="2.0")
    assert wire.count() == 18
    decoded = decode_entity(wire, v2_entity)
    assert decoded.where(F.col("Int32") == 2147483647).count() == 18
    assert [f.name for f in wire.schema.fields] == [
        f.name for f in wire_schema(v2_entity).fields
    ]


def test_parse_document_driver_side(v4_entity):
    rows = parse_document(_read("odata4/AllDataTypes.json"), "4.0")
    assert len(rows) == 2
    assert rows[0]["Decimal"] == "123.456"
    assert rows[0]["Stream__mediaContentType"] == "image/jpeg"
    assert "Stream@odata.mediaReadLink" not in rows[0]


def test_v4_atom_parse_document_gml(v4_entity):
    """V4 Atom feed with GML geospatial payloads: driver-side parse yields
    GeoJSON wire text (the conversion Olingo's Atom deserializer performs),
    incl. the fixture's self-closed-Polygon quirk and media-link merge."""
    import json as _json

    rows = parse_document(_read("odata4/AllDataTypes.xml"))
    assert [r["Int32"] for r in rows] == ["3", "4"]
    r = rows[0]
    assert r["Duration"] == "P12DT23H59M59.999999999999S"
    assert r["Stream__mediaEditLink"] == "AllDataTypes(3)/Stream"
    assert _json.loads(r["GeographyPoint"]) == {
        "type": "Point", "coordinates": [15.0, 161.8]
    }
    poly = _json.loads(r["GeographyPolygon"])
    assert len(poly["coordinates"][0]) == 4  # ring positions were siblings
    mp = _json.loads(r["GeographyMultiPolygon"])
    assert [len(p) for p in mp["coordinates"]] == [1, 2]  # 2nd has interior
    gc = _json.loads(r["GeographyCollection"])
    assert [g["type"] for g in gc["geometries"]] == ["LineString", "Polygon"]


def test_v4_atom_decode_golden(spark, v4_entity):
    """V4 Atom through the full parse→decode path (the $format matrix's
    XML leg for V4): scalar kernels + GML-derived geo structs + stream
    edit-link from the Atom link element."""
    wire = parse_feed(spark, _read("odata4/AllDataTypes.xml"), v4_entity)
    rows = decode_entity(wire, v4_entity).orderBy("Int32").collect()
    assert [r["Int32"] for r in rows] == [3, 4]
    r = rows[0]
    assert r["Date"] == datetime(2012, 12, 3, 0, 0, 0)
    assert r["Duration"] == "P12DT23H59M59.999999999999S"
    assert r["TimeOfDay"] == (7 * 3600 + 59 * 60 + 59) * 1_000_000 + 999_000
    assert r["Stream"]["mediaEditLink"] == "AllDataTypes(3)/Stream"
    assert r["Stream"]["mediaReadLink"] is None
    p = r["GeographyPoint"]
    assert (p["x"], p["y"]) == (15.0, 161.8) and p["dimension"] == "GEOGRAPHY"
    mp = r["GeometryMultiPolygon"]
    assert mp["coordinates"][1]["numberOfInteriorRings"] == 1
    mls = r["GeographyMultiLineString"]
    assert [len(ls["coordinates"]) for ls in mls["coordinates"]] == [3, 4]


def test_feed_control_paging():
    assert feed_control('{"value": [], "@odata.nextLink": "http://s/p2"}') == {
        "next_link": "http://s/p2", "count": None, "context": None,
    }
    v2 = feed_control('{"d": {"results": [], "__next": "u", "__count": "7"}}')
    assert v2["next_link"] == "u" and v2["count"] == 7
    atom = feed_control(
        '<feed xmlns="http://www.w3.org/2005/Atom">'
        '<link rel="next" href="http://s/p3"/></feed>'
    )
    assert atom["next_link"] == "http://s/p3"
    assert feed_control(_read("odata2/AllDataTypes.xml"))["next_link"] is None


def test_enum_property_end_to_end(spark):
    """T21 completion: EDMX <EnumType> declaration + enum-typed property →
    member-name string (ClientEnumValue.getValue() parity); numeric wire
    values map back to member names; unknown members raise."""
    edmx = """<?xml version="1.0" encoding="utf-8"?>
<edmx:Edmx Version="4.0" xmlns:edmx="http://docs.oasis-open.org/odata/ns/edmx">
  <edmx:DataServices>
    <Schema Namespace="S" xmlns="http://docs.oasis-open.org/odata/ns/edm">
      <EnumType Name="Color" UnderlyingType="Edm.Int32" IsFlags="true">
        <Member Name="Red" Value="1"/>
        <Member Name="Green" Value="2"/>
        <Member Name="Blue" Value="4"/>
      </EnumType>
      <EntityType Name="Item">
        <Property Name="Id" Type="Edm.Int32" Nullable="false"/>
        <Property Name="Shade" Type="S.Color"/>
      </EntityType>
      <EntityContainer Name="C">
        <EntitySet Name="Items" EntityType="S.Item"/>
      </EntityContainer>
    </Schema>
  </edmx:DataServices>
</edmx:Edmx>"""
    entity = resolve_entity_type(edmx, "Items")
    shade = next(p for p in entity.properties if p.name == "Shade")
    assert shade.enum_members == {"Red": 1, "Green": 2, "Blue": 4}

    payload = (
        '{"value": [{"Id": 1, "Shade": "Red"}, {"Id": 2, "Shade": "Red,Blue"},'
        ' {"Id": 3, "Shade": 2}, {"Id": 4, "Shade": null}]}'
    )
    wire = parse_feed(spark, payload, entity, "4.0")
    rows = {r["Id"]: r["Shade"] for r in decode_entity(wire, entity).collect()}
    assert rows == {1: "Red", 2: "Red,Blue", 3: "Green", 4: None}

    bad = parse_feed(spark, '{"value": [{"Id": 9, "Shade": "Chartreuse"}]}', entity)
    with pytest.raises(Exception, match="enum"):
        decode_entity(bad, entity).collect()


def test_enum_catalog_parsed_from_edmx():
    cat = parse_edmx(
        """<?xml version="1.0"?>
<edmx:Edmx Version="4.0" xmlns:edmx="http://docs.oasis-open.org/odata/ns/edmx">
  <edmx:DataServices>
    <Schema Namespace="S" xmlns="http://docs.oasis-open.org/odata/ns/edm">
      <EnumType Name="Level">
        <Member Name="Low"/><Member Name="High"/>
      </EnumType>
      <EntityType Name="E">
        <Property Name="L" Type="S.Level"/>
      </EntityType>
    </Schema>
  </edmx:DataServices>
</edmx:Edmx>"""
    )
    prop = cat["E"].properties[0]
    assert prop.enum_members == {"Low": 0, "High": 1}  # auto-numbered
