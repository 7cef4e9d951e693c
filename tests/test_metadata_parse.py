"""$metadata EDMX parsing: version sniff, schema inference, set binding.

Fixtures below are authored minimal CSDL documents in the same public
OASIS/Microsoft EDMX shapes the reference's golden fixtures use
(reference behavior: version sniff GenericODataClient.java:82-92; facet
extraction OData2Client.java:122-129 / OData4Client.java:92-99).
"""

import pytest
from pyspark.sql import types as T

from sap_spark.schema.edm import infer_schema
from sap_spark.schema.metadata import (
    MetadataError,
    parse_edmx,
    resolve_entity_type,
    sniff_version,
)

EDMX_V2 = """<?xml version="1.0" encoding="utf-8"?>
<edmx:Edmx Version="1.0" xmlns:edmx="http://schemas.microsoft.com/ado/2007/06/edmx">
  <edmx:DataServices xmlns:m="http://schemas.microsoft.com/ado/2007/08/dataservices/metadata"
                     m:DataServiceVersion="2.0">
    <Schema Namespace="Demo" xmlns="http://schemas.microsoft.com/ado/2008/09/edm">
      <EntityType Name="Product">
        <Key><PropertyRef Name="Id"/></Key>
        <Property Name="Id" Type="Edm.Guid" Nullable="false"/>
        <Property Name="Name" Type="Edm.String"/>
        <Property Name="Quantity" Type="Edm.Int16" Nullable="false"/>
        <Property Name="Price" Type="Edm.Decimal" Precision="16" Scale="3"/>
        <Property Name="Created" Type="Edm.DateTime"/>
      </EntityType>
      <EntityContainer Name="DemoService" m:IsDefaultEntityContainer="true">
        <EntitySet Name="Products" EntityType="Demo.Product"/>
      </EntityContainer>
    </Schema>
  </edmx:DataServices>
</edmx:Edmx>
"""

EDMX_V4 = """<?xml version="1.0" encoding="utf-8"?>
<edmx:Edmx Version="4.0" xmlns:edmx="http://docs.oasis-open.org/odata/ns/edmx">
  <edmx:DataServices>
    <Schema Namespace="Demo" xmlns="http://docs.oasis-open.org/odata/ns/edm">
      <EntityType Name="Event">
        <Key><PropertyRef Name="Id"/></Key>
        <Property Name="Id" Type="Edm.Int64" Nullable="false"/>
        <Property Name="When" Type="Edm.Date"/>
        <Property Name="HowLong" Type="Edm.Duration"/>
        <Property Name="Where" Type="Edm.GeographyPoint"/>
      </EntityType>
      <EntityContainer Name="Container">
        <EntitySet Name="Events" EntityType="Demo.Event"/>
      </EntityContainer>
    </Schema>
  </edmx:DataServices>
</edmx:Edmx>
"""


def test_sniff_version():
    assert sniff_version(EDMX_V2) == "2.0"
    assert sniff_version(EDMX_V4) == "4.0"
    with pytest.raises(MetadataError):
        sniff_version("<NotEdmx/>")
    with pytest.raises(MetadataError):
        sniff_version("garbage <<<")


def test_parse_v2_facets_and_set_binding():
    catalog = parse_edmx(EDMX_V2)
    assert set(catalog) == {"Product", "Products"}
    product = catalog["Products"]  # set name resolves to the bound type
    by_name = {p.name: p for p in product.properties}
    assert by_name["Id"].nullable is False
    assert by_name["Name"].nullable is True  # OData default
    assert by_name["Price"].precision == 16 and by_name["Price"].scale == 3

    # schema inference (C1): EDM → Spark types per the §1.2 table
    schema = infer_schema(product)
    fields = {f.name: f for f in schema.fields}
    assert fields["Id"].dataType == T.StringType()        # Edm.Guid → string
    assert fields["Quantity"].dataType == T.IntegerType() # Int16 widened
    assert fields["Price"].dataType == T.DecimalType(16, 3)
    assert fields["Created"].dataType == T.TimestampType()
    assert fields["Id"].nullable is False


def test_parse_v4_types():
    event = resolve_entity_type(EDMX_V4, "Events")
    schema = infer_schema(event)
    fields = {f.name: f for f in schema.fields}
    assert fields["Id"].dataType == T.LongType()
    # Edm.Date deliberately maps to timestamp, NOT date (reference parity)
    assert fields["When"].dataType == T.TimestampType()
    assert fields["HowLong"].dataType == T.StringType()   # ISO-8601 duration
    assert isinstance(fields["Where"].dataType, T.StructType)


def test_select_pruned_inference():
    product = resolve_entity_type(EDMX_V2, "Products")
    schema = infer_schema(product, select=["Id", "Price"])
    assert [f.name for f in schema.fields] == ["Id", "Price"]


def test_unknown_resource_path():
    with pytest.raises(MetadataError, match="not found"):
        resolve_entity_type(EDMX_V2, "Orders")


def test_metadata_to_decode_end_to_end(spark):
    """Full reference lifecycle analog (SURVEY.md §3): $metadata scan →
    schema inference → vectorized decode of wire values — what
    configurePipeline + the transformer do, as one composition."""
    from sap_spark.functions.decode import decode_entity

    product = resolve_entity_type(EDMX_V2, "Products")
    raw = spark.createDataFrame(
        [
            ("0c8df3eb-0000-0000-0000-000000000001", "Notebook", 7,
             "1299.500", "2019-08-29T14:52:08"),
            ("0c8df3eb-0000-0000-0000-000000000002", None, 0,
             "0.001", None),
        ],
        "Id string, Name string, Quantity int, Price string, Created string",
    )
    out = decode_entity(raw, product)
    fields = {f.name: f.dataType for f in out.schema.fields}
    assert fields["Price"] == T.DecimalType(16, 3)
    assert fields["Created"] == T.TimestampType()
    rows = out.orderBy("Id").collect()
    assert str(rows[0]["Price"]) == "1299.500"
    assert rows[0]["Quantity"] == 7
    assert rows[1]["Name"] is None
