"""$metadata (EDMX) document parsing: version sniff + schema inference.

Mirrors the reference's metadata scan and protocol dispatch
(S3/S4, SURVEY.md §2.1):

- version sniff — the reference routes on the EDM version of the
  ``$metadata`` document (odata/GenericODataClient.java:59-92,
  odata/ODataVersion.java:28-53): edmx Version="1.0" → V2 (Olingo 2),
  Version="4.0" → V4 (Olingo 4). Here: ``sniff_version``.
- metadata scan — fetch+parse ``$metadata`` into EntityType{name,
  properties[]} with type/nullable/precision/scale facets
  (V2: odata2/OData2Client.java:106-141, V4: odata4/OData4Client.java:76-99).
  Here: ``parse_edmx`` → ``EntityType`` (schema/edm.py), feeding
  ``infer_schema`` for the $select-pruned StructType (C1).

The EDMX format itself is the public OASIS OData CSDL; this parser
handles the subset the reference consumes: EntityType properties with
facets, and the EntityContainer's EntitySet→EntityType binding.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

from sap_spark.schema.edm import EntityType, PropertyMetadata

_EDMX_NS = {
    "1.0": "http://schemas.microsoft.com/ado/2007/06/edmx",
    "4.0": "http://docs.oasis-open.org/odata/ns/edmx",
}


class MetadataError(ValueError):
    """Malformed or unsupported $metadata document."""


def _localname(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def sniff_version(edmx_xml: str) -> str:
    """EDM version of a $metadata document: '2.0' (edmx 1.0 envelope) or
    '4.0' — the protocol-dispatch decision (GenericODataClient.java:82-92).
    """
    try:
        root = ET.fromstring(edmx_xml)
    except ET.ParseError as e:
        raise MetadataError(f"unparseable $metadata document: {e}") from e
    if _localname(root.tag) != "Edmx":
        raise MetadataError(f"not an EDMX document (root <{root.tag}>)")
    version = root.attrib.get("Version", "")
    ns = root.tag[1:].split("}", 1)[0] if root.tag.startswith("{") else ""
    if version == "4.0" or ns == _EDMX_NS["4.0"]:
        return "4.0"
    if version == "1.0" or ns == _EDMX_NS["1.0"]:
        return "2.0"
    raise MetadataError(f"unsupported EDMX version {version!r}")


def _parse_bool(value: str | None, default: bool) -> bool:
    if value is None:
        return default
    return value.strip().lower() == "true"


def _parse_property(
    el: ET.Element, enums: dict[str, dict[str, int]] | None = None
) -> PropertyMetadata:
    name = el.attrib["Name"]
    edm_type = el.attrib.get("Type", "Edm.String")
    precision = el.attrib.get("Precision")
    scale = el.attrib.get("Scale")
    # enum-typed property: Type="Namespace.Color" referencing an <EnumType>
    members = (enums or {}).get(edm_type.rsplit(".", 1)[-1])
    return PropertyMetadata(
        name=name,
        edm_type=edm_type,
        # OData default: properties are nullable unless declared otherwise
        nullable=_parse_bool(el.attrib.get("Nullable"), True),
        precision=int(precision) if precision and precision.isdigit() else None,
        scale=int(scale) if scale and scale.isdigit() else None,
        enum_members=members,
    )


def _parse_enum_types(root: ET.Element) -> dict[str, dict[str, int]]:
    """<EnumType Name=..><Member Name=.. Value=../></EnumType> → member
    maps (V4 CSDL §10; members without explicit Value get 0,1,2,…)."""
    enums: dict[str, dict[str, int]] = {}
    for el in root.iter():
        if _localname(el.tag) != "EnumType":
            continue
        members: dict[str, int] = {}
        auto = 0
        for m in el:
            if _localname(m.tag) != "Member":
                continue
            v = m.attrib.get("Value")
            value = int(v) if v is not None and v.lstrip("-").isdigit() else auto
            members[m.attrib["Name"]] = value
            auto = value + 1
        enums[el.attrib["Name"]] = members
    return enums


def parse_edmx(edmx_xml: str) -> dict[str, EntityType]:
    """Parse a $metadata document → {name: EntityType}.

    Keys include both entity-type names and the container's entity-SET
    names (the reference resolves a resourcePath like 'AllDataTypes' via
    the container binding, odata/ODataClient.java:97-106). Works for V2
    and V4 documents — the CSDL property shape the reference consumes is
    identical across versions.
    """
    sniff_version(edmx_xml)  # validates the envelope
    root = ET.fromstring(edmx_xml)

    enums = _parse_enum_types(root)
    entity_types: dict[str, EntityType] = {}
    set_bindings: dict[str, str] = {}  # entity-set name -> type name (no ns)
    for el in root.iter():
        tag = _localname(el.tag)
        if tag == "EntityType":
            props = [
                _parse_property(p, enums)
                for p in el
                if _localname(p.tag) == "Property"
            ]
            entity_types[el.attrib["Name"]] = EntityType(
                name=el.attrib["Name"], properties=props
            )
        elif tag == "EntitySet":
            type_ref = el.attrib.get("EntityType", "")
            set_bindings[el.attrib["Name"]] = type_ref.rsplit(".", 1)[-1]

    out = dict(entity_types)
    for set_name, type_name in set_bindings.items():
        if type_name in entity_types and set_name not in out:
            out[set_name] = EntityType(
                name=set_name, properties=entity_types[type_name].properties
            )
    if not entity_types:
        raise MetadataError("no EntityType declarations in $metadata")
    return out


def resolve_entity_type(edmx_xml: str, resource_path: str) -> EntityType:
    """Entity type for a resource path (entity-set or type name) — the
    design-time probe the reference runs in configurePipeline
    (SapODataSource.java:66-74): unknown paths are a validation failure."""
    catalog = parse_edmx(edmx_xml)
    entity = catalog.get(resource_path)
    if entity is None:
        raise MetadataError(
            f"entity set or type {resource_path!r} not found in $metadata; "
            f"available: {sorted(catalog)}"
        )
    return entity
