"""EDM-style type registry: property metadata → Spark StructType.

Re-expresses the reference's schema-inference surface in Spark types:

- ``PropertyMetadata`` / ``EntityType`` mirror the reference's metadata
  model (odata/PropertyMetadata.java:27-76, odata/EntityType.java:24-41).
- ``edm_to_spark_type`` is the Spark-native equivalent of the
  EDM→CDAP-schema switch in SapODataSource.convertPropertyType
  (/root/reference/src/main/java/io/cdap/plugin/sap/SapODataSource.java:146-213),
  pinned to the same deliberate quirks (SURVEY.md §1.2):

  * Edm.Byte/SByte/Int16/Int32 all widen to IntegerType (l.152-155,171-174)
  * Edm.Date (V4) maps to TimestampType, NOT DateType (l.200-201)
  * Edm.DateTimeOffset maps to StringType "to avoid timezone information
    loss" (l.158-160)
  * Edm.Time/TimeOfDay → micros-of-day as LongType (Spark has no TimeType;
    reference uses TIME_MICROS, l.161-162, 206-207)
  * Edm.Duration → ISO-8601 duration string (l.202-203)
  * Edm.Stream → struct of 4 nullable strings (l.204-205,
    SapODataConstants.java:220-233)
  * Geospatial shapes → the nested structs of SapODataConstants.java:69-211;
    nested geo collections unsupported, same limitation as l.197-199.
- ``infer_schema`` = metadata scan + $select pruning + nullable wrapping
  (SapODataSource.getSchema, l.126-144).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Geospatial / stream record shapes (SapODataConstants.java:69-233)
# ---------------------------------------------------------------------------


def _point_struct() -> T.StructType:
    # SapODataConstants.java:91-102 — {dimension, x, y, z}
    return T.StructType(
        [
            T.StructField("dimension", T.StringType(), True),
            T.StructField("x", T.DoubleType(), True),
            T.StructField("y", T.DoubleType(), True),
            T.StructField("z", T.DoubleType(), True),
        ]
    )


def _line_string_struct() -> T.StructType:
    # SapODataConstants.java:110-116 — shared with MultiPoint; `type` disambiguates
    return T.StructType(
        [
            T.StructField("type", T.StringType(), True),
            T.StructField("dimension", T.StringType(), True),
            T.StructField("coordinates", T.ArrayType(_point_struct()), True),
        ]
    )


def _polygon_struct() -> T.StructType:
    # SapODataConstants.java:125-137
    return T.StructType(
        [
            T.StructField("type", T.StringType(), True),
            T.StructField("dimension", T.StringType(), True),
            T.StructField("exterior", T.ArrayType(_point_struct()), True),
            T.StructField("interior", T.ArrayType(_line_string_struct()), True),
            T.StructField("numberOfInteriorRings", T.IntegerType(), True),
        ]
    )


def _multi_of(element: T.StructType) -> T.StructType:
    # SapODataConstants.java:145-179 — MultiPoint/MultiLineString/MultiPolygon
    return T.StructType(
        [
            T.StructField("type", T.StringType(), True),
            T.StructField("dimension", T.StringType(), True),
            T.StructField("coordinates", T.ArrayType(element), True),
        ]
    )


def _geo_collection_struct() -> T.StructType:
    # SapODataConstants.java:191-211 — 6 typed arrays; NOT recursive (nested
    # collections unsupported because metadata lacks component info,
    # SapODataSource.java:197-199).
    return T.StructType(
        [
            T.StructField("type", T.StringType(), True),
            T.StructField("dimension", T.StringType(), True),
            T.StructField("points", T.ArrayType(_point_struct()), True),
            T.StructField("lineStrings", T.ArrayType(_line_string_struct()), True),
            T.StructField("polygons", T.ArrayType(_polygon_struct()), True),
            T.StructField("multiPoints", T.ArrayType(_multi_of(_point_struct())), True),
            T.StructField(
                "multiLineStrings", T.ArrayType(_multi_of(_line_string_struct())), True
            ),
            T.StructField("multiPolygons", T.ArrayType(_multi_of(_polygon_struct())), True),
        ]
    )


STREAM_PROPERTY_STRUCT = T.StructType(
    # SapODataConstants.java:220-233 — media link metadata, not the bytes
    [
        T.StructField("mediaEtag", T.StringType(), True),
        T.StructField("mediaContentType", T.StringType(), True),
        T.StructField("mediaReadLink", T.StringType(), True),
        T.StructField("mediaEditLink", T.StringType(), True),
    ]
)


@dataclass
class PropertyMetadata:
    """Column metadata (odata/PropertyMetadata.java:27-76).

    ``enum_members``: member-name → underlying value for V4 enum-typed
    properties (parsed from the EDMX ``<EnumType>`` declaration). The
    reference extracts an enum as its member-name string
    (``ClientEnumValue.getValue()``, odata/ODataEntity.java:97-99), so an
    enum property maps to StringType."""

    name: str
    edm_type: str  # e.g. "Edm.Int32"
    nullable: bool = True
    precision: int | None = None
    scale: int | None = None
    enum_members: dict[str, int] | None = None


@dataclass
class EntityType:
    """Named schema (odata/EntityType.java:24-41)."""

    name: str
    properties: list[PropertyMetadata] = field(default_factory=list)


class UnsupportedTypeError(ValueError):
    """EDM type with no mapping (SapODataSource.java:209-212 throws
    IllegalArgumentException for unsupported types; complex types rejected at
    odata/ODataEntity.java:100-102)."""


_GEO_SHAPES: dict[str, T.StructType] = {}


def _geo_shapes() -> dict[str, T.StructType]:
    if not _GEO_SHAPES:
        point = _point_struct()
        ls = _line_string_struct()
        poly = _polygon_struct()
        _GEO_SHAPES.update(
            {
                "Point": point,
                "LineString": ls,
                "Polygon": poly,
                "MultiPoint": _multi_of(point),
                "MultiLineString": _multi_of(ls),
                "MultiPolygon": _multi_of(poly),
                "Collection": _geo_collection_struct(),
            }
        )
    return _GEO_SHAPES


def edm_to_spark_type(
    edm_type: str, precision: int | None = None, scale: int | None = None
) -> T.DataType:
    """EDM type name → Spark DataType (SapODataSource.java:146-213 parity).

    ``Collection(Edm.X)`` (V4 declared collection property) maps to
    ArrayType(X) — runtime extraction parity with
    ``asJavaCollection()`` (odata/ODataEntity.java:91-93); complex
    element types are rejected like complex values (l.100-102)."""
    if edm_type.startswith("Collection(") and edm_type.endswith(")"):
        inner = edm_type[len("Collection("):-1]
        elem = edm_to_spark_type(inner)
        if not isinstance(
            elem, (T.StringType, T.IntegerType, T.LongType, T.FloatType,
                   T.DoubleType, T.BooleanType, T.BinaryType, T.TimestampType)
        ):
            raise UnsupportedTypeError(
                f"Collection element type not supported: {inner!r} "
                "(complex types are not supported)"
            )
        return T.ArrayType(elem)
    name = edm_type[4:] if edm_type.startswith("Edm.") else edm_type

    simple: dict[str, T.DataType] = {
        "Binary": T.BinaryType(),
        "Boolean": T.BooleanType(),
        "Byte": T.IntegerType(),
        "SByte": T.IntegerType(),
        "Int16": T.IntegerType(),
        "Int32": T.IntegerType(),
        "Int64": T.LongType(),
        "Single": T.FloatType(),
        "Double": T.DoubleType(),
        "String": T.StringType(),
        "Guid": T.StringType(),
        # Edm.DateTime → timestamp micros (l.156-157)
        "DateTime": T.TimestampType(),
        # Edm.Date (V4) → timestamp, deliberately NOT date (l.200-201)
        "Date": T.TimestampType(),
        # DateTimeOffset → string to preserve the offset (l.158-160)
        "DateTimeOffset": T.StringType(),
        # Time/TimeOfDay → micros-of-day long (no Spark TimeType; l.161-162,206-207)
        "Time": T.LongType(),
        "TimeOfDay": T.LongType(),
        # Duration (V4) → ISO-8601 duration string (l.202-203)
        "Duration": T.StringType(),
        "Stream": STREAM_PROPERTY_STRUCT,
    }
    if name in simple:
        return simple[name]
    if name == "Decimal":
        # precision/scale from EDM facets (l.163-164); CDAP defaults when absent.
        return T.DecimalType(precision if precision is not None else 38, scale or 0)
    for prefix in ("Geography", "Geometry"):
        if name.startswith(prefix):
            shape = name[len(prefix):]
            shapes = _geo_shapes()
            if shape in shapes:
                return shapes[shape]
    raise UnsupportedTypeError(f"Unsupported EDM type: {edm_type!r}")


def entity_type_to_struct(entity: EntityType) -> T.StructType:
    """EntityType → StructType, nullability from EDM facets
    (SapODataSource.java:140-144)."""
    return T.StructType(
        [
            T.StructField(
                p.name,
                T.StringType()
                if p.enum_members is not None
                else edm_to_spark_type(p.edm_type, p.precision, p.scale),
                p.nullable,
            )
            for p in entity.properties
        ]
    )


def infer_schema(entity: EntityType, select: list[str] | None = None) -> T.StructType:
    """Schema inference with $select pruning (SapODataSource.getSchema,
    l.126-138: output columns = selected columns, inferred types)."""
    struct = entity_type_to_struct(entity)
    if not select:
        return struct
    by_name = {f.name: f for f in struct.fields}
    missing = [c for c in select if c not in by_name]
    if missing:
        raise UnsupportedTypeError(
            f"$select references properties not in entity type "
            f"{entity.name!r}: {missing}"
        )
    return T.StructType([by_name[c] for c in select])
