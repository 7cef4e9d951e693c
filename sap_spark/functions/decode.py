"""Decode kernels: the reference transformer re-expressed vectorized.

The reference converts one OData entity at a time in Java
(`ODataEntryToRecordTransformer.transform`, /root/reference/src/main/java/
io/cdap/plugin/sap/transformer/ODataEntryToRecordTransformer.java:73-164).
Here each per-field kernel (SURVEY.md §2.3 rows T1-T21) is a column
expression over wire-format values: native `pyspark.sql.functions` where
possible (JVM, whole-stage codegen), Arrow-batched pandas UDFs only where
semantics demand Python (strict decimal bounds, ISO-8601 duration /
offset-preserving rendering) — never per-row Python.

Input convention: the wire value of every property is a string column
(what an OData JSON/Atom payload carries); ``decode_entity`` maps a whole
DataFrame of wire strings to the typed schema of an ``EntityType``.

Error parity: invalid values raise UnexpectedFormatError naming the field,
expected type, and actual value — mirroring ``ensureTypeValid``
(transformer l.423-436) and the decimal precision/scale checks (l.370-387).
Errors surface at execution time via ``F.raise_error`` / UDF exceptions.
"""

from __future__ import annotations

import decimal
import re
from datetime import datetime

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sap_spark.schema.edm import (
    EntityType,
    PropertyMetadata,
    STREAM_PROPERTY_STRUCT,
    edm_to_spark_type,
)


class UnexpectedFormatError(ValueError):
    """Analog of CDAP's UnexpectedFormatException (transformer l.430-435)."""


def _fail(field: str, expected: str, value_col: Column) -> Column:
    """Column that raises naming field/expected/actual (ensureTypeValid
    parity: "Field 'x' is expected to be of type 'y'...", l.430-434)."""
    return F.raise_error(
        F.concat(
            F.lit(f"Field '{field}' is expected to be of type '{expected}'. "),
            F.lit("Unexpected value: '"),
            value_col,
            F.lit("'."),
        )
    )


def _checked(field: str, expected: str, raw: Column, parsed: Column) -> Column:
    """Null in → null out (T1, l.93-95); parse failure → error (T2)."""
    return F.when(raw.isNotNull() & parsed.isNull(), _fail(field, expected, raw)).otherwise(
        parsed
    )


# -- numeric / boolean / string kernels (T3-T7) — native casts --------------


def decode_boolean(field: str, raw: Column) -> Column:
    parsed = F.when(F.lower(raw) == "true", F.lit(True)).when(
        F.lower(raw) == "false", F.lit(False)
    )
    return _checked(field, "boolean", raw, parsed)


def decode_int(field: str, raw: Column) -> Column:
    # Byte/SByte/Int16/Int32 all widen to int32 (reference T3, l.127-129).
    return _checked(field, "int", raw, raw.try_cast("long").cast("int"))


def decode_long(field: str, raw: Column) -> Column:
    return _checked(field, "long", raw, raw.try_cast("long"))


def decode_float(field: str, raw: Column) -> Column:
    return _checked(field, "float", raw, raw.try_cast("float"))


def decode_double(field: str, raw: Column) -> Column:
    return _checked(field, "double", raw, raw.try_cast("double"))


def decode_string(field: str, raw: Column) -> Column:
    return raw


def decode_binary(field: str, raw: Column) -> Column:
    # wire format: base64 (OData JSON convention)
    return _checked(field, "bytes", raw, F.unbase64(raw))


# -- temporal kernels (T8-T10) ------------------------------------------------


def decode_timestamp(field: str, raw: Column) -> Column:
    """Edm.DateTime/Edm.Date → timestamp micros (T8, l.358-368)."""
    return _checked(field, "timestamp", raw, F.try_to_timestamp(raw))


def decode_time_micros(field: str, raw: Column) -> Column:
    """Edm.Time/TimeOfDay → micros-of-day long (T9, l.344-356; no Spark
    TimeType — engine invariant per SURVEY.md §1.2).

    Two wire forms, both native regexp kernels: 'HH:mm:ss[.ffffff]' (the
    V4 TimeOfDay literal) and the V2 Edm.Time duration literal
    'PT11H10M59S' (what a V2 service puts on the wire — see the reference
    fixture odata2/AllDataTypes.xml `<d:Time>PT11H10M59S</d:Time>`)."""
    m = F.regexp_extract(raw, r"^(\d{2}):(\d{2}):(\d{2})(?:\.(\d{1,6}))?$", 0)
    hh = F.regexp_extract(raw, r"^(\d{2})", 1).cast("long")
    mm = F.regexp_extract(raw, r"^\d{2}:(\d{2})", 1).cast("long")
    ss = F.regexp_extract(raw, r"^\d{2}:\d{2}:(\d{2})", 1).cast("long")
    frac = F.rpad(
        F.regexp_extract(raw, r"\.(\d{1,6})", 1), 6, "0"
    )
    micros = (hh * 3600 + mm * 60 + ss) * 1_000_000 + F.coalesce(
        frac.cast("long"), F.lit(0)
    )
    clock = F.when((m != "") & (hh < 24) & (mm < 60) & (ss < 60), micros)

    pt = r"^PT(?:(\d+)H)?(?:(\d+)M)?(?:(\d+)(?:\.(\d{1,6}))?S)?$"
    is_pt = F.regexp_extract(raw, pt, 0) != ""
    pt_h = F.coalesce(F.regexp_extract(raw, pt, 1).try_cast("long"), F.lit(0))
    pt_m = F.coalesce(F.regexp_extract(raw, pt, 2).try_cast("long"), F.lit(0))
    pt_s = F.coalesce(F.regexp_extract(raw, pt, 3).try_cast("long"), F.lit(0))
    pt_f = F.coalesce(
        F.rpad(F.regexp_extract(raw, pt, 4), 6, "0").try_cast("long"), F.lit(0)
    )
    duration = F.when(
        is_pt & (raw != "PT") & (pt_h < 24) & (pt_m < 60) & (pt_s < 60),
        (pt_h * 3600 + pt_m * 60 + pt_s) * 1_000_000 + pt_f,
    )
    return _checked(field, "time-micros", raw, F.coalesce(clock, duration))


@F.pandas_udf(T.StringType())
def _render_datetimeoffset(raw: pd.Series) -> pd.Series:
    """Offset-preserving ISO-8601 render (T10, transformer l.325-331 via
    Olingo EdmDateTimeOffset): '2019-08-29T14:52:08.155+02:00' — fractional
    digits trimmed to the value's own precision, offset kept verbatim."""

    def render(v):
        if v is None:
            return None
        s = str(v).strip()
        m = re.match(
            r"^(\d{4}-\d{2}-\d{2})[T ](\d{2}:\d{2}:\d{2})(?:\.(\d+))?"
            r"(Z|[+-]\d{2}:\d{2})$",
            s,
        )
        if not m:
            raise UnexpectedFormatError(
                f"Field is expected to be of type 'datetimeoffset'. "
                f"Unexpected value: '{s}'."
            )
        date, tod, frac, off = m.groups()
        out = f"{date}T{tod}"
        if frac:
            frac = frac.rstrip("0")
            if frac:
                out += f".{frac}"
        out += "+00:00" if off == "Z" else off
        return out

    return raw.map(render)


def decode_datetimeoffset(field: str, raw: Column) -> Column:
    """Edm.DateTimeOffset → string, never timestamp: 'to avoid timezone
    information loss' (SapODataSource.java:158-160)."""
    return _render_datetimeoffset(raw)


@F.pandas_udf(T.StringType())
def _render_duration(raw: pd.Series) -> pd.Series:
    """Edm.Duration → ISO-8601 'P12DT23H59M59.999999999999S' (T11,
    transformer l.333-342 via Olingo EdmDuration; docs example at
    docs/SapEcc-batchsource.md:82). Value-derived precision: fractional
    second digits are kept exactly as given, trailing zeros trimmed.

    Wire forms: a seconds decimal (what Olingo's deserializer hands the
    transformer) or the ISO-8601 duration literal itself (what the V4 JSON
    document carries — see odata4/AllDataTypes.json "Duration"); the
    literal is parsed to seconds and re-rendered canonically."""

    iso = re.compile(
        r"^(-)?P(?:(\d+)D)?(?:T(?:(\d+)H)?(?:(\d+)M)?(?:(\d+(?:\.\d+)?)S)?)?$"
    )

    def to_seconds(s: str):
        m = iso.match(s)
        if not m or s in ("P", "-P"):
            return None
        sign, days, hours, minutes, secs = m.groups()
        total = (
            decimal.Decimal(days or 0) * 86400
            + decimal.Decimal(hours or 0) * 3600
            + decimal.Decimal(minutes or 0) * 60
            + decimal.Decimal(secs or 0)
        )
        return -total if sign else total

    def render(v):
        if v is None:
            return None
        s = str(v).strip()
        d = to_seconds(s) if s[:1] in "P-" else None
        if d is None:
            try:
                d = decimal.Decimal(s)
            except decimal.InvalidOperation as e:
                raise UnexpectedFormatError(
                    f"Field is expected to be of type 'duration'. "
                    f"Unexpected value: '{v}'."
                ) from e
        sign = "-" if d < 0 else ""
        d = abs(d)
        days, rem = divmod(d, 86400)
        hours, rem = divmod(rem, 3600)
        minutes, secs = divmod(rem, 60)
        out = f"{sign}P"
        if days:
            out += f"{int(days)}D"
        if hours or minutes or secs or not days:
            out += "T"
            if hours:
                out += f"{int(hours)}H"
            if minutes:
                out += f"{int(minutes)}M"
            if secs or (not hours and not minutes and not days):
                s = format(secs.normalize(), "f")
                out += f"{s}S"
        return out

    return raw.map(render)


def decode_duration(field: str, raw: Column) -> Column:
    return _render_duration(raw)


# -- decimal kernel (T12) ------------------------------------------------------


def make_decimal_decoder(field: str, precision: int, scale: int):
    """Strict decimal decode (transformer l.370-421):

    - accepts integral/float/decimal wire strings;
    - float inputs rounded HALF_EVEN into MathContext(precision) (l.415);
    - raises if value precision > declared precision or scale > declared
      scale (l.374-387) — Spark's silent-null cast is NOT acceptable;
    - result re-scaled to the declared scale (unscaled-bytes emit parity).
    """
    out_type = T.DecimalType(precision, scale)

    @F.pandas_udf(out_type)
    def decode(raw: pd.Series) -> pd.Series:
        def conv(v):
            if v is None:
                return None
            s = str(v).strip()
            try:
                d = decimal.Decimal(s)
            except decimal.InvalidOperation as e:
                raise UnexpectedFormatError(
                    f"Field '{field}' is expected to be of type 'decimal'. "
                    f"Unexpected value: '{s}'."
                ) from e
            if "e" in s.lower() or ("." in s and len(s.split(".")[1]) > scale):
                # float-ish input: HALF_EVEN round into the declared
                # precision, like the reference does for Float/Double (l.415)
                d = d.normalize(decimal.Context(prec=precision, rounding=decimal.ROUND_HALF_EVEN))
            vscale = max(0, -d.as_tuple().exponent)
            if vscale > scale:
                raise UnexpectedFormatError(
                    f"Field '{field}' has scale '{vscale}' which is not equal "
                    f"to the schema scale '{scale}'."
                )
            digits = len(d.as_tuple().digits) - vscale + scale
            if digits > precision:
                raise UnexpectedFormatError(
                    f"Field '{field}' has precision '{digits}' which is "
                    f"greater than the schema precision '{precision}'."
                )
            return d.quantize(decimal.Decimal(1).scaleb(-scale))

        return raw.map(conv)

    return decode


# -- stream property (T13/T14) --------------------------------------------------


def build_stream_property(
    media_etag: Column,
    media_content_type: Column,
    media_read_link: Column,
    media_edit_link: Column,
) -> Column:
    """StreamProperty struct (T13, l.166-173); read-link + edit-link merge
    (T14, odata/ODataEntity.java:70-84) = coalescing both link sources into
    one struct, which in columnar form is simply passing both columns."""
    return F.struct(
        media_etag.alias("mediaEtag"),
        media_content_type.alias("mediaContentType"),
        media_read_link.alias("mediaReadLink"),
        media_edit_link.alias("mediaEditLink"),
    )


# -- geospatial kernels (T15-T20): GeoJSON wire → reference structs ------------

_GEOJSON_SCHEMA = T.StructType(
    [
        T.StructField("type", T.StringType()),
        # deepest nesting: MultiPolygon = array<array<array<array<double>>>>
        T.StructField("coordinates", T.ArrayType(
            T.ArrayType(T.ArrayType(T.ArrayType(T.DoubleType())))
        )),
    ]
)


def _point_from(arr: Column, dimension: str) -> Column:
    # F.get (not getItem): 2-D points have no z — ANSI mode would raise on
    # the out-of-bounds index; reference defaults z to 0 for 2-D input.
    return F.struct(
        F.lit(dimension).alias("dimension"),
        F.get(arr, 0).alias("x"),
        F.get(arr, 1).alias("y"),
        F.coalesce(F.get(arr, 2), F.lit(0.0)).alias("z"),
    )


def decode_geo_point(field: str, raw: Column, dimension: str = "GEOMETRY") -> Column:
    """GeoJSON Point → {dimension, x, y, z} (T15, l.241-248)."""
    g = F.from_json(raw, T.StructType([
        T.StructField("type", T.StringType()),
        T.StructField("coordinates", T.ArrayType(T.DoubleType())),
    ]))
    return F.when(raw.isNull(), F.lit(None)).otherwise(
        _point_from(g["coordinates"], dimension)
    )


def _linestring_from(coords: Column, dimension: str, type_name: str) -> Column:
    return F.struct(
        F.lit(type_name).alias("type"),
        F.lit(dimension).alias("dimension"),
        F.transform(coords, lambda p: _point_from(p, dimension)).alias("coordinates"),
    )


def decode_geo_linestring(
    field: str, raw: Column, dimension: str = "GEOMETRY", type_name: str = "LineString"
) -> Column:
    """GeoJSON LineString/MultiPoint → shared struct; `type` disambiguates
    (T16, l.250-262 — schema shared by design, comment at l.256)."""
    g = F.from_json(raw, T.StructType([
        T.StructField("type", T.StringType()),
        T.StructField("coordinates", T.ArrayType(T.ArrayType(T.DoubleType()))),
    ]))
    return F.when(raw.isNull(), F.lit(None)).otherwise(
        _linestring_from(g["coordinates"], dimension, type_name)
    )


def decode_geo_polygon(field: str, raw: Column, dimension: str = "GEOMETRY") -> Column:
    """GeoJSON Polygon → {exterior, interior[], numberOfInteriorRings}
    (T17, l.264-281: ring 0 = exterior, remaining rings = interior)."""
    g = F.from_json(raw, T.StructType([
        T.StructField("type", T.StringType()),
        T.StructField("coordinates", T.ArrayType(T.ArrayType(T.ArrayType(T.DoubleType())))),
    ]))
    rings = g["coordinates"]
    interior = F.slice(rings, 2, F.greatest(F.size(rings) - 1, F.lit(0)))
    return F.when(raw.isNull(), F.lit(None)).otherwise(
        F.struct(
            F.lit("Polygon").alias("type"),
            F.lit(dimension).alias("dimension"),
            F.transform(
                rings.getItem(0), lambda p: _point_from(p, dimension)
            ).alias("exterior"),
            F.transform(
                interior,
                lambda ring: F.struct(
                    F.lit("LineString").alias("type"),
                    F.lit(dimension).alias("dimension"),
                    F.transform(ring, lambda p: _point_from(p, dimension)).alias(
                        "coordinates"
                    ),
                ),
            ).alias("interior"),
            (F.size(rings) - 1).cast("int").alias("numberOfInteriorRings"),
        )
    )


def _polygon_from(rings: Column, dimension: str) -> Column:
    interior = F.slice(rings, 2, F.greatest(F.size(rings) - 1, F.lit(0)))
    return F.struct(
        F.lit("Polygon").alias("type"),
        F.lit(dimension).alias("dimension"),
        F.transform(rings.getItem(0), lambda p: _point_from(p, dimension)).alias(
            "exterior"
        ),
        F.transform(
            interior,
            lambda ring: F.struct(
                F.lit("LineString").alias("type"),
                F.lit(dimension).alias("dimension"),
                F.transform(ring, lambda p: _point_from(p, dimension)).alias(
                    "coordinates"
                ),
            ),
        ).alias("interior"),
        (F.size(rings) - 1).cast("int").alias("numberOfInteriorRings"),
    )


def decode_geo_multipolygon(
    field: str, raw: Column, dimension: str = "GEOMETRY"
) -> Column:
    """GeoJSON MultiPolygon → {type, dimension, coordinates: array<polygon>}
    (T18, transformer l.304-323)."""
    g = F.from_json(raw, T.StructType([
        T.StructField("type", T.StringType()),
        T.StructField("coordinates", T.ArrayType(
            T.ArrayType(T.ArrayType(T.ArrayType(T.DoubleType())))
        )),
    ]))
    return F.when(raw.isNull(), F.lit(None)).otherwise(
        F.struct(
            F.lit("MultiPolygon").alias("type"),
            F.lit(dimension).alias("dimension"),
            F.transform(
                g["coordinates"], lambda rings: _polygon_from(rings, dimension)
            ).alias("coordinates"),
        )
    )


def decode_geo_multilinestring(
    field: str, raw: Column, dimension: str = "GEOMETRY"
) -> Column:
    """GeoJSON MultiLineString → {type, dimension, coordinates:
    array<linestring>} (T18, transformer l.283-303)."""
    g = F.from_json(raw, T.StructType([
        T.StructField("type", T.StringType()),
        T.StructField("coordinates", T.ArrayType(
            T.ArrayType(T.ArrayType(T.DoubleType()))
        )),
    ]))
    return F.when(raw.isNull(), F.lit(None)).otherwise(
        F.struct(
            F.lit("MultiLineString").alias("type"),
            F.lit(dimension).alias("dimension"),
            F.transform(
                g["coordinates"],
                lambda coords: _linestring_from(coords, dimension, "LineString"),
            ).alias("coordinates"),
        )
    )


def decode_geo_collection(
    field: str, raw: Column, dimension: str = "GEOMETRY"
) -> Column:
    """GeoJSON GeometryCollection → 6 typed arrays (T19, transformer
    l.199-239: a heterogeneous collection is partitioned into points[],
    lineStrings[], polygons[], multiPoints[], multiLineStrings[],
    multiPolygons[]; type tag = 'GeometryCollection'). Nested collections
    are unsupported — same limitation as the reference (l.197-199).

    Heterogeneous members can't share one from_json schema, so this uses
    Spark 4 VARIANT: parse once, filter members by type, extract each
    shape's coordinates at its own depth — all JVM-side."""
    geoms = F.try_variant_get(F.parse_json(raw), "$.geometries", "array<variant>")

    def members(kind):
        return F.filter(
            geoms,
            lambda m: F.try_variant_get(m, "$.type", "string") == kind,
        )

    def coords(m, typ):
        return F.try_variant_get(m, "$.coordinates", typ)

    A1 = "array<double>"
    A2 = "array<array<double>>"
    A3 = "array<array<array<double>>>"
    A4 = "array<array<array<array<double>>>>"

    return F.when(raw.isNull(), F.lit(None)).otherwise(
        F.struct(
            F.lit("GeometryCollection").alias("type"),
            F.lit(dimension).alias("dimension"),
            F.transform(
                members("Point"), lambda m: _point_from(coords(m, A1), dimension)
            ).alias("points"),
            F.transform(
                members("LineString"),
                lambda m: _linestring_from(coords(m, A2), dimension, "LineString"),
            ).alias("lineStrings"),
            F.transform(
                members("Polygon"),
                lambda m: _polygon_from(coords(m, A3), dimension),
            ).alias("polygons"),
            F.transform(
                members("MultiPoint"),
                lambda m: _linestring_from(coords(m, A2), dimension, "MultiPoint"),
            ).alias("multiPoints"),
            F.transform(
                members("MultiLineString"),
                lambda m: F.struct(
                    F.lit("MultiLineString").alias("type"),
                    F.lit(dimension).alias("dimension"),
                    F.transform(
                        coords(m, A3),
                        lambda c: _linestring_from(c, dimension, "LineString"),
                    ).alias("coordinates"),
                ),
            ).alias("multiLineStrings"),
            F.transform(
                members("MultiPolygon"),
                lambda m: F.struct(
                    F.lit("MultiPolygon").alias("type"),
                    F.lit(dimension).alias("dimension"),
                    F.transform(
                        coords(m, A4), lambda rings: _polygon_from(rings, dimension)
                    ).alias("coordinates"),
                ),
            ).alias("multiPolygons"),
        )
    )


def decode_enum(field: str, raw: Column, members: dict[str, int]) -> Column:
    """V4 enum property (T21 completion, odata/ODataEntity.java:97-99):
    the reference extracts ``ClientEnumValue.getValue()`` — the member-name
    string. Wire forms accepted: a member name, a comma-joined flags
    combination ('Red,Blue'), the underlying numeric value (mapped back
    to its member name), or a numeric *flags combination* (e.g. '3' for
    Red|Blue — decomposed bitwise into member names in declaration order,
    symmetric with the string form). Unknown members / non-decomposable
    numerics raise, matching the reference's unsupported-value error path
    (ODataEntity.java:104-105)."""
    by_value = {}
    for name, value in members.items():
        by_value.setdefault(str(value), name)
    value_map = F.create_map(
        *[F.lit(x) for kv in by_value.items() for x in kv]
    )
    names_arr = F.array(*[F.lit(n) for n in members])
    parts = F.split(raw, ",")
    all_members = F.forall(
        parts, lambda p: F.array_contains(names_arr, F.trim(p))
    )
    # numeric flags combination: greedy largest-value-first cover (the
    # .NET Enum.ToString flags algorithm) — picks a MINIMAL member set,
    # so a composite alias member (ReadWrite=3) is preferred over its
    # constituent parts rather than emitted alongside them. Accepted only
    # if the picked members cover the whole number (no stray bits).
    num = raw.try_cast("long")
    by_value_desc = sorted(members.items(), key=lambda kv: -int(kv[1]))
    pairs_desc = F.array(
        *[
            F.struct(F.lit(n).alias("n"), F.lit(int(v)).cast("long").alias("v"))
            for n, v in by_value_desc
        ]
    )
    acc0 = F.struct(
        F.coalesce(num, F.lit(-1)).alias("rem"),
        F.array().cast("array<string>").alias("sel"),
    )
    picked = F.aggregate(
        pairs_desc,
        acc0,
        lambda acc, p: F.when(
            (p["v"] != 0) & (acc["rem"].bitwiseAND(p["v"]) == p["v"]),
            F.struct(
                acc["rem"].bitwiseAND(F.bitwise_not(p["v"])).alias("rem"),
                F.array_append(acc["sel"], p["n"]).alias("sel"),
            ),
        ).otherwise(acc),
    )
    flags_ok = (
        num.isNotNull() & (picked["rem"] == 0) & (F.size(picked["sel"]) > 0)
    )
    # emit in declaration order (member-name parity with the string form)
    flags_str = F.concat_ws(
        ",", F.filter(names_arr, lambda n: F.array_contains(picked["sel"], n))
    )
    # fallback cover: greedy can miss a valid decomposition when member
    # values overlap without nesting (e.g. {A:6, B:3} and 7 — greedy
    # takes A, strands bit 0); if the OR of ALL bit-subset members covers
    # the number, emit that full set rather than raising
    all_pairs = F.array(
        *[
            F.struct(F.lit(n).alias("n"), F.lit(int(v)).cast("long").alias("v"))
            for n, v in members.items()
        ]
    )
    subset_members = F.filter(
        all_pairs, lambda p: (p["v"] != 0) & (num.bitwiseAND(p["v"]) == p["v"])
    )
    or_cover = F.aggregate(
        subset_members, F.lit(0).cast("long"), lambda acc, p: acc.bitwiseOR(p["v"])
    )
    cover_ok = num.isNotNull() & (F.size(subset_members) > 0) & (or_cover == num)
    cover_str = F.concat_ws(
        ",", F.transform(subset_members, lambda p: p["n"])
    )
    parsed = (
        F.when(all_members, F.concat_ws(",", F.transform(parts, F.trim)))
        .when(value_map[raw].isNotNull(), value_map[raw])
        .when(flags_ok, flags_str)
        .when(cover_ok, cover_str)
    )
    return _checked(field, "enum", raw, parsed)


def decode_collection(field: str, raw: Column, element_edm_type: str) -> Column:
    """V4 collection property (T21, odata/ODataEntity.java:91-93): JSON
    array of primitive wire values → typed Spark array. Complex element
    types are rejected, matching 'Complex types are not supported'
    (ODataEntity.java:100-102)."""
    from sap_spark.schema.edm import UnsupportedTypeError

    try:
        elem = edm_to_spark_type(element_edm_type)
    except UnsupportedTypeError as e:
        raise UnexpectedFormatError(
            f"Collection element type not supported: {element_edm_type!r} "
            "(complex types are not supported)"
        ) from e
    if not isinstance(
        elem, (T.StringType, T.IntegerType, T.LongType, T.FloatType,
               T.DoubleType, T.BooleanType, T.BinaryType, T.TimestampType)
    ):
        raise UnexpectedFormatError(
            f"Collection element type not supported: {element_edm_type!r} "
            "(complex types are not supported)"
        )
    return F.from_json(raw, T.ArrayType(elem))


# -- entity-level decode ----------------------------------------------------------


_DECODERS = {
    "Edm.Boolean": decode_boolean,
    "Edm.Byte": decode_int,
    "Edm.SByte": decode_int,
    "Edm.Int16": decode_int,
    "Edm.Int32": decode_int,
    "Edm.Int64": decode_long,
    "Edm.Single": decode_float,
    "Edm.Double": decode_double,
    "Edm.String": decode_string,
    "Edm.Guid": decode_string,
    "Edm.Binary": decode_binary,
    "Edm.DateTime": decode_timestamp,
    "Edm.Date": decode_timestamp,
    "Edm.DateTimeOffset": decode_datetimeoffset,
    "Edm.Time": decode_time_micros,
    "Edm.TimeOfDay": decode_time_micros,
    "Edm.Duration": decode_duration,
}


def decode_property(prop: PropertyMetadata, raw: Column) -> Column:
    """Dispatch one property (extractValue, transformer l.92-164)."""
    t = prop.edm_type
    if getattr(prop, "enum_members", None) is not None:
        return decode_enum(prop.name, raw, prop.enum_members)
    if t.startswith("Collection(") and t.endswith(")"):
        return decode_collection(prop.name, raw, t[len("Collection("):-1])
    if t in _DECODERS:
        return _DECODERS[t](prop.name, raw)
    if t == "Edm.Decimal":
        p = prop.precision if prop.precision is not None else 38
        return make_decimal_decoder(prop.name, p, prop.scale or 0)(raw)
    for prefix in ("Edm.Geography", "Edm.Geometry"):
        if t.startswith(prefix):
            dim = "GEOGRAPHY" if prefix == "Edm.Geography" else "GEOMETRY"
            shape = t[len(prefix):]
            if shape == "Point":
                return decode_geo_point(prop.name, raw, dim)
            if shape == "LineString":
                return decode_geo_linestring(prop.name, raw, dim, "LineString")
            if shape == "MultiPoint":
                return decode_geo_linestring(prop.name, raw, dim, "MultiPoint")
            if shape == "Polygon":
                return decode_geo_polygon(prop.name, raw, dim)
            if shape == "MultiLineString":
                return decode_geo_multilinestring(prop.name, raw, dim)
            if shape == "MultiPolygon":
                return decode_geo_multipolygon(prop.name, raw, dim)
            if shape == "Collection":
                return decode_geo_collection(prop.name, raw, dim)
    raise UnexpectedFormatError(f"Unsupported EDM type for decode: {t!r}")


def decode_entity(df: DataFrame, entity: EntityType) -> DataFrame:
    """Decode a DataFrame of wire-string columns into the entity's typed
    schema — the whole-transformer analog (transform, l.73-83), one
    vectorized select instead of a per-row loop.

    Stream properties: the feed parser (sources/odata_feed.py) merges V4
    read/edit media links by property name into four wire columns
    ``P__mediaEtag`` … ``P__mediaEditLink`` (T14, ODataEntity.java:70-84);
    here they fold into the StreamProperty struct (T13). A stream property
    with none of its media columns present decodes to a null struct."""
    cols = []
    for prop in entity.properties:
        if prop.edm_type == "Edm.Stream":
            media = [f"{prop.name}__{s}" for s in (
                "mediaEtag", "mediaContentType", "mediaReadLink", "mediaEditLink"
            )]
            parts = [
                F.col(c) if c in df.columns else F.lit(None).cast("string")
                for c in media
            ]
            struct = build_stream_property(*parts)
            cols.append(
                F.when(
                    F.coalesce(*parts).isNull(), F.lit(None).cast(STREAM_PROPERTY_STRUCT)
                )
                .otherwise(struct)
                .alias(prop.name)
            )
            continue
        raw = F.col(prop.name)
        cols.append(decode_property(prop, raw).alias(prop.name))
    return df.select(*cols)
