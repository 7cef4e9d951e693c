"""OData wire-format feed parsing: response documents → wire-string rows.

The reference's core read path turns an HTTP response document into rows:
V2 via Olingo `EntityProvider.readFeed` over Atom-XML or JSON
(odata/odata2/OData2Client.java:94) and V4 via a lazy
`ClientEntitySetIterator` over JSON pages (odata/odata4/OData4Client.java:71).
This module is that path re-expressed for Spark:

- the unit of parallelism is the **feed document** (one server page). A
  corpus of staged pages is a DataFrame with one payload string per row;
  ``parse_feed_documents`` fans the parse out across executors with
  ``mapInPandas`` (Arrow batches of documents in, Arrow batches of entity
  rows out — one Python parse per *document*, never per row/field), so a
  million staged pages parse with full cluster parallelism where the
  reference parsed one feed on one thread.
- output is one **wire-string column per property** — exactly the input
  convention of ``functions/decode.decode_entity``, which then runs the
  typed decode as native/vectorized column kernels. Parsing (this module)
  and decoding (decode.py) stay separate so the decode hot path keeps
  whole-stage codegen.

Formats, matching what the reference's clients actually emit/consume:

- **V2 Atom-XML** (``<feed><entry><content><m:properties><d:Prop>``),
  the `$format=xml` / default path of `SapOData2SourceETLTest`;
- **V2 JSON** (``{"d": {"results": [...]}}``), the `$format=json` path;
- **V4 JSON** (``{"value": [...]}`` with ``@odata.*`` annotations), the
  Olingo V4 client's wire format;
- **V4 Atom-XML** including GML geospatial payloads (converted to GeoJSON
  text for the geo kernels) and media-link elements.

Wire-value conventions produced (consumed by decode.py):

- scalars: the lexical form from the document (JSON numbers keep their
  source text via ``parse_float/parse_int`` hooks; booleans → "true"/"false");
- V2 ``/Date(millis[+offset])/`` JSON datetimes are normalized to ISO-8601
  so the timestamp kernel (T8) parses them;
- geospatial objects: re-serialized GeoJSON text (geo kernels T15-T20);
- collections: JSON array text (T21);
- enums: the member-name string (Olingo ``ClientEnumValue.getValue()``
  parity, odata/ODataEntity.java:97-99);
- stream properties: the V4 ``P@odata.media{Etag,ContentType,ReadLink,
  EditLink}`` annotations are merged **by property name** into four
  columns ``P__mediaEtag`` … ``P__mediaEditLink`` (the read-link/edit-link
  merge of odata/ODataEntity.java:70-84, T14); ``decode_entity`` folds
  them into the StreamProperty struct (T13).
"""

from __future__ import annotations

import json
import re
import xml.etree.ElementTree as ET
from typing import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from sap_spark.schema.edm import EntityType

# Atom/OData XML namespaces (V2).
_NS_ATOM = "http://www.w3.org/2005/Atom"
_NS_M = "http://schemas.microsoft.com/ado/2007/08/dataservices/metadata"
_NS_D = "http://schemas.microsoft.com/ado/2007/08/dataservices"

_V2_DATE_RE = re.compile(r"^/Date\((-?\d+)([+-]\d{1,4})?\)/$")

STREAM_SUFFIXES = ("mediaEtag", "mediaContentType", "mediaReadLink", "mediaEditLink")


class FeedParseError(ValueError):
    """Malformed feed document."""


class StagerError(RuntimeError):
    """A page fetch failed permanently mid-chain. Carries the resume
    state so the caller can continue WITHOUT re-staging (already-spooled
    pages stay staged; re-running from the first URL would append
    duplicate payload rows):

    - ``resume_url``: the page that failed — pass as ``first_url``;
    - ``next_seq``: pass as ``seq_start`` (keeps event_seq ranges disjoint);
    - ``pages_staged``: pages successfully spooled before the failure;
    - ``delta_link``: the last delta link seen, if any.
    """

    def __init__(self, message, resume_url, next_seq, pages_staged, delta_link):
        super().__init__(message)
        self.resume_url = resume_url
        self.next_seq = next_seq
        self.pages_staged = pages_staged
        self.delta_link = delta_link


def detect_format(payload: str) -> str:
    """'json' or 'atom-xml' — the $format dispatch (P6)."""
    head = payload.lstrip()[:1]
    if head == "{":
        return "json"
    if head == "<":
        return "atom-xml"
    raise FeedParseError(f"unrecognized feed payload (starts {payload[:20]!r})")


def stream_columns(name: str) -> list[str]:
    """The four wire columns a stream property expands to."""
    return [f"{name}__{s}" for s in STREAM_SUFFIXES]


def wire_schema(entity: EntityType) -> T.StructType:
    """Schema of the wire-string frame for an entity type: one string
    column per property; stream properties expand to their four media
    columns."""
    fields: list[T.StructField] = []
    for p in entity.properties:
        if p.edm_type == "Edm.Stream":
            fields.extend(
                T.StructField(c, T.StringType(), True) for c in stream_columns(p.name)
            )
        else:
            fields.append(T.StructField(p.name, T.StringType(), True))
    return T.StructType(fields)


# -- scalar-to-wire normalization -------------------------------------------


def _wire_str(value) -> str | None:
    """JSON value → wire string (lexical form preserved for numbers via the
    _RawNum parse hooks; bool → OData lowercase literals; objects/arrays →
    their JSON text for the geo/collection kernels)."""
    if value is None:
        return None
    if isinstance(value, bool):
        return "true" if value else "false"
    if isinstance(value, _RawNum):
        return value.raw
    if isinstance(value, (dict, list)):
        return _dumps_raw(value)
    s = str(value)
    m = _V2_DATE_RE.match(s)
    if m:
        return _v2_epoch_to_iso(int(m.group(1)), m.group(2))
    return s


class _RawNum:
    """Number wrapper keeping the document's lexical form (so e.g. a
    Double survives as its source text instead of a repr round-trip)."""

    __slots__ = ("raw",)

    def __init__(self, raw: str):
        self.raw = raw

    def __repr__(self):  # pragma: no cover - debugging aid
        return self.raw


def _dumps_raw(o) -> str:
    """json.dumps that re-emits _RawNum tokens with their source lexical
    form. The stdlib encoder cannot splice raw tokens (no json.RawJSON), so
    numbers nested inside collections/geo objects would round-trip through
    float() — losing precision for Int64 > 2^53 and turning '[1, 2]' into
    '[1.0, 2.0]', which a from_json(array<long>) decode then nulls out.
    This tiny recursive serializer keeps every numeric token verbatim."""
    if isinstance(o, _RawNum):
        return o.raw
    if isinstance(o, dict):
        return (
            "{"
            + ", ".join(f"{json.dumps(k)}: {_dumps_raw(v)}" for k, v in o.items())
            + "}"
        )
    if isinstance(o, (list, tuple)):
        return "[" + ", ".join(_dumps_raw(v) for v in o) + "]"
    return json.dumps(o)


def _loads_preserving(payload: str):
    """json.loads with numeric lexical forms preserved as _RawNum."""
    return json.loads(payload, parse_float=_RawNum, parse_int=_RawNum)


def _v2_epoch_to_iso(millis: int, offset_minutes: str | None) -> str:
    """V2 JSON '/Date(millis[+offset])/' → ISO-8601 (offset applied, kept)."""
    from datetime import datetime, timedelta, timezone

    tz = timezone.utc
    if offset_minutes:
        tz = timezone(timedelta(minutes=int(offset_minutes)))
    dt = datetime.fromtimestamp(millis / 1000.0, tz=tz)
    iso = dt.strftime("%Y-%m-%dT%H:%M:%S")
    if millis % 1000:
        iso += f".{millis % 1000:03d}"
    if offset_minutes:
        iso += dt.strftime("%z")
        iso = iso[:-2] + ":" + iso[-2:]
    return iso


# -- per-document parsers ---------------------------------------------------


def _parse_v2_json(payload: str) -> list[dict[str, str | None]]:
    doc = _loads_preserving(payload)
    d = doc.get("d", doc)
    results = d.get("results", d if isinstance(d, list) else [d])
    out = []
    for row in results:
        if not isinstance(row, dict):
            raise FeedParseError("V2 JSON feed entry is not an object")
        out.append(
            {k: _wire_str(v) for k, v in row.items() if k != "__metadata"}
        )
    return out


def _parse_v4_json(payload: str) -> list[dict[str, str | None]]:
    doc = _loads_preserving(payload)
    rows = doc.get("value")
    if rows is None:
        rows = [doc]  # single-entity response
    out = []
    for row in rows:
        entry: dict[str, str | None] = {}
        for k, v in row.items():
            if k.startswith("@"):
                continue  # document-level control info (@odata.context, …)
            if "@" in k:
                # property annotation: media links merge by property name
                # (the T14 read/edit-link merge), type annotations dropped
                name, anno = k.split("@", 1)
                if anno.startswith("odata.media"):
                    entry[f"{name}__{anno[len('odata.'):]}"] = _wire_str(v)
                continue
            entry[k] = _wire_str(v)
        out.append(entry)
    return out


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _gml_positions(el: ET.Element) -> list[list[float]]:
    return [
        [float(x) for x in pos.text.split()]
        for pos in el
        if _local(pos.tag) == "pos" and pos.text and pos.text.strip()
    ]


def _gml_ring(ring_holder: ET.Element) -> list[list[float]]:
    """exterior/interior → LinearRing → pos* coordinates."""
    for child in ring_holder:
        if _local(child.tag) == "LinearRing":
            return _gml_positions(child)
    return _gml_positions(ring_holder)


def _gml_members(el: ET.Element, *container_names: str) -> list[ET.Element]:
    """Children of gml:xxxMembers / gml:xxxMember wrappers (both arities)."""
    out: list[ET.Element] = []
    for child in el:
        if _local(child.tag) in container_names:
            out.extend(list(child))
    return out


def _gml_to_geojson(el: ET.Element, siblings: list[ET.Element] | None = None):
    """One GML geometry element → GeoJSON dict (the conversion Olingo's
    Atom deserializer performs before the transformer sees a Geospatial
    value). Handles the Olingo fixture quirk of a self-closed
    ``<gml:Polygon/>`` whose ring positions sit as *siblings* under the
    property element (odata4/AllDataTypes.xml GeographyPolygon)."""
    kind = _local(el.tag)
    if kind == "Point":
        pts = _gml_positions(el)
        return {"type": "Point", "coordinates": pts[0] if pts else []}
    if kind == "LineString":
        return {"type": "LineString", "coordinates": _gml_positions(el)}
    if kind == "Polygon":
        exterior: list[list[float]] = []
        interiors: list[list[list[float]]] = []
        for child in el:
            if _local(child.tag) == "exterior":
                exterior = _gml_ring(child)
            elif _local(child.tag) == "interior":
                interiors.append(_gml_ring(child))
        if not exterior:
            # the fixture's other Polygon spelling: ring positions as
            # direct children, no <gml:exterior> wrapper (odata4
            # AllDataTypes.xml geometryMembers Polygon)
            exterior = _gml_positions(el)
        if not exterior and siblings:
            exterior = [
                [float(x) for x in s.text.split()]
                for s in siblings
                if _local(s.tag) == "pos" and s.text and s.text.strip()
            ]
        return {"type": "Polygon", "coordinates": [exterior, *interiors]}
    if kind == "MultiPoint":
        pts = [
            _gml_to_geojson(p)["coordinates"]
            for p in _gml_members(el, "pointMembers", "pointMember")
        ]
        return {"type": "MultiPoint", "coordinates": pts}
    if kind == "MultiCurve":
        lines = [
            _gml_to_geojson(c)["coordinates"]
            for c in _gml_members(el, "curveMembers", "curveMember")
        ]
        return {"type": "MultiLineString", "coordinates": lines}
    if kind == "MultiSurface":
        polys = [
            _gml_to_geojson(p)["coordinates"]
            for p in _gml_members(el, "surfaceMembers", "surfaceMember")
        ]
        return {"type": "MultiPolygon", "coordinates": polys}
    if kind == "MultiGeometry":
        members = [
            _gml_to_geojson(g)
            for g in _gml_members(el, "geometryMembers", "geometryMember")
        ]
        return {"type": "GeometryCollection", "geometries": members}
    raise FeedParseError(f"unsupported GML geometry <{kind}>")


_MEDIA_REL_SUFFIX = {
    "edit-media": "mediaEditLink",
    "mediaresource": "mediaReadLink",
}


def _atom_media_links(entry: ET.Element) -> dict[str, str | None]:
    """V4 Atom media links: <link rel=".../edit-media/P"> and
    <link rel=".../mediaresource/P"> merged by property name P (the T14
    read/edit-link merge, odata/ODataEntity.java:70-84)."""
    out: dict[str, str | None] = {}
    for link in entry:
        if _local(link.tag) != "link":
            continue
        rel = link.attrib.get("rel", "")
        for marker, suffix in _MEDIA_REL_SUFFIX.items():
            token = f"/{marker}/"
            if token in rel:
                prop = rel.rsplit("/", 1)[-1]
                out[f"{prop}__{suffix}"] = link.attrib.get("href")
                if "type" in link.attrib:
                    out[f"{prop}__mediaContentType"] = link.attrib["type"]
    return out


def _parse_atom(payload: str) -> list[dict[str, str | None]]:
    """Atom feed (V2 or V4 — same envelope, different d/m namespaces and
    geo encodings) → wire rows. Scalar properties yield their text; GML
    children are converted to GeoJSON text for the geo kernels; m:null
    attributes yield null; media link elements merge into the stream
    property's four wire columns."""
    try:
        root = ET.fromstring(payload)
    except ET.ParseError as e:
        raise FeedParseError(f"unparseable Atom feed: {e}") from e
    entries = [e for e in root if _local(e.tag) == "entry"]
    if not entries and _local(root.tag) == "entry":
        entries = [root]  # single-entry response
    out = []
    for entry in entries:
        props = None
        for content in entry:
            if _local(content.tag) == "content":
                for c in content:
                    if _local(c.tag) == "properties":
                        props = c
            elif _local(content.tag) == "properties":
                props = content  # media entries keep properties outside
        if props is None:
            raise FeedParseError("Atom entry without m:properties content")
        row: dict[str, str | None] = dict(_atom_media_links(entry))
        for el in props:
            name = _local(el.tag)
            null_attr = next(
                (v for k, v in el.attrib.items() if _local(k) == "null"), ""
            )
            if null_attr.lower() == "true":
                row[name] = None
                continue
            geo_children = [c for c in el if _local(c.tag) != "pos"]
            if geo_children:
                row[name] = json.dumps(
                    _gml_to_geojson(geo_children[0], siblings=list(el))
                )
            else:
                row[name] = (el.text or "").strip() or None
        out.append(row)
    return out


def parse_document(payload: str, version: str | None = None) -> list[dict]:
    """One feed document → list of wire-string dicts (driver-side helper;
    the distributed path is :func:`parse_feed_documents`)."""
    fmt = detect_format(payload)
    if fmt == "atom-xml":
        return _parse_atom(payload)
    doc_version = version
    if doc_version is None:
        head = payload[:2048]
        doc_version = "2.0" if '"d"' in head and '"results"' in head else "4.0"
    if doc_version.startswith("2"):
        return _parse_v2_json(payload)
    return _parse_v4_json(payload)


# -- distributed parse ------------------------------------------------------


def parse_feed_documents(
    docs: DataFrame,
    entity: EntityType,
    version: str | None = None,
    payload_col: str = "payload",
) -> DataFrame:
    """DataFrame of feed documents → DataFrame of wire-string columns.

    Each input row carries one response document (one server page staged to
    storage); ``mapInPandas`` parses each Arrow batch of documents into
    entity rows with one string column per property (stream properties →
    four media columns). Feed pages are the parallel unit: repartition the
    staged-page frame to spread documents across executors. Feed
    properties absent from the entity type are dropped (schema is the
    contract, as in the reference transformer); entity properties absent
    from a document yield null (T1).
    """
    out_schema = wire_schema(entity)
    names = [f.name for f in out_schema.fields]

    def parse_batches(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows: list[dict] = []
            for payload in batch[payload_col]:
                if payload is None:
                    continue
                rows.extend(parse_document(payload, version))
            yield pd.DataFrame(
                {n: [r.get(n) for r in rows] for n in names}, dtype=object
            )

    return docs.mapInPandas(parse_batches, schema=out_schema)


def _parse_v4_delta(payload: str) -> list[dict[str, str | None]]:
    """V4 delta response (OData JSON Format §15, the protocol-level analog
    of an SAP ODP delta queue): entries are upserts unless annotated
    ``@odata.removed`` (→ delete). Emits the wire row plus ``__op``
    ('U' or 'D') and ``__removed_reason`` ('deleted' | 'changed' | None)."""
    doc = _loads_preserving(payload)
    rows = doc.get("value")
    if rows is None:
        raise FeedParseError("delta response without a 'value' array")
    out = []
    for row in rows:
        removed = row.get("@odata.removed")
        entry: dict[str, str | None] = {
            "__op": "D" if removed is not None else "U",
            "__removed_reason": (
                (removed or {}).get("reason") if removed is not None else None
            ),
        }
        for k, v in row.items():
            if k.startswith("@") or "@" in k:
                continue
            entry[k] = _wire_str(v)
        out.append(entry)
    return out


def delta_feed_to_changelog(
    docs: DataFrame,
    entity: EntityType,
    key_columns: list[str],
    payload_col: str = "payload",
    token_col: str = "delta_token",
    seq_col: str = "event_seq",
) -> DataFrame:
    """V4 delta-response documents → the engine's change-event envelope.

    This is the bridge between the wire half (this module) and the CDC
    half (operators/dedup, streaming/pipeline): each staged delta response
    is one **delta unit** — its ``@odata.deltaLink``/token identifies the
    checkpoint, its entries become I/U/D change events, and the resulting
    frame folds/merges through the same LWW + MERGE machinery as any SLT
    log. Input rows: (payload, delta_token, event_seq_base) — the stager
    assigns a monotone sequence base per page; entries within a page are
    ordered as delivered (OData delta responses are ordered).

    Output: key…, wire-string payload columns, op ('U'/'D' — OData deltas
    carry no insert/update distinction; the MERGE upsert semantics make
    'U' correct for both), ``seq_col`` (monotone), ``token_col``.
    """
    wire = wire_schema(entity)
    out_schema = T.StructType(
        list(wire.fields)
        + [
            T.StructField("op", T.StringType(), False),
            T.StructField(seq_col, T.LongType(), False),
            T.StructField(token_col, T.StringType(), False),
        ]
    )
    names = [f.name for f in wire.fields]

    def parse_batches(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            recs: list[dict] = []
            for payload, token, base in zip(
                batch[payload_col], batch[token_col], batch["event_seq_base"]
            ):
                if payload is None:
                    continue
                for i, row in enumerate(_parse_v4_delta(payload)):
                    rec = {n: row.get(n) for n in names}
                    rec["op"] = row["__op"]
                    rec[seq_col] = int(base) + i
                    rec[token_col] = token
                    recs.append(rec)
            yield pd.DataFrame(
                {
                    n: pd.Series([r.get(n) for r in recs], dtype=object)
                    if n in names + ["op", token_col]
                    else pd.Series([r.get(n) for r in recs], dtype="int64")
                    for n in [*names, "op", seq_col, token_col]
                }
            )

    out = docs.mapInPandas(parse_batches, schema=out_schema)
    missing = [k for k in key_columns if k not in names]
    if missing:
        raise FeedParseError(f"key columns not in entity type: {missing}")
    return out


def feed_control(payload: str) -> dict:
    """Paging control info of one feed document — the lazy server-paging
    loop of the reference's V4 client (`ClientEntitySetIterator` following
    `@odata.nextLink`, odata4/OData4Client.java:64-73; V2 uses
    `__next`/`$skiptoken`). A stager loops: fetch page → stage payload →
    follow `next_link` until None; the staged corpus then parses in
    parallel via :func:`parse_feed_documents` (paging ≈ micro-batching).

    Returns {"next_link": str|None, "count": int|None, "context": str|None}.
    """
    out: dict = {
        "next_link": None, "count": None, "context": None, "delta_link": None,
    }
    if detect_format(payload) == "atom-xml":
        try:
            root = ET.fromstring(payload)
        except ET.ParseError as e:
            raise FeedParseError(f"unparseable Atom feed: {e}") from e
        for el in root:
            if _local(el.tag) == "link" and el.attrib.get("rel") == "next":
                out["next_link"] = el.attrib.get("href")
            if _local(el.tag) == "count" and el.text:
                out["count"] = int(el.text.strip())
        return out
    doc = json.loads(payload)
    d = doc.get("d", doc)
    out["next_link"] = d.get("@odata.nextLink") or d.get("__next")
    out["delta_link"] = d.get("@odata.deltaLink")
    out["context"] = d.get("@odata.context")
    count = d.get("@odata.count") or d.get("__count")
    if count is not None:
        out["count"] = int(count)
    return out


def stage_feed_pages(
    spark: SparkSession,
    fetch: "callable",
    first_url: str,
    out_dir: str,
    token: str,
    seq_start: int = 0,
    seq_stride: int = 1_000_000,
    max_pages: int = 100_000,
    spool_pages: int = 64,
    retries: int = 3,
    retry_backoff: float = 0.5,
    auth: "callable | None" = None,
    sleep: "callable" = None,
    retryable: "callable | tuple | None" = None,
) -> dict:
    """The stager loop: follow server paging from ``first_url`` via
    ``fetch(url) → payload`` (the single I/O-bound, driver-side step —
    the reference's `ClientEntitySetIterator` pull loop), writing one row
    per page to ``out_dir/delta_token=<token>/`` in the
    ``(payload, delta_token, event_seq_base)`` layout that
    ``parse_feed_documents`` / ``odata_delta_pipeline`` consume in
    parallel. Returns {"pages", "next_seq", "delta_link"}.

    Scale notes:

    - fetching is inherently sequential per delta link (each page names
      the next), so the loop is a thin driver-side spool; ALL parsing/
      decoding happens later, distributed over the staged corpus. Each
      page gets a disjoint ``event_seq_base`` range (stride = max
      entries per page the service can emit).
    - **bounded memory**: at most ``spool_pages`` payloads are ever held;
      each full spool is appended to ``out_dir`` and the buffer cleared,
      so a 100k-page chain streams through constant driver memory
      instead of accumulating GBs before one write.
    - **retry/backoff**: each page fetch is retried ``retries`` times
      with exponential backoff (``retry_backoff * 2^attempt`` seconds).
      On permanent failure the buffered pages are spooled first, then a
      :class:`StagerError` is raised carrying ``resume_url`` /
      ``next_seq`` — rerun with those as ``first_url`` / ``seq_start``
      to continue the chain without duplicating staged pages.
    - **auth hook**: when ``auth`` is given, each attempt calls
      ``fetch(url, auth())`` — ``auth()`` returning fresh headers (e.g.
      a renewed bearer token, the SapODataConfig user/password analog);
      otherwise ``fetch(url)``.
    - **retryable**: by default every exception is retried; pass an
      exception type / tuple of types, or a ``predicate(exc) -> bool``,
      to make permanent failures (auth rejection, 404) raise immediately
      instead of paying the full retries×backoff delay. Non-retryable
      errors still carry the same :class:`StagerError` resume state.
    """
    import time as _time

    sleep = sleep or _time.sleep

    def _is_retryable(e: Exception) -> bool:
        if retryable is None:
            return True
        if isinstance(retryable, (type, tuple)):
            return isinstance(e, retryable)
        return bool(retryable(e))

    def fetch_with_retry(url: str) -> str:
        last_exc: Exception | None = None
        for attempt in range(retries + 1):
            try:
                return fetch(url, auth()) if auth is not None else fetch(url)
            except Exception as e:  # noqa: BLE001 — transient transport errors
                last_exc = e
                if not _is_retryable(e):
                    break  # permanent failure: no backoff, fail now
                if attempt < retries:
                    sleep(retry_backoff * (2 ** attempt))
        raise last_exc  # re-raised as StagerError by the loop (with state)

    def spool(rows: list[tuple[str, str, int]]) -> None:
        (
            spark.createDataFrame(
                rows, "payload string, delta_token string, event_seq_base long"
            )
            .coalesce(1)
            .write.mode("append")
            .partitionBy("delta_token")
            .parquet(out_dir)
        )

    rows: list[tuple[str, str, int]] = []
    url: str | None = first_url
    seq = seq_start
    pages = 0
    delta_link = None
    # resume point if the buffer is lost: the first buffered page's URL
    buffer_url: str | None = first_url
    buffer_seq = seq_start
    while url is not None and pages < max_pages:
        if not rows:
            buffer_url, buffer_seq = url, seq
        try:
            payload = fetch_with_retry(url)
        except Exception as e:  # noqa: BLE001
            try:
                if rows:
                    spool(rows)  # nothing buffered is lost
                resume_url, resume_seq, staged = url, seq, pages
            except Exception:  # noqa: BLE001 — spool itself failed:
                # buffered pages are gone; resume from the buffer's start
                resume_url, resume_seq = buffer_url, buffer_seq
                staged = pages - len(rows)
            raise StagerError(
                f"page fetch failed after {retries} retries at {url!r}: {e}",
                resume_url=resume_url,
                next_seq=resume_seq,
                pages_staged=staged,
                delta_link=delta_link,
            ) from e
        rows.append((payload, token, seq))
        seq += seq_stride
        pages += 1
        control = feed_control(payload)
        url = control["next_link"]
        delta_link = control["delta_link"] or delta_link
        if len(rows) >= spool_pages:
            try:
                spool(rows)
            except Exception as e:  # noqa: BLE001 — same guarantee as the
                # fetch-failure and final-spool paths: resume state survives
                raise StagerError(
                    f"spool failed after {pages} pages: {e}",
                    resume_url=buffer_url,
                    next_seq=buffer_seq,
                    pages_staged=pages - len(rows),
                    delta_link=delta_link,
                ) from e
            rows.clear()
    if rows or pages == 0:
        try:
            spool(rows)
        except Exception as e:  # noqa: BLE001
            raise StagerError(
                f"final spool failed: {e}",
                resume_url=buffer_url,
                next_seq=buffer_seq,
                pages_staged=pages - len(rows),
                delta_link=delta_link,
            ) from e
    return {"pages": pages, "next_seq": seq, "delta_link": delta_link}


def parse_feed(
    spark: SparkSession,
    payload: str,
    entity: EntityType,
    version: str | None = None,
) -> DataFrame:
    """Single-document convenience: one response document → wire-string
    DataFrame (the shape `EntityProvider.readFeed` returns, distributed)."""
    docs = spark.createDataFrame([(payload,)], "payload string")
    return parse_feed_documents(docs, entity, version)
