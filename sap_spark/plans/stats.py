"""Manifest file statistics + predicate-based file skipping.

Iceberg-style data skipping for :class:`~sap_spark.plans.lake.LakeTable`:
every committed data file carries per-column ``[min, max]`` bounds in the
manifest (collected from the parquet footer at commit time), and
``LakeTable.read(where=...)`` drops files whose bounds cannot satisfy the
predicate BEFORE Spark ever lists or opens them.

Why this matters at 100 TB: Spark's own parquet pushdown prunes row
groups, but only after opening every file's footer — a million-file
table pays a million remote footer GETs per query. Manifest-level
bounds move that decision into the driver-side planning walk (zero
I/O), which is exactly the mechanism Iceberg/Delta use. Reference
analog: the OData source's server-side ``$filter`` pushdown
(SapODataConfig query building) — the same "don't ship what the
predicate excludes" contract, applied to the table format instead of
the wire protocol.

Soundness rules (enforced by the caller, tested in
tests/test_stats_pruning.py):

- Pruning is BEST-EFFORT and one-sided: a kept file may still contain
  no matching rows (the full predicate is re-applied post-scan); a
  dropped file must provably contain none.
- Only plain conjunctions of ``column <op> literal`` prune. Any
  top-level ``OR``/``NOT``/parentheses disables pruning entirely —
  under ``a AND b OR c`` no single conjunct is required, so using one
  would drop files that satisfy ``c``.
- Under merge-on-read, non-key conjuncts must NOT prune files in
  delta-bearing buckets: the read-time fold picks the latest version
  per key, and dropping the file holding the LATEST version (which
  fails the predicate) would resurrect an older version (which passes)
  — a phantom row. Key-column conjuncts are safe everywhere: the fold
  groups by key, so removing rows of non-matching keys never changes a
  matching key's winner.

Stats collection reads footers driver-side at commit time — bounded by
files-per-commit, and local-FS cheap here. A real object-store
deployment would collect the same bounds task-side inside the write
job (as Iceberg writers do); the manifest shape this module defines is
the seam either collector feeds.
"""

from __future__ import annotations

import re
from datetime import date, datetime

# bounds longer than this are not stored: a PREFIX of a string max is a
# smaller string, i.e. an INVALID upper bound, so oversized bounds are
# dropped rather than truncated (min-side prefixing would be safe, but
# asymmetric bounds are a foot-gun for no real win)
_MAX_STORED_STR = 256

_PRUNABLE_OPS = {"=", "==", "<", "<=", ">", ">="}


# ---------------------------------------------------------------------------
# stats collection (commit-time, parquet footer)
# ---------------------------------------------------------------------------


def _encode_bound(v):
    """JSON-safe encoding of one min/max bound; None = not storable."""
    if isinstance(v, bool) or v is None:
        return None  # boolean bounds prune nothing worth the bytes
    if isinstance(v, (int, float)):
        return v
    if isinstance(v, str):
        return v if len(v) <= _MAX_STORED_STR else None
    if isinstance(v, bytes):
        try:
            s = v.decode("utf-8")
        except UnicodeDecodeError:
            return None
        return s if len(s) <= _MAX_STORED_STR else None
    if isinstance(v, datetime):
        return {"$ts": v.isoformat()}
    if isinstance(v, date):
        return {"$d": v.isoformat()}
    return None


def decode_bound(v):
    """Inverse of :func:`_encode_bound` after a JSON round-trip."""
    if isinstance(v, dict):
        if "$ts" in v:
            return datetime.fromisoformat(v["$ts"])
        if "$d" in v:
            return date.fromisoformat(v["$d"])
        return None
    return v


def collect_parquet_stats(path: str, columns: "list[str]") -> dict:
    """``{column: [min, max]}`` from one parquet file's footer, for the
    requested columns only. A column is omitted when any row group
    lacks exact min/max (all-null chunks, unsupported physical types,
    writer-truncated bounds) — absence means "never prune on this".
    """
    import pyarrow.parquet as pq

    wanted = set(columns)
    if not wanted:
        return {}
    md = pq.ParquetFile(path).metadata
    mins: dict = {}
    maxs: dict = {}
    dead: set = set()
    for rg in range(md.num_row_groups):
        group = md.row_group(rg)
        for ci in range(group.num_columns):
            col = group.column(ci)
            name = col.path_in_schema
            if name not in wanted or name in dead:
                continue
            st = col.statistics
            if st is None or not st.has_min_max:
                dead.add(name)
                continue
            lo, hi = _encode_bound(st.min), _encode_bound(st.max)
            if lo is None or hi is None:
                dead.add(name)
                continue
            if name not in mins or _lt(decode_bound(lo), decode_bound(mins[name])):
                mins[name] = lo
            if name not in maxs or _lt(decode_bound(maxs[name]), decode_bound(hi)):
                maxs[name] = hi
    return {
        name: [mins[name], maxs[name]]
        for name in mins
        if name not in dead and name in maxs
    }


def _lt(a, b) -> bool:
    try:
        return a < b
    except TypeError:
        return False


# ---------------------------------------------------------------------------
# predicate → prunable conjuncts
# ---------------------------------------------------------------------------

_LIT_TOKEN = re.compile(r"'(?:[^']|'')*'|\"(?:[^\"]|\"\")*\"")
_CONJUNCT = re.compile(
    r"^\s*([A-Za-z_][A-Za-z0-9_]*)\s*(==|=|<=|>=|<>|!=|<|>)\s*(\S(?:.*\S)?)\s*$"
)


def parse_conjuncts(where: str) -> "list[tuple[str, str, object]]":
    """Extract the prunable ``(column, op, literal)`` conjuncts of a SQL
    boolean expression.

    Soundness model: a conjunct may prune only if every matching row
    MUST satisfy it. With string literals masked, a depth-0 ``OR``
    makes no conjunct required (``a AND b OR c`` groups as
    ``(a AND b) OR c``) → return ``[]`` and let the post-filter do all
    the work. Otherwise split ONLY at depth-0 ``AND``s — an ``AND``
    inside parentheses (function args like ``if(a AND b, …)``) never
    splits, so a fragment of a nested expression can never masquerade
    as a required conjunct; a paren group, ``NOT …``, ``IS NULL``,
    ``IN (…)``, a ``BETWEEN`` fragment or any other shape simply fails
    the conjunct grammar and is skipped individually while its
    siblings still prune.
    ``!=``/``<>`` parse but never prune (a range bound proves nothing
    about inequality). Literals: numbers and single/double-quoted
    strings (doubled-quote escaping)."""
    lits: list[str] = []

    def _mask(m: re.Match) -> str:
        lits.append(m.group(0))
        return f"\x00{len(lits) - 1}\x00"

    masked = _LIT_TOKEN.sub(_mask, where)
    depth = 0
    split_at: list[tuple[int, int]] = []
    for m in re.finditer(r"[()]|\b(?:and|or)\b", masked, re.I):
        tok = m.group(0)
        if tok == "(":
            depth += 1
        elif tok == ")":
            depth -= 1
            if depth < 0:
                return []  # unbalanced: refuse to reason about it
        elif depth == 0:
            if tok.lower() == "or":
                return []
            split_at.append(m.span())
    parts: list[str] = []
    prev = 0
    for s, e in split_at:
        parts.append(masked[prev:s])
        prev = e
    parts.append(masked[prev:])
    out: list[tuple[str, str, object]] = []
    for part in parts:
        m = _CONJUNCT.match(part)
        if not m:
            continue
        col, op, rhs = m.group(1), m.group(2), m.group(3)
        lit_m = re.fullmatch(r"\x00(\d+)\x00", rhs)
        if lit_m:
            raw = lits[int(lit_m.group(1))]
            q = raw[0]
            val: object = raw[1:-1].replace(q * 2, q)
        else:
            try:
                val = int(rhs)
            except ValueError:
                try:
                    val = float(rhs)
                except ValueError:
                    continue  # not a literal we understand
        if op in ("!=", "<>"):
            continue  # a range bound proves nothing about inequality
        out.append((col, "=" if op == "==" else op, val))
    return out


# ---------------------------------------------------------------------------
# file-level evaluation
# ---------------------------------------------------------------------------


def _coerce(bound, lit):
    """Best-effort comparable (bound, literal) pair; None = incomparable
    (keep the file)."""
    if isinstance(bound, (int, float)) and isinstance(lit, (int, float)):
        return bound, lit
    if isinstance(bound, str) and isinstance(lit, str):
        return bound, lit
    if isinstance(bound, datetime) and isinstance(lit, str):
        try:
            parsed = datetime.fromisoformat(lit)
        except ValueError:
            return None
        # TIMESTAMP (UTC-adjusted) bounds come back tz-aware while SQL
        # literals are naive; the engine pins the session TZ to UTC
        # (sap_spark.config.get_spark), so a naive literal IS UTC
        if bound.tzinfo is not None and parsed.tzinfo is None:
            parsed = parsed.replace(tzinfo=bound.tzinfo)
        elif bound.tzinfo is None and parsed.tzinfo is not None:
            return None  # ambiguous the other way: keep the file
        return bound, parsed
    if isinstance(bound, date) and isinstance(lit, str):
        try:
            return bound, date.fromisoformat(lit)
        except ValueError:
            return None
    return None


def file_may_match(stats: dict, conjuncts: "list[tuple[str, str, object]]") -> bool:
    """Could a file with these ``{col: [min, max]}`` bounds contain a row
    satisfying every conjunct? Missing/incomparable stats keep the file
    (pruning must never be the component that loses a row)."""
    for col, op, lit in conjuncts:
        if op not in _PRUNABLE_OPS:
            continue
        bounds = stats.get(col)
        if not bounds:
            continue
        lo, hi = decode_bound(bounds[0]), decode_bound(bounds[1])
        pair_lo = _coerce(lo, lit)
        pair_hi = _coerce(hi, lit)
        if pair_lo is None or pair_hi is None:
            continue
        lo, llit = pair_lo
        hi, hlit = pair_hi
        try:
            if op == "=" and not (lo <= llit and hlit <= hi):
                return False
            if op == "<" and not lo < llit:
                return False
            if op == "<=" and not lo <= llit:
                return False
            if op == ">" and not hi > hlit:
                return False
            if op == ">=" and not hi >= hlit:
                return False
        except TypeError:
            continue
    return True


def split_conjuncts_by_keys(
    conjuncts: "list[tuple[str, str, object]]", key_columns: "list[str]"
) -> "tuple[list, list]":
    """(key-column conjuncts, other conjuncts) — the MOR soundness split
    documented in the module docstring."""
    keys = set(key_columns)
    key_cj = [c for c in conjuncts if c[0] in keys]
    return key_cj, [c for c in conjuncts if c[0] not in keys]


def key_equality_literals(
    conjuncts: "list[tuple[str, str, object]]", key_columns: "list[str]"
) -> "dict[str, object] | None":
    """``{key: literal}`` when EVERY key column is pinned by an equality
    conjunct (the point-lookup shape that allows bucket pruning), else
    None. Conflicting equalities on one key return None (the post-
    filter will yield the honest empty result)."""
    pinned: dict[str, object] = {}
    for col, op, lit in conjuncts:
        if col in key_columns and op == "=":
            if col in pinned and pinned[col] != lit:
                return None
            pinned[col] = lit
    if set(pinned) == set(key_columns):
        return pinned
    return None
