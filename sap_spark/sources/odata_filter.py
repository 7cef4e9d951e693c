"""OData expression-language → Catalyst Column translator.

The reference forwards OData query strings verbatim to the SAP server —
its documented `$filter` surface is the OData V2 expression language
(`BuyerName eq 'TECUM'`: odata/ODataClient.java:58; operator/function
survey in docs/SapEcc-batchsource.md:30-33). This engine's "server" is
Catalyst, so a user porting a real OData query needs that grammar parsed
into Column expressions — Catalyst then pushes the predicates into the
parquet scan exactly as native filters (PushedFilters in explain).

Supported surface (the OData V2 common set + the V4 `contains`):

- comparisons: ``eq ne gt ge lt le`` (with ``X eq null`` → IS NULL,
  ``X ne null`` → IS NOT NULL — OData null-test semantics, not SQL
  three-valued ``=``);
- logical: ``and or not``, parentheses;
- arithmetic: ``add sub mul div mod``, unary ``-``;
- string functions: ``substringof(needle, hay)`` (V2 argument order),
  ``contains(hay, needle)`` (V4), ``startswith endswith tolower toupper
  trim length indexof concat substring`` (OData's 0-based offsets mapped
  to Spark's 1-based);
- temporal extractors: ``year month day hour minute second``;
- numeric: ``round floor ceiling``;
- literals: strings with ``''`` escapes, integers/decimals with OData
  type suffixes (``1.5m 2L 3f``), ``true false null``,
  ``datetime'...'`` / ``datetimeoffset'...'`` (→ timestamp literal),
  ``guid'...'`` / ``time'...'`` (→ string literal).

Also here: :func:`parse_odata_apply` for the OData aggregation extension
(``$apply=filter(...)/groupby((A,B),aggregate(C with sum as T))`` — the
grammar SAP analytics services speak), translated to a DataFrame
pipeline (filter → groupBy().agg() → limit/offset).

- property paths: ``Address/City`` → struct-field access
  (``F.col("Address.City")``; nested paths chain);
- lambda operators over collections: ``Tags/any(t: t eq 'red')`` →
  ``F.exists``, ``Items/all(i: i/Qty gt 5)`` → ``F.forall`` (the lambda
  variable scopes over the predicate, paths off it are element-field
  accesses, and lambdas nest); argument-less ``Tags/any()`` tests
  non-emptiness.

- ``member in ('a','b',...)`` (V4) → Catalyst ``In`` (parquet-pushable,
  ``InSet`` for long literal lists; SQL 3VL nulls, matching the spec's
  OR-of-eq definition).

The rest of the V4 grammar (type casts, ``$it``, …) is out of scope and
raises ``ODataFilterError`` with the offending token, so callers can
fall back or surface a clean message.
"""

from __future__ import annotations

import re
from datetime import datetime

from pyspark.sql import Column
from pyspark.sql import functions as F


class ODataFilterError(ValueError):
    """Unparseable / unsupported OData expression."""


_TOKEN_RE = re.compile(
    r"""\s*(?:
      (?P<typed>(?:datetimeoffset|datetime|guid|time)'(?:[^']|'')*')
    | (?P<string>'(?:[^']|'')*')
    | (?P<number>\d+(?:\.\d+)?(?:[eE][+-]?\d+)?[mMdDfFlL]?)
    | (?P<name>[A-Za-z_][A-Za-z0-9_]*)
    | (?P<lparen>\()
    | (?P<rparen>\))
    | (?P<comma>,)
    | (?P<minus>-)
    | (?P<slash>/)
    | (?P<colon>:)
    | (?P<other>\S)
    )""",
    re.X,
)

_NULL = object()  # sentinel: the literal `null`


def _tokenize(text: str) -> list[tuple[str, str]]:
    out: list[tuple[str, str]] = []
    pos = 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if not m or m.end() == m.start():
            raise ODataFilterError(f"unrecognized input at {text[pos:pos+20]!r}")
        pos = m.end()
        kind = m.lastgroup
        value = m.group(kind)
        if kind == "other":
            raise ODataFilterError(
                f"unsupported character {value!r} in OData expression"
            )
        if value.strip() or kind in ("lparen", "rparen", "comma"):
            out.append((kind, value.strip()))
    return out


def _unquote(s: str) -> str:
    return s[1:-1].replace("''", "'")


class _Parser:
    """Recursive-descent over the precedence ladder
    or < and < not < cmp < add/sub < mul/div/mod < unary < primary."""

    def __init__(self, tokens: list[tuple[str, str]]):
        self.toks = tokens
        self.i = 0
        # lambda-variable scope: name → element Column (any/all bodies)
        self.env: dict[str, Column] = {}

    def peek(self) -> tuple[str, str] | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> tuple[str, str]:
        t = self.peek()
        if t is None:
            raise ODataFilterError("unexpected end of expression")
        self.i += 1
        return t

    def expect(self, kind: str) -> None:
        t = self.next()
        if t[0] != kind:
            raise ODataFilterError(f"expected {kind}, got {t[1]!r}")

    def at_keyword(self, *words: str) -> str | None:
        t = self.peek()
        if t and t[0] == "name" and t[1].lower() in words:
            return t[1].lower()
        return None

    # -- precedence ladder ------------------------------------------------

    def parse(self) -> Column:
        col = self.or_expr()
        if self.peek() is not None:
            raise ODataFilterError(f"trailing input at {self.peek()[1]!r}")
        return self._col(col)

    def or_expr(self):
        left = self.and_expr()
        while self.at_keyword("or"):
            self.next()
            left = self._col(left) | self._col(self.and_expr())
        return left

    def and_expr(self):
        left = self.not_expr()
        while self.at_keyword("and"):
            self.next()
            left = self._col(left) & self._col(self.not_expr())
        return left

    def not_expr(self):
        if self.at_keyword("not"):
            self.next()
            return ~self._col(self.not_expr())
        return self.cmp_expr()

    def cmp_expr(self):
        left = self.add_expr()
        if self.at_keyword("in"):
            # V4 `in`: member in ('a','b',...) — compiles to Catalyst In
            # (parquet-pushable; InSet for long literal lists), which has
            # the same 3VL null semantics as the OData spec's OR-of-eq.
            self.next()
            self.expect("lparen")
            items = [self.add_expr()]
            while self.peek() and self.peek()[0] == "comma":
                self.next()
                items.append(self.add_expr())
            self.expect("rparen")
            return self._col(left).isin(*[self._col(x) for x in items])
        op = self.at_keyword("eq", "ne", "gt", "ge", "lt", "le")
        if op is None:
            return left
        self.next()
        right = self.add_expr()
        if right is _NULL or left is _NULL:
            operand = left if right is _NULL else right
            if operand is _NULL:  # null eq null
                return F.lit(op == "eq")
            if op == "eq":
                return self._col(operand).isNull()
            if op == "ne":
                return self._col(operand).isNotNull()
            raise ODataFilterError(f"cannot order against null with '{op}'")
        lc, rc = self._col(left), self._col(right)
        return {
            "eq": lambda: lc == rc,
            "ne": lambda: lc != rc,
            "gt": lambda: lc > rc,
            "ge": lambda: lc >= rc,
            "lt": lambda: lc < rc,
            "le": lambda: lc <= rc,
        }[op]()

    def add_expr(self):
        left = self.mul_expr()
        while True:
            op = self.at_keyword("add", "sub")
            if op is None:
                return left
            self.next()
            right = self.mul_expr()
            lc, rc = self._col(left), self._col(right)
            left = lc + rc if op == "add" else lc - rc

    def mul_expr(self):
        left = self.unary()
        while True:
            op = self.at_keyword("mul", "div", "mod")
            if op is None:
                return left
            self.next()
            right = self.unary()
            lc, rc = self._col(left), self._col(right)
            left = {"mul": lc * rc, "div": lc / rc, "mod": lc % rc}[op]

    def unary(self):
        t = self.peek()
        if t and t[0] == "minus":
            self.next()
            return -self._col(self.unary())
        return self.primary()

    # -- primaries --------------------------------------------------------

    def primary(self):
        kind, value = self.next()
        if kind == "lparen":
            inner = self.or_expr()
            self.expect("rparen")
            return inner
        if kind == "string":
            return F.lit(_unquote(value))
        if kind == "typed":
            prefix, lit = value.split("'", 1)
            lit = _unquote("'" + lit)
            if prefix in ("datetime", "datetimeoffset"):
                try:
                    return F.lit(datetime.fromisoformat(lit))
                except ValueError as e:
                    raise ODataFilterError(f"bad {prefix} literal {lit!r}") from e
            return F.lit(lit)  # guid / time carry their text
        if kind == "number":
            suffix = value[-1] if value[-1] in "mMdDfFlL" else ""
            num = value[:-1] if suffix else value
            if suffix.lower() == "m":
                import decimal

                return F.lit(decimal.Decimal(num))
            if "." in num or "e" in num.lower() or suffix.lower() in ("d", "f"):
                return F.lit(float(num))
            return F.lit(int(num))
        if kind == "name":
            word = value.lower()
            if word == "null":
                return _NULL
            if word == "true":
                return F.lit(True)
            if word == "false":
                return F.lit(False)
            nxt = self.peek()
            if nxt and nxt[0] == "lparen" and value not in self.env:
                return self._function(word)
            return self._path(value)
        raise ODataFilterError(f"unexpected token {value!r}")

    def _path(self, first: str) -> Column:
        """Property path starting at ``first``: plain column, ``a/b/c``
        struct-field chain, a lambda variable (with ``v/field`` element
        access), or a chain ending in ``/any(...)`` / ``/all(...)``."""
        col = self.env.get(first)
        segments = [first]  # used only while col is None (plain path)
        while self.peek() and self.peek()[0] == "slash":
            self.next()
            t = self.next()
            if t[0] != "name":
                raise ODataFilterError(
                    f"expected property name after '/', got {t[1]!r}"
                )
            seg = t[1]
            nxt = self.peek()
            if seg.lower() in ("any", "all") and nxt and nxt[0] == "lparen":
                base = col if col is not None else F.col(".".join(segments))
                return self._lambda(base, seg.lower())
            col = col[seg] if col is not None else None
            segments.append(seg)
        if col is not None:
            return col
        return F.col(segments[0] if len(segments) == 1 else ".".join(segments))

    def _lambda(self, base: Column, which: str) -> Column:
        """``collection/any(v: pred)`` → F.exists, ``/all`` → F.forall;
        argument-less ``any()`` tests non-emptiness. The predicate parses
        with the lambda variable bound to the element Column, so nested
        lambdas and ``v/field`` element paths work unchanged."""
        self.expect("lparen")
        t = self.peek()
        if t and t[0] == "rparen":
            self.next()
            if which == "any":
                return F.size(base) > F.lit(0)
            raise ODataFilterError("all() requires a lambda predicate")
        var_t = self.next()
        if var_t[0] != "name":
            raise ODataFilterError(
                f"expected lambda variable, got {var_t[1]!r}"
            )
        self.expect("colon")
        start, outer_env = self.i, self.env
        end_holder: dict[str, int] = {}

        def body(element: Column) -> Column:
            sub = _Parser(self.toks)
            sub.i = start
            sub.env = {**outer_env, var_t[1]: element}
            out = sub._col(sub.or_expr())
            end_holder["end"] = sub.i
            return out

        # F.exists/F.forall invoke the callback eagerly to build the
        # expression tree — end_holder is filled before we advance.
        result = (F.exists if which == "any" else F.forall)(base, body)
        self.i = end_holder["end"]
        self.expect("rparen")
        return result

    def _function(self, name: str) -> Column:
        self.expect("lparen")
        args: list = []
        if self.peek() and self.peek()[0] != "rparen":
            args.append(self.or_expr())
            while self.peek() and self.peek()[0] == "comma":
                self.next()
                args.append(self.or_expr())
        self.expect("rparen")
        cols = [self._col(a) for a in args]

        def need(n: int, m: int | None = None):
            hi = m if m is not None else n
            if not (n <= len(cols) <= hi):
                raise ODataFilterError(f"{name}() takes {n} argument(s)")

        if name == "substringof":  # V2: substringof(needle, hay)
            need(2)
            return cols[1].contains(cols[0])
        if name == "contains":  # V4: contains(hay, needle)
            need(2)
            return cols[0].contains(cols[1])
        if name == "startswith":
            need(2)
            return cols[0].startswith(cols[1])
        if name == "endswith":
            need(2)
            return cols[0].endswith(cols[1])
        if name == "tolower":
            need(1)
            return F.lower(cols[0])
        if name == "toupper":
            need(1)
            return F.upper(cols[0])
        if name == "trim":
            need(1)
            return F.trim(cols[0])
        if name == "length":
            need(1)
            return F.length(cols[0])
        if name == "indexof":  # OData is 0-based; instr is 1-based
            need(2)
            return F.instr(cols[0], cols[1]) - F.lit(1)
        if name == "concat":
            need(2, 99)
            return F.concat(*cols)
        if name == "substring":  # OData 0-based start [, length]
            need(2, 3)
            start = cols[1] + F.lit(1)
            if len(cols) == 3:
                return F.substring(cols[0], start, cols[2])
            return F.substring(cols[0], start, F.lit(2_147_483_647))
        if name in ("year", "month", "day", "hour", "minute", "second"):
            need(1)
            return getattr(F, name)(cols[0])
        if name == "round":
            need(1)
            return F.round(cols[0])
        if name == "floor":
            need(1)
            return F.floor(cols[0])
        if name == "ceiling":
            need(1)
            return F.ceil(cols[0])
        raise ODataFilterError(f"unsupported OData function {name}()")

    @staticmethod
    def _col(v) -> Column:
        if v is _NULL:
            raise ODataFilterError(
                "null is only allowed as an eq/ne comparison operand"
            )
        return v


def parse_odata_filter(expression: str) -> Column:
    """OData `$filter` expression → Catalyst Column (raises
    :class:`ODataFilterError` on anything outside the supported grammar)."""
    if not expression or not expression.strip():
        raise ODataFilterError("empty $filter expression")
    return _Parser(_tokenize(expression)).parse()


# -- $apply (OData aggregation extension) ------------------------------------
#
# SAP analytics services speak the OData "Extension for Data Aggregation":
# `$apply=filter(...)/groupby((A,B),aggregate(C with sum as Total))`. The
# reference forwards the string to the server; here each transformation
# becomes a DataFrame operation (filter → groupBy().agg() → ...), so a
# ported SAP analytical query runs on Catalyst unchanged.

_AGG_FUNCS = {
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
    "average": F.avg,
    "countdistinct": F.count_distinct,
}


def _split_top_level(text: str, sep: str) -> list[str]:
    """Split on `sep` outside parentheses/string literals."""
    parts: list[str] = []
    depth = 0
    in_str = False
    cur: list[str] = []
    for ch in text:
        if in_str:
            cur.append(ch)
            if ch == "'":
                in_str = False
            continue
        if ch == "'":
            in_str = True
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth = max(0, depth - 1)
        elif ch == sep and depth == 0:
            parts.append("".join(cur))
            cur = []
            continue
        cur.append(ch)
    parts.append("".join(cur))
    return parts


def _parse_aggregate_clause(body: str) -> list:
    """aggregate( expr with func as alias, ... | $count as alias )."""
    cols = []
    for item in _split_top_level(body, ","):
        item = item.strip()
        m = re.match(r"^\$count\s+as\s+(\w+)$", item, re.IGNORECASE)
        if m:
            cols.append(F.count(F.lit(1)).alias(m.group(1)))
            continue
        m = re.match(r"^(.*?)\s+with\s+(\w+)\s+as\s+(\w+)$", item, re.IGNORECASE | re.S)
        if not m:
            raise ODataFilterError(f"bad aggregate item {item!r}")
        expr_text, func, alias = m.groups()
        fn = _AGG_FUNCS.get(func.lower())
        if fn is None:
            raise ODataFilterError(f"unsupported aggregation method {func!r}")
        cols.append(fn(parse_odata_filter(expr_text)).alias(alias))
    if not cols:
        raise ODataFilterError("empty aggregate()")
    return cols


def parse_odata_apply(expression: str):
    """OData ``$apply`` pipeline → ``Callable[[DataFrame], DataFrame]``.

    Supported transformations (the SAP-relevant core):
    ``filter(<filter expr>)``, ``groupby((c1,c2))``,
    ``groupby((c1,...),aggregate(...))``, ``aggregate(...)``,
    ``top(n)``, ``skip(n)``; chained with ``/``.
    Aggregation methods: sum, min, max, average, countdistinct, $count.
    """
    if not expression or not expression.strip():
        raise ODataFilterError("empty $apply expression")
    steps = []
    for raw_step in _split_top_level(expression.strip(), "/"):
        step = raw_step.strip()
        m = re.match(r"^(\w+)\((.*)\)$", step, re.S)
        if not m:
            raise ODataFilterError(f"bad $apply transformation {step!r}")
        name, body = m.group(1).lower(), m.group(2)
        if name == "filter":
            cond = parse_odata_filter(body)
            steps.append(lambda df, c=cond: df.filter(c))
        elif name == "aggregate":
            aggs = _parse_aggregate_clause(body)
            steps.append(lambda df, a=aggs: df.agg(*a))
        elif name == "groupby":
            # step regex already stripped groupby's own parens: body is
            # "(c1,c2)" or "(c1,c2),aggregate(...)" — try the aggregate
            # form first (the plain pattern would swallow it greedily)
            inner_agg = None
            gm = re.match(
                r"^\s*\((.*?)\)\s*,\s*aggregate\s*\((.*)\)\s*$", body, re.S
            )
            if gm is not None:
                inner_agg = _parse_aggregate_clause(gm.group(2))
            else:
                gm = re.match(r"^\s*\(\s*([^()]*?)\s*\)\s*$", body, re.S)
                if gm is None:
                    raise ODataFilterError(f"bad groupby body {body!r}")
            cols = [c.strip() for c in gm.group(1).split(",") if c.strip()]
            if not cols:
                raise ODataFilterError("groupby with no columns")
            if inner_agg is None:
                steps.append(lambda df, c=cols: df.select(*c).distinct())
            else:
                steps.append(
                    lambda df, c=cols, a=inner_agg: df.groupBy(*c).agg(*a)
                )
        elif name in ("top", "skip"):
            if not re.fullmatch(r"\d+", body.strip()):
                raise ODataFilterError(f"bad {name}() count {body!r}")
            count = int(body.strip())
            if name == "top":
                steps.append(lambda df, n=count: df.limit(n))
            else:
                steps.append(lambda df, n=count: df.offset(n))
        else:
            raise ODataFilterError(f"unsupported $apply transformation {name!r}")

    def run(df):
        for s in steps:
            df = s(df)
        return df

    return run
