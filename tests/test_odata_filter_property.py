"""Property-based corroboration of the OData $filter translator.

Hypothesis generates random predicate ASTs, renders them to OData text,
runs them through parse_odata_filter + Spark, and compares against an
independent Python evaluator implementing SQL three-valued logic
directly over the rows (None = unknown; a row passes only when the
predicate is definitely true). Any divergence is a parser or semantics
bug the example-based tests missed.
"""

import math

import pytest

try:
    from hypothesis import given, settings, strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis unavailable", allow_module_level=True)

from sap_spark.sources.odata_filter import parse_odata_filter

ROWS = [
    {"id": 1, "value": 10.0, "event_type": "click", "lang": "en"},
    {"id": 2, "value": 25.5, "event_type": "view", "lang": "de"},
    {"id": 3, "value": 3.25, "event_type": "click", "lang": None},
    {"id": 4, "value": 99.0, "event_type": "purchase", "lang": "en"},
    {"id": 5, "value": -4.0, "event_type": "error", "lang": "fr"},
    {"id": 6, "value": 0.0, "event_type": "signup", "lang": None},
]

# AST node forms:
#   ("col", name) | ("num", float-or-int) | ("str", s)
#   ("add"|"sub"|"mul", a, b)
#   ("cmp", op, a, b)        op in eq ne gt ge lt le
#   ("and"|"or", a, b) | ("not", a)
#   ("isnull", colname, bool) | ("strfn", fn, colname, s)

num_leaf = st.one_of(
    st.sampled_from([("col", "value"), ("col", "id")]),
    st.integers(min_value=-50, max_value=120).map(lambda v: ("num", v)),
)


def num_expr(depth):
    if depth <= 0:
        return num_leaf
    return st.one_of(
        num_leaf,
        st.tuples(
            st.sampled_from(["add", "sub", "mul"]),
            num_expr(depth - 1),
            num_expr(depth - 1),
        ),
    )


str_leaf = st.sampled_from(
    ["click", "view", "purchase", "error", "signup", "zzz", ""]
)

cmp_node = st.one_of(
    st.tuples(
        st.just("cmp"),
        st.sampled_from(["eq", "ne", "gt", "ge", "lt", "le"]),
        num_expr(2),
        num_expr(2),
    ),
    st.tuples(
        st.just("cmp"),
        st.sampled_from(["eq", "ne"]),
        st.just(("col", "event_type")),
        str_leaf.map(lambda s: ("str", s)),
    ),
    st.tuples(st.just("isnull"), st.just("lang"), st.booleans()),
    st.tuples(
        st.just("strfn"),
        st.sampled_from(["startswith", "endswith", "substringof", "contains"]),
        st.just("event_type"),
        str_leaf,
    ),
)


def bool_expr(depth):
    if depth <= 0:
        return cmp_node
    sub = bool_expr(depth - 1)
    return st.one_of(
        cmp_node,
        st.tuples(st.sampled_from(["and", "or"]), sub, sub),
        st.tuples(st.just("not"), sub),
    )


def render(node) -> str:
    kind = node[0]
    if kind == "col":
        return node[1]
    if kind == "num":
        return str(node[1])
    if kind == "str":
        return "'" + node[1].replace("'", "''") + "'"
    if kind in ("add", "sub", "mul"):
        return f"({render(node[1])} {kind} {render(node[2])})"
    if kind == "cmp":
        return f"({render(node[2])} {node[1]} {render(node[3])})"
    if kind in ("and", "or"):
        return f"({render(node[1])} {kind} {render(node[2])})"
    if kind == "not":
        return f"(not {render(node[1])})"
    if kind == "isnull":
        return f"(lang {'eq' if node[2] else 'ne'} null)"
    if kind == "strfn":
        fn, col, s = node[1], node[2], "'" + node[3].replace("'", "''") + "'"
        if fn == "substringof":  # V2 arg order: needle first
            return f"{fn}({s}, {col})"
        return f"{fn}({col}, {s})"
    raise AssertionError(node)


def ev_num(node, row):
    kind = node[0]
    if kind == "col":
        return row[node[1]]
    if kind == "num":
        return node[1]
    a, b = ev_num(node[1], row), ev_num(node[2], row)
    if a is None or b is None:
        return None
    return {"add": a + b, "sub": a - b, "mul": a * b}[kind]


def ev_bool(node, row):
    """Three-valued: True / False / None(unknown)."""
    kind = node[0]
    if kind == "cmp":
        op = node[1]
        a = ev_num(node[2], row) if node[2][0] != "str" else node[2][1]
        if node[2] == ("col", "event_type"):
            a = row["event_type"]
        b = ev_num(node[3], row) if node[3][0] != "str" else node[3][1]
        if a is None or b is None:
            return None
        return {
            "eq": a == b, "ne": a != b, "gt": a > b,
            "ge": a >= b, "lt": a < b, "le": a <= b,
        }[op]
    if kind == "isnull":
        is_null = row["lang"] is None
        return is_null if node[2] else not is_null
    if kind == "strfn":
        fn, s, v = node[1], node[3], row[node[2]]
        if v is None:
            return None
        return {
            "startswith": v.startswith(s),
            "endswith": v.endswith(s),
            "substringof": s in v,
            "contains": s in v,
        }[fn]
    if kind == "and":
        a, b = ev_bool(node[1], row), ev_bool(node[2], row)
        if a is False or b is False:
            return False
        if a is None or b is None:
            return None
        return True
    if kind == "or":
        a, b = ev_bool(node[1], row), ev_bool(node[2], row)
        if a is True or b is True:
            return True
        if a is None or b is None:
            return None
        return False
    if kind == "not":
        a = ev_bool(node[1], row)
        return None if a is None else not a
    raise AssertionError(node)


@settings(max_examples=120, deadline=None)
@given(bool_expr(3))
def test_random_predicates_match_reference_semantics(spark_prop, tree):
    spark, df = spark_prop
    text = render(tree)
    got = sorted(r["id"] for r in df.filter(parse_odata_filter(text)).collect())
    want = sorted(r["id"] for r in ROWS if ev_bool(tree, r) is True)
    assert got == want, f"{text}\n got={got}\n want={want}"


@pytest.fixture(scope="module")
def spark_prop(spark):
    df = spark.createDataFrame(
        [tuple(r[c] for c in ("id", "value", "event_type", "lang")) for r in ROWS],
        "id long, value double, event_type string, lang string",
    ).cache()
    df.count()
    return spark, df
