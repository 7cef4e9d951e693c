"""OData $filter expression language → Catalyst (sources/odata_filter.py).

The reference forwards this grammar to the SAP server
(odata/ODataClient.java:58, docs/SapEcc-batchsource.md:30-33); here it
must parse into Column expressions that Catalyst pushes into the scan.
"""

import datetime

import pytest
from pyspark.sql import functions as F

from sap_spark.sources.changelog import ODataQueryOptions, apply_query_options
from sap_spark.sources.odata_filter import ODataFilterError, parse_odata_filter


@pytest.fixture(scope="module")
def df(spark):
    rows = [
        (1, "click", 10.0, "en", datetime.datetime(2024, 1, 1, 12, 0, 0)),
        (2, "view", 25.5, "de", datetime.datetime(2024, 1, 5, 8, 30, 0)),
        (3, "click", 3.25, None, datetime.datetime(2024, 2, 1, 0, 0, 0)),
        (4, "purchase", 99.0, "en", datetime.datetime(2024, 3, 1, 23, 59, 0)),
        (5, "error", -4.0, "fr", datetime.datetime(2023, 12, 31, 0, 0, 0)),
    ]
    return spark.createDataFrame(
        rows, "id long, event_type string, value double, lang string, ts timestamp"
    )


def ids(df, expr):
    return sorted(r["id"] for r in df.filter(parse_odata_filter(expr)).collect())


def test_comparisons_and_logic(df):
    assert ids(df, "event_type eq 'click'") == [1, 3]
    assert ids(df, "event_type ne 'click'") == [2, 4, 5]
    assert ids(df, "value gt 10.0") == [2, 4]
    assert ids(df, "value ge 10.0") == [1, 2, 4]
    assert ids(df, "value lt 0") == [5]
    assert ids(df, "value le 3.25") == [3, 5]
    assert ids(df, "event_type eq 'click' and value ge 10.0") == [1]
    assert ids(df, "event_type eq 'click' or event_type eq 'error'") == [1, 3, 5]
    assert ids(df, "not (event_type eq 'click')") == [2, 4, 5]
    # and binds tighter than or
    assert ids(
        df, "event_type eq 'error' or event_type eq 'click' and value gt 5"
    ) == [1, 5]


def test_null_semantics(df):
    # OData null tests, not SQL three-valued '='
    assert ids(df, "lang eq null") == [3]
    assert ids(df, "lang ne null") == [1, 2, 4, 5]
    with pytest.raises(ODataFilterError, match="null"):
        parse_odata_filter("value gt null")


def test_arithmetic_precedence(df):
    # mul binds tighter than add: value add 1 mul 2 == value + 2
    assert ids(df, "value add 1 mul 2 gt 30") == [4]
    assert ids(df, "(value add 1) mul 2 gt 30") == [2, 4]
    assert ids(df, "value sub 5 lt 0") == [3, 5]
    assert ids(df, "value mod 2 eq 0") == [1, 5]  # -4 mod 2 = -0.0 == 0
    assert ids(df, "-value gt 0") == [5]
    assert ids(df, "value div 2 ge 12") == [2, 4]


def test_string_functions(df):
    assert ids(df, "substringof('ck', event_type)") == [1, 3]  # V2 arg order
    assert ids(df, "contains(event_type, 'ck')") == [1, 3]  # V4 arg order
    assert ids(df, "startswith(event_type, 'cl')") == [1, 3]
    assert ids(df, "endswith(event_type, 'se')") == [4]
    assert ids(df, "tolower('CLICK') eq event_type") == [1, 3]
    assert ids(df, "toupper(event_type) eq 'VIEW'") == [2]
    assert ids(df, "length(event_type) eq 5") == [1, 3, 5]
    assert ids(df, "indexof(event_type, 'i') eq 2") == [1, 3]  # 0-based
    assert ids(df, "concat(event_type, lang) eq 'clicken'") == [1]
    assert ids(df, "substring(event_type, 1) eq 'iew'") == [2]  # 0-based start
    assert ids(df, "substring(event_type, 0, 2) eq 'cl'") == [1, 3]
    assert ids(df, "trim('  click  ') eq event_type") == [1, 3]


def test_temporal_and_numeric_functions(df):
    assert ids(df, "ts ge datetime'2024-02-01T00:00:00'") == [3, 4]
    assert ids(df, "year(ts) eq 2023") == [5]
    assert ids(df, "month(ts) eq 1") == [1, 2]
    assert ids(df, "day(ts) eq 31") == [5]
    assert ids(df, "hour(ts) eq 23") == [4]
    assert ids(df, "minute(ts) eq 30") == [2]
    assert ids(df, "round(value) eq 26") == [2]
    assert ids(df, "floor(value) eq 25") == [2]
    assert ids(df, "ceiling(value) eq 26") == [2]


def test_literal_suffixes(df):
    assert ids(df, "value gt 10L") == [2, 4]
    assert ids(df, "value gt 10.5m") == [2, 4]
    assert ids(df, "value gt 1.0e1d") == [2, 4]
    assert ids(df, "event_type eq 'it''s'") == []  # '' escape parses


def test_unsupported_raises(df):
    for bad in (
        "value = 10",            # SQL operator, not OData
        "frobnicate(value)",     # unknown function
        "value gt",              # truncated
        "value gt 1 extra",      # trailing garbage
        "",
    ):
        with pytest.raises(ODataFilterError):
            parse_odata_filter(bad)


def test_apply_query_options_accepts_both_grammars(df):
    odata = apply_query_options(
        df, ODataQueryOptions.parse("$filter=event_type eq 'click' and value gt 5")
    )
    sparksql = apply_query_options(
        df, ODataQueryOptions.parse("$filter=event_type = 'click' and value > 5")
    )
    assert {r["id"] for r in odata.collect()} == {1}
    assert {r["id"] for r in sparksql.collect()} == {1}


def test_orderby_accepts_expressions(df):
    """$orderby takes the same grammar as $filter: plain columns, multi-
    key with asc/desc, and OData expressions like length(...)."""
    out = apply_query_options(
        df, ODataQueryOptions.parse("$orderby=length(event_type) desc, id asc&$top=2")
    )
    assert [r["id"] for r in out.collect()] == [4, 1]  # purchase(8), click(5)
    out2 = apply_query_options(
        df, ODataQueryOptions.parse("$orderby=value mul -1&$top=1")
    )
    assert [r["id"] for r in out2.collect()] == [4]  # largest value first
    # commas inside function calls must not split the orderby list
    out3 = apply_query_options(
        df,
        ODataQueryOptions.parse(
            "$orderby=substring(event_type, 0, 1) asc, value desc&$top=2"
        ),
    )
    assert [r["id"] for r in out3.collect()] == [1, 3]  # 'c'-first, value desc
    # whitespace other than a single space still separates the direction
    out4 = apply_query_options(
        df, ODataQueryOptions.parse("$orderby=value\tdesc&$top=1")
    )
    assert [r["id"] for r in out4.collect()] == [4]


def test_apply_groupby_aggregate(df):
    """$apply (OData aggregation extension): filter/groupby/aggregate
    chains become DataFrame ops."""
    from sap_spark.sources.odata_filter import parse_odata_apply

    out = parse_odata_apply(
        "filter(value gt 0)/groupby((event_type),"
        "aggregate(value with sum as total,$count as n))"
    )(df)
    got = {r["event_type"]: (r["total"], r["n"]) for r in out.collect()}
    assert got == {
        "click": (13.25, 2), "view": (25.5, 1), "purchase": (99.0, 1),
    }
    # bare aggregate over the whole frame
    tot = parse_odata_apply(
        "aggregate(value with max as mx,value with average as avg_v)"
    )(df).collect()[0]
    assert tot["mx"] == 99.0
    assert abs(tot["avg_v"] - (10.0 + 25.5 + 3.25 + 99.0 - 4.0) / 5) < 1e-9
    # distinct groupby without aggregate
    kinds = parse_odata_apply("groupby((event_type))")(df)
    assert kinds.count() == 4
    # countdistinct + top
    one = parse_odata_apply(
        "groupby((event_type),aggregate(lang with countdistinct as langs))/top(1)"
    )(df)
    assert one.count() == 1


def test_apply_via_query_options(df):
    out = apply_query_options(
        df,
        ODataQueryOptions.parse(
            "$apply=groupby((event_type),aggregate(value with sum as total))"
            "&$filter=total gt 20&$orderby=total desc&$select=event_type,total"
        ),
    )
    rows = [(r["event_type"], r["total"]) for r in out.collect()]
    assert rows == [("purchase", 99.0), ("view", 25.5)]


def test_apply_errors(df):
    from sap_spark.sources.odata_filter import parse_odata_apply

    for bad in (
        "",
        "explode(x)",
        "groupby(())",
        "aggregate()",
        "aggregate(value with frobnicate as x)",
        "groupby((a),aggregate(value sum as x))",
    ):
        with pytest.raises(ODataFilterError):
            parse_odata_apply(bad)


def test_apply_groupby_is_partial_hash_aggregate(spark, sf_dir):
    """$apply groupby/aggregate must compile to the two-phase
    HashAggregate (map-side partial before the exchange) — the shape that
    scales; and the $apply filter still pushes into the scan."""
    from sap_spark.sources.odata_filter import parse_odata_apply

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = parse_odata_apply(
        "filter(value gt 5.0)/groupby((event_type),"
        "aggregate(value with sum as total,$count as n))"
    )(ev)
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert plan.count("HashAggregate") >= 2  # partial + final
    assert "PushedFilters" in plan
    pushed = plan.split("PushedFilters:")[1].splitlines()[0]
    assert "value" in pushed


def test_odata_filter_pushes_down(spark, sf_dir):
    """Translated predicates must reach the parquet scan: PushedFilters
    carries the comparison, ReadSchema drops unselected columns."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = apply_query_options(
        ev,
        ODataQueryOptions.parse(
            "$filter=event_type eq 'click' and value gt 10.0"
            "&$select=event_id,event_type,value"
        ),
    )
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "PushedFilters" in plan
    pushed = plan.split("PushedFilters:")[1].splitlines()[0]
    assert "event_type" in pushed and "value" in pushed
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "user_id" not in read_schema and "props" not in read_schema


def test_filter_typo_reports_both_grammars(df):
    """A typo'd OData filter (misspelled function) that Spark SQL can't
    parse either must fail with ODataFilterError carrying BOTH
    diagnostics — not a bare confusing Spark parse error."""
    from sap_spark.sources.odata_filter import ODataFilterError

    opts = ODataQueryOptions.parse("$filter=substringoff('x', name)")
    with pytest.raises(ODataFilterError, match="neither valid OData"):
        apply_query_options(df, opts)


def test_property_paths_and_lambdas(spark):
    """V4 grammar subset (VERDICT r3 next #8): property paths over struct
    columns, any/all lambdas over arrays (F.exists/F.forall), lambda
    element paths, nesting with outer-column references, argument-less
    any(), and clean errors for the unsupported forms."""
    from sap_spark.sources.odata_filter import ODataFilterError

    df = spark.createDataFrame(
        [
            (1, ("Berlin", 10), ["red", "blue"], [(2,), (7,)]),
            (2, ("Paris", 99), ["green"], [(9,)]),
            (3, (None, 5), [], []),
        ],
        "id int, addr struct<city:string, n:int>, tags array<string>, "
        "items array<struct<qty:int>>",
    )

    def ids(expr):
        return sorted(
            r["id"] for r in df.filter(parse_odata_filter(expr)).collect()
        )

    assert ids("addr/city eq 'Berlin'") == [1]
    assert ids("addr/n gt 50") == [2]
    assert ids("tags/any(t: t eq 'green')") == [2]
    assert ids("tags/any()") == [1, 2]
    assert ids("not tags/any()") == [3]
    assert ids("items/all(i: i/qty gt 5)") == [2, 3]  # vacuous on empty
    assert ids("items/any(i: i/qty gt 5)") == [1, 2]
    assert ids("tags/any(t: tolower(t) eq 'RED' or t eq 'green')") == [2]
    # outer (non-lambda) columns remain visible inside the lambda body
    assert ids("items/any(i: i/qty gt 5 and addr/n gt 50)") == [2]

    with pytest.raises(ODataFilterError, match="all\\(\\) requires"):
        parse_odata_filter("tags/all()")
    with pytest.raises(ODataFilterError, match="expected colon"):
        parse_odata_filter("tags/any(t t eq 'x')")
    with pytest.raises(ODataFilterError, match="expected property name"):
        parse_odata_filter("addr/1 eq 2")


def test_in_operator(df):
    """V4 `in`: literal lists of any primitive type, 3VL nulls (a null
    member never matches), pushdown-friendly Catalyst In."""
    assert ids(df, "event_type in ('click','error')") == [1, 3, 5]
    assert ids(df, "id in (2, 4, 99)") == [2, 4]
    # composes with the rest of the grammar at the comparison level
    assert ids(df, "event_type in ('click') and value gt 5") == [1]
    assert ids(df, "not (event_type in ('click','view'))") == [4, 5]
    # null member column: row 3's lang is null → never matches (SQL 3VL)
    assert ids(df, "lang in ('en','fr')") == [1, 4, 5]
    # arithmetic operands work on both sides
    assert ids(df, "id add 1 in (2, 3)") == [1, 2]
    with pytest.raises(ODataFilterError):
        parse_odata_filter("id in (")
    with pytest.raises(ODataFilterError):
        parse_odata_filter("id in 3")


def test_in_pushes_down(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    plan = ev.filter(
        parse_odata_filter("event_type in ('click','view')")
    )._jdf.queryExecution().toString()
    assert "PushedFilters" in plan and "In(event_type" in plan
