"""Property test: read(where=p) ≡ read().where(p) for generated p.

Backend law 8 under randomized predicates — the adversarial check on
the whole pruning stack (Catalyst conjunct extraction, bounds math,
type coercions, bucket point-lookup, MOR fold-safety split). Any
predicate the generator can produce that makes the sets diverge is a
lost-row or phantom-row bug in the skipping layer, since the post-
filter alone defines the truth.
"""

from __future__ import annotations

from datetime import datetime

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sap_spark.plans.lake import LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("v", T.DoubleType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("name", T.StringType()),
    ]
)

_COLS = {
    "k": st.integers(min_value=-5, max_value=130).map(str),
    "v": st.sampled_from(
        ["-1.5", "0.0", "33.25", "90.0", "1e3", "0.1", "118.0"]
    ),
    "ts": st.sampled_from(
        [
            "'2026-01-01 00:00:00'",
            "'2026-01-02 12:30:00'",
            "'2026-01-05 00:00:00'",
            "'2025-12-31 23:59:59'",
        ]
    ),
    "name": st.sampled_from(["'n1'", "'n77'", "'x''y'", "'zz'", "''"]),
}
_OPS = st.sampled_from(["=", "<", "<=", ">", ">=", "!="])


@st.composite
def _atom(draw):
    col = draw(st.sampled_from(sorted(_COLS)))
    op = draw(_OPS)
    lit = draw(_COLS[col])
    if draw(st.booleans()):
        return f"{col} {op} {lit}"
    return f"{lit} {op} {col}"  # reversed comparisons must flip correctly


@st.composite
def _predicate(draw):
    n = draw(st.integers(min_value=1, max_value=4))
    parts = [draw(_atom()) for _ in range(n)]
    expr = parts[0]
    for p in parts[1:]:
        conn = draw(st.sampled_from(["AND", "OR"]))
        if draw(st.booleans()):
            expr = f"({expr}) {conn} {p}"
        else:
            expr = f"{expr} {conn} {p}"
    if draw(st.booleans()):
        expr = f"NOT ({expr})"
    return expr


@pytest.fixture(scope="module")
def tables(spark, tmp_path_factory):
    """One COW table (sorted, multi-file) and one MOR table with
    updates, stale events and tombstones — built once, read many."""
    tmpdir_path = str(tmp_path_factory.mktemp("stats-prop"))
    base = datetime(2026, 1, 1)
    rows = spark.range(120).select(
        F.col("id").alias("k"),
        (F.col("id") * 1.0 - 1.5).alias("v"),
        (F.lit(base) + F.make_interval(hours=F.col("id"))).alias("ts"),
        F.concat(F.lit("n"), F.col("id")).alias("name"),
    )
    out = {}
    for mode in ("cow", "mor"):
        t = LakeTable.create(
            spark, f"{tmpdir_path}/prop-{mode}", SCHEMA, ["k"],
            num_buckets=4, merge_mode=mode,
            stats_columns=["k", "v", "ts", "_event_seq"],
            sort_columns=["ts"],
        )
        old = spark.conf.get("spark.sql.files.maxRecordsPerFile")
        spark.conf.set("spark.sql.files.maxRecordsPerFile", "20")
        try:
            t.overwrite(rows, batch_id="b0")
        finally:
            spark.conf.set("spark.sql.files.maxRecordsPerFile", old)
        chg = spark.createDataFrame(
            [
                (7, 999.0, datetime(2026, 2, 1), "n77", "U", 10),
                (8, None, None, None, "D", 11),
                (7, -100.0, datetime(2025, 1, 1), "stale", "U", 5),
                (200, 0.1, datetime(2026, 1, 2, 12, 30), "x'y", "I", 12),
            ],
            "k long, v double, ts timestamp, name string, op string, event_seq long",
        )
        t.merge_cdc(chg, batch_id="b1")
        out[mode] = LakeTable(spark, t.path)
    return out


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(where=_predicate())
def test_read_where_identity(tables, where):
    for mode, t in tables.items():
        got = sorted(map(tuple, t.read(where=where).collect()))
        expect = sorted(map(tuple, t.read().where(where).collect()))
        assert got == expect, (mode, where)
