"""SimHash cross-engine portability — the property _DOCS_NEARDUP_SQL rests on.

The docs_neardup_methods oracle promotion (round 5) requires DuckDB to
recompute the 64-bit SimHash fingerprint *bit-identically* from SQL:

    Spark side  (functions/similarity.py::simhash64, pandas UDF):
        token hash = int.from_bytes(sha256(tok)[:8], "big")
    DuckDB side (_DOCS_NEARDUP_SQL):
        token hash = ('0x' || substr(sha256(tok), 1, 16))::UBIGINT

plus identical tokenization (Python str.split() on the normalized text ==
split on single spaces — normalize_text collapses whitespace runs) and
identical vote/sign folding. A silent drift in any of these (hash choice,
endianness, empty-doc handling, tie-at-zero votes) would flip the driver's
hash check from green to red with no unit-level signal — this test IS that
unit-level signal.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from pyspark.sql import functions as F

from sap_spark.functions.similarity import simhash64
from sap_spark.functions.text import normalize_text

# corpus exercising every edge the oracle must agree on: plain text,
# repeated tokens (multiplicity matters — votes are per occurrence, not
# per distinct token), punctuation stripped by normalization, whitespace
# runs incl. \x0B (the Java-vs-RE2 \s discrepancy), digits, a single
# token, and text that normalizes to empty (fingerprint 0 by contract)
DOCS = [
    "the quick brown fox jumps over the lazy dog",
    "the the the the repeated token vote weight",
    "Punctuation, stripped! (by) normalization?",
    "mixed   runs\tof\nwhitespace\x0bhere",
    "42 numbers 007 and words",
    "single",
    "...",  # normalizes to '' -> no tokens -> fingerprint 0
    "",
]

_DUCK_SIMHASH_SQL = """
WITH norm AS (
    SELECT doc_id,
           trim(regexp_replace(regexp_replace(lower(text),
                '[^a-z0-9 \t\n\x0B\f\r]', ' ', 'g'),
                '[ \t\n\x0B\f\r]+', ' ', 'g')) AS t
    FROM docs
),
stoks AS (
    SELECT doc_id, unnest(string_split(t, ' ')) AS tok
    FROM norm WHERE t <> ''
),
sth AS (
    SELECT doc_id, ('0x' || substr(sha256(tok), 1, 16))::UBIGINT AS h
    FROM stoks
),
sbits AS (
    SELECT doc_id, b,
           sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS v
    FROM sth, UNNEST(generate_series(0, 63)) AS u(b)
    GROUP BY doc_id, b
),
sfp0 AS (
    SELECT doc_id,
           sum(CASE WHEN v > 0 THEN
                 CASE WHEN b = 63 THEN -9223372036854775808
                      ELSE (1::BIGINT << b) END
               ELSE 0 END)::BIGINT AS fp
    FROM sbits GROUP BY doc_id
)
SELECT d.doc_id, coalesce(f.fp, 0) AS fp
FROM docs d LEFT JOIN sfp0 f USING (doc_id)
ORDER BY d.doc_id
"""


@pytest.fixture(scope="module")
def corpus_pdf():
    return pd.DataFrame({"doc_id": range(len(DOCS)), "text": DOCS})


def test_simhash_spark_equals_duckdb(spark, corpus_pdf):
    sdf = spark.createDataFrame(corpus_pdf)
    got = {
        r["doc_id"]: r["fp"]
        for r in sdf.select(
            "doc_id", simhash64(normalize_text(F.col("text"))).alias("fp")
        ).collect()
    }
    con = duckdb.connect()
    con.register("docs", corpus_pdf)
    want = {int(d): int(f) for d, f in con.execute(_DUCK_SIMHASH_SQL).fetchall()}
    assert got == want


def test_empty_and_whitespace_docs_fingerprint_zero(spark, corpus_pdf):
    sdf = spark.createDataFrame(corpus_pdf)
    fps = {
        r["doc_id"]: r["fp"]
        for r in sdf.select(
            "doc_id", simhash64(normalize_text(F.col("text"))).alias("fp")
        ).collect()
    }
    assert fps[6] == 0  # '...' normalizes to ''
    assert fps[7] == 0  # ''


def test_token_multiplicity_changes_fingerprint(spark):
    # 'a b' vs 'a a a b' — if votes were per *distinct* token these would
    # collide; per-occurrence voting (the Python and SQL contract) differs
    pdf = pd.DataFrame({"doc_id": [0, 1], "text": ["a b c x y z", "a a a a a b c x y z"]})
    sdf = spark.createDataFrame(pdf)
    fps = [
        r["fp"]
        for r in sdf.select(
            simhash64(normalize_text(F.col("text"))).alias("fp")
        ).collect()
    ]
    assert fps[0] != fps[1]
