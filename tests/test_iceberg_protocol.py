"""Full emitted-statement sequences of the Iceberg binding, pinned.

The sandbox has no iceberg-spark-runtime jar (tests/test_backend_contract.py
skips its Iceberg leg for that reason), so the binding cannot be executed
against a live catalog here. These tests close the remaining gap the
pinned-SQL builder tests leave: they drive the REAL method bodies
(merge_cdc, rebucket, expire_snapshots, compact) against a recording
SparkSession stand-in and assert the exact statement SEQUENCE each law
depends on — WAP ordering for exactly-once (law 2), the pending-marker
bracket for rebucket (law 9), the batch-ledger mirror BEFORE snapshot
expiry (law 2 under law 6). The DataFrame legs (view staging) run on the
real session, so what's faked is only the catalog boundary.

Executed-catalog verification remains blocked on the jar; see
BENCH/ICEBERG_r5.md for the evidence trail an operator with network
access would complete.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import types as T

from sap_spark.plans.iceberg_backend import (
    PROP_BATCHES,
    PROP_BUCKETS,
    PROP_KEYS,
    PROP_REBUCKET_PENDING,
    IcebergTable,
    _sql_expire_snapshots,
    _sql_merge,
    _sql_publish,
    _sql_rebucket,
    _sql_rewrite_data_files,
    _sql_set_property,
    _sql_unset_property,
)

TABLE = "ice.cdc.repos"
KEYS = ["repo", "path"]

USER_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType(), True),
        T.StructField("path", T.StringType(), True),
        T.StructField("content", T.StringType(), True),
    ]
)
FULL_SCHEMA = T.StructType(
    list(USER_SCHEMA.fields)
    + [
        T.StructField("_seq", T.LongType(), True),
        T.StructField("_deleted", T.BooleanType(), True),
        T.StructField("_bucket", T.IntegerType(), True),
    ]
)


class _Result:
    def __init__(self, rows=None):
        self._rows = rows or []

    def collect(self):
        return self._rows


class _FakeConf:
    def __init__(self, log):
        self._log = log

    def set(self, k, v):
        self._log.append(("conf.set", k, v))

    def unset(self, k):
        self._log.append(("conf.unset", k))


class _FakeCatalog:
    def __init__(self, log, real):
        self._log, self._real = log, real

    def dropTempView(self, name):
        self._log.append(("dropTempView", name))
        return self._real.catalog.dropTempView(name)


class FakeSpark:
    """Records every catalog-boundary call; DataFrame work stays real."""

    def __init__(self, real):
        self.log: list = []
        self.conf = _FakeConf(self.log)
        self.catalog = _FakeCatalog(self.log, real)
        self._real = real
        self.props_rows: list = []

    def sql(self, q):
        self.log.append(("sql", q))
        if q.startswith("SHOW TBLPROPERTIES"):
            return _Result(self.props_rows)
        return _Result([])  # history/snapshots/DML: empty catalog

    def table(self, name):
        return self._real.createDataFrame([], FULL_SCHEMA)

    def sqls(self):
        return [x[1] for x in self.log if x[0] == "sql"]


def _table(spark) -> tuple[IcebergTable, FakeSpark]:
    fake = FakeSpark(spark)
    t = IcebergTable.__new__(IcebergTable)
    t.spark = fake
    t.path = TABLE
    t.catalog, t.namespace, t.table = TABLE.split(".")
    t._ancestry = []
    t.version = 0
    t._props = {
        PROP_KEYS: json.dumps(KEYS),
        PROP_BUCKETS: "8",
        PROP_BATCHES: "[]",
    }
    return t, fake


def _changes(spark):
    return spark.createDataFrame(
        [("r1", "f1", "body", "I", 1)],
        "repo string, path string, content string, op string, event_seq long",
    )


def test_merge_cdc_wap_statement_sequence(spark):
    """Law 2's crash-safety rests on this exact order: stage the MERGE
    under wap.id (invisible), clear the conf, publish. A publish before
    the MERGE, or a MERGE outside the wap scope, would commit without a
    marker — replays would double-apply."""
    t, fake = _table(spark)
    assert t.merge_cdc(_changes(spark), "epoch-1", affected_buckets=[3]) is True
    view = next(e[1] for e in fake.log if e[0] == "dropTempView")
    expected_merge = _sql_merge(
        TABLE, view, KEYS, ["repo", "path", "content"], [3]
    )
    boundary = [
        e
        for e in fake.log
        if not (e[0] == "sql" and ".history" in e[1])  # reload, not protocol
    ]
    assert boundary == [
        ("conf.set", "spark.wap.id", "epoch-1"),
        ("sql", expected_merge),
        ("conf.unset", "spark.wap.id"),
        ("sql", _sql_publish("ice", "cdc.repos", "epoch-1")),
        ("dropTempView", view),
    ]


def test_merge_cdc_replay_is_statement_free(spark):
    """A committed batch_id must not reach the catalog at all."""
    t, fake = _table(spark)
    t._props[PROP_BATCHES] = json.dumps(["epoch-1"])
    assert t.merge_cdc(_changes(spark), "epoch-1", affected_buckets=[3]) is False
    assert fake.log == []


def test_merge_cdc_empty_batch_records_ledger_only(spark):
    """An all-cancelled batch stages no snapshot for publish_changes to
    find; the batch id goes straight to the durable ledger property —
    one statement, no WAP bracket."""
    t, fake = _table(spark)
    t2_props = [
        {"key": PROP_KEYS, "value": json.dumps(KEYS)},
        {"key": PROP_BUCKETS, "value": "8"},
        {"key": PROP_BATCHES, "value": json.dumps(["epoch-9"])},
    ]
    fake.props_rows = [
        type("R", (), {"__getitem__": lambda s, k, d=d: d[k]})()
        for d in t2_props  # d=d: bind per-row, not the loop variable
    ]
    assert t.merge_cdc(_changes(spark), "epoch-9", affected_buckets=[]) is True
    assert fake.sqls()[0] == _sql_set_property(
        TABLE, PROP_BATCHES, json.dumps(["epoch-9"])
    )
    # only the ledger write + the props reload hit the boundary
    assert [s for s in fake.sqls() if not s.startswith("SHOW TBLPROPERTIES")] == [
        _sql_set_property(TABLE, PROP_BATCHES, json.dumps(["epoch-9"]))
    ]
    assert ("conf.set", "spark.wap.id", "epoch-9") not in fake.log


def test_rebucket_pending_marker_brackets_the_update(spark):
    """Law 9's two-commit crash window: the pending marker must land
    BEFORE the row UPDATE and clear only AFTER the bucket-count flip —
    any other order leaves an undetectable half-resharded table."""
    t, fake = _table(spark)
    t.rebucket(32)
    stmts = [s for s in fake.sqls() if not s.startswith("SHOW TBLPROPERTIES")
             and ".history" not in s]
    assert stmts == [
        _sql_set_property(TABLE, PROP_REBUCKET_PENDING, "32"),
        _sql_rebucket(TABLE, KEYS, 32),
        _sql_set_property(TABLE, PROP_BUCKETS, "32"),
        _sql_unset_property(TABLE, PROP_REBUCKET_PENDING),
    ]


def test_rebucket_repair_reruns_same_target_only(spark):
    """Crash between UPDATE and flip: re-running the SAME target repairs
    (idempotent UPDATE, then flip + clear); a different target raises."""
    t, fake = _table(spark)
    t._props[PROP_REBUCKET_PENDING] = "32"
    with pytest.raises(RuntimeError, match=r"rebucket\(32\)"):
        t.rebucket(16)
    assert fake.log == []
    t.rebucket(32)  # repair: full bracket re-emitted
    stmts = [s for s in fake.sqls() if not s.startswith("SHOW TBLPROPERTIES")
             and ".history" not in s]
    assert stmts[0] == _sql_set_property(TABLE, PROP_REBUCKET_PENDING, "32")
    assert stmts[-1] == _sql_unset_property(TABLE, PROP_REBUCKET_PENDING)


def test_expire_snapshots_mirrors_ledger_first(spark):
    """Law 2 under law 6: expired snapshots lose their wap.id summaries,
    so the batch ids MUST be mirrored into the property before the
    expire call — the reverse order reopens the exactly-once door."""
    t, fake = _table(spark)
    t._props[PROP_BATCHES] = json.dumps(["epoch-1", "epoch-2"])
    t.expire_snapshots(keep_last=2)
    stmts = [s for s in fake.sqls() if not s.startswith("SHOW TBLPROPERTIES")]
    assert stmts == [
        _sql_set_property(
            TABLE, PROP_BATCHES, json.dumps(["epoch-1", "epoch-2"])
        ),
        _sql_expire_snapshots("ice", "cdc.repos", 2),
    ]


def test_compact_is_one_rewrite_call(spark):
    t, fake = _table(spark)
    t.compact(zorder=["repo", "path"])
    stmts = [s for s in fake.sqls() if ".history" not in s]
    assert stmts == [
        _sql_rewrite_data_files("ice", "cdc.repos", ["repo", "path"])
    ]


def test_expiry_mirror_trims_to_ledger_retention(spark):
    """LakeTable parity: the expired-batches mirror is chronological and
    bounded — beyond the retention window the OLDEST ids age out, or the
    property would grow one id per epoch forever, re-serialized at every
    expiry."""
    from sap_spark.plans.iceberg_backend import PROP_LEDGER_RETENTION

    t, fake = _table(spark)
    t._props[PROP_BATCHES] = json.dumps(["e1", "e2", "e3", "e4"])
    t._props[PROP_LEDGER_RETENTION] = "3"
    t.expire_snapshots(keep_last=2)
    stmts = [s for s in fake.sqls() if not s.startswith("SHOW TBLPROPERTIES")]
    assert stmts[0] == _sql_set_property(
        TABLE, PROP_BATCHES, json.dumps(["e2", "e3", "e4"])
    )


def test_empty_batch_ledger_append_is_chronological_and_trimmed(spark):
    """The no-bucket fast path appends (never re-sorts — chronology is
    what makes the trim sound) and honors the retention property."""
    from sap_spark.plans.iceberg_backend import PROP_LEDGER_RETENTION

    t, fake = _table(spark)
    # "z-first" sorts BEFORE "a-later" lexically; chronological order
    # must win over sort order for the trim to drop the true oldest
    t._props[PROP_BATCHES] = json.dumps(["z-first", "a-later"])
    t._props[PROP_LEDGER_RETENTION] = "2"
    assert t.merge_cdc(_changes(spark), "m-new", affected_buckets=[]) is True
    assert fake.sqls()[0] == _sql_set_property(
        TABLE, PROP_BATCHES, json.dumps(["a-later", "m-new"])
    )


def test_overwrite_replay_is_statement_free(spark):
    """Law 2 applies to the backfill path too: a replayed overwrite
    batch_id (already in the ledger or a live wap.id summary) must not
    reach the catalog — LakeTable.overwrite no-ops identically, so a
    restarted backfill driver re-running its epoch burns no snapshot on
    either backend."""
    t, fake = _table(spark)
    t._props[PROP_BATCHES] = json.dumps(["seed"])
    df = spark.createDataFrame(
        [("r1", "f1", "body")], "repo string, path string, content string"
    )
    t.overwrite(df, batch_id="seed")
    assert fake.log == []


def test_merge_cdc_null_op_rows_are_inert(spark):
    """LakeTable parity: op=NULL expresses no change. Kept, such a row
    would compute a NULL _deleted for the NOT NULL internal column and
    corrupt (or fail) the MERGE. The staged source view must carry only
    the valid rows, with no null _deleted."""

    class _ViewInspectingSpark(FakeSpark):
        def sql(self, q):
            if q.startswith("MERGE INTO"):
                # the temp view exists on the REAL session right now —
                # snapshot what the binding actually staged
                view = q.split(" USING ")[1].split(" ")[0].strip("`")
                staged = self._real.table(view).collect()
                self.log.append(
                    (
                        "staged",
                        len(staged),
                        sum(1 for r in staged if r["_deleted"] is None),
                    )
                )
            return super().sql(q)

    fake = _ViewInspectingSpark(spark)
    t = IcebergTable.__new__(IcebergTable)
    t.spark = fake
    t.path = TABLE
    t.catalog, t.namespace, t.table = TABLE.split(".")
    t._ancestry = []
    t.version = 0
    t._props = {
        PROP_KEYS: json.dumps(KEYS),
        PROP_BUCKETS: "8",
        PROP_BATCHES: "[]",
    }
    changes = spark.createDataFrame(
        [
            ("r1", "f1", "body", "I", 1),
            ("r2", "f2", None, None, 2),  # malformed: no op — inert
        ],
        "repo string, path string, content string, op string, event_seq long",
    )
    assert t.merge_cdc(changes, "epoch-1", affected_buckets=[1, 2, 3]) is True
    staged = next(e for e in fake.log if e[0] == "staged")
    assert staged == ("staged", 1, 0)  # one valid row, zero null _deleted


def test_evolve_schema_rejects_key_widening(spark):
    """LakeTable parity: the stored identity _bucket values are a
    function of the key dtype, so widening a key would route future
    merges' bucket pruning away from existing rows. Must raise BEFORE
    any DDL reaches the catalog."""
    from sap_spark.schema.compat import SchemaCompatError

    int_key_full = T.StructType(
        [
            T.StructField("id", T.IntegerType(), True),
            T.StructField("v", T.StringType(), True),
            T.StructField("_seq", T.LongType(), True),
            T.StructField("_deleted", T.BooleanType(), True),
            T.StructField("_bucket", T.IntegerType(), True),
        ]
    )

    class _IntKeySpark(FakeSpark):
        def table(self, name):
            return self._real.createDataFrame([], int_key_full)

    fake = _IntKeySpark(spark)
    t = IcebergTable.__new__(IcebergTable)
    t.spark = fake
    t.path = TABLE
    t.catalog, t.namespace, t.table = TABLE.split(".")
    t._ancestry = []
    t.version = 0
    t._props = {
        PROP_KEYS: json.dumps(["id"]),
        PROP_BUCKETS: "8",
        PROP_BATCHES: "[]",
    }
    wide = T.StructType(
        [
            T.StructField("id", T.LongType(), True),
            T.StructField("v", T.StringType(), True),
        ]
    )
    with pytest.raises(SchemaCompatError, match="key column"):
        t.evolve_schema(wide)
    assert fake.sqls() == []  # nothing reached the catalog

    # widening a NON-key column still compiles to DDL
    wide_payload = T.StructType(
        [
            T.StructField("id", T.IntegerType(), True),
            T.StructField("v", T.StringType(), True),
            T.StructField("n", T.LongType(), True),
        ]
    )
    assert t.evolve_schema(wide_payload) is True
    assert any("ADD COLUMNS" in s for s in fake.sqls())
