"""Timestamp time travel (LakeTable.version_as_of / as_of_timestamp=).

Version-based travel has existed since round 2; this adds the Iceberg
``FOR TIMESTAMP AS OF`` / Delta ``timestampAsOf`` resolver on top: every
commit stamps ``committed_at`` (wall clock, informational only — commit
ORDER is the version chain), and ``version_as_of(ts)`` picks the snapshot
with the greatest commit time <= ts. Pinned here:

- resolution at, between, and after commit times (boundary inclusive)
- ts before the first snapshot -> ValueError naming the oldest retained
- a wall-clock REGRESSION between commits cannot shadow a later commit
- ISO-string / datetime / epoch-float inputs agree (naive = UTC)
- constructor plumbing (as_of_timestamp=) and version= mutual exclusion
- pre-stamp legacy manifests fall back to manifest mtime
- expire_snapshots removes old timestamps from the resolvable range
"""

import json
import os

import pytest
from pyspark.sql import types as T

from sap_spark.plans.lake import LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("content", T.StringType(), True),
    ]
)


class _Clock:
    """Settable stand-in for lake.py's ``time`` module: committed_at uses
    time.time(); the merge phase walls use time.monotonic()."""

    def __init__(self, now: float):
        self.now = now

    def time(self) -> float:
        return self.now

    @staticmethod
    def monotonic() -> float:
        import time as _t

        return _t.monotonic()


def _changes(spark, rows):
    return spark.createDataFrame(
        rows, "repo string, path string, content string, op string, event_seq long"
    )


def _state(table):
    return {(r["repo"], r["path"]): r["content"] for r in table.read().collect()}


@pytest.fixture()
def clocked_table(spark, tmpdir_path, monkeypatch):
    """v0 (create) at t=1000; v1 at t=2000 writes a=1; v2 at t=3000
    updates a=2 and inserts b=1."""
    import sap_spark.plans.lake as lake_mod

    clock = _Clock(1000.0)
    monkeypatch.setattr(lake_mod, "time", clock)
    path = f"{tmpdir_path}/t"
    table = LakeTable.create(
        spark, path, SCHEMA, key_columns=["repo", "path"], num_buckets=2
    )
    clock.now = 2000.0
    table.merge_cdc(_changes(spark, [("r", "a", "1", "I", 1)]), "b1")
    clock.now = 3000.0
    table.merge_cdc(
        _changes(spark, [("r", "a", "2", "U", 2), ("r", "b", "1", "I", 3)]), "b2"
    )
    return table, path, clock


def test_resolution_between_and_at_commits(spark, clocked_table):
    table, path, _ = clocked_table
    assert table.version_as_of(1000.0) == 0  # boundary inclusive
    assert table.version_as_of(1999.9) == 0
    assert table.version_as_of(2000.0) == 1
    assert table.version_as_of(2500.0) == 1
    assert table.version_as_of(3000.0) == 2
    assert table.version_as_of(10_000.0) == 2  # future ts -> current


def test_constructor_reads_the_resolved_snapshot(spark, clocked_table):
    _, path, _ = clocked_table
    assert _state(LakeTable(spark, path, as_of_timestamp=2500.0)) == {
        ("r", "a"): "1"
    }
    assert _state(LakeTable(spark, path, as_of_timestamp=3000.0)) == {
        ("r", "a"): "2",
        ("r", "b"): "1",
    }
    # resolved instance is pinned: current head does not leak through
    assert LakeTable(spark, path, as_of_timestamp=2500.0).version == 1


def test_before_history_raises_and_names_the_oldest(spark, clocked_table):
    table, _, _ = clocked_table
    with pytest.raises(ValueError, match="predates the retained history"):
        table.version_as_of(999.0)
    with pytest.raises(ValueError, match="v0 committed at 1000"):
        table.version_as_of(0.0)


def test_version_and_timestamp_are_mutually_exclusive(spark, clocked_table):
    _, path, _ = clocked_table
    with pytest.raises(ValueError, match="not both"):
        LakeTable(spark, path, version=1, as_of_timestamp=2500.0)


def test_input_forms_agree(spark, clocked_table):
    table, _, _ = clocked_table
    from datetime import datetime, timezone

    # epoch 2500 == 1970-01-01T00:41:40Z; naive ISO/datetime are UTC
    # because the session TZ is pinned UTC
    assert table.version_as_of("1970-01-01T00:41:40") == 1
    assert table.version_as_of("1970-01-01T00:41:40+00:00") == 1
    assert table.version_as_of(datetime(1970, 1, 1, 0, 41, 40)) == 1
    assert (
        table.version_as_of(
            datetime(1970, 1, 1, 0, 41, 40, tzinfo=timezone.utc)
        )
        == 1
    )
    with pytest.raises(TypeError, match="epoch seconds"):
        table.version_as_of(True)
    with pytest.raises(TypeError, match="epoch seconds"):
        table.version_as_of([2500.0])


def test_clock_regression_cannot_shadow_a_later_commit(
    spark, clocked_table
):
    """v3 commits with a REGRESSED wall clock (2100 < v2's 3000). The
    contract (Iceberg SnapshotUtil.snapshotIdAsOfTime): the highest
    VERSION with commit time <= ts wins — commit order is the version
    chain, never the clock — so v3 is reachable the moment ts covers its
    (regressed) stamp, a future ts resolves to the current head, and
    resolution stays monotone in ts."""
    table, path, clock = clocked_table
    clock.now = 2100.0
    table.merge_cdc(_changes(spark, [("r", "c", "1", "I", 4)]), "b3")
    assert table.version_as_of(2099.9) == 1
    assert table.version_as_of(2500.0) == 3  # highest version covered
    assert table.version_as_of(9999.0) == 3  # future ts -> current head
    assert ("r", "c") in _state(LakeTable(spark, path, as_of_timestamp=9999.0))
    resolved = [
        table.version_as_of(ts) for ts in (1000, 2000, 2099, 2100, 3000, 9999)
    ]
    assert resolved == sorted(resolved)  # monotone in ts


def test_legacy_manifest_without_stamp_falls_back_to_mtime(
    spark, clocked_table
):
    table, path, _ = clocked_table
    # simulate a pre-round-5 manifest: strip the stamp from v1 on disk
    mpath = table._manifest_path(1)
    with open(mpath) as f:
        m = json.load(f)
    del m["committed_at"]
    with open(mpath, "w") as f:
        json.dump(m, f)
    os.utime(mpath, (2222.0, 2222.0))
    fresh = LakeTable(spark, path)
    assert fresh.committed_at(1) == 2222.0
    assert fresh.version_as_of(2400.0) == 1  # resolved via the mtime


def test_expire_trims_the_resolvable_range(spark, clocked_table):
    table, path, _ = clocked_table
    table.expire_snapshots(keep_last=2)  # v0 gone; v1, v2 retained
    fresh = LakeTable(spark, path)
    assert fresh.version_as_of(2500.0) == 1
    with pytest.raises(ValueError, match="predates the retained history"):
        fresh.version_as_of(1500.0)


def test_changes_between_timestamps(spark, clocked_table):
    """The incremental change feed accepts timestamps on either end,
    resolving them through version_as_of — identical output to the
    version form."""
    table, _, _ = clocked_table
    by_version = sorted(map(tuple, table.changes_between(1, 2).collect()))
    by_ts = sorted(
        map(
            tuple,
            table.changes_between(
                from_timestamp=2500.0, to_timestamp=3000.0
            ).collect(),
        )
    )
    assert by_ts == by_version and len(by_ts) > 0
    with pytest.raises(ValueError, match="not both"):
        table.changes_between(1, from_timestamp=2500.0)
    with pytest.raises(TypeError, match="from_version or from_timestamp"):
        table.changes_between()


def test_history_carries_the_stamp(spark, clocked_table):
    table, _, _ = clocked_table
    stamps = {h["version"]: h["committed_at"] for h in table.history()}
    assert stamps == {0: 1000.0, 1: 2000.0, 2: 3000.0}
