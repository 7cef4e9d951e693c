"""As-of join vs pandas.merge_asof on randomized frames + edge cases."""

import numpy as np
import pandas as pd
import pytest

from sap_spark.operators.joins import asof_join


@pytest.fixture(scope="module")
def frames():
    rng = np.random.RandomState(11)
    left = pd.DataFrame(
        {
            "k": rng.randint(0, 5, 200).astype("int64"),
            "lts": rng.randint(0, 1000, 200).astype("int64"),
            "lval": np.arange(200).astype("int64"),
        }
    )
    right = (
        pd.DataFrame(
            {
                "k": rng.randint(0, 6, 80).astype("int64"),  # key 5 only in right
                "rts": rng.randint(0, 1000, 80).astype("int64"),
                "rval": (np.arange(80) * 10).astype("int64"),
            }
        )
        .drop_duplicates(["k", "rts"])
        .reset_index(drop=True)
    )
    return left, right


@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("strict", [False, True])
def test_asof_matches_pandas(spark, frames, direction, strict):
    left, right = frames
    got = (
        asof_join(
            spark.createDataFrame(left, "k long, lts long, lval long"),
            spark.createDataFrame(right, "k long, rts long, rval long"),
            on=["k"], left_ts="lts", right_ts="rts",
            direction=direction, strict=strict,
        )
        .toPandas()
        .sort_values(["k", "lts", "lval"])
        .reset_index(drop=True)
    )
    expected = (
        pd.merge_asof(
            left.sort_values("lts"),
            right.sort_values("rts"),
            left_on="lts", right_on="rts", by="k",
            direction=direction,
            allow_exact_matches=not strict,
        )
        .drop(columns=["rts"])
        .sort_values(["k", "lts", "lval"])
        .reset_index(drop=True)
    )
    got["rval"] = got["rval"].astype("float64")
    expected["rval"] = expected["rval"].astype("float64")
    assert got[["k", "lts", "lval", "rval"]].equals(
        expected[["k", "lts", "lval", "rval"]]
    ), f"{direction}/{strict}\n{got}\n{expected}"


def test_asof_no_match_is_null(spark):
    left = spark.createDataFrame([(1, 10), (2, 10)], "k long, lts long")
    right = spark.createDataFrame([(1, 20, 99)], "k long, rts long, v long")
    out = {
        r["k"]: r["v"]
        for r in asof_join(left, right, ["k"], "lts", "rts").collect()
    }
    assert out == {1: None, 2: None}  # right is later / key absent


def test_range_join_matches_bruteforce(spark):
    """Bucketized range join vs per-key brute force on random intervals,
    across bin widths (correctness must be bin-size-independent)."""
    from sap_spark.operators.joins import range_join

    rng = np.random.RandomState(3)
    pts = pd.DataFrame(
        {
            "k": rng.randint(0, 4, 150).astype("int64"),
            "p": rng.uniform(0, 100, 150),
            "pid": np.arange(150).astype("int64"),
        }
    )
    starts = rng.uniform(0, 95, 40)
    ivals = pd.DataFrame(
        {
            "k": rng.randint(0, 5, 40).astype("int64"),
            "s": starts,
            "e": starts + rng.uniform(0, 10, 40),
            "iid": np.arange(40).astype("int64"),
        }
    )
    expected = set()
    for _, pr in pts.iterrows():
        for _, ir in ivals.iterrows():
            if pr.k == ir.k and ir.s <= pr.p < ir.e:
                expected.add((int(pr.pid), int(ir.iid)))

    lf = spark.createDataFrame(pts, "k long, p double, pid long")
    rf = spark.createDataFrame(ivals, "k long, s double, e double, iid long")
    for bw in (0.5, 3.0, 50.0):
        got = {
            (r["pid"], r["iid"])
            for r in range_join(
                lf, rf, on=["k"], left_point="p",
                right_start="s", right_end="e", bin_width=bw,
            ).collect()
        }
        assert got == expected, f"bin_width={bw}"


def test_range_join_inclusive_and_degenerate(spark):
    from sap_spark.operators.joins import range_join

    lf = spark.createDataFrame([(1, 5.0, 1), (1, 7.0, 2)], "k long, p double, pid long")
    rf = spark.createDataFrame(
        [(1, 3.0, 5.0, 10), (1, 7.0, 7.0, 11), (1, 9.0, 2.0, 12)],
        "k long, s double, e double, iid long",
    )
    halfopen = {
        (r["pid"], r["iid"])
        for r in range_join(lf, rf, ["k"], "p", "s", "e", bin_width=2.0).collect()
    }
    assert halfopen == set()  # 5.0 excluded by [3,5); degenerate/backward dropped
    closed = {
        (r["pid"], r["iid"])
        for r in range_join(
            lf, rf, ["k"], "p", "s", "e", bin_width=2.0, inclusive_end=True
        ).collect()
    }
    assert closed == {(1, 10), (2, 11)}  # end-inclusive + zero-length interval


def test_asof_null_column_stays_null(spark):
    """All attached columns must come from the SAME matched right row: a
    legitimately NULL column in the matched row stays NULL instead of
    back-filling from an older right row (pandas.merge_asof / DuckDB ASOF
    parity — the per-column last(ignorenulls) formulation gets this wrong)."""
    left = spark.createDataFrame([(1, 30)], "k long, lts long")
    right = spark.createDataFrame(
        [(1, 10, "old-a", "old-b"), (1, 20, "new-a", None)],
        "k long, rts long, a string, b string",
    )
    row = asof_join(left, right, ["k"], "lts", "rts").collect()[0]
    assert row["a"] == "new-a"
    assert row["b"] is None  # NOT "old-b"


@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("strict", [False, True])
def test_asof_bucketed_matches_plain(spark, frames, direction, strict):
    """time_bucket_width must not change results — same random frames as
    the pandas-parity test, bucketed vs plain."""
    lf = spark.createDataFrame(frames[0], "k long, lts long, lval long")
    rf = spark.createDataFrame(frames[1], "k long, rts long, rval long")
    kwargs = dict(on=["k"], left_ts="lts", right_ts="rts",
                  direction=direction, strict=strict)
    plain = {
        (r["k"], r["lts"], r["lval"], r["rval"])
        for r in asof_join(lf, rf, **kwargs).collect()
    }
    bucketed = {
        (r["k"], r["lts"], r["lval"], r["rval"])
        for r in asof_join(lf, rf, time_bucket_width=50.0, **kwargs).collect()
    }
    assert bucketed == plain, f"{direction}/{strict}"


def test_asof_hot_key_bucketed(spark):
    """Hot-key mitigation: one key holds ~50% of all rows; the bucketed
    path must (a) match pandas.merge_asof exactly and (b) bound the
    per-(key, time-bucket) partition size well below the hot key's total."""
    rng = np.random.RandomState(7)
    n = 4000
    hot = rng.rand(n) < 0.5
    left = pd.DataFrame(
        {
            "k": np.where(hot, 0, rng.randint(1, 40, n)).astype("int64"),
            "lts": rng.randint(0, 100_000, n).astype("int64"),
            "lval": np.arange(n).astype("int64"),
        }
    )
    right = (
        pd.DataFrame(
            {
                "k": rng.randint(0, 40, 600).astype("int64"),
                "rts": rng.randint(0, 100_000, 600).astype("int64"),
                "rval": (np.arange(600) * 10).astype("int64"),
            }
        )
        .drop_duplicates(["k", "rts"])
        .reset_index(drop=True)
    )
    width = 5_000.0  # 20 time buckets over the ts range
    got = (
        asof_join(
            spark.createDataFrame(left, "k long, lts long, lval long"),
            spark.createDataFrame(right, "k long, rts long, rval long"),
            on=["k"], left_ts="lts", right_ts="rts",
            time_bucket_width=width,
        )
        .toPandas()
        .sort_values(["k", "lts", "lval"])
        .reset_index(drop=True)
    )
    expected = (
        pd.merge_asof(
            left.sort_values("lts"), right.sort_values("rts"),
            left_on="lts", right_on="rts", by="k",
        )
        .drop(columns=["rts"])
        .sort_values(["k", "lts", "lval"])
        .reset_index(drop=True)
    )
    for df in (got, expected):
        df["rval"] = df["rval"].astype("float64")
    assert got[["k", "lts", "lval", "rval"]].equals(
        expected[["k", "lts", "lval", "rval"]]
    )
    # the window partition is (key, bucket): its size is bounded by the
    # densest bucket of the hot key (+1 carry row), far below the hot
    # key's ~2000 rows — the quantity the un-bucketed sort would see
    hot_rows = left[left.k == 0]
    per_bucket = hot_rows.groupby(hot_rows.lts // int(width)).size()
    assert per_bucket.max() < 300
    assert len(hot_rows) > 1800


def test_range_join_end_on_bin_boundary(spark):
    """An exclusive interval end just above a bin boundary must keep its
    last bin: with end = 4.0 + 1e-10 and bin_width 2.0, the point 4.0 lies
    in bin 2 and matches — an epsilon-subtracted end edge would floor to
    bin 1 and silently drop it."""
    from sap_spark.operators.joins import range_join

    lf = spark.createDataFrame([(1, 4.0, 1)], "k long, p double, pid long")
    rf = spark.createDataFrame(
        [(1, 0.0, 4.0 + 1e-10, 10), (1, 0.0, 4.0, 11)],
        "k long, s double, e double, iid long",
    )
    got = {
        (r["pid"], r["iid"])
        for r in range_join(lf, rf, ["k"], "p", "s", "e", bin_width=2.0).collect()
    }
    assert got == {(1, 10)}  # p=4.0 < 4.0+1e-10; excluded by [0,4.0)


def test_interval_join_matches_bruteforce(spark):
    """Bucketized interval-overlap join vs brute force, across bin widths;
    the claim-bin trick must emit each overlapping pair exactly once."""
    from sap_spark.operators.joins import interval_join

    rng = np.random.RandomState(17)
    n_l, n_r = 120, 90
    ls = rng.uniform(0, 100, n_l)
    rs = rng.uniform(0, 100, n_r)
    left = pd.DataFrame(
        {
            "k": rng.randint(0, 4, n_l).astype("int64"),
            "ls": ls, "le": ls + rng.uniform(0, 12, n_l),
            "lid": np.arange(n_l).astype("int64"),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.randint(0, 5, n_r).astype("int64"),
            "rs": rs, "re": rs + rng.uniform(0, 8, n_r),
            "rid": np.arange(n_r).astype("int64"),
        }
    )
    expected = set()
    for _, a in left.iterrows():
        for _, b in right.iterrows():
            if a["k"] == b["k"] and a["ls"] < b["re"] and b["rs"] < a["le"]:
                expected.add((int(a["lid"]), int(b["rid"])))

    lf = spark.createDataFrame(left, "k long, ls double, le double, lid long")
    rf = spark.createDataFrame(right, "k long, rs double, re double, rid long")
    for bw in (1.0, 5.0, 40.0):
        rows = interval_join(
            lf, rf, ["k"], "ls", "le", "rs", "re", bin_width=bw
        ).collect()
        got = [(r["lid"], r["rid"]) for r in rows]
        assert len(got) == len(set(got)), f"duplicate pairs at bw={bw}"
        assert set(got) == expected, f"bin_width={bw}"


def test_interval_join_inclusive_touching(spark):
    from sap_spark.operators.joins import interval_join

    lf = spark.createDataFrame([(1, 0.0, 5.0, 1)], "k long, ls double, le double, lid long")
    rf = spark.createDataFrame(
        [(1, 5.0, 9.0, 10), (1, 9.5, 9.5, 11)],
        "k long, rs double, re double, rid long",
    )
    halfopen = interval_join(lf, rf, ["k"], "ls", "le", "rs", "re", 2.0).collect()
    assert halfopen == []  # touching endpoints don't overlap half-open
    closed = {
        (r["lid"], r["rid"])
        for r in interval_join(
            lf, rf, ["k"], "ls", "le", "rs", "re", 2.0, inclusive=True
        ).collect()
    }
    assert closed == {(1, 10)}  # touching counts when closed; point 9.5 apart


def test_asof_value_collision_raises(spark):
    left = spark.createDataFrame([(1, 10, 5)], "k long, lts long, v long")
    right = spark.createDataFrame([(1, 5, 7)], "k long, rts long, v long")
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right, ["k"], "lts", "rts")


def test_range_join_oversized_interval_fails_fast(spark):
    """An interval covering more bins than max_bins_per_row (a ms-vs-s
    unit mismatch, or corrupt data) must raise a clear error naming the
    knob — not die later with an opaque array-size/OOM failure."""
    from sap_spark.operators.joins import interval_join, range_join

    lf = spark.createDataFrame([(1, 4.0, 1)], "k long, p double, pid long")
    rf = spark.createDataFrame(
        [(1, 0.0, 1.0e9, 10)], "k long, s double, e double, iid long"
    )
    with pytest.raises(Exception, match="max_bins_per_row"):
        range_join(
            lf, rf, ["k"], "p", "s", "e", bin_width=1.0, max_bins_per_row=1000
        ).collect()
    # same guard on both sides of the interval join
    l2 = spark.createDataFrame(
        [(1, 0.0, 1.0e9, 1)], "k long, ls double, le double, lid long"
    )
    r2 = spark.createDataFrame(
        [(1, 2.0, 3.0, 10)], "k long, rs double, re double, rid long"
    )
    with pytest.raises(Exception, match="max_bins_per_row"):
        interval_join(
            l2, r2, ["k"], "ls", "le", "rs", "re", 1.0, max_bins_per_row=1000
        ).collect()
    # a wide-but-allowed interval still joins fine at a bigger width
    ok = range_join(lf, rf, ["k"], "p", "s", "e", bin_width=2.0e6).collect()
    assert len(ok) == 1


def test_range_interval_join_column_clash_raises(spark):
    """Shared non-key payload columns fail fast with the colliding names
    (asof_join's contract), not an ambiguous-column AnalysisException at
    the final filter."""
    from sap_spark.operators.joins import interval_join, range_join

    lf = spark.createDataFrame([(1, 4.0, 1)], "k long, p double, tag long")
    rf = spark.createDataFrame(
        [(1, 0.0, 8.0, 2)], "k long, s double, e double, tag long"
    )
    with pytest.raises(ValueError, match=r"\['tag'\]"):
        range_join(lf, rf, ["k"], "p", "s", "e", bin_width=2.0)
    l2 = spark.createDataFrame(
        [(1, 0.0, 5.0, 1)], "k long, ls double, le double, tag long"
    )
    r2 = spark.createDataFrame(
        [(1, 2.0, 3.0, 2)], "k long, rs double, re double, tag long"
    )
    with pytest.raises(ValueError, match=r"\['tag'\]"):
        interval_join(l2, r2, ["k"], "ls", "le", "rs", "re", 2.0)
