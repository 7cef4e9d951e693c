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


def test_asof_value_collision_raises(spark):
    left = spark.createDataFrame([(1, 10, 5)], "k long, lts long, v long")
    right = spark.createDataFrame([(1, 5, 7)], "k long, rts long, v long")
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right, ["k"], "lts", "rts")
