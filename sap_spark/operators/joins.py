"""Join operators Spark lacks natively: as-of (point-in-time) join.

The reference delegates all joins to the OData server (it has none,
SURVEY.md §2.5); a CDC/training-data engine needs point-in-time lookups
constantly — "the dimension row as of this event's timestamp", feature
stores, slowly-changing joins against the change history a CDC table
retains.

``asof_join`` uses the canonical distributed formulation: union both
sides with a side marker, one window pass per key ordered by (ts, side)
carrying the right side's values forward with ``last(..., ignorenulls)``,
then keep left rows. Cost: ONE shuffle + sort over |left| + |right| —
no range-explosion, no per-row lookups, and the window partitioning is
the join key, so AQE/salting guidance for skewed keys applies as usual
(a key's rows must sort together; for a pathologically hot key, pre-split
left by time range and union the results).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_point: str,
    right_start: str,
    right_end: str,
    bin_width: float,
    inclusive_end: bool = False,
) -> DataFrame:
    """Point-in-interval join: left rows (numeric point p) × right rows
    (interval [start, end) — or [start, end] with ``inclusive_end``) with
    equal ``on`` keys and start ≤ p < end.

    Naive Spark plans this as a per-key nested loop (or a broadcast
    nested-loop join without keys) — quadratic in the hot key. This is the
    bucketized formulation: the axis is cut into ``bin_width``-sized bins,
    each interval explodes into the bins it covers, the point carries its
    bin, and the join becomes an equi-join on (keys…, bin) plus an exact
    interval filter. Cost: O(|left| + Σ interval_span/bin_width) join
    input, shuffled by (keys, bin) — hot keys spread across their bins.

    ``bin_width`` is the explicit scale knob: pick ≈ the median interval
    length (larger → fewer replicas per interval but bigger bin buckets;
    smaller → the reverse). Points/intervals must be numeric (cast
    timestamps to epoch seconds first).
    """
    if bin_width <= 0:
        raise ValueError("bin_width must be positive")
    p = F.col(left_point)
    s, e = F.col(right_start), F.col(right_end)
    l_binned = left.withColumn("__bin", F.floor(p / F.lit(bin_width)))
    # [start, end): the end bin is floor((end - ulp)/w); guard empty/negative
    # intervals (sequence() would DESCEND for end_bin < start_bin)
    end_edge = e if inclusive_end else e - F.lit(1e-9) * F.lit(bin_width)
    r_ok = right.where(e >= s if inclusive_end else e > s)
    r_binned = r_ok.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(s / F.lit(bin_width)),
                F.greatest(
                    F.floor(end_edge / F.lit(bin_width)),
                    F.floor(s / F.lit(bin_width)),
                ),
            )
        ),
    )
    cond = (p >= s) & ((p <= e) if inclusive_end else (p < e))
    return (
        l_binned.join(r_binned, on=[*on, "__bin"], how="inner")
        .where(cond)
        .drop("__bin")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str] | None = None,
    direction: str = "backward",
    strict: bool = False,
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_ts`` ≤ ``left_ts`` (direction='backward'; 'forward' mirrors:
    smallest right_ts ≥ left_ts) within the same ``on`` key group.

    ``strict=True`` excludes equal timestamps (< instead of ≤).
    Left rows with no match get nulls (left-outer semantics, like
    pandas.merge_asof / DuckDB ASOF JOIN).

    The right side must be unique per (on…, right_ts) — pre-aggregate
    otherwise (with ties the carried value would depend on sort order).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    value_cols = value_cols or [
        c for c in right.columns if c not in on and c != right_ts
    ]
    clash = [c for c in value_cols if c in left.columns]
    if clash:
        raise ValueError(f"value columns collide with left columns: {clash}")

    l_marked = left.select(
        *[F.col(c) for c in left.columns],
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in value_cols],
    )
    r_marked = right.select(
        *[F.col(c) for c in on],
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
            if c not in on
        ],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.col(c) for c in value_cols],
    ).select(*l_marked.columns)  # align column order for the union

    unioned = l_marked.unionByName(r_marked)

    # backward: ascending ts; at equal ts the right row sorts first
    # (side 0 < 1) so ≤ is inclusive — strict mode flips the side order.
    # forward: descending ts, same trick gives smallest right_ts ≥ left_ts.
    ts_order = F.col("__ts").asc() if direction == "backward" else F.col("__ts").desc()
    side_order = F.col("__side").desc() if strict else F.col("__side").asc()
    w = (
        Window.partitionBy(*on)
        .orderBy(ts_order, side_order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned
    for c in value_cols:
        filled = filled.withColumn(c, F.last(F.col(c), ignorenulls=True).over(w))
    return filled.where(F.col("__side") == 1).drop("__ts", "__side")
