"""Join operators Spark lacks natively: as-of (point-in-time) join and a
bucketized range join.

The reference delegates all joins to the OData server (it has none,
SURVEY.md §2.5); a CDC/training-data engine needs point-in-time lookups
constantly — "the dimension row as of this event's timestamp", feature
stores, slowly-changing joins against the change history a CDC table
retains.

``asof_join`` uses the canonical distributed formulation: union both
sides with a side marker, ONE window pass per key ordered by (ts, side)
carrying the matched right row forward as a single struct with
``last(struct, ignorenulls)``, then keep left rows. Cost: one shuffle +
sort over |left| + |right|, no range-explosion, no per-row lookups.
Carrying one struct (not one ``last`` per column) guarantees every output
row's value columns come from the SAME matched right row — a legitimately
NULL column in the matched row stays NULL instead of back-filling from an
older row (pandas.merge_asof / DuckDB ASOF parity).

A pathologically hot key (one key holding a large share of rows) cannot
be split by AQE inside ``Window.partitionBy``. ``time_bucket_width``
activates the documented mitigation: time is cut into fixed-width ranges,
each (key, bucket) sorts independently, and per-bucket "carry-in" rows
(the as-of right row at each bucket's start) restore cross-bucket
lookback — identical results, per-partition row count bounded by the
densest time bucket instead of the hottest key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _check_no_column_clash(
    left: DataFrame, right: DataFrame, on: list[str]
) -> None:
    """Non-key columns shared by both sides would surface as an ambiguous-
    column AnalysisException only at the final filter — fail fast instead,
    naming the colliding columns (same contract asof_join enforces)."""
    clash = sorted((set(left.columns) & set(right.columns)) - set(on))
    if clash:
        raise ValueError(
            f"non-key columns present on both join sides: {clash}; "
            "rename or drop them on one side before joining"
        )


def _bounded_end_bin(
    sc, ec, w, bin_width: float, max_bins_per_row: int
):
    """End-bin expression that fails fast with a clear message when one
    interval would explode into more than ``max_bins_per_row`` replicas —
    the symptom of a unit mismatch (ms timestamps against an s-scale
    bin_width) or corrupt interval data, which otherwise dies much later
    with an opaque array-size/OOM error, data-dependently."""
    span_bins = F.floor(ec / w) - F.floor(sc / w)
    return F.when(
        span_bins >= F.lit(max_bins_per_row),
        F.raise_error(
            F.concat(
                F.lit("interval ["),
                sc.cast("string"),
                F.lit(", "),
                ec.cast("string"),
                F.lit(") covers "),
                (span_bins + 1).cast("string"),
                F.lit(
                    f" bins > max_bins_per_row={max_bins_per_row} at "
                    f"bin_width={bin_width} — likely a unit mismatch "
                    "(e.g. millisecond timestamps with a second-scale "
                    "bin_width); raise bin_width or max_bins_per_row"
                ),
            )
        ).cast("long"),
    ).otherwise(F.floor(ec / w))


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_point: str,
    right_start: str,
    right_end: str,
    bin_width: float,
    inclusive_end: bool = False,
    max_bins_per_row: int = 100_000,
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

    The interval's last bin is always ``floor(end / bin_width)`` — even
    for an exclusive end exactly on a bin boundary. IEEE division is
    monotone, so every point p < end satisfies floor(p/w) ≤ floor(end/w);
    candidate generation can over-include (one empty replica when an
    exclusive end sits exactly on a boundary — the exact filter removes
    it) but can never miss. An epsilon-subtracted edge could: a float end
    strictly inside the epsilon above a boundary would drop its last bin,
    and the exact filter cannot recover missed candidates.
    """
    if bin_width <= 0:
        raise ValueError("bin_width must be positive")
    _check_no_column_clash(left, right, on)
    p = F.col(left_point)
    s, e = F.col(right_start), F.col(right_end)
    w = F.lit(bin_width)
    l_binned = left.withColumn("__bin", F.floor(p / w))
    # guard empty/negative intervals (sequence() would DESCEND for
    # end_bin < start_bin)
    r_ok = right.where(e >= s if inclusive_end else e > s)
    r_binned = r_ok.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(s / w),
                F.greatest(
                    _bounded_end_bin(s, e, w, bin_width, max_bins_per_row),
                    F.floor(s / w),
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


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bin_width: float,
    inclusive: bool = False,
    max_bins_per_row: int = 100_000,
) -> DataFrame:
    """Interval-overlap join: left [ls, le) × right [rs, re) pairs with
    equal ``on`` keys that overlap (``ls < re and rs < le``; with
    ``inclusive``, closed intervals and ``<=``). The alignment primitive
    — audio segments × transcript spans, sessions × incidents.

    Same bucketized shape as :func:`range_join`: both sides explode into
    the ``bin_width`` bins they cover and the join is an equi-join on
    (keys…, bin) plus the exact overlap filter. An overlapping pair
    would meet in every shared bin, so each pair is CLAIMED exactly once
    — in the bin containing ``max(ls, rs)`` (which every overlap
    guarantees lies in both ranges) — instead of paying a distinct
    shuffle over the matched pairs. Degenerate intervals (end < start,
    or = start in half-open mode) are dropped. Numeric axes only (cast
    timestamps to epoch seconds first).
    """
    if bin_width <= 0:
        raise ValueError("bin_width must be positive")
    _check_no_column_clash(left, right, on)
    w = F.lit(bin_width)

    def binned(df: DataFrame, s: str, e: str) -> DataFrame:
        sc, ec = F.col(s), F.col(e)
        ok = df.where(ec >= sc if inclusive else ec > sc)
        return ok.withColumn(
            "__bin",
            F.explode(
                F.sequence(
                    F.floor(sc / w),
                    F.greatest(
                        _bounded_end_bin(sc, ec, w, bin_width, max_bins_per_row),
                        F.floor(sc / w),
                    ),
                )
            ),
        )
    l_b = binned(left, left_start, left_end)
    r_b = binned(right, right_start, right_end)
    ls, le = F.col(left_start), F.col(left_end)
    rs, re_ = F.col(right_start), F.col(right_end)
    overlap = (
        (ls <= re_) & (rs <= le) if inclusive else (ls < re_) & (rs < le)
    )
    claim = F.col("__bin") == F.floor(F.greatest(ls, rs) / w)
    return (
        l_b.join(r_b, on=[*on, "__bin"], how="inner")
        .where(overlap & claim)
        .drop("__bin")
    )


def _asof_union_window(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    direction: str,
    strict: bool,
    extra_partition: list[str],
) -> DataFrame:
    """The shared union-window core: right rows carry struct(value_cols),
    left rows carry null; one ``last(struct, ignorenulls)`` per window
    attaches the whole matched right row at once (no cross-row column
    mixing). ``extra_partition`` adds time-bucket columns for the hot-key
    path (both inputs must already carry them)."""
    from pyspark.sql import types as T

    val_struct = F.struct(*[F.col(c).alias(c) for c in value_cols])
    null_struct = F.lit(None).cast(
        T.StructType([T.StructField(c, right.schema[c].dataType) for c in value_cols])
    )
    l_marked = left.select(
        *[F.col(c) for c in left.columns if c not in extra_partition],
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        null_struct.alias("__vals"),
        *[F.col(c) for c in extra_partition],
    )
    r_marked = right.select(
        *[F.col(c) for c in on],
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
            if c not in on and c not in extra_partition
        ],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        val_struct.alias("__vals"),
        *[F.col(c) for c in extra_partition],
    ).select(*l_marked.columns)  # align column order for the union

    unioned = l_marked.unionByName(r_marked)

    # backward: ascending ts; at equal ts the right row sorts first
    # (side 0 < 1) so ≤ is inclusive — strict mode flips the side order.
    # forward: descending ts, same trick gives smallest right_ts ≥ left_ts.
    ts_order = F.col("__ts").asc() if direction == "backward" else F.col("__ts").desc()
    side_order = F.col("__side").desc() if strict else F.col("__side").asc()
    w = (
        Window.partitionBy(*on, *extra_partition)
        .orderBy(ts_order, side_order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.withColumn("__w", F.last(F.col("__vals"), ignorenulls=True).over(w))
    return filled.where(F.col("__side") == 1).select(
        *[c for c in left.columns if c not in extra_partition and c not in value_cols],
        *[F.col(f"__w.{c}").alias(c) for c in value_cols],
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
    time_bucket_width: float | None = None,
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_ts`` ≤ ``left_ts`` (direction='backward'; 'forward' mirrors:
    smallest right_ts ≥ left_ts) within the same ``on`` key group.

    ``strict=True`` excludes equal timestamps (< instead of ≤).
    Left rows with no match get nulls (left-outer semantics, like
    pandas.merge_asof / DuckDB ASOF JOIN). All attached columns come from
    the same matched right row — NULL columns in that row stay NULL.

    The right side must be unique per (on…, right_ts) — pre-aggregate
    otherwise (with ties the carried value would depend on sort order).

    ``time_bucket_width`` (numeric ts required — cast timestamps to epoch
    seconds first) activates hot-key handling: rows partition by
    (key, floor(ts / width)) instead of key alone, and each bucket is
    seeded with a carry-in row — the as-of right row at the bucket's
    start — computed by a tiny per-key as-of over bucket ids (≤ #buckets
    rows per key). Result is identical; the window sort is bounded by the
    densest time bucket, not the hottest key. Pick width so a hot key's
    densest bucket fits an executor's sort budget (e.g. hourly buckets
    for per-second events).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    value_cols = value_cols or [
        c for c in right.columns if c not in on and c != right_ts
    ]
    clash = [c for c in value_cols if c in left.columns]
    if clash:
        raise ValueError(f"value columns collide with left columns: {clash}")

    if time_bucket_width is None:
        return _asof_union_window(
            left, right, on, left_ts, right_ts, value_cols, direction, strict, []
        )
    if time_bucket_width <= 0:
        raise ValueError("time_bucket_width must be positive")

    # Hot-key path. Work on a signed axis so 'forward' is 'backward' on
    # the negated axis (same carry-in machinery).
    sign = 1 if direction == "backward" else -1
    l_ax = left.withColumn("__axis", F.col(left_ts) * F.lit(sign))
    r_ax = right.withColumn("__axis", F.col(right_ts) * F.lit(sign))
    w_lit = F.lit(float(time_bucket_width))
    l_b = l_ax.withColumn("__tb", F.floor(F.col("__axis") / w_lit))
    r_b = r_ax.withColumn("__tb", F.floor(F.col("__axis") / w_lit))

    # Per-(key, bucket) right winner: the last right row in that bucket
    # (map-side combinable aggregate, no window over the hot key).
    winner = F.max_by(
        F.struct(F.col(right_ts).alias("__rts"), *[F.col(c) for c in value_cols]),
        F.col("__axis"),
    )
    r_winners = r_b.groupBy(*on, "__tb").agg(winner.alias("__w"))

    # Buckets that actually contain left rows (distinct is tiny: one row
    # per (key, bucket)); each needs the latest winner from any STRICTLY
    # earlier bucket as carry-in. That is itself an as-of over bucket ids
    # — run the plain union-window path over the per-bucket aggregates,
    # whose per-key row count is #buckets per key, not #rows per key.
    l_buckets = l_b.select(*on, "__tb").distinct()
    carry = _asof_union_window(
        l_buckets,
        r_winners.select(*on, (F.col("__tb") + 1).alias("__tb"), "__w"),
        on,
        "__tb",
        "__tb",
        ["__w"],
        "backward",
        False,
        [],
    ).where(F.col("__w").isNotNull())

    # Carry-in rows keep their ORIGINAL axis, which is strictly below the
    # bucket's open edge (a right row AT the boundary lands in the bucket
    # itself) — so within the (key, bucket) partition a carry row sorts
    # strictly before every real row, tie-free, and strict semantics are
    # unaffected (carry ts < every left ts in the bucket).
    carry_rows = carry.select(
        *on,
        F.col("__tb"),
        (F.col("__w.__rts") * F.lit(sign)).alias("__axis"),
        F.col("__w.__rts").alias(right_ts),
        *[F.col(f"__w.{c}").alias(c) for c in value_cols],
    )
    r_all = r_b.select(
        *on, "__tb", "__axis", F.col(right_ts), *[F.col(c) for c in value_cols]
    ).unionByName(carry_rows)

    out = _asof_union_window(
        l_b,
        r_all,
        on,
        "__axis",
        "__axis",
        value_cols,
        "backward",
        strict,
        ["__tb"],
    )
    return out.drop("__axis", "__tb")
