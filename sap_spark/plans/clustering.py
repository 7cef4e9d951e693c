"""Multi-dimensional write clustering (z-order) for LakeTable rewrites.

``sort_columns`` (plans/lake.py) clusters files linearly: great when
queries filter on ONE column, useless for the others — a file sorted by
``x`` carries the full ``y`` range, so the manifest bounds
(plans/stats.py) can never skip it on a ``y`` predicate. Z-ordering is
the standard fix (Delta ``OPTIMIZE ZORDER BY``, Iceberg
``rewrite_data_files(strategy => 'sort', sort_order => 'zorder(...)')``)
: interleave the bits of each dimension's QUANTILE RANK so
lexicographically-near z-values are near in every dimension at once,
then sort the rewrite by that value. Every file then carries a bounded
range of EACH clustered column and the existing min/max skipping works
for predicates on any of them.

Mechanics (all JVM-side, no Python in the row path):

1. Each column is mapped to a numeric proxy (numerics cast; timestamps
   via epoch; strings via their first-8-byte big-endian prefix, which
   preserves lexicographic order).
2. Per-dimension boundaries are the proxy's approximate quantiles
   (one extra pass over the rewrite set — the same cost class Delta's
   OPTIMIZE pays; the rewrite itself is O(data) anyway). Quantile
   ranks, unlike min/max scaling, keep the interleave balanced under
   skew — with uniform bucketing one hot value would collapse every
   row onto a handful of z-values.
3. The rank is "how many boundaries ≤ value" — computed with
   ``F.aggregate`` over a literal boundary array, carrying the proxy
   VALUE through the accumulator struct (the zero slot is evaluated
   once per row) so the proxy expression never lands inside the
   per-element lambda. A single-reference proxy column WOULD be
   inlined there by ColumnPruning+CollapseProject and re-evaluated
   once per boundary — 255x per row on a full-table rewrite (the
   lambda-inlining trap; pinned by a plan test).
4. Bits interleave little-endian across dimensions into one long.

Z-ordering is a MAINTENANCE-REWRITE concern, not a per-epoch one: CDC
epochs are small and their files short-lived, so the engine wires this
into ``compact(zorder=[...])`` / ``rebucket`` — the rewrites that
produce the long-lived base files — not into the per-epoch merge path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def _proxy(field: T.StructField) -> Column:
    """Order-preserving numeric proxy for one column (null-safe: nulls
    surface as null and rank to 0, clustering together at the low end)."""
    col = F.col(field.name)
    dt = field.dataType
    if isinstance(dt, _NUMERIC):
        return col.cast("double")
    if isinstance(dt, T.TimestampType):
        return F.unix_micros(col).cast("double")
    if isinstance(dt, T.TimestampNTZType):
        # ntz→timestamp is order-preserving under any fixed session TZ
        # (the direct ntz→long cast is illegal in this Spark version)
        return F.unix_micros(col.cast("timestamp")).cast("double")
    if isinstance(dt, T.DateType):
        return F.unix_date(col).cast("double")
    if isinstance(dt, T.StringType):
        # big-endian first-8-byte prefix: rpad the hex with '0' so a
        # short string sorts exactly like itself followed by 0x00 bytes
        # — the lexicographic order of the prefix is preserved
        return F.conv(
            F.rpad(F.hex(F.substring(col, 1, 8)), 16, "0"), 16, 10
        ).cast("double")
    if isinstance(dt, T.BooleanType):
        return col.cast("int").cast("double")
    raise ValueError(
        f"zorder column {field.name!r} has unsupported type {dt.simpleString()}"
    )


def with_zorder(
    df: DataFrame,
    columns: list[str],
    bits: int = 8,
    out_col: str = "__zval",
    relative_error: float = 0.01,
) -> DataFrame:
    """Return ``df`` with an interleaved-rank z-value column appended.

    ``bits`` ranks each dimension into ``2**bits`` quantile buckets;
    the z-value is ``bits * len(columns)`` bits wide. 8 bits/dim (256
    buckets) resolves far below any realistic files-per-bucket count.
    Runs one ``approxQuantile`` action over ``df`` to learn the
    per-dimension boundaries.
    """
    if not columns:
        raise ValueError("zorder needs at least one column")
    if not 1 <= bits * len(columns) <= 63:
        raise ValueError(
            f"bits * len(columns) must fit a long, got {bits}*{len(columns)}"
        )
    by_name = {f.name: f for f in df.schema.fields}
    missing = [c for c in columns if c not in by_name]
    if missing:
        raise ValueError(f"zorder columns not in dataframe: {missing}")

    proxies = [_proxy(by_name[c]) for c in columns]
    proxy_names = [f"__zp{i}" for i in range(len(columns))]
    proxied = df.select(
        "*", *[p.alias(n) for p, n in zip(proxies, proxy_names)]
    )
    probs = [i / (1 << bits) for i in range(1, 1 << bits)]
    all_bounds = proxied.stat.approxQuantile(proxy_names, probs, relative_error)

    rank_names = [f"__zr{i}" for i in range(len(columns))]
    rank_exprs = []
    for proxy, bounds in zip(proxies, all_bounds):
        uniq = sorted({b for b in bounds if b is not None})
        if not uniq:  # all-null / empty input: every row ranks 0
            rank_exprs.append(F.lit(0))
            continue
        # rank = #boundaries <= value. The proxy rides the ACCUMULATOR
        # (zero slot, evaluated once per row): referencing the proxy
        # column inside the lambda instead would let CollapseProject
        # inline its expression there and re-run it per boundary. A
        # null proxy contributes nothing per element (when ->
        # otherwise 0), so nulls rank 0.
        rank_exprs.append(
            F.aggregate(
                F.array(*[F.lit(float(b)) for b in uniq]),
                F.struct(proxy.alias("v"), F.lit(0).alias("c")),
                lambda acc, b: F.struct(
                    acc["v"].alias("v"),
                    (acc["c"] + F.when(acc["v"] >= b, 1).otherwise(0)).alias("c"),
                ),
                lambda acc: acc["c"],
            )
        )
    # materialize ranks in their own projection: each rank is referenced
    # `bits` times by the interleave and must not re-run its aggregate
    ranked = df.select(
        "*", *[e.alias(r) for e, r in zip(rank_exprs, rank_names)]
    )

    d = len(columns)
    terms = []
    for i in range(bits):
        for j, r in enumerate(rank_names):
            bit = F.shiftright(F.col(r), i).bitwiseAND(F.lit(1)).cast("long")
            terms.append(F.shiftleft(bit, i * d + j))
        # little-endian interleave: dimension j owns bit positions
        # j, j+d, j+2d, ... — equal resolution per dimension
    zval = terms[0]
    for t in terms[1:]:
        zval = zval.bitwiseOR(t)
    return ranked.select(
        *[c for c in df.columns], zval.alias(out_col)
    )
