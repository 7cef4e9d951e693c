"""Deterministic sampling for training-data pipelines.

``df.sample()`` / ``sampleBy()`` draw per-partition pseudo-random rows:
membership changes with partitioning, retries, and cluster size — poison
for an exactly-once pipeline (a replayed epoch would sample different
rows) and for reproducible corpus builds. The operators here make
membership a **pure function of row identity**: a row is kept iff
``pmod(xxhash64(id_cols…, seed), SCALE) < rate * SCALE``. Consequences:

- stable across runs, retries, partitionings, and engines;
- nested: the 20% sample is a strict subset of the 50% sample (threshold
  sampling), so growing a corpus never discards previously kept rows;
- strata are independent: each group's rate applies to its own hash
  range, no shuffle — the filter is map-side and pushes past scans of
  the id/strata columns only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SCALE = 1_000_000


def _bucket(
    id_cols: list[str], seed: int, domain: str, hash_fn: str = "xxhash64"
) -> Column:
    """Identity hash bucket, domain-separated per operator: without the
    domain tag, stratified_sample and split_train_eval at the same seed
    would share hash ranges — composing them would make the eval split a
    fixed prefix of the sample (e.g. a 0.1 split of a 0.2 sample tags
    50% of rows eval, not 10%).

    ``hash_fn``: ``xxhash64`` (default — cheapest JVM identity hash, the
    production choice) or ``md5`` (first 15 hex digits → bigint; ~same
    uniformity, portable: any engine with md5 computes identical
    membership for integer/string id columns — cast-to-string of
    floats/timestamps is engine-specific, so hash those via an explicit
    string column if cross-engine parity matters). The md5 key encodes
    each part prefix-free ('N;' for NULL, 'V<len>:<value>' otherwise),
    so NULL-vs-value layouts and separator-looking characters inside a
    value cannot collide. The xxhash64 path hashes columns natively;
    note Spark hash functions skip NULL inputs, so id_cols should be
    non-null identity columns there. Both are pure functions of row
    identity; the two produce different (equally valid) samples."""
    if hash_fn == "xxhash64":
        return F.pmod(
            F.xxhash64(*[F.col(c) for c in id_cols], F.lit(domain), F.lit(seed)),
            F.lit(_SCALE),
        )
    if hash_fn == "md5":
        def enc(c: Column) -> Column:
            # prefix-free: 'N;' | 'V' + char-length + ':' + value — a value
            # containing 'N;' or 'V…:' can't forge a boundary because the
            # declared length fixes the value's extent.
            return F.when(c.isNull(), F.lit("N;")).otherwise(
                F.concat(F.lit("V"), F.length(c).cast("string"), F.lit(":"), c)
            )

        key = F.concat(
            *[enc(F.col(c).cast("string")) for c in id_cols],
            enc(F.lit(domain)),
            enc(F.lit(str(seed))),
        )
        return F.pmod(
            F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("bigint"),
            F.lit(_SCALE),
        )
    raise ValueError(f"unknown hash_fn {hash_fn!r} (xxhash64 | md5)")


def stratified_sample(
    df: DataFrame,
    id_cols: list[str],
    rates: "dict[object, float] | float",
    strata_col: str | None = None,
    seed: int = 0,
    default_rate: float = 0.0,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Keep each row with its stratum's rate, deterministically.

    ``rates`` is either one float (uniform) or a {stratum value → rate}
    map over ``strata_col`` (strata absent from the map get
    ``default_rate``). Rates are clamped to [0, 1].
    """
    if isinstance(rates, dict) and strata_col is None:
        raise ValueError("strata_col is required when rates is a map")
    b = _bucket(id_cols, seed, "sample", hash_fn)
    if isinstance(rates, dict):
        rate_map = F.create_map(
            *[
                F.lit(x)
                for kv in rates.items()
                for x in (kv[0], float(min(max(kv[1], 0.0), 1.0)))
            ]
        )
        rate = F.coalesce(rate_map[F.col(strata_col)], F.lit(float(default_rate)))
    else:
        rate = F.lit(float(min(max(rates, 0.0), 1.0)))
    return df.where(b < rate * _SCALE)


def split_train_eval(
    df: DataFrame,
    id_cols: list[str],
    eval_fraction: float,
    seed: int = 0,
    split_col: str = "split",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Tag rows 'eval' / 'train' by identity hash — the split survives
    reshuffles and incremental corpus growth (a row never migrates
    between splits as data is added)."""
    if not (0.0 <= eval_fraction <= 1.0):
        raise ValueError("eval_fraction must be in [0, 1]")
    b = _bucket(id_cols, seed, "split", hash_fn)
    return df.withColumn(
        split_col,
        F.when(b < F.lit(eval_fraction * _SCALE), F.lit("eval")).otherwise(
            F.lit("train")
        ),
    )
