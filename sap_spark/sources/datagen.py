"""Deterministic, distributed synthetic data generators (seed=42, no I/O).

Generates the engine-specific fixtures from FIXTURES.md:

- ``gen_repos``          — base target table (repo, path, commit, lang, content)
- ``gen_change_events``  — ordered CDC change-event log with I/U/D ops,
                           ROCANCEL cancellations, delta tokens, Zipf-ish
                           hot-repo skew, and ~1% duplicate deliveries.

Everything is a pure function of the row index via ``spark.range`` +
``xxhash64`` — no driver-side loops, no RNG state — so the same code
generates 10^4 events for pytest or 10^10 events on a cluster, with
identical values for any given (seed, index).

The change-event *semantics* these fixtures exercise (op codes with
ROCANCEL-style cancellation, delta tokens as resumable checkpoints) follow
public SAP ODP/SLT delta-queue behavior as specified in BASELINE.json;
the reference repo itself is batch-only (SURVEY.md §2.5).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

SEED = 42

LANGS = ["py", "java", "ts", "go", "rs", "md"]
PATHS_PER_REPO = 200
ORGS = 50


def _u01(*cols: Column | str) -> Column:
    """Deterministic uniform(0,1) from arbitrary columns (xxhash64-based)."""
    h = F.xxhash64(*cols, F.lit(SEED))
    return F.pmod(h, F.lit(1_000_000_007)).cast("double") / 1_000_000_007.0


def _key_columns(idx_repo: Column, idx_path: Column) -> tuple[Column, Column, Column]:
    """(repo, path, lang) from integer repo-rank and path-rank."""
    repo = F.concat(
        F.lit("org"), (idx_repo % ORGS).cast("string"), F.lit("/repo"), idx_repo.cast("string")
    )
    lang_idx = F.pmod(F.xxhash64(idx_repo, idx_path, F.lit("lang"), F.lit(SEED)), F.lit(len(LANGS)))
    lang = F.element_at(F.array(*[F.lit(s) for s in LANGS]), lang_idx.cast("int") + 1)
    path = F.concat(
        F.lit("src/m"),
        (idx_path % 20).cast("string"),
        F.lit("/f"),
        idx_path.cast("string"),
        F.lit("."),
        lang,
    )
    return repo, path, lang


def _content(repo: Column, path: Column, version: Column) -> Column:
    """Deterministic pseudo-code text, ~100-4000 chars, f(repo, path, version).

    Built from md5 hex so the pytest oracle can recompute it independently
    (see tests) and the sha256(content) invariant is checkable end-to-end.
    """
    h = F.md5(F.concat_ws("|", repo, path, version.cast("string")))
    reps = (F.pmod(F.xxhash64(h, F.lit("len")), F.lit(60)) + 3).cast("int")
    body = F.repeat(F.concat(h, F.lit("\n")), reps)
    return F.concat(
        F.lit("// "), repo, F.lit("/"), path, F.lit(" v"), version.cast("string"),
        F.lit("\ndef gen_"), F.substring(h, 1, 8), F.lit("():\n"), body,
    )


def _commit(repo: Column, path: Column, version: Column) -> Column:
    """hex sha1-style commit id, deterministic from (repo, path, version)."""
    return F.sha1(F.concat_ws("@", repo, path, version.cast("string")))


def gen_repos(spark: SparkSession, n_keys: int = 1000) -> DataFrame:
    """Base target table: one row per (repo, path) key, version 0 content.

    Key space: key k → repo rank k // PATHS_PER_REPO, path rank k %
    PATHS_PER_REPO (~200 paths per repo, repos spread over 50 orgs).
    """
    df = spark.range(n_keys)
    idx_repo = (F.col("id") / PATHS_PER_REPO).cast("long")
    idx_path = F.col("id") % PATHS_PER_REPO
    repo, path, lang = _key_columns(idx_repo, idx_path)
    v0 = F.lit(0).cast("long")
    return df.select(
        repo.alias("repo"),
        path.alias("path"),
        _commit(repo, path, v0).alias("commit"),
        lang.alias("lang"),
        _content(repo, path, v0).alias("content"),
    )


def gen_change_events(
    spark: SparkSession,
    n_events: int = 10_000,
    n_keys: int = 1_000,
    events_per_token: int = 1_000,
    skew: float = 3.0,
    rocancel_rate: float = 0.02,
    dup_rate: float = 0.01,
    num_partitions: int | None = None,
) -> DataFrame:
    """Ordered change-event log (FIXTURES.md §2).

    Columns: delta_token (sortable string, checkpoint unit), event_seq
    (globally unique & monotone), op (I/U/D 60/30/10), rocancel, cancel_seq,
    repo, path, commit, lang, content (null for D).

    Skew: repo rank = floor(R * u^skew) — a few repos take most events
    (u^3 puts ~21% of events on the first 1% of repos), modeling hot-repo
    skew per BASELINE.json north_star.

    ROCANCEL: ~rocancel_rate of events carry rocancel=true + cancel_seq of
    an earlier event *within the same delta token* (SLT cancellations occur
    inside one delta unit / transaction). A rocancel event's own op/payload
    is NOT applied; its only effect is erasing the target event's effect.

    Duplicate deliveries: ~dup_rate of events are re-emitted verbatim (same
    event_seq/op/payload) in a later delta token, exercising idempotent
    apply. Output rows ≈ n_events * (1 + dup_rate).
    """
    n_repos = max(1, n_keys // PATHS_PER_REPO)
    rng = spark.range(n_events, numPartitions=num_partitions)

    i = F.col("id")
    token_num = (i / events_per_token).cast("long")

    # Zipf-ish hot-repo skew: small u^skew concentrates mass at low ranks.
    u_repo = _u01(i, F.lit("repo"))
    idx_repo = F.least(
        F.floor(F.pow(u_repo, F.lit(skew)) * n_repos).cast("long"), F.lit(n_repos - 1)
    )
    idx_path = F.pmod(F.xxhash64(i, F.lit("path"), F.lit(SEED)), F.lit(PATHS_PER_REPO))
    repo, path, lang = _key_columns(idx_repo, idx_path)

    u_op = _u01(i, F.lit("op"))
    op = F.when(u_op < 0.6, "I").when(u_op < 0.9, "U").otherwise("D")

    # version = event_seq: each I/U carries fresh content.
    version = i
    content = F.when(op == "D", F.lit(None).cast("string")).otherwise(
        _content(repo, path, version)
    )

    # ROCANCEL: only for events that are not the first in their token
    # (need an earlier same-token target).
    token_start = token_num * events_per_token
    offset_in_token = i - token_start
    u_rc = _u01(i, F.lit("rc"))
    rocancel = (u_rc < rocancel_rate) & (offset_in_token > 0)
    cancel_seq = F.when(
        rocancel,
        token_start + F.pmod(F.xxhash64(i, F.lit("ct"), F.lit(SEED)), offset_in_token),
    ).otherwise(F.lit(None).cast("long"))

    base = rng.select(
        F.concat(F.lit("D"), F.lpad(token_num.cast("string"), 7, "0")).alias("delta_token"),
        i.alias("event_seq"),
        op.alias("op"),
        rocancel.alias("rocancel"),
        cancel_seq.alias("cancel_seq"),
        repo.alias("repo"),
        path.alias("path"),
        _commit(repo, path, version).alias("commit"),
        lang.alias("lang"),
        content.alias("content"),
        token_num.alias("_tok"),
    )

    # Duplicate deliveries: re-emit ~dup_rate of rows in a later token.
    # Cancelled events are excluded: SLT redelivery granularity is the whole
    # delta unit, so a ROCANCEL'd event is only ever re-delivered together
    # with its canceller — an individually re-delivered net-cancelled event
    # cannot occur (and would be unresolvable once the cancel's delta unit
    # was already applied).
    max_token = (n_events - 1) // events_per_token
    u_dup = _u01(F.col("event_seq"), F.lit("dup"))
    bump = F.pmod(F.xxhash64(F.col("event_seq"), F.lit("db"), F.lit(SEED)), F.lit(3)) + 1
    dup_tok = F.least(F.col("_tok") + bump, F.lit(max_token))
    cancelled = (
        base.where(F.col("rocancel") & F.col("cancel_seq").isNotNull())
        .select(F.col("cancel_seq").alias("event_seq"))
        .distinct()
    )
    dups = (
        base.where((u_dup < dup_rate) & (~F.col("rocancel")) & (F.col("_tok") < max_token))
        .join(F.broadcast(cancelled), on="event_seq", how="left_anti")
        .withColumn("_tok", dup_tok)
        .withColumn(
            "delta_token", F.concat(F.lit("D"), F.lpad(F.col("_tok").cast("string"), 7, "0"))
        )
    )

    return base.unionByName(dups).drop("_tok")


def write_change_log(
    df: DataFrame,
    path: str,
    token_aligned: bool = True,
    files_per_token: int = 1,
    mode: str = "overwrite",
) -> None:
    """Materialize a change log as parquet, partitioned by delta_token so a
    file/streaming source consumes tokens as resumable micro-batch units.

    token_aligned=True hash-repartitions by delta_token first so each token
    lands in exactly one task → one data file per token directory. Streaming
    with maxFilesPerTrigger=k then consumes k *whole* delta tokens per
    micro-batch, which keeps ROCANCEL cancellation scope (one delta unit)
    inside one batch.

    files_per_token>1 splits each token directory into that many data files
    (salted on event_seq). CAUTION: maxFilesPerTrigger slices the stream by
    *files*, so multi-file tokens let a micro-batch split a delta unit,
    breaking ROCANCEL cancellation scope (the cancel and its target can land
    in different epochs). Keep the default unless the consumer ingests whole
    directories.

    Scan parallelism does NOT require many files: the log is written with
    small parquet row groups (block.size=8m), so one token file splits into
    many input tasks under spark.sql.files.maxPartitionBytes — one file per
    delta unit stays the layout AND the replay scan parallelizes to any
    core count.
    """
    if token_aligned and files_per_token <= 1:
        df = df.repartition("delta_token")
    elif files_per_token > 1:
        # Partition on the salt alone: the layout is a pure function of
        # (data, files_per_token), never of cores.
        df = df.repartition(files_per_token, F.xxhash64("event_seq"))
    (
        df.write.mode(mode)
        .option("parquet.block.size", str(8 * 1024 * 1024))
        .partitionBy("delta_token")
        .parquet(path)
    )
