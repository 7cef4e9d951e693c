"""CDC fold operators: ROCANCEL cancellation + last-writer-wins dedup.

Semantics (the sequential-fold contract, FIXTURES.md §2)
--------------------------------------------------------
A change-event batch is totally ordered by ``event_seq`` (globally unique
and monotone; ``delta_token`` only groups events into checkpoint units).
The final state of a key is the state after applying its events in order:

1. **ROCANCEL**: an event with ``rocancel=true`` is never applied itself;
   its only effect is to erase the effect of the event whose ``event_seq``
   equals its ``cancel_seq``. Cancelling a rocancel event is a no-op
   (nested cancellation is undefined in SLT and rejected here).
   Cancellation scope is the batch being folded — in the pipeline, one or
   more whole delta tokens, matching SLT where ROCANCEL records appear
   within the same delta unit / transaction as their target.
2. **Duplicate deliveries**: the same ``event_seq`` may be re-delivered in
   a later delta token with an identical payload; it must apply at most
   once (idempotence).
3. **Last-writer-wins**: because ops are upserts (I/U set the row, D
   deletes it), the folded state of a key depends only on its surviving
   event with the largest ``event_seq`` — so the sequential fold reduces
   to a per-key argmax, which distributes.

Three equivalent implementations are provided:

- ``lww_fetch`` (default) — winner-selection over (key, seq, token) only,
  then a broadcast join fetches the winning payloads. Payload bytes are
  never aggregated or shuffled; measured ~3x faster than the single-pass
  agg on content-heavy rows and the only variant whose memory traffic is
  O(keys), not O(events·payload).
- ``lww_window`` — the row_number() window over (key, order desc) with
  optional **two-level salting** for hot-key skew (a single hot (repo,path)
  cannot be split by AQE inside Window.partitionBy; salting must be
  explicit). This is the canonical CDC-dedup shape. Both window levels run
  over a payload-pruned (key…, event_seq, delta_token) projection — payload
  bytes never enter the window sorts — and winners fetch their payloads via
  the same broadcast probe the fetch fold uses.
- ``lww_agg`` — groupBy(key).agg(max_by(payload, event_seq)): hash
  aggregation with **map-side partial aggregation**, so a hot key is
  pre-combined per map partition before the shuffle — skew-resistant by
  construction; but every payload rides through the agg buffers and the
  shuffle, which is memory-bandwidth-bound on content-sized rows.
  Duplicate deliveries tie on event_seq with identical payloads, so
  max_by remains deterministic.

All strategies pin the same tie-break: equal ``event_seq`` (a duplicate
delivery) resolves to the **largest** ``delta_token`` — the latest
delivery wins, deterministically and identically across strategies.

The reference implements none of this (it is a pass-through batch source,
SURVEY.md §2.5); these operators are the engine's extension required by
BASELINE.json north_star.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sap_spark.config import EngineConfig


def _payload_cols(df: DataFrame, cfg: EngineConfig) -> list[str]:
    reserved = {
        *cfg.key_columns,
        cfg.order_column,
        cfg.token_column,
        cfg.op_column,
        cfg.rocancel_column,
        cfg.cancel_seq_column,
    }
    return [c for c in df.columns if c not in reserved]


def fold_output_columns(events: DataFrame, cfg: EngineConfig) -> list[str]:
    """The fold's output projection: keys + order + op + payload — the
    token/rocancel/cancel-seq envelope columns are checkpoint labels,
    not state, and must be stripped BEFORE the merge's schema-evolution
    gate sees the frame. One definition shared by :func:`fold_changes`
    and the pipeline's fetch/auto path (streaming/pipeline.ingest_batch)
    so the kept-column set cannot drift between them."""
    return [
        *cfg.key_columns,
        cfg.order_column,
        cfg.op_column,
        *_payload_cols(events, cfg),
    ]


def salted_repartition(
    events: DataFrame, cfg: EngineConfig, num_partitions: int | None = None
) -> DataFrame:
    """Salted repartition-by-primary-key (north_star machinery).

    Plain `repartition(keys)` sends every event of a hot (repo, path) to
    ONE partition — a straggler at Zipf skew. Salting by
    pmod(xxhash64(order_column), salt_partitions) spreads each key over
    salt_partitions partitions while keeping co-location windows small.
    Downstream two-level LWW (lww_window salted=True) or hash aggregation
    remains correct because neither requires all rows of a key in one
    partition. Use before window-shaped pipelines; the default agg path
    doesn't need it (map-side combine already defuses skew).
    """
    n = num_partitions or events.sparkSession.conf.get("spark.sql.shuffle.partitions")
    salt = F.pmod(F.xxhash64(F.col(cfg.order_column)), F.lit(cfg.salt_partitions))
    return events.repartition(int(n), *[F.col(k) for k in cfg.key_columns], salt)


def cancelled_seqs(events: DataFrame, cfg: EngineConfig) -> DataFrame | None:
    """The distinct event_seq set cancelled in this batch (None when the
    batch carries no rocancel column). Column-pruned scan; callers running
    several passes over the same batch should persist it so the scan runs
    once (see streaming/pipeline.ingest_batch)."""
    rc, cs, seq = cfg.rocancel_column, cfg.cancel_seq_column, cfg.order_column
    if rc not in events.columns:
        return None
    return (
        events.where(F.col(rc) & F.col(cs).isNotNull())
        .select(F.col(cs).alias(seq))
        .distinct()
    )


def drop_cancelled(
    events: DataFrame, cfg: EngineConfig, cancelled: DataFrame | None = None
) -> DataFrame:
    """Remove rocancel events and the events they cancel.

    The cancelled-seq set is a few % of the batch and contains only longs,
    so it is explicitly broadcast: the anti-join becomes a map-side filter
    and the (payload-heavy) event stream is never shuffled here. A shuffled
    anti-join would move every content blob across the wire twice (once for
    the anti-join, once for the LWW shuffle). At 10^10-event scale the
    per-batch cancel set stays bounded by the delta-unit size; if a source
    ever produced oversized cancel sets, drop the hint and AQE falls back.
    """
    rc, seq = cfg.rocancel_column, cfg.order_column
    # op=NULL expresses no change (merge_cdc drops such rows before the
    # MERGE). It must be inert at the FOLD too: a null-op event that wins
    # LWW would otherwise erase the key's earlier valid state in a batch
    # replay, while the incremental path — the same events split across
    # epochs — would keep it, and the two north-star paths would diverge
    # on lax foreign logs. Filtering SURVIVORS here lets the latest
    # *valid* event win in every strategy. The filter deliberately sits
    # AFTER the cancelled-seq derivation: a rocancel row is never applied
    # regardless of its own op, but its cancel_seq must still erase its
    # target even if a lax log left the rocancel row's op null. With a
    # DLQ configured the quarantine removes all of these pre-fold.
    def _live_ops(df: DataFrame) -> DataFrame:
        if cfg.op_column in df.columns:
            return df.where(F.col(cfg.op_column).isNotNull())
        return df

    if rc not in events.columns:
        return _live_ops(events)
    if cancelled is None:
        cancelled = cancelled_seqs(events, cfg)
    # coalesce: a NULL rocancel flag means NOT-a-cancel here, instead of
    # the row silently vanishing under 3VL (~NULL is NULL). The envelope
    # schema declares the column non-null and the streaming path
    # quarantines NULL flags before the fold when a DLQ is configured
    # (streaming/quality.violation_rules); this keeps the batch entry
    # points (fold_changes/replay) loss-free on lax foreign logs too.
    return _live_ops(events.where(~F.coalesce(F.col(rc), F.lit(False)))).join(
        F.broadcast(cancelled), on=seq, how="left_anti"
    )


def lww_window(
    events: DataFrame,
    cfg: EngineConfig,
    salted: bool = False,
) -> DataFrame:
    """Last-writer-wins via row_number window; optional two-level salting.

    Salted form (north_star machinery): level 1 partitions by
    (key..., salt) where salt = pmod(xxhash64(event_seq), salt_partitions),
    producing ≤1 winner per (key, salt); level 2 re-deduplicates the ≤
    salt_partitions winners per key exactly. Salting derives from the
    *order column*, never the key, so it cannot break LWW ordering: every
    salt bucket's winner is a true candidate and level 2 picks the global
    max. Duplicate deliveries (equal event_seq) tie-break on the **largest**
    delta_token — the same order lww_fetch/lww_agg pin.

    Payload pruning: both window levels run over a slim
    (key…, event_seq, delta_token) projection only — in the salted form a
    content blob would otherwise cross TWO shuffle+sorts before losers are
    discarded, which made this the memory-bandwidth-bound worst of the four
    strategies. Winners (O(distinct keys) slim rows) then fetch their
    payloads through the same broadcast hash probe as the fetch fold, so
    the payload bytes move exactly once, map-side.
    """
    keys = list(cfg.key_columns)
    seq, tok = cfg.order_column, cfg.token_column
    has_tok = tok in events.columns
    order = [F.col(seq).desc()] + ([F.col(tok).desc()] if has_tok else [])

    def pick_one(df: DataFrame, partition_cols: list[str]) -> DataFrame:
        w = Window.partitionBy(*partition_cols).orderBy(*order)
        return df.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") == 1).drop(
            "__rn"
        )

    slim_cols = [*keys, seq] + ([tok] if has_tok else [])
    slim = events.select(*slim_cols)
    if salted:
        salt = F.pmod(F.xxhash64(F.col(seq)), F.lit(cfg.salt_partitions)).cast("int")
        slim = pick_one(slim.withColumn("__salt", salt), keys + ["__salt"]).drop(
            "__salt"
        )
    winners = pick_one(slim, keys)

    if set(events.columns) <= set(slim_cols):
        return winners  # no payload columns to fetch
    return _fetch_payloads(events, winners.select(*keys, seq), cfg)


def lww_agg(events: DataFrame, cfg: EngineConfig) -> DataFrame:
    """Last-writer-wins via hash aggregation (the scale-preferred path).

    max_by(struct(op, payload...), event_seq) with map-side partial
    aggregation: shuffles one candidate per key per map partition. Output
    columns: key..., event_seq, op, payload... (delta_token is a checkpoint
    label, not state, and is dropped).
    """
    keys = list(cfg.key_columns)
    seq, op = cfg.order_column, cfg.op_column
    payload = [c for c in _payload_cols(events, cfg)]
    carried = F.struct(F.col(op).alias(op), *[F.col(c).alias(c) for c in payload])
    agg = events.groupBy(*keys).agg(
        F.max(F.col(seq)).alias(seq),
        F.max_by(carried, F.col(seq)).alias("__w"),
    )
    return agg.select(*keys, seq, F.col(f"__w.{op}").alias(op), *[
        F.col(f"__w.{c}").alias(c) for c in payload
    ])


def lww_fetch(events: DataFrame, cfg: EngineConfig) -> DataFrame:
    """Last-writer-wins as winner-selection + payload fetch (two-phase).

    The single-pass ``lww_agg`` drags every payload blob through the
    aggregation buffers and the shuffle: with content-sized rows the map
    side builds multi-hundred-MB hash maps that barely reduce (most keys
    are unique within a batch) and then ships O(events) payload bytes —
    measured memory-bandwidth-bound, not CPU-bound. This variant never
    aggregates or shuffles payloads:

    phase A  winners = groupBy(key).agg(max(event_seq)) — a long-only
             buffer that stays in whole-stage-codegen HashAggregate (see
             lww_winners for why NOT max(struct(seq, token))); the payload
             columns are never referenced, so the parquet scan prunes them
             and the content pages are not even decompressed;
    phase B  inner join events ⋈ broadcast(winners) on (key…, event_seq)
             — a map-side hash probe that materializes the winning
             deliveries, payload included — followed by a per-key max_by
             guard that collapses multi-token redeliveries of the winning
             event to the max-token delivery (fetch_winner_payloads; the
             guard is load-bearing, not dead code).

    Correctness: event_seq identifies the winning *event*; SLT may
    redeliver it under several delta tokens with identical payloads, and
    the phase-B guard picks the largest token deterministically — the
    same delivery the old max(struct(seq, token)) phase A encoded.

    Scale: the winner set is O(distinct keys per batch) of ~100 B rows. A
    micro-batch in steady state touches a bounded key set, so the explicit
    broadcast is the right default; for giant backfill batches flip
    ``cfg.broadcast_winners`` off and AQE plans a shuffled join of the
    slim winner relation instead.
    """
    if cfg.token_column not in events.columns:
        # no delivery id available → single-pass agg stays exact
        return lww_agg(drop_cancelled(events, cfg), cfg)
    # build the cancelled-seq set ONCE and share it across both phases —
    # each would otherwise run its own broadcast-build scan of the batch
    # (the sharing contract cancelled_seqs' docstring states; the
    # streaming path additionally persists the batch first)
    cancelled = cancelled_seqs(events, cfg)
    return fetch_winner_payloads(
        events,
        lww_winners(events, cfg, cancelled=cancelled),
        cfg,
        cancelled=cancelled,
    )


def lww_winners(
    events: DataFrame,
    cfg: EngineConfig,
    cancelled: DataFrame | None = None,
    with_counts: bool = False,
) -> DataFrame:
    """Phase A of the fetch fold: (key…, event_seq) of each key's winning
    event. Payload columns are never referenced, so the scan prunes them.
    The result is O(distinct keys) of ~100 B rows — callers may persist it
    to reuse for bucket discovery + the fetch join.

    Deliberately ``max(event_seq)`` alone, NOT ``max(struct(seq, token))``:
    a long agg buffer compiles to whole-stage-codegen HashAggregate, while
    a struct-with-string buffer falls back to SortAggregate — measured as
    the dominant cost of the winner-selection scan. event_seq uniquely
    identifies the winning *event*; when SLT redelivers it under several
    tokens the payloads are identical and phase B's per-key guard picks
    the max-token delivery deterministically (the exact ordering the old
    struct-max encoded).

    ``with_counts`` adds a ``__n_events`` surviving-event count per key —
    one extra long in the same HashAggregate buffer, effectively free.
    This feeds the auto-skew probe (streaming/pipeline.ingest_batch):
    max(__n_events) over the persisted winner set is the batch's hottest
    key, with no extra pass over the (payload-heavy) events."""
    keys = list(cfg.key_columns)
    seq = cfg.order_column
    survivors = drop_cancelled(events, cfg, cancelled=cancelled)
    aggs = [F.max(F.col(seq)).alias(seq)]
    if with_counts:
        aggs.append(F.count(F.lit(1)).alias("__n_events"))
    return survivors.groupBy(*keys).agg(*aggs)


def fetch_winner_payloads(
    events: DataFrame,
    winners: DataFrame,
    cfg: EngineConfig,
    cancelled: DataFrame | None = None,
) -> DataFrame:
    """Phase B of the fetch fold: materialize exactly the winning deliveries
    (payload included) via a map-side hash probe of the winner set.

    A duplicate delivery of the winning event *inside one token* (same key,
    seq, token twice — nothing upstream enforces within-token uniqueness)
    would fan the probe out to >1 row per key, violating merge_cdc's ≤1-row
    contract. The trailing per-key max_by collapses that (deterministic:
    the largest-seq delivery wins, matching lww_agg's idiom; duplicate
    rows are identical so any pick is value-equal). Plan cost, verified
    via .explain: string-payload agg buffers are not hash-aggregable, so
    this compiles to a SortAggregate — but the sort is an UnsafeRow
    pointer/prefix sort keyed on the group columns (payload bytes are not
    copied), partial_max_by pre-collapses duplicates map-side, and the
    exchange hash-partitions by the keys the downstream MERGE joins on
    anyway — the common (no-duplicate) case ships the same bytes through
    the same number of shuffles as the unguarded plan."""
    survivors = drop_cancelled(events, cfg, cancelled=cancelled)
    return _fetch_payloads(survivors, winners, cfg)


def _fetch_payloads(
    survivors: DataFrame, winners: DataFrame, cfg: EngineConfig
) -> DataFrame:
    """The broadcast winner-to-payload probe + duplicate-delivery guard
    shared by lww_fetch (phase B) and the payload-pruned lww_window.
    `winners` is a (key..., event_seq) frame with <=1 row per key; output is
    one full row per key carrying the max-token delivery's payload."""
    keys = list(cfg.key_columns)
    seq, tok = cfg.order_column, cfg.token_column
    if getattr(cfg, "broadcast_winners", True):
        winners = F.broadcast(winners)
    fetched = survivors.join(winners, on=[*keys, seq], how="inner")
    rest = [c for c in fetched.columns if c not in keys and c != tok]
    carried = F.struct(*[F.col(c).alias(c) for c in rest])
    order = (
        F.struct(F.col(seq), F.col(tok))
        if tok in fetched.columns
        else F.col(seq)
    )
    return (
        fetched.groupBy(*keys)
        .agg(F.max_by(carried, order).alias("__w"))
        .select(*keys, *[F.col(f"__w.{c}").alias(c) for c in rest])
    )


def fold_changes(
    events: DataFrame,
    cfg: EngineConfig,
    strategy: str = "fetch",
) -> DataFrame:
    """Full batch fold: cancellation → LWW. One surviving row per key.

    strategy: 'fetch' (default, winner-select + broadcast payload fetch),
    'agg' (single-pass partial-agg), 'window', or 'window_salted'.
    """
    if strategy == "fetch":
        out = lww_fetch(events, cfg)
    elif strategy == "agg":
        out = lww_agg(drop_cancelled(events, cfg), cfg)
    elif strategy == "window":
        out = lww_window(drop_cancelled(events, cfg), cfg, salted=False)
    elif strategy == "window_salted":
        out = lww_window(drop_cancelled(events, cfg), cfg, salted=True)
    else:
        raise ValueError(f"unknown LWW strategy: {strategy!r}")
    keep = fold_output_columns(events, cfg)
    return out.select(*[c for c in keep if c in out.columns])


def replay(events: DataFrame, cfg: EngineConfig, strategy: str = "fetch") -> DataFrame:
    """Fold an entire log into the final table state (no incremental sink).

    Keys whose last surviving op is D have no row. This is the one-shot
    batch replay; the incremental path is streaming/pipeline.py + the
    LakeTable MERGE sink.
    """
    folded = fold_changes(events, cfg, strategy=strategy)
    return folded.where(F.col(cfg.op_column) != "D").drop(cfg.op_column, cfg.order_column)
