"""Sequential-fold oracle: the single-threaded reference semantics the
distributed operators must match (FIXTURES.md §2 'Expected final state =
sequential fold of the log').

Rules:
- total order = event_seq (globally unique, monotone; delta_token only
  groups events into checkpoint units);
- duplicate deliveries (same event_seq re-emitted later) apply at most once
  (idempotent apply) — i.e. dedup by event_seq before folding;
- a rocancel event is never applied; it erases the effect of the event
  whose event_seq == its cancel_seq (as if that event never happened);
  cancelling a rocancel event is a no-op;
- op I/U upsert the key's payload; D deletes the key;
- a NULL op expresses no change (malformed envelope on a lax log): the
  event is inert — the engine pins the same semantics in the fold
  (drop_cancelled) and the merge (merge_cdc), so batch replay and the
  epoch-split incremental path agree.
"""

from __future__ import annotations

import hashlib

import pandas as pd


def sequential_fold(events: pd.DataFrame) -> dict[tuple[str, str], dict]:
    """Final state: (repo, path) -> {commit, lang, content, event_seq}."""
    df = events.sort_values(["event_seq", "delta_token"]).drop_duplicates(
        "event_seq", keep="first"
    )
    cancelled = set(
        df.loc[df["rocancel"] & df["cancel_seq"].notna(), "cancel_seq"]
        .astype("int64")
        .tolist()
    )
    state: dict[tuple[str, str], dict] = {}
    for row in df.itertuples(index=False):
        if row.rocancel or row.event_seq in cancelled:
            continue
        if not isinstance(row.op, str):
            continue  # null op: inert (see module docstring)
        key = (row.repo, row.path)
        if row.op == "D":
            state.pop(key, None)
        else:
            state[key] = {
                "commit": row.commit,
                "lang": row.lang,
                "content": row.content,
                "event_seq": row.event_seq,
            }
    return state


def fold_to_frame(events: pd.DataFrame) -> pd.DataFrame:
    """Final state as a sorted DataFrame (repo, path, commit, lang, content)."""
    state = sequential_fold(events)
    rows = [
        {"repo": k[0], "path": k[1], "commit": v["commit"], "lang": v["lang"],
         "content": v["content"]}
        for k, v in state.items()
    ]
    out = pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])
    return out.sort_values(["repo", "path"]).reset_index(drop=True)


def sha256_hex(s: str) -> str:
    return hashlib.sha256(s.encode("utf-8")).hexdigest()
