"""Streaming ingest statistics + stateful operators.

The reference exposes no ingest metrics beyond logs; a web-scale
crawler feed needs (a) windowed ingest-rate observability and (b) a
cross-batch first-seen gate so re-crawled urls don't re-enter expensive
downstream stages (the streaming complement of the batch dedup family
in ops/dedup.py).

Spark shapes:
- :func:`ingest_rate` — event-time windowed counts per source with a
  watermark: classic Structured Streaming windowed aggregation; late
  rows beyond the watermark are dropped, state is bounded by
  (watermark / window) windows per source.
- :func:`first_seen` — `applyInPandasWithState` keyed by url: emits a
  url's FIRST occurrence only, across micro-batches; the per-key state
  is a single seen-flag with an optional processing-time timeout so
  state for dead urls expires (at 10^12 urls the state store is the
  scaling constraint — the timeout is the knob).  This is the custom
  stateful operator pattern (the built-in dropDuplicates() keeps rows
  with no expiry control and can't carry per-key metadata).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def ingest_rate(
    events: DataFrame, *, ts_col: str = "warc_ts", key_col: str = "source",
    window: str = "1 minute", watermark: str = "2 minutes",
) -> DataFrame:
    """(window_start, window_end, key, n_docs) — event-time windowed
    ingest counts with late-data handling."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("_w"), F.col(key_col))
        .agg(F.count("*").alias("n_docs"))
        .select(
            F.col("_w.start").alias("window_start"),
            F.col("_w.end").alias("window_end"),
            F.col(key_col), "n_docs",
        )
    )


FIRST_SEEN_OUT = "url string, first_ts timestamp, n_dups_in_batch int"
_FIRST_SEEN_STATE = "seen boolean"

def _first_seen_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState,
    ttl_ms: int = 0,
) -> Iterator[pd.DataFrame]:
    empty = pd.DataFrame({"url": [], "first_ts": [], "n_dups_in_batch": []})
    if state.hasTimedOut:
        # TTL elapsed with no new occurrence: evict the seen-flag so the
        # state store stays bounded (a re-crawl after expiry re-emits —
        # the documented trade for bounded state at 10^12 urls)
        state.remove()
        yield empty
        return
    batches = [pdf for pdf in pdfs if len(pdf)]
    n = sum(len(b) for b in batches)
    if state.exists or not batches:
        # url already emitted in an earlier batch → swallow duplicates
        if state.exists and ttl_ms:
            state.setTimeoutDuration(ttl_ms)  # slide the TTL
        yield empty
        return
    state.update((True,))
    if ttl_ms:
        state.setTimeoutDuration(ttl_ms)
    allb = pd.concat(batches, ignore_index=True)
    first = allb.sort_values("warc_ts").iloc[0]
    yield pd.DataFrame({
        "url": [key[0]],
        "first_ts": [first["warc_ts"]],
        "n_dups_in_batch": pd.array([n - 1], dtype="int32"),
    })


def first_seen(
    pages: DataFrame, *, state_ttl_ms: int = 0
) -> DataFrame:
    """Streaming first-occurrence gate keyed by url (see module doc).

    Input: a STREAMING DataFrame with (url, warc_ts, ...); output one
    row per url the first time it is ever seen, with the batch-local
    duplicate count (observability for crawl-dup ratios).

    ``state_ttl_ms`` > 0 enables ProcessingTimeTimeout state expiry: a
    url's seen-flag is evicted after that many ms without a new
    occurrence (each occurrence slides the timer), bounding the state
    store — the knob that matters at 10^12 urls.  0 keeps state forever
    (exact semantics)."""
    ttl = int(state_ttl_ms)
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl > 0
        else GroupStateTimeout.NoTimeout
    )

    def fn(key, pdfs, state):  # cloudpickled closure carries the ttl
        yield from _first_seen_fn(key, pdfs, state, ttl)

    return (
        pages.select("url", "warc_ts")
        .groupBy("url")
        .applyInPandasWithState(
            fn,
            outputStructType=FIRST_SEEN_OUT,
            stateStructType=_FIRST_SEEN_STATE,
            outputMode="append",
            timeoutConf=timeout,
        )
    )


def sessionize(
    events: DataFrame, *, ts_col: str = "ts", key_col: str = "user_id",
    gap: str = "30 minutes", watermark: str | None = None,
) -> DataFrame:
    """Gap-based sessionization — the canonical user-behavior rollup a
    web-scale events pipeline needs (and the textbook
    `session_window` use: dynamic-length windows that MERGE while
    events arrive within `gap` of the session's end).

    (session_start, session_end, key, n_events) per session, where
    session_end = last event + gap (Spark's session_window contract;
    windows merge when they overlap OR touch, so a successor exactly
    `gap` later still EXTENDS the session — a new session requires a
    strictly-greater-than-gap silence; pinned by test).

    Works identically over a batch frame (driver-oracle duty — the
    oracle replays the merge rule with lag/cumsum in SQL) and a
    streaming one; pass `watermark` on streams so state for closed
    sessions is evicted — state per key is bounded by the one open
    session plus windows newer than the watermark, which is what makes
    this viable at 10^9 users."""
    g = events
    if watermark is not None:
        g = g.withWatermark(ts_col, watermark)
    return (
        g.groupBy(F.session_window(F.col(ts_col), gap).alias("_w"),
                  F.col(key_col))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("_w.start").alias("session_start"),
            F.col("_w.end").alias("session_end"),
            F.col(key_col), "n_events",
        )
    )


def dedup_replays(
    events: DataFrame, *, id_col: str = "event_id", ts_col: str = "ts",
    watermark: str | None = None,
) -> DataFrame:
    """At-least-once delivery dedup: ONE row per event id.

    Batch form (watermark=None, driver-oracle duty): the EARLIEST
    occurrence wins, deterministically — min over the full row struct
    ordered (ts, remaining columns), so even exact-ts replays with
    differing payloads resolve identically in both engines.  One
    map-side-combinable aggregate; the shuffle carries one row per id.

    Streaming form (pass `watermark`): Spark's
    dropDuplicatesWithinWatermark(id_col) — keeps the FIRST-ARRIVING
    row and expires per-id state past the watermark, which is what
    bounds state at 10^12 events (documented divergence from the batch
    form: arrival order wins, not event time — the standard streaming
    trade; the batch twin is the reconciliation pass).
    """
    if watermark is not None:
        return (events.withWatermark(ts_col, watermark)
                .dropDuplicatesWithinWatermark([id_col]))
    others = [c for c in events.columns if c not in (id_col, ts_col)]
    win = F.min(F.struct(F.col(ts_col), *[F.col(c) for c in others]))
    return (
        events.groupBy(id_col)
        .agg(win.alias("_w"))
        .select(id_col, F.col(f"_w.{ts_col}").alias(ts_col),
                *[F.col(f"_w.{c}").alias(c) for c in others])
    )


def dedup_replays_oracle_sql(
    inner_sql: str, *, id_col: str = "event_id", ts_col: str = "ts",
    other_cols: list[str] | None = None,
) -> str:
    """DuckDB replay of the batch form over any event-producing SELECT:
    the same lexicographic (ts, other columns) struct minimum."""
    others = other_cols or []
    struct = ", ".join(f"{c} := {c}" for c in [ts_col, *others])
    sel = ", ".join(f"_w.{c} AS {c}" for c in [ts_col, *others])
    return f"""
WITH ev AS ({inner_sql}),
won AS (
  SELECT {id_col}, min(struct_pack({struct})) AS _w
  FROM ev GROUP BY 1
)
SELECT {id_col}, {sel} FROM won
""".strip()
