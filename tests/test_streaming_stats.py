"""Structured Streaming operators: windowed ingest rate (watermark) and
the applyInPandasWithState first-seen gate (cross-batch keyed state)."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from search_ingest_spark.streaming.stats import first_seen, ingest_rate

TS0 = dt.datetime(2026, 1, 1, 12, 0, 0)

PAGES_DDL = ("url string, warc_ts timestamp, source string")


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, PAGES_DDL).coalesce(1).write.mode(
        "append"
    ).parquet(path)


@pytest.fixture()
def src_dir(spark, tmp_path):
    p = str(tmp_path / "stream_src")
    # batch 1: three urls, one duplicated within the batch
    _write_batch(spark, p, [
        ("u/a", TS0 + dt.timedelta(seconds=5), "s1"),
        ("u/a", TS0 + dt.timedelta(seconds=1), "s1"),   # earlier crawl of a
        ("u/b", TS0 + dt.timedelta(seconds=30), "s1"),
        ("u/c", TS0 + dt.timedelta(seconds=70), "s2"),
    ])
    # batch 2 (separate file → separate micro-batch): re-crawls + new url
    _write_batch(spark, p, [
        ("u/a", TS0 + dt.timedelta(seconds=90), "s1"),  # dup across batches
        ("u/d", TS0 + dt.timedelta(seconds=95), "s2"),
    ])
    return p


def _run_stream(spark, out_df, tmp_path, name, mode="append"):
    q = (
        out_df.writeStream.format("memory").queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"select * from {name}")


class TestFirstSeen:
    def test_cross_batch_dedup(self, spark, tmp_path, src_dir):
        stream = (
            spark.readStream.schema(PAGES_DDL)
            .option("maxFilesPerTrigger", 1)   # force one file per batch
            .parquet(src_dir)
        )
        out = _run_stream(spark, first_seen(stream), tmp_path, "fs_out")
        rows = {r["url"]: r for r in out.collect()}
        # u/a emitted ONCE (despite 3 occurrences over 2 batches), with
        # its earliest timestamp and 1 batch-local duplicate
        assert set(rows) == {"u/a", "u/b", "u/c", "u/d"}
        assert rows["u/a"]["first_ts"] == TS0 + dt.timedelta(seconds=1)
        assert rows["u/a"]["n_dups_in_batch"] == 1
        assert rows["u/d"]["n_dups_in_batch"] == 0

    def test_state_survives_into_later_batches(self, spark, tmp_path, src_dir):
        # append a third file re-crawling u/b: a fresh run over all
        # three files (still one file per trigger) must emit u/b once
        _write_batch(spark, src_dir, [
            ("u/b", TS0 + dt.timedelta(seconds=300), "s1"),
        ])
        stream = (
            spark.readStream.schema(PAGES_DDL)
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
        )
        out = _run_stream(spark, first_seen(stream), tmp_path, "fs_out2")
        assert out.where(F.col("url") == "u/b").count() == 1


class _StubState:
    """Minimal GroupState double for unit-testing the TTL kernel."""

    def __init__(self, exists=False, timed_out=False):
        self.exists = exists
        self.hasTimedOut = timed_out
        self.removed = False
        self.updated = None
        self.timeout_set = None

    def update(self, v):
        self.updated = v
        self.exists = True

    def remove(self):
        self.removed = True
        self.exists = False

    def setTimeoutDuration(self, ms):
        self.timeout_set = ms


class TestFirstSeenTTL:
    """ADVICE r02: with a TTL configured the kernel must arm the
    processing-time timer on every update and evict on hasTimedOut —
    otherwise state grows unboundedly at 10^12 urls."""

    def _run(self, state, batches, ttl):
        import pandas as pd

        from search_ingest_spark.streaming.stats import _first_seen_fn

        pdfs = iter([
            pd.DataFrame({"url": ["u"] * n, "warc_ts": [TS0] * n})
            for n in batches
        ])
        return list(_first_seen_fn(("u",), pdfs, state, ttl))

    def test_timer_armed_on_first_emit(self):
        st = _StubState()
        self._run(st, [2], ttl=60_000)
        assert st.updated == (True,)
        assert st.timeout_set == 60_000

    def test_timer_slides_on_duplicate(self):
        st = _StubState(exists=True)
        out = self._run(st, [1], ttl=60_000)
        assert st.timeout_set == 60_000        # re-armed
        assert sum(len(p) for p in out) == 0   # still swallowed

    def test_timeout_evicts_state(self):
        st = _StubState(exists=True, timed_out=True)
        out = self._run(st, [], ttl=60_000)
        assert st.removed
        assert sum(len(p) for p in out) == 0

    def test_no_ttl_means_no_timer(self):
        st = _StubState()
        self._run(st, [1], ttl=0)
        assert st.timeout_set is None

    def test_streaming_with_ttl_still_correct(self, spark, tmp_path, src_dir):
        # e2e: a large TTL must not change first-seen semantics
        stream = (
            spark.readStream.schema(PAGES_DDL)
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
        )
        out = _run_stream(
            spark, first_seen(stream, state_ttl_ms=3_600_000),
            tmp_path, "fs_out_ttl",
        )
        rows = {r["url"]: r for r in out.collect()}
        assert set(rows) == {"u/a", "u/b", "u/c", "u/d"}
        assert rows["u/a"]["n_dups_in_batch"] == 1


class TestIngestRate:
    def test_windowed_counts(self, spark, tmp_path, src_dir):
        stream = spark.readStream.schema(PAGES_DDL).parquet(src_dir)
        # complete mode: append would withhold windows the watermark has
        # not closed yet (correct late-data behavior; here we want to
        # see every window the bounded run produced)
        out = _run_stream(
            spark, ingest_rate(stream, window="1 minute"), tmp_path, "ir_out",
            mode="complete",
        )
        got = {
            (r["window_start"], r["source"]): r["n_docs"] for r in out.collect()
        }
        w0 = TS0  # 12:00:00 window
        w1 = TS0 + dt.timedelta(minutes=1)
        assert got[(w0, "s1")] == 3          # a, a, b
        assert got[(w1, "s2")] == 2          # c (70s), d (95s)
        assert got[(w1, "s1")] == 1          # a re-crawl at 90s


class TestSessionize:
    """Gap-based session_window: batch form vs a hand-built expectation
    (merge iff within gap, INCLUSIVE — Spark merges touching windows,
    so a successor at exactly `gap` still extends the session;
    empirically pinned here), and the same function over a stream."""

    EVENTS_DDL = "ts timestamp, user_id long"

    def _events(self, spark):
        rows = [
            # user 1: two events 10 min apart (one session), then a
            # 31-min gap (new session)
            (TS0, 1),
            (TS0 + dt.timedelta(minutes=10), 1),
            (TS0 + dt.timedelta(minutes=41), 1),
            # user 2: successor at EXACTLY the 30-min gap — windows
            # touch and Spark MERGES touching windows → one session
            (TS0, 2),
            (TS0 + dt.timedelta(minutes=30), 2),
        ]
        return spark.createDataFrame(rows, self.EVENTS_DDL)

    def test_batch_merge_rule(self, spark):
        from search_ingest_spark.streaming.stats import sessionize

        got = sorted(
            (r["user_id"], r["session_start"], r["session_end"],
             r["n_events"])
            for r in sessionize(self._events(spark), gap="30 minutes")
            .collect()
        )
        g = dt.timedelta(minutes=30)
        want = sorted([
            (1, TS0, TS0 + dt.timedelta(minutes=10) + g, 2),
            (1, TS0 + dt.timedelta(minutes=41),
             TS0 + dt.timedelta(minutes=41) + g, 1),
            (2, TS0, TS0 + dt.timedelta(minutes=30) + g, 2),
        ])
        assert got == want

    def test_streaming_equals_batch(self, spark, tmp_path):
        """Append mode only emits sessions the watermark has CLOSED, so
        the source is two files (one per trigger): the real events,
        then a far-future sentinel that advances the watermark past
        every real session's end.  Streaming output == batch output on
        the real events; the sentinel's own still-open session is
        rightly absent."""
        from search_ingest_spark.streaming.stats import sessionize

        p = str(tmp_path / "sess_src")
        self._events(spark).coalesce(1).write.mode("append").parquet(p)
        sentinel = [(TS0 + dt.timedelta(hours=6), 99)]
        (spark.createDataFrame(sentinel, self.EVENTS_DDL)
         .coalesce(1).write.mode("append").parquet(p))
        stream = (
            spark.readStream.schema(self.EVENTS_DDL)
            .option("maxFilesPerTrigger", 1).parquet(p)
        )
        out = _run_stream(
            spark,
            sessionize(stream, gap="30 minutes", watermark="1 minute"),
            tmp_path, "sess_out", mode="append")
        got = sorted(tuple(r) for r in out.collect())
        want = sorted(tuple(r) for r in
                      sessionize(self._events(spark),
                                 gap="30 minutes").collect())
        assert got == want


class TestDedupReplays:
    EV_DDL = "event_id long, ts timestamp, event_type string, value double"

    def _events(self, spark):
        return spark.createDataFrame([
            (1, TS0 + dt.timedelta(seconds=10), "click", 1.0),
            (1, TS0 + dt.timedelta(seconds=90), "click", 1.0),   # replay
            (2, TS0 + dt.timedelta(seconds=20), "view", 2.0),
            (2, TS0 + dt.timedelta(seconds=20), "aaaa", 9.0),    # same-ts
            (3, TS0 + dt.timedelta(seconds=30), "buy", 3.0),
        ], self.EV_DDL)

    def test_batch_earliest_wins(self, spark):
        from search_ingest_spark.streaming.stats import dedup_replays

        rows = {r["event_id"]: r for r in
                dedup_replays(self._events(spark)).collect()}
        assert len(rows) == 3
        assert rows[1]["ts"] == TS0 + dt.timedelta(seconds=10)
        # exact-ts tie resolves on the remaining columns ('aaaa' < 'view')
        assert rows[2]["event_type"] == "aaaa"
        assert rows[3]["value"] == 3.0

    def test_batch_matches_oracle_sql(self, spark, tmp_path):
        import duckdb

        from search_ingest_spark.streaming.stats import (
            dedup_replays, dedup_replays_oracle_sql)

        p = str(tmp_path / "ev.parquet")
        self._events(spark).coalesce(1).write.parquet(p)
        got = sorted(
            (r["event_id"], r["event_type"], r["value"]) for r in
            dedup_replays(self._events(spark)).collect())
        con = duckdb.connect()
        sql = dedup_replays_oracle_sql(
            f"SELECT * FROM read_parquet('{p}/*.parquet')",
            other_cols=["event_type", "value"])
        want = sorted((r[0], r[2], r[3])
                      for r in con.execute(sql).fetchall())
        assert got == want

    def test_streaming_drops_cross_batch_replays(self, spark, tmp_path):
        from search_ingest_spark.streaming.stats import dedup_replays

        src = str(tmp_path / "ev_src")
        spark.createDataFrame([
            (1, TS0 + dt.timedelta(seconds=10), "click", 1.0),
            (2, TS0 + dt.timedelta(seconds=20), "view", 2.0),
        ], self.EV_DDL).coalesce(1).write.mode("append").parquet(src)
        spark.createDataFrame([
            (1, TS0 + dt.timedelta(seconds=15), "click", 1.0),  # replay
            (3, TS0 + dt.timedelta(seconds=30), "buy", 3.0),
        ], self.EV_DDL).coalesce(1).write.mode("append").parquet(src)
        stream = (spark.readStream.schema(self.EV_DDL)
                  .option("maxFilesPerTrigger", 1).parquet(src))
        out = _run_stream(
            spark, dedup_replays(stream, watermark="10 minutes"),
            tmp_path, "dedup_replays")
        ids = sorted(r["event_id"] for r in out.collect())
        assert ids == [1, 2, 3]
