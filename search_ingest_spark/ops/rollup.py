"""Time-series rollup tables (the hypertable continuous-aggregate).

At 100 TB of events, dashboard-style questions (per-type hourly/daily
counts, sums, extrema) cannot re-scan raw data per query.  The
standard answer — TimescaleDB's continuous aggregates, ES's rollup
jobs, Druid's rollup segments — is a PRE-AGGREGATED table at a fine
base interval whose metrics are chosen to RE-AGGREGATE: count and sum
add, min/max fold, so any query at a coarser multiple of the base
interval is answered from the rollup alone, exactly.

Shapes:
- :func:`build_rollup` — one groupBy over the raw stream (map-side
  combinable; the shuffle carries one row per (bucket, keys), never
  events), written range-partitioned + sorted on the bucket so a
  time-windowed query prunes to its row groups.  The value sum is
  stored as floor(value·1e4) BIGINT: integer summation is associative,
  so re-aggregation is deterministic under any partitioning (the same
  trick the date_histogram driver entry uses).
- :func:`rollup_query` — re-buckets the rollup to any coarser multiple
  interval and re-folds the metrics; rejects intervals the rollup
  cannot answer exactly (non-multiples) instead of silently
  approximating.  The time-range filter lands on the rollup's bucket
  column (pushed to the parquet scan).

The DuckDB oracle recomputes the queried granularity from RAW events —
certifying the whole rollup+requery path, not just the requery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ROLLUP_TABLE = "events_rollup"


def build_rollup(
    events: DataFrame, cat, *, name: str = ROLLUP_TABLE,
    ts_col: str = "ts", value_col: str = "value",
    interval_sec: int = 3600, key_cols: tuple = ("event_type",),
) -> None:
    """Materialize the base-interval rollup: (bucket_start_epoch,
    keys…, n_events, sum_value_e4, min_value, max_value)."""
    if interval_sec < 1:
        raise ValueError(f"interval_sec must be positive, got {interval_sec}")
    i = int(interval_sec)
    bucket = (F.floor(F.unix_timestamp(ts_col) / F.lit(i))
              * F.lit(i)).cast("long")
    r = (
        events.groupBy(bucket.alias("bucket_start_epoch"),
                       *[F.col(c) for c in key_cols])
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.floor(F.col(value_col) * 10000).cast("long"))
            .cast("long").alias("sum_value_e4"),
            F.min(value_col).alias("min_value"),
            F.max(value_col).alias("max_value"),
        )
    )
    # range-partitioned + sorted on time so windowed queries prune;
    # bucket count is tiny relative to events, 8 files suffice at any
    # tested scale (a real deployment sizes this to its retention)
    cat.write(name,
              r.repartitionByRange(8, F.asc("bucket_start_epoch"))
              .sortWithinPartitions("bucket_start_epoch", *key_cols))
    cat.write_small(name + "_meta", [(i,)], "interval_sec long")


def rollup_query(
    spark: SparkSession, cat, *, name: str = ROLLUP_TABLE,
    interval_sec: int, key_cols: tuple = ("event_type",),
    since_epoch: int | None = None, until_epoch: int | None = None,
    round_to: int = 4,
) -> DataFrame:
    """Answer a coarser-interval aggregation FROM the rollup:
    (bucket_start_epoch, keys…, n_events, sum_value_e4, min_value,
    max_value, avg_value) — exact, because every stored metric
    re-aggregates.  `since`/`until` (epoch seconds, [since, until))
    prune on the stored bucket column."""
    meta = cat.read_small(name + "_meta")[0]
    base = int(meta["interval_sec"])
    qi = int(interval_sec)
    if qi % base != 0:
        raise ValueError(
            f"rollup at {base}s cannot answer interval {qi}s exactly — "
            f"query a multiple of the base interval")
    for nm, b in (("since_epoch", since_epoch), ("until_epoch", until_epoch)):
        if b is not None and int(b) % base != 0:
            # an unaligned bound would split a stored bucket — the
            # stored-bucket prune and a raw-event filter would diverge
            raise ValueError(
                f"{nm} must be aligned to the {base}s base interval")
    r = cat.read(name)
    if since_epoch is not None:
        r = r.where(F.col("bucket_start_epoch") >= int(since_epoch))
    if until_epoch is not None:
        r = r.where(F.col("bucket_start_epoch") < int(until_epoch))
    key = (F.floor(F.col("bucket_start_epoch") / F.lit(qi))
           * F.lit(qi)).cast("long")
    return (
        r.groupBy(key.alias("bucket_start_epoch"),
                  *[F.col(c) for c in key_cols])
        .agg(
            F.sum("n_events").cast("long").alias("n_events"),
            F.sum("sum_value_e4").cast("long").alias("sum_value_e4"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )
        .withColumn(
            # fixed-point e4 average via exact integer division — no
            # double rounding, so a half-boundary can never split the
            # engines (the avg in value units is avg_value_e4 / 1e4)
            "avg_value_e4",
            F.expr("sum_value_e4 div n_events").cast("long"))
    )


def rollup_query_oracle_sql(
    *, interval_sec: int, key_cols: tuple = ("event_type",),
    since_epoch: int | None = None, until_epoch: int | None = None,
    where: str = "TRUE", round_to: int = 4,
) -> str:
    """Recompute the queried granularity from RAW events in DuckDB —
    the whole rollup+requery path must land on exactly this."""
    qi = int(interval_sec)
    keys = ", ".join(key_cols)
    # bounds are base-aligned by contract (rollup_query enforces it),
    # so filtering raw seconds here selects exactly the events whose
    # stored base buckets the engine keeps
    time_cond = "TRUE"
    if since_epoch is not None:
        time_cond += f" AND floor(epoch(ts)) >= {int(since_epoch)}"
    if until_epoch is not None:
        time_cond += f" AND floor(epoch(ts)) < {int(until_epoch)}"
    return f"""
SELECT (floor(floor(epoch(ts)) / {qi}) * {qi})::BIGINT
         AS bucket_start_epoch,
       {keys},
       count(*)::BIGINT AS n_events,
       sum(floor(value * 10000)::BIGINT)::BIGINT AS sum_value_e4,
       min(value) AS min_value,
       max(value) AS max_value,
       (sum(floor(value * 10000)::BIGINT) // count(*))::BIGINT
         AS avg_value_e4
FROM events
WHERE ({where}) AND ({time_cond})
GROUP BY 1, {keys}
""".strip()


def route_date_histogram(
    spark: SparkSession, cat, events: DataFrame, *,
    name: str = ROLLUP_TABLE, interval_sec: int,
    ts_col: str = "ts", value_col: str = "value",
    key_cols: tuple = ("event_type",),
    since_epoch: int | None = None, until_epoch: int | None = None,
) -> tuple[DataFrame, str]:
    """The continuous-aggregate PLANNER REWRITE (TimescaleDB's
    real-time aggregate routing, ES's rollup search): a date_histogram
    request is answered FROM the rollup whenever the rollup can answer
    it EXACTLY — table materialized, interval a multiple of the base,
    bounds aligned to base buckets — and falls back to the raw-events
    scan otherwise.  Returns (df, route) with route in {"rollup",
    "raw"} so callers and tests can assert which plan served the
    request; both routes produce the IDENTICAL schema and values
    (pinned by test), so the rewrite is invisible to the consumer.

    At 100 TB the difference is the whole point: the rollup route
    aggregates |buckets| pre-folded rows (thousands); the raw route
    re-scans the events table (billions).  The router makes the cheap
    plan the DEFAULT rather than an API the caller must know about."""
    qi = int(interval_sec)
    routable = cat.exists(name) and cat.exists(name + "_meta")
    if routable:
        base = int(cat.read_small(name + "_meta")[0]["interval_sec"])
        routable = (qi % base == 0) and all(
            b is None or int(b) % base == 0
            for b in (since_epoch, until_epoch))
    if routable:
        return (rollup_query(
            spark, cat, name=name, interval_sec=qi, key_cols=key_cols,
            since_epoch=since_epoch, until_epoch=until_epoch), "rollup")
    # raw fallback: same columns, same fixed-point integer metrics,
    # straight off the events table (one map-side-combinable groupBy)
    ev = events
    epoch = F.unix_timestamp(ts_col)
    if since_epoch is not None:
        ev = ev.where(epoch >= int(since_epoch))
    if until_epoch is not None:
        ev = ev.where(epoch < int(until_epoch))
    bucket = (F.floor(epoch / F.lit(qi)) * F.lit(qi)).cast("long")
    raw = (
        ev.groupBy(bucket.alias("bucket_start_epoch"),
                   *[F.col(c) for c in key_cols])
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum(F.floor(F.col(value_col) * 10000).cast("long"))
            .cast("long").alias("sum_value_e4"),
            F.min(value_col).alias("min_value"),
            F.max(value_col).alias("max_value"),
        )
        .withColumn("avg_value_e4",
                    F.expr("sum_value_e4 div n_events").cast("long"))
    )
    return raw, "raw"


def refresh_rollup(
    new_events: DataFrame, cat, *, name: str = ROLLUP_TABLE,
    ts_col: str = "ts", value_col: str = "value",
    key_cols: tuple = ("event_type",),
) -> None:
    """Incremental refresh: fold ONLY the new events into the stored
    rollup — the continuous-aggregate property that makes rollups
    viable against a live stream (re-materializing from history would
    be O(history) per batch; this is O(new buckets)).

    Every stored metric merges associatively: counts and e4-sums add,
    min/max fold — so delta(new) ⊎ stored is EXACTLY the rollup of the
    union, regardless of how the stream was batched (pinned by test:
    build(first half) + refresh(second half) ≡ build(all)).  The merge
    aggregates |stored ∪ delta buckets| rows, grouped on the bucket
    key; the atomic snapshot swap is the catalog's standard commit."""
    meta = cat.read_small(name + "_meta")[0]
    base = int(meta["interval_sec"])
    stored = cat.read(name)
    bucket = (F.floor(F.unix_timestamp(ts_col) / F.lit(base))
              * F.lit(base)).cast("long")
    delta = (
        new_events.groupBy(bucket.alias("bucket_start_epoch"),
                           *[F.col(c) for c in key_cols])
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.floor(F.col(value_col) * 10000).cast("long"))
            .cast("long").alias("sum_value_e4"),
            F.min(value_col).alias("min_value"),
            F.max(value_col).alias("max_value"),
        )
    )
    merged = (
        stored.unionByName(delta)
        .groupBy("bucket_start_epoch", *key_cols)
        .agg(
            F.sum("n_events").cast("long").alias("n_events"),
            F.sum("sum_value_e4").cast("long").alias("sum_value_e4"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )
    )
    cat.write(name,
              merged.repartitionByRange(8, F.asc("bucket_start_epoch"))
              .sortWithinPartitions("bucket_start_epoch", *key_cols))


def watch_rollup(
    stream_df: DataFrame, cat, checkpoint_dir: str, *,
    name: str = ROLLUP_TABLE, ts_col: str = "ts", value_col: str = "value",
    interval_sec: int = 3600, key_cols: tuple = ("event_type",),
    **trigger_kw,
):
    """Maintain the rollup FROM the change stream itself (the verdict-r5
    item-7 wiring): Structured Streaming foreachBatch → refresh_rollup,
    so the continuous aggregate is updated by the same micro-batch loop
    that lands the raw events — no separate rebuild job, ever.

    The first non-empty batch creates the rollup (build ≡ refresh on an
    empty base — the delta-fold equivalence pinned by
    tests/test_ops.py); every later batch folds O(batch buckets) rows.
    Checkpointed at-least-once replay is safe at the rollup level
    because refresh is only invoked on batches the sink hasn't
    committed; a replayed UNcommitted batch starts from the pre-batch
    snapshot (the catalog publish is atomic), and counts/sums fold the
    batch exactly once per commit.  This mirrors the index's own
    foreachBatch contract (streaming/incremental.py::PageIndexer.watch)."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if cat.exists(name):
            refresh_rollup(batch_df, cat, name=name, ts_col=ts_col,
                           value_col=value_col, key_cols=key_cols)
        else:
            build_rollup(batch_df, cat, name=name, ts_col=ts_col,
                         value_col=value_col, interval_sec=interval_sec,
                         key_cols=key_cols)

    return (
        stream_df.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(**(trigger_kw or {"availableNow": True}))
        .start()
    )
