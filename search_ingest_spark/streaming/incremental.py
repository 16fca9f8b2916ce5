"""Incremental ingest — the reference's changefeed half, Spark-native.

Reference behavior being reproduced (SURVEY §2 A2/A3/A13-A15, §3.2):
- `process_resource(action, model)` dispatches Created/Updated/Deleted
  events one at a time (`/root/reference/src/search-ingest/table.cr:25-46`);
- updates are upserts keyed by doc id (`doc_as_upsert`,
  `elastic.cr:431-449`), deletes remove by id (`elastic.cr:452-464`);
- ordering is last-writer-wins per document;
- a dropped changefeed triggers full re-backfill (`table.cr:48-51`) —
  our analog is checkpointed streaming + idempotent batch application,
  so replays are safe and nothing restarts from zero.

Spark shape: a batch `apply_changes(changes)` operator (callable from
`foreachBatch`) that
1. deduplicates the batch latest-per-url (`max_by(warc_ts)` — the
   reference's per-event ordering collapsed into batch semantics);
2. assigns dense doc ids: existing urls keep their id (updates),
   new urls extend the id space (appends), so shard ranges stay dense;
3. MERGEs the doc store (upsert + tombstone delete);
4. splices the index **per shard**: only shards containing touched
   docs are re-tokenized and re-encoded (catalog partition-dir swap);
   term_dict/df stats are re-aggregated (global exactness — BM25 df/N
   must reflect the whole corpus, which per-segment deltas à la
   Lucene would only approximate), with existing term ids kept stable
   and new terms appended so clean shards' postings stay valid.

At 100 TB the per-batch cost is O(dirty shards + one tokens-table agg),
not O(corpus re-index).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from search_ingest_spark.analysis import extract_text_udf
from search_ingest_spark.catalog import Catalog
from search_ingest_spark.index import build as ib
from search_ingest_spark.index.build import dense_ids

DOCS_TABLE = "docs"
DOC_IDS_TABLE = "doc_ids"

# change-batch schema: (url, warc_ts, html?, text?, lang?, _op)
OP_UPSERT = "upsert"
OP_DELETE = "delete"


def latest_per_key(df: DataFrame, key: str, ts: str, payload_cols: list[str]) -> DataFrame:
    """Last-writer-wins per key (reference: per-doc event ordering).
    Tie-break on the full payload struct for determinism."""
    s = F.struct(ts, *payload_cols)
    return df.groupBy(key).agg(F.max_by(s, s).alias("_s")).select(
        key, *[F.col(f"_s.{c}").alias(c) for c in [ts, *payload_cols]]
    )


def normalize_pages(pages: DataFrame) -> DataFrame:
    """input_hint shape → doc rows: fill text from html when absent
    (deterministic extractor; byte-identical per url)."""
    text = F.coalesce(F.col("text"), extract_text_udf(F.col("html")))
    return pages.select(
        "url", "warc_ts", text.alias("text"),
        *(["lang"] if "lang" in pages.columns else []),
    )


@dataclass
class ChangeStats:
    upserts: int
    deletes: int
    new_docs: int
    dirty_shards: list[int]


class PageIndexer:
    """Full lifecycle over a url-keyed corpus: backfill → watch.

    Mirrors the reference `TableManager` surface (SURVEY §2 A27):
    `backfill()` (full build), `apply_changes()` (changefeed batch),
    `reindex()` (drop + rebuild, `table.cr:61-76`)."""

    def __init__(
        self, spark: SparkSession, cat: Catalog, *, mode: str = "standard",
        docs_per_shard: int = 100_000,
    ) -> None:
        self.spark = spark
        self.cat = cat
        self.mode = mode
        self.docs_per_shard = docs_per_shard

    # -- batch backfill (A1) -------------------------------------------------
    def backfill(self, pages: DataFrame) -> ib.BuildInfo:
        docs = latest_per_key(normalize_pages(pages), "url", "warc_ts", ["text"])
        docs = dense_ids(docs, "url", "doc_id")
        self.cat.write(DOC_IDS_TABLE, docs.select("url", "doc_id"))
        self.cat.write(DOCS_TABLE, docs.select("doc_id", "url", "warc_ts", "text"))
        return ib.build_index(
            self.spark, self.cat.read(DOCS_TABLE), self.cat,
            mode=self.mode, docs_per_shard=self.docs_per_shard,
        )

    def reindex(self, pages: DataFrame) -> ib.BuildInfo:
        """Drop-and-recreate (reference reindex, table.cr:61-76)."""
        self.cat.drop_all()
        import os

        state = os.path.join(self.cat.root, "build_state.json")
        if os.path.exists(state):
            os.remove(state)
        return self.backfill(pages)

    # -- changefeed batch (A2/A13-A15) ---------------------------------------
    def apply_changes(self, changes: DataFrame) -> ChangeStats:
        """Apply one micro-batch of (url, warc_ts, html/text, _op) events."""
        spark, cat = self.spark, self.cat
        # Last-writer-wins PER URL across BOTH op kinds (the reference
        # consumes events in order, so a delete after an upsert in the
        # same batch must win, and vice versa).  Tie-break on (op, text)
        # struct order — 'upsert' > 'delete' lexicographically, i.e. an
        # exact-timestamp tie resurrects the doc, deterministically.
        ev = changes.select(
            "url", "warc_ts",
            F.coalesce(F.col("text"), extract_text_udf(F.col("html"))).alias("text"),
            "_op",
        )
        latest = latest_per_key(ev, "url", "warc_ts", ["_op", "text"])
        ups = latest.where(F.col("_op") == OP_UPSERT).select("url", "warc_ts", "text")
        dels = latest.where(F.col("_op") == OP_DELETE).select("url")

        doc_ids = cat.read(DOC_IDS_TABLE)
        docs = cat.read(DOCS_TABLE)

        # id assignment: keep existing, extend for new urls (dense append)
        known = ups.join(doc_ids, "url", "inner")
        novel = ups.join(doc_ids, "url", "left_anti")
        base = doc_ids.agg(F.coalesce(F.max("doc_id") + 1, F.lit(0))).first()[0]
        novel_ids = dense_ids(novel.select("url"), "url", "_rk0").withColumn(
            "doc_id", F.col("_rk0") + F.lit(int(base))
        ).drop("_rk0")
        novel = novel.join(novel_ids, "url")
        upserts = known.unionByName(novel.select(*known.columns))
        n_up = upserts.count()
        n_new = n_up - known.count()

        del_ids = dels.join(doc_ids, "url").select("doc_id", "url")
        n_del = del_ids.count()

        # Collect the dirty-shard set BEFORE any snapshot swap: these
        # DataFrames read the PRE-batch snapshots, whose files are
        # deleted once the tables are rewritten (lazy plans must never
        # outlive the snapshot they were bound to).
        touched = upserts.select("doc_id").unionByName(del_ids.select("doc_id"))
        dirty = sorted({
            r[0] // self.docs_per_shard
            for r in touched.select("doc_id").distinct().collect()
        })

        # -- doc store MERGE (upsert + tombstone) -----------------------
        # Each write stages to a new snapshot dir while the old files
        # still exist, then swaps — so reading a table while rewriting
        # it is safe; only post-swap reuse of old plans is not.
        merged = (
            docs.join(upserts.select("url").union(dels.select("url")).distinct(),
                      "url", "left_anti")
            .unionByName(upserts.select("doc_id", "url", "warc_ts", "text"))
        )
        cat.write(DOCS_TABLE, merged)
        cat.write(
            DOC_IDS_TABLE,
            doc_ids.join(dels, "url", "left_anti")
            .unionByName(novel_ids.select("url", "doc_id")),
        )

        # -- per-shard index splice (fresh reads only) --------------------
        self._splice_index(dirty)
        return ChangeStats(n_up, n_del, n_new, dirty)

    def _splice_index(self, dirty_shards: list[int]) -> None:
        """Re-tokenize + re-encode only the dirty shards; re-aggregate the
        global term/doc stats; keep term ids stable."""
        if not dirty_shards:
            return
        spark, cat = self.spark, self.cat
        from search_ingest_spark.analysis import doc_terms_pandas

        docs = cat.read(DOCS_TABLE)
        dirty_docs = docs.where(
            (F.col("doc_id") / self.docs_per_shard).cast("int").isin(dirty_shards)
        )
        mode = self.mode
        new_toks = dirty_docs.select("doc_id", "text").mapInPandas(
            lambda it: doc_terms_pandas(it, id_col="doc_id", text_col="text", mode=mode),
            schema="doc_id long, term string, tf int, dl int",
        ).withColumn("shard", (F.col("doc_id") / F.lit(self.docs_per_shard)).cast("int"))

        # splice tokens table (partitioned by shard); repartition by
        # shard first so the staged write emits one file per dirty shard
        n_part = max(1, min(len(dirty_shards),
                            spark.sparkContext.defaultParallelism))
        cat.replace_partitions(
            ib.TOKENS_TABLE, new_toks.repartition(n_part, "shard"), "shard",
            dirty_values=dirty_shards,
            drop_values=[],
        )
        tokens = cat.read(ib.TOKENS_TABLE)

        # doc_lens + stats: full re-agg (cheap columnar pass)
        dl = tokens.groupBy("doc_id").agg(
            F.first("dl").alias("dl"), F.first("shard").alias("shard")
        )
        cat.write(ib.DOC_LENS_TABLE, dl.select("doc_id", "shard", "dl"))
        n_shards_now = int(
            dl.agg(F.coalesce(F.max("shard"), F.lit(0))).first()[0]
        ) + 1
        st = cat.read(ib.DOC_LENS_TABLE).agg(
            F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
        ).withColumn("n_shards", F.lit(n_shards_now)).withColumn(
            "analyzer", F.lit(self.mode)
        )
        cat.write(ib.STATS_TABLE, st)

        # term_dict: re-agg df/cf globally; KEEP existing term ids, append new
        old_dict = cat.read(ib.TERM_DICT_TABLE)
        fresh = (
            tokens.groupBy(
                "term", F.pmod(F.xxhash64("doc_id"), F.lit(64)).alias("_salt")
            )
            .agg(F.count("*").alias("pdf"), F.sum("tf").alias("pcf"))
            .groupBy("term")
            .agg(F.sum("pdf").alias("df"), F.sum("pcf").alias("cf"))
        )
        kept = fresh.join(old_dict.select("term", "term_id"), "term", "inner")
        new_terms = fresh.join(old_dict.select("term"), "term", "left_anti")
        tbase = int(old_dict.agg(F.coalesce(F.max("term_id") + 1, F.lit(0))).first()[0])
        new_terms = dense_ids(new_terms, "term", "_rk0").withColumn(
            "term_id", F.col("_rk0") + F.lit(tbase)
        ).drop("_rk0")
        cat.write(
            ib.TERM_DICT_TABLE,
            kept.select("term", "term_id", "df", "cf").unionByName(
                new_terms.select("term", "term_id", "df", "cf")
            ),
        )
        term_dict = cat.read(ib.TERM_DICT_TABLE)

        # postings: rebuild ONLY dirty shards, splice partition dirs
        # (same flow as the build: encode runs keyed by term string,
        # then join the dense ids onto the much smaller blocks output)
        blocks = (
            tokens.where(F.col("shard").isin(dirty_shards))
            .select("shard", "term", "doc_id", "tf", "dl")
            .repartition(n_part, "shard")
            .sortWithinPartitions("shard", "term", "doc_id")
            .mapInPandas(ib._encode_partition, schema=ib.POSTINGS_ENC_SCHEMA)
        )
        enc = blocks.join(term_dict.select("term", "term_id"), "term").select(
            "term_id", "shard", "block_id", "first_doc_id", "last_doc_id",
            "n_docs", "max_tf", "min_dl", "data",
        ).repartition(n_part, "shard")
        cat.replace_partitions(
            ib.POSTINGS_TABLE, enc, "shard", dirty_values=dirty_shards,
        )

    # -- streaming (A2): foreachBatch wrapper --------------------------------
    def watch(self, stream_df: DataFrame, checkpoint_dir: str, **trigger_kw):
        """Attach to a change stream: Structured Streaming foreachBatch →
        apply_changes.  The checkpoint dir gives at-least-once replay with
        idempotent batches — the analog of the reference's
        on_reconnect → re-backfill (table.cr:48-51), but incremental."""

        def process(batch_df: DataFrame, batch_id: int) -> None:
            if batch_df.isEmpty():
                return
            self.apply_changes(batch_df)

        return (
            stream_df.writeStream.foreachBatch(process)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(**(trigger_kw or {"availableNow": True}))
            .start()
        )
