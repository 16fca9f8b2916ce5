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
3. replaces only the DIRTY partitions of the doc store (shard-
   partitioned) and the url→id mapping (hash-bucket-partitioned);
4. splices the index **per shard** and DELTA-maintains the global
   stats: doc_lens is spliced per shard; (n_docs, Σdl) and the
   term_dict df/cf are updated by subtracting the dirty shards' old
   per-term aggregates and adding the new ones.  Existing term ids are
   kept stable and new terms appended so clean shards' postings stay
   valid.  BM25's global exactness is preserved because the deltas are
   exact integer arithmetic on the same aggregates a full re-agg would
   compute.

Cost model per batch (the O(dirty) contract, asserted by
tests/test_incremental.py::test_clean_shards_never_read):
- reads:  dirty shards' docs/doc_lens/postings partitions (the old
          per-term df/cf comes from the postings' columnar block
          aggregates — no token stream exists on disk), dirty
          id-buckets of the url mapping, the (vocabulary-sized) term
          dictionary, 1-row stats/counters;
- writes: the same dirty partitions, plus a full term_dict rewrite
          (dictionary-class table, orders of magnitude smaller than the
          corpus) and 1-row stats/counters.
Nothing scans the full docs/postings tables — there is no per-batch
O(corpus) term re-aggregation.

Atomicity: every table mutation of a batch is staged inside ONE catalog
transaction (catalog.begin/commit — the Iceberg multi-table commit
analog).  A crash leaves either the full pre-batch or full post-batch
state, so a foreachBatch replay re-derives deltas from a CONSISTENT
snapshot: replaying an already-committed batch computes old == new →
delta 0 → no-op (idempotent), and replaying an uncommitted one starts
from untouched state.
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
COUNTERS_TABLE = "counters"

# url→id mapping hash-bucket count: a batch touching U urls reads and
# rewrites ≤ U buckets ≈ U/N_ID_BUCKETS of the mapping, never all of it
N_ID_BUCKETS = 256

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


def _bucket_col(url_col: str = "url"):
    return F.pmod(F.xxhash64(url_col), F.lit(N_ID_BUCKETS)).cast("int")


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
        docs_per_shard: int = 100_000, with_positions: bool = False,
    ) -> None:
        self.spark = spark
        self.cat = cat
        self.mode = mode
        self.docs_per_shard = docs_per_shard
        self.with_positions = with_positions

    def _shard_col(self, id_col: str = "doc_id"):
        return (F.col(id_col) / F.lit(self.docs_per_shard)).cast("int")

    # -- batch backfill (A1) -------------------------------------------------
    def backfill(self, pages: DataFrame) -> ib.BuildInfo:
        docs = latest_per_key(normalize_pages(pages), "url", "warc_ts", ["text"])
        docs = dense_ids(docs, "url", "doc_id")
        docs = docs.withColumn("shard", self._shard_col())
        n_part = max(1, self.spark.sparkContext.defaultParallelism)
        self.cat.write(
            DOC_IDS_TABLE,
            docs.select("url", "doc_id").withColumn("id_bucket", _bucket_col())
            .repartition(max(1, min(N_ID_BUCKETS, n_part)), "id_bucket"),
            partition_by=["id_bucket"],
        )
        self.cat.write(
            DOCS_TABLE,
            docs.select("doc_id", "url", "warc_ts", "text", "shard")
            .repartition(n_part, "shard"),
            partition_by=["shard"],
        )
        info = ib.build_index(
            self.spark, self.cat.read(DOCS_TABLE), self.cat,
            mode=self.mode, docs_per_shard=self.docs_per_shard,
            with_positions=self.with_positions,
        )
        # dense-append high-water marks (doc ids cover ALL docs, even
        # token-less ones, so count the mapping — not stats.n_docs)
        n_ids = self.cat.read(DOC_IDS_TABLE).count()
        self.cat.write(
            COUNTERS_TABLE,
            self.spark.createDataFrame(
                [(n_ids - 1, info.n_terms - 1)],
                "max_doc_id long, max_term_id long",
            ),
        )
        return info

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

        # touched id-buckets (O(batch) driver traffic — bucket ids only)
        dirty_buckets = sorted({
            r[0]
            for r in ups.select(_bucket_col().alias("b"))
            .unionByName(dels.select(_bucket_col().alias("b")))
            .distinct().collect()
        })
        # the url→id join reads ONLY those buckets (partition pruning)
        doc_ids_sub = cat.read(DOC_IDS_TABLE).where(
            F.col("id_bucket").isin(dirty_buckets)
        )

        # id assignment: keep existing, extend for new urls (dense append)
        known = ups.join(doc_ids_sub.select("url", "doc_id"), "url", "inner")
        novel = ups.join(doc_ids_sub.select("url"), "url", "left_anti")
        base = int(cat.read(COUNTERS_TABLE).first()["max_doc_id"]) + 1
        novel_ids = dense_ids(novel.select("url"), "url", "_rk0").withColumn(
            "doc_id", F.col("_rk0") + F.lit(base)
        ).drop("_rk0")
        upserts = (
            known.withColumn("_new", F.lit(0))
            .unionByName(
                novel.join(novel_ids, "url")
                .select(*known.columns).withColumn("_new", F.lit(1))
            )
        )
        row = upserts.agg(
            F.count("*").alias("n_up"), F.sum("_new").alias("n_new")
        ).first()
        n_up, n_new = int(row["n_up"]), int(row["n_new"] or 0)
        upserts = upserts.drop("_new")

        del_ids = dels.join(doc_ids_sub.select("url", "doc_id"), "url").select(
            "doc_id", "url"
        )
        n_del = del_ids.count()

        # dirty-SHARD ids only cross to the driver (O(dirty shards), not
        # O(batch docs))
        touched = upserts.select("doc_id").unionByName(del_ids.select("doc_id"))
        dirty = sorted({
            r[0] for r in
            touched.select(self._shard_col().alias("s")).distinct().collect()
        })
        n_part = max(1, min(len(dirty) or 1,
                            spark.sparkContext.defaultParallelism))

        # ---- one atomic multi-table commit for the whole batch ----------
        cat.begin()
        try:
            # doc store: merge ONLY dirty shards (partition-pruned read)
            docs_old = cat.read(DOCS_TABLE).where(F.col("shard").isin(dirty))
            touched_urls = (
                upserts.select("url").unionByName(dels.select("url")).distinct()
            )
            ups_rows = upserts.withColumn("shard", self._shard_col()).select(
                "doc_id", "url", "warc_ts", "text", "shard"
            )
            merged = docs_old.join(touched_urls, "url", "left_anti").unionByName(
                ups_rows
            )
            cat.replace_partitions(
                DOCS_TABLE, merged.repartition(n_part, "shard"), "shard",
                dirty_values=dirty,
            )
            # url→id mapping: rewrite ONLY the touched buckets
            upd_ids = (
                doc_ids_sub.join(dels, "url", "left_anti")
                .join(ups.select("url"), "url", "left_anti")
                .select("url", "doc_id", "id_bucket")
                .unionByName(
                    upserts.select("url", "doc_id")
                    .withColumn("id_bucket", _bucket_col())
                )
            )
            cat.replace_partitions(
                DOC_IDS_TABLE,
                upd_ids.repartition(max(1, min(len(dirty_buckets), n_part)),
                                    "id_bucket"),
                "id_bucket", dirty_values=dirty_buckets,
            )

            n_new_terms = self._splice_index(dirty)

            old_counters = cat.read(COUNTERS_TABLE).first()
            cat.write(
                COUNTERS_TABLE,
                spark.createDataFrame(
                    [(
                        int(old_counters["max_doc_id"]) + n_new,
                        int(old_counters["max_term_id"]) + n_new_terms,
                    )],
                    "max_doc_id long, max_term_id long",
                ),
            )
            cat.commit()
        except BaseException:
            cat.rollback()
            raise
        return ChangeStats(n_up, n_del, n_new, dirty)

    @staticmethod
    def _term_agg(tokens: DataFrame, df_name: str, cf_name: str) -> DataFrame:
        """Skew-proof two-stage per-term (df, cf) aggregation."""
        return (
            tokens.groupBy(
                "term", F.pmod(F.xxhash64("doc_id"), F.lit(64)).alias("_salt")
            )
            .agg(F.count("*").alias("pdf"), F.sum("tf").alias("pcf"))
            .groupBy("term")
            .agg(F.sum("pdf").alias(df_name), F.sum("pcf").alias(cf_name))
        )

    def _splice_index(self, dirty_shards: list[int]) -> int:
        """Re-tokenize + re-encode only the dirty shards; DELTA-maintain
        the global term/doc stats; keep term ids stable.  Returns the
        number of newly-appended terms.  Must run inside a catalog
        transaction (reads pre-swap snapshots lazily; the txn keeps them
        alive until commit)."""
        if not dirty_shards:
            return 0
        spark, cat = self.spark, self.cat
        from search_ingest_spark.analysis import doc_terms_pandas

        dirty = [int(s) for s in dirty_shards]
        n_part = max(1, min(len(dirty),
                            spark.sparkContext.defaultParallelism))

        # OLD dirty-shard per-term aggregates — a COLUMNAR scan of the
        # dirty postings partitions: each block row carries its df
        # contribution (n_docs) and cf contribution (sum_tf), so the
        # exact old (df, cf) per term needs no token stream and no
        # block decoding (pre-swap snapshot; partition-pruned)
        old_term = (
            cat.read(ib.POSTINGS_TABLE).where(F.col("shard").isin(dirty))
            .groupBy("term_id")
            .agg(F.sum("n_docs").alias("odf"), F.sum("sum_tf").alias("ocf"))
        )
        old_dl = (
            cat.read(ib.DOC_LENS_TABLE).where(F.col("shard").isin(dirty))
            .agg(F.count("*").alias("n"), F.sum("dl").alias("s")).first()
        )
        old_st = cat.read(ib.STATS_TABLE).first()

        # tokenize ONLY the dirty shards' docs (docs is shard-partitioned);
        # the dirty token stream is cached, not persisted (same contract
        # as the batch build: postings are the only committed token
        # data).  When the index carries positions, the SAME pass emits
        # them (no second tokenize).
        mode = self.mode
        has_pos = cat.exists(ib.POSITIONS_TABLE)
        tok_schema = "doc_id long, term string, tf int, dl int"
        if has_pos:
            tok_schema += ", positions array<int>"
        dirty_docs = cat.read(DOCS_TABLE).where(F.col("shard").isin(dirty))
        tokens_new = dirty_docs.select("doc_id", "text").mapInPandas(
            lambda it: doc_terms_pandas(it, id_col="doc_id", text_col="text",
                                        mode=mode, with_positions=has_pos),
            schema=tok_schema,
        ).withColumn("shard", self._shard_col()).persist()

        # doc_lens: splice dirty shards, then delta-update (n_docs, Σdl)
        dl_new = tokens_new.groupBy("doc_id").agg(
            F.first("dl").alias("dl"), F.first("shard").alias("shard")
        ).select("doc_id", "dl", "shard")
        cat.replace_partitions(
            ib.DOC_LENS_TABLE, dl_new.repartition(n_part, "shard"), "shard",
            dirty_values=dirty,
        )
        new_dl = (
            cat.read(ib.DOC_LENS_TABLE).where(F.col("shard").isin(dirty))
            .agg(F.count("*").alias("n"), F.sum("dl").alias("s")).first()
        )
        n_docs2 = int(old_st["n_docs"]) - int(old_dl["n"]) + int(new_dl["n"])
        sum_dl2 = (
            int(old_st["sum_dl"]) - int(old_dl["s"] or 0) + int(new_dl["s"] or 0)
        )
        # float(long)/float(long) is the same IEEE double division Spark's
        # avg performs — bitwise identical to a full rebuild's avgdl
        avgdl2 = (float(sum_dl2) / float(n_docs2)) if n_docs2 else 0.0
        n_shards2 = max(int(old_st["n_shards"]), max(dirty) + 1)
        cat.write(
            ib.STATS_TABLE,
            spark.createDataFrame(
                [(n_docs2, sum_dl2, avgdl2, n_shards2, self.mode)],
                "n_docs long, sum_dl long, avgdl double, n_shards int, analyzer string",
            ),
        )

        # term_dict: delta-maintain df/cf — subtract the dirty shards' old
        # per-term counts, add the new; KEEP existing term ids, append new.
        # The dictionary (vocabulary-sized) is the only fully-rewritten
        # table; the token stream is never re-aggregated.
        new_term = self._term_agg(tokens_new, "ndf", "ncf")
        old_dict = cat.read(ib.TERM_DICT_TABLE)
        # subtract the dirty shards' old counts (term_id-keyed, from the
        # postings columns) ...
        base = old_dict.join(old_term, "term_id", "left").select(
            "term", "term_id",
            (F.col("df") - F.coalesce("odf", F.lit(0))).alias("dfb"),
            (F.col("cf") - F.coalesce("ocf", F.lit(0))).alias("cfb"),
        )
        # ... then add the fresh tokenization's counts (term-keyed)
        merged = (
            base.join(new_term, "term", "full_outer")
            .select(
                "term", "term_id",
                (F.coalesce("dfb", F.lit(0)) + F.coalesce("ndf", F.lit(0))).alias("df2"),
                (F.coalesce("cfb", F.lit(0)) + F.coalesce("ncf", F.lit(0))).alias("cf2"),
            )
        )
        kept = merged.where(F.col("term_id").isNotNull() & (F.col("df2") > 0)).select(
            "term", "term_id", F.col("df2").alias("df"), F.col("cf2").alias("cf")
        )
        new_terms = merged.where(F.col("term_id").isNull() & (F.col("df2") > 0)).select(
            "term", F.col("df2").alias("df"), F.col("cf2").alias("cf")
        )
        tbase = int(cat.read(COUNTERS_TABLE).first()["max_term_id"]) + 1
        new_terms = dense_ids(new_terms, "term", "_rk0").withColumn(
            "term_id", F.col("_rk0") + F.lit(tbase)
        ).drop("_rk0")
        n_new_terms = new_terms.count()
        cat.write(
            ib.TERM_DICT_TABLE,
            kept.select("term", "term_id", "df", "cf").unionByName(
                new_terms.select("term", "term_id", "df", "cf")
            ),
            sort_within_partitions=["term"],
        )
        term_dict = cat.read(ib.TERM_DICT_TABLE)

        # postings: rebuild ONLY dirty shards, splice partition dirs
        # (same flow as the build: encode runs keyed by term string,
        # then join the dense ids onto the much smaller blocks output)
        blocks = (
            tokens_new
            .select("shard", "term", "doc_id", "tf", "dl")
            .repartition(n_part, "shard")
            .sortWithinPartitions("shard", "term", "doc_id")
            .mapInPandas(ib._encode_partition, schema=ib.POSTINGS_ENC_SCHEMA)
        )
        enc = blocks.join(term_dict.select("term", "term_id"), "term").select(
            *ib.POSTINGS_COLS
        ).repartition(n_part, "shard")
        cat.replace_partitions(
            ib.POSTINGS_TABLE, enc, "shard", dirty_values=dirty,
        )

        # positional component (if the build enabled it): a projection
        # of the already-tokenized dirty stream, spliced per shard
        if has_pos:
            pos_new = tokens_new.select("doc_id", "term", "positions", "shard")
            cat.replace_partitions(
                ib.POSITIONS_TABLE,
                pos_new.repartition(n_part, "shard")
                .sortWithinPartitions("shard", "term", "doc_id"),
                "shard", dirty_values=dirty,
            )
        # the url-keyed incremental pipeline carries no filterable attr
        # columns; a stale filter table is worse than none — drop it
        # (a batch rebuild with attr_cols recreates it)
        if cat.exists(ib.DOC_ATTRS_TABLE):
            cat.drop(ib.DOC_ATTRS_TABLE)
        tokens_new.unpersist()
        return n_new_terms

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
