"""Incremental maintenance of the index-sorted table (VERDICT r5
item 4): changefeed batches keep the 64×-I/O sorted-top-k path alive
via Lucene-style sorted delta segments + an owners table, instead of
dropping the table (pre-r6 behavior: any batch forced a full rebuild).

Every assertion is exact equality against a brute-force sort over the
doc store's CURRENT state — same no-polling determinism contract as
tests/test_incremental.py."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from search_ingest_spark.catalog import Catalog
from search_ingest_spark.index import build as ib
from search_ingest_spark.query.reader import LocalSearcher
from search_ingest_spark.query.wand import Searcher
from search_ingest_spark.streaming.incremental import (
    DOCS_TABLE,
    OP_DELETE,
    OP_UPSERT,
    PageIndexer,
)

TS0 = dt.datetime(2026, 1, 1)

PAGES_DDL = ("url string, warc_ts timestamp, html binary, text string,"
             " lang string")


def _pages_df(spark, rows):
    return spark.createDataFrame(
        [(u, TS0 + dt.timedelta(seconds=o), None, t, "en")
         for u, o, t in rows], PAGES_DDL)


def _changes_df(spark, rows):
    return spark.createDataFrame(
        [(u, TS0 + dt.timedelta(seconds=o), None, t, "en", op)
         for u, o, t, op in rows], PAGES_DDL + ", _op string")


# varied deterministic lengths so the sort order is non-trivial
CORPUS = [
    (f"https://s/{i:03d}", i,
     "tok" + str(i) + " " + ("filler " * ((i * 7) % 23 + 1)).strip())
    for i in range(60)
]


def _expected_topk(spark, cat, k=10):
    """Brute-force (n_chars desc, doc_id asc) top-k over the CURRENT
    doc store."""
    rows = (cat.read(DOCS_TABLE)
            .select("doc_id", F.length("text").alias("n_chars"))
            .collect())
    rows = sorted(((r["n_chars"], r["doc_id"]) for r in rows),
                  key=lambda t: (-t[0], t[1]))[:k]
    return [(int(d), int(n), i + 1) for i, (n, d) in enumerate(rows)]


@pytest.fixture()
def indexer(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "inc_sorted"))
    ix = PageIndexer(spark, cat, mode="simple", docs_per_shard=8,
                     attr_exprs={"n_chars": "length(text)"},
                     sort_field="n_chars")
    ix.backfill(_pages_df(spark, CORPUS))
    return ix


BATCH1 = (
    # updates that MOVE docs in the sort order (much longer texts)
    [(f"https://s/{i:03d}", 1000 + i,
      "tok" + str(i) + " " + ("verylongfiller " * 40).strip(), OP_UPSERT)
     for i in (3, 17, 44)]
    # deletes, including a doc near the top of the base order
    + [(f"https://s/{i:03d}", 1000 + i, None, OP_DELETE)
       for i in (22, 45)]
    # appended docs, one of them the new global maximum
    + [("https://s/zz0", 2000, ("x " * 500).strip(), OP_UPSERT),
       ("https://s/zz1", 2001, "tiny", OP_UPSERT)]
)

BATCH2 = (
    # re-update an already-updated doc (owner must advance to seg 2)
    [("https://s/003", 3000, "tok3 short again", OP_UPSERT)]
    # delete the batch-1 appended maximum
    + [("https://s/zz0", 3001, None, OP_DELETE)]
)


class TestSortedIncremental:
    def test_backfill_builds_sorted_tables(self, spark, indexer):
        cat = indexer.cat
        assert cat.exists(ib.SORTED_ATTRS_TABLE)
        assert cat.exists(ib.DOC_ATTRS_TABLE)
        meta = cat.read_small(ib.SORTED_ATTRS_META)[0]
        assert meta["sort_field"] == "n_chars" and meta["n_segs"] == 0
        got = LocalSearcher(cat).sorted_topk("n_chars", 10)
        assert got == _expected_topk(spark, cat)

    def test_one_batch_exact(self, spark, indexer):
        indexer.apply_changes(_changes_df(spark, BATCH1))
        cat = indexer.cat
        meta = cat.read_small(ib.SORTED_ATTRS_META)[0]
        assert meta["n_segs"] == 1
        assert cat.exists(ib.SORTED_ATTRS_OWNERS)
        got = LocalSearcher(cat).sorted_topk("n_chars", 10)
        want = _expected_topk(spark, cat)
        assert got == want
        # the new global maximum (the appended zz0 doc) leads
        docs = cat.read(DOCS_TABLE)
        zz0 = docs.where(F.col("url") == "https://s/zz0").first()["doc_id"]
        assert got[0][0] == zz0

    def test_two_batches_exact_and_spark_path_agrees(self, spark, indexer):
        indexer.apply_changes(_changes_df(spark, BATCH1))
        indexer.apply_changes(_changes_df(spark, BATCH2))
        cat = indexer.cat
        assert cat.read_small(ib.SORTED_ATTRS_META)[0]["n_segs"] == 2
        want = _expected_topk(spark, cat)
        got_local = LocalSearcher(cat).sorted_topk("n_chars", 10)
        assert got_local == want
        # the Spark path reads the delta-maintained doc_attrs table —
        # identical rows, bitwise (integer field)
        got_spark = [tuple(r) for r in Searcher(spark, cat)
                     .sorted_topk("n_chars", 10).collect()]
        assert got_spark == [tuple(r) for r in got_local]

    def test_asc_across_delta_segments(self, spark, indexer):
        # the ascending scan merges base + delta segments by MIN stat;
        # owners filtering is direction-agnostic, so asc stays exact
        # after changefeed batches too
        indexer.apply_changes(_changes_df(spark, BATCH1))
        indexer.apply_changes(_changes_df(spark, BATCH2))
        cat = indexer.cat
        got = LocalSearcher(cat).sorted_topk("n_chars", 10,
                                             ascending=True)
        want = [tuple(r) for r in Searcher(spark, cat)
                .sorted_topk("n_chars", 10, ascending=True).collect()]
        assert got == want and len(got) == 10

    def test_deleted_and_stale_rows_never_surface(self, spark, indexer):
        indexer.apply_changes(_changes_df(spark, BATCH1))
        indexer.apply_changes(_changes_df(spark, BATCH2))
        cat = indexer.cat
        k_all = cat.read(DOCS_TABLE).count()
        got = LocalSearcher(cat).sorted_topk("n_chars", k_all + 10)
        assert len(got) == k_all  # every live doc exactly once
        rows = (cat.read(DOCS_TABLE)
                .select("doc_id", F.length("text").alias("n_chars"))
                .collect())
        want = sorted(((r["n_chars"], r["doc_id"]) for r in rows),
                      key=lambda t: (-t[0], t[1]))
        assert [(d, n) for d, n, _ in got] == [(d, n) for n, d in want]

    def test_early_termination_still_prunes(self, spark, indexer):
        indexer.apply_changes(_changes_df(spark, BATCH1))
        stats: dict = {}
        got = LocalSearcher(indexer.cat).sorted_topk("n_chars", 3,
                                                     stats=stats)
        assert got == _expected_topk(spark, indexer.cat, 3)
        # base fragments hold ~8 docs each in global sort order; a
        # k=3 read must stop well before scanning all segments' files
        assert stats["fragments_read"] < stats["fragments_total"]

    def test_filtered_sorted_topk_after_batch(self, spark, indexer):
        indexer.apply_changes(_changes_df(spark, BATCH1))
        cat = indexer.cat
        got = LocalSearcher(cat).sorted_topk(
            "n_chars", 5, attr_filter={"n_chars": {"lte": 100}})
        rows = (cat.read(DOCS_TABLE)
                .select("doc_id", F.length("text").alias("n_chars"))
                .where(F.length("text") <= 100).collect())
        want = sorted(((r["n_chars"], r["doc_id"]) for r in rows),
                      key=lambda t: (-t[0], t[1]))[:5]
        assert got == [(int(d), int(n), i + 1)
                       for i, (n, d) in enumerate(want)]

    def test_compaction_folds_segments(self, spark, indexer):
        indexer.SORTED_COMPACT_SEGS = 1  # force the merge policy
        indexer.apply_changes(_changes_df(spark, BATCH1))
        indexer.apply_changes(_changes_df(spark, BATCH2))  # 2 > 1 → compact
        cat = indexer.cat
        meta = cat.read_small(ib.SORTED_ATTRS_META)[0]
        assert meta["n_segs"] == 0
        assert not cat.exists(ib.SORTED_ATTRS_OWNERS)
        assert not cat.exists(ib.SORTED_ATTRS_SEG_PREFIX + "1")
        got = LocalSearcher(cat).sorted_topk("n_chars", 10)
        assert got == _expected_topk(spark, cat)

    def test_delete_only_batch(self, spark, indexer):
        indexer.apply_changes(_changes_df(spark, [
            (f"https://s/{i:03d}", 1000, None, OP_DELETE) for i in (0, 1, 2)
        ]))
        cat = indexer.cat
        # no upserts → no new segment, owners alone carry the deletes
        assert cat.read_small(ib.SORTED_ATTRS_META)[0]["n_segs"] == 0
        got = LocalSearcher(cat).sorted_topk("n_chars", 10)
        assert got == _expected_topk(spark, cat)

    def test_attr_filter_query_path_stays_alive(self, spark, indexer):
        # the filtered WAND path reads doc_attrs — previously dropped
        # on the first batch, now delta-maintained
        indexer.apply_changes(_changes_df(spark, BATCH1))
        s = Searcher(spark, indexer.cat)
        hits = s.topk("tok3", 5, attr_filter={"n_chars": {"gte": 100}})
        assert hits.count() >= 1  # the batch-1 lengthened doc 003

    def test_sort_field_requires_expr(self, spark, tmp_path):
        with pytest.raises(ValueError, match="attr_exprs"):
            PageIndexer(spark, Catalog(spark, str(tmp_path / "x")),
                        sort_field="n_chars")
