"""Index-sorted segments (ES/Lucene index sorting, index.sort.field).

`build_index(sort_field=...)` writes the doc-values rows in GLOBAL
(sort_field desc, doc_id asc) order; `LocalSearcher.sorted_topk` then
answers field-sorted top-k by reading fragments in file order and
stopping as soon as k qualifying rows are in hand and the next
fragment's parquet max-stat falls strictly below the kth key — the
O(k + skipped) early-termination read sorted segments exist for.  The
Spark twin (`Searcher.sorted_topk`) is a TakeOrdered over the plain
doc_attrs scan; both must agree bitwise (integer fields).
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from search_ingest_spark.catalog import Catalog
from search_ingest_spark.index import build as ib
from search_ingest_spark.query.reader import LocalSearcher
from search_ingest_spark.query.wand import Searcher

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def built(spark, documents_smoke, tmp_path_factory):
    cat = Catalog(spark, str(tmp_path_factory.mktemp("srt")))
    ib.build_index(spark, documents_smoke, cat, mode="simple",
                   docs_per_shard=50, attr_cols=["lang", "n_chars"],
                   sort_field="n_chars")
    return cat


def _oracle(sql: str):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    return [tuple(r) for r in con.execute(sql).fetchall()]


class TestSortedTopk:
    def test_spark_path_matches_oracle(self, spark, built):
        got = [tuple(r) for r in
               Searcher(spark, built).sorted_topk("n_chars", 10).collect()]
        want = _oracle("""
            SELECT doc_id, n_chars,
                   row_number() OVER (ORDER BY n_chars DESC, doc_id ASC)
                     ::INT AS rank
            FROM documents ORDER BY n_chars DESC, doc_id ASC LIMIT 10""")
        assert got == want

    def test_local_matches_spark_path_bitwise(self, spark, built):
        s = Searcher(spark, built)
        ls = LocalSearcher(built)
        for k in (1, 10, 100, 10**6):
            spark_side = [tuple(r) for r in
                          s.sorted_topk("n_chars", k).collect()]
            assert ls.sorted_topk("n_chars", k) == spark_side, k

    def test_filtered_matches_spark_path_bitwise(self, spark, built):
        s = Searcher(spark, built)
        ls = LocalSearcher(built)
        specs = [
            {"lang": "es"},
            {"lang": ["es", "fr"]},
            {"n_chars": {"lt": 300}},
            {"lang": ["de"], "n_chars": {"gte": 100, "lt": 400}},
        ]
        for spec in specs:
            spark_side = [tuple(r) for r in
                          s.sorted_topk("n_chars", 10,
                                        attr_filter=spec).collect()]
            local_side = ls.sorted_topk("n_chars", 10, attr_filter=spec)
            assert local_side == spark_side, spec

    def test_early_termination_reads_prefix_only(self, built):
        ls = LocalSearcher(built)
        stats: dict = {}
        rows = ls.sorted_topk("n_chars", 5, stats=stats)
        assert len(rows) == 5
        assert stats["fragments_total"] > 1
        # a 5-row ask must stop well before the end of the table
        assert stats["fragments_read"] < stats["fragments_total"]

    def test_asc_spark_path_matches_oracle(self, spark, built):
        got = [tuple(r) for r in
               Searcher(spark, built).sorted_topk(
                   "n_chars", 10, ascending=True).collect()]
        want = _oracle("""
            SELECT doc_id, n_chars,
                   row_number() OVER (ORDER BY n_chars ASC, doc_id ASC)
                     ::INT AS rank
            FROM documents ORDER BY n_chars ASC, doc_id ASC LIMIT 10""")
        assert got == want

    def test_asc_local_matches_spark_path_bitwise(self, spark, built):
        s = Searcher(spark, built)
        ls = LocalSearcher(built)
        for k in (1, 10, 100, 10**6):
            spark_side = [tuple(r) for r in
                          s.sorted_topk("n_chars", k,
                                        ascending=True).collect()]
            assert ls.sorted_topk("n_chars", k,
                                  ascending=True) == spark_side, k

    def test_asc_early_terminates_on_min_stats(self, built):
        # the SAME desc-sorted layout serves the opposite direction:
        # min-stat fragment ordering walks the file tail first and
        # stops early — the pruning ES itself lacks for a
        # direction-mismatched sort
        ls = LocalSearcher(built)
        stats: dict = {}
        rows = ls.sorted_topk("n_chars", 5, stats=stats, ascending=True)
        assert len(rows) == 5
        assert stats["fragments_total"] > 1
        assert stats["fragments_read"] < stats["fragments_total"]

    def test_asc_filtered_matches_spark(self, spark, built):
        s = Searcher(spark, built)
        ls = LocalSearcher(built)
        spec = {"lang": ["es", "fr"], "n_chars": {"gte": 100}}
        spark_side = [tuple(r) for r in
                      s.sorted_topk("n_chars", 10, attr_filter=spec,
                                    ascending=True).collect()]
        assert ls.sorted_topk("n_chars", 10, attr_filter=spec,
                              ascending=True) == spark_side

    @pytest.mark.parametrize("ascending", [False, True])
    def test_search_after_continuation(self, spark, built, ascending):
        # page1 + cursor-page2 must exactly equal the one-shot top-10,
        # Spark and local bitwise
        s = Searcher(spark, built)
        ls = LocalSearcher(built)
        full = ls.sorted_topk("n_chars", 10, ascending=ascending)
        page1 = full[:5]
        cursor = (page1[-1][1], page1[-1][0])
        page2_local = ls.sorted_topk("n_chars", 5, ascending=ascending,
                                     search_after=cursor)
        assert [(d, ky) for d, ky, _ in page2_local] == \
            [(d, ky) for d, ky, _ in full[5:]]
        page2_spark = [tuple(r) for r in s.sorted_topk(
            "n_chars", 5, ascending=ascending,
            search_after=cursor).collect()]
        assert page2_spark == [tuple(r) for r in page2_local]

    def test_search_after_skips_leading_fragments(self, built):
        # a cursor deep in the table prunes the LEADING fragments too
        # (min-stat skip) — the deep page reads fewer fragments than
        # the table holds on either side
        ls = LocalSearcher(built)
        base: dict = {}
        ls.sorted_topk("n_chars", 5, stats=base)
        deep = ls.sorted_topk("n_chars", 10**6)
        cursor_row = deep[len(deep) // 2]
        st: dict = {}
        got = ls.sorted_topk("n_chars", 5, stats=st,
                             search_after=(cursor_row[1], cursor_row[0]))
        assert len(got) == 5
        assert st["fragments_total"] < base["fragments_total"]
        assert st["fragments_read"] <= st["fragments_total"]

    def test_full_scan_when_k_exceeds_corpus(self, built):
        ls = LocalSearcher(built)
        stats: dict = {}
        rows = ls.sorted_topk("n_chars", 10**6, stats=stats)
        assert stats["fragments_read"] == stats["fragments_total"]
        # global order: non-increasing keys, doc_id asc within ties
        keys = [(r[1], r[0]) for r in rows]
        assert keys == sorted(keys, key=lambda t: (-t[0], t[1]))

    def test_constant_key_ties_are_exact(self, spark, tmp_path_factory):
        # every doc has the same key: the stat bound never fires (a
        # later fragment can always displace via doc_id ties), so the
        # scan degrades to a full read — and must still be CORRECT
        cat = Catalog(spark, str(tmp_path_factory.mktemp("srt_const")))
        docs = spark.range(60).select(
            F.col("id").alias("doc_id"),
            F.lit("alpha beta gamma").alias("text"),
            F.lit(7).alias("n_chars"))
        ib.build_index(spark, docs, cat, mode="simple", docs_per_shard=20,
                       attr_cols=["n_chars"], sort_field="n_chars")
        ls = LocalSearcher(cat)
        stats: dict = {}
        rows = ls.sorted_topk("n_chars", 5, stats=stats)
        # ties break on doc_id asc: docs 0..4
        assert [r[0] for r in rows] == [0, 1, 2, 3, 4]
        assert all(r[1] == 7 for r in rows)
        assert stats["fragments_read"] == stats["fragments_total"]

    def test_requires_sorted_build(self, spark, documents_smoke,
                                   tmp_path_factory):
        cat = Catalog(spark, str(tmp_path_factory.mktemp("srt_none")))
        ib.build_index(spark, documents_smoke, cat, mode="simple",
                       docs_per_shard=50, attr_cols=["n_chars"])
        with pytest.raises(ValueError, match="sort_field"):
            LocalSearcher(cat).sorted_topk("n_chars", 5)

    def test_wrong_field_rejected(self, built):
        with pytest.raises(ValueError, match="sorted by"):
            LocalSearcher(built).sorted_topk("lang", 5)

    def test_nested_filter_rejected(self, built):
        with pytest.raises(ValueError, match="flat"):
            LocalSearcher(built).sorted_topk(
                "n_chars", 5,
                attr_filter={"nested": {"path": "p", "where": {}}})

    def test_sort_field_must_be_attr(self, spark, documents_smoke,
                                     tmp_path_factory):
        cat = Catalog(spark, str(tmp_path_factory.mktemp("srt_bad")))
        with pytest.raises(ValueError, match="attr_cols"):
            ib.build_index(spark, documents_smoke, cat, mode="simple",
                           attr_cols=["lang"], sort_field="n_chars")
