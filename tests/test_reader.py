"""LocalSearcher (Spark-free serving path) must be bitwise identical to
the Spark WAND path on every query — the index format is the contract."""

from __future__ import annotations

import time

import pytest

from search_ingest_spark.catalog import Catalog
from search_ingest_spark.index import build as ib
from search_ingest_spark.query.reader import LocalSearcher
from search_ingest_spark.query.wand import Searcher

QUERIES = ["spark query data", "data", "customer order line", "hash join",
           "zzzunknown", "data zzzunknown"]


@pytest.fixture(scope="module")
def built(spark, documents_correct, tmp_path_factory):
    cat = Catalog(spark, str(tmp_path_factory.mktemp("rdr")))
    ib.build_index(spark, documents_correct, cat, mode="simple", docs_per_shard=50)
    return cat


def test_local_reader_bitwise_matches_spark_path(spark, built):
    s = Searcher(spark, built)
    ls = LocalSearcher(built)
    for q in QUERIES:
        spark_rows = [tuple(r) for r in s.topk(q, 10).collect()]
        local_rows = ls.topk(q, 10)
        assert local_rows == spark_rows, q


def test_local_reader_and_mode_matches(spark, built):
    s = Searcher(spark, built)
    ls = LocalSearcher(built)
    for q in ["spark query data", "data table", "data zzzunknown"]:
        spark_rows = [tuple(r) for r in s.topk(q, 10, match_all=True).collect()]
        assert ls.topk(q, 10, match_all=True) == spark_rows, q


def test_local_reader_latency_is_millisecond_class(built):
    ls = LocalSearcher(built)
    ls.topk("data", 10)  # warm
    t0 = time.time()
    n = 20
    for _ in range(n):
        ls.topk("spark query data", 10)
    per_query = (time.time() - t0) / n
    # the point of the serving path: no per-query Spark job scheduling
    assert per_query < 0.25, per_query


class TestLocalFilteredAndPhrase:
    @pytest.fixture(scope="class")
    def rich_index(self, spark, documents_correct, tmp_path_factory):
        cat = Catalog(spark, str(tmp_path_factory.mktemp("idx_rich")))
        ib.build_index(spark, documents_correct, cat, mode="simple",
                       docs_per_shard=50, with_positions=True,
                       attr_cols=["lang", "source"])
        return cat

    def test_filtered_matches_spark_path_bitwise(
        self, spark, rich_index
    ):
        from search_ingest_spark.query.wand import Searcher

        s = Searcher(spark, rich_index)
        ls = LocalSearcher(rich_index)
        for lang in ("fr", "es"):
            spark_side = [tuple(r) for r in s.topk(
                "spark query data", 10, attr_filter={"lang": lang}
            ).collect()]
            local_side = ls.topk("spark query data", 10,
                                 attr_filter={"lang": lang})
            assert local_side == spark_side, lang

    def test_filtered_no_match_empty(self, rich_index):
        assert LocalSearcher(rich_index).topk(
            "data", 10, attr_filter={"lang": "xx"}) == []

    def test_phrase_matches_spark_path_bitwise(self, spark, rich_index):
        from search_ingest_spark.query.phrase import PhraseSearcher

        ps = PhraseSearcher(spark, rich_index)
        ls = LocalSearcher(rich_index)
        for q in ("table hash", "part filter"):
            spark_side = [tuple(r) for r in ps.topk(q, 10).collect()]
            local_side = ls.phrase_topk(q, 10)
            assert local_side == spark_side, q
