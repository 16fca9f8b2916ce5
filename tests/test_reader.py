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


@pytest.fixture(scope="module")
def rich_index(spark, documents_correct, tmp_path_factory):
    cat = Catalog(spark, str(tmp_path_factory.mktemp("idx_rich")))
    ib.build_index(spark, documents_correct, cat, mode="simple",
                   docs_per_shard=50, with_positions=True,
                   attr_cols=["lang", "source", "n_chars"],
                   with_bigrams=True)
    return cat


class TestLocalFilteredAndPhrase:

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

    def test_range_filter_matches_spark_path_bitwise(self, spark, rich_index):
        """ES `range` filter (VERDICT r03 item 1): the same gte/lt spec
        compiled to a Catalyst predicate (Spark path) and a pyarrow
        predicate (serving path) must select the same candidates —
        results bitwise identical."""
        from search_ingest_spark.query.wand import Searcher

        s = Searcher(spark, rich_index)
        ls = LocalSearcher(rich_index)
        specs = [
            {"n_chars": {"gte": 100, "lt": 400}},
            {"n_chars": {"gt": 250}},
            {"n_chars": {"lte": 150}},
            {"lang": ["es", "fr"], "n_chars": {"gte": 50, "lte": 500}},
        ]
        for spec in specs:
            spark_side = [tuple(r) for r in s.topk(
                "spark query data", 10, attr_filter=spec).collect()]
            local_side = ls.topk("spark query data", 10, attr_filter=spec)
            assert local_side == spark_side, spec

    def test_range_filter_bad_op_rejected(self, rich_index):
        with pytest.raises(ValueError, match="range filter"):
            LocalSearcher(rich_index).topk(
                "data", 10, attr_filter={"n_chars": {"between": 5}})

    def test_phrase_matches_spark_path_bitwise(self, spark, rich_index):
        from search_ingest_spark.query.phrase import PhraseSearcher

        ps = PhraseSearcher(spark, rich_index)
        ls = LocalSearcher(rich_index)
        for q in ("table hash", "part filter"):
            spark_side = [tuple(r) for r in ps.topk(q, 10).collect()]
            local_side = ls.phrase_topk(q, 10)
            assert local_side == spark_side, q


class TestServingParityExtras:
    """VERDICT r03 item 7 (+2, +6): fuzzy, wildcard, search_after and
    composed bool must be bitwise identical between the Spark path and
    the Spark-free serving path."""

    def test_fuzzy_matches_spark_path_bitwise(self, spark, built):
        from search_ingest_spark.query.wand import Searcher

        s, ls = Searcher(spark, built), LocalSearcher(built)
        for q, f in [("dat", 1), ("spark", 1), ("querry", 2)]:
            spark_side = [tuple(r) for r in
                          s.topk_fuzzy(q, 10, fuzziness=f).collect()]
            assert ls.topk_fuzzy(q, 10, fuzziness=f) == spark_side, (q, f)

    def test_wildcard_matches_spark_path_bitwise(self, spark, built):
        from search_ingest_spark.query.wand import Searcher

        s, ls = Searcher(spark, built), LocalSearcher(built)
        for pat in ["d?t*", "quer*", "*ata", "sp?rk"]:
            spark_side = [tuple(r) for r in
                          s.topk_wildcard(pat, 10, max_expansions=8).collect()]
            assert ls.topk_wildcard(pat, 10, max_expansions=8) == spark_side, pat

    def test_search_after_matches_spark_path_bitwise(self, spark, built):
        from search_ingest_spark.query.wand import Searcher

        s, ls = Searcher(spark, built), LocalSearcher(built)
        q = "spark query data"
        page1 = [tuple(r) for r in s.topk(q, 10, round_to=4).collect()]
        cursor = (page1[-1][1], page1[-1][0])
        spark_side = [tuple(r) for r in
                      s.topk(q, 10, round_to=4, search_after=cursor).collect()]
        local_side = ls.topk(q, 10, round_to=4, search_after=cursor)
        assert local_side == spark_side
        # local page1 + page2 must tile ranks 1..20 of a k=20 query
        all20 = [tuple(r) for r in s.topk(q, 20, round_to=4).collect()]
        local_p1 = ls.topk(q, 10, round_to=4)
        assert [t[:2] for t in local_p1 + local_side] == [
            t[:2] for t in all20]

    def test_min_should_match_matches_spark_path_bitwise(self, spark, built):
        from search_ingest_spark.query.wand import Searcher

        s, ls = Searcher(spark, built), LocalSearcher(built)
        q = "spark query data table"
        for m in (2, 3):
            spark_side = [tuple(r) for r in
                          s.topk(q, 10, round_to=4, min_match=m).collect()]
            assert ls.topk(q, 10, round_to=4, min_match=m) == spark_side, m

    def test_bool_query_matches_spark_path_bitwise(self, spark, rich_index):
        from search_ingest_spark.query.wand import Searcher

        s = Searcher(spark, rich_index)
        ls = LocalSearcher(rich_index)
        req = dict(must="data", should="spark query table",
                   must_not="customer", k=10, round_to=4)
        cases = [
            dict(req),
            dict(req, minimum_should_match=1),
            dict(req, filter={"lang": ["es", "fr"],
                              "n_chars": {"gte": 50}}),
            dict(must="data table", should=None, k=10, round_to=4),
            dict(must=None, should="spark query", minimum_should_match=2,
                 k=10, round_to=4),
        ]
        for case in cases:
            spark_side = [tuple(r) for r in s.bool_topk(**case).collect()]
            assert ls.bool_topk(**case) == spark_side, case


class TestParallelServing:
    """The cross-shard process-pool tail (reader._serve_worker) must be
    bitwise identical to the serial scan — workers only ever ADD
    candidates (θ0 is a floor), and the parent re-merges exactly."""

    @pytest.fixture(scope="class")
    def many_shards(self, spark, documents_correct, tmp_path_factory):
        cat = Catalog(spark, str(tmp_path_factory.mktemp("rdr_par")))
        # 100 shards: enough that a broad query's plan exceeds the
        # parallel threshold (_PAR_BOOT + _PAR_MIN_SHARDS)
        ib.build_index(spark, documents_correct, cat, mode="simple",
                       docs_per_shard=5)
        return cat

    def test_parallel_tail_bitwise_matches_serial(self, many_shards):
        import search_ingest_spark.query.reader as R

        ls = LocalSearcher(many_shards)
        queries = ["data", "spark query data", "hash join",
                   "customer order line"]
        # ensure the pool path is attempted (skip if env can't fork)
        par = {q: ls.topk(q, 10) for q in queries}
        par_r = {q: ls.topk(q, 10, round_to=4) for q in queries}
        broken_before = R._SERVE_POOL_BROKEN
        R._SERVE_POOL_BROKEN = True
        try:
            for q in queries:
                assert ls.topk(q, 10) == par[q], q
                assert ls.topk(q, 10, round_to=4) == par_r[q], q
        finally:
            R._SERVE_POOL_BROKEN = broken_before

    def test_parallel_tail_matches_spark_path(self, spark, many_shards):
        s = Searcher(spark, many_shards)
        ls = LocalSearcher(many_shards)
        for q in ["data", "spark query data"]:
            spark_rows = [tuple(r) for r in s.topk(q, 10).collect()]
            assert ls.topk(q, 10) == spark_rows, q


class TestSuggestParity:
    """The term/phrase typo suggesters must be identical between the
    Spark path and the Spark-free serving path — term rows are pure
    integers/strings (exact), phrase scores ride the SAME shared
    scoring kernel (wand.score_phrase_combos) over the SAME collected
    counts, so equality is bitwise."""

    CASES = ["sparc datq", "querry", "spark", "zzzzz", "dat tabel"]

    def test_suggest_terms_matches_spark_path(self, spark, rich_index):
        from search_ingest_spark.query.wand import Searcher

        s = Searcher(spark, rich_index)
        ls = LocalSearcher(rich_index)
        for text in self.CASES:
            spark_side = sorted(
                tuple(r) for r in
                s.suggest_terms(text, max_edits=1, size=3).collect())
            local_side = sorted(
                ls.suggest_terms(text, max_edits=1, size=3))
            assert local_side == spark_side, text

    def test_suggest_terms_wider_edits(self, spark, rich_index):
        from search_ingest_spark.query.wand import Searcher

        s = Searcher(spark, rich_index)
        ls = LocalSearcher(rich_index)
        spark_side = sorted(
            tuple(r) for r in
            s.suggest_terms("querry tabel", max_edits=2, size=5).collect())
        assert sorted(ls.suggest_terms("querry tabel", max_edits=2,
                                       size=5)) == spark_side

    def test_suggest_phrases_matches_spark_path(self, spark, rich_index):
        from search_ingest_spark.query.wand import Searcher

        s = Searcher(spark, rich_index)
        ls = LocalSearcher(rich_index)
        for text in self.CASES:
            spark_side = [tuple(r) for r in
                          s.suggest_phrases(text, max_edits=1,
                                            per_token=3, size=3).collect()]
            local_side = ls.suggest_phrases(text, max_edits=1,
                                            per_token=3, size=3)
            assert local_side == spark_side, text

    def test_phrase_requires_bigrams(self, spark, built):
        ls = LocalSearcher(built)
        with pytest.raises(ValueError, match="bigram"):
            ls.suggest_phrases("sparc datq")

    def test_too_many_tokens_rejected(self, rich_index):
        ls = LocalSearcher(rich_index)
        with pytest.raises(ValueError, match="caps input"):
            ls.suggest_phrases("a b c d e f g h i")
