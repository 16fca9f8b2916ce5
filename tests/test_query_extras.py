"""minimum_should_match, fuzzy expansion, and multi_match best_fields —
ES query-DSL parity features over the same index/oracle machinery."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from search_ingest_spark.catalog import Catalog
from search_ingest_spark.index import build as ib
from search_ingest_spark.query import bm25
from search_ingest_spark.query.wand import Searcher

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def built(spark, documents_smoke, tmp_path_factory):
    cat = Catalog(spark, str(tmp_path_factory.mktemp("qx")))
    ib.build_index(spark, documents_smoke, cat, mode="simple",
                   docs_per_shard=50)
    return cat


def _oracle(sql: str):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    return [tuple(r) for r in con.execute(sql).fetchall()]


class TestMinShouldMatch:
    def test_wand_matches_oracle(self, spark, built):
        got = [tuple(r) for r in Searcher(spark, built).topk(
            "spark query data table", 10, round_to=4, min_match=2
        ).collect()]
        want = _oracle(bm25.bm25_oracle_sql(
            "spark query data table", k=10, min_should_match=2))
        assert got == want
        assert len(got) > 0

    def test_wand_matches_brute_force(self, spark, built, documents_smoke):
        for m in (2, 3):
            got = [tuple(r) for r in Searcher(spark, built).topk(
                "spark query data table", 10, round_to=4, min_match=m
            ).collect()]
            want = [tuple(r) for r in bm25.bm25_brute_force(
                documents_smoke, "spark query data table", 10, mode="simple",
                round_to=4, min_should_match=m,
            ).collect()]
            assert got == want, m

    def test_min_match_one_is_plain_or(self, spark, built):
        s = Searcher(spark, built)
        a = [tuple(r) for r in s.topk("spark data", 10, round_to=4).collect()]
        b = [tuple(r) for r in s.topk("spark data", 10, round_to=4,
                                      min_match=1).collect()]
        assert a == b

    def test_min_match_above_terms_empty(self, spark, built):
        assert Searcher(spark, built).topk(
            "spark data", 10, min_match=3
        ).count() == 0

    def test_equals_match_all_at_term_count(self, spark, built):
        s = Searcher(spark, built)
        a = [tuple(r) for r in s.topk("spark query data", 10, round_to=4,
                                      match_all=True).collect()]
        b = [tuple(r) for r in s.topk("spark query data", 10, round_to=4,
                                      min_match=3).collect()]
        assert a == b


class TestFuzzy:
    def test_matches_oracle(self, spark, built):
        got = [tuple(r) for r in Searcher(spark, built).topk_fuzzy(
            "spork data", 10, fuzziness=1, round_to=4
        ).collect()]
        want = _oracle(bm25.fuzzy_oracle_sql("spork data", k=10, fuzziness=1))
        assert got == want
        assert len(got) > 0

    def test_expansion_includes_exact_term(self, spark, built):
        idf = Searcher(spark, built).plan_fuzzy("spark", fuzziness=1)
        exact = Searcher(spark, built).plan("spark")
        assert set(exact) <= set(idf)

    def test_fuzziness_zero_is_exact(self, spark, built):
        s = Searcher(spark, built)
        a = [tuple(r) for r in s.topk("spark data", 10, round_to=4).collect()]
        b = [tuple(r) for r in s.topk_fuzzy("spark data", 10, fuzziness=0,
                                            round_to=4).collect()]
        assert a == b

    def test_garbage_term_no_expansion(self, spark, built):
        assert Searcher(spark, built).topk_fuzzy(
            "xqzvwy", 10, fuzziness=1
        ).count() == 0


class TestMultiMatch:
    FIELDS = [("substring(text, 1, 60)", 2.0), ("text", 1.0)]

    def test_matches_oracle(self, spark, documents_smoke):
        got = [tuple(r) for r in bm25.multi_match_best_fields(
            documents_smoke, "spark query data", self.FIELDS, 10,
            mode="simple", round_to=4,
        ).collect()]
        want = _oracle(bm25.multi_match_oracle_sql(
            "spark query data", self.FIELDS, k=10))
        assert got == want
        assert len(got) == 10

    def test_single_field_boost1_equals_plain(self, spark, documents_smoke):
        got = [tuple(r) for r in bm25.multi_match_best_fields(
            documents_smoke, "spark query data", [("text", 1.0)], 10,
            mode="simple", round_to=4,
        ).collect()]
        want = [tuple(r) for r in bm25.bm25_brute_force(
            documents_smoke, "spark query data", 10, mode="simple",
            round_to=4,
        ).collect()]
        assert got == want

    def test_score_is_max_of_fields(self, spark, documents_smoke):
        # with boost 2x on a strict substring field, every combined score
        # is >= the plain body score for the same doc
        combined = {r["doc_id"]: r["score"] for r in
                    bm25.multi_match_best_fields(
                        documents_smoke, "spark query data", self.FIELDS, 10,
                        mode="simple", round_to=4).collect()}
        body = {r["doc_id"]: r["score"] for r in bm25.bm25_brute_force(
            documents_smoke, "spark query data", 50, mode="simple",
            round_to=4).collect()}
        for d, s in combined.items():
            if d in body:
                assert s >= body[d] - 1e-9
