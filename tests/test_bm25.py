"""BM25 brute-force path vs DuckDB oracle — the same comparison the
driver's correctness gate performs (row count + values)."""

from __future__ import annotations

import duckdb
import pytest

from search_ingest_spark.query.bm25 import (
    analyze_query,
    bm25_brute_force,
    bm25_oracle_sql,
    doc_terms,
)

SF = "/root/testdata/sf0.01"

QUERIES = [
    "spark query data",
    "table scan fast",
    "customer order line",
    "hash join",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    return con


@pytest.mark.parametrize("q", QUERIES)
def test_matches_duckdb_oracle(spark, documents_correct, duck, q):
    got = (
        bm25_brute_force(documents_correct, q, k=10, mode="simple", round_to=4)
        .orderBy("rank")
        .collect()
    )
    want = duck.execute(bm25_oracle_sql(q, k=10)).fetchall()
    assert len(got) == len(want) == 10
    for g, w in zip(got, want):
        assert g["doc_id"] == w[0]
        assert g["score"] == pytest.approx(w[1], abs=1e-9)
        assert g["rank"] == w[2]


def test_deterministic_sum_matches_plain(spark, documents_correct):
    q = "spark query data"
    plain = bm25_brute_force(documents_correct, q, k=10, mode="simple", round_to=4)
    det = bm25_brute_force(
        documents_correct, q, k=10, mode="simple", round_to=4, deterministic_sum=True
    )
    assert [tuple(r) for r in plain.collect()] == [tuple(r) for r in det.collect()]


def test_doc_terms_no_shuffle_for_tf(spark, documents_smoke):
    # tf/dl are doc-local: the plan up to doc_terms must contain no Exchange
    plan = doc_terms(documents_smoke, mode="simple")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_query_analysis_simple():
    assert analyze_query("Spark, QUERY data!", mode="simple") == ["spark", "query", "data"]


def test_scores_positive_and_ranked(spark, documents_smoke):
    out = bm25_brute_force(documents_smoke, "data table", k=10, mode="simple").collect()
    scores = [r["score"] for r in out]
    assert all(s > 0 for s in scores)
    assert scores == sorted(scores, reverse=True)
