"""Phrase-query tests (B-side match_phrase over the positional index).

Reference parity target: any ES index the reference creates answers
match_phrase because Lucene records positions for text fields
(schemas.cr:62-77) — including across asciifolding preserve_original
stacks (folded and original token share a position)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from search_ingest_spark.catalog import Catalog
from search_ingest_spark.index.build import build_index
from search_ingest_spark.query.phrase import PhraseSearcher
from search_ingest_spark.streaming.incremental import OP_UPSERT, PageIndexer


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)], "doc_id long, text string"
    )


def _build(spark, tmp_path, rows, mode="simple"):
    cat = Catalog(spark, str(tmp_path / "pidx"))
    build_index(spark, _docs(spark, rows), cat, mode=mode, with_positions=True)
    return PhraseSearcher(spark, cat)


class TestPhraseMatching:
    def test_exact_adjacency_required(self, spark, tmp_path):
        ps = _build(spark, tmp_path, [
            "alpha beta gamma",     # matches "alpha beta"
            "beta alpha gamma",     # reversed → no match
            "alpha x beta",         # gap → no match
            "alpha beta alpha beta",  # two occurrences
        ])
        got = ps.topk("alpha beta", 10, round_to=4).collect()
        ids = {r["doc_id"] for r in got}
        assert ids == {0, 3}
        by_id = {r["doc_id"]: r for r in got}
        # doc 3 has pfreq 2 → higher tf-norm, despite longer dl? verify order
        assert by_id[3]["rank"] == 1 and by_id[0]["rank"] == 2

    def test_repeated_term_phrase(self, spark, tmp_path):
        ps = _build(spark, tmp_path, [
            "a b a b",   # "a b a" occurs at base 0
            "a b c",     # no
            "b a b a",   # "a b a" at base 1
        ])
        ids = {r["doc_id"] for r in ps.topk("a b a", 10).collect()}
        assert ids == {0, 2}

    def test_missing_term_matches_nothing(self, spark, tmp_path):
        ps = _build(spark, tmp_path, ["alpha beta gamma"])
        assert ps.topk("alpha zzz", 10).collect() == []

    def test_standard_analyzer_folding_stack(self, spark, tmp_path):
        # "Café racer": folded 'cafe' and original 'café' share position
        # 0, so BOTH phrase forms match (the ES preserve_original
        # contract)
        ps = _build(spark, tmp_path, ["Café racer story", "cafe racer story"],
                    mode="standard")
        # index side: doc 0 stacks cafe+café at position 0; query side:
        # 'café' analyzes to the same stack — either query form matches
        # BOTH docs (ES synonym-stack phrase semantics)
        for q in ("cafe racer", "café racer"):
            ids = {r["doc_id"] for r in ps.topk(q, 10).collect()}
            assert ids == {0, 1}, q


class TestPhraseIncremental:
    def test_splice_updates_positions(self, spark, tmp_path):
        TS0 = dt.datetime(2026, 1, 1)

        def pages(rows):
            return spark.createDataFrame(
                [(u, TS0 + dt.timedelta(seconds=o), None, t, "en")
                 for u, o, t in rows],
                "url string, warc_ts timestamp, html binary, text string,"
                " lang string",
            )

        cat = Catalog(spark, str(tmp_path / "pinc"))
        ix = PageIndexer(spark, cat, mode="simple", docs_per_shard=4,
                         with_positions=True)
        ix.backfill(pages([
            (f"https://p/{i}", i, f"filler common w{i}") for i in range(8)
        ]))
        ps = PhraseSearcher(spark, cat)
        assert ps.topk("magic phrase", 10).collect() == []
        ix.apply_changes(spark.createDataFrame(
            [("https://p/2", TS0 + dt.timedelta(seconds=999), None,
              "magic phrase appears here", "en", OP_UPSERT)],
            "url string, warc_ts timestamp, html binary, text string,"
            " lang string, _op string",
        ))
        ps2 = PhraseSearcher(spark, cat)
        got = ps2.topk("magic phrase", 10).collect()
        assert len(got) == 1 and got[0]["rank"] == 1


class TestPhraseBatch:
    def test_topk_many_matches_single_queries(self, spark, tmp_path):
        ps = _build(spark, tmp_path, [
            "alpha beta gamma", "beta alpha gamma", "alpha beta alpha beta",
            "delta alpha beta", "gamma delta epsilon",
        ])
        queries = {0: "alpha beta", 1: "gamma delta", 2: "zzz missing"}
        batch = ps.topk_many(queries, 5, round_to=4).collect()
        by_q: dict = {}
        for r in batch:
            by_q.setdefault(r["query_id"], []).append(
                (r["doc_id"], r["score"], r["rank"]))
        for qid, text in queries.items():
            single = [tuple(r) for r in ps.topk(text, 5, round_to=4).collect()]
            got = sorted(by_q.get(qid, []), key=lambda t: t[2])
            assert got == single, text


class TestPhrasePrefix:
    """match_phrase_prefix: last slot = capped prefix expansion."""

    def test_single_expansion_equals_plain_phrase(self, spark, tmp_path):
        # when the prefix expands to exactly one dictionary term, the
        # result must be IDENTICAL to the plain phrase query
        ps = _build(spark, tmp_path, [
            "alpha beta gamma",
            "alpha beta gander",
            "alpha gamma beta",
        ])
        # "gam" expands only to "gamma" / "gan" only to "gander"
        want = [tuple(r) for r in ps.topk("beta gamma", 10,
                                          round_to=4).collect()]
        got = [tuple(r) for r in ps.topk_phrase_prefix(
            "beta gam", 10, round_to=4).collect()]
        assert got == want and len(got) == 1

    def test_expansion_unions_matches(self, spark, tmp_path):
        ps = _build(spark, tmp_path, [
            "send the payment now",      # pay → payment
            "send the payload now",      # pay → payload
            "send the parcel now",       # not a 'pay' prefix
            "payment send the",          # wrong slot order
        ])
        got = ps.topk_phrase_prefix("send the pay", 10, round_to=4).collect()
        assert {r["doc_id"] for r in got} == {0, 1}

    def test_unknown_prefix_matches_nothing(self, spark, tmp_path):
        ps = _build(spark, tmp_path, ["alpha beta gamma"])
        assert ps.topk_phrase_prefix("alpha zz", 10).collect() == []

    def test_expansion_cap_is_df_ordered(self, spark, tmp_path):
        # cap=1 keeps only the highest-df expansion
        ps = _build(spark, tmp_path, [
            "go park now", "go park now", "go parse now",
        ])
        got = ps.topk_phrase_prefix("go par", 10, max_expansions=1,
                                    round_to=4).collect()
        # 'park' (df 2) outranks 'parse' (df 1) for the cap
        assert {r["doc_id"] for r in got} == {0, 1}


class TestSloppyPhrase:
    """match_phrase slop>0 (VERDICT r04 item 3): anchored sloppy
    matching, Lucene 1/(1+matchLength) weight — semantics documented
    in PhraseSearcher.topk."""

    ROWS = [
        "alpha beta gamma",        # exact
        "alpha x beta gamma",      # one gap: m=1 for beta-slot
        "alpha x x beta",          # two gaps
        "beta alpha",              # transposed: m=2
        "alpha delta epsilon",     # beta missing entirely
        "beta x x x x alpha",      # far transposed: m=6
    ]

    def test_slop0_is_exact_bitwise(self, spark, tmp_path):
        ps = _build(spark, tmp_path, self.ROWS)
        exact = [(r["doc_id"], r["score"], r["rank"])
                 for r in ps.topk("alpha beta", 10).collect()]
        sloppy = [(r["doc_id"], r["score"], r["rank"])
                  for r in ps.topk("alpha beta", 10, slop=0).collect()]
        assert exact == sloppy and len(exact) == 1  # only doc 0

    def test_slop_widens_and_transposes(self, spark, tmp_path):
        ps = _build(spark, tmp_path, self.ROWS)
        ids1 = {r["doc_id"] for r in
                ps.topk("alpha beta", 10, slop=1).collect()}
        assert ids1 == {0, 1}                      # gap of 1 admitted
        ids2 = {r["doc_id"] for r in
                ps.topk("alpha beta", 10, slop=2).collect()}
        assert ids2 == {0, 1, 2, 3}                # transposition costs 2
        ids6 = {r["doc_id"] for r in
                ps.topk("alpha beta", 10, slop=6).collect()}
        assert ids6 == {0, 1, 2, 3, 5}

    def test_sloppy_weight_orders_by_displacement(self, spark, tmp_path):
        # same dl for all three docs => ranking is purely the sloppy
        # weight 1/(1+m): exact (m=0) > gap1 (m=1) > gap2 (m=2)
        ps = _build(spark, tmp_path, [
            "alpha beta pad pad",
            "alpha x beta pad",
            "alpha x x beta",
        ])
        got = ps.topk("alpha beta", 10, slop=4).collect()
        assert [r["doc_id"] for r in got] == [0, 1, 2]
        scores = [r["score"] for r in got]
        assert scores[0] > scores[1] > scores[2] > 0

    def test_matches_duckdb_oracle(self, spark, tmp_path):
        import duckdb

        from search_ingest_spark.query.phrase import phrase_oracle_sql

        rows = [
            "alpha beta gamma delta", "beta gamma alpha", "alpha x beta",
            "gamma beta alpha beta", "alpha beta alpha x x beta gamma",
            "x alpha x x gamma beta", "beta beta alpha gamma gamma",
        ]
        ps = _build(spark, tmp_path, rows)
        con = duckdb.connect()
        con.register("documents", __import__("pandas").DataFrame(
            {"doc_id": range(len(rows)), "text": rows}))
        for phrase in ("alpha beta", "alpha beta gamma"):
            for slop in (0, 1, 2, 3):
                got = sorted(
                    tuple(r) for r in
                    ps.topk(phrase, 10, slop=slop, round_to=4).collect())
                want = sorted(tuple(r) for r in con.execute(
                    phrase_oracle_sql(phrase, k=10, slop=slop)).fetchall())
                assert got == want, (phrase, slop, got, want)


class TestSpanNear:
    ROWS = [
        "alpha beta gamma",          # 0: all adjacent, in order
        "gamma x alpha y beta",      # 1: width 5, unordered only at slop>=2
        "beta gamma alpha",          # 2: width 3, out of order
        "alpha x x x x gamma beta",  # 3: wide
        "alpha beta",                # 4: missing gamma
    ]

    def _oracle(self, spark, rows, sql):
        import duckdb

        con = duckdb.connect()
        con.register("documents_src", spark.createDataFrame(
            [(i, t) for i, t in enumerate(rows)],
            "doc_id long, text string").toPandas())
        con.execute("CREATE VIEW documents AS SELECT * FROM documents_src")
        return sorted(tuple(r) for r in con.execute(sql).fetchall())

    def test_matches_oracle_unordered_and_ordered(self, spark, tmp_path):
        from search_ingest_spark.query.phrase import span_near_oracle_sql

        ps = _build(spark, tmp_path, self.ROWS)
        for kw in (dict(slop=2), dict(slop=2, in_order=True),
                   dict(slop=0), dict(slop=4)):
            got = sorted(tuple(r) for r in ps.span_near_topk(
                "alpha beta gamma", 10, round_to=4, **kw).collect())
            want = self._oracle(spark, self.ROWS, span_near_oracle_sql(
                "alpha beta gamma", k=10, **kw))
            assert got == want, kw

    def test_ordered_subset_of_unordered(self, spark, tmp_path):
        ps = _build(spark, tmp_path, self.ROWS)
        uno = {r["doc_id"] for r in ps.span_near_topk(
            "alpha beta gamma", 10, slop=2).collect()}
        ordd = {r["doc_id"] for r in ps.span_near_topk(
            "alpha beta gamma", 10, slop=2, in_order=True).collect()}
        assert ordd <= uno
        assert 0 in ordd          # adjacent in-order doc
        assert 2 in uno - ordd    # out-of-order within window

    def test_slop_monotone(self, spark, tmp_path):
        ps = _build(spark, tmp_path, self.ROWS)
        prev: set = set()
        for slop in (0, 1, 2, 4, 8):
            cur = {r["doc_id"] for r in ps.span_near_topk(
                "alpha beta gamma", 10, slop=slop).collect()}
            assert prev <= cur
            prev = cur
        assert prev == {0, 1, 2, 3}  # doc 4 misses gamma forever

    def test_validation(self, spark, tmp_path):
        ps = _build(spark, tmp_path, self.ROWS)
        with pytest.raises(ValueError, match="distinct"):
            ps.span_near_topk("alpha alpha", 5)
        with pytest.raises(ValueError, match="slop"):
            ps.span_near_topk("alpha beta", 5, slop=-1)
        with pytest.raises(ValueError, match="caps"):
            ps.span_near_topk("a b c d e", 5)

    def test_unknown_term_empty(self, spark, tmp_path):
        ps = _build(spark, tmp_path, self.ROWS)
        assert ps.span_near_topk("alpha zzz", 5).count() == 0
