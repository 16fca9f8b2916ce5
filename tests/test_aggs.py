"""Bucket aggregations, field collapsing, decay scoring, more_like_this
and the term suggester — the round-5 query-DSL surface over the
index-backed hit set (query/aggs.py + the new Searcher methods).

Every test certifies the index path against the brute-force DuckDB
oracle twin (the driver-contract check in miniature) plus the semantic
invariants the oracle alone can't express (pagination stitching,
overlap counting, null-field behavior, seed exclusion).
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from search_ingest_spark.catalog import Catalog
from search_ingest_spark.index import build as ib
from search_ingest_spark.query import aggs, bm25
from search_ingest_spark.query.wand import Searcher

SF = "/root/testdata/sf0.001"
Q = "spark query data"


@pytest.fixture(scope="module")
def built(spark, documents_smoke, tmp_path_factory):
    cat = Catalog(spark, str(tmp_path_factory.mktemp("aggs")))
    # tag/lat/lon: the driver's synthetic nullable + geo attrs (pure
    # doc_id formulas the DuckDB oracles replay on the raw table)
    docs = (
        documents_smoke
        .withColumn("tag", F.when(F.col("doc_id") % 3 == 0,
                                  F.col("source")))
        .withColumn("lat", ((F.col("doc_id") * 7919) % 18000)
                    / F.lit(100.0) - F.lit(90.0))
        .withColumn("lon", ((F.col("doc_id") * 104729) % 36000)
                    / F.lit(100.0) - F.lit(180.0))
    )
    ib.build_index(spark, docs, cat, mode="simple",
                   docs_per_shard=50,
                   attr_cols=["lang", "source", "n_chars", "tag",
                              "lat", "lon"],
                   store_fields=["text"], with_bigrams=True)
    return cat


@pytest.fixture(scope="module")
def searcher(spark, built):
    return Searcher(spark, built)


def _oracle(sql: str):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    return [tuple(r) for r in con.execute(sql).fetchall()]


def _rows(df, *cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


class TestHistogram:
    def test_matches_oracle(self, searcher):
        got = _rows(aggs.histogram_agg(searcher, Q, "n_chars", 100),
                    "bucket_key", "n_docs")
        want = sorted(_oracle(aggs.histogram_oracle_sql(Q, "n_chars", 100)))
        assert got == want and len(got) > 1

    def test_bucket_key_is_floor_multiple(self, searcher):
        for key, _ in _rows(aggs.histogram_agg(searcher, Q, "n_chars", 75),
                            "bucket_key", "n_docs"):
            assert key % 75 == 0

    def test_counts_sum_to_hit_count(self, searcher):
        n_hits = searcher.matching_doc_ids(Q).count()
        total = sum(n for _, n in _rows(
            aggs.histogram_agg(searcher, Q, "n_chars", 100),
            "bucket_key", "n_docs"))
        assert total == n_hits > 0

    def test_bad_interval(self, searcher):
        with pytest.raises(ValueError):
            aggs.histogram_agg(searcher, Q, "n_chars", 0)


class TestRange:
    RANGES = [("short", None, 150.0), ("mid", 150.0, 300.0),
              ("long", 300.0, None)]

    def test_matches_oracle(self, searcher):
        got = _rows(aggs.range_agg(searcher, Q, "n_chars", self.RANGES),
                    "range_key", "n_docs")
        want = sorted(_oracle(
            aggs.range_oracle_sql(Q, "n_chars", self.RANGES)))
        assert got == want and len(got) == 3

    def test_overlapping_ranges_double_count(self, searcher):
        # a doc inside both [0, 1e9) and [150, 300) counts twice
        overlap = [("all", None, None), ("mid", 150.0, 300.0)]
        rows = dict(_rows(aggs.range_agg(searcher, Q, "n_chars", overlap),
                          "range_key", "n_docs"))
        n_hits = searcher.matching_doc_ids(Q).count()
        assert rows["all"] == n_hits
        assert 0 < rows["mid"] < rows["all"]

    def test_empty_range_kept_at_zero(self, searcher):
        rows = dict(_rows(
            aggs.range_agg(searcher, Q, "n_chars",
                           [("none", 1e12, None), ("all", None, None)]),
            "range_key", "n_docs"))
        assert rows["none"] == 0 and rows["all"] > 0

    def test_empty_spec_rejected(self, searcher):
        with pytest.raises(ValueError):
            aggs.range_agg(searcher, Q, "n_chars", [])


class TestFiltersAgg:
    NAMED = {
        "es": {"lang": "es"},
        "long_fr_de": {"lang": ["fr", "de"], "n_chars": {"gte": 300}},
        "nothing": {"lang": "zz"},
    }

    def test_matches_oracle(self, searcher):
        got = _rows(aggs.filters_agg(searcher, Q, self.NAMED),
                    "filter_key", "n_docs")
        want = sorted(_oracle(aggs.filters_oracle_sql(Q, self.NAMED)))
        assert got == want and len(got) == 3

    def test_zero_bucket_kept(self, searcher):
        rows = dict(_rows(aggs.filters_agg(searcher, Q, self.NAMED),
                          "filter_key", "n_docs"))
        assert rows["nothing"] == 0
        assert rows["es"] > 0

    def test_empty_spec_rejected(self, searcher):
        with pytest.raises(ValueError):
            aggs.filters_agg(searcher, Q, {})


class TestComposite:
    SRC = ["source", "lang"]

    def test_matches_oracle(self, searcher):
        got = _rows(aggs.composite_agg(searcher, Q, self.SRC, 7,
                                       after=("src12", "es")),
                    "source", "lang", "n_docs")
        want = sorted(_oracle(aggs.composite_oracle_sql(
            Q, self.SRC, 7, after=("src12", "es"))))
        assert got == want and len(got) == 7

    def test_pages_stitch_to_full_listing(self, searcher):
        full = [tuple(r) for r in aggs.composite_agg(
            searcher, Q, self.SRC, 10**6).collect()]
        assert len(full) > 5
        # walk pages of 3 resuming from each page's last key
        pages, after = [], None
        while True:
            page = [tuple(r) for r in aggs.composite_agg(
                searcher, Q, self.SRC, 3, after=after).collect()]
            if not page:
                break
            pages.extend(page)
            after = tuple(page[-1][:2])
        assert pages == full

    def test_after_arity_checked(self, searcher):
        with pytest.raises(ValueError):
            aggs.composite_agg(searcher, Q, self.SRC, 3, after=("x",))


class TestAdjacencyMatrix:
    NAMED = {
        "es": {"lang": "es"},
        "long": {"n_chars": {"gte": 300}},
        "none": {"lang": "zz"},
    }

    def test_matches_oracle(self, searcher):
        got = _rows(aggs.adjacency_matrix_agg(searcher, Q, self.NAMED),
                    "key", "n_docs")
        want = sorted(_oracle(
            aggs.adjacency_matrix_oracle_sql(Q, self.NAMED)))
        assert got == want and len(got) > 0

    def test_empty_cells_omitted(self, searcher):
        keys = {k for k, _ in _rows(
            aggs.adjacency_matrix_agg(searcher, Q, self.NAMED),
            "key", "n_docs")}
        # 'none' matches nothing → neither its single nor any pair
        # containing it may appear
        assert not any("none" in k for k in keys)
        assert "es" in keys and "long" in keys

    def test_pair_bounded_by_singles(self, searcher):
        rows = dict(_rows(
            aggs.adjacency_matrix_agg(searcher, Q, self.NAMED),
            "key", "n_docs"))
        if "es&long" in rows:
            assert rows["es&long"] <= min(rows["es"], rows["long"])

    def test_empty_spec_rejected(self, searcher):
        with pytest.raises(ValueError):
            aggs.adjacency_matrix_agg(searcher, Q, {})


class TestExplain:
    def test_matches_oracle(self, searcher):
        # doc 3 at sf0.001 must contain ≥1 query term for a useful
        # check; find one from the hit set deterministically
        doc = searcher.matching_doc_ids(Q).orderBy("doc_id").first()[0]
        got = _rows(searcher.explain(Q, doc),
                    "term", "tf", "dl", "df", "idf", "partial")
        want = sorted(_oracle(bm25.explain_oracle_sql(Q, doc)))
        assert got == want and len(got) >= 1

    def test_partials_sum_to_doc_score(self, searcher):
        doc = searcher.matching_doc_ids(Q).orderBy("doc_id").first()[0]
        partials = [r["partial"] for r in searcher.explain(Q, doc).collect()]
        score = (searcher.all_matching_scores(Q, round_to=4)
                 .where(F.col("doc_id") == doc).first()["score"])
        assert abs(sum(partials) - score) <= len(partials) * 1e-4

    def test_unmatched_doc_empty(self, searcher, documents_smoke):
        n = documents_smoke.count()
        assert searcher.explain(Q, n + 10**6).count() == 0

    def test_unknown_terms_empty(self, searcher):
        assert searcher.explain("zzzqqq", 0).count() == 0

    def test_local_serving_parity(self, searcher, built):
        from search_ingest_spark.query.reader import LocalSearcher

        doc = searcher.matching_doc_ids(Q).orderBy("doc_id").first()[0]
        spark_rows = sorted(tuple(r) for r in
                            searcher.explain(Q, doc).collect())
        local_rows = sorted(LocalSearcher(built).explain(Q, doc))
        assert spark_rows == local_rows and len(local_rows) >= 1


class TestCollapse:
    def test_matches_oracle(self, searcher):
        got = [tuple(r) for r in aggs.collapse_topk(
            searcher, Q, "source", 8, round_to=4).collect()]
        want = _oracle(aggs.collapse_oracle_sql(Q, "source", k=8))
        assert got == want and len(got) == 8

    def test_collapse_field_unique(self, searcher):
        vals = [r["source"] for r in aggs.collapse_topk(
            searcher, Q, "source", 8, round_to=4).collect()]
        assert len(vals) == len(set(vals))

    def test_rank_one_is_global_best(self, searcher, built, spark):
        top1 = Searcher(spark, built).topk(Q, 1, round_to=4).collect()[0]
        col1 = aggs.collapse_topk(searcher, Q, "source", 1,
                                  round_to=4).collect()[0]
        assert (col1["doc_id"], col1["score"]) == (
            top1["doc_id"], top1["score"])


class TestDecay:
    def test_matches_oracle_all_shapes(self, searcher):
        for shape in ("gauss", "exp", "linear"):
            got = [tuple(r) for r in searcher.decay_score_topk(
                Q, "n_chars", 10, origin=300.0, scale=100.0, offset=25.0,
                decay=0.5, shape=shape, round_to=4).collect()]
            want = _oracle(bm25.decay_oracle_sql(
                Q, "n_chars", k=10, origin=300.0, scale=100.0,
                offset=25.0, decay=0.5, shape=shape))
            assert got == want and len(got) == 10, shape

    def test_inside_offset_keeps_score(self, searcher, spark, built):
        # huge offset → every doc inside → multiplier 1.0 → plain topk
        base = [tuple(r) for r in Searcher(spark, built).topk(
            Q, 10, round_to=4).collect()]
        dec = [tuple(r) for r in searcher.decay_score_topk(
            Q, "n_chars", 10, origin=0.0, scale=1.0, offset=1e12,
            decay=0.5, shape="gauss", round_to=4).collect()]
        assert dec == base

    def test_validation(self, searcher):
        with pytest.raises(ValueError):
            searcher.decay_score_topk(Q, "n_chars", 5, origin=0, scale=1,
                                      decay=1.5)
        with pytest.raises(ValueError):
            searcher.decay_score_topk(Q, "n_chars", 5, origin=0, scale=-1,
                                      decay=0.5)
        with pytest.raises(ValueError):
            searcher.decay_score_topk(Q, "n_chars", 5, origin=0, scale=1,
                                      decay=0.5, shape="triangle")


class TestMoreLikeThis:
    def test_matches_oracle(self, searcher):
        got = [tuple(r) for r in searcher.more_like_this_topk(
            42, 10, max_query_terms=5, round_to=4).collect()]
        want = _oracle(bm25.mlt_oracle_sql(42, k=10, max_query_terms=5))
        assert got == want and len(got) == 10

    def test_seed_excluded(self, searcher):
        ids = {r["doc_id"] for r in searcher.more_like_this_topk(
            7, 20, max_query_terms=8, round_to=4).collect()}
        assert 7 not in ids and ids

    def test_missing_seed(self, searcher):
        with pytest.raises(ValueError):
            searcher.more_like_this_topk(10**12, 5)


class TestPipelineAggs:
    @pytest.fixture(scope="class")
    def buckets(self, spark):
        ev = spark.read.parquet(f"{SF}/events.parquet")
        return (ev.where(F.col("event_type") == "click")
                .groupBy(F.to_date("ts").alias("day"))
                .agg(F.count("*").alias("n_events")))

    def test_derivative_cumsum_invariants(self, buckets):
        rows = (aggs.derivative_cumsum(buckets, "day", "n_events")
                .orderBy("day").collect())
        assert rows[0]["deriv"] is None  # ES omits the first derivative
        run = 0
        prev = None
        for r in rows:
            run += r["n_events"]
            assert r["cumsum"] == run
            if prev is not None:
                assert r["deriv"] == r["n_events"] - prev
            prev = r["n_events"]

    def test_moving_avg_window(self, buckets):
        rows = (aggs.moving_metric(buckets, "day", "n_events", window=3)
                .orderBy("day").collect())
        # first bucket: avg of itself; third onward: trailing 3
        assert rows[0]["mavg"] == float(rows[0]["n_events"])
        vals = [r["n_events"] for r in rows]
        want = round(sum(vals[0:3]) / 3.0, 4)
        assert abs(rows[2]["mavg"] - want) < 1e-9

    def test_moving_bad_window(self, buckets):
        with pytest.raises(ValueError):
            aggs.moving_metric(buckets, "day", "n_events", window=0)

    def test_bucket_selector_sort(self, buckets):
        full = {r["day"]: r["n_events"] for r in buckets.collect()}
        rows = aggs.bucket_selector_sort(
            buckets, "day", "n_events", min_value=5.0, size=4).collect()
        assert len(rows) == 4
        got = [r["n_events"] for r in rows]
        assert got == sorted(full.values(), reverse=True)[:4]
        assert all(v > 5.0 for v in got)


class TestWeightedAvg:
    def test_matches_oracle(self, searcher):
        got = _rows(aggs.weighted_avg(searcher, Q, "n_chars",
                                      "(doc_id % 7 + 1)"),
                    "weighted_avg", "n_docs")
        want = sorted(_oracle(aggs.weighted_avg_oracle_sql(
            Q, "n_chars", "(doc_id % 7 + 1)")))
        assert got == want and got[0][1] > 0

    def test_unit_weight_is_plain_avg(self, searcher):
        wavg = aggs.weighted_avg(searcher, Q, "n_chars",
                                 "1").collect()[0]
        df = aggs.histogram_agg(searcher, Q, "n_chars", 1)
        total = sum(r["bucket_key"] * r["n_docs"] for r in df.collect())
        n = searcher.matching_doc_ids(Q).count()
        assert abs(wavg["weighted_avg"] - round(total / n, 4)) < 1e-9
        assert wavg["n_docs"] == n


class TestSampler:
    def test_sample_size_bounds_subagg(self, searcher):
        rows = aggs.sampler_terms(searcher, Q, "lang",
                                  shard_size=25).collect()
        assert sum(r["n_docs"] for r in rows) == 25

    def test_sample_larger_than_hits_is_full_set(self, searcher):
        n_hits = searcher.matching_doc_ids(Q).count()
        rows = aggs.sampler_terms(searcher, Q, "lang",
                                  shard_size=10**6).collect()
        assert sum(r["n_docs"] for r in rows) == n_hits

    def test_diversified_caps_per_value(self, searcher):
        # diversity field == agg field → every bucket count ≤ cap
        rows = aggs.sampler_terms(
            searcher, Q, "source", shard_size=10**6,
            max_per_value=("source", 2)).collect()
        assert rows and all(r["n_docs"] <= 2 for r in rows)

    def test_matches_oracle_smoke(self, searcher):
        got = _rows(aggs.sampler_terms(searcher, Q, "lang",
                                       shard_size=40),
                    "value", "n_docs")
        want = sorted(_oracle(aggs.sampler_terms_oracle_sql(
            Q, "lang", shard_size=40)))
        assert got == want and len(got) > 0

    def test_diversified_matches_oracle(self, searcher):
        got = _rows(aggs.sampler_terms(
            searcher, Q, "lang", shard_size=20,
            max_per_value=("source", 2)), "value", "n_docs")
        want = sorted(_oracle(aggs.sampler_terms_oracle_sql(
            Q, "lang", shard_size=20, max_per_value=("source", 2))))
        assert got == want and len(got) > 0


class TestPhraseSuggest:
    def test_matches_oracle(self, searcher):
        got = _rows(searcher.suggest_phrases("sparc datq", max_edits=1,
                                             per_token=3, size=3),
                    "suggestion", "score", "rank")
        want = sorted(_oracle(bm25.phrase_suggest_oracle_sql(
            "sparc datq", max_edits=1, per_token=3, size=3)))
        assert got == want and len(got) >= 1

    def test_corrects_to_spark_data(self, searcher):
        top = searcher.suggest_phrases("sparc datq", max_edits=1,
                                       per_token=3, size=1).collect()
        assert top[0]["suggestion"] == "spark data"

    def test_wider_candidates_match_oracle(self, searcher):
        got = _rows(searcher.suggest_phrases(
            "dat mart quary", max_edits=2, per_token=4, size=5),
            "suggestion", "score", "rank")
        want = sorted(_oracle(bm25.phrase_suggest_oracle_sql(
            "dat mart quary", max_edits=2, per_token=4, size=5)))
        assert got == want and len(got) >= 1

    def test_single_token(self, searcher):
        got = _rows(searcher.suggest_phrases("sparc", max_edits=1,
                                             per_token=3, size=3),
                    "suggestion", "score", "rank")
        want = sorted(_oracle(bm25.phrase_suggest_oracle_sql(
            "sparc", max_edits=1, per_token=3, size=3)))
        assert got == want and len(got) >= 1

    def test_requires_bigram_table(self, spark, documents_smoke,
                                   tmp_path_factory):
        from search_ingest_spark.query.wand import Searcher
        cat = Catalog(spark, str(tmp_path_factory.mktemp("nobig")))
        ib.build_index(spark, documents_smoke, cat, mode="simple",
                       docs_per_shard=50)
        with pytest.raises(ValueError, match="with_bigrams"):
            Searcher(spark, cat).suggest_phrases("sparc datq")

    def test_too_many_tokens_rejected(self, searcher):
        with pytest.raises(ValueError, match="8 tokens"):
            searcher.suggest_phrases("a b c d e f g h i")

    def test_bigram_kernel_counts(self):
        import pandas as pd

        from search_ingest_spark.analysis import doc_bigrams_pandas

        batch = pd.DataFrame({"text": [
            "spark data spark data", "data spark", None, ""]})
        out = pd.concat(list(doc_bigrams_pandas(
            iter([batch]), text_col="text", mode="simple")))
        got = {(r.w1, r.w2): r.cnt for r in out.itertuples()}
        assert got == {("spark", "data"): 2, ("data", "spark"): 2}

    def test_bigram_kernel_skips_stacked_tokens(self):
        import pandas as pd

        from search_ingest_spark.analysis import doc_bigrams_pandas

        batch = pd.DataFrame({"text": ["café au lait"]})
        out = pd.concat(list(doc_bigrams_pandas(
            iter([batch]), text_col="text", mode="standard")))
        got = {(r.w1, r.w2): r.cnt for r in out.itertuples()}
        # one token per position: (cafe, au), (au, lait) — never the
        # stacked (cafe, café) emission artifact
        assert got == {("cafe", "au"): 1, ("au", "lait"): 1}


class TestSuggestTerms:
    def test_matches_oracle(self, searcher):
        got = _rows(searcher.suggest_terms("sparc datq", max_edits=1,
                                           size=3),
                    "token", "suggestion", "df", "distance", "rank")
        want = sorted(_oracle(bm25.term_suggest_oracle_sql(
            "sparc datq", max_edits=1, size=3)))
        assert got == want and len(got) > 0

    def test_exact_token_not_suggested_for_itself(self, searcher):
        # 'spark' IS a dictionary term; its only ≤2-edit neighbor in the
        # sf0.001 vocabulary is 'part' — the token itself must not
        # appear even though its own edit distance (0) is minimal
        rows = searcher.suggest_terms("spark", max_edits=2,
                                      size=10).collect()
        assert rows and all(r["suggestion"] != "spark" for r in rows)

    def test_empty_text(self, searcher):
        assert searcher.suggest_terms("!!!", size=3).count() == 0


_TAG_SQL = "CASE WHEN doc_id % 3 = 0 THEN source END"
_LAT_SQL = "((doc_id * 7919) % 18000) / 100.0 - 90.0"
_LON_SQL = "((doc_id * 104729) % 36000) / 100.0 - 180.0"


class TestTopMetrics:
    def test_matches_oracle(self, searcher):
        got = _rows(aggs.top_metrics(searcher, Q, "n_chars",
                                     ["lang", "source"], 3),
                    "doc_id", "n_chars", "lang", "source")
        want = sorted(_oracle(aggs.top_metrics_oracle_sql(
            Q, "n_chars", ["lang", "source"], size=3)))
        assert got == want and len(got) == 3

    def test_ascending_returns_smallest(self, searcher):
        hi = aggs.top_metrics(searcher, Q, "n_chars", ["lang"], 1)
        lo = aggs.top_metrics(searcher, Q, "n_chars", ["lang"], 1,
                              ascending=True)
        assert hi.collect()[0]["n_chars"] > lo.collect()[0]["n_chars"]

    def test_sort_field_in_metrics_not_duplicated(self, searcher):
        df = aggs.top_metrics(searcher, Q, "n_chars",
                              ["n_chars", "lang"], 2)
        assert df.columns == ["doc_id", "n_chars", "lang"]


class TestExtendedStats:
    def test_matches_oracle(self, searcher):
        cols = ["n_docs", "min_v", "max_v", "sum_v", "sum_sq",
                "avg_v", "variance", "std_dev"]
        got = _rows(aggs.extended_stats(searcher, Q, "n_chars"), *cols)
        want = sorted(_oracle(
            aggs.extended_stats_oracle_sql(Q, "n_chars")))
        assert got == want

    def test_internal_consistency(self, searcher):
        r = aggs.extended_stats(searcher, Q, "n_chars").collect()[0]
        assert r["n_docs"] == searcher.matching_doc_ids(Q).count()
        assert r["min_v"] <= r["avg_v"] <= r["max_v"]
        assert r["variance"] >= 0
        assert abs(r["std_dev"] ** 2 - r["variance"]) < 1e-2


class TestStringStats:
    def test_matches_oracle(self, searcher):
        cols = ["n_values", "min_len", "max_len", "avg_len", "entropy"]
        got = _rows(aggs.string_stats(searcher, Q, "source"), *cols)
        want = sorted(_oracle(aggs.string_stats_oracle_sql(Q, "source")))
        assert got == want

    def test_entropy_bounds(self, searcher):
        import math

        r = aggs.string_stats(searcher, Q, "source").collect()[0]
        # alphabet of srcN strings is at most 13 chars (s r c 0-9)
        assert 0.0 < r["entropy"] <= math.log2(13) + 1e-9
        assert r["min_len"] <= r["avg_len"] <= r["max_len"]


class TestMissingAgg:
    def test_matches_oracle(self, searcher):
        got = _rows(aggs.missing_agg(searcher, Q, "tag"),
                    "n_missing", "n_docs")
        want = sorted(_oracle(aggs.missing_oracle_sql(Q, _TAG_SQL)))
        assert got == want

    def test_missing_plus_present_is_total(self, searcher):
        r = aggs.missing_agg(searcher, Q, "tag").collect()[0]
        present = sum(
            n for _, n in _rows(aggs.rare_terms(searcher, Q, "tag", 10**9),
                                "value", "n_docs"))
        assert 0 < r["n_missing"] < r["n_docs"]
        assert r["n_missing"] + present == r["n_docs"]


class TestRareTerms:
    def test_matches_oracle(self, searcher):
        # per-tag hit counts at sf0.001 sit at 8-9 (doc_id%3 gate over
        # 25-doc sources) — cutoff 8 keeps a strict subset
        got = _rows(aggs.rare_terms(searcher, Q, "tag", 8),
                    "value", "n_docs")
        want = sorted(_oracle(aggs.rare_terms_oracle_sql(Q, _TAG_SQL, 8)))
        assert got == want and len(got) > 0

    def test_cutoff_respected_and_monotone(self, searcher):
        small = _rows(aggs.rare_terms(searcher, Q, "tag", 8),
                      "value", "n_docs")
        big = _rows(aggs.rare_terms(searcher, Q, "tag", 9),
                    "value", "n_docs")
        assert all(n <= 8 for _, n in small)
        assert set(small) <= set(big) and len(small) < len(big)

    def test_bad_cutoff(self, searcher):
        with pytest.raises(ValueError):
            aggs.rare_terms(searcher, Q, "tag", 0)


class TestGeoDistanceRings:
    EDGES = [3000.0, 8000.0, 15000.0]

    def test_matches_oracle(self, searcher):
        got = _rows(aggs.geo_distance_agg(searcher, Q, 48.85, 2.35,
                                          self.EDGES),
                    "ring_key", "n_docs")
        want = sorted(_oracle(aggs.geo_distance_oracle_sql(
            Q, 48.85, 2.35, self.EDGES, lat_sql=_LAT_SQL,
            lon_sql=_LON_SQL)))
        assert got == want

    def test_rings_partition_hits(self, searcher):
        rows = _rows(aggs.geo_distance_agg(searcher, Q, 48.85, 2.35,
                                           self.EDGES),
                     "ring_key", "n_docs")
        # rings are disjoint and exhaustive: counts sum to the hit count
        assert len(rows) == len(self.EDGES) + 1
        assert (sum(n for _, n in rows)
                == searcher.matching_doc_ids(Q).count())

    def test_bad_edges(self, searcher):
        with pytest.raises(ValueError):
            aggs.geo_distance_agg(searcher, Q, 0.0, 0.0, [500.0, 100.0])
        with pytest.raises(ValueError):
            aggs.geo_distance_agg(searcher, Q, 0.0, 0.0, [])


class TestPercentileRanks:
    def test_matches_oracle(self, searcher):
        got = _rows(aggs.percentile_ranks(searcher, Q, "n_chars",
                                          [150.0, 300.0, 450.0]),
                    "threshold", "pct_rank")
        want = sorted(_oracle(aggs.percentile_ranks_oracle_sql(
            Q, "n_chars", [150.0, 300.0, 450.0])))
        assert got == want and len(got) == 3

    def test_monotone_and_bounded(self, searcher):
        rows = _rows(aggs.percentile_ranks(searcher, Q, "n_chars",
                                           [100.0, 200.0, 400.0, 1e9]),
                     "threshold", "pct_rank")
        ranks = [r for _, r in rows]
        assert ranks == sorted(ranks)
        assert all(0.0 <= r <= 100.0 for r in ranks)
        assert ranks[-1] == 100.0  # everything is ≤ 1e9

    def test_empty_thresholds_rejected(self, searcher):
        with pytest.raises(ValueError):
            aggs.percentile_ranks(searcher, Q, "n_chars", [])


class TestMatchCount:
    def test_matches_oracle(self, searcher):
        got = _rows(aggs.match_count(searcher, Q), "n_hits")
        want = sorted(_oracle(aggs.match_count_oracle_sql(Q)))
        assert got == want

    def test_equals_hit_set_count(self, searcher):
        n = aggs.match_count(searcher, Q).collect()[0]["n_hits"]
        assert n == searcher.matching_doc_ids(Q).count() > 0


class TestTermvectors:
    def test_matches_oracle(self, searcher):
        got = _rows(searcher.termvectors(7), "term", "tf", "df")
        want = sorted(_oracle("""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, count(*)::INT AS tf FROM toks GROUP BY 1, 2),
vocab AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM toks
          GROUP BY 1)
SELECT tf.term, tf.tf, vocab.df FROM tf JOIN vocab USING (term)
WHERE tf.doc_id = 7"""))
        assert got == want and len(got) > 3

    def test_local_matches_spark_path(self, spark, searcher, built):
        from search_ingest_spark.query.reader import LocalSearcher

        ls = LocalSearcher(built)
        for d in (0, 7, 42):
            spark_side = sorted(tuple(r) for r in
                                searcher.termvectors(d).collect())
            assert sorted(ls.termvectors(d)) == spark_side, d

    def test_tf_sums_to_dl(self, searcher, built):
        # Σ tf over the doc's termvector = the doc's length in doc_lens
        from search_ingest_spark.index import build as ib2

        tv = searcher.termvectors(11).collect()
        dl = (searcher.cat.read(ib2.DOC_LENS_TABLE)
              .where(F.col("doc_id") == 11).collect()[0]["dl"])
        assert sum(r["tf"] for r in tv) == dl

    def test_missing_doc_rejected(self, searcher):
        with pytest.raises(ValueError, match="not found"):
            searcher.termvectors(10**9)


class TestAutoDateHistogram:
    def _events(self, spark):
        return spark.read.parquet(f"{SF}/events.parquet").select("ts")

    def _oracle_ev(self, sql):
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{SF}/events.parquet')"
        )
        return sorted(tuple(r) for r in con.execute(sql).fetchall())

    def test_matches_oracle(self, spark):
        got = _rows(aggs.auto_date_histogram(self._events(spark), 40),
                    "bucket_start_epoch", "n_events", "interval_sec")
        want = self._oracle_ev(aggs.auto_date_histogram_oracle_sql(
            "SELECT ts FROM events", 40))
        assert got == want and len(got) > 1

    def test_interval_shrinks_with_bigger_target(self, spark):
        ev = self._events(spark)
        coarse = aggs.auto_date_histogram(ev, 10).collect()
        fine = aggs.auto_date_histogram(ev, 500).collect()
        assert fine[0]["interval_sec"] < coarse[0]["interval_sec"]
        assert len(fine) > len(coarse)

    def test_bucket_count_fits_target(self, spark):
        for target in (5, 40, 200):
            rows = aggs.auto_date_histogram(self._events(spark),
                                            target).collect()
            assert 1 <= len(rows) <= target
            # keys are aligned multiples of the chosen interval
            iv = rows[0]["interval_sec"]
            assert all(r["bucket_start_epoch"] % iv == 0 for r in rows)

    def test_counts_sum_to_total(self, spark):
        ev = self._events(spark)
        rows = aggs.auto_date_histogram(ev, 40).collect()
        assert sum(r["n_events"] for r in rows) == ev.count()

    def test_bad_target(self, spark):
        with pytest.raises(ValueError):
            aggs.auto_date_histogram(self._events(spark), 0)


class TestCalendarHistogram:
    """date_histogram calendar_interval (B88) + the calendar-extended
    auto_date_histogram ladder (B84)."""

    def _events(self, spark):
        return spark.read.parquet(f"{SF}/events.parquet").select("ts")

    def _oracle_ev(self, sql):
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{SF}/events.parquet')"
        )
        return sorted(tuple(r) for r in con.execute(sql).fetchall())

    @pytest.mark.parametrize("unit", ["week", "month", "quarter", "year"])
    def test_units_match_oracle(self, spark, unit):
        got = _rows(aggs.calendar_histogram(self._events(spark), unit),
                    "bucket_start", "n_events")
        want = self._oracle_ev(aggs.calendar_histogram_oracle_sql(
            "SELECT ts FROM events", unit))
        assert got == want and len(got) >= 1

    def test_week_is_iso_monday(self, spark):
        rows = aggs.calendar_histogram(self._events(spark),
                                       "week").collect()
        assert all(r["bucket_start"].isoweekday() == 1 for r in rows)

    def test_bad_unit(self, spark):
        with pytest.raises(ValueError):
            aggs.calendar_histogram(self._events(spark), "fortnight")

    # -- the calendar rungs of the auto ladder -------------------------------

    def _wide_events(self, spark, n_days: int, step_days: int = 1):
        # deterministic synthetic span: one event per `step_days` from
        # 2020-01-01 — wide enough to overflow every fixed rung
        return spark.range(n_days // step_days).select(
            (F.lit("2020-01-01 00:00:00").cast("timestamp")
             + F.make_interval(days=F.col("id") * step_days)).alias("ts"))

    def _wide_oracle(self, spark, df, sql):
        con = duckdb.connect()
        pdf = df.toPandas()
        con.register("events", pdf)
        return sorted(tuple(r) for r in con.execute(sql).fetchall())

    def test_auto_calendar_picks_fixed_when_it_fits(self, spark):
        rows = aggs.auto_date_histogram_calendar(
            self._events(spark), 40).collect()
        assert rows[0]["interval"] == "86400s"

    @pytest.mark.parametrize("n_days,target,unit", [
        (90, 4, "month"),       # 3 months fit, 7d rung (13) doesn't
        (360, 5, "quarter"),    # 12 months > 5, 4 quarters fit
        (1100, 4, "year"),      # ~36 months, 13 quarters > 4, 4 years fit
        (4000, 3, "year"),      # 11 years: nothing fits → degrades to year
    ])
    def test_auto_calendar_rungs(self, spark, n_days, target, unit):
        ev = self._wide_events(spark, n_days, step_days=5)
        got = _rows(aggs.auto_date_histogram_calendar(ev, target),
                    "bucket_start_epoch", "n_events", "interval")
        want = self._wide_oracle(spark, ev,
                                 aggs.auto_date_histogram_calendar_oracle_sql(
                                     "SELECT ts FROM events", target))
        assert got == want
        assert got[0][2] == f"1{unit}"
        assert sum(r[1] for r in got) == ev.count()


class TestRandomScore:
    def test_matches_oracle(self, searcher):
        got = _rows(searcher.random_score_topk(Q, "r5seed", 10),
                    "doc_id", "score", "rank")
        want = sorted(_oracle(f"""
WITH {aggs.hits_cte(Q)}
SELECT doc_id, score,
       row_number() OVER (ORDER BY score DESC, doc_id ASC)::INT AS rank
FROM (
  SELECT doc_id,
         round(('0x' || substr(md5('r5seed:' || doc_id::VARCHAR), 1, 15))
               ::BIGINT::DOUBLE / {float(1 << 60)!r}, 6)::DOUBLE AS score
  FROM hits ORDER BY score DESC, doc_id ASC LIMIT 10
)"""))
        assert got == want and len(got) == 10

    def test_same_seed_reproduces(self, searcher):
        a = _rows(searcher.random_score_topk(Q, "s1", 10),
                  "doc_id", "rank")
        b = _rows(searcher.random_score_topk(Q, "s1", 10),
                  "doc_id", "rank")
        assert a == b

    def test_different_seed_reorders(self, searcher):
        # two 20-doc samples of a ~480-doc hit set: identical sets
        # would mean the seed is ignored
        a = set(_rows(searcher.random_score_topk(Q, "s1", 20), "doc_id"))
        b = set(_rows(searcher.random_score_topk(Q, "s2", 20), "doc_id"))
        assert a != b

    def test_scores_in_unit_interval(self, searcher):
        for r in searcher.random_score_topk(Q, "s1", 50).collect():
            assert 0.0 <= r["score"] < 1.0

    def test_only_matching_docs_sampled(self, searcher):
        hits = {r["doc_id"] for r in
                searcher.matching_doc_ids("customer window batch")
                .collect()}
        got = {r["doc_id"] for r in searcher.random_score_topk(
            "customer window batch", "s1", 10**6).collect()}
        assert got == hits


class TestGeotileGrid:
    def test_matches_oracle(self, searcher):
        got = _rows(aggs.geotile_grid_agg(searcher, Q, 3),
                    "tile_key", "n_docs")
        want = sorted(_oracle(aggs.geotile_grid_oracle_sql(
            Q, 3, lat_sql=_LAT_SQL, lon_sql=_LON_SQL)))
        assert got == want and len(got) > 4

    def test_counts_sum_to_hits_and_keys_valid(self, searcher):
        rows = _rows(aggs.geotile_grid_agg(searcher, Q, 2),
                     "tile_key", "n_docs")
        assert (sum(n for _, n in rows)
                == searcher.matching_doc_ids(Q).count())
        for key, _ in rows:
            z, x, y = key.split("/")
            assert z == "2" and 0 <= int(x) < 4 and 0 <= int(y) < 4

    def test_zoom_zero_is_one_tile(self, searcher):
        rows = _rows(aggs.geotile_grid_agg(searcher, Q, 0),
                     "tile_key", "n_docs")
        assert [k for k, _ in rows] == ["0/0/0"]

    def test_finer_zoom_refines(self, searcher):
        coarse = _rows(aggs.geotile_grid_agg(searcher, Q, 2),
                       "tile_key", "n_docs")
        fine = _rows(aggs.geotile_grid_agg(searcher, Q, 4),
                     "tile_key", "n_docs")
        assert len(fine) > len(coarse)

    def test_bad_zoom(self, searcher):
        with pytest.raises(ValueError):
            aggs.geotile_grid_agg(searcher, Q, 30)
