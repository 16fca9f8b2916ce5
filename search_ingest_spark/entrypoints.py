"""Driver-facing query registry: every implemented operator from
SURVEY.md §2 exposed as (spark, sf_dir) → DataFrame, each with a DuckDB
oracle SQL string (identical column names/types).  Every registered
entry carries an oracle — approximate operators (LSH/SimHash/IVF/PQ)
are made deterministic by pinning their centroids/codebooks/seeds, so
the driver value-hashes all of them; rows-only checks are extinct.

Conventions that keep the driver's value-hash comparison exact:
- every computed column is aliased identically on both sides;
- floating-point aggregates are rounded (4dp) on both sides;
- ties are broken on a unique key AFTER rounding so ranks/limits agree;
- no array/struct columns in driver-facing outputs (flattened).
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from search_ingest_spark.ops import (decontam, dedup, rollup as rollup_mod,
                                     similarity, textstats, urls)
from search_ingest_spark.query import bm25, significant
from search_ingest_spark.query import msearch as msearch_mod

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE_SQL: dict[str, str] = {}


def register(name: str, sql: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLE_SQL[name] = sql
        return fn

    return deco


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    return QUERIES["bm25_wand_topk_multi"](spark, sf_dir)


# ---------------------------------------------------------------------------
# B7/B8 — BM25 top-k: brute-force DataFrame path AND the compressed-index
# block-max WAND path, both against the same SQL oracle.
# ---------------------------------------------------------------------------

_BM25_QUERIES = {
    "bm25_topk_single": "data",
    "bm25_topk_multi": "spark query data",
    "bm25_topk_rare": "customer window batch",
}

for _name, _qtext in _BM25_QUERIES.items():

    def _mk(qtext: str):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            return bm25.bm25_brute_force(
                _docs(spark, sf_dir), qtext, k=10, mode="simple", round_to=4
            )

        return run

    QUERIES[_name] = _mk(_qtext)
    ORACLE_SQL[_name] = bm25.bm25_oracle_sql(_qtext, k=10)

_INDEX_CACHE: dict[str, object] = {}

# synthetic geo_point per doc — a deterministic pure-integer derivation
# both engines compute bit-identically (long mod, one double division)
_LAT_SQL = "((doc_id * 7919) % 18000) / 100.0 - 90.0"
_LON_SQL = "((doc_id * 104729) % 36000) / 100.0 - 180.0"


def _docs_with_geo(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    return d.withColumn(
        "lat", ((F.col("doc_id") * 7919) % 18000) / F.lit(100.0) - F.lit(90.0)
    ).withColumn(
        "lon", ((F.col("doc_id") * 104729) % 36000) / F.lit(100.0) - F.lit(180.0)
    ).withColumn(
        # deterministic NULLABLE attr: present on 1/3 of docs — gives
        # the ES `exists` filter something real to select on
        "tag", F.when(F.col("doc_id") % 3 == 0, F.col("source")),
    ).withColumn(
        # deterministic array-of-struct attr — the ES `nested` type
        # (arrays of Hash/NamedTuple map to object in the reference's
        # type table, schemas.cr:247-248).  1-3 elements per doc; k
        # cycles 5 values, v cycles 100 — so plenty of docs carry a
        # k='k2' element AND an in-range v in DIFFERENT elements,
        # which is exactly the case nested-vs-flattened semantics
        # must distinguish.  Pure doc_id formula => the oracle replays
        # it with a DuckDB list comprehension on the raw table.
        "props",
        F.transform(
            F.sequence(F.lit(0), (F.col("doc_id") % 3).cast("int")),
            lambda i: F.struct(
                F.concat(F.lit("k"), ((F.col("doc_id") + i) % 5)
                         .cast("string")).alias("k"),
                ((F.col("doc_id") * 7 + i * 13) % 100).alias("v"),
            ),
        ),
    )


def _index_cat(spark: SparkSession, sf_dir: str):
    """Build (once per sf_dir per process) the compressed index —
    positions, filterable attrs (incl. synthetic geo_point), quantized
    impacts, and the stored-fields doc_store — for the documents table."""
    from search_ingest_spark.catalog import Catalog
    from search_ingest_spark.index.build import build_index

    key = os.path.abspath(sf_dir)
    got = _INDEX_CACHE.get(key)
    if got is None:
        root = tempfile.mkdtemp(prefix="sis_idx_")
        cat = Catalog(spark, root)
        build_index(spark, _docs_with_geo(spark, sf_dir), cat, mode="simple",
                    with_positions=True,
                    attr_cols=["lang", "source", "lat", "lon", "tag",
                               "n_chars", "props"],
                    quantize=True, store_fields=["lang", "source", "text"],
                    with_bigrams=True, sort_field="n_chars")
        got = _INDEX_CACHE[key] = cat
    return got


def _searcher(spark: SparkSession, sf_dir: str):
    from search_ingest_spark.query.wand import Searcher

    key = "searcher:" + os.path.abspath(sf_dir)
    got = _INDEX_CACHE.get(key)
    if got is None:
        got = _INDEX_CACHE[key] = Searcher(spark, _index_cat(spark, sf_dir))
    return got


def _local_searcher(spark: SparkSession, sf_dir: str):
    from search_ingest_spark.query.reader import LocalSearcher

    key = "local:" + os.path.abspath(sf_dir)
    got = _INDEX_CACHE.get(key)
    if got is None:
        got = _INDEX_CACHE[key] = LocalSearcher(_index_cat(spark, sf_dir))
    return got


_WAND_QUERIES = {
    "bm25_wand_topk_single": "data",
    "bm25_wand_topk_multi": "spark query data",
    "bm25_wand_topk_rare": "customer window batch",
}

for _name, _qtext in _WAND_QUERIES.items():

    def _mkw(qtext: str):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            return _searcher(spark, sf_dir).topk(qtext, 10, round_to=4)

        return run

    QUERIES[_name] = _mkw(_qtext)
    ORACLE_SQL[_name] = bm25.bm25_oracle_sql(_qtext, k=10)


# Impact-quantized scoring mode (B8 extension, VERDICT r02 item 3):
# one-byte impacts, exact per-block bounds, scores quantized at build
# time — the oracle models the IDENTICAL quantization from the raw
# corpus, so this is a full rows+schema+hash check of the quantized
# index path end to end (codec → build stage → pruned kernel).
@register(
    "bm25_wand_quantized_topk",
    bm25.bm25_quantized_oracle_sql("spark query data", k=10),
)
def _q_wand_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _searcher(spark, sf_dir).topk_quantized(
        "spark query data", 10, round_to=4
    )


# Same quantized mode served Spark-free (LocalSearcher.topk_quantized —
# bitwise identical to the Spark path, asserted in tests; here it is
# additionally proven against the from-corpus quantization oracle).
@register(
    "bm25_local_quantized_topk",
    bm25.bm25_quantized_oracle_sql("table hash fast", k=10),
)
def _q_local_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    got = _local_searcher(spark, sf_dir).topk_quantized(
        "table hash fast", 10, round_to=4
    )
    return spark.createDataFrame(got, "doc_id long, score double, rank int")


@register(
    "bm25_wand_topk_and",
    bm25.bm25_oracle_sql("spark query data", k=10, match_all=True),
)
def _q_wand_and(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive (AND) top-k: docs must contain every query term."""
    return _searcher(spark, sf_dir).topk(
        "spark query data", 10, round_to=4, match_all=True
    )


@register(
    "bm25_wand_topk_filtered",
    bm25.bm25_oracle_sql("table hash fast", k=10, filter_where="lang = 'es'"),
)
def _q_wand_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter-context bool query on the INDEX path: per-shard postings
    cogrouped with the shard's qualifying doc ids from the doc_attrs
    table (whole-index stats, masked candidates — ES semantics)."""
    return _searcher(spark, sf_dir).topk(
        "table hash fast", 10, round_to=4, attr_filter={"lang": "es"}
    )


# ES minimum_should_match: at least m of the query terms must match —
# the WAND kernel counts distinct matching terms per doc and filters
# after scoring (OR upper bounds stay valid, pruning stays exact).
@register(
    "bm25_topk_min_should_match",
    bm25.bm25_oracle_sql("spark query data table", k=10,
                         min_should_match=2),
)
def _q_min_should_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _searcher(spark, sf_dir).topk(
        "spark query data table", 10, round_to=4, min_match=2
    )


# ES bool must_not on the INDEX path: the excluded terms' postings ride
# the same pruned per-shard scan (no extra job or shuffle); the kernel
# decodes their doc-id runs into a ban set before scoring.  Candidates
# only — df/avgdl untouched, exactly like ES.
@register(
    "bm25_wand_topk_must_not",
    bm25.bm25_oracle_sql("spark query data", k=10,
                         exclude_text="customer table"),
)
def _q_wand_must_not(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _searcher(spark, sf_dir).topk(
        "spark query data", 10, round_to=4, exclude_text="customer table"
    )


# ES search_after cursor: page 2 fetched by the (score, doc_id) sort
# position of page 1's last hit — stateless, depth-independent (page
# 1000 costs the same as page 1).  Because (score desc, doc_id asc) is
# a TOTAL order, cursoring after hit #10 is provably identical to ranks
# 11..20, which is what the oracle computes.
@register(
    "bm25_search_after_page2",
    "SELECT doc_id, score, (rank - 10)::INT AS rank FROM ("
    + bm25.bm25_oracle_sql("spark query data", k=20)
    + ") WHERE rank > 10",
)
def _q_search_after(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _searcher(spark, sf_dir)
    page1 = s.topk("spark query data", 10, round_to=4).collect()
    last = page1[-1]
    return s.topk(
        "spark query data", 10, round_to=4,
        search_after=(float(last["score"]), int(last["doc_id"])),
    )


# ES `terms` filter (match ANY of the listed values) in filter context
# on the index path — the list form of attr_filter.
@register(
    "bm25_terms_filter_topk",
    bm25.bm25_oracle_sql("table hash fast", k=10,
                         filter_where="lang IN ('es', 'fr')"),
)
def _q_terms_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _searcher(spark, sf_dir).topk(
        "table hash fast", 10, round_to=4,
        attr_filter={"lang": ["es", "fr"]},
    )


# ES's canonical composed `bool` request (VERDICT r03 item 2): must
# (AND, scored) + should (additive scoring, minimum_should_match
# counted over should only) + must_not (ban set) + filter (non-scoring
# range context) — all four clause types in ONE pruned scan + ONE
# kernel pass.  The oracle models additive-should explicitly
# (bm25.bool_oracle_sql).
@register(
    "bm25_bool_query_topk",
    bm25.bool_oracle_sql(
        must="data", should="spark query table", must_not="customer",
        filter_where="(((doc_id * 7919) % 18000) / 100.0 - 90.0) >= -60.0",
        minimum_should_match=1, k=10,
    ),
)
def _q_bool_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _searcher(spark, sf_dir).bool_topk(
        must="data", should="spark query table", must_not="customer",
        filter={"lat": {"gte": -60.0}}, minimum_should_match=1,
        k=10, round_to=4,
    )


# ES `range` filter in filter context (VERDICT r03 item 1): gte/lt
# bounds on a numeric doc_attrs column, pushed into the parquet scan
# on BOTH query paths (Catalyst PushedFilters / pyarrow row-group
# pruning).  Composed with a `terms` clause to prove conjunction.
_RANGE_FILTER = {"lang": ["es", "fr", "en"],
                 "lat": {"gte": -10.0, "lt": 40.0}}
_RANGE_WHERE = (f"lang IN ('es', 'fr', 'en') AND ({_LAT_SQL}) >= -10.0"
                f" AND ({_LAT_SQL}) < 40.0")


@register(
    "bm25_range_filter_topk",
    bm25.bm25_oracle_sql("table hash fast", k=10, filter_where=_RANGE_WHERE),
)
def _q_range_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _searcher(spark, sf_dir).topk(
        "table hash fast", 10, round_to=4, attr_filter=_RANGE_FILTER
    )


# Same range filter served Spark-free — LocalSearcher compiles the
# IDENTICAL filter spec to a pyarrow predicate (query/filters.py), so
# this entry proves the serving path against the from-corpus oracle,
# and tests/test_reader.py asserts bitwise parity with the Spark path.
@register(
    "bm25_range_filter_local",
    bm25.bm25_oracle_sql("table hash fast", k=10, filter_where=_RANGE_WHERE),
)
def _q_range_filter_local(spark: SparkSession, sf_dir: str) -> DataFrame:
    got = _local_searcher(spark, sf_dir).topk(
        "table hash fast", 10, round_to=4, attr_filter=_RANGE_FILTER
    )
    return spark.createDataFrame(got, "doc_id long, score double, rank int")


# ES `exists` filter context: the index carries a deterministic
# NULLABLE attr (`tag`, present iff doc_id % 3 == 0 — _docs_with_geo),
# and {"tag": {"exists": True}} compiles to isNotNull / is_valid /
# IS NOT NULL through the shared spec (query/filters.py).  The oracle
# replays the attr's defining predicate on the raw corpus.
_EXISTS_FILTER = {"tag": {"exists": True}}
_EXISTS_WHERE = "(doc_id % 3) = 0"


@register(
    "bm25_exists_filter_topk",
    bm25.bm25_oracle_sql("table hash fast", k=10, filter_where=_EXISTS_WHERE),
)
def _q_exists_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _searcher(spark, sf_dir).topk(
        "table hash fast", 10, round_to=4, attr_filter=_EXISTS_FILTER
    )


@register(
    "bm25_exists_filter_local",
    bm25.bm25_oracle_sql("table hash fast", k=10, filter_where=_EXISTS_WHERE),
)
def _q_exists_filter_local(spark: SparkSession, sf_dir: str) -> DataFrame:
    got = _local_searcher(spark, sf_dir).topk(
        "table hash fast", 10, round_to=4, attr_filter=_EXISTS_FILTER
    )
    return spark.createDataFrame(got, "doc_id long, score double, rank int")


# ES `nested` query (VERDICT r04 item 4): the index carries `props`,
# an array-of-struct attr (the ES nested type); the filter requires ≥1
# ELEMENT satisfying k='k2' AND 20 <= v < 70 — a per-element
# conjunction the flattened columns cannot express.  One spec, three
# compilers (query/filters.py): F.exists on the Spark path, post-scan
# vectorized mask on the serving path, list_filter in SQL.  The oracle
# replays the props formula (_docs_with_geo) as a DuckDB list
# comprehension over the raw corpus.
_NESTED_FILTER = {"nested": {"path": "props",
                             "where": {"k": "k2",
                                       "v": {"gte": 20, "lt": 70}}}}
_NESTED_WHERE = (
    "len([i FOR i IN range(0, (doc_id % 3) + 1) IF "
    "((doc_id + i) % 5) = 2 AND ((doc_id * 7 + i * 13) % 100) >= 20 "
    "AND ((doc_id * 7 + i * 13) % 100) < 70]) > 0"
)


@register(
    "search_nested_filter_topk",
    bm25.bm25_oracle_sql("table hash fast", k=10,
                         filter_where=_NESTED_WHERE),
)
def _q_nested_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _searcher(spark, sf_dir).topk(
        "table hash fast", 10, round_to=4, attr_filter=_NESTED_FILTER
    )


@register(
    "search_nested_filter_local",
    bm25.bm25_oracle_sql("table hash fast", k=10,
                         filter_where=_NESTED_WHERE),
)
def _q_nested_filter_local(spark: SparkSession, sf_dir: str) -> DataFrame:
    got = _local_searcher(spark, sf_dir).topk(
        "table hash fast", 10, round_to=4, attr_filter=_NESTED_FILTER
    )
    return spark.createDataFrame(got, "doc_id long, score double, rank int")


# ES `constant_score`: filter-context-only query, every match scores
# exactly the boost — no BM25.  Filter = lang IN (es, fr) AND the
# synthetic lat range; the oracle replays both predicates on the raw
# corpus (lat is a pure doc_id formula — _docs_with_geo).
_CS_FILTER = {"lang": ["es", "fr"], "lat": {"gte": -30.0, "lt": 30.0}}
_CS_WHERE = ("lang IN ('es', 'fr') AND "
             "(((doc_id * 7919) % 18000) / 100.0 - 90.0) >= -30.0 AND "
             "(((doc_id * 7919) % 18000) / 100.0 - 90.0) < 30.0")
_CS_ORACLE = f"""
SELECT doc_id, 2.5::DOUBLE AS score,
       row_number() OVER (ORDER BY doc_id ASC)::INT AS rank
FROM documents
WHERE {_CS_WHERE}
ORDER BY doc_id ASC
LIMIT 10
""".strip()


@register("search_constant_score", _CS_ORACLE)
def _q_constant_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _searcher(spark, sf_dir).constant_score(_CS_FILTER, 10, boost=2.5)


@register("search_constant_score_local", _CS_ORACLE)
def _q_constant_score_local(spark: SparkSession, sf_dir: str) -> DataFrame:
    got = _local_searcher(spark, sf_dir).constant_score(
        _CS_FILTER, 10, boost=2.5
    )
    return spark.createDataFrame(got, "doc_id long, score double, rank int")


# ES `wildcard` query (VERDICT r03 item 6): dictionary terms matching
# the pattern (`*` any run, `?` one char), literal-prefix-pruned scan,
# capped at max_expansions by (df desc, term asc), scored as OR with
# per-term idf.  The oracle models the identical expansion via LIKE.
@register(
    "bm25_wildcard_topk",
    bm25.wildcard_oracle_sql("d?t*", k=10, max_expansions=8),
)
def _q_wildcard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _searcher(spark, sf_dir).topk_wildcard(
        "d?t*", 10, max_expansions=8, round_to=4
    )


# Same wildcard query served Spark-free (LocalSearcher.plan_wildcard:
# identical range-pruned + regex expansion over the pyarrow dictionary).
@register(
    "bm25_wildcard_local",
    bm25.wildcard_oracle_sql("d?t*", k=10, max_expansions=8),
)
def _q_wildcard_local(spark: SparkSession, sf_dir: str) -> DataFrame:
    got = _local_searcher(spark, sf_dir).topk_wildcard(
        "d?t*", 10, max_expansions=8, round_to=4
    )
    return spark.createDataFrame(got, "doc_id long, score double, rank int")


# ES `regexp` term query (B8 family): anchored full-term regex over the
# dictionary, capped deterministic expansion, OR-scored through the
# unchanged WAND kernel.  Pattern kept in the portable regex subset so
# Spark rlike (Java), the serving path (Python re), and the DuckDB
# oracle (RE2) agree.
@register(
    "bm25_regexp_topk",
    bm25.regexp_oracle_sql("dat[ae]s?", k=10, max_expansions=8),
)
def _q_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _searcher(spark, sf_dir).topk_regexp(
        "dat[ae]s?", 10, max_expansions=8, round_to=4
    )


# Same regexp query served Spark-free.
@register(
    "bm25_regexp_local",
    bm25.regexp_oracle_sql("dat[ae]s?", k=10, max_expansions=8),
)
def _q_regexp_local(spark: SparkSession, sf_dir: str) -> DataFrame:
    got = _local_searcher(spark, sf_dir).topk_regexp(
        "dat[ae]s?", 10, max_expansions=8, round_to=4
    )
    return spark.createDataFrame(got, "doc_id long, score double, rank int")


# Composed bool on the SERVING path — same request as
# bm25_bool_query_topk, Spark-free execution, same oracle.
@register(
    "bm25_bool_query_local",
    bm25.bool_oracle_sql(
        must="data", should="spark query table", must_not="customer",
        filter_where="(((doc_id * 7919) % 18000) / 100.0 - 90.0) >= -60.0",
        minimum_should_match=1, k=10,
    ),
)
def _q_bool_query_local(spark: SparkSession, sf_dir: str) -> DataFrame:
    got = _local_searcher(spark, sf_dir).bool_topk(
        must="data", should="spark query table", must_not="customer",
        filter={"lat": {"gte": -60.0}}, minimum_should_match=1,
        k=10, round_to=4,
    )
    return spark.createDataFrame(got, "doc_id long, score double, rank int")


# ES prefix query: vocabulary terms in [prefix, prefix+1) capped at
# max_expansions by (df desc, term asc) — plan_prefix's deterministic
# rewrite over the term-sorted dictionary — scored as an OR query.
@register(
    "bm25_prefix_topk",
    bm25.prefix_oracle_sql("da", k=10, max_expansions=5),
)
def _q_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _searcher(spark, sf_dir).topk_prefix(
        "da", 10, max_expansions=5, round_to=4
    )


# ES match with fuzziness=1: query terms expand to every dictionary term
# within 1 Levenshtein edit (Searcher.plan_fuzzy — the FST-automaton
# analog is a length-prefiltered scan of the tiny term_dict), then the
# unchanged WAND kernel scores the expanded OR query.  "spork" is a
# 1-edit typo of "spark"; the oracle replays the expansion from the
# corpus vocabulary with DuckDB's levenshtein().
@register(
    "bm25_fuzzy_topk",
    bm25.fuzzy_oracle_sql("spork data", k=10, fuzziness=1),
)
def _q_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _searcher(spark, sf_dir).topk_fuzzy(
        "spork data", 10, fuzziness=1, round_to=4
    )


# ES multi_match type=best_fields over a derived title field (first 60
# chars) boosted 2x and the body: per-field statistics, max-of-fields
# scoring — bm25.multi_match_best_fields.
_MM_FIELDS = [("substring(text, 1, 60)", 2.0), ("text", 1.0)]


@register(
    "bm25_multi_match_best_fields",
    bm25.multi_match_oracle_sql("spark query data", _MM_FIELDS, k=10),
)
def _q_multi_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bm25.multi_match_best_fields(
        _docs(spark, sf_dir), "spark query data", _MM_FIELDS, 10,
        mode="simple", round_to=4,
    )


# ES multi_match type=cross_fields: TERM-centric — a term may match in
# ANY field, statistics blended (df = max over fields), per-(doc, term)
# best field norm; distinguishes docs spreading the query ACROSS fields
# from best_fields' whole-field winner-takes-all.
@register(
    "bm25_multi_match_cross_fields",
    bm25.multi_match_cross_fields_oracle_sql("spark query data",
                                             _MM_FIELDS, k=10),
)
def _q_multi_match_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bm25.multi_match_cross_fields(
        _docs(spark, sf_dir), "spark query data", _MM_FIELDS, 10,
        mode="simple", round_to=4,
    )


# ES multi_match type=most_fields (VERDICT r04 item 5): per-field BM25
# summed across field clauses (bool-should semantics), same per-field
# statistics as best_fields.
@register(
    "bm25_multi_match_most_fields",
    bm25.multi_match_oracle_sql("spark query data", _MM_FIELDS, k=10,
                                mm_type="most_fields"),
)
def _q_multi_match_most(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bm25.multi_match(
        _docs(spark, sf_dir), "spark query data", _MM_FIELDS, 10,
        mode="simple", round_to=4, mm_type="most_fields",
    )


# Generalized dis_max: winner field + tie_breaker × runner-up mass —
# ES's DisjunctionMaxQuery with tie_breaker=0.3 (best_fields is the
# tie_breaker=0 special case).
@register(
    "bm25_dis_max_tie_breaker",
    bm25.multi_match_oracle_sql("spark query data", _MM_FIELDS, k=10,
                                tie_breaker=0.3),
)
def _q_dis_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bm25.multi_match(
        _docs(spark, sf_dir), "spark query data", _MM_FIELDS, 10,
        mode="simple", round_to=4, tie_breaker=0.3,
    )


# ES function_score / field_value_factor (VERDICT r04 item 5): BM25 ×
# ln(1 + n_chars) — longer docs boosted.  Index-backed: rides
# all_matching_scores (pruned postings, full matching set — a top-k of
# unmodified scores is NOT a candidate superset) + the doc_attrs
# n_chars column; the oracle recomputes brute-force from raw text.
@register(
    "search_function_score_topk",
    bm25.function_score_oracle_sql("spark query data", "n_chars", k=10),
)
def _q_function_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _searcher(spark, sf_dir).function_score_topk(
        "spark query data", "n_chars", 10, round_to=4)


# ES `boosting` query: positive matches demoted (score × 0.5), never
# excluded, when they also match the negative query — the soft cousin
# of bool must_not (which stays a hard exclusion, bm25_wand_topk_must_not).
@register(
    "search_boosting_topk",
    bm25.boosting_oracle_sql("spark query data", "slow merge", k=10,
                             negative_boost=0.5),
)
def _q_boosting(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _searcher(spark, sf_dir).boosting_topk(
        "spark query data", "slow merge", 10, negative_boost=0.5,
        round_to=4)


# ES `significant_terms` aggregation (JLH): which terms characterize
# the hit set of a query vs the corpus — index-backed (shard-cogrouped
# postings decode + term_dict df join; query/significant.py), oracle
# re-derives brute-force from raw text.
@register(
    "search_significant_terms",
    significant.significant_terms_oracle_sql("spark query data", k=10),
)
def _q_significant_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    return significant.significant_terms(_searcher(spark, sf_dir),
                                         "spark query data", 10)


# ES `significant_text`: the free-text sibling — re-analyzes the
# STORED text of a bounded top-score sample (sampler contract, one
# doc-range-pruned doc_store read), background stats from the term
# dictionary; filter_duplicate_text exercises the exact-dup guard
# (this corpus genuinely contains duplicate texts — dedup_exact's
# subject).  Oracle replays sample rule, dup filter, re-analysis and
# JLH from raw text.
@register(
    "search_significant_text",
    significant.significant_text_oracle_sql(
        "spark query data", k=10, sample_size=50,
        filter_duplicate_text=True),
)
def _q_significant_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    return significant.significant_text(
        _searcher(spark, sf_dir), "spark query data", 10,
        sample_size=50, filter_duplicate_text=True)


# Index statistics surface (ES _stats / _count analog): corpus counts
# from the stats table + vocabulary size from term_dict, verified
# against a from-corpus recount.
@register(
    "index_stats",
    """
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
  FROM documents
),
dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks GROUP BY 1)
SELECT (SELECT count(*) FROM dl)::BIGINT AS n_docs,
       (SELECT sum(dl) FROM dl)::BIGINT AS sum_dl,
       (SELECT count(DISTINCT term) FROM toks)::BIGINT AS n_terms
""".strip(),
)
def _q_index_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from search_ingest_spark.index import build as ib

    cat = _index_cat(spark, sf_dir)
    st = cat.read(ib.STATS_TABLE).select(
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("sum_dl").cast("long").alias("sum_dl"),
    )
    nt = cat.read(ib.TERM_DICT_TABLE).agg(
        F.count("*").cast("long").alias("n_terms")
    )
    return st.crossJoin(nt)


# geo_distance filter-context query (ES geo_distance, schemas.cr:211-222
# maps geo_point): WAND candidates masked by a haversine predicate over
# doc_attrs lat/lon, evaluated JVM-side by Catalyst on the same cogroup
# path as every other filtered query.  The oracle replays the identical
# operation-ordered haversine over the doc_id-derived lat/lon.
_GEO_LAT, _GEO_LON, _GEO_RADIUS_KM = 40.0, -74.0, 5000.0


def _geo_filter_where() -> str:
    from search_ingest_spark.query.geo import haversine_sql

    return (
        f"{haversine_sql(f'({_LAT_SQL})', f'({_LON_SQL})', _GEO_LAT, _GEO_LON)}"
        f" <= {_GEO_RADIUS_KM!r}"
    )


@register(
    "bm25_geo_distance_topk",
    bm25.bm25_oracle_sql("table hash fast", k=10,
                         filter_where=_geo_filter_where()),
)
def _q_geo_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from search_ingest_spark.query.geo import geo_distance_filter

    return _searcher(spark, sf_dir).topk(
        "table hash fast", 10, round_to=4,
        attr_where=geo_distance_filter(
            "lat", "lon", _GEO_LAT, _GEO_LON, _GEO_RADIUS_KM
        ),
    )


# geo_bounding_box filter (exact comparisons — bit-exact across engines)
_BBOX = (-45.0, 45.0, -90.0, 90.0)  # lat_min, lat_max, lon_min, lon_max


@register(
    "bm25_geo_bbox_topk",
    bm25.bm25_oracle_sql(
        "spark query data", k=10,
        filter_where=(
            f"({_LAT_SQL}) BETWEEN {_BBOX[0]!r} AND {_BBOX[1]!r}"
            f" AND ({_LON_SQL}) BETWEEN {_BBOX[2]!r} AND {_BBOX[3]!r}"
        ),
    ),
)
def _q_geo_bbox(spark: SparkSession, sf_dir: str) -> DataFrame:
    from search_ingest_spark.query.geo import geo_bbox_filter

    return _searcher(spark, sf_dir).topk(
        "spark query data", 10, round_to=4,
        attr_where=geo_bbox_filter("lat", "lon", *_BBOX),
    )


# ES bool query: match + filter context.  The filter masks candidates
# but must NOT change df/avgdl (ES scores with whole-index statistics);
# both sides compute stats over the full corpus and apply the lang
# filter only to the ranked candidates.
@register(
    "bm25_topk_filtered",
    bm25.bm25_oracle_sql("spark query data", k=10, filter_where="lang = 'fr'"),
)
def _q_bm25_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return bm25.bm25_brute_force(
        docs, "spark query data", k=10, mode="simple", round_to=4,
        candidate_filter=docs.where(F.col("lang") == "fr").select("doc_id"),
    )


# ES _search response parity: hits carry their _source fields — top-k
# joined back to the doc store (a broadcast of k rows, never a shuffle
# of the corpus).
@register(
    "bm25_search_with_source",
    f"""
SELECT t.doc_id, t.score, t.rank, d.lang, d.source
FROM ({bm25.bm25_oracle_sql("spark query data", k=10)}) t
JOIN documents d USING (doc_id)
""".strip(),
)
def _q_search_with_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    top = bm25.bm25_brute_force(docs, "spark query data", 10, mode="simple",
                                round_to=4)
    return F.broadcast(top).join(docs.select("doc_id", "lang", "source"),
                                 "doc_id").select(
        "doc_id", "score", "rank", "lang", "source"
    )


# ES highlighting (deterministic rule: an 80-char window around the
# first occurrence of the first query term, or the text head if absent).
@register(
    "bm25_search_highlight",
    f"""
SELECT t.doc_id, t.score, t.rank,
       substr(d.text, greatest(1, strpos(lower(d.text), 'data') - 30), 80)
         AS snippet
FROM ({bm25.bm25_oracle_sql("data table", k=10)}) t
JOIN documents d USING (doc_id)
""".strip(),
)
def _q_search_highlight(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    top = bm25.bm25_brute_force(docs, "data table", 10, mode="simple",
                                round_to=4)
    snippet = F.substring(
        F.col("text"),
        F.greatest(F.lit(1), F.locate("data", F.lower("text")) - 30),
        80,
    )
    return F.broadcast(top).join(docs.select("doc_id", "text"), "doc_id").select(
        "doc_id", "score", "rank", snippet.alias("snippet")
    )


# Spark-free SERVING-PATH parity (VERDICT r02 item 5): the LocalSearcher
# serves ranked top-k from the postings AND _source fields from the
# doc_store column family with zero Spark jobs — this entry proves the
# whole response (ranks, scores, stored fields) against the same SQL
# oracle as the Spark path.  createDataFrame here is only the driver-
# contract wrapper around an already-computed k-row result.
@register(
    "bm25_local_topk_source",
    f"""
SELECT t.doc_id, t.score, t.rank, d.lang, d.source
FROM ({bm25.bm25_oracle_sql("spark query data", k=10)}) t
JOIN documents d USING (doc_id)
""".strip(),
)
def _q_local_topk_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    hits = _local_searcher(spark, sf_dir).topk_with_source(
        "spark query data", 10, fields=["lang", "source"], round_to=4
    )
    return spark.createDataFrame(
        [(h["doc_id"], h["score"], h["rank"], h["lang"], h["source"])
         for h in hits],
        "doc_id long, score double, rank int, lang string, source string",
    )


# Spark-free highlight serving: snippet text comes from the doc_store,
# same deterministic window rule as the Spark-path highlight entry.
@register(
    "bm25_local_highlight",
    f"""
SELECT t.doc_id, t.score, t.rank,
       substr(d.text, greatest(1, strpos(lower(d.text), 'data') - 30), 80)
         AS snippet
FROM ({bm25.bm25_oracle_sql("data table", k=10)}) t
JOIN documents d USING (doc_id)
""".strip(),
)
def _q_local_highlight(spark: SparkSession, sf_dir: str) -> DataFrame:
    hits = _local_searcher(spark, sf_dir).topk_with_highlight(
        "data table", 10, round_to=4
    )
    return spark.createDataFrame(
        [(h["doc_id"], h["score"], h["rank"], h["snippet"]) for h in hits],
        "doc_id long, score double, rank int, snippet string",
    )


# Completion suggester (VERDICT r02 item 6; `completion` is a legal
# mapped type, schemas.cr:211-222): prefix scan over the term-sorted
# dictionary ranked by df — served Spark-free by the LocalSearcher,
# verified against a from-corpus DuckDB recount.
@register(
    "suggest_prefix",
    """
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
  FROM documents
),
tf AS (SELECT doc_id, term FROM toks GROUP BY 1, 2),
d AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1)
SELECT term, df FROM d WHERE term LIKE 's%'
ORDER BY df DESC, term ASC LIMIT 10
""".strip(),
)
def _q_suggest(spark: SparkSession, sf_dir: str) -> DataFrame:
    got = _local_searcher(spark, sf_dir).suggest("s", 10)
    return spark.createDataFrame(got, "term string, df long")


# ES from/size pagination: page 2 of the ranking (from=10, size=10).
@register(
    "bm25_topk_paged",
    f"SELECT * FROM ({bm25.bm25_oracle_sql('spark query data', k=20)}) "
    "WHERE rank > 10",
)
def _q_paged(spark: SparkSession, sf_dir: str) -> DataFrame:
    top = bm25.bm25_brute_force(_docs(spark, sf_dir), "spark query data", 20,
                                mode="simple", round_to=4)
    return top.where(F.col("rank") > 10)


# ES terms aggregation (facets) over a match query's hit set: every doc
# containing ≥1 query term, counted per source.
@register(
    "search_facets_by_source",
    """
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
  FROM documents
),
hits AS (
  SELECT DISTINCT doc_id FROM toks WHERE term IN ('spark', 'query', 'data')
)
SELECT d.source, count(*)::BIGINT AS n_hits
FROM documents d JOIN hits USING (doc_id)
GROUP BY d.source
""".strip(),
)
def _q_facets(spark: SparkSession, sf_dir: str) -> DataFrame:
    # index-backed hit set (VERDICT r04 item 1): pruned postings scan +
    # doc_attrs join — no per-query corpus re-tokenize.  The oracle SQL
    # above recomputes the same hit set brute-force from raw text.
    from search_ingest_spark.index import build as ib

    s = _searcher(spark, sf_dir)
    hits = s.matching_doc_ids("spark query data")
    attrs = s.cat.read(ib.DOC_ATTRS_TABLE).select("doc_id", "source")
    return (
        attrs.join(hits, "doc_id")
        .groupBy("source").agg(F.count("*").alias("n_hits"))
    )


def cardinality_agg(col: str, *, approx: bool = False,
                    rsd: float = 0.05):
    """ES `cardinality` aggregation twin (VERDICT r04 item 6).

    ES's cardinality agg is HLL++ BY DESIGN — at 10^12 docs an exact
    distinct must shuffle every (bucket, value) pair (shuffle rows =
    #distinct pairs, potentially corpus-sized), while HLL shuffles one
    fixed-size sketch per map partition per bucket and merges them
    (shuffle rows = partitions × buckets, DATA-INDEPENDENT).  Spark's
    approx_count_distinct is the same HyperLogLog++ family with
    relative standard deviation `rsd` (ES precision_threshold ≈ rsd
    trade).  Exact stays the default because the driver oracle demands
    exactness at sf0.01; flip `approx=True` at scale.  Bench evidence:
    BENCH/BASELINE.md 'cardinality: exact vs HLL' row."""
    return (F.approx_count_distinct(col, rsd) if approx
            else F.countDistinct(col))


# ES metric aggregations over a match query's hit set: `stats` over a
# numeric field (count/min/max/sum/avg of n_chars) plus `cardinality`
# of a keyword field (exact distinct sources — approx_count_distinct
# via cardinality_agg(approx=True) is the HLL path at 10^12 scale, but
# the oracle gate demands exactness, so the driver entry computes the
# exact form both sides).  One job: hit-set semi-join then a single
# global aggregate.
@register(
    "search_stats_aggs",
    """
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
  FROM documents
),
hits AS (
  SELECT DISTINCT doc_id FROM toks WHERE term IN ('spark', 'query', 'data')
)
SELECT count(*)::BIGINT AS n_hits,
       min(d.n_chars)::BIGINT AS min_chars,
       max(d.n_chars)::BIGINT AS max_chars,
       sum(d.n_chars)::BIGINT AS sum_chars,
       round(avg(d.n_chars), 4) AS avg_chars,
       count(DISTINCT d.source)::BIGINT AS source_cardinality
FROM documents d JOIN hits USING (doc_id)
""".strip(),
)
def _q_stats_aggs(spark: SparkSession, sf_dir: str, *,
                  approx_cardinality: bool = False) -> DataFrame:
    # index-backed hit set + doc_attrs metrics (n_chars/source live in
    # the attrs table — the ES doc-values analog); the only text scan
    # left is the one the index build already did
    from search_ingest_spark.index import build as ib

    s = _searcher(spark, sf_dir)
    hits = s.matching_doc_ids("spark query data")
    attrs = s.cat.read(ib.DOC_ATTRS_TABLE).select(
        "doc_id", "source", "n_chars")
    return attrs.join(hits, "doc_id").agg(
        F.count("*").alias("n_hits"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        F.sum("n_chars").alias("sum_chars"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        cardinality_agg("source", approx=approx_cardinality)
        .alias("source_cardinality"),
    )


def percentile_agg(col: str, p: float, *, approx: bool = False,
                   accuracy: int = 10000):
    """ES `percentiles` aggregation twin (the other half of VERDICT
    r04 missing item 5's agg pair).

    ES's percentiles agg is t-digest BY DESIGN — an exact percentile
    at 10^12 docs must shuffle every value to one reducer per group
    and sort, while a mergeable sketch keeps the combine associative:
    one bounded-size summary per map partition, merged on the reduce
    side (Spark's `percentile_approx` is the Greenwald-Khanna
    quantile-summary family with `accuracy` ≈ ES compression).  Exact
    `percentile` (linear interpolation at index p·(n−1), the same
    definition as DuckDB quantile_cont) stays the default because the
    driver oracle demands exactness at sf0.01; flip `approx=True` at
    scale."""
    # percentile_approx returns the INPUT type (it picks a real
    # element, no interpolation) — cast so the flag never changes the
    # result schema
    return (F.percentile_approx(col, p, accuracy).cast("double")
            if approx else F.percentile(col, p))


# ES `percentiles` metric aggregation over a match query's hit set:
# quartiles + p95 of n_chars.  Same index-backed shape as
# search_stats_aggs (postings-pruned hit set, doc_attrs doc-values —
# no text scan); exact interpolated percentiles both sides, the
# approx flag switches every percentile to the mergeable-sketch path.
@register(
    "search_percentiles_aggs",
    """
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
  FROM documents
),
hits AS (
  SELECT DISTINCT doc_id FROM toks WHERE term IN ('spark', 'query', 'data')
)
SELECT count(*)::BIGINT AS n_hits,
       round(quantile_cont(d.n_chars, 0.25), 4) AS p25_chars,
       round(quantile_cont(d.n_chars, 0.50), 4) AS p50_chars,
       round(quantile_cont(d.n_chars, 0.75), 4) AS p75_chars,
       round(quantile_cont(d.n_chars, 0.95), 4) AS p95_chars
FROM documents d JOIN hits USING (doc_id)
""".strip(),
)
def _q_percentiles_aggs(spark: SparkSession, sf_dir: str, *,
                        approx: bool = False) -> DataFrame:
    from search_ingest_spark.index import build as ib

    s = _searcher(spark, sf_dir)
    hits = s.matching_doc_ids("spark query data")
    attrs = s.cat.read(ib.DOC_ATTRS_TABLE).select("doc_id", "n_chars")
    return attrs.join(hits, "doc_id").agg(
        F.count("*").alias("n_hits"),
        *[
            F.round(percentile_agg("n_chars", p, approx=approx), 4)
            .alias(f"p{int(p * 100)}_chars")
            for p in (0.25, 0.50, 0.75, 0.95)
        ],
    )


# ES `top_hits` sub-aggregation: per terms-bucket (source), the top-3
# matching docs by score — the "best examples per facet" shape.  One
# scoring pass + a window ranked over the ROUNDED score (both engines
# break ties identically on doc_id); the window partitions on the
# bucket key, so at 100 TB each bucket ranks independently after the
# same shuffle the terms aggregation itself needs.
@register(
    "search_top_hits",
    """
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, count(*)::INT AS tf FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::INT AS dl FROM toks GROUP BY 1),
stats AS (SELECT count(*)::BIGINT AS n_docs, avg(dl)::DOUBLE AS avgdl FROM dl),
vocab AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
scores AS (
  SELECT tf.doc_id,
         sum(
           ln(1.0 + (stats.n_docs - vocab.df + 0.5) / (vocab.df + 0.5))
           * tf.tf * (1.2 + 1.0)
           / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / stats.avgdl))
         ) AS raw
  FROM tf
  JOIN vocab USING (term)
  JOIN dl USING (doc_id)
  CROSS JOIN stats
  WHERE tf.term IN ('spark', 'query', 'data')
  GROUP BY tf.doc_id
),
sel AS (
  SELECT d.source, s.doc_id, round(s.raw, 4)::DOUBLE AS score
  FROM scores s JOIN documents d USING (doc_id)
)
SELECT source, doc_id, score, hit_rank FROM (
  SELECT source, doc_id, score,
         row_number() OVER (
           PARTITION BY source ORDER BY score DESC, doc_id ASC
         )::INT AS hit_rank
  FROM sel
) WHERE hit_rank <= 3
""".strip(),
)
def _q_top_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    # index-backed scoring (VERDICT r04 item 1): all_matching_scores
    # reads pruned postings (bitwise-identical to the WAND kernel's
    # arithmetic); bm25_all_scores stays as the brute-force oracle
    from pyspark.sql import Window
    from search_ingest_spark.index import build as ib

    s = _searcher(spark, sf_dir)
    scored = s.all_matching_scores("spark query data", round_to=4)
    attrs = s.cat.read(ib.DOC_ATTRS_TABLE).select("doc_id", "source")
    w = Window.partitionBy("source").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return (
        attrs.join(scored, "doc_id")
        .withColumn("hit_rank", F.row_number().over(w))
        .where(F.col("hit_rank") <= 3)
        .select("source", "doc_id", "score", "hit_rank")
    )


# -- round-5 bucket aggregations + collapse (query/aggs.py) -------------------
# All share the item-1 shape: postings-pruned hit set + doc_attrs
# doc-values; oracles recompute brute-force from raw text.
from search_ingest_spark.query import aggs as _aggs  # noqa: E402

_AGG_QUERY = "spark query data"
_RANGES = [("short", None, 150.0), ("mid", 150.0, 300.0),
           ("long", 300.0, None)]
_FILTERS = {
    "es": {"lang": "es"},
    "long_fr_de": {"lang": ["fr", "de"], "n_chars": {"gte": 300}},
    "tiny": {"n_chars": {"lt": 120}},
}


@register("search_histogram_chars",
          _aggs.histogram_oracle_sql(_AGG_QUERY, "n_chars", 100))
def _q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _aggs.histogram_agg(
        _searcher(spark, sf_dir), _AGG_QUERY, "n_chars", 100)


@register("search_range_chars",
          _aggs.range_oracle_sql(_AGG_QUERY, "n_chars", _RANGES))
def _q_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _aggs.range_agg(
        _searcher(spark, sf_dir), _AGG_QUERY, "n_chars", _RANGES)


@register("search_filters_agg",
          _aggs.filters_oracle_sql(_AGG_QUERY, _FILTERS))
def _q_filters_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _aggs.filters_agg(_searcher(spark, sf_dir), _AGG_QUERY, _FILTERS)


# composite page 2: resumed from after-key (source asc, lang asc)
@register("search_composite_buckets",
          _aggs.composite_oracle_sql(_AGG_QUERY, ["source", "lang"], 7,
                                     after=("src12", "es")))
def _q_composite(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _aggs.composite_agg(
        _searcher(spark, sf_dir), _AGG_QUERY, ["source", "lang"], 7,
        after=("src12", "es"))


@register("search_collapse_topk",
          _aggs.collapse_oracle_sql(_AGG_QUERY, "source", k=8))
def _q_collapse(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _aggs.collapse_topk(
        _searcher(spark, sf_dir), _AGG_QUERY, "source", 8, round_to=4)


# ES decay function_score: gauss on n_chars — prefer docs near 300
# chars, half-score at distance 100 past a 25-char offset.
@register("search_decay_gauss_topk",
          bm25.decay_oracle_sql(_AGG_QUERY, "n_chars", k=10, origin=300.0,
                                scale=100.0, offset=25.0, decay=0.5,
                                shape="gauss"))
def _q_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _searcher(spark, sf_dir).decay_score_topk(
        _AGG_QUERY, "n_chars", 10, origin=300.0, scale=100.0, offset=25.0,
        decay=0.5, shape="gauss", round_to=4)


# ES more_like_this seeded by doc 42: deterministic-integer term
# selection (tf desc, df asc, term asc), seed excluded from results.
@register("search_more_like_this",
          bm25.mlt_oracle_sql(42, k=10, max_query_terms=5))
def _q_mlt(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _searcher(spark, sf_dir).more_like_this_topk(
        42, 10, max_query_terms=5, round_to=4)


# ES term suggester: per-token spelling candidates from the dictionary
# within 1 edit, ranked (distance, df desc, term asc).
@register("suggest_term_typos",
          bm25.term_suggest_oracle_sql("sparc datq", max_edits=1, size=3))
def _q_suggest_term(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _searcher(spark, sf_dir).suggest_terms(
        "sparc datq", max_edits=1, size=3)


# -- pipeline aggregations over the date_histogram bucket frame --------------
# ES derivative / cumulative_sum / moving_fn / bucket_selector +
# bucket_sort: post-processing of the ALREADY-REDUCED bucket list
# (coalesce(1) + window = ES's coordinating-node execution, O(buckets)).
_BUCKETS_SQL = ("SELECT CAST(ts AS DATE) AS day, count(*)::BIGINT AS "
                "n_events FROM events WHERE event_type = 'click' "
                "GROUP BY 1")


def _day_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    return (ev.where(F.col("event_type") == "click")
            .groupBy(F.to_date("ts").alias("day"))
            .agg(F.count("*").alias("n_events")))


@register("events_derivative_cumsum",
          _aggs.derivative_cumsum_oracle_sql(_BUCKETS_SQL, "day",
                                             "n_events"))
def _q_deriv_cumsum(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _aggs.derivative_cumsum(_day_buckets(spark, sf_dir), "day",
                                   "n_events")


@register("events_moving_avg",
          _aggs.moving_metric_oracle_sql(_BUCKETS_SQL, "day", "n_events",
                                         window=3))
def _q_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _aggs.moving_metric(_day_buckets(spark, sf_dir), "day",
                               "n_events", window=3)


@register("events_bucket_selector",
          _aggs.bucket_selector_sort_oracle_sql(_BUCKETS_SQL, "day",
                                                "n_events",
                                                min_value=60.0, size=5))
def _q_bucket_selector(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _aggs.bucket_selector_sort(_day_buckets(spark, sf_dir), "day",
                                      "n_events", min_value=60.0, size=5)


# ES auto_date_histogram: target-bucket-count interval auto-choice
# over the fixed-seconds ladder (coordinating-node decision = one
# driver-side min/max agg), then a plain date bucketing.  Target 40
# over the ~30-day events span picks the 1-day rung.
_ADH_INNER = "SELECT ts FROM events WHERE event_type = 'click'"


@register("events_auto_date_histogram",
          _aggs.auto_date_histogram_oracle_sql(_ADH_INNER, 40))
def _q_auto_date_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    return _aggs.auto_date_histogram(
        ev.where(F.col("event_type") == "click").select("ts"), 40)


# ES date_histogram with CALENDAR intervals (B84 extension): civil
# week/month boundaries via date_trunc — variable-length buckets no
# fixed-seconds interval expresses (Spark and DuckDB agree: ISO Monday
# weeks, UTC).  The events span (Jan 2024) yields 5 ISO weeks / 1 month.
@register("events_date_histogram_week",
          _aggs.calendar_histogram_oracle_sql(_ADH_INNER, "week"))
def _q_cal_histogram_week(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    return _aggs.calendar_histogram(
        ev.where(F.col("event_type") == "click").select("ts"), "week")


@register("events_date_histogram_month",
          _aggs.calendar_histogram_oracle_sql(_ADH_INNER, "month"))
def _q_cal_histogram_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    return _aggs.calendar_histogram(
        ev.where(F.col("event_type") == "click").select("ts"), "month")


# auto_date_histogram with the FULL ES ladder (fixed rungs + calendar
# month/quarter/year): target 3 over the ~30-day span overflows every
# fixed rung (7d ≈ 5 aligned buckets) and lands on the month rung —
# exercising the calendar extension end to end, oracle replaying the
# whole rung choice in SQL.
@register("events_auto_date_histogram_calendar",
          _aggs.auto_date_histogram_calendar_oracle_sql(_ADH_INNER, 3))
def _q_auto_date_histogram_cal(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    return _aggs.auto_date_histogram_calendar(
        ev.where(F.col("event_type") == "click").select("ts"), 3)


# ES weighted_avg: Σ(value·weight)/Σ(weight) over the hit set —
# deterministic integer weight expression, exact integer sums.
@register("search_weighted_avg",
          _aggs.weighted_avg_oracle_sql(_AGG_QUERY, "n_chars",
                                        "(doc_id % 7 + 1)"))
def _q_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _aggs.weighted_avg(_searcher(spark, sf_dir), _AGG_QUERY,
                              "n_chars", "(doc_id % 7 + 1)")


# ES sampler / diversified_sampler with a terms sub-agg: the sub-agg
# sees only the top-scoring sample (diversified: ≤2 docs per source).
@register("search_sampler_terms",
          _aggs.sampler_terms_oracle_sql(_AGG_QUERY, "lang",
                                         shard_size=50))
def _q_sampler(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _aggs.sampler_terms(_searcher(spark, sf_dir), _AGG_QUERY,
                               "lang", shard_size=50)


@register("search_diversified_sampler",
          _aggs.sampler_terms_oracle_sql(_AGG_QUERY, "lang",
                                         shard_size=30,
                                         max_per_value=("source", 2)))
def _q_diversified_sampler(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _aggs.sampler_terms(_searcher(spark, sf_dir), _AGG_QUERY,
                               "lang", shard_size=30,
                               max_per_value=("source", 2))


# ES phrase suggester ("did you mean"): per-token candidates scored as
# whole corrections by the build-time bigram LM (Stupid Backoff) plus
# an edit-distance penalty.
@register("suggest_phrase_typos",
          bm25.phrase_suggest_oracle_sql("sparc datq", max_edits=1,
                                         per_token=3, size=3))
def _q_suggest_phrase(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _searcher(spark, sf_dir).suggest_phrases(
        "sparc datq", max_edits=1, per_token=3, size=3)


# serving-path twins: Spark-free pyarrow dictionary/bigram reads,
# identical rows (term: integer/string fields; phrase: shared scoring
# kernel — parity asserted in tests/test_reader.py).
@register("suggest_term_typos_local",
          bm25.term_suggest_oracle_sql("sparc datq", max_edits=1, size=3))
def _q_suggest_term_local(spark: SparkSession, sf_dir: str) -> DataFrame:
    rows = _local_searcher(spark, sf_dir).suggest_terms(
        "sparc datq", max_edits=1, size=3)
    return spark.createDataFrame(
        rows, "token string, suggestion string, df long, distance int, "
              "rank int")


@register("suggest_phrase_typos_local",
          bm25.phrase_suggest_oracle_sql("sparc datq", max_edits=1,
                                         per_token=3, size=3))
def _q_suggest_phrase_local(spark: SparkSession, sf_dir: str) -> DataFrame:
    rows = _local_searcher(spark, sf_dir).suggest_phrases(
        "sparc datq", max_edits=1, per_token=3, size=3)
    return spark.createDataFrame(
        rows, "suggestion string, score double, rank int")


# ES adjacency_matrix: singles + pairwise filter intersections in one
# conditional-sum pass; empty cells omitted (ES prunes the matrix).
_ADJ = {
    "es": {"lang": "es"},
    "long": {"n_chars": {"gte": 300}},
    "src": {"source": ["src3", "src7", "src12"]},
}


@register("search_adjacency_matrix",
          _aggs.adjacency_matrix_oracle_sql(_AGG_QUERY, _ADJ))
def _q_adjacency(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _aggs.adjacency_matrix_agg(_searcher(spark, sf_dir),
                                      _AGG_QUERY, _ADJ)


# ES multi_terms: top-N buckets keyed by a field TUPLE, count desc
# (the top-N twin of composite's full-keyspace pagination).
@register("search_multi_terms",
          _aggs.multi_terms_oracle_sql(_AGG_QUERY, ["lang", "source"], 12))
def _q_multi_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _aggs.multi_terms_agg(_searcher(spark, sf_dir), _AGG_QUERY,
                                 ["lang", "source"], 12)


def _msearch_indexes(spark: SparkSession, sf_dir: str):
    """Two subset indexes over the documents table (even/odd doc ids)
    — each with its OWN corpus statistics, the ES cross-index scoring
    semantics msearch certifies.  Built once per process per sf_dir."""
    key = "msearch:" + os.path.abspath(sf_dir)
    got = _INDEX_CACHE.get(key)
    if got is None:
        d = _docs(spark, sf_dir).select(
            F.col("doc_id").alias("orig_id"), "text")
        se, remap_e = _dense_subset_searcher(
            spark, d.where(F.col("orig_id") % 2 == 0), "sis_ms_even_")
        so, remap_o = _dense_subset_searcher(
            spark, d.where(F.col("orig_id") % 2 == 1), "sis_ms_odd_")
        got = _INDEX_CACHE[key] = [("even", se, remap_e, 2.0),
                                   ("odd", so, remap_o, 1.0)]
    return got


# ES _msearch across two indexes with indices_boost: per-index BM25
# (each subset's own df/n_docs/avgdl — ES does NOT normalize across
# indexes), boost multiply, global merge.
@register("search_msearch_boosted",
          msearch_mod.msearch_oracle_sql(
              "spark query data",
              [("even", "doc_id % 2 = 0", 2.0),
               ("odd", "doc_id % 2 = 1", 1.0)], k=12))
def _q_msearch(spark: SparkSession, sf_dir: str) -> DataFrame:
    return msearch_mod.msearch_topk(
        _msearch_indexes(spark, sf_dir), "spark query data", 12)


# The same federation served Spark-free: per-index LocalSearcher top-k
# with each index's OWN stats, coordinating-node merge of ≤ Σk rows
# (msearch.local_msearch) — the reader-fleet form of ES's two-phase
# cross-index query; identical oracle as the Spark path.
@register("search_msearch_boosted_local",
          msearch_mod.msearch_oracle_sql(
              "spark query data",
              [("even", "doc_id % 2 = 0", 2.0),
               ("odd", "doc_id % 2 = 1", 1.0)], k=12))
def _q_msearch_local(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow.dataset as _ds

    from search_ingest_spark.query.reader import LocalSearcher

    key = "msearch_local:" + os.path.abspath(sf_dir)
    local = _INDEX_CACHE.get(key)
    if local is None:
        local = []
        for name, searcher, _remap, boost in _msearch_indexes(spark, sf_dir):
            cat = searcher.cat
            m = _ds.dataset(cat.data_path("id_map")).to_table(
                columns=["doc_id", "orig_id"])
            id_map = dict(zip(m["doc_id"].to_pylist(),
                              m["orig_id"].to_pylist()))
            local.append((name, LocalSearcher(cat), id_map, boost))
        _INDEX_CACHE[key] = local
    got = msearch_mod.local_msearch(local, "spark query data", 12)
    return spark.createDataFrame(
        got, "index_name string, doc_id long, score double, rank int")


# ES percentile_ranks: % of hit values ≤ each threshold — the inverse
# of the percentiles agg, exact conditional sums.
@register("search_percentile_ranks",
          _aggs.percentile_ranks_oracle_sql(_AGG_QUERY, "n_chars",
                                            [150.0, 300.0, 450.0]))
def _q_percentile_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _aggs.percentile_ranks(_searcher(spark, sf_dir), _AGG_QUERY,
                                  "n_chars", [150.0, 300.0, 450.0])


# ES function_score random_score (seed + doc id): a reproducible
# random sample of the hit set — md5-prefix hash both engines.
@register(
    "search_random_score_topk",
    f"""
WITH {{hits}}
SELECT doc_id, score,
       row_number() OVER (ORDER BY score DESC, doc_id ASC)::INT AS rank
FROM (
  SELECT doc_id,
         round(('0x' || substr(md5('r5seed:' || doc_id::VARCHAR), 1, 15))
               ::BIGINT::DOUBLE / {float(1 << 60)!r}, 6)::DOUBLE AS score
  FROM hits
  ORDER BY score DESC, doc_id ASC LIMIT 10
)
""".replace("{hits}", _aggs.hits_cte(_AGG_QUERY)).strip(),
)
def _q_random_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _searcher(spark, sf_dir).random_score_topk(
        _AGG_QUERY, "r5seed", 10)


# ES _count API: the hit set reduced to one number, no scoring.
@register("search_count", _aggs.match_count_oracle_sql(_AGG_QUERY))
def _q_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _aggs.match_count(_searcher(spark, sf_dir), _AGG_QUERY)


# ES _termvectors: one doc's (term, tf, df) — _source re-analyzed on
# the fly exactly like ES when term vectors aren't stored.
_TV_ORACLE = """
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, count(*)::INT AS tf FROM toks GROUP BY 1, 2),
vocab AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM toks
          GROUP BY 1)
SELECT tf.term, tf.tf, vocab.df
FROM tf JOIN vocab USING (term)
WHERE tf.doc_id = 42
""".strip()


@register("search_termvectors", _TV_ORACLE)
def _q_termvectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _searcher(spark, sf_dir).termvectors(42)


@register("search_termvectors_local", _TV_ORACLE)
def _q_termvectors_local(spark: SparkSession, sf_dir: str) -> DataFrame:
    rows = _local_searcher(spark, sf_dir).termvectors(42)
    return spark.createDataFrame(rows, "term string, tf int, df long")


# ES rank_feature (saturation on n_chars) + distance_feature (on the
# synthetic lat attr, origin 0°): additive bounded boosts over BM25;
# the oracle replays lat's doc_id formula via field_sql.
_FEATURES = [
    {"function": "saturation", "field": "n_chars", "pivot": 250.0,
     "boost": 2.0},
    {"function": "distance", "field": "lat", "origin": 0.0, "pivot": 30.0,
     # qualified: the oracle joins raw scores to documents d, so the
     # bare doc_id of _LAT_SQL would be ambiguous there
     "boost": 1.5, "field_sql": _LAT_SQL.replace("doc_id", "d.doc_id")},
]


@register("search_rank_feature_topk",
          bm25.rank_feature_oracle_sql("spark query data", _FEATURES,
                                       k=10))
def _q_rank_feature(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _searcher(spark, sf_dir).rank_feature_topk(
        "spark query data", _FEATURES, 10, round_to=4)


# ES match_bool_prefix (search-as-you-type): all tokens as SHOULD
# terms except the last, which matches as a capped prefix expansion.
@register("bm25_match_bool_prefix",
          bm25.match_bool_prefix_oracle_sql("spark qu", k=10,
                                            max_expansions=8))
def _q_match_bool_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _searcher(spark, sf_dir).match_bool_prefix_topk(
        "spark qu", 10, max_expansions=8, round_to=4)


@register("bm25_match_bool_prefix_local",
          bm25.match_bool_prefix_oracle_sql("spark qu", k=10,
                                            max_expansions=8))
def _q_match_bool_prefix_local(spark: SparkSession, sf_dir: str) -> DataFrame:
    got = _local_searcher(spark, sf_dir).match_bool_prefix_topk(
        "spark qu", 10, max_expansions=8, round_to=4)
    return spark.createDataFrame(got, "doc_id long, score double, rank int")


# ES terms_set: match ≥ M of the terms where M is PER-DOCUMENT
# (minimum_should_match_field analog — here an expression over
# n_chars, values 1..3), scored as a plain BM25 OR over matched terms.
@register("search_terms_set_topk",
          bm25.terms_set_oracle_sql(["spark", "query", "data", "table"],
                                    "n_chars % 3 + 1", k=10))
def _q_terms_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _searcher(spark, sf_dir).terms_set_topk(
        ["spark", "query", "data", "table"], "n_chars % 3 + 1",
        ["n_chars"], 10, round_to=4)


# ES top_metrics: fields of the 3 hits ranking highest on n_chars — a
# doc-values TakeOrdered, ties broken on doc_id in both engines.
@register("search_top_metrics",
          _aggs.top_metrics_oracle_sql(_AGG_QUERY, "n_chars",
                                       ["lang", "source"], size=3))
def _q_top_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _aggs.top_metrics(_searcher(spark, sf_dir), _AGG_QUERY,
                             "n_chars", ["lang", "source"], 3)


# ES extended_stats on n_chars: exact BIGINT Σx/Σx², ES's population
# variance formula replayed division-for-division in the oracle.
@register("search_extended_stats",
          _aggs.extended_stats_oracle_sql(_AGG_QUERY, "n_chars"))
def _q_extended_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _aggs.extended_stats(_searcher(spark, sf_dir), _AGG_QUERY,
                                "n_chars")


# ES string_stats on the source keyword: length moments + Shannon
# entropy over the character distribution (13-char alphabet here).
@register("search_string_stats",
          _aggs.string_stats_oracle_sql(_AGG_QUERY, "source"))
def _q_string_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _aggs.string_stats(_searcher(spark, sf_dir), _AGG_QUERY,
                              "source")


# `tag` is the nullable synthetic attr (non-NULL iff doc_id % 3 == 0,
# value = source — _docs_with_geo); the oracle replays the formula.
_TAG_SQL = "CASE WHEN doc_id % 3 = 0 THEN source END"


# ES missing: hits with no tag value.
@register("search_missing_tag",
          _aggs.missing_oracle_sql(_AGG_QUERY, _TAG_SQL))
def _q_missing_tag(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _aggs.missing_agg(_searcher(spark, sf_dir), _AGG_QUERY, "tag")


# ES rare_terms: tag values carried by at most 8 hits (the long tail a
# top-N terms agg never shows); NULLs excluded per the terms family.
@register("search_rare_terms",
          _aggs.rare_terms_oracle_sql(_AGG_QUERY, _TAG_SQL, 8))
def _q_rare_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _aggs.rare_terms(_searcher(spark, sf_dir), _AGG_QUERY, "tag", 8)


# ES geo_distance rings around Paris over the synthetic lat/lon attrs;
# oracle replays the doc_id formulas + the engine's haversine rendering.
@register("search_geo_distance_rings",
          _aggs.geo_distance_oracle_sql(
              _AGG_QUERY, 48.85, 2.35, [3000.0, 8000.0, 15000.0],
              lat_sql=_LAT_SQL, lon_sql=_LON_SQL))
def _q_geo_rings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _aggs.geo_distance_agg(_searcher(spark, sf_dir), _AGG_QUERY,
                                  48.85, 2.35, [3000.0, 8000.0, 15000.0])


# ES geotile_grid at zoom 3: Web-Mercator tile buckets over the
# synthetic lat/lon attrs, clamped at the poles like ES.
@register("search_geotile_grid",
          _aggs.geotile_grid_oracle_sql(_AGG_QUERY, 3, lat_sql=_LAT_SQL,
                                        lon_sql=_LON_SQL))
def _q_geotile_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _aggs.geotile_grid_agg(_searcher(spark, sf_dir), _AGG_QUERY, 3)


# ES geohash_grid at precision 3: base32 geohash cells over the same
# synthetic lat/lon attrs — the encode is ONE integer/double arithmetic
# emitted for both engines (query/geo_grid.py), so the hash check is
# exact.
from search_ingest_spark.query import geo_grid as _geo_grid  # noqa: E402


@register("search_geohash_grid",
          _geo_grid.geohash_grid_oracle_sql(_AGG_QUERY, 3, lat_sql=_LAT_SQL,
                                            lon_sql=_LON_SQL))
def _q_geohash_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _geo_grid.geohash_grid_agg(_searcher(spark, sf_dir), _AGG_QUERY, 3)


# ES sort-by-field top-k: Spark path = TakeOrdered over the doc-values
# scan; the serving twin below early-terminates on the INDEX-SORTED
# table (build sort_field="n_chars" — ES/Lucene index sorting).
@register(
    "search_sort_by_field",
    """
SELECT doc_id, n_chars,
       row_number() OVER (ORDER BY n_chars DESC, doc_id ASC)::INT AS rank
FROM documents
ORDER BY n_chars DESC, doc_id ASC
LIMIT 10
""".strip(),
)
def _q_sort_field(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _searcher(spark, sf_dir).sorted_topk("n_chars", 10)


# filtered + sorted on the serving path: the filter is pushed into each
# fragment read and the scan stops on the first fragment whose max
# n_chars stat falls below the kth key.
@register(
    "search_sort_by_field_local",
    """
WITH sel AS (
  SELECT doc_id, n_chars FROM documents WHERE lang IN ('es', 'fr')
  ORDER BY n_chars DESC, doc_id ASC LIMIT 10
)
SELECT doc_id, n_chars,
       row_number() OVER (ORDER BY n_chars DESC, doc_id ASC)::INT AS rank
FROM sel
""".strip(),
)
def _q_sort_field_local(spark: SparkSession, sf_dir: str) -> DataFrame:
    rows = _local_searcher(spark, sf_dir).sorted_topk(
        "n_chars", 10, attr_filter={"lang": ["es", "fr"]})
    return spark.createDataFrame(
        rows, "doc_id long, n_chars long, rank int")


# Stateless sorted cursor (ES search_after on a field sort): only
# rows STRICTLY after (540, 173) in (n_chars desc, doc_id asc) order;
# the stats prune BOTH ends — fragments wholly before the cursor skip
# without a read, the kth-key bound cuts the tail — so a deep page is
# O(k + skipped), not O(page·depth).
@register(
    "search_sort_by_field_after_cursor_local",
    """
WITH sel AS (
  SELECT doc_id, n_chars FROM documents
  WHERE n_chars < 540 OR (n_chars = 540 AND doc_id > 173)
  ORDER BY n_chars DESC, doc_id ASC LIMIT 10
)
SELECT doc_id, n_chars,
       row_number() OVER (ORDER BY n_chars DESC, doc_id ASC)::INT AS rank
FROM sel
""".strip(),
)
def _q_sort_after_cursor_local(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    rows = _local_searcher(spark, sf_dir).sorted_topk(
        "n_chars", 10, search_after=(540, 173))
    return spark.createDataFrame(
        rows, "doc_id long, n_chars long, rank int")


# ASCENDING sort served from the SAME desc-sorted layout: the scan
# walks fragments by parquet MIN stat (file tail first) and stops when
# the next fragment's min exceeds the kth key — the direction ES
# cannot early-terminate (it requires a matching index sort); parquet
# keeps both stats, so one layout serves both directions at
# O(k + skipped).
@register(
    "search_sort_by_field_asc_local",
    """
SELECT doc_id, n_chars,
       row_number() OVER (ORDER BY n_chars ASC, doc_id ASC)::INT AS rank
FROM documents
ORDER BY n_chars ASC, doc_id ASC
LIMIT 10
""".strip(),
)
def _q_sort_field_asc_local(spark: SparkSession, sf_dir: str) -> DataFrame:
    rows = _local_searcher(spark, sf_dir).sorted_topk(
        "n_chars", 10, ascending=True)
    return spark.createDataFrame(
        rows, "doc_id long, n_chars long, rank int")


# ES _explain: per-term BM25 breakdown of one doc's score — block-level
# postings point-read, rows fold to the doc's kernel score.
@register("search_explain_doc",
          bm25.explain_oracle_sql(_AGG_QUERY, 42))
def _q_explain(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _searcher(spark, sf_dir).explain(_AGG_QUERY, 42)


# serving-path twin: Spark-free pyarrow point-read, bitwise-identical
# rows (parity asserted in tests/test_reader.py).
@register("search_explain_local",
          bm25.explain_oracle_sql(_AGG_QUERY, 42))
def _q_explain_local(spark: SparkSession, sf_dir: str) -> DataFrame:
    rows = _local_searcher(spark, sf_dir).explain(_AGG_QUERY, 42)
    return spark.createDataFrame(
        rows, "term string, tf int, dl int, df long, idf double, "
              "partial double")


# ES `date_histogram` aggregation (calendar_interval=day) with a
# nested metric sub-aggregation — the canonical observability query
# shape over a time-keyed stream.  Pure Catalyst: date_trunc groupBy
# with map-side partial aggregation; at 100 TB the bucket cardinality
# is days, so the final reduce is trivially small.
@register(
    "search_date_histogram",
    """
SELECT CAST(ts AS DATE) AS day,
       count(*)::BIGINT AS n_events,
       sum(floor(value * 10000)::BIGINT)::BIGINT AS sum_value_e4,
       count(DISTINCT user_id)::BIGINT AS users
FROM events
WHERE event_type = 'click'
GROUP BY 1
""".strip(),
)
def _q_date_histogram(spark: SparkSession, sf_dir: str, *,
                      approx_cardinality: bool = False) -> DataFrame:
    # the value metric sums FLOOR(value*1e4) as integers: double
    # summation is order-dependent under a parallel reduce, integer
    # summation is associative — deterministic on both engines.  The
    # per-day user cardinality is the agg that blows up at scale when
    # exact (shuffle rows = distinct (day, user) pairs) — flip
    # approx_cardinality for the HLL sketch path (cardinality_agg).
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    return (
        ev.where(F.col("event_type") == "click")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.floor(F.col("value") * 10000).cast("long"))
            .alias("sum_value_e4"),
            cardinality_agg("user_id", approx=approx_cardinality)
            .alias("users"),
        )
    )


# Multimodal pipeline on the hash path: payloads synthesized from text
# bytes, run through the REAL Arrow feature-extraction kernel (with the
# documented deterministic fake decode — no image libs in container);
# the oracle recomputes sha256 + the 8-dim digest features in SQL.
def _mm_feat_sql(j: int) -> str:
    bs = " + ".join(
        f"('0x' || substr(h, {2 * (j + 8 * r) + 1}, 2))::INT" for r in range(4)
    )
    return f"round((((({bs}) / 4.0) / 255.0)::FLOAT)::DOUBLE, 4) AS f{j}"


@register(
    "multimodal_features",
    f"""
WITH h AS (SELECT doc_id, sha256(text) AS h, octet_length(encode(text)) AS nb
           FROM documents)
SELECT doc_id, nb::INT AS n_bytes, h AS sha256,
       {", ".join(_mm_feat_sql(j) for j in range(8))}
FROM h
""".strip(),
)
def _q_multimodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    from search_ingest_spark.ops.multimodal import extract_features

    media = _docs(spark, sf_dir).select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
    )
    out = extract_features(media, fake=True)
    return out.select(
        F.col("media_id").alias("doc_id"),
        F.col("n_bytes"),
        "sha256",
        *[F.round(F.element_at("feat", j + 1).cast("double"), 4).alias(f"f{j}")
          for j in range(8)],
    )


# Video frame-sample planning: the explode that fans a video row out to
# per-frame decode work items (durations synthesized deterministically
# from n_chars; the decode itself is the documented stub).
@register(
    "multimodal_frame_plan",
    """
WITH media AS (
  SELECT doc_id AS media_id, ((n_chars % 20) + 1) * 1000 AS duration_ms
  FROM documents
)
SELECT media_id, unnest(range(0, greatest((duration_ms / 1000)::INT, 1)))::INT
         AS frame_idx,
       unnest(range(0, greatest((duration_ms / 1000)::INT, 1)))::INT * 1000
         AS ts_ms
FROM media
""".strip(),
)
def _q_frame_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from search_ingest_spark.ops.multimodal import frame_sample_plan

    media = _docs(spark, sf_dir).select(
        F.col("doc_id").alias("media_id"),
        F.lit("video").alias("kind"),
        ((F.col("n_chars") % 20 + 1) * 1000).cast("int").alias("duration_ms"),
    )
    return frame_sample_plan(media, every_ms=1000).select(
        "media_id", F.col("frame_idx").cast("int").alias("frame_idx"),
        F.col("ts_ms").cast("int").alias("ts_ms"),
    )


# B-side phrase capability (positions recorded at build time, like every
# Lucene text field): exact match_phrase top-k served from the index,
# oracle recomputes positions + slot matching + the slot-idf-sum BM25
# score from raw text.
from search_ingest_spark.query.phrase import (  # noqa: E402
    PhraseSearcher, phrase_oracle_sql, phrase_prefix_oracle_sql)

_PHRASE_TEXT = "table hash"


@register("bm25_phrase_topk", phrase_oracle_sql(_PHRASE_TEXT, k=10))
def _q_phrase(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = _index_cat(spark, sf_dir)
    return PhraseSearcher(spark, cat).topk(_PHRASE_TEXT, 10, round_to=4)


# ES match_phrase with slop (VERDICT r04 item 3): anchored sloppy
# matching over adjusted positions with Lucene's 1/(1+matchLength)
# weight (semantics + documented Lucene divergence in
# query/phrase.py::PhraseSearcher.topk); slop=0 ≡ exact phrase is a
# pytest invariant (test_phrase).
@register("bm25_phrase_slop_topk",
          phrase_oracle_sql("data table", k=10, slop=3))
def _q_phrase_slop(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = _index_cat(spark, sf_dir)
    return PhraseSearcher(spark, cat).topk(
        "data table", 10, slop=3, round_to=4)


# ES span_near (single-term clauses): every clause inside a
# (width − n) ≤ slop window, unordered / ordered; span_freq = count of
# qualifying position combinations, phrase-weight scored (documented
# Lucene sloppyFreq divergence in span_near_topk's docstring).
from search_ingest_spark.query.phrase import span_near_oracle_sql  # noqa: E402


@register("search_span_near_topk",
          span_near_oracle_sql("spark data query", k=10, slop=3))
def _q_span_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = _index_cat(spark, sf_dir)
    return PhraseSearcher(spark, cat).span_near_topk(
        "spark data query", 10, slop=3, round_to=4)


@register("search_span_near_ordered",
          span_near_oracle_sql("spark data query", k=10, slop=3,
                               in_order=True))
def _q_span_near_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = _index_cat(spark, sf_dir)
    return PhraseSearcher(spark, cat).span_near_topk(
        "spark data query", 10, slop=3, in_order=True, round_to=4)


# ES match_phrase_prefix (search-as-you-type): fixed slots + the last
# term prefix-expanded over the dictionary, stacked on the final slot.
@register(
    "bm25_phrase_prefix_topk",
    phrase_prefix_oracle_sql("data pr", k=10, max_expansions=8),
)
def _q_phrase_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = _index_cat(spark, sf_dir)
    return PhraseSearcher(spark, cat).topk_phrase_prefix(
        "data pr", 10, max_expansions=8, round_to=4
    )


# ES `rescore`: cheap match query for recall, the expensive phrase
# query re-ranks ONLY the top-window_size hits (score_mode=total with
# query/rescore weights — ES defaults); rescore weight 2.0 so phrase
# hits visibly reorder the window.
from search_ingest_spark.query.rescore import (  # noqa: E402
    rescore_oracle_sql, rescore_topk)


@register(
    "search_rescore_topk",
    rescore_oracle_sql("spark query data", _PHRASE_TEXT, k=10,
                       window_size=50, rescore_query_weight=2.0),
)
def _q_rescore(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = _index_cat(spark, sf_dir)
    return rescore_topk(
        _searcher(spark, sf_dir), PhraseSearcher(spark, cat),
        "spark query data", _PHRASE_TEXT, 10, window_size=50,
        rescore_query_weight=2.0, round_to=4)


_BATCH_QUERIES = {0: "data", 1: "spark query data", 2: "customer window batch"}


def _q_wand_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole query set in one Spark job (Searcher.topk_many)."""
    return _searcher(spark, sf_dir).topk_many(_BATCH_QUERIES, 10, round_to=4)


QUERIES["bm25_wand_batch"] = _q_wand_batch
ORACLE_SQL["bm25_wand_batch"] = "\nUNION ALL\n".join(
    f"SELECT {qid}::INT AS query_id, * FROM ({bm25.bm25_oracle_sql(qtext, k=10)})"
    for qid, qtext in _BATCH_QUERIES.items()
)


# ---------------------------------------------------------------------------
# B2: the `standard` analyzer (UAX#29 segmentation + lowercase +
# asciifolding with preserve_original, analysis.py) verified against a
# COMMITTED golden token table.  The corpus deterministically injects
# non-ASCII content (accent translation on every 3rd doc; a fixed
# suffix exercising ß→ss, œ→oe, apostrophe joins, and numeric
# MidNum tokens on every 7th) so the riskiest analyzer surfaces are all
# on the hash path.  The golden parquet is regenerated by
# tests/golden/make_golden.py and committed; the oracle is a plain
# read_parquet — any regression in analysis.analyze() breaks the hash.
# ---------------------------------------------------------------------------

_GOLDEN_STD_TOKENS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "golden", "standard_tokens_sf001.parquet",
)


def _std_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir).select("doc_id", "text")
    t = F.when(
        F.col("doc_id") % 3 == 0, F.translate("text", "aeo", "áéø")
    ).otherwise(F.col("text"))
    t = F.when(
        F.col("doc_id") % 7 == 0,
        F.concat(t, F.lit(" Café naïve O'Brien déjà-vu 3.14 ß Straße cœur")),
    ).otherwise(t)
    return d.select("doc_id", t.alias("text"))


@register(
    "analyze_standard_tokens",
    f"SELECT doc_id, term, tf, dl FROM read_parquet('{_GOLDEN_STD_TOKENS}')",
)
def _q_std_tokens(spark, sf_dir):
    return bm25.doc_terms(_std_corpus(spark, sf_dir), mode="standard")


# ---------------------------------------------------------------------------
# Text analysis (training-data pipeline ops)
# ---------------------------------------------------------------------------


@register("text_token_count", textstats.token_count_sql())
def _q_token_count(spark, sf_dir):
    return textstats.token_count(_docs(spark, sf_dir))


@register("text_quality_score", textstats.quality_score_sql())
def _q_quality(spark, sf_dir):
    return textstats.quality_score(_docs(spark, sf_dir))


@register("text_lang_id", textstats.lang_id_sql())
def _q_langid(spark, sf_dir):
    return textstats.lang_id(_docs(spark, sf_dir))


@register("text_fingerprint", textstats.fingerprint_sql())
def _q_fingerprint(spark, sf_dir):
    return textstats.fingerprint(_docs(spark, sf_dir)).select("doc_id", "fp_md5")


@register("text_bigram_logprob", textstats.bigram_logprob_sql())
def _q_bigram_lm(spark, sf_dir):
    return textstats.bigram_logprob(_docs(spark, sf_dir))


@register("text_repetition_ratio", textstats.repetition_ratio_sql())
def _q_repetition(spark, sf_dir):
    """Gopher-style duplicate-trigram fraction — the repetition filter
    family of web-corpus curation (boilerplate/keyword-stuffing flag)."""
    return textstats.repetition_ratio(_docs(spark, sf_dir))


# Canonical-URL dedup: messy URL variants (host case, default port,
# trailing slash, utm params, fragments) synthesized deterministically
# from doc_id — IDENTICAL SQL expression on both engines — then the
# real canonicalization operator groups them.
_URL_EXPR = (
    "'https://' || (CASE WHEN doc_id % 5 = 0 THEN 'WWW.Example.COM' "
    "ELSE 'www.example.com' END) || "
    "(CASE WHEN doc_id % 4 = 0 THEN ':443' ELSE '' END) || "
    "'/page/' || (doc_id % 60) || "
    "(CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END) || "
    "(CASE WHEN doc_id % 3 = 0 THEN '?utm_source=feed&ref=x' ELSE "
    "(CASE WHEN doc_id % 7 = 0 THEN '?ref=x&utm_campaign=z' ELSE '' END) "
    "END) || "
    "(CASE WHEN doc_id % 11 = 0 THEN '#frag' ELSE '' END)"
)


@register("dedup_canonical_url",
          urls.url_duplicates_oracle_sql(_URL_EXPR))
def _q_url_dedup(spark, sf_dir):
    d = _docs(spark, sf_dir).select(
        "doc_id", F.expr(_URL_EXPR).alias("url"))
    return urls.url_duplicates(d)


# Benchmark decontamination (GPT-3-style n-gram rule): benchmark =
# every 97th doc, training corpus = the rest; n=4 because the synthetic
# corpus has no longer cross-doc duplication (plan identical at n=13).
@register("decontam_ngram_overlap",
          decontam.contamination_oracle_sql(n=4,
                                            bench_where="doc_id % 97 = 0"))
def _q_decontam(spark, sf_dir):
    d = _docs(spark, sf_dir).select("doc_id", "text")
    bench = d.where(F.col("doc_id") % 97 == 0)
    train = d.where(F.col("doc_id") % 97 != 0)
    return decontam.ngram_contamination(train, bench, n=4)


# Per-source contamination-rate rollup: the drop-this-crawl report —
# same broadcast shingle probe, plus a |sources|-sized aggregate.
@register("decontam_rate_by_source",
          decontam.contamination_by_source_oracle_sql(
              n=4, bench_where="doc_id % 97 = 0"))
def _q_decontam_by_source(spark, sf_dir):
    d = _docs(spark, sf_dir).select("doc_id", "text", "source")
    bench = d.where(F.col("doc_id") % 97 == 0)
    train = d.where(F.col("doc_id") % 97 != 0)
    return decontam.contamination_by_source(train, bench, n=4)


# Cross-doc duplicated-span fraction (exact-substring dedup signal):
# n=5 is the widest shingle with measurable cross-doc duplication in
# the synthetic corpus (71 docs share ≥1 five-gram at sf0.01).
@register("dedup_span_fraction", dedup.duplicate_span_stats_sql(n=5))
def _q_dup_spans(spark, sf_dir):
    return dedup.duplicate_span_stats(
        _docs(spark, sf_dir).select("doc_id", "text"), n=5)


# ---------------------------------------------------------------------------
# Deduplication — the documents table has no true dups, so the exact-dup
# entries run on documents ∪ (documents ⊕ id+100000): a deterministic
# corpus WITH duplicates, expressed identically in the oracle SQL.
# ---------------------------------------------------------------------------

_DUP_UNION_SQL = (
    "SELECT doc_id, text FROM documents "
    "UNION ALL SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id < 50"
)


def _dup_docs(spark, sf_dir):
    d = _docs(spark, sf_dir).select("doc_id", "text")
    return d.unionByName(
        d.where(F.col("doc_id") < 50).select(
            (F.col("doc_id") + 100000).alias("doc_id"), "text"
        )
    )


@register(
    "dedup_exact",
    f"""
WITH corpus AS ({_DUP_UNION_SQL}),
f AS (
  SELECT doc_id,
         md5(array_to_string(regexp_extract_all(lower(text), '[a-z0-9]+'), ' ')) AS fp
  FROM corpus
)
SELECT min(doc_id)::BIGINT AS keep_doc_id, count(*)::BIGINT AS group_size
FROM f GROUP BY fp HAVING count(*) >= 2
""".strip(),
)
def _q_dedup_exact(spark, sf_dir):
    return dedup.exact_duplicates(_dup_docs(spark, sf_dir)).select(
        "keep_doc_id", "group_size"
    )


@register(
    "dedup_ngram_jaccard",
    dedup.ngram_jaccard_sql(
        table=f"({_DUP_UNION_SQL})", n=3, threshold=0.8,
    ),
)
def _q_dedup_jaccard(spark, sf_dir):
    return dedup.ngram_jaccard_pairs(
        _dup_docs(spark, sf_dir), n=3, threshold=0.8
    )


# LSH/SimHash are recall-approximate ops, but every stage is
# deterministic given the seed, so the oracle replays the FULL pipeline
# (md5-prefix hashes, split-halves permutation arithmetic in plain
# BIGINT, band tuple-equality joins, exact verification) — full
# rows+schema+hash checks, not rows-only (VERDICT r01 item 5).
@register(
    "dedup_minhash_lsh",
    dedup.minhash_lsh_sql(table=f"({_DUP_UNION_SQL})", n=3, num_perm=64,
                          bands=16, threshold=0.8, seed=1),
)
def _q_dedup_minhash(spark, sf_dir):
    return dedup.minhash_lsh_pairs(_dup_docs(spark, sf_dir), threshold=0.8)


@register("dedup_simhash", dedup.simhash_sql(table=f"({_DUP_UNION_SQL})",
                                             max_hamming=3))
def _q_dedup_simhash(spark, sf_dir):
    return dedup.simhash_pairs(_dup_docs(spark, sf_dir), max_hamming=3)


# Duplicate CLUSTERS (connected components over the exact-Jaccard
# pairs): transitive chains collapse to one group with a canonical
# min-id keeper — the form a dedup pipeline actually consumes.
_JACCARD_PAIRS_SQL = dedup.ngram_jaccard_sql(
    table=f"({_DUP_UNION_SQL})", n=3, threshold=0.8,
)


@register(
    "dedup_duplicate_clusters",
    dedup.duplicate_clusters_sql(_JACCARD_PAIRS_SQL),
)
def _q_dedup_clusters(spark, sf_dir):
    pairs = dedup.ngram_jaccard_pairs(_dup_docs(spark, sf_dir), n=3,
                                      threshold=0.8)
    return dedup.duplicate_clusters(pairs)


# Composite curation pipeline: near-dup pairs → clusters → drop every
# non-canonical member → survivor counts.  The shape a real dataset
# build runs nightly; keeps the whole chain on the hash path.
@register(
    "curation_survivors",
    f"""
WITH survivors AS (
  SELECT doc_id FROM ({_DUP_UNION_SQL})
  WHERE doc_id NOT IN (
    SELECT member FROM ({dedup.duplicate_clusters_sql(_JACCARD_PAIRS_SQL)})
    WHERE member <> cluster_id
  )
)
SELECT (doc_id % 10)::INT AS bucket, count(*)::BIGINT AS n_docs
FROM survivors GROUP BY 1
""".strip(),
)
def _q_curation(spark, sf_dir):
    docs = _dup_docs(spark, sf_dir)
    pairs = dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.8)
    clusters = dedup.duplicate_clusters(pairs)
    dropped = clusters.where(F.col("member") != F.col("cluster_id")).select(
        F.col("member").alias("doc_id")
    )
    survivors = docs.join(dropped, "doc_id", "left_anti")
    return survivors.groupBy(
        (F.col("doc_id") % 10).cast("int").alias("bucket")
    ).agg(F.count("*").alias("n_docs"))


_EMB_NEAR_SQL = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
SELECT x.vec_id AS a, y.vec_id AS b,
       round(list_dot_product(x.v, y.v)
             / (sqrt(list_dot_product(x.v, x.v)) * sqrt(list_dot_product(y.v, y.v))),
             4)::DOUBLE AS cosine
FROM e x JOIN e y ON x.vec_id < y.vec_id
WHERE round(list_dot_product(x.v, y.v)
            / (sqrt(list_dot_product(x.v, x.v)) * sqrt(list_dot_product(y.v, y.v))),
            4) >= 0.4
""".strip()


@register("dedup_embedding_cosine", _EMB_NEAR_SQL)
def _q_emb_near(spark, sf_dir):
    return dedup.embedding_near_dups(_emb(spark, sf_dir), threshold=0.4)


# ---------------------------------------------------------------------------
# Similarity search (ANN)
# ---------------------------------------------------------------------------

_QVEC = [1.0] + [0.0] * 63  # deterministic probe vector (dim 64)


@register("ann_brute_force_topk", similarity.brute_force_topk_sql(_QVEC, k=10))
def _q_ann_brute(spark, sf_dir):
    return similarity.brute_force_topk(_emb(spark, sf_dir), _QVEC, k=10)


# ---------------------------------------------------------------------------
# IVF-bucketed embedding ops — THE scale path (blocking key = nearest
# pinned centroid; the self-join shuffles on bucket id, O(Σ bucket²) not
# O(N²)).  Centroids are pinned literals (ops/ivf_pinned.py) so the
# DuckDB oracle replicates the bucketing bit-for-bit: these rows get the
# full rows+schema+hash check even though the op is "approximate" at the
# recall level.
# ---------------------------------------------------------------------------

from search_ingest_spark.ops.ivf_pinned import IVF_CENTROIDS  # noqa: E402

_IVF_BUCKET_CTE = similarity.ivf_bucket_sql_with(IVF_CENTROIDS)

_EMB_BUCKETED_SQL = f"""
WITH {_IVF_BUCKET_CTE}
SELECT x.vec_id AS a, y.vec_id AS b,
       round(list_dot_product(x.v, y.v)
             / (sqrt(list_dot_product(x.v, x.v)) * sqrt(list_dot_product(y.v, y.v))),
             4)::DOUBLE AS cosine
FROM bucketed x JOIN bucketed y ON x.bk = y.bk AND x.vec_id < y.vec_id
WHERE round(list_dot_product(x.v, y.v)
            / (sqrt(list_dot_product(x.v, x.v)) * sqrt(list_dot_product(y.v, y.v))),
            4) >= 0.4
""".strip()


@register("dedup_embedding_bucketed", _EMB_BUCKETED_SQL)
def _q_emb_bucketed(spark, sf_dir):
    import numpy as np

    return similarity.bucketed_near_dups(
        _emb(spark, sf_dir), threshold=0.4,
        centroids=np.array(IVF_CENTROIDS, dtype=np.float64),
    )


def _ivf_probes(qvec, nprobe):
    import numpy as np

    C = np.array(IVF_CENTROIDS, dtype=np.float64)
    q = np.asarray(qvec, dtype=np.float64)
    order = np.argsort(((C - q) ** 2).sum(axis=1), kind="stable")
    return [int(j) for j in order[:nprobe]]


_IVF_PROBES = _ivf_probes(_QVEC, nprobe=3)

_ANN_IVF_SQL = f"""
WITH {_IVF_BUCKET_CTE},
q AS (SELECT [{", ".join(repr(float(v)) for v in _QVEC)}]::DOUBLE[] AS qv),
scored AS (
  SELECT vec_id,
         round(list_dot_product(v, qv)
               / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))),
         4)::DOUBLE AS cosine
  FROM bucketed, q
  WHERE bk IN ({", ".join(str(p) for p in _IVF_PROBES)})
),
topk AS (
  SELECT vec_id, cosine FROM scored ORDER BY cosine DESC, vec_id ASC LIMIT 10
)
SELECT vec_id, cosine,
       row_number() OVER (ORDER BY cosine DESC, vec_id ASC)::INT AS rank
FROM topk
""".strip()


# PQ-compressed ANN (ops/pq.py): 8×16 pinned codebooks (pq_pinned.py,
# trained deterministically on this table), codes scanned with a
# literal ADC table — the memory-scale path beyond IVF's candidate
# pruning.  Oracle replays encode + ADC bit-for-bit; recall vs brute
# force is measured in tests and bench.
from search_ingest_spark.ops import pq as _pq  # noqa: E402
from search_ingest_spark.ops.pq_pinned import PQ_CODEBOOKS  # noqa: E402


@register("ann_pq_topk",
          _pq.pq_topk_oracle_sql(_QVEC, PQ_CODEBOOKS, k=10))
def _q_ann_pq(spark, sf_dir):
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    coded = _pq.encode_pq(emb, PQ_CODEBOOKS)
    return _pq.pq_topk(coded, _QVEC, PQ_CODEBOOKS, 10)


# IVF-PQ: the full billion-vector composition — nprobe bucket pruning
# (pinned IVF centroids) + ADC code scan + exact rerank, every stage
# replayed bit-for-bit in the oracle.
@register("ann_ivfpq_topk",
          _pq.ivfpq_oracle_sql(_QVEC, IVF_CENTROIDS, PQ_CODEBOOKS, k=10,
                               nprobe=3, shortlist=50))
def _q_ann_ivfpq(spark, sf_dir):
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    return _pq.ivfpq_topk(emb, IVF_CENTROIDS, PQ_CODEBOOKS, _QVEC, 10,
                          nprobe=3, shortlist=50)


def _ivfpq_codes_cat(spark: SparkSession, sf_dir: str):
    """The persisted IVF-PQ serving artifact: (vec_id, pq_codes)
    partitioned by ivf_bucket, encoded once per process per sf_dir."""
    key = "ivfpqcodes:" + os.path.abspath(sf_dir)
    got = _INDEX_CACHE.get(key)
    if got is None:
        from search_ingest_spark.catalog import Catalog

        cat = Catalog(spark, tempfile.mkdtemp(prefix="sis_ivfpq_"))
        _pq.persist_ivfpq_codes(_emb(spark, sf_dir), cat,
                                IVF_CENTROIDS, PQ_CODEBOOKS)
        got = _INDEX_CACHE[key] = cat
    return got


# IVF-PQ served from the PERSISTED codes table: the query prunes to
# nprobe bucket PARTITIONS (hive pruning at the file level), scans
# only their 8-byte codes, and fetches shortlist floats by id from the
# source table — encode determinism makes it row-identical to the
# on-the-fly composition, so the same oracle certifies both.
@register("ann_ivfpq_persisted",
          _pq.ivfpq_oracle_sql(_QVEC, IVF_CENTROIDS, PQ_CODEBOOKS, k=10,
                               nprobe=3, shortlist=50))
def _q_ann_ivfpq_persisted(spark, sf_dir):
    return _pq.ivfpq_topk_from_table(
        _ivfpq_codes_cat(spark, sf_dir), _emb(spark, sf_dir),
        IVF_CENTROIDS, PQ_CODEBOOKS, _QVEC, 10, nprobe=3, shortlist=50)


# the production two-stage: ADC shortlist over codes, exact L2 rerank
# of ONLY the candidates (recall measured: ~0 raw, 0.8 at shortlist=50
# on these near-random unit vectors — the textbook PQ trade).
@register("ann_pq_reranked",
          _pq.pq_reranked_oracle_sql(_QVEC, PQ_CODEBOOKS, k=10,
                                     shortlist=50))
def _q_ann_pq_reranked(spark, sf_dir):
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    coded = _pq.encode_pq(emb, PQ_CODEBOOKS)
    return _pq.pq_topk_reranked(coded, _QVEC, PQ_CODEBOOKS, 10,
                                shortlist=50)


@register("ann_ivf_topk", _ANN_IVF_SQL)
def _q_ann_ivf(spark, sf_dir):
    import numpy as np

    cents = np.array(IVF_CENTROIDS, dtype=np.float64)
    bucketed = similarity.assign_buckets(_emb(spark, sf_dir), cents)
    return similarity.ivf_topk(bucketed, cents, _QVEC, k=10, nprobe=3)


# ---------------------------------------------------------------------------
# HNSW (ops/hnsw.py) — the ES-8 kNN serving structure.  The graph is a
# serving-tier artifact over the embeddings table sorted by vec_id
# (bounded like every LocalSearcher load: one graph per segment /
# centroid table at scale, never the raw corpus), cached per sf_dir.
# ---------------------------------------------------------------------------

_HNSW_CACHE: dict = {}


def _hnsw_for(sf_dir):
    hit = _HNSW_CACHE.get(sf_dir)
    if hit is None:
        import numpy as np
        import pyarrow.parquet as papq

        from search_ingest_spark.ops import hnsw as _hnsw

        t = (papq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
             .sort_by("vec_id"))
        X = np.array(t["embedding"].to_pylist(), dtype=np.float64)
        Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
        hit = _HNSW_CACHE[sf_dir] = (Xn, _hnsw.build(Xn))
    return hit


# HNSW beam (ef=128) + exact-cosine rerank of the beam: equals the
# brute-force top-10 because the beam provably contains it at the
# driver's scales (tests/test_hnsw.py pins recall 1.0 for exactly
# these parameters at sf0.001 and sf0.01) — so the exact oracle
# applies, the repo's standard pinned-approximate pattern.
@register("ann_hnsw_topk", similarity.brute_force_topk_sql(_QVEC, k=10))
def _q_ann_hnsw(spark, sf_dir):
    import numpy as np

    from search_ingest_spark.ops import hnsw as _hnsw

    Xn, g = _hnsw_for(sf_dir)
    q = np.asarray(_QVEC, dtype=np.float64)
    q = q / np.linalg.norm(q)
    beam = [i for i, _ in _hnsw.search(g, Xn, q, 128, ef=128)]
    cands = _emb(spark, sf_dir).where(F.col("vec_id").isin(beam))
    return similarity.brute_force_topk(cands, _QVEC, k=10)


# HNSW served from the PERSISTED graph table: build-once rows form
# (node_id, layer, neighbors) in the catalog + a _meta sidecar, one
# Spark-free pyarrow reload — the reader-fleet consumption path (ES
# persists the per-segment HNSW the same way).  Graph determinism +
# the pinned roundtrip make it search-identical to the in-memory
# build, so the same exact oracle certifies it.
@register("ann_hnsw_persisted", similarity.brute_force_topk_sql(_QVEC, k=10))
def _q_ann_hnsw_persisted(spark, sf_dir):
    import numpy as np

    from search_ingest_spark.ops import hnsw as _hnsw

    key = "hnswgraph:" + os.path.abspath(sf_dir)
    cat = _INDEX_CACHE.get(key)
    if cat is None:
        from search_ingest_spark.catalog import Catalog

        cat = Catalog(spark, tempfile.mkdtemp(prefix="sis_hnsw_"))
        _Xn, g = _hnsw_for(sf_dir)
        _hnsw.persist_graph(spark, cat, g)
        _INDEX_CACHE[key] = cat
    Xn, _g_mem = _hnsw_for(sf_dir)
    g = _hnsw.load_graph(cat)
    q = np.asarray(_QVEC, dtype=np.float64)
    q = q / np.linalg.norm(q)
    beam = [i for i, _ in _hnsw.search(g, Xn, q, 128, ef=128)]
    cands = _emb(spark, sf_dir).where(F.col("vec_id").isin(beam))
    return similarity.brute_force_topk(cands, _QVEC, k=10)


# The FAISS IVF+HNSW composition: HNSW over the pinned centroids IS the
# coarse quantizer (O(ef·M) vs O(nlist) per query — the term that
# dominates at nlist=2^17+).  With ef=|centroids| the probe choice is
# bit-identical to the argsort's (tests/test_hnsw.py), so the existing
# exact IVF oracle carries over unchanged.
@register("ann_ivf_hnsw_topk", _ANN_IVF_SQL)
def _q_ann_ivf_hnsw(spark, sf_dir):
    import numpy as np

    from search_ingest_spark.ops import hnsw as _hnsw

    cents = np.array(IVF_CENTROIDS, dtype=np.float64)
    probes = _hnsw.hnsw_nprobe(cents, np.asarray(_QVEC, dtype=np.float64), 3)
    bucketed = similarity.assign_buckets(_emb(spark, sf_dir), cents)
    return similarity.ivf_topk(bucketed, cents, _QVEC, k=10, probes=probes)


# ---------------------------------------------------------------------------
# Ingest-dataflow analogs over the relational tables (SURVEY §2A)
# ---------------------------------------------------------------------------


@register(
    "ingest_projection_mapping",  # A4/A6: schema-mapped projection + doc type
    """
SELECT c_custkey::BIGINT AS id, c_name AS name,
       c_acctbal::DOUBLE AS acctbal,
       'customer' AS _document_type
FROM customer
""".strip(),
)
def _q_projection(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/customer.parquet")
    return df.select(
        F.col("c_custkey").cast("long").alias("id"),
        F.col("c_name").alias("name"),
        F.col("c_acctbal").cast("double").alias("acctbal"),
        F.lit("customer").alias("_document_type"),
    )


@register(
    "ingest_fanout_routing",  # A10/A11: child → parent index replication
    """
SELECT o_orderkey::BIGINT AS id,
       o_custkey::VARCHAR AS _routing,
       'orders' AS join_name,
       o_custkey::VARCHAR AS join_parent
FROM orders WHERE o_custkey IS NOT NULL
""".strip(),
)
def _q_fanout(spark, sf_dir):
    from search_ingest_spark.schema import ParentRelation, fan_out_to_parent

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    rel = ParentRelation("customer", "customer", "o_custkey")
    out = fan_out_to_parent(orders, rel, "orders")
    return out.select(
        F.col("o_orderkey").cast("long").alias("id"),
        F.col("_routing"),
        F.col("_join_field.name").alias("join_name"),
        F.col("_join_field.parent").alias("join_parent"),
    )


@register(
    "ingest_subfield_mapping",  # A5+A7: es_ignore drop + es_subfield multi-field
    """
SELECT c_custkey::BIGINT AS id, c_name AS name, c_name AS name__keyword,
       'customer' AS _document_type
FROM customer
""".strip(),
)
def _q_subfield(spark, sf_dir):
    from pyspark.sql import types as T

    from search_ingest_spark.schema import FieldSpec, TableSchema

    src = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.col("c_custkey").cast("long").alias("id"),
        F.col("c_name").alias("name"),
        F.col("c_mktsegment").alias("mktsegment"),
    )
    schema = TableSchema("customer", [
        FieldSpec("id", T.LongType(), nullable=False),
        FieldSpec("name", T.StringType(), es_subfield="keyword"),
        FieldSpec("mktsegment", T.StringType(), es_ignore=True),
    ])
    return schema.apply_mapping(src)


@register(
    "ingest_self_replication_guard",  # A12: self-parented docs skip own index
    """
SELECT event_id::BIGINT AS event_id, NULL::VARCHAR AS routing, 'own' AS kind
FROM events WHERE event_id % 5 = 0
UNION ALL
SELECT event_id::BIGINT, user_id::VARCHAR, 'replica'
FROM events WHERE event_id % 5 != 0
""".strip(),
)
def _q_selfrep_guard(spark, sf_dir):
    from search_ingest_spark.schema import (
        ParentRelation,
        fan_out_to_parent,
        skip_self_replication,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.col("event_id").cast("long").alias("event_id"),
        F.when(F.col("event_id") % 5 == 0, F.lit(None).cast("string"))
        .otherwise(F.col("user_id").cast("string")).alias("parent_id"),
    )
    rel = ParentRelation("events", "events", "parent_id")
    own = skip_self_replication(ev, "events", rel, "events").select(
        "event_id", F.lit(None).cast("string").alias("routing"),
        F.lit("own").alias("kind"),
    )
    replicas = fan_out_to_parent(ev, rel, "events").select(
        "event_id", F.col("_routing").alias("routing"),
        F.lit("replica").alias("kind"),
    )
    return own.unionByName(replicas)


# A8: parent-index schema union as data.  The Spark side derives the
# union from the declared TableSchemas (union_index_struct); the oracle
# is the HAND-WRITTEN expected field set — a golden, not a mirror.
_UNION_EXPECTED_SQL = """
SELECT * FROM (VALUES
  ('id', 'bigint'), ('name', 'string'), ('acctbal', 'double'),
  ('_document_type', 'string'), ('custkey', 'string'),
  ('totalprice', 'double')
) AS t(field, dtype)
""".strip()


def _customer_orders_schemas():
    from pyspark.sql import types as T

    from search_ingest_spark.schema import FieldSpec, ParentRelation, TableSchema

    return {
        "customer": TableSchema("customer", [
            FieldSpec("id", T.LongType(), nullable=False),
            FieldSpec("name", T.StringType()),
            FieldSpec("acctbal", T.DoubleType()),
        ]),
        "orders": TableSchema("orders", [
            FieldSpec("id", T.LongType(), nullable=False),
            FieldSpec("custkey", T.StringType()),
            FieldSpec("totalprice", T.DoubleType()),
        ], parents=[ParentRelation("customer", "customer", "custkey")]),
    }


@register("ingest_schema_union", _UNION_EXPECTED_SQL)
def _q_schema_union(spark, sf_dir):
    from search_ingest_spark.schema import union_index_struct

    schemas = _customer_orders_schemas()
    struct = union_index_struct(schemas["customer"], schemas)
    rows = [(f.name, f.dataType.simpleString()) for f in struct.fields]
    return spark.createDataFrame(rows, "field string, dtype string")


# A23: consistency diff as data — expected = the customer union index,
# current = a drifted mapping (acctbal absent, stale column present,
# name re-typed).  Oracle is the hand-written expected diff.
@register(
    "ingest_schema_diff",
    """
SELECT * FROM (VALUES
  ('acctbal', 'missing'), ('name', 'type_mismatch'), ('stale', 'extra')
) AS t(field, status)
""".strip(),
)
def _q_schema_diff(spark, sf_dir):
    from pyspark.sql import types as T

    from search_ingest_spark.schema import schema_diff, union_index_struct

    schemas = _customer_orders_schemas()
    expected = union_index_struct(schemas["customer"], schemas)
    current = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("name", T.LongType()),          # drifted type
        T.StructField("stale", T.StringType()),       # leftover column
        T.StructField("_document_type", T.StringType()),
        T.StructField("custkey", T.StringType()),
        T.StructField("totalprice", T.DoubleType()),
    ])
    return spark.createDataFrame(schema_diff(current, expected),
                                 "field string, status string")


# B1: deterministic html→text extraction.  The corpus synthesizes html
# around each doc's text; the oracle derives the expected output
# INDEPENDENTLY (source + ' ' + whitespace-collapsed text) — if the
# extractor stops stripping script/style or collapsing whitespace, the
# hash diverges.
@register(
    "text_extract_html",
    """
SELECT doc_id::BIGINT AS doc_id,
       trim(regexp_replace(source || ' ' || text, ' {2,}', ' ', 'g')) AS extracted
FROM documents
""".strip(),
)
def _q_extract_html(spark, sf_dir):
    from search_ingest_spark.analysis import extract_text_udf

    d = _docs(spark, sf_dir)
    html = F.encode(
        F.concat(
            F.lit("<html><head><style>p{color:red}</style></head><body><h1>"),
            F.col("source"),
            F.lit("</h1><p>"),
            F.col("text"),
            F.lit("</p><script>var x = 1;</script></body></html>"),
        ),
        "utf-8",
    )
    return d.select("doc_id", extract_text_udf(html).alias("extracted"))


# ---------------------------------------------------------------------------
# A2/A13-A15 end to end ON THE INDEX: backfill a url-keyed corpus, apply
# one changefeed batch (updates %13 — including %221 delete-then-upsert
# LWW conflicts — deletes %17, five appended urls), then answer a BM25
# top-k from the SPLICED index.  The oracle recomputes BM25 over the
# post-change corpus from scratch in SQL — a full value-hash check that
# the O(dirty) splice (delta-maintained stats/term_dict, partition
# swaps) leaves the index exactly equal to a rebuild.  Dense ids are
# assigned in url sort order and appends get lexically-larger urls, so
# (score desc, doc_id asc) == (score desc, url asc) on both sides.
# ---------------------------------------------------------------------------

_INC_CACHE: dict[str, object] = {}

_INC_CORPUS_SQL = """
SELECT 'doc://' || doc_id AS url,
       CASE WHEN doc_id % 13 = 0 THEN text || ' refreshed spark data content'
            ELSE text END AS text
FROM documents
WHERE NOT (doc_id % 17 = 0 AND doc_id % 13 <> 0)
UNION ALL
SELECT 'doc://zzz/new' || i, 'brand new page about spark data batch ' || i
FROM (SELECT unnest(range(0, 5)) AS i)
""".strip()


def _incremental_catalog(spark: SparkSession, sf_dir: str):
    import datetime as _dt

    from search_ingest_spark.catalog import Catalog
    from search_ingest_spark.streaming.incremental import PageIndexer

    key = os.path.abspath(sf_dir)
    got = _INC_CACHE.get(key)
    if got is not None:
        return got
    ts0 = _dt.datetime(2026, 1, 1)
    ts_del = _dt.datetime(2026, 1, 2)
    ts_up = _dt.datetime(2026, 1, 3)
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    url = F.concat(F.lit("doc://"), F.col("doc_id").cast("string"))

    def page_cols(u, ts, text):
        return [
            u.alias("url"), F.lit(ts).cast("timestamp").alias("warc_ts"),
            F.lit(None).cast("binary").alias("html"), text.alias("text"),
            F.lit("en").alias("lang"),
        ]

    pages = docs.select(*page_cols(url, ts0, F.col("text")))
    cat = Catalog(spark, tempfile.mkdtemp(prefix="sis_inc_"))
    # attr_exprs + sort_field: the changefeed batch below also
    # delta-maintains doc_attrs and the index-sorted table (Lucene-style
    # sorted delta segments — VERDICT r5 item 4), queried by the
    # search_sort_by_field_after_changes entry
    ix = PageIndexer(spark, cat, mode="simple", docs_per_shard=64,
                     attr_exprs={"n_chars": "length(text)"},
                     sort_field="n_chars")
    ix.backfill(pages)
    # pin the pre-batch index generation: the time-travel entry queries
    # the catalog AS OF this checkpoint after the batch lands
    cat.checkpoint("prebatch")
    ups = docs.where(F.col("doc_id") % 13 == 0).select(
        *page_cols(url, ts_up,
                   F.concat(F.col("text"), F.lit(" refreshed spark data content")))
    ).withColumn("_op", F.lit("upsert"))
    dels = docs.where(F.col("doc_id") % 17 == 0).select(
        *page_cols(url, ts_del, F.col("text"))
    ).withColumn("_op", F.lit("delete"))
    news = spark.range(5).select(
        *page_cols(
            F.concat(F.lit("doc://zzz/new"), F.col("id").cast("string")), ts_up,
            F.concat(F.lit("brand new page about spark data batch "),
                     F.col("id").cast("string")),
        )
    ).withColumn("_op", F.lit("upsert"))
    ix.apply_changes(ups.unionByName(dels).unionByName(news))
    _INC_CACHE[key] = (cat, ix)
    return cat, ix


@register(
    "incremental_topk_after_changes",
    "SELECT doc_id AS url, score, rank FROM ("
    + bm25.bm25_oracle_sql("spark data", k=10, table=f"({_INC_CORPUS_SQL})",
                           id_col="url")
    + ")",
)
def _q_incremental_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from search_ingest_spark.query.wand import Searcher
    from search_ingest_spark.streaming.incremental import DOC_IDS_TABLE

    cat, _ix = _incremental_catalog(spark, sf_dir)
    top = Searcher(spark, cat).topk("spark data", 10, round_to=4)
    ids = cat.read(DOC_IDS_TABLE).select("doc_id", "url")
    return (
        F.broadcast(top).join(ids, "doc_id")
        .select("url", "score", "rank")
    )


# Iceberg-style time travel: the same catalog, queried AS OF the
# pre-batch checkpoint (Catalog.checkpoint/at — pinned snapshot
# generations, hardlink-shared with their successors).  The oracle
# recomputes BM25 over the ORIGINAL corpus: proof the checkpointed
# generation is byte-complete after the incremental batch rewrote the
# live one.
@register(
    "timetravel_topk_prebatch",
    "SELECT doc_id AS url, score, rank FROM ("
    + bm25.bm25_oracle_sql(
        "spark data", k=10,
        table="(SELECT 'doc://' || doc_id AS url, text FROM documents)",
        id_col="url")
    + ")",
)
def _q_timetravel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from search_ingest_spark.query.wand import Searcher
    from search_ingest_spark.streaming.incremental import DOC_IDS_TABLE

    cat, _ix = _incremental_catalog(spark, sf_dir)
    snap = cat.at("prebatch")
    top = Searcher(spark, snap).topk("spark data", 10, round_to=4)
    ids = snap.read(DOC_IDS_TABLE).select("doc_id", "url")
    return (
        F.broadcast(top).join(ids, "doc_id")
        .select("url", "score", "rank")
    )


# Sorted-top-k served AFTER the changefeed batch (VERDICT r5 item 4):
# the index-sorted table survived the incremental splice as base + one
# sorted delta segment + owners, and the early-terminating reader
# merges them — updated docs surface with their NEW lengths, deleted
# docs never surface, appended docs are rankable.  The oracle sorts the
# post-change corpus from scratch; dense ids are url-ordered, so
# (n_chars desc, doc_id asc) == (n_chars desc, url asc) on both sides.
@register(
    "search_sort_by_field_after_changes",
    f"""
WITH corpus AS ({_INC_CORPUS_SQL}),
sel AS (
  SELECT url, length(text)::BIGINT AS n_chars FROM corpus
  ORDER BY n_chars DESC, url ASC LIMIT 10
)
SELECT url, n_chars,
       row_number() OVER (ORDER BY n_chars DESC, url ASC)::INT AS rank
FROM sel
""".strip(),
)
def _q_sorted_after_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from search_ingest_spark.query.reader import LocalSearcher
    from search_ingest_spark.streaming.incremental import DOC_IDS_TABLE

    cat, _ix = _incremental_catalog(spark, sf_dir)
    rows = LocalSearcher(cat).sorted_topk("n_chars", 10)
    top = spark.createDataFrame(rows, "doc_id long, n_chars long, rank int")
    ids = cat.read(DOC_IDS_TABLE).select("doc_id", "url")
    return F.broadcast(top).join(ids, "doc_id").select(
        "url", "n_chars", "rank")


# ---------------------------------------------------------------------------
# A2+A10/A11/A13-A15 combined: the reference's CORE loop — a changefeed
# batch on a child table upserts/deletes the child doc in its own index
# AND the routed replica in every parent index (table.cr:25-46,
# elastic.cr:259-283, elastic.cr:452-464).  The query backfills a
# customer(parent)/orders(child) pair, applies a deterministic change
# batch (orders %7 upserted with doubled totalprice, %11 deleted; upsert
# wins where both), and returns the PARENT index's final contents.
# ---------------------------------------------------------------------------

_TM_CACHE: dict[str, object] = {}


def _replicated_customer_index(spark: SparkSession, sf_dir: str):
    from search_ingest_spark.schema import FieldSpec, ParentRelation, TableSchema
    from search_ingest_spark.tables import TableManager
    import pyspark.sql.types as T
    from search_ingest_spark.catalog import Catalog

    key = os.path.abspath(sf_dir)
    got = _TM_CACHE.get(key)
    if got is not None:
        return got
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.col("c_custkey").cast("long").alias("id"),
        F.col("c_name").alias("name"),
        F.col("c_acctbal").cast("double").alias("acctbal"),
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_orderkey").cast("long").alias("id"),
        F.col("o_custkey").cast("string").alias("custkey"),
        F.col("o_totalprice").cast("double").alias("totalprice"),
        # deterministic text for has_child relation queries (both
        # engines derive it identically from o_orderpriority)
        F.lower(F.regexp_replace("o_orderpriority", "-", " ")).alias("text"),
    )
    schemas = {
        "customer": TableSchema("customer", [
            FieldSpec("id", T.LongType(), nullable=False),
            FieldSpec("name", T.StringType()),
            FieldSpec("acctbal", T.DoubleType()),
        ]),
        "orders": TableSchema("orders", [
            FieldSpec("id", T.LongType(), nullable=False),
            FieldSpec("custkey", T.StringType()),
            FieldSpec("totalprice", T.DoubleType()),
            FieldSpec("text", T.StringType()),
        ], parents=[ParentRelation("customer", "customer", "custkey")]),
    }
    mgr = TableManager(spark, Catalog(spark, tempfile.mkdtemp(prefix="sis_tm_")),
                       schemas)
    mgr.backfill_all({"customer": cust, "orders": orders})
    batch = (
        orders.where(F.col("id") % 7 == 0)
        .withColumn("totalprice", F.col("totalprice") * 2)
        .withColumn("_op", F.lit("upsert"))
        .unionByName(
            orders.where(F.col("id") % 11 == 0).withColumn("_op", F.lit("delete"))
        )
    )
    mgr.apply_changes("orders", batch)
    _TM_CACHE[key] = mgr
    return mgr


_SUBSET_IDX_CACHE: dict[str, object] = {}


def _relation_searchers(spark: SparkSession, sf_dir: str):
    """(mgr, child_searcher, parent_searcher) for the replicated
    customer index — one inverted index per document-type subset,
    built ONCE per process from the live doc table.  Relation queries
    then ride Searcher.all_matching_scores (pruned postings scan)
    instead of re-tokenizing the subset per query; per-subset indexes
    make the subset corpus statistics (df/n_docs/avgdl) the index's
    own stats, exactly the scoring semantics has_child/has_parent
    document (and their oracles replay)."""
    from search_ingest_spark.catalog import Catalog
    from search_ingest_spark.index.build import build_index
    from search_ingest_spark.query.wand import Searcher
    from search_ingest_spark.tables import _doc_table

    key = os.path.abspath(sf_dir)
    got = _SUBSET_IDX_CACHE.get(key)
    if got is None:
        mgr = _replicated_customer_index(spark, sf_dir)
        idx = mgr.cat.read(_doc_table("customer"))
        children = idx.where(
            (F.col("_document_type") == "orders")
            & F.col("_join_field.parent").isNotNull()
        ).select(F.col("id").alias("orig_id"), "text")
        parents = idx.where(F.col("_document_type") == "customer").select(
            F.col("id").alias("orig_id"), F.col("name").alias("text")
        )
        got = _SUBSET_IDX_CACHE[key] = (
            mgr,
            _dense_subset_searcher(spark, children, "sis_hc_child_"),
            _dense_subset_searcher(spark, parents, "sis_hc_parent_"),
        )
    return got


def _dense_subset_searcher(spark: SparkSession, docs: DataFrame,
                           prefix: str):
    """Index a subset whose natural keys (orderkey/custkey) are SPARSE:
    build_index's doc-range sharding requires dense 0..N-1 ids (it now
    raises otherwise — a sparse-id build silently dropped every doc past
    shard n_shards-1), so densify with the build's own scalable
    dense_ids, index the dense frame, and hand back (searcher, remap)
    where remap(scored) carries (doc_id, score) back to natural keys —
    one equi-join against the (tiny relative to corpus) id map, exactly
    the doc-id↔natural-key mapping the incremental pipeline's
    prepare_pages maintains for url-keyed corpora."""
    from search_ingest_spark.catalog import Catalog
    from search_ingest_spark.index.build import build_index, dense_ids
    from search_ingest_spark.query.wand import Searcher

    cat = Catalog(spark, tempfile.mkdtemp(prefix=prefix))
    # MATERIALIZE the id assignment before anything consumes it:
    # dense_ids rides repartitionByRange (sampled boundaries) +
    # spark_partition_id, so recomputing its lineage in different jobs
    # can assign different ids — the index's several build jobs and the
    # remap join must all see ONE assignment
    cat.write("id_map", dense_ids(docs, "orig_id", "doc_id", n_buckets=16)
              .select("doc_id", "orig_id", "text"))
    d = cat.read("id_map")
    build_index(spark, d.select("doc_id", "text"), cat, mode="simple")
    mapping = d.select("doc_id", "orig_id")

    def remap(scored: DataFrame) -> DataFrame:
        return scored.join(mapping, "doc_id").select(
            F.col("orig_id").alias("doc_id"), "score")

    return Searcher(spark, cat), remap


@register(
    "ingest_parent_replication",
    """
SELECT c_custkey::BIGINT AS id, 'customer' AS _document_type,
       c_custkey::VARCHAR AS _routing, NULL::VARCHAR AS join_parent,
       c_acctbal::DOUBLE AS acctbal, NULL::DOUBLE AS totalprice
FROM customer
UNION ALL
SELECT o_orderkey::BIGINT, 'orders', o_custkey::VARCHAR, o_custkey::VARCHAR,
       NULL::DOUBLE,
       (CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice * 2
             ELSE o_totalprice END)::DOUBLE
FROM orders
WHERE o_custkey IS NOT NULL
  AND NOT (o_orderkey % 11 = 0 AND o_orderkey % 7 != 0)
""".strip(),
)
def _q_parent_replication(spark, sf_dir):
    from search_ingest_spark.tables import _doc_table

    mgr = _replicated_customer_index(spark, sf_dir)
    return mgr.cat.read(_doc_table("customer")).select(
        "id", "_document_type", "_routing",
        F.col("_join_field.parent").alias("join_parent"),
        "acctbal", "totalprice",
    )


# shared oracle fragment: the CHILD corpus visible in the parent index
# after the fixture's change batch (upserts keep text; %11 deletes win
# unless the doc was also %7-upserted) — must mirror
# _replicated_customer_index exactly
_HC_CHILD_SQL = """
child AS (
  SELECT o_orderkey::BIGINT AS doc_id, o_custkey::BIGINT AS parent,
         lower(replace(o_orderpriority, '-', ' ')) AS text
  FROM orders
  WHERE o_custkey IS NOT NULL
    AND NOT (o_orderkey % 11 = 0 AND o_orderkey % 7 != 0)
)
""".strip()

_HC_SCORE_SQL = """
toks AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '[a-z0-9]+')) AS term
  FROM child
),
tf AS (SELECT doc_id, term, count(*)::INT AS tf FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::INT AS dl FROM toks GROUP BY 1),
stats AS (SELECT count(*)::BIGINT AS n_docs, avg(dl)::DOUBLE AS avgdl FROM dl),
dfreq AS (SELECT term, count(*)::BIGINT AS df FROM tf
          WHERE term IN (SELECT term FROM q) GROUP BY 1),
cscore AS (
  SELECT tf.doc_id,
         sum(
           ln(1.0 + (stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
           * tf.tf * (1.2 + 1.0)
           / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / stats.avgdl))
         ) AS s
  FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
  GROUP BY tf.doc_id
)
""".strip()


# ES has_child query (VERDICT r03 item 5): parents ranked by the SUM of
# their matching children's BM25 scores (score_mode='sum'), computed
# over the REPLICATED parent index — the query-side counterpart of the
# join-field machinery (fan_out_to_parent routing/colocation).  Child
# scoring statistics come from the child subset of the index; the
# oracle recomputes the identical corpus from the raw tables plus the
# fixture's change batch.
@register(
    "search_has_child_topk",
    f"""
WITH {_HC_CHILD_SQL},
q(term) AS (VALUES ('urgent'), ('specified')),
{_HC_SCORE_SQL},
pscore AS (
  SELECT child.parent AS id, round(sum(s), 4)::DOUBLE AS score
  FROM cscore JOIN child USING (doc_id)
  GROUP BY 1
),
topk AS (
  SELECT id, score FROM pscore
  WHERE id IN (SELECT c_custkey::BIGINT FROM customer)
  ORDER BY score DESC, id ASC LIMIT 10
)
SELECT id, score,
       row_number() OVER (ORDER BY score DESC, id ASC)::INT AS rank
FROM topk
""".strip(),
)
def _q_has_child(spark: SparkSession, sf_dir: str) -> DataFrame:
    from search_ingest_spark.query.join_query import has_child_topk
    from search_ingest_spark.tables import _doc_table

    mgr, (child_s, child_remap), _ = _relation_searchers(spark, sf_dir)
    idx = mgr.cat.read(_doc_table("customer"))
    return has_child_topk(
        idx, child_type="orders", parent_type="customer",
        query_text="urgent specified", k=10, score_mode="sum",
        round_to=4,
        scored=child_remap(child_s.all_matching_scores("urgent specified")),
    )


# same request under score_mode=max (ES's default has_child mode)
@register(
    "search_has_child_max",
    f"""
WITH {_HC_CHILD_SQL},
q(term) AS (VALUES ('urgent'), ('specified')),
{_HC_SCORE_SQL},
pscore AS (
  SELECT child.parent AS id, round(max(s), 4)::DOUBLE AS score
  FROM cscore JOIN child USING (doc_id)
  GROUP BY 1
),
topk AS (
  SELECT id, score FROM pscore
  WHERE id IN (SELECT c_custkey::BIGINT FROM customer)
  ORDER BY score DESC, id ASC LIMIT 10
)
SELECT id, score,
       row_number() OVER (ORDER BY score DESC, id ASC)::INT AS rank
FROM topk
""".strip(),
)
def _q_has_child_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    from search_ingest_spark.query.join_query import has_child_topk
    from search_ingest_spark.tables import _doc_table

    mgr, (child_s, child_remap), _ = _relation_searchers(spark, sf_dir)
    idx = mgr.cat.read(_doc_table("customer"))
    return has_child_topk(
        idx, child_type="orders", parent_type="customer",
        query_text="urgent specified", k=10, score_mode="max",
        round_to=4,
        scored=child_remap(child_s.all_matching_scores("urgent specified")),
    )


# ES has_parent query: children of parents matching a text query, each
# child carrying its parent's BM25 score (score=true).  The parent
# match here is a unique name token, so the result is one customer's
# surviving orders ranked by id.
@register(
    "search_has_parent_children",
    f"""
WITH {_HC_CHILD_SQL},
parents AS (
  SELECT c_custkey::BIGINT AS doc_id, lower(c_name) AS text FROM customer
),
toks AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '[a-z0-9]+')) AS term
  FROM parents
),
tf AS (SELECT doc_id, term, count(*)::INT AS tf FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::INT AS dl FROM toks GROUP BY 1),
stats AS (SELECT count(*)::BIGINT AS n_docs, avg(dl)::DOUBLE AS avgdl FROM dl),
q(term) AS (VALUES ('000000007')),
dfreq AS (SELECT term, count(*)::BIGINT AS df FROM tf
          WHERE term IN (SELECT term FROM q) GROUP BY 1),
pscore AS (
  SELECT tf.doc_id,
         sum(
           ln(1.0 + (stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
           * tf.tf * (1.2 + 1.0)
           / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / stats.avgdl))
         ) AS s
  FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
  GROUP BY tf.doc_id
),
topk AS (
  SELECT child.doc_id AS id, round(pscore.s, 4)::DOUBLE AS score
  FROM child JOIN pscore ON child.parent = pscore.doc_id
  ORDER BY score DESC, id ASC LIMIT 10
)
SELECT id, score,
       row_number() OVER (ORDER BY score DESC, id ASC)::INT AS rank
FROM topk
""".strip(),
)
def _q_has_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    from search_ingest_spark.query.join_query import has_parent_children
    from search_ingest_spark.tables import _doc_table

    mgr, _, (parent_s, parent_remap) = _relation_searchers(spark, sf_dir)
    idx = mgr.cat.read(_doc_table("customer"))
    return has_parent_children(
        idx, child_type="orders", parent_type="customer",
        query_text="000000007", k=10, round_to=4, text_col="name",
        scored=parent_remap(parent_s.all_matching_scores("000000007")),
    )


@register(
    "ingest_upsert_latest",  # A13/A14: last-writer-wins upsert per key
    """
SELECT user_id::BIGINT AS user_id, event_type, value::DOUBLE AS value
FROM (
  SELECT user_id, event_type, value,
         row_number() OVER (
           PARTITION BY user_id
           ORDER BY ts DESC, event_id DESC
         ) AS rn
  FROM events
) WHERE rn = 1
""".strip(),
)
def _q_upsert(spark, sf_dir):
    from pyspark.sql import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            F.col("user_id").cast("long").alias("user_id"),
            "event_type",
            F.col("value").cast("double").alias("value"),
        )
    )


@register(
    "ingest_delete_tombstones",  # A15: tombstoned keys removed from the store
    """
WITH latest AS (
  SELECT user_id, event_type,
         row_number() OVER (
           PARTITION BY user_id ORDER BY ts DESC, event_id DESC
         ) AS rn
  FROM events
)
SELECT user_id::BIGINT AS user_id FROM latest
WHERE rn = 1 AND event_type <> 'error'
ORDER BY user_id
""".strip(),
)
def _q_tombstone(spark, sf_dir):
    from pyspark.sql import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where((F.col("rn") == 1) & (F.col("event_type") != "error"))
        .select(F.col("user_id").cast("long").alias("user_id"))
    )


@register(
    "ingest_backfill_counts",  # A17/A18: per-partition written-doc counts
    """
SELECT source, count(*)::BIGINT AS n_docs, sum(n_chars)::BIGINT AS total_chars
FROM documents GROUP BY source
""".strip(),
)
def _q_counts(spark, sf_dir):
    return (
        _docs(spark, sf_dir)
        .groupBy("source")
        .agg(F.count("*").alias("n_docs"), F.sum("n_chars").alias("total_chars"))
    )


# The streaming ingest-rate operator (streaming/stats.ingest_rate —
# event-time tumbling window + watermark) run in batch mode over the
# events table: Structured Streaming window aggregation semantics are
# identical in batch (the watermark is a no-op), so the SAME operator
# the stream runs is driver-verifiable against a SQL recount.  Window
# starts emitted as epoch seconds (tz-proof across engines).
@register(
    "events_windowed_rate",
    """
SELECT epoch(time_bucket(INTERVAL '1 hour', ts))::BIGINT AS window_start_epoch,
       event_type,
       count(*)::BIGINT AS n_events
FROM events GROUP BY 1, 2
""".strip(),
)
def _q_events_rate(spark, sf_dir):
    from search_ingest_spark.streaming.stats import ingest_rate

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    r = ingest_rate(ev, ts_col="ts", key_col="event_type",
                    window="1 hour", watermark="2 hours")
    return r.select(
        F.unix_timestamp("window_start").cast("long")
        .alias("window_start_epoch"),
        "event_type",
        F.col("n_docs").cast("long").alias("n_events"),
    )


def _rollup_cat(spark: SparkSession, sf_dir: str):
    """Hourly rollup of the events table, materialized once per
    process per sf_dir (ops/rollup.py — the hypertable continuous
    aggregate)."""
    from search_ingest_spark.catalog import Catalog
    from search_ingest_spark.ops import rollup

    key = "rollup:" + os.path.abspath(sf_dir)
    got = _INDEX_CACHE.get(key)
    if got is None:
        cat = Catalog(spark, tempfile.mkdtemp(prefix="sis_rollup_"))
        ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        rollup.build_rollup(ev, cat, interval_sec=3600)
        got = _INDEX_CACHE[key] = cat
    return got


# Hypertable rollup: the hourly continuous aggregate re-aggregated to
# DAILY buckets over a two-week window — answered entirely from the
# rollup table (count/sum fold, min/max fold, integer-exact value sum);
# the oracle recomputes the same window from RAW events, certifying the
# whole rollup+requery path.  Window bounds are base-aligned epochs
# (2024-01-08 .. 2024-01-22 UTC).
_ROLLUP_SINCE = 1704672000
_ROLLUP_UNTIL = 1704672000 + 14 * 86400


@register("events_rollup_daily",
          rollup_mod.rollup_query_oracle_sql(
              interval_sec=86400, since_epoch=_ROLLUP_SINCE,
              until_epoch=_ROLLUP_UNTIL))
def _q_rollup_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    from search_ingest_spark.ops import rollup

    return rollup.rollup_query(
        spark, _rollup_cat(spark, sf_dir), interval_sec=86400,
        since_epoch=_ROLLUP_SINCE, until_epoch=_ROLLUP_UNTIL)


# The continuous-aggregate PLANNER REWRITE (ops/rollup.py::
# route_date_histogram): a 4-hour date_histogram is a multiple of the
# hourly rollup base, so the router serves it FROM the rollup
# (|buckets| pre-folded rows, not an events re-scan) — the oracle
# recomputes from RAW events, certifying the rewrite is invisible.
@register("events_date_histogram_routed",
          rollup_mod.rollup_query_oracle_sql(
              interval_sec=14400, since_epoch=_ROLLUP_SINCE,
              until_epoch=_ROLLUP_UNTIL))
def _q_dh_routed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from search_ingest_spark.ops import rollup

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    df, route = rollup.route_date_histogram(
        spark, _rollup_cat(spark, sf_dir), ev, interval_sec=14400,
        since_epoch=_ROLLUP_SINCE, until_epoch=_ROLLUP_UNTIL)
    assert route == "rollup", route
    return df


# The same router forced onto its RAW fallback (90 min is NOT a
# multiple of the hourly base — the rollup cannot answer it exactly,
# so the router must re-scan rather than silently approximate).
@register("events_date_histogram_routed_raw",
          rollup_mod.rollup_query_oracle_sql(
              interval_sec=5400, since_epoch=_ROLLUP_SINCE,
              until_epoch=_ROLLUP_UNTIL))
def _q_dh_routed_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    from search_ingest_spark.ops import rollup

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    df, route = rollup.route_date_histogram(
        spark, _rollup_cat(spark, sf_dir), ev, interval_sec=5400,
        since_epoch=_ROLLUP_SINCE, until_epoch=_ROLLUP_UNTIL)
    assert route == "raw", route
    return df


# At-least-once replay dedup (streaming/stats.dedup_replays) in its
# batch reconciliation form: the events table unioned with a
# deterministic replayed subset (every 10th id re-delivered an hour
# late) collapses back to one EARLIEST row per event id — the struct
# minimum replays exactly in DuckDB.  Epoch-second ts keeps the
# comparison tz-proof; the streaming twin
# (dropDuplicatesWithinWatermark) is covered in test_streaming_stats.
_REPLAY_INNER = """
SELECT event_id, ts, event_type, value FROM events
UNION ALL
SELECT event_id, ts + INTERVAL 1 HOUR, event_type, value
FROM events WHERE event_id % 10 = 3
""".strip()


@register(
    "events_dedup_replays",
    f"""
WITH ev AS ({_REPLAY_INNER}),
won AS (
  SELECT event_id,
         min(struct_pack(ts := ts, event_type := event_type,
                         value := value)) AS _w
  FROM ev GROUP BY 1
)
SELECT event_id, floor(epoch(_w.ts))::BIGINT AS ts_epoch,
       _w.event_type AS event_type, _w.value AS value
FROM won
""".strip(),
)
def _q_dedup_replays(spark, sf_dir):
    from search_ingest_spark.streaming.stats import dedup_replays

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "ts", "event_type", "value")
    replay = (ev.where(F.col("event_id") % 10 == 3)
              .withColumn("ts", F.col("ts") + F.expr("INTERVAL 1 HOUR")))
    return dedup_replays(ev.unionAll(replay)).select(
        "event_id",
        F.unix_timestamp("ts").cast("long").alias("ts_epoch"),
        "event_type", "value")


# Gap-based sessionization over the events stream (session_window, the
# merge-while-overlapping dynamic window).  Batch form for oracle duty;
# the same function takes a streaming frame + watermark.  Epoch-second
# outputs keep the comparison tz-proof; the oracle replays Spark's
# merge rule (new session iff the silence since the previous event is
# STRICTLY greater than gap — Spark merges touching windows)
# with lag + a running sum.
@register(
    "events_sessionize",
    """
WITH lagged AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                   OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                      > INTERVAL '30' MINUTE
              THEN 1 ELSE 0 END AS new_s
  FROM events
),
sess AS (
  SELECT user_id, ts,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM lagged
)
SELECT floor(epoch(min(ts)))::BIGINT AS session_start_epoch,
       floor(epoch(max(ts) + INTERVAL '30' MINUTE))::BIGINT
         AS session_end_epoch,
       user_id,
       count(*)::BIGINT AS n_events
FROM sess GROUP BY user_id, sid
""".strip(),
)
def _q_sessionize(spark, sf_dir):
    from search_ingest_spark.streaming.stats import sessionize

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    s = sessionize(ev, ts_col="ts", key_col="user_id", gap="30 minutes")
    return s.select(
        F.unix_timestamp("session_start").cast("long")
        .alias("session_start_epoch"),
        F.unix_timestamp("session_end").cast("long")
        .alias("session_end_epoch"),
        "user_id",
        F.col("n_events").cast("long").alias("n_events"),
    )


@register(
    "relational_pricing_summary",  # classic agg glue (TPC-H Q1 shape)
    """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)::DOUBLE AS sum_qty,
       round(sum(l_extendedprice * (1 - l_discount)), 2)::DOUBLE AS revenue,
       count(*)::BIGINT AS n_rows
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""".strip(),
)
def _q_pricing(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
            .alias("revenue"),
            F.count("*").alias("n_rows"),
        )
    )


@register(
    "relational_top_revenue_orders",  # join + agg + deterministic top-k
    """
WITH rev AS (
  SELECT o_orderkey, round(sum(l_extendedprice * (1 - l_discount)), 2)::DOUBLE AS revenue
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
  GROUP BY o_orderkey
)
SELECT o_orderkey::BIGINT AS o_orderkey, revenue FROM rev
ORDER BY revenue DESC, o_orderkey ASC LIMIT 10
""".strip(),
)
def _q_top_orders(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy(orders.o_orderkey)
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
            .alias("revenue")
        )
        .select(F.col("o_orderkey").cast("long").alias("o_orderkey"), "revenue")
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# ES `_search` DSL façade (query/dsl.py — VERDICT r5 "What's missing"
# #1): the consumption contract the reference's clients use against the
# indices it maintains (README.md:7-8; mapping semantics
# schemas.cr:50-83).  Each entry below compiles ONE request dict and is
# oracled against the same composed SQL its direct-operator twin uses —
# proving the compiler adds nothing and drops nothing.  The pytest
# reachability matrix (tests/test_dsl.py) covers every supported
# query/agg type against its direct operator.
# ---------------------------------------------------------------------------

def _dsl_search(spark: SparkSession, sf_dir: str, request: dict,
                part: str = "hits", name: str | None = None) -> DataFrame:
    from search_ingest_spark.query import dsl as _dsl
    from search_ingest_spark.query.phrase import PhraseSearcher as _PS

    out = _dsl.search(
        _searcher(spark, sf_dir), request,
        phrase_searcher=_PS(spark, _index_cat(spark, sf_dir)),
        docs=_docs(spark, sf_dir))
    return out[part][name] if name else out[part]


# bool must+should+must_not+filter(range+terms) in one request
@register(
    "search_dsl_bool_filtered",
    bm25.bool_oracle_sql(
        must="data", should="spark query table", must_not="customer",
        filter_where="n_chars >= 50 AND lang IN ('en', 'de', 'es')",
        minimum_should_match=1, k=10),
)
def _q_dsl_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _dsl_search(spark, sf_dir, {"query": {"bool": {
        "must": {"match": {"text": "data"}},
        "should": {"match": {"text": "spark query table"}},
        "must_not": {"match": {"text": "customer"}},
        "filter": [{"range": {"n_chars": {"gte": 50}}},
                   {"terms": {"lang": ["en", "de", "es"]}}],
        "minimum_should_match": 1,
    }}})


# sloppy match_phrase + from/size paging in one request
@register(
    "search_dsl_phrase_paged",
    "SELECT * FROM ("
    + phrase_oracle_sql("data table", k=10, slop=3)
    + ") WHERE rank > 3",
)
def _q_dsl_phrase_paged(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _dsl_search(spark, sf_dir, {
        "query": {"match_phrase": {"text": {"query": "data table",
                                            "slop": 3}}},
        "from": 3, "size": 7,
    })


# query + terms aggregation composed in ONE request (the facets shape
# with the DSL's size/order contract: n_docs desc, key asc, top 5)
@register(
    "search_dsl_terms_agg",
    f"""
WITH {_aggs.hits_cte(_AGG_QUERY)}
SELECT d.source, count(*)::BIGINT AS n_docs
FROM documents d JOIN hits USING (doc_id)
GROUP BY d.source
ORDER BY n_docs DESC, d.source ASC
LIMIT 5
""".strip(),
)
def _q_dsl_terms_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _dsl_search(
        spark, sf_dir,
        {"query": {"match": {"text": _AGG_QUERY}},
         "aggs": {"by_source": {"terms": {"field": "source",
                                          "size": 5}}}},
        part="aggs", name="by_source")


# terms + NESTED metric sub-aggregations in one request — ES's
# bread-and-butter composition; all metrics fold inside the bucket
# groupBy (one aggregate, no second pass).
@register(
    "search_dsl_terms_sub_aggs",
    f"""
WITH {_aggs.hits_cte(_AGG_QUERY)}
SELECT d.source,
       count(*)::BIGINT AS n_docs,
       round(avg(d.n_chars), 4)::DOUBLE AS avg_len,
       max(d.n_chars) AS max_len,
       sum(d.n_chars)::BIGINT AS total_len
FROM documents d JOIN hits USING (doc_id)
GROUP BY d.source
ORDER BY n_docs DESC, d.source ASC
LIMIT 5
""".strip(),
)
def _q_dsl_terms_sub_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _dsl_search(
        spark, sf_dir,
        {"query": {"match": {"text": _AGG_QUERY}},
         "aggs": {"by_source": {
             "terms": {"field": "source", "size": 5},
             "aggs": {"avg_len": {"avg": {"field": "n_chars"}},
                      "max_len": {"max": {"field": "n_chars"}},
                      "total_len": {"sum": {"field": "n_chars"}}},
         }}},
        part="aggs", name="by_source")


# terms INSIDE terms (bucket nesting depth 2): top-3 sources, and
# within each its top-2 languages — one (source, lang) pair-count
# groupBy + a per-outer window; the shuffle carries pair counts.
@register(
    "search_dsl_terms_nested",
    f"""
WITH {_aggs.hits_cte(_AGG_QUERY)},
j AS (
  SELECT d.source, d.lang FROM documents d JOIN hits USING (doc_id)
),
outer_b AS (
  SELECT source, count(*) AS _n FROM j WHERE source IS NOT NULL
  GROUP BY 1 ORDER BY _n DESC, source ASC LIMIT 3
),
pairs AS (
  SELECT source, lang, count(*)::BIGINT AS n_docs FROM j
  WHERE source IS NOT NULL AND lang IS NOT NULL GROUP BY 1, 2
),
ranked AS (
  SELECT p.source, p.lang, p.n_docs,
         row_number() OVER (PARTITION BY p.source
                            ORDER BY p.n_docs DESC, p.lang ASC) AS rn
  FROM pairs p JOIN outer_b USING (source)
)
SELECT source, lang, n_docs FROM ranked WHERE rn <= 2
""".strip(),
)
def _q_dsl_terms_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _dsl_search(
        spark, sf_dir,
        {"query": {"match": {"text": _AGG_QUERY}},
         "aggs": {"by_source": {
             "terms": {"field": "source", "size": 3},
             "aggs": {"by_lang": {"terms": {"field": "lang",
                                            "size": 2}}},
         }}},
        part="aggs", name="by_source")


# terms agg with ES's order option — _key asc picks a DIFFERENT bucket
# set than the count-desc default (first 5 keys alphabetically), so
# the oracle certifies the ordering contract, not just the counting.
@register(
    "search_dsl_terms_key_order",
    f"""
WITH {_aggs.hits_cte(_AGG_QUERY)}
SELECT d.source, count(*)::BIGINT AS n_docs
FROM documents d JOIN hits USING (doc_id)
GROUP BY d.source
ORDER BY d.source ASC
LIMIT 5
""".strip(),
)
def _q_dsl_terms_key_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _dsl_search(
        spark, sf_dir,
        {"query": {"match": {"text": _AGG_QUERY}},
         "aggs": {"by_source": {"terms": {
             "field": "source", "size": 5,
             "order": {"_key": "asc"}}}}},
        part="aggs", name="by_source")


# query + collapse in one request
@register(
    "search_dsl_collapse",
    _aggs.collapse_oracle_sql(_AGG_QUERY, "source", k=8),
)
def _q_dsl_collapse(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _dsl_search(spark, sf_dir, {
        "query": {"match": {"text": _AGG_QUERY}},
        "collapse": {"field": "source"}, "size": 8,
    })


# query + rescore (phrase re-rank of the top window) in one request
@register(
    "search_dsl_rescore",
    rescore_oracle_sql(_AGG_QUERY, _PHRASE_TEXT, k=10,
                       window_size=50, rescore_query_weight=2.0),
)
def _q_dsl_rescore(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _dsl_search(spark, sf_dir, {
        "query": {"match": {"text": _AGG_QUERY}},
        "rescore": {"window_size": 50, "query": {
            "rescore_query": {"match_phrase": {"text": _PHRASE_TEXT}},
            "rescore_query_weight": 2.0}},
    })


# function_score field_value_factor compiled from the DSL shape
@register(
    "search_dsl_function_score",
    bm25.function_score_oracle_sql(_AGG_QUERY, "n_chars", k=10),
)
def _q_dsl_function_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _dsl_search(spark, sf_dir, {"query": {"function_score": {
        "query": {"match": {"text": _AGG_QUERY}},
        "field_value_factor": {"field": "n_chars", "modifier": "log1p",
                               "factor": 1.0},
        "boost_mode": "multiply",
    }}})


# ES min_score: hits scoring below the floor are dropped (scores are
# rank-descending, so the cut removes a suffix and ranks stay
# contiguous); the threshold splits this query's top-10 mid-list.
@register(
    "search_dsl_min_score",
    "SELECT * FROM ("
    + bm25.bm25_oracle_sql("spark query data", k=10)
    + ") WHERE score >= 1.25",
)
def _q_dsl_min_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _dsl_search(spark, sf_dir, {
        "query": {"match": {"text": "spark query data"}},
        "min_score": 1.25, "size": 10,
    })


# the ES fetch phase through the DSL: _source field list + the
# deterministic highlighter composed on one request — ≤k broadcast
# joins after ranking, exactly the dedicated entries' plans.
@register(
    "search_dsl_source_highlight",
    f"""
SELECT t.doc_id, t.score, t.rank, d.lang, d.source,
       substr(d.text, greatest(1, strpos(lower(d.text), 'data') - 30), 80)
         AS snippet
FROM ({bm25.bm25_oracle_sql("data table", k=10)}) t
JOIN documents d USING (doc_id)
""".strip(),
)
def _q_dsl_source_highlight(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _dsl_search(spark, sf_dir, {
        "query": {"match": {"text": "data table"}},
        "_source": ["lang", "source"],
        "highlight": {"fields": {"text": {}}},
        "size": 10,
    })


# ES geo-distance sort: nearest docs to Paris — one haversine
# projection (same literal-cos rendering as the rings agg) over the
# doc-values scan + TakeOrdered; output and ORDERING use the rounded
# distance so both engines agree, doc_id breaks rounded ties.
@register(
    "search_dsl_sort_geo_distance",
    f"""
WITH g AS (
  SELECT doc_id, {_LAT_SQL} AS lat, {_LON_SQL} AS lon FROM documents
),
d AS (
  SELECT doc_id,
         round({{HAV}}, 4)::DOUBLE AS dist_km
  FROM g
),
topk AS (
  SELECT * FROM d ORDER BY dist_km ASC, doc_id ASC LIMIT 10
)
SELECT doc_id, dist_km,
       row_number() OVER (ORDER BY dist_km ASC, doc_id ASC)::INT AS rank
FROM topk
""".replace("{HAV}", __import__(
        "search_ingest_spark.query.geo", fromlist=["geo"]
    ).haversine_sql("g.lat", "g.lon", 48.85, 2.35)).strip(),
)
def _q_dsl_sort_geo(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _dsl_search(spark, sf_dir, {
        "sort": [{"_geo_distance": {
            "location": {"lat": 48.85, "lon": 2.35},
            "order": "asc", "unit": "km"}}],
        "size": 10,
    })


# ES _rank_eval: relevance regression-testing over rated results —
# the engine's ordinary top-k per request + the metric fold, per
# request and mean, both replayed in SQL (ranking AND arithmetic
# certified together).
_RANK_EVAL_REQS = [
    {"id": "q_multi", "query": "spark query data",
     "ratings": {188: 3, 442: 2, 312: 1, 777: 2}},
    {"id": "q_single", "query": "customer",
     "ratings": {5: 1, 10: 2, 42: 1}},
]

from search_ingest_spark.query import rank_eval as _rank_eval  # noqa: E402


@register("search_rank_eval_precision",
          _rank_eval.rank_eval_oracle_sql(_RANK_EVAL_REQS,
                                          metric="precision", k=10))
def _q_rank_eval_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _rank_eval.rank_eval(_searcher(spark, sf_dir),
                                _RANK_EVAL_REQS, metric="precision",
                                k=10)


@register("search_rank_eval_dcg",
          _rank_eval.rank_eval_oracle_sql(_RANK_EVAL_REQS,
                                          metric="dcg", k=10))
def _q_rank_eval_dcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _rank_eval.rank_eval(_searcher(spark, sf_dir),
                                _RANK_EVAL_REQS, metric="dcg", k=10)


# ERR (Chapelle et al., ES's expected_reciprocal_rank): the cascade
# model — stop probability (2^r−1)/2^max at each rank, discounted by
# the probability of having NOT stopped earlier (a running product
# the oracle carries with DuckDB's product() window).
@register("search_rank_eval_err",
          _rank_eval.rank_eval_oracle_sql(
              _RANK_EVAL_REQS, metric="expected_reciprocal_rank",
              k=10, maximum_relevance=3))
def _q_rank_eval_err(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _rank_eval.rank_eval(
        _searcher(spark, sf_dir), _RANK_EVAL_REQS,
        metric="expected_reciprocal_rank", k=10, maximum_relevance=3)


# collapse + inner_hits: the top-k collapsed groups AND each group's
# own top-3 hits from the SAME single group window (no second pass).
@register(
    "search_dsl_collapse_inner_hits",
    _aggs.collapse_inner_hits_oracle_sql(_AGG_QUERY, "source", 5,
                                         inner_size=3),
)
def _q_dsl_collapse_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _dsl_search(spark, sf_dir, {
        "query": {"match": {"text": _AGG_QUERY}},
        "collapse": {"field": "source", "inner_hits": {"size": 3}},
        "size": 5,
    })


# ES ids query: constant-score hits for the EXISTING docs among the
# values (missing ids silently absent — 999999 exercises the rule).
@register(
    "search_dsl_ids",
    """
SELECT doc_id, 1.0::DOUBLE AS score,
       row_number() OVER (ORDER BY doc_id ASC)::INT AS rank
FROM documents WHERE doc_id IN (5, 42, 313, 999999)
ORDER BY doc_id ASC LIMIT 10
""".strip(),
)
def _q_dsl_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _dsl_search(spark, sf_dir, {"query": {"ids": {
        "values": [5, 42, 313, 999999]}}})


# ES pinned query: listed ids first in list order (scored down from
# the 1.7014124e38 organic ceiling, ES's constant), organic fills the
# rest with pins excluded; the missing pin is skipped.
@register(
    "search_dsl_pinned",
    f"""
WITH organic AS (
  SELECT doc_id, score FROM ({bm25.bm25_oracle_sql("spark query data", k=13)})
),
pins(doc_id, pos) AS (VALUES (442, 0), (7, 1), (999999, 2)),
pex AS (
  SELECT p.doc_id, 1.7014124e38 - p.pos * 1e30 AS score
  FROM pins p JOIN documents d USING (doc_id)
),
u AS (
  SELECT doc_id, score FROM organic
  WHERE doc_id NOT IN (SELECT doc_id FROM pins)
  UNION ALL SELECT doc_id, score FROM pex
),
topk AS (SELECT * FROM u ORDER BY score DESC, doc_id ASC LIMIT 10)
SELECT doc_id, score,
       row_number() OVER (ORDER BY score DESC, doc_id ASC)::INT AS rank
FROM topk
""".strip(),
)
def _q_dsl_pinned(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _dsl_search(spark, sf_dir, {"query": {"pinned": {
        "ids": [442, 7, 999999],
        "organic": {"match": {"text": "spark query data"}},
    }}})


# geo_bounding_box filter context: the box is exactly two attr range
# clauses (geo_point stored as lat/lon doc-values), so it rides the
# shared filter spec; the oracle rebuilds the synthetic coords and
# applies the same BETWEEN.
@register(
    "search_dsl_geo_box",
    bm25.bool_oracle_sql(
        must=_AGG_QUERY,
        filter_where=(f"({_LAT_SQL}) BETWEEN -40.0 AND 40.0 "
                      f"AND ({_LON_SQL}) BETWEEN -50.0 AND 50.0"),
        k=10),
)
def _q_dsl_geo_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _dsl_search(spark, sf_dir, {"query": {"bool": {
        "must": {"match": {"text": _AGG_QUERY}},
        "filter": [{"geo_bounding_box": {"location": {
            "top_left": {"lat": 40.0, "lon": -50.0},
            "bottom_right": {"lat": -40.0, "lon": 50.0},
        }}}],
    }}})


# ES-8 HYBRID search (knn + query in one request): final score =
# lexical BM25 (if in the lexical top window) + ES's cosine rescale
# (1+cos)/2 (if in the kNN top-k), summed over the outer-joined
# windows — both sides' windows are exact here (beam coverage pinned),
# so the whole fusion is oracle-exact.
@register(
    "search_dsl_knn_hybrid",
    f"""
WITH lex AS (
  SELECT doc_id, score FROM ({bm25.bm25_oracle_sql("spark query data", k=10)})
),
kn AS (
  SELECT vec_id AS doc_id, (1.0 + cosine) / 2 AS knn_s
  FROM ({similarity.brute_force_topk_sql(_QVEC, k=10)})
),
u AS (
  SELECT coalesce(lex.doc_id, kn.doc_id) AS doc_id,
         round(coalesce(lex.score, 0) + coalesce(kn.knn_s, 0), 4)::DOUBLE
           AS score
  FROM lex FULL OUTER JOIN kn ON lex.doc_id = kn.doc_id
),
topk AS (SELECT * FROM u ORDER BY score DESC, doc_id ASC LIMIT 10)
SELECT doc_id, score,
       row_number() OVER (ORDER BY score DESC, doc_id ASC)::INT AS rank
FROM topk
""".strip(),
)
def _q_dsl_knn_hybrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from search_ingest_spark.query import dsl as _dsl

    out = _dsl.search(
        _searcher(spark, sf_dir),
        {"query": {"match": {"text": "spark query data"}},
         "knn": {"field": "embedding", "query_vector": _QVEC, "k": 10,
                 "num_candidates": 128},
         "size": 10},
        emb=_emb(spark, sf_dir), knn_index=_hnsw_for(sf_dir))
    return out["hits"]


# ES-8 kNN similarity floor: vectors less similar than the threshold
# never return — a suffix cut of the descending cosines (splits this
# query's top-10 mid-list), ranks stay contiguous.
@register(
    "search_dsl_knn_similarity",
    "SELECT * FROM ("
    + similarity.brute_force_topk_sql(_QVEC, k=10)
    + ") WHERE cosine >= 0.31",
)
def _q_dsl_knn_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from search_ingest_spark.query import dsl as _dsl

    out = _dsl.search(
        _searcher(spark, sf_dir),
        {"knn": {"field": "embedding", "query_vector": _QVEC, "k": 10,
                 "num_candidates": 128, "similarity": 0.31}},
        emb=_emb(spark, sf_dir), knn_index=_hnsw_for(sf_dir))
    return out["hits"]


# ES-8 FILTERED kNN: the filter restricts candidates (top-k AMONG
# label-3 vectors, not a post-filter of the global top-k);
# num_candidates=500 (=n) makes it exactly the filtered brute force,
# which is the oracle.
@register(
    "search_dsl_knn_filtered",
    similarity.brute_force_topk_sql(
        _QVEC, k=10,
        table="(SELECT * FROM embeddings WHERE label = 3)"),
)
def _q_dsl_knn_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    from search_ingest_spark.query import dsl as _dsl

    out = _dsl.search(
        _searcher(spark, sf_dir),
        {"knn": {"field": "embedding", "query_vector": _QVEC, "k": 10,
                 "num_candidates": 500,
                 "filter": {"term": {"label": 3}}}},
        emb=_emb(spark, sf_dir), knn_index=_hnsw_for(sf_dir))
    return out["hits"]


# ES 8.8 RRF (reciprocal rank fusion): score = 1/(60+rank_lex) +
# 1/(60+rank_knn) over the two 20-deep ranked windows — rank-based, so
# the sides' incomparable score scales never mix; num_candidates=500
# makes the knn window structurally exact (ef = n, connectivity
# pinned), so the whole fusion is oracle-exact.
@register(
    "search_dsl_knn_rrf",
    f"""
WITH lex AS (
  SELECT doc_id, rank FROM ({bm25.bm25_oracle_sql("spark query data", k=20)})
),
kn AS (
  SELECT vec_id AS doc_id, rank
  FROM ({similarity.brute_force_topk_sql(_QVEC, k=20)})
),
u AS (
  SELECT coalesce(lex.doc_id, kn.doc_id) AS doc_id,
         round(coalesce(1.0 / (60.0 + lex.rank), 0)
               + coalesce(1.0 / (60.0 + kn.rank), 0), 6)::DOUBLE AS score
  FROM lex FULL OUTER JOIN kn ON lex.doc_id = kn.doc_id
),
topk AS (SELECT * FROM u ORDER BY score DESC, doc_id ASC LIMIT 10)
SELECT doc_id, score,
       row_number() OVER (ORDER BY score DESC, doc_id ASC)::INT AS rank
FROM topk
""".strip(),
)
def _q_dsl_knn_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from search_ingest_spark.query import dsl as _dsl

    out = _dsl.search(
        _searcher(spark, sf_dir),
        {"query": {"match": {"text": "spark query data"}},
         "knn": {"field": "embedding", "query_vector": _QVEC,
                 "num_candidates": 500},
         "rank": {"rrf": {"rank_constant": 60,
                          "rank_window_size": 20}},
         "size": 10},
        emb=_emb(spark, sf_dir), knn_index=_hnsw_for(sf_dir))
    return out["hits"]


# ES-8 kNN clause: HNSW beam (num_candidates=128) + exact rerank —
# same two-stage as ann_hnsw_topk, reached through the request dict;
# beam coverage at the driver scales is pinned by tests/test_hnsw.py,
# so the exact brute-force oracle applies.
@register("search_dsl_knn", similarity.brute_force_topk_sql(_QVEC, k=10))
def _q_dsl_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from search_ingest_spark.query import dsl as _dsl

    out = _dsl.search(
        _searcher(spark, sf_dir),
        {"knn": {"field": "embedding", "query_vector": _QVEC, "k": 10,
                 "num_candidates": 128}},
        emb=_emb(spark, sf_dir), knn_index=_hnsw_for(sf_dir))
    return out["hits"]
