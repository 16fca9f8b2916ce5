"""Physical-plan assertions — the scale contract, checked in CI.

`.explain()` is the evidence that Catalyst actually gets the chances we
designed for: filter pushdown into parquet scans, column pruning,
broadcast of small sides, TakeOrderedAndProject for top-k (no global
sort), zero exchanges in the doc-local tokenization stage.  These
assertions fail if a refactor silently degrades the plan at 100x data.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from search_ingest_spark.catalog import Catalog
from search_ingest_spark.index import build as ib
from search_ingest_spark.query.bm25 import bm25_brute_force, doc_terms
from search_ingest_spark.query.wand import Searcher


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_of(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


@pytest.fixture(scope="module")
def doc_index(spark, documents_smoke, tmp_path_factory):
    cat = Catalog(spark, str(tmp_path_factory.mktemp("planidx")))
    ib.build_index(spark, documents_smoke, cat, mode="simple", docs_per_shard=16,
                   with_positions=True, attr_cols=["lang", "source"])
    return cat


class TestScanPlans:
    def test_tokenization_stage_has_no_exchange(self, documents_smoke):
        # tf/dl are doc-local: anything shuffling here is a regression
        assert "Exchange" not in plan_of(doc_terms(documents_smoke, mode="simple"))

    def test_postings_scan_pushes_term_filter(self, spark, doc_index):
        s = Searcher(spark, doc_index)
        idf = s.plan("data table")
        pruned = s.postings.where(F.col("term_id").isin([int(t) for t in idf]))
        plan = plan_of(pruned)
        assert "PushedFilters: [In(term_id" in plan, plan

    def test_column_pruning_reaches_scan(self, spark):
        li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        q = li.select("l_orderkey", "l_quantity").where(F.col("l_quantity") > 10)
        plan = plan_of(q)
        assert "ReadSchema: struct<l_orderkey:bigint,l_quantity:double>" in plan
        assert "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity" in plan


class TestQueryPlans:
    def test_brute_force_uses_broadcast_joins(self, documents_smoke):
        df = bm25_brute_force(documents_smoke, "data table", 10, mode="simple")
        plan = plan_of(df)
        # dfreq + stats are tiny: both joins must be broadcast, never SMJ
        assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
        assert "SortMergeJoin" not in plan

    def test_topk_is_take_ordered_not_global_sort(self, spark, doc_index):
        s = Searcher(spark, doc_index)
        plan = plan_of(s.topk("data", 10))
        assert "TakeOrderedAndProject" in plan

    def test_wand_scores_shard_partitioned(self, spark, doc_index):
        # the scorer kernel runs once per task over hash(shard)-complete
        # partitions (wand._scored_partitions): the plan must carry a
        # shard repartition feeding a MapInPandas — NOT a per-group
        # FlatMapGroupsInPandas (whose per-group sort + Arrow roundtrip
        # cost ~8 ms x n_shards per query, r07 §9c)
        s = Searcher(spark, doc_index)
        plan = plan_of(s.topk("data table", 10))
        assert "MapInPandas" in plan
        assert "hashpartitioning(shard" in plan
        assert "FlatMapGroupsInPandas" not in plan

    def test_positions_scan_pushes_term_filter(self, spark, doc_index):
        # a phrase query must read only its terms' row groups
        pos = doc_index.read(ib.POSITIONS_TABLE).where(
            F.col("term").isin(["data", "table"])
        )
        plan = plan_of(pos)
        assert "PushedFilters: [In(term" in plan, plan

    def test_attr_filter_pushes_predicate_and_prunes_columns(self, spark, doc_index):
        attrs = doc_index.read(ib.DOC_ATTRS_TABLE).where(
            F.col("lang") == "fr"
        ).select("shard", "doc_id")
        plan = plan_of(attrs)
        assert "PushedFilters: [IsNotNull(lang), EqualTo(lang,fr)]" in plan, plan
        # source column never leaves the reader
        assert "ReadSchema: struct<doc_id:bigint,lang:string>" in plan, plan

    def test_filtered_wand_cogroups_postings_with_attrs(self, spark, doc_index):
        s = Searcher(spark, doc_index)
        plan = plan_of(s.topk("data table", 10, attr_filter={"lang": "fr"}))
        assert "FlatMapCoGroupsInPandas" in plan  # postings ⋈ filter mask

    def test_range_filter_pushes_bounds_into_attrs_scan(self, spark, doc_index):
        # the shared filter spec (query/filters.py) must reach parquet:
        # a range clause shows up as pushed comparison predicates, so at
        # 100 TB the attrs scan prunes row groups by min/max stats
        from search_ingest_spark.query import filters

        attrs = doc_index.read(ib.DOC_ATTRS_TABLE).where(
            filters.spark_cond({"lang": {"gte": "b", "lt": "g"}})
        ).select("shard", "doc_id")
        plan = plan_of(attrs)
        assert "GreaterThanOrEqual(lang,b)" in plan, plan
        assert "LessThan(lang,g)" in plan, plan

    def test_exists_filter_pushes_isnotnull(self, spark, doc_index):
        from search_ingest_spark.query import filters

        attrs = doc_index.read(ib.DOC_ATTRS_TABLE).where(
            filters.spark_cond({"source": {"exists": True}})
        ).select("doc_id")
        plan = plan_of(attrs)
        assert "PushedFilters: [IsNotNull(source)]" in plan, plan

    def test_constant_score_is_pushed_scan_plus_take_ordered(
        self, spark, doc_index
    ):
        # filter-context-only query: ONE pruned attrs scan feeding
        # TakeOrderedAndProject — no shuffle, no postings read
        s = Searcher(spark, doc_index)
        plan = plan_of(s.constant_score({"lang": "fr"}, 10))
        assert "TakeOrderedAndProject" in plan, plan
        assert "EqualTo(lang,fr)" in plan, plan
        assert "postings" not in plan, plan

    def test_date_histogram_has_partial_aggregation(self, spark):
        # map-side partials before the single exchange: the 100 TB shape
        # (bucket cardinality = days) reduces almost everything map-side
        from search_ingest_spark.entrypoints import QUERIES

        df = QUERIES["search_date_histogram"](spark, "/root/testdata/sf0.001")
        plan = plan_of(df)
        assert plan.count("HashAggregate") >= 2, plan
        assert "PushedFilters: [IsNotNull(event_type), EqualTo(event_type,click)]" in plan, plan


class TestSelfReplicationGuard:
    def test_self_ref_parented_rows_skip_own_index(self, spark):
        # reference skip_replication?, elastic.cr:214-218 + spec:11-19
        from search_ingest_spark.schema import ParentRelation, skip_self_replication

        rel = ParentRelation("selfref", "selfref", "parent_id")
        df = spark.createDataFrame(
            [("1", None), ("2", "1"), ("3", "")],
            "id string, parent_id string",
        )
        kept = skip_self_replication(df, "selfref", rel, "selfref")
        assert sorted(r["id"] for r in kept.collect()) == ["1", "3"]
        # different index → untouched
        other = skip_self_replication(df, "other_index", rel, "selfref")
        assert other.count() == 3
