"""TableManager tests — the analog of the reference's
spec/table_manager_spec.cr (wrong schema → boot fixes it) and
spec/elastic_spec.cr association/routing suite (child docs replicated
into the parent index with join fields + routing)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from search_ingest_spark.catalog import Catalog
from search_ingest_spark.schema import FieldSpec, ParentRelation, TableSchema
from search_ingest_spark.tables import TableManager, _doc_table


def _schemas():
    programmer = TableSchema(
        "programmer",
        [FieldSpec("id", T.StringType(), nullable=False),
         FieldSpec("name", T.StringType())],
    )
    coffee = TableSchema(
        "beverage_coffee",
        [FieldSpec("id", T.StringType(), nullable=False),
         FieldSpec("temperature", T.IntegerType()),
         FieldSpec("programmer_id", T.StringType())],
        parents=[ParentRelation("programmer", "programmer", "programmer_id")],
    )
    selfref = TableSchema(
        "selfref",
        [FieldSpec("id", T.StringType(), nullable=False),
         FieldSpec("name", T.StringType()),
         FieldSpec("parent_id", T.StringType())],
        parents=[ParentRelation("selfref", "selfref", "parent_id")],
    )
    return {s.name: s for s in (programmer, coffee, selfref)}


def _sources(spark):
    return {
        "programmer": spark.createDataFrame(
            [("p1", "alice"), ("p2", "bob")], "id string, name string"
        ),
        "beverage_coffee": spark.createDataFrame(
            [("c1", 60, "p1"), ("c2", 70, "p1"), ("c3", 80, "p2"),
             ("c4", 90, None)],
            "id string, temperature int, programmer_id string",
        ),
        "selfref": spark.createDataFrame(
            [("s1", "root", None), ("s2", "child", "s1")],
            "id string, name string, parent_id string",
        ),
    }


@pytest.fixture()
def mgr(spark, tmp_path):
    return TableManager(spark, Catalog(spark, str(tmp_path / "tm")), _schemas())


class TestBackfill:
    def test_parent_index_contains_children_replicas(self, spark, mgr):
        counts = mgr.initialise(_sources(spark))
        # programmer index: 2 own + 3 coffees with non-null FK
        # (c4 has no parent → not replicated, elastic.cr:271)
        assert counts["programmer"] == 5
        df = mgr.cat.read(_doc_table("programmer"))
        kids = df.where(F.col("_document_type") == "beverage_coffee").collect()
        assert len(kids) == 3
        for k in kids:
            assert k["_routing"] == k["programmer_id"]          # shard routing
            assert k["_join_field"]["name"] == "beverage_coffee"
            assert k["_join_field"]["parent"] == k["programmer_id"]

    def test_child_own_index_untouched(self, spark, mgr):
        counts = mgr.initialise(_sources(spark))
        assert counts["beverage_coffee"] == 4  # all rows, incl. orphan c4

    def test_selfref_skips_own_index_when_parented(self, spark, mgr):
        # elastic.cr:214-218 + spec/elastic_spec.cr:11-19: s2 (parented)
        # must appear ONCE in the selfref index — as the routed replica,
        # not as a plain self row too
        counts = mgr.initialise(_sources(spark))
        df = mgr.cat.read(_doc_table("selfref"))
        s2 = df.where(F.col("id") == "s2").collect()
        assert len(s2) == 1
        assert s2[0]["_routing"] == "s1"
        assert counts["selfref"] == 2

    def test_parent_rows_have_null_join_parent(self, spark, mgr):
        mgr.initialise(_sources(spark))
        df = mgr.cat.read(_doc_table("programmer"))
        own = df.where(F.col("_document_type") == "programmer").collect()
        assert all(r["_join_field"]["parent"] is None for r in own)
        assert all(r["_routing"] == r["id"] for r in own)


class TestConsistency:
    def test_boot_fixes_wrong_schema(self, spark, mgr):
        # table_manager_spec.cr:9-48 — wrong mapping applied → manager
        # boots → correct schema in place and data restored
        src = _sources(spark)
        mgr.initialise(src)
        assert mgr.consistent_indices()
        # sabotage: overwrite one index with a wrong schema
        mgr.cat.write(
            _doc_table("programmer"),
            spark.createDataFrame([(1, "x")], "wrong_col int, other string"),
        )
        assert not mgr.consistent_index("programmer")
        counts = mgr.initialise(src)
        assert mgr.consistent_indices()
        assert counts["programmer"] == 5

    def test_initialise_without_backfill(self, spark, mgr):
        out = mgr.initialise(_sources(spark), backfill=False)
        assert out == {}
