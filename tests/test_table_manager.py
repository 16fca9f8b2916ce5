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


def _coffee_changes(spark, rows):
    """rows: (id, temperature, programmer_id, op[, seq])"""
    if rows and len(rows[0]) == 5:
        return spark.createDataFrame(
            rows,
            "id string, temperature int, programmer_id string, _op string,"
            " seq long",
        )
    return spark.createDataFrame(
        rows, "id string, temperature int, programmer_id string, _op string"
    )


class TestApplyChanges:
    """Mirror of the reference's spec/table_spec.cr:14-45 lifecycle:
    Created → document exists in own index AND parent index (routed);
    Updated → replica mutated in both; Deleted → removed from both."""

    def test_created_event_replicates_to_parent(self, spark, mgr):
        mgr.initialise(_sources(spark))
        res = mgr.apply_changes(
            "beverage_coffee",
            _coffee_changes(spark, [("c5", 95, "p2", "upsert")]),
        )
        assert set(res) == {"beverage_coffee", "programmer"}
        own = mgr.cat.read(_doc_table("beverage_coffee"))
        assert own.where(F.col("id") == "c5").count() == 1
        rep = mgr.cat.read(_doc_table("programmer")).where(
            (F.col("_document_type") == "beverage_coffee") & (F.col("id") == "c5")
        ).collect()
        assert len(rep) == 1
        assert rep[0]["_routing"] == "p2"
        assert rep[0]["_join_field"]["parent"] == "p2"

    def test_updated_event_mutates_replica(self, spark, mgr):
        mgr.initialise(_sources(spark))
        mgr.apply_changes(
            "beverage_coffee",
            _coffee_changes(spark, [("c1", 10, "p1", "upsert")]),
        )
        for idx in ("beverage_coffee", "programmer"):
            rows = mgr.cat.read(_doc_table(idx)).where(
                (F.col("id") == "c1")
                & (F.col("_document_type") == "beverage_coffee")
            ).collect()
            assert len(rows) == 1 and rows[0]["temperature"] == 10, idx

    def test_deleted_event_removes_from_both_indices(self, spark, mgr):
        mgr.initialise(_sources(spark))
        mgr.apply_changes(
            "beverage_coffee",
            _coffee_changes(spark, [("c2", 70, "p1", "delete")]),
        )
        assert mgr.cat.read(_doc_table("beverage_coffee")).where(
            F.col("id") == "c2").count() == 0
        assert mgr.cat.read(_doc_table("programmer")).where(
            (F.col("id") == "c2")
            & (F.col("_document_type") == "beverage_coffee")
        ).count() == 0
        # the parent doc itself is untouched
        assert mgr.cat.read(_doc_table("programmer")).where(
            F.col("id") == "p1").count() == 1

    def test_null_fk_upsert_not_replicated(self, spark, mgr):
        mgr.initialise(_sources(spark))
        mgr.apply_changes(
            "beverage_coffee",
            _coffee_changes(spark, [("c6", 42, None, "upsert")]),
        )
        assert mgr.cat.read(_doc_table("beverage_coffee")).where(
            F.col("id") == "c6").count() == 1
        assert mgr.cat.read(_doc_table("programmer")).where(
            F.col("id") == "c6").count() == 0

    def test_last_writer_wins_with_order_col(self, spark, mgr):
        mgr.initialise(_sources(spark))
        mgr.apply_changes(
            "beverage_coffee",
            _coffee_changes(spark, [
                ("c1", 99, "p1", "upsert", 1),
                ("c1", 11, "p1", "delete", 2),
                ("c3", 33, "p2", "delete", 1),
                ("c3", 44, "p2", "upsert", 2),
            ]),
            order_col="seq",
        )
        own = mgr.cat.read(_doc_table("beverage_coffee"))
        assert own.where(F.col("id") == "c1").count() == 0     # delete won
        c3 = own.where(F.col("id") == "c3").collect()
        assert len(c3) == 1 and c3[0]["temperature"] == 44     # upsert won

    def test_untouched_buckets_not_rewritten(self, spark, mgr):
        import os

        mgr.initialise(_sources(spark))

        def inodes(tbl):
            d = mgr.cat.data_path(tbl)
            out = {}
            for part in os.listdir(d):
                sub = os.path.join(d, part)
                if os.path.isdir(sub):
                    out[part] = {
                        f: os.stat(os.path.join(sub, f)).st_ino
                        for f in os.listdir(sub) if f.endswith(".parquet")
                    }
            return out

        before = inodes(_doc_table("programmer"))
        mgr.apply_changes(
            "beverage_coffee",
            _coffee_changes(spark, [("c1", 10, "p1", "upsert")]),
        )
        after = inodes(_doc_table("programmer"))
        dirty = spark.createDataFrame([("p1",)], "r string").select(
            F.pmod(F.xxhash64("r"), F.lit(mgr.n_routing_buckets)).cast("int")
        ).first()[0]
        clean = [p for p in before if p != f"_rbucket={dirty}"]
        assert all(before[p] == after[p] for p in clean)


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


class TestFkChangeSemantics:
    def test_fk_change_reroutes_like_es(self, spark, mgr):
        """An update that CHANGES the parent FK re-routes the replica;
        like ES join-field routing (which the reference inherits), the
        copy under the OLD routing is only cleaned up if the old and new
        routing values land in the same routing bucket."""
        mgr.initialise(_sources(spark))
        mgr.apply_changes(
            "beverage_coffee",
            _coffee_changes(spark, [("c1", 61, "p2", "upsert")]),  # was p1
        )
        rows = mgr.cat.read(_doc_table("programmer")).where(
            (F.col("id") == "c1")
            & (F.col("_document_type") == "beverage_coffee")
        ).collect()
        fresh = [r for r in rows if r["_routing"] == "p2"]
        assert len(fresh) == 1 and fresh[0]["temperature"] == 61
        b = {
            r["r"]: r["b"]
            for r in spark.createDataFrame([("p1",), ("p2",)], "r string")
            .select("r", F.pmod(F.xxhash64("r"),
                                F.lit(mgr.n_routing_buckets)).cast("int")
                    .alias("b")).collect()
        }
        stale = [r for r in rows if r["_routing"] == "p1"]
        assert len(stale) == (1 if b["p1"] != b["p2"] else 0)


class TestRandomizedChangefeed:
    def test_sequences_match_dict_model(self, spark, tmp_path):
        """Model-based property test: random create/update/delete
        sequences (fixed FK per id so routing never changes) applied via
        apply_changes must leave both indices exactly equal to a plain
        last-writer-wins dict model."""
        import random

        from search_ingest_spark.catalog import Catalog

        rng = random.Random(42)
        mgr = TableManager(spark, Catalog(spark, str(tmp_path / "rtm")),
                           _schemas())
        mgr.initialise({
            "programmer": _sources(spark)["programmer"],
            "beverage_coffee": spark.createDataFrame(
                [], "id string, temperature int, programmer_id string"),
            "selfref": spark.createDataFrame(
                [], "id string, name string, parent_id string"),
        })
        ids = [f"c{i}" for i in range(6)]
        fk_of = {i: rng.choice(["p1", "p2", None]) for i in ids}
        model: dict[str, tuple] = {}
        seq = 0
        for _batch in range(4):
            events = []
            by_id: dict[str, tuple] = {}
            for _ in range(10):
                cid = rng.choice(ids)
                seq += 1
                if rng.random() < 0.3:
                    ev = (cid, 0, fk_of[cid], "delete", seq)
                else:
                    ev = (cid, rng.randint(1, 99), fk_of[cid], "upsert", seq)
                events.append(ev)
                by_id[cid] = ev  # later seq wins (events appended in order)
            mgr.apply_changes("beverage_coffee",
                              _coffee_changes(spark, events), order_col="seq")
            for cid, ev in by_id.items():
                if ev[3] == "delete":
                    model.pop(cid, None)
                else:
                    model[cid] = (ev[1], ev[2])

        own = {
            r["id"]: (r["temperature"], r["programmer_id"])
            for r in mgr.cat.read(_doc_table("beverage_coffee"))
            .where(F.col("_document_type") == "beverage_coffee").collect()
        }
        assert own == model
        replicas = {
            r["id"]: (r["temperature"], r["_routing"])
            for r in mgr.cat.read(_doc_table("programmer"))
            .where(F.col("_document_type") == "beverage_coffee").collect()
        }
        expected_replicas = {
            cid: (temp, fk) for cid, (temp, fk) in model.items()
            if fk is not None
        }
        assert replicas == expected_replicas
