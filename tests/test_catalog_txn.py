"""Transactional drop semantics (ADVICE r02, medium): a drop issued
inside begin()/commit() must be journaled, not immediate — a rollback
(or crash before the journal lands) has to leave the table intact so
incremental batches stay all-or-nothing (the splice drops doc_attrs
mid-transaction, streaming/incremental.py)."""

from __future__ import annotations

import pytest

from search_ingest_spark.catalog import Catalog


@pytest.fixture()
def cat(spark, tmp_path):
    c = Catalog(spark, str(tmp_path / "cat"))
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    c.write("t1", df)
    c.write("t2", df)
    return c


class TestTransactionalDrop:
    def test_drop_inside_txn_rolled_back(self, cat):
        cat.begin()
        cat.drop("t1")
        assert not cat.exists("t1")  # pending tombstone shadows reads
        cat.rollback()
        assert cat.exists("t1")
        assert cat.read("t1").count() == 2

    def test_drop_inside_txn_applied_at_commit(self, cat):
        cat.begin()
        cat.drop("t1")
        cat.commit()
        assert not cat.exists("t1")
        assert cat.exists("t2")

    def test_failed_txn_with_drop_keeps_everything(self, cat, spark):
        df = spark.createDataFrame([(9, "z")], "id long, v string")
        cat.begin()
        try:
            cat.write("t2", df)
            cat.drop("t1")
            raise RuntimeError("boom after the drop request")
        except RuntimeError:
            cat.rollback()
        # all-or-nothing: t1 survives AND t2 still has the old rows
        assert cat.exists("t1")
        assert cat.read("t2").count() == 2

    def test_drop_outside_txn_is_immediate(self, cat):
        cat.drop("t1")
        assert not cat.exists("t1")

    def test_crash_after_journal_rolls_drop_forward(self, cat, spark):
        # simulate: journal written (commit point reached) but process
        # died before applying — reopen must apply the tombstone
        import json
        import os

        cat.begin()
        cat.drop("t1")
        entries = cat._txn
        # write the journal exactly as commit() would, then "crash"
        with open(cat._txn_path(), "w") as fh:
            json.dump({"entries": entries}, fh)
        cat._txn = None
        assert os.path.isdir(cat._dir("t1"))
        reopened = Catalog(spark, cat.root)
        assert not reopened.exists("t1")
        assert reopened.exists("t2")


class TestCheckpoints:
    """Iceberg-tag-style time travel: checkpoint() pins snapshot
    generations; at() serves them read-only; cleanup retains pinned
    gens; vacuum() reclaims unpinned ones."""

    def test_at_serves_prewrite_state(self, cat, spark):
        cat.checkpoint("v1")
        df2 = spark.createDataFrame([(9, "z")], "id long, v string")
        cat.write("t1", df2)
        assert cat.read("t1").count() == 1          # live moved on
        snap = cat.at("v1")
        assert snap.read("t1").count() == 2         # pinned view intact
        assert {r["v"] for r in snap.read("t1").collect()} == {"a", "b"}

    def test_unpinned_generations_are_cleaned(self, cat, spark, tmp_path):
        import os

        df2 = spark.createDataFrame([(9, "z")], "id long, v string")
        cat.write("t1", df2)  # no checkpoint → old gen removed
        snaps = [d for d in os.listdir(str(tmp_path / "cat" / "t1"))
                 if d.startswith("snap-")]
        assert len(snaps) == 1

    def test_vacuum_after_delete_checkpoint(self, cat, spark, tmp_path):
        import os

        cat.checkpoint("v1")
        df2 = spark.createDataFrame([(9, "z")], "id long, v string")
        cat.write("t1", df2)
        t1dir = str(tmp_path / "cat" / "t1")
        assert len([d for d in os.listdir(t1dir)
                    if d.startswith("snap-")]) == 2  # retained
        assert cat.vacuum() == 0                     # still pinned
        cat.delete_checkpoint("v1")
        assert cat.vacuum() == 1
        assert len([d for d in os.listdir(t1dir)
                    if d.startswith("snap-")]) == 1
        assert cat.read("t1").count() == 1           # live unaffected

    def test_replace_partitions_retains_pinned_gen(self, cat, spark):
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            [(i, i % 2) for i in range(10)], "id long, p int")
        cat.write("pt", df.repartition(2, "p"), partition_by=["p"])
        cat.checkpoint("before")
        dirty = spark.createDataFrame(
            [(100 + i, 1) for i in range(3)], "id long, p int")
        cat.replace_partitions("pt", dirty.repartition(1, "p"), "p", [1])
        live = cat.read("pt")
        assert live.where(F.col("p") == 1).count() == 3
        old = cat.at("before").read("pt")
        assert old.where(F.col("p") == 1).count() == 5
        # clean partition is hardlink-shared, still identical
        assert old.where(F.col("p") == 0).count() == 5

    def test_checkpoint_overwrite_and_labels(self, cat, spark):
        cat.checkpoint("v1")
        with pytest.raises(ValueError):
            cat.checkpoint("../escape")
        assert cat.checkpoints() == ["v1"]
        cat.checkpoint("v1")  # overwrite ok
        cat.delete_checkpoint("nope")  # idempotent

    def test_dropped_table_reads_raise(self, cat):
        cat.checkpoint("v1")
        cat.drop("t1")
        snap = cat.at("v1")
        assert not snap.exists("t1")
        with pytest.raises(FileNotFoundError):
            snap.read("t1")

    def test_searcher_over_snapshot_view(self, spark, tmp_path):
        from search_ingest_spark.index.build import build_index
        from search_ingest_spark.query.wand import Searcher

        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet")
        c = Catalog(spark, str(tmp_path / "idx"))
        build_index(spark, docs, c, mode="simple", docs_per_shard=50)
        c.checkpoint("v1")
        want = [tuple(r) for r in Searcher(spark, c).topk(
            "spark data", 10, round_to=4).collect()]
        # rebuild over a MUTATED corpus; live results change, snapshot's
        # don't
        mutated = docs.withColumn(
            "text", __import__("pyspark.sql.functions",
                               fromlist=["concat"]).concat(
                docs.text, __import__("pyspark.sql.functions",
                                      fromlist=["lit"]).lit(" spark")))
        build_index(spark, mutated, c, mode="simple", docs_per_shard=50,
                    resume=False)
        live = [tuple(r) for r in Searcher(spark, c).topk(
            "spark data", 10, round_to=4).collect()]
        old = [tuple(r) for r in Searcher(spark, c.at("v1")).topk(
            "spark data", 10, round_to=4).collect()]
        assert old == want
        assert live != want


class TestPromoteAndVacuumGuards:
    """ADVICE r03: promote() must not consume checkpoint-pinned src
    generations or accept src == dst; vacuum() must refuse to run with
    uncommitted txn state (its keep-set would be computed from the txn
    shadow and could delete the committed current snapshot)."""

    def test_promote_src_eq_dst_rejected(self, cat):
        with pytest.raises(ValueError):
            cat.promote("t1", "t1")
        assert cat.read("t1").count() == 2  # table untouched

    def test_promote_preserves_pinned_src_view(self, cat, spark):
        cat.checkpoint("v1")  # pins t1's current gen
        cat.promote("t1", "t3")
        assert not cat.exists("t1")
        assert cat.read("t3").count() == 2
        # the checkpointed view of the PROMOTED-AWAY src still reads
        snap = cat.at("v1")
        assert snap.read("t1").count() == 2
        assert {r["v"] for r in snap.read("t1").collect()} == {"a", "b"}

    def test_promote_pinned_older_gen_survives(self, cat, spark):
        cat.checkpoint("v1")
        df2 = spark.createDataFrame([(9, "z")], "id long, v string")
        cat.write("t1", df2)  # current gen now unpinned, v1 pins old
        cat.promote("t1", "t3")
        assert cat.read("t3").count() == 1
        assert cat.at("v1").read("t1").count() == 2

    def test_vacuum_reclaims_promoted_src_after_unpin(self, cat, tmp_path):
        import os

        cat.checkpoint("v1")
        cat.promote("t1", "t3")
        t1dir = str(tmp_path / "cat" / "t1")
        assert os.path.isdir(t1dir)      # pinned gen left behind
        assert cat.vacuum() == 0         # still pinned
        cat.delete_checkpoint("v1")
        assert cat.vacuum() >= 1
        assert not os.path.isdir(t1dir)  # orphan dir swept

    def test_vacuum_inside_txn_refused(self, cat):
        cat.begin()
        try:
            with pytest.raises(RuntimeError):
                cat.vacuum()
        finally:
            cat.rollback()
        assert cat.read("t1").count() == 2
