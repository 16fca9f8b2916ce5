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
