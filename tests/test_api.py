"""Control-surface tests — analog of spec/api_spec.cr +
table_manager_spec.cr (health/version/ready; wrong-state → reindex)."""

from __future__ import annotations

import datetime as dt
import json
import subprocess
import sys

import pytest

from search_ingest_spark.api import SearchIngestService
from search_ingest_spark.catalog import Catalog


@pytest.fixture()
def svc(spark, tmp_path):
    return SearchIngestService(
        spark, Catalog(spark, str(tmp_path / "cat")), mode="simple",
        docs_per_shard=16,
    )


def _pages(spark, n=24):
    return spark.createDataFrame(
        [(f"u{i}", dt.datetime(2026, 1, 1), None, f"tok{i % 5} shared text", "en")
         for i in range(n)],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )


def test_version(svc):
    v = svc.version()
    assert v["service"] == "search_ingest_spark"
    assert v["spark"]


def test_health(svc):
    assert svc.healthy() is True


def test_ready_gates_on_backfill(spark, svc):
    assert svc.ready() is False
    assert svc.consistent() is False
    out = svc.backfill(_pages(spark))
    assert out["docs"] == 24
    assert svc.ready() is True
    assert svc.consistent() is True


def test_reindex_without_backfill_leaves_empty(spark, svc):
    svc.backfill(_pages(spark))
    out = svc.reindex(_pages(spark), backfill=False)
    assert out["docs"] == 0
    assert svc.ready() is False
    assert svc.consistent() is False  # dropped; next backfill restores
    svc.backfill(_pages(spark))
    assert svc.consistent() is True


@pytest.mark.slow
def test_cli_end_to_end(spark, tmp_path):
    """`python -m search_ingest_spark` — the spark-submit surface."""
    pages_path = str(tmp_path / "pages")
    _pages(spark, 30).write.parquet(pages_path)
    cat_dir = str(tmp_path / "cli_cat")
    env = {"SPARK_GRAFT_CPUS": "4"}
    import os

    full_env = {**os.environ, **env}
    r1 = subprocess.run(
        [sys.executable, "-m", "search_ingest_spark", "--catalog", cat_dir,
         "--pages", pages_path, "--backfill", "--mode", "simple",
         "--docs-per-shard", "16"],
        capture_output=True, text=True, timeout=300, env=full_env,
    )
    assert r1.returncode == 0, r1.stderr[-2000:]
    out = json.loads(r1.stdout.strip().splitlines()[-1])
    assert out["docs"] == 30
    r2 = subprocess.run(
        [sys.executable, "-m", "search_ingest_spark", "--catalog", cat_dir,
         "--query", "shared tok1", "-k", "5"],
        capture_output=True, text=True, timeout=300, env=full_env,
    )
    assert r2.returncode == 0, r2.stderr[-2000:]
    hits = json.loads(r2.stdout.strip().splitlines()[-1])["hits"]
    assert len(hits) == 5
    assert hits[0]["rank"] == 1


def test_health_recovery_triggers_backfill(spark, svc, monkeypatch):
    # api.cr:74-90: first healthy probe AFTER a failed one spawns a
    # repair backfill and clears the failure latch
    svc.backfill(_pages(spark))
    calls = []
    orig = svc.backfill
    monkeypatch.setattr(svc, "backfill", lambda p: calls.append(1) or orig(p))
    # healthy probe with no prior failure: no repair
    assert svc.health_probe(_pages(spark)) is True
    assert calls == []
    # simulate a failed probe (catalog read blows up)
    monkeypatch.setattr(svc, "healthy", lambda: False)
    assert svc.health_probe(_pages(spark)) is False
    assert svc.state.failed_healthcheck is True
    # health restored -> repair backfill fires once, latch clears
    monkeypatch.undo()
    monkeypatch.setattr(svc, "backfill", lambda p: calls.append(1) or orig(p))
    assert svc.health_probe(_pages(spark)) is True
    assert calls == [1]
    assert svc.state.failed_healthcheck is False
    assert svc.health_probe(_pages(spark)) is True
    assert calls == [1]  # no repeat without a new failure
