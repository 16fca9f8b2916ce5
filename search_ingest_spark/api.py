"""Control surface — the reference's REST API re-expressed as plain
Python entry points (SURVEY §2 A25-A27, §3.3).

Reference routes (`/root/reference/src/api.cr:25-90`):
- POST /reindex?backfill=bool  → drop+recreate indices, optionally refill
- POST /backfill               → bulk-refill all indices
- GET  /ready                  → readiness (initial load complete)
- GET  /                       → health (ES + PG probes)
- GET  /version                → build metadata

Spark-native equivalents operate on a PageIndexer + Catalog; health is
a trivial `SELECT 1` + catalog probe (the reference's connection-pool /
retry machinery is subsumed by Spark task retry, SURVEY §4).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

import search_ingest_spark
from search_ingest_spark.catalog import Catalog
from search_ingest_spark.index import build as ib
from search_ingest_spark.streaming.incremental import PageIndexer


@dataclass
class ServiceState:
    load_complete: bool = False
    last_error: str | None = None
    started_at: float = field(default_factory=time.time)
    failed_healthcheck: bool = False


class SearchIngestService:
    """Lifecycle facade: init indices → (reindex) → backfill → watch —
    mirroring TableManager's boot order (`table_manager.cr:31-53`)."""

    def __init__(self, spark: SparkSession, cat: Catalog, *, mode: str = "standard",
                 docs_per_shard: int = 100_000) -> None:
        self.spark = spark
        self.cat = cat
        self.indexer = PageIndexer(spark, cat, mode=mode,
                                   docs_per_shard=docs_per_shard)
        self.state = ServiceState()

    # -- POST /backfill -----------------------------------------------------
    def backfill(self, pages: DataFrame) -> dict:
        info = self.indexer.backfill(pages)
        self.state.load_complete = True
        return {"docs": info.n_docs, "shards": info.n_shards,
                "stages_run": info.stages_run}

    # -- POST /reindex?backfill= ---------------------------------------------
    def reindex(self, pages: DataFrame, *, backfill: bool = True) -> dict:
        if not backfill:
            # schema-only recreate: wipe index tables, declare fresh
            self.cat.drop_all()
            self.state.load_complete = False
            return {"docs": 0, "reindexed": True}
        info = self.indexer.reindex(pages)
        self.state.load_complete = True
        return {"docs": info.n_docs, "reindexed": True}

    # -- consistency check (table.cr:190-204) --------------------------------
    def consistent(self) -> bool:
        return all(
            self.cat.exists(t)
            for t in (ib.POSTINGS_TABLE, ib.TERM_DICT_TABLE, ib.STATS_TABLE)
        )

    # -- GET /ready -----------------------------------------------------------
    def ready(self) -> bool:
        return self.state.load_complete

    # -- GET / (health) --------------------------------------------------------
    def healthy(self) -> bool:
        try:
            assert self.spark.sql("SELECT 1").first()[0] == 1
            self.cat.list_tables()
            return True
        except Exception as exc:  # noqa: BLE001 — health probe maps any failure
            self.state.last_error = str(exc)
            return False

    def health_probe(self, pages: DataFrame | None = None) -> bool:
        """The reference's self-healing health route (api.cr:74-90): a
        probe after a FAILED one triggers a backfill to repair any state
        missed while unhealthy, then clears the failure latch.  `pages`
        is the corpus source for the repair backfill (the reference
        re-reads PostgreSQL); with pages=None the latch still clears but
        no repair runs."""
        if not self.state.load_complete:
            return True
        if not self.healthy():
            self.state.failed_healthcheck = True
            return False
        if self.state.failed_healthcheck:
            self.state.failed_healthcheck = False
            if pages is not None:
                # repair: health restored after a failure window
                self.backfill(pages)
        return True

    # -- GET /version ------------------------------------------------------------
    def version(self) -> dict:
        return {
            "service": "search_ingest_spark",
            "version": search_ingest_spark.__version__,
            "spark": self.spark.version,
            "uptime_s": round(time.time() - self.state.started_at, 1),
        }
