"""Driver-facing query registry: every implemented operator from
SURVEY.md §2 exposed as (spark, sf_dir) → DataFrame, each with a DuckDB
oracle SQL string (identical column names/types) where SQL-expressible.

Conventions that keep the driver's value-hash comparison exact:
- every computed column is aliased identically on both sides;
- floating-point aggregates are rounded (round_to=4) on both sides;
- ties are broken on a unique key AFTER rounding so ranks/limits agree.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from search_ingest_spark.query import bm25

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE_SQL: dict[str, str] = {}


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def register(name: str, sql: str | None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLE_SQL[name] = sql
        return fn

    return deco


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    return QUERIES["bm25_topk_multi"](spark, sf_dir)


# ---------------------------------------------------------------------------
# B7/B8 — BM25 top-k (brute-force DataFrame path; oracle = same math in SQL)
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
