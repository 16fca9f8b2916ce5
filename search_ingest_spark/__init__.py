"""search_ingest_spark — a PySpark-native full-text indexing + BM25 query engine.

A from-scratch re-expression of the capabilities of PlaceOS/search-ingest
(reference at /root/reference, Crystal): the reference mirrors PostgreSQL
tables into Elasticsearch and delegates the inverted index + BM25 to ES
7.17.  This engine implements BOTH halves natively on Spark:

- ingest dataflow (schema mapping, backfill, changefeed merge, parent/child
  routing fan-out) — reference `src/search-ingest/table.cr`, `elastic.cr`,
  `schemas.cr`;
- the index/query half the reference delegates to Elasticsearch
  (analyzer, inverted-index build, posting compression, BM25 top-k with
  block-max WAND) — configured at `src/search-ingest/schemas.cr:62-77`.

Architecture is Spark-first: DataFrame/SQL plans optimized by Catalyst,
vectorized Arrow UDFs for the per-row text path, doc-range-sharded index
tables persisted as Parquet (Iceberg seam in `catalog.py`).
"""

__version__ = "0.1.0"

from search_ingest_spark.session import get_spark  # noqa: F401
