"""Spark-free low-latency reader over the same index tables.

Spark executes the batch/throughput query path (query/wand.py); a
single interactive query, though, should not pay a Spark job's
scheduling latency (~0.3-0.5 s).  Because the index is plain columnar
tables with self-describing layout (hive-partitioned by shard, sorted
by term within files, block metadata in columns), any parquet reader
can serve it.  This module is that reader: pyarrow datasets + the SAME
NumPy block-max kernel (wand.shard_topk), so results are bitwise
identical to the Spark path — asserted in tests.

At 10^12-doc scale this is the "search head": it reads only the query
terms' row groups (predicate pushdown on term_id min/max statistics)
from the shards' parquet files; the shard fan-out would go to a pool of
such readers.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.compute as pc
import pyarrow.dataset as ds

from search_ingest_spark.catalog import Catalog
from search_ingest_spark.index import build as ib
from search_ingest_spark.query.bm25 import analyze_query
from search_ingest_spark.query.wand import shard_topk


class LocalSearcher:
    """Serve top-k queries from an index catalog without a SparkSession."""

    def __init__(self, cat: Catalog) -> None:
        self.cat = cat
        stats = ds.dataset(cat.data_path(ib.STATS_TABLE)).to_table().to_pylist()[0]
        self.n_docs = int(stats["n_docs"])
        self.avgdl = float(stats["avgdl"])
        self.mode = stats["analyzer"]
        self._dict = ds.dataset(cat.data_path(ib.TERM_DICT_TABLE))
        self._postings = ds.dataset(
            cat.data_path(ib.POSTINGS_TABLE), partitioning="hive"
        )

    def plan(self, query_text: str) -> dict[int, float]:
        terms = sorted(set(analyze_query(query_text, mode=self.mode)))
        if not terms:
            return {}
        tbl = self._dict.to_table(
            columns=["term_id", "df"],
            filter=pc.field("term").isin(terms),
        )
        n = self.n_docs
        return {
            int(tid): float(np.log(1.0 + (n - df + 0.5) / (df + 0.5)))
            for tid, df in zip(tbl["term_id"].to_pylist(), tbl["df"].to_pylist())
        }

    def topk(self, query_text: str, k: int = 10, *,
             match_all: bool = False) -> list[tuple[int, float, int]]:
        """[(doc_id, score, rank)] — bitwise identical to Searcher.topk."""
        idf = self.plan(query_text)
        n_terms = len(set(analyze_query(query_text, mode=self.mode)))
        if not idf or (match_all and len(idf) < n_terms):
            return []
        tbl = self._postings.to_table(
            filter=pc.field("term_id").isin([int(t) for t in idf]),
        )
        pdf = tbl.to_pandas()
        if len(pdf) == 0:
            return []
        frames = [
            shard_topk(g, idf=idf, k=k, avgdl=self.avgdl, match_all=match_all)
            for _, g in pdf.groupby("shard", sort=True)
        ]
        allr = pd.concat(frames, ignore_index=True)
        order = np.lexsort((allr["doc_id"].to_numpy(), -allr["score"].to_numpy()))[:k]
        out = allr.iloc[order]
        return [
            (int(d), float(s), i + 1)
            for i, (d, s) in enumerate(zip(out["doc_id"], out["score"]))
        ]
