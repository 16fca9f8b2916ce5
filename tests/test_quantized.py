"""Impact-quantized postings (scoring mode 2, VERDICT r02 item 3):
codec roundtrip, build-stage output, kernel-vs-oracle identity, and the
storage/decode-volume win over the exact postings."""

from __future__ import annotations

import numpy as np
import pytest

from search_ingest_spark.catalog import Catalog
from search_ingest_spark.index import build as ib
from search_ingest_spark.index.codec import (
    IMPACT_SCALE,
    decode_impact_block,
    encode_impact_blocks_bulk,
)
from search_ingest_spark.query.bm25 import bm25_quantized_oracle_sql
from search_ingest_spark.query.wand import Searcher

SF = "/root/testdata/sf0.001"

QUERIES = ["data", "spark query data", "customer window batch"]


class TestImpactCodec:
    def test_roundtrip_single_block(self):
        docs = np.array([7, 9, 12, 400, 401], dtype=np.int64)
        q = np.array([3, 220, 0, 17, 99], dtype=np.int64)
        blobs = encode_impact_blocks_bulk(
            docs, q, np.array([0]), np.array([5])
        )
        d, qq = decode_impact_block(blobs[0], 7, 5)
        assert d.tolist() == docs.tolist()
        assert qq.tolist() == q.tolist()

    def test_roundtrip_multi_block(self):
        rng = np.random.default_rng(7)
        docs = np.cumsum(rng.integers(1, 50, size=300)).astype(np.int64)
        q = rng.integers(0, 221, size=300).astype(np.int64)
        starts = np.array([0, 128, 256])
        ends = np.array([128, 256, 300])
        blobs = encode_impact_blocks_bulk(docs, q, starts, ends)
        for blob, s, e in zip(blobs, starts, ends):
            d, qq = decode_impact_block(blob, int(docs[s]), int(e - s))
            assert d.tolist() == docs[s:e].tolist()
            assert qq.tolist() == q[s:e].tolist()

    def test_quantize_matches_sql_floor(self):
        # the build-time kernel and a DuckDB replay of the same floor
        # must agree exactly on q for a grid of (tf, dl, avgdl)
        import duckdb

        tf = np.array([1, 2, 3, 10, 100], dtype=np.int64)
        dl = np.array([5, 50, 500, 7, 1234], dtype=np.int64)
        avgdl = 123.456789
        got = ib.quantize_impacts(tf, dl, avgdl)
        from search_ingest_spark.query.bm25 import B, K1

        rows = duckdb.sql(
            f"""
            SELECT floor((tf * ({K1} + 1.0)
                   / (tf + {K1} * (1.0 - {B} + {B} * dl / {avgdl!r})))
                   * {float(IMPACT_SCALE)!r})::BIGINT
            FROM (SELECT unnest({tf.tolist()}) AS tf,
                         unnest({dl.tolist()}) AS dl)
            """
        ).fetchall()
        assert [r[0] for r in rows] == got.tolist()


@pytest.fixture(scope="module")
def qindex(spark, tmp_path_factory):
    cat = Catalog(spark, str(tmp_path_factory.mktemp("qidx")))
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    ib.build_index(spark, docs, cat, mode="simple", quantize=True)
    return cat


class TestQuantizedPath:
    def test_postings_q_exists_and_smaller(self, spark, qindex):
        import pyspark.sql.functions as F

        pq = qindex.read(ib.POSTINGS_Q_TABLE)
        p = qindex.read(ib.POSTINGS_TABLE)
        bytes_q = pq.agg(F.sum(F.length("data"))).first()[0]
        bytes_e = p.agg(F.sum(F.length("data"))).first()[0]
        # no tf/dl varint streams → strictly smaller decoded volume
        assert bytes_q < bytes_e
        assert pq.count() == p.count()  # same block boundaries

    @pytest.mark.parametrize("q", QUERIES)
    def test_quantized_topk_matches_oracle(self, spark, qindex, q):
        import duckdb

        s = Searcher(spark, qindex)
        got = [
            (r["doc_id"], r["score"], r["rank"])
            for r in s.topk_quantized(q, 10, round_to=4).collect()
        ]
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{SF}/documents.parquet')"
        )
        want = [
            (int(d), float(sc), int(rk))
            for d, sc, rk in con.execute(
                bm25_quantized_oracle_sql(q, k=10)
            ).fetchall()
        ]
        assert got == want

    def test_quantized_close_to_exact(self, spark, qindex):
        # quantization noise is bounded: the top-1 doc's quantized score
        # is within 1% of its exact score
        s = Searcher(spark, qindex)
        exact = {r["doc_id"]: r["score"]
                 for r in s.topk("spark query data", 10).collect()}
        quant = {r["doc_id"]: r["score"]
                 for r in s.topk_quantized("spark query data", 10).collect()}
        common = set(exact) & set(quant)
        assert len(common) >= 5  # rankings largely agree
        for d in common:
            assert abs(exact[d] - quant[d]) <= 0.01 * max(exact[d], 1e-9)

    def test_unknown_term_empty(self, spark, qindex):
        s = Searcher(spark, qindex)
        assert s.topk_quantized("zzzzqqqq", 10).count() == 0


class TestLocalQuantized:
    """Spark-free serving of the quantized mode must be bitwise
    identical to the Spark path — same contract as LocalSearcher.topk."""

    @pytest.mark.parametrize("q", QUERIES)
    def test_matches_spark_path_bitwise(self, spark, qindex, q):
        from search_ingest_spark.query.reader import LocalSearcher

        s = Searcher(spark, qindex)
        ls = LocalSearcher(qindex)
        for round_to in (None, 4):
            want = [tuple(r) for r in
                    s.topk_quantized(q, 10, round_to=round_to).collect()]
            assert ls.topk_quantized(q, 10, round_to=round_to) == want

    def test_unknown_term_empty(self, qindex):
        from search_ingest_spark.query.reader import LocalSearcher

        assert LocalSearcher(qindex).topk_quantized("zzzzqqqq", 10) == []
