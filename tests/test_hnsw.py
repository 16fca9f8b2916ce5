"""Deterministic HNSW (ops/hnsw.py): build determinism, persistable
roundtrip, connectivity, recall pins for the registered driver
parameters, and the bit-exact FAISS-style coarse-quantizer
composition over the pinned IVF centroids."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq
import pytest

from search_ingest_spark.ops import hnsw
from search_ingest_spark.ops.ivf_pinned import IVF_CENTROIDS

SF = "/root/testdata/sf0.001"
SF_C = "/root/testdata/sf0.01"


def _vectors(sf_dir):
    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    X = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    # normalized copy: squared-L2 order == cosine order, exactly
    return X / np.linalg.norm(X, axis=1, keepdims=True)


@pytest.fixture(scope="module")
def X():
    return _vectors(SF)


@pytest.fixture(scope="module")
def graph(X):
    return hnsw.build(X)


class TestBuild:
    def test_deterministic(self, X, graph):
        again = hnsw.build(X)
        assert graph.to_rows() == again.to_rows()
        assert (graph.entry, graph.entry_level) == (again.entry,
                                                    again.entry_level)

    def test_rows_roundtrip(self, X, graph):
        back = hnsw.HnswGraph.from_rows(graph.to_rows())
        q = X[3] + 0.01
        assert hnsw.search(back, X, q, 10, ef=64) == \
            hnsw.search(graph, X, q, 10, ef=64)

    def test_degree_bounded(self, graph):
        for layer in graph.layers:
            for nbs in layer.values():
                assert len(nbs) <= graph.m

    def test_layer0_connected(self, X, graph):
        # BFS from the entry over layer 0: every node reachable →
        # ef=n search is structurally exact, not just empirically
        seen = {graph.entry}
        frontier = [graph.entry]
        while frontier:
            nxt = []
            for n in frontier:
                for nb in graph.layers[0][n]:
                    if nb not in seen:
                        seen.add(nb)
                        nxt.append(nb)
            frontier = nxt
        assert len(seen) == len(X)

    def test_empty_rejected(self):
        with pytest.raises(ValueError):
            hnsw.build(np.zeros((0, 4)))


class TestPersistence:
    def test_catalog_roundtrip_search_identical(self, spark, X, graph,
                                                tmp_path_factory):
        # parquet typing (array<long>) + meta sidecar + pyarrow reload
        # must reproduce the in-memory graph's searches exactly
        from search_ingest_spark.catalog import Catalog

        cat = Catalog(spark, str(tmp_path_factory.mktemp("hnswp")))
        hnsw.persist_graph(spark, cat, graph)
        back = hnsw.load_graph(cat)
        assert back.to_rows() == graph.to_rows()
        assert (back.m, back.seed) == (graph.m, graph.seed)
        rng = np.random.default_rng(5)
        for _ in range(3):
            q = rng.normal(size=X.shape[1])
            assert hnsw.search(back, X, q, 10, ef=96) == \
                hnsw.search(graph, X, q, 10, ef=96)


class TestRecall:
    def _exact(self, X, q, k=10):
        d = ((X - q) ** 2).sum(axis=1)
        order = np.lexsort((np.arange(len(X)), d))
        return list(order[:k])

    @pytest.mark.parametrize("sf", [SF, SF_C])
    def test_driver_query_exact_at_registered_params(self, sf):
        # the ann_hnsw_topk driver entry's contract: ef=128 beam ⊇ the
        # true top-10 for the pinned query at the driver's scales
        Xn = _vectors(sf)
        g = hnsw.build(Xn)
        q = np.zeros(Xn.shape[1])
        q[0] = 1.0
        q = q / np.linalg.norm(q)
        got = [i for i, _ in hnsw.search(g, Xn, q, 10, ef=128)]
        assert got == self._exact(Xn, q)

    def test_mean_recall_random_queries(self, X, graph):
        rng = np.random.default_rng(7)
        recs = []
        for _ in range(20):
            q = rng.normal(size=X.shape[1])
            q = q / np.linalg.norm(q)
            got = {i for i, _ in hnsw.search(graph, X, q, 10, ef=96)}
            recs.append(len(got & set(self._exact(X, q))) / 10)
        assert sum(recs) / len(recs) >= 0.9  # measured ~0.995

    def test_ef_full_is_exact(self, X, graph):
        # with ef = n and a connected layer 0 (pinned above), the beam
        # IS an exact scan — the structural exactness hnsw_nprobe uses
        rng = np.random.default_rng(11)
        for _ in range(5):
            q = rng.normal(size=X.shape[1])
            got = [i for i, _ in hnsw.search(graph, X, q, 10, ef=len(X))]
            assert got == self._exact(X, q)


class TestCoarseQuantizer:
    def test_nprobe_matches_argsort_exactly(self):
        C = np.array(IVF_CENTROIDS, dtype=np.float64)
        g = hnsw.build(C)
        rng = np.random.default_rng(3)
        for _ in range(10):
            q = rng.normal(size=C.shape[1])
            for nprobe in (1, 3, 6):
                got = hnsw.hnsw_nprobe(C, q, nprobe, graph=g)
                d = ((C - q) ** 2).sum(axis=1)
                want = list(np.lexsort((np.arange(len(C)), d))[:nprobe])
                assert got == want
