"""Single-version probe for the interleaved commit-A/B bench.

Run as a subprocess with PYTHONPATH pointing at ONE checked-out
version of the engine (a git worktree for r01/r02, the live tree for
HEAD); prints one JSON line of timings.  Used by ab_run.py to settle
VERDICT r02 "What's wrong #3": whether the r01→r02 latency deltas in
the driver benches were code or host noise.  Same corpus, same
window, versions interleaved, min-of-N per metric.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

SF_DIR = sys.argv[1]
TAG = sys.argv[2]
TMP = sys.argv[3]

WQ = ["data", "spark query data", "customer window batch",
      "table scan fast row", "hash join agg"]
REPEATS = 5


def main() -> None:
    from search_ingest_spark.session import get_spark

    spark = get_spark(f"ab_{TAG}", master="local[32]",
                      shuffle_partitions=32)

    def noop(it):
        yield from it

    spark.range(128, numPartitions=128).mapInPandas(noop, "id long").count()

    from search_ingest_spark.catalog import Catalog
    from search_ingest_spark.index.build import build_index
    from search_ingest_spark.ops import dedup, similarity
    from search_ingest_spark.query import bm25
    from search_ingest_spark.query.reader import LocalSearcher
    from search_ingest_spark.query.wand import Searcher

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    out: dict[str, float] = {}

    cat = Catalog(spark, os.path.join(TMP, f"idx_{TAG}_{os.getpid()}"))
    t0 = time.time()
    build_index(spark, docs, cat, mode="simple", resume=False)
    out["index_build"] = round(time.time() - t0, 3)

    s = Searcher(spark, cat)
    s.topk(WQ[0], 10).collect()  # warm
    lat: list[float] = []
    for q in WQ:
        for _ in range(REPEATS):
            t0 = time.time()
            s.topk(q, 10).collect()
            lat.append(time.time() - t0)
    lat.sort()
    out["wand_p50"] = round(statistics.median(lat), 4)
    out["wand_p95"] = round(lat[int(len(lat) * 0.95) - 1], 4)

    ls = LocalSearcher(cat)
    ls.topk(WQ[0], 10)  # warm
    lat = []
    for q in WQ:
        for _ in range(REPEATS):
            t0 = time.time()
            ls.topk(q, 10)
            lat.append(time.time() - t0)
    lat.sort()
    out["local_p50"] = round(statistics.median(lat), 4)
    out["local_p95"] = round(lat[int(len(lat) * 0.95) - 1], 4)

    t0 = time.time()
    bm25.bm25_brute_force(docs, "spark query data", 10, mode="simple").collect()
    out["bm25_brute"] = round(time.time() - t0, 3)

    t0 = time.time()
    dedup.exact_duplicates(docs).count()
    out["dedup_exact"] = round(time.time() - t0, 3)

    t0 = time.time()
    dedup.minhash_signatures(docs).count()
    out["minhash_sig"] = round(time.time() - t0, 3)

    t0 = time.time()
    dedup.minhash_lsh_pairs(docs, threshold=0.8).count()
    out["minhash_lsh"] = round(time.time() - t0, 3)

    t0 = time.time()
    similarity.brute_force_topk(emb, [1.0] + [0.0] * 63, 10).collect()
    out["ann_brute"] = round(time.time() - t0, 3)

    # phrase probe (VERDICT r5 item 2: attribute the +55% r4→r5
    # phrase_topk_p95 window delta) — same build/queries as bench.py
    from search_ingest_spark.query.phrase import PhraseSearcher

    catp = Catalog(spark, os.path.join(TMP, f"idxp_{TAG}_{os.getpid()}"))
    t0 = time.time()
    build_index(spark, docs, catp, mode="simple", resume=False,
                with_positions=True)
    out["index_build_pos"] = round(time.time() - t0, 3)
    ph = PhraseSearcher(spark, catp)
    ph.topk("table hash", 10).collect()  # warm
    latp: list[float] = []
    for q in ["table hash", "part filter", "merge group"]:
        for _ in range(REPEATS):
            t0 = time.time()
            ph.topk(q, 10, round_to=4).collect()
            latp.append(time.time() - t0)
    latp.sort()
    out["phrase_p50"] = round(statistics.median(latp), 4)
    out["phrase_p95"] = round(latp[int(len(latp) * 0.95) - 1], 4)

    print(json.dumps({"tag": TAG, **out}))


if __name__ == "__main__":
    main()
