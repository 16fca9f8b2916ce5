"""r07 second-half probes: per-operator walls on the sf0.1 corpus
(guide §1 — isolate with noop-style actions, label jobs).  Does NOT
touch bench.py; cites into OPTIMIZATION_r07.md."""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from search_ingest_spark.catalog import Catalog
    from search_ingest_spark.index.build import build_index
    from search_ingest_spark.session import get_spark

    spark = get_spark("prof_r07b", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)

    def noop(it):
        yield from it

    spark.range(CPUS * 4, numPartitions=CPUS * 4).mapInPandas(
        noop, "id long").count()
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    tmp = tempfile.mkdtemp(prefix="sis_prof_", dir=base)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = {}

    sc = spark.sparkContext

    def timed(name, fn, reps=1):
        walls = []
        for _ in range(reps):
            sc.setJobDescription(name)
            t0 = time.time()
            fn()
            walls.append(round(time.time() - t0, 3))
        sc.setJobDescription(None)
        out[name] = min(walls) if reps > 1 else walls[0]
        print(f"{name}: {walls}", flush=True)

    cat = Catalog(spark, os.path.join(tmp, "idx_docs_sf"))
    timed("build_simple", lambda: build_index(
        spark, docs, cat, mode="simple", resume=False))
    with open(os.path.join(cat.root, "build_state.json")) as fh:
        st = json.load(fh)
    print("  stages(ms):", {k: v.get("wall_ms")
                            for k, v in st["stages"].items()}, flush=True)

    from search_ingest_spark.query.wand import Searcher
    s = Searcher(spark, cat)
    s.topk("data", 10).collect()
    timed("wand_topk_warm", lambda: s.topk("spark query data", 10).collect(),
          reps=5)

    from search_ingest_spark.ops import dedup, textstats
    timed("dedup_exact", lambda: dedup.exact_duplicates(docs).count(), reps=2)
    timed("minhash_sigs", lambda: dedup.minhash_signatures(docs).count(),
          reps=2)
    timed("minhash_lsh",
          lambda: dedup.minhash_lsh_pairs(docs, threshold=0.8).count(), reps=2)
    from search_ingest_spark.query import bm25
    timed("bm25_brute", lambda: bm25.bm25_brute_force(
        docs, "spark query data", 10, mode="simple").collect(), reps=2)
    timed("text_quality", lambda: textstats.quality_score(docs).count())

    catp = Catalog(spark, os.path.join(tmp, "idx_docs_pos"))
    timed("build_pos", lambda: build_index(
        spark, docs, catp, mode="simple", resume=False, with_positions=True))
    from search_ingest_spark.query.phrase import PhraseSearcher
    ph = PhraseSearcher(spark, catp)
    ph.topk("table hash", 10).collect()
    timed("phrase_topk_warm",
          lambda: ph.topk("part filter", 10, round_to=4).collect(), reps=5)

    catq = Catalog(spark, os.path.join(tmp, "idx_docs_q"))
    timed("build_quant", lambda: build_index(
        spark, docs, catq, mode="simple", resume=False, quantize=True))

    print(json.dumps(out))
    import shutil
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
