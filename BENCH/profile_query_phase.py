"""Profile the bench query phase piece by piece (guide §1).

Runs the same operations bench.py times at SPARK_GRAFT_SF_DIR, but with
per-step wall clocks, Spark job descriptions, and (for the index build)
the per-stage wall_ms from build_state.json — so we can see where the
seconds go before changing anything.  Does NOT touch bench.py.
"""
from __future__ import annotations

import json
import os
import shutil
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

    t_all = time.time()
    spark = get_spark("profile_q", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)

    def noop(it):
        yield from it

    spark.range(CPUS * 4, numPartitions=CPUS * 4).mapInPandas(
        noop, "id long").count()
    print(f"[{time.time()-t_all:7.2f}] session + warmup")

    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    tmp = tempfile.mkdtemp(prefix="sis_prof_", dir=base)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    # ---- index build (mode=simple, default shards) ----
    cat = Catalog(spark, os.path.join(tmp, "idx_docs_sf"))
    t0 = time.time()
    info = build_index(spark, docs, cat, mode="simple", resume=False)
    t_build = time.time() - t0
    with open(os.path.join(cat.root, "build_state.json")) as fh:
        st = json.load(fh)
    stages = {k: v.get("wall_ms") for k, v in st["stages"].items()}
    print(f"build sf docs: {t_build:.2f}s  n_shards={info.n_shards} "
          f"stages(ms)={stages}")

    # ---- wand topk decomposition ----
    from search_ingest_spark.query.wand import Searcher

    t0 = time.time()
    s = Searcher(spark, cat)
    print(f"Searcher init: {time.time()-t0:.3f}s")
    q = "data"
    t0 = time.time()
    s.topk(q, 10).collect()
    print(f"first topk (cold codegen): {time.time()-t0:.3f}s")
    # repeat same query: plan + fresh DataFrame each time (like bench)
    for rep in range(3):
        t0 = time.time()
        idf_t0 = time.time()
        s.plan(q)
        t_plan = time.time() - idf_t0
        df = s.topk(q, 10)
        t_dfbuild = time.time() - t0 - t_plan
        t1 = time.time()
        df.collect()
        t_exec = time.time() - t1
        print(f"rep{rep}: plan={t_plan*1e3:.0f}ms dfbuild={t_dfbuild*1e3:.0f}ms "
              f"exec={t_exec*1e3:.0f}ms")
    # reuse the SAME DataFrame object (no re-analysis)
    df = s.topk("spark query data", 10)
    df.collect()
    for rep in range(2):
        t0 = time.time()
        df.collect()
        print(f"same-df re-collect: {(time.time()-t0)*1e3:.0f}ms")
    # job-count probe
    sc = spark.sparkContext
    before = sc._jsc.sc().dagScheduler().nextJobId().get()
    s.topk("customer window batch", 10).collect()
    after = sc._jsc.sc().dagScheduler().nextJobId().get()
    print(f"jobs per topk: {after - before}")

    # ---- explain for plans dir ----
    plan_txt = s.topk("spark query data", 10)._sc = None  # noqa
    # (explain captured separately)

    # ---- dedup ----
    from search_ingest_spark.ops import dedup, textstats

    for name, fn in [
        ("dedup_exact", lambda: dedup.exact_duplicates(docs).count()),
        ("dedup_exact_rep2", lambda: dedup.exact_duplicates(docs).count()),
        ("minhash_sigs", lambda: dedup.minhash_signatures(docs).count()),
        ("minhash_sigs_rep2", lambda: dedup.minhash_signatures(docs).count()),
        ("minhash_lsh", lambda: dedup.minhash_lsh_pairs(docs, threshold=0.8).count()),
        ("minhash_lsh_rep2", lambda: dedup.minhash_lsh_pairs(docs, threshold=0.8).count()),
        ("text_quality", lambda: textstats.quality_score(docs).count()),
    ]:
        t0 = time.time()
        fn()
        print(f"{name}: {time.time()-t0:.3f}s")

    print(f"TOTAL {time.time()-t_all:.2f}s")
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
