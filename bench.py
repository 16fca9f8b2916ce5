"""Benchmark harness — prints ONE JSON line.

Phases:
1. **Index-build scaling** (north rule evidence): build the full
   compressed index over a deterministically synthesized web-pages
   corpus at local[N] and local[4N] on IDENTICAL input, report docs/sec
   at both and the scaling efficiency (throughput ratio / 4).  This is
   the sandbox proxy for N→4N executors (BASELINE.md).
2. **Headline queries** at $SPARK_GRAFT_SF_DIR (default sf0.1):
   BM25 WAND top-10 latency distribution (p50/p95 over repeats) on the
   documents index, brute-force BM25, and representative dedup /
   similarity / relational operators.

Env knobs: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (default 32),
SPARK_GRAFT_BENCH_DOCS (scaling-corpus size, default 24000),
SPARK_GRAFT_SCALING=0 to skip phase 1.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BENCH_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "24000"))
RUN_SCALING = os.environ.get("SPARK_GRAFT_SCALING", "1") != "0"

WAND_QUERIES = ["data", "spark query data", "customer window batch",
                "table scan fast row", "hash join agg"]
REPEATS = 5


def _fresh_spark(cores: int):
    from search_ingest_spark.session import get_spark

    return get_spark(f"bench_{cores}", master=f"local[{cores}]",
                     shuffle_partitions=cores)


def _stop(spark) -> None:
    spark.stop()
    # clear the JVM so the next session gets a fresh master/core count
    from pyspark.sql import SparkSession

    SparkSession._instantiatedSession = None  # noqa: SLF001
    SparkSession._activeSession = None  # noqa: SLF001


def scaling_phase(tmp: str) -> dict:
    """Build the same corpus at two parallelism levels; docs/sec both."""
    from search_ingest_spark.catalog import Catalog
    from search_ingest_spark.corpus import generate_pages
    from search_ingest_spark.index.build import build_index
    from pyspark.sql import functions as F

    corpus_path = os.path.join(tmp, "pages_docs")
    spark = _fresh_spark(CPUS)
    pages = generate_pages(spark, BENCH_DOCS, seed=11, partitions=CPUS * 2)
    latest = (
        pages.groupBy("url")
        .agg(F.max_by(F.struct("warc_ts", "text"), "warc_ts").alias("s"))
        .select("url", F.col("s.text").alias("text"))
    )
    docs = latest.withColumn(
        "doc_id", F.regexp_extract("url", r"(\d+)$", 1).cast("long")
    ).select("doc_id", "text")
    docs.repartition(CPUS * 2).write.mode("overwrite").parquet(corpus_path)
    n_docs = spark.read.parquet(corpus_path).count()
    _stop(spark)

    out: dict = {"n_docs": n_docs}
    lo, hi = max(CPUS // 4, 1), CPUS
    for cores, tag in [(lo, "low"), (hi, "high")]:
        spark = _fresh_spark(cores)
        cat = Catalog(spark, os.path.join(tmp, f"idx_{cores}"))
        t0 = time.time()
        build_index(
            spark,
            spark.read.parquet(corpus_path),
            cat,
            mode="standard",
            docs_per_shard=max(256, n_docs // (cores * 4)),
            resume=False,
        )
        wall = time.time() - t0
        out[f"local{cores}_sec"] = round(wall, 2)
        out[f"local{cores}_docs_per_sec"] = round(n_docs / wall, 1)
        if tag == "high":
            # keep the hi-core index for the query phase
            out["_index_dir"] = cat.root
        _stop(spark)
    ratio = out[f"local{hi}_docs_per_sec"] / out[f"local{lo}_docs_per_sec"]
    out["cores_low"], out["cores_high"] = lo, hi
    out["speedup"] = round(ratio, 3)
    out["scaling_efficiency"] = round(ratio / (hi / lo), 3)
    return out


def query_phase(tmp: str, scaling: dict | None) -> dict:
    from search_ingest_spark.catalog import Catalog
    from search_ingest_spark.index.build import build_index
    from search_ingest_spark.ops import dedup, similarity, textstats
    from search_ingest_spark.query import bm25
    from search_ingest_spark.query.wand import Searcher

    spark = _fresh_spark(CPUS)
    queries: dict[str, float] = {}

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")

    # documents index build (the sf-dir headline build)
    cat = Catalog(spark, os.path.join(tmp, "idx_docs_sf"))
    t0 = time.time()
    build_index(spark, docs, cat, mode="simple", resume=False)
    queries["index_build_documents"] = round(time.time() - t0, 3)

    s = Searcher(spark, cat)
    lat: list[float] = []
    for q in WAND_QUERIES:
        for _ in range(REPEATS):
            t0 = time.time()
            s.topk(q, 10).collect()
            lat.append(time.time() - t0)
    lat.sort()
    queries["wand_topk_p50"] = round(statistics.median(lat), 4)
    queries["wand_topk_p95"] = round(lat[int(len(lat) * 0.95) - 1], 4)

    t0 = time.time()
    bm25.bm25_brute_force(docs, "spark query data", 10, mode="simple").collect()
    queries["bm25_brute_force"] = round(time.time() - t0, 3)

    t0 = time.time()
    dedup.exact_duplicates(docs).count()
    queries["dedup_exact"] = round(time.time() - t0, 3)

    t0 = time.time()
    dedup.minhash_lsh_pairs(docs, threshold=0.8).count()
    queries["dedup_minhash_lsh"] = round(time.time() - t0, 3)

    t0 = time.time()
    similarity.brute_force_topk(emb, [1.0] + [0.0] * 63, 10).collect()
    queries["ann_brute_force"] = round(time.time() - t0, 3)

    t0 = time.time()
    textstats.quality_score(docs).count()
    queries["text_quality"] = round(time.time() - t0, 3)

    # query latency against the big scaling-corpus index, if present
    if scaling and scaling.get("_index_dir"):
        big = Searcher(spark, Catalog(spark, scaling["_index_dir"]))
        lat2 = []
        for q in ["the tok0001", "café tok0010 tok2000"]:
            for _ in range(REPEATS):
                t0 = time.time()
                big.topk(q, 10).collect()
                lat2.append(time.time() - t0)
        lat2.sort()
        queries["wand_bigcorpus_p95"] = round(lat2[int(len(lat2) * 0.95) - 1], 4)
    _stop(spark)
    return queries


def main() -> None:
    tmp = tempfile.mkdtemp(prefix="sis_bench_")
    t_start = time.time()
    scaling = scaling_phase(tmp) if RUN_SCALING else None
    queries = query_phase(tmp, scaling)
    total = round(time.time() - t_start, 2)
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    result = {
        "metric": "e2e_bench_seconds",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if scaling:
        scaling.pop("_index_dir", None)
        result["index_build_scaling"] = scaling
    shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps(result))


if __name__ == "__main__":
    sys.stderr.write(f"bench: sf_dir={SF_DIR} cpus={CPUS} docs={BENCH_DOCS}\n")
    main()
