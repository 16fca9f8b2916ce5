"""Profile the scaling-phase index build stage by stage (guide §1).

Replicates the exact pipeline of index/build.py on the bench scaling
corpus, but times each physical piece separately (tokenize+shuffle+sort
cache fill, per-consumer stage, join, writes) so we know where the
~60-80 s build wall goes before touching anything.  Usage:

    SPARK_GRAFT_BENCH_DOCS=1200000 python BENCH/profile_build.py [cores]
"""
from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CORES = int(sys.argv[1]) if len(sys.argv) > 1 else 32
N_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "1200000"))


def main() -> None:
    from pyspark.sql import functions as F

    from search_ingest_spark.catalog import Catalog
    from search_ingest_spark.corpus import generate_pages
    from search_ingest_spark.session import get_spark

    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    tmp = tempfile.mkdtemp(prefix="sis_profb_", dir=base)
    corpus_path = os.path.join(tmp, "pages_docs")

    spark = get_spark(f"profb{CORES}", master=f"local[{CORES}]",
                      shuffle_partitions=CORES)

    def noop(it):
        yield from it

    spark.range(CORES * 4, numPartitions=CORES * 4).mapInPandas(
        noop, "id long").count()

    t0 = time.time()
    pages = generate_pages(spark, N_DOCS, seed=11, partitions=CORES * 8)
    latest = (pages.groupBy("url")
              .agg(F.max_by(F.struct("warc_ts", "text"), "warc_ts").alias("s"))
              .select("url", F.col("s.text").alias("text")))
    docs_df = latest.withColumn(
        "doc_id", F.regexp_extract("url", r"(\d+)$", 1).cast("long")
    ).select("doc_id", "text")
    docs_df.repartition(128).write.mode("overwrite").parquet(corpus_path)
    print(f"gen corpus: {time.time()-t0:.2f}s")

    docs = spark.read.parquet(corpus_path)
    dps = max(256, N_DOCS // 128)

    # ---- replicate build_index internals with timings ----
    import math

    from search_ingest_spark.analysis import doc_terms_pandas
    from search_ingest_spark.index import build as ib
    from search_ingest_spark.index.build import dense_ids

    sc = spark.sparkContext
    cat = Catalog(spark, os.path.join(tmp, "idx"))

    t0 = time.time()
    row = docs.select(
        F.count("*").alias("n"),
        F.expr("bit_xor(xxhash64(doc_id))").alias("h1"),
        F.expr("bit_xor(xxhash64(doc_id, text))").alias("h2"),
        F.max("doc_id").alias("max_id"),
        F.min("doc_id").alias("min_id"),
    ).first()
    n_total = int(row["n"])
    print(f"fingerprint: {time.time()-t0:.2f}s  n={n_total}")

    n_shards = max(1, math.ceil(n_total / dps))
    n_part = max(1, min(n_shards, sc.defaultParallelism * 2))
    print(f"n_shards={n_shards} n_part={n_part}")

    sc.setJobDescription("tokenize+shuffle+sort cache fill")
    t0 = time.time()
    toks = docs.select("doc_id", "text").mapInPandas(
        lambda it: doc_terms_pandas(it, id_col="doc_id", text_col="text",
                                    mode="standard"),
        schema="doc_id long, term string, tf int, dl int",
    ).withColumn("shard", (F.col("doc_id") / F.lit(dps)).cast("int"))
    srt = (toks.repartition(n_part, "shard")
           .sortWithinPartitions("shard", "term", "doc_id").persist())
    n_tok = srt.count()
    print(f"cache fill (tokenize+shuffle+sort+persist): {time.time()-t0:.2f}s "
          f"rows={n_tok}")

    sc.setJobDescription("doc_lens")
    t0 = time.time()
    dl = srt.groupBy("doc_id").agg(
        F.first("dl").alias("dl"), F.first("shard").alias("shard"))
    cat.write(ib.DOC_LENS_TABLE,
              dl.select("doc_id", "dl", "shard").repartition(n_part, "shard"),
              partition_by=["shard"])
    print(f"doc_lens agg+write: {time.time()-t0:.2f}s")

    t0 = time.time()
    st = (cat.read(ib.DOC_LENS_TABLE)
          .agg(F.count("*").alias("n_docs"), F.sum("dl").alias("sum_dl"))
          .withColumn("avgdl", F.col("sum_dl").cast("double")
                      / F.col("n_docs").cast("double"))
          .withColumn("n_shards", F.lit(n_shards))
          .withColumn("analyzer", F.lit("standard")))
    cat.write(ib.STATS_TABLE, st)
    print(f"stats readback+write: {time.time()-t0:.2f}s")

    sc.setJobDescription("term_dict")
    t0 = time.time()
    partial = (srt.groupBy(
        "term", F.pmod(F.xxhash64("doc_id"), F.lit(64)).alias("_salt"))
        .agg(F.count("*").alias("pdf"), F.sum("tf").alias("pcf")))
    td = partial.groupBy("term").agg(
        F.sum("pdf").alias("df"), F.sum("pcf").alias("cf"))
    td = dense_ids(td, "term", "term_id", n_buckets=64)
    cat.write(ib.TERM_DICT_TABLE, td.select("term", "term_id", "df", "cf"),
              sort_within_partitions=["term"])
    print(f"term_dict aggs+dense_ids+write: {time.time()-t0:.2f}s")

    sc.setJobDescription("encode blocks")
    t0 = time.time()
    blocks = srt.select("shard", "term", "doc_id", "tf", "dl").mapInPandas(
        ib._encode_partition, schema=ib.POSTINGS_ENC_SCHEMA)
    cat.write("blocks__b0", blocks, partition_by=["shard"])
    print(f"encode+write blocks: {time.time()-t0:.2f}s")

    sc.setJobDescription("join term ids")
    t0 = time.time()
    bl = cat.read("blocks__b0")
    term_dict = cat.read(ib.TERM_DICT_TABLE)
    enc = bl.join(term_dict.select("term", "term_id"), "term").select(
        *ib.POSTINGS_COLS).repartition(n_part, "shard")
    cat.write("postings__b0", enc, partition_by=["shard"],
              sort_within_partitions=["shard", "term_id", "block_id"])
    print(f"blocks->term_id join+write: {time.time()-t0:.2f}s")

    t0 = time.time()
    cat.promote("postings__b0", ib.POSTINGS_TABLE)
    print(f"promote: {time.time()-t0:.2f}s")

    sc.setJobDescription("manifest")
    t0 = time.time()
    post = cat.read(ib.POSTINGS_TABLE)
    m = (post.groupBy("shard")
         .agg(F.sum("n_docs").alias("rows"),
              F.sum(F.length("data")).alias("bytes"),
              F.expr("bit_xor(xxhash64(term_id, first_doc_id, data))").alias("fph"))
         .select(F.col("shard").alias("partition_id"),
                 F.concat(F.lit("fp"), F.lit("/"), F.col("fph")).alias("input_fingerprint"),
                 "rows", "bytes", F.lit(-1).cast("long").alias("wall_ms"),
                 F.lit("complete").alias("status")))
    cat.write(ib.MANIFEST_TABLE, m)
    print(f"manifest: {time.time()-t0:.2f}s")

    t0 = time.time()
    n_terms = cat.read(ib.TERM_DICT_TABLE).count()
    print(f"term count: {time.time()-t0:.2f}s  n_terms={n_terms}")

    srt.unpersist()
    import shutil
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
