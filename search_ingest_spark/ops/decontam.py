"""Benchmark decontamination — n-gram overlap against an eval set.

The standard training-data hygiene step (the GPT-3/PaLM-style 13-gram
rule): a training document is CONTAMINATED when it shares at least one
n-token shingle with any benchmark document, and the pipeline either
drops it or reports per-source contamination rates before training.

Scale shape (the part that matters at 100 TB): the benchmark side is
eval-set sized — thousands of docs, not billions — so its distinct
n-gram set is built once and BROADCAST.  The corpus side expands to
n-grams map-locally (pure Catalyst: `transform(sequence(...))` over the
token array, whole-stage codegen, no Python) and the membership probe
is a broadcast-hash semi-join — the corpus is never shuffled; the only
exchange is the per-doc hit aggregation, bounded by MATCHING
(doc, gram) pairs, which decontamination assumes are rare.

Default n=13 matches the published rule; the driver entry uses n=4
because the synthetic corpus has no 13-token duplication across docs
(measured: zero overlaps for n ≥ 6 at sf0.01) — the plan is identical,
only the shingle width changes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from search_ingest_spark.ops.textstats import TOKEN_PATTERN


def _grams_col(text_col: str, n: int) -> Column:
    """array<string> of the text's n-token shingles (space-joined),
    empty when the doc has fewer than n tokens."""
    toks = f"regexp_extract_all(lower({text_col}), '{TOKEN_PATTERN}', 0)"
    return F.expr(
        f"CASE WHEN size({toks}) >= {n} THEN "
        f"transform(sequence(1, size({toks}) - {n} + 1), "
        f"i -> concat_ws(' ', slice({toks}, i, {n}))) "
        f"ELSE array() END"
    )


def ngram_contamination(
    docs: DataFrame,
    bench: DataFrame,
    *,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_hits) for every training doc sharing ≥1 n-gram with
    the benchmark — n_hits = the number of DISTINCT overlapping
    n-grams (the evidence count a drop/keep threshold reads).

    `bench` needs only `text_col`.  Docs present in both frames are the
    caller's concern (filter the benchmark's ids out of `docs` first if
    they physically overlap — self-overlap is trivially total)."""
    if n < 1:
        raise ValueError(f"n must be positive, got {n}")
    bench_g = (
        bench.select(F.explode(_grams_col(text_col, n)).alias("gram"))
        .distinct()
    )
    doc_g = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(_grams_col(text_col, n)).alias("gram"),
    )
    return (
        doc_g.join(F.broadcast(bench_g), "gram")
        .groupBy("doc_id")
        .agg(F.countDistinct("gram").alias("n_hits"))
    )


def contamination_oracle_sql(
    *, n: int, bench_where: str, doc_where: str = "TRUE",
) -> str:
    """DuckDB replay over the `documents` view: the benchmark is the
    rows matching `bench_where` (a deterministic predicate, e.g.
    `doc_id % 97 = 0`), training docs are the rows matching
    `doc_where`; same shingling, same distinct-overlap count."""
    return f"""
WITH d AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_PATTERN}') AS a
  FROM documents
),
g AS (
  SELECT doc_id, array_to_string(a[i:i + {int(n) - 1}], ' ') AS gram
  FROM (SELECT doc_id, a, unnest(range(1, len(a) - {int(n)} + 2)) AS i
        FROM d)
),
b AS (SELECT DISTINCT gram FROM g WHERE {bench_where}),
hits AS (
  SELECT DISTINCT doc_id, gram FROM g
  WHERE ({doc_where}) AND NOT ({bench_where})
)
SELECT h.doc_id, count(*)::BIGINT AS n_hits
FROM hits h JOIN b USING (gram)
GROUP BY 1
""".strip()


def contamination_by_source(
    docs: DataFrame,
    bench: DataFrame,
    *,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    round_to: int = 4,
) -> DataFrame:
    """Per-source contamination-rate rollup — the report a pipeline
    reads before deciding which SOURCES (crawls, dumps, feeds) to drop
    or re-filter, rather than per-document: (source, n_docs,
    n_contaminated, contamination_rate).

    Rides ngram_contamination unchanged (broadcast benchmark shingles,
    corpus never shuffles for the probe); the rollup adds one left
    semi-style join of the per-doc hit list back to (doc_id, source) —
    hit-list-sized, decontamination assumes it is small — and a
    |sources|-cardinality aggregate.  Every doc counts in n_docs, so
    sub-n-token docs are (correctly) uncontaminated."""
    hits = ngram_contamination(docs, bench, n=n, id_col=id_col,
                               text_col=text_col)
    per = docs.select(F.col(id_col).alias("doc_id"),
                      F.col(source_col).alias("source")).join(
        hits, "doc_id", "left")
    return (
        per.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(F.col("n_hits").isNotNull(), 1).otherwise(0))
            .cast("long").alias("n_contaminated"),
        )
        .withColumn(
            "contamination_rate",
            F.round(F.col("n_contaminated").cast("double")
                    / F.col("n_docs").cast("double"), int(round_to)),
        )
    )


def contamination_by_source_oracle_sql(
    *, n: int, bench_where: str, source_col: str = "source",
    round_to: int = 4,
) -> str:
    """DuckDB replay: per-doc contaminated flag from the same shingle
    overlap, rolled up per source over ALL training docs (including
    sub-n-token ones, which can't be contaminated)."""
    return f"""
WITH d AS (
  SELECT doc_id, {source_col} AS source,
         regexp_extract_all(lower(text), '{TOKEN_PATTERN}') AS a
  FROM documents
),
g AS (
  SELECT doc_id, array_to_string(a[i:i + {int(n) - 1}], ' ') AS gram
  FROM (SELECT doc_id, a, unnest(range(1, len(a) - {int(n)} + 2)) AS i
        FROM d)
),
b AS (SELECT DISTINCT gram FROM g WHERE {bench_where}),
flagged AS (
  SELECT DISTINCT g.doc_id FROM g JOIN b USING (gram)
  WHERE NOT ({bench_where})
)
SELECT d.source,
       count(*)::BIGINT AS n_docs,
       sum(CASE WHEN f.doc_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
         AS n_contaminated,
       round(sum(CASE WHEN f.doc_id IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE
             / count(*)::DOUBLE, {int(round_to)})::DOUBLE
         AS contamination_rate
FROM d LEFT JOIN flagged f USING (doc_id)
WHERE NOT ({bench_where})
GROUP BY 1
""".strip()
