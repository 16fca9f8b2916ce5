"""ES `significant_terms` aggregation — index-backed, shard-cogrouped.

What it computes (reference delegates the whole agg surface to ES —
/root/reference/src/search-ingest/elastic.cr forwards queries verbatim;
this is the classic "what terms characterize this result set" agg):
for a foreground hit set FG (docs matching a query) and the background
corpus, score every term by how over-represented it is in FG vs the
index as a whole, using ES's default JLH heuristic:

    fg_rate = fg_df / |FG|          bg_rate = df / n_docs
    jlh     = (fg_rate - bg_rate) * (fg_rate / bg_rate)   if fg_rate > bg_rate

Spark-first plan — NO corpus re-tokenize, NO (term, doc) explode:

  1. FG ids come from Searcher.matching_doc_ids (pruned postings scan).
  2. FG ids pick up their doc-range shard from doc_lens (broadcast-size
     join per shard partition).
  3. postings.groupBy(shard).cogroup(fg.groupBy(shard)) — each shard
     bulk-decodes ITS posting blocks once (decode_blocks_bulk, the same
     ~18x bulk win the scoring kernels use) and counts FG membership
     per block via ONE sorted searchsorted pass + np.add.reduceat;
     emits vocab-sized (term_id, fg_df) partials.  Per-shard cost is
     the shard's index size — the distributed analog of ES computing
     the agg per Lucene segment.
  4. A tiny groupBy(term_id).sum cross-shard reduce (vocab-sized, NOT
     corpus-sized), a broadcast join to term_dict for df + the term
     string, and the JLH arithmetic in Catalyst.

At 100 TB the expensive stage (3) reads each index shard exactly once
with no shuffle (postings are already partitioned by shard; the FG side
shuffles only hit IDS), and everything after is vocabulary-sized.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from search_ingest_spark.index import build as ib
from search_ingest_spark.index import codec

_PARTIAL_SCHEMA = "term_id long, fg_df long"


def shard_fg_term_counts(
    post_pdf: pd.DataFrame, fg_pdf: pd.DataFrame
) -> pd.DataFrame:
    """Per-shard foreground document frequency per term.

    Pure function over ONE shard's posting rows + that shard's FG doc
    ids — unit-testable without Spark (same pattern as
    wand.shard_all_scores)."""
    empty = pd.DataFrame({"term_id": pd.array([], dtype="int64"),
                          "fg_df": pd.array([], dtype="int64")})
    if len(post_pdf) == 0 or len(fg_pdf) == 0:
        return empty
    doc_ids, _tfs, _dls, offsets = codec.decode_blocks_bulk(
        post_pdf["data"].to_numpy(object),
        post_pdf["first_doc_id"].to_numpy(np.int64),
        post_pdf["n_docs"].to_numpy(np.int64),
    )
    if len(doc_ids) == 0:
        return empty
    fg = np.unique(fg_pdf["doc_id"].to_numpy(np.int64))
    idx = np.searchsorted(fg, doc_ids)
    idx[idx == len(fg)] = 0
    hit = (fg[idx] == doc_ids).astype(np.int64)
    per_block = np.add.reduceat(hit, offsets[:-1])
    tids = post_pdf["term_id"].to_numpy(np.int64)
    # a term spans multiple blocks within the shard — sum per term_id
    uniq, inv = np.unique(tids, return_inverse=True)
    fg_df = np.zeros(len(uniq), dtype=np.int64)
    np.add.at(fg_df, inv, per_block)
    keep = fg_df > 0
    return pd.DataFrame({"term_id": uniq[keep], "fg_df": fg_df[keep]})


def significant_terms(
    searcher, query_text: str, k: int = 10, *, round_to: int = 6,
) -> DataFrame:
    """(term, fg_df, df, score, rank) — top-k JLH-significant terms of
    `query_text`'s hit set.  Tie-break (rounded score desc, term asc),
    both engines identically."""
    fg = searcher.matching_doc_ids(query_text)
    lens = searcher.cat.read(ib.DOC_LENS_TABLE).select("doc_id", "shard")
    fg_sh = fg.join(lens, "doc_id").select("shard", "doc_id")

    def count_fn(post_pdf: pd.DataFrame, fg_pdf: pd.DataFrame) -> pd.DataFrame:
        return shard_fg_term_counts(post_pdf, fg_pdf)

    partials = (
        searcher.postings.groupBy("shard")
        .cogroup(fg_sh.groupBy("shard"))
        .applyInPandas(lambda _k, p, f: count_fn(p, f), _PARTIAL_SCHEMA)
    )
    fg_counts = partials.groupBy("term_id").agg(
        F.sum("fg_df").alias("fg_df"))
    # |FG| rides the same lazy plan as a 1-row broadcast (no separate
    # driver action); n_docs is the stats scalar the searcher caches
    fg_n = fg.agg(F.count("*").alias("_n_fg"))
    dict_df = searcher.term_dict.select("term_id", "term", "df")
    joined = (
        fg_counts.join(F.broadcast(dict_df), "term_id")
        .crossJoin(F.broadcast(fg_n))
    )
    n_docs = F.lit(float(searcher.n_docs))
    fg_rate = F.col("fg_df").cast("double") / F.col("_n_fg").cast("double")
    bg_rate = F.col("df").cast("double") / n_docs
    jlh = (fg_rate - bg_rate) * (fg_rate / bg_rate)
    scored = (
        joined.where(fg_rate > bg_rate)
        .select("term", "fg_df", "df",
                F.round(jlh, round_to).alias("score"))
    )
    topk = scored.orderBy(F.desc("score"), F.asc("term")).limit(k)
    from search_ingest_spark.ranking import ranked_desc

    ranked = ranked_desc(topk, "score", "term")
    # reattach the count columns (ranked_desc keeps only id+score+rank;
    # both frames are ≤ k rows)
    return (
        ranked.join(topk.select("term", "fg_df", "df"), "term")
        .select("term", "fg_df", "df", "score", "rank")
        .orderBy("rank")
    )


def significant_terms_oracle_sql(
    query_text: str,
    k: int = 10,
    *,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int = 6,
) -> str:
    """DuckDB replay: brute-force re-derivation of fg_df/df/n_docs from
    raw text with the identical JLH arithmetic (same operand order, so
    the doubles agree bitwise before the shared rounding)."""
    from search_ingest_spark.query.bm25 import analyze_query

    uniq = sorted(set(analyze_query(query_text, mode="simple")))
    term_list = ", ".join("'" + t.replace("'", "''") + "'" for t in uniq)
    return f"""
WITH toks AS (
  SELECT {id_col} AS doc_id,
         unnest(regexp_extract_all(lower({text_col}), '[a-z0-9]+')) AS term
  FROM {table}
),
hits AS (SELECT DISTINCT doc_id FROM toks WHERE term IN ({term_list})),
fg AS (SELECT count(*)::BIGINT AS n_fg FROM hits),
n AS (SELECT count(DISTINCT doc_id)::BIGINT AS n_docs FROM toks),
fgt AS (
  SELECT t.term, count(DISTINCT t.doc_id)::BIGINT AS fg_df
  FROM toks t JOIN hits USING (doc_id) GROUP BY 1
),
bg AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM toks GROUP BY 1),
scored AS (
  SELECT fgt.term, fgt.fg_df, bg.df,
         round(
           (fgt.fg_df::DOUBLE / fg.n_fg::DOUBLE - bg.df::DOUBLE / n.n_docs::DOUBLE)
           * ((fgt.fg_df::DOUBLE / fg.n_fg::DOUBLE) / (bg.df::DOUBLE / n.n_docs::DOUBLE)),
           {round_to})::DOUBLE AS score
  FROM fgt JOIN bg USING (term) CROSS JOIN fg CROSS JOIN n
  WHERE fgt.fg_df::DOUBLE / fg.n_fg::DOUBLE > bg.df::DOUBLE / n.n_docs::DOUBLE
),
topk AS (
  SELECT term, fg_df, df, score FROM scored
  ORDER BY score DESC, term ASC LIMIT {k}
)
SELECT term, fg_df, df, score,
       row_number() OVER (ORDER BY score DESC, term ASC)::INT AS rank
FROM topk
""".strip()


# ---------------------------------------------------------------------------
# significant_text — the free-text sibling (re-analyzes a hit SAMPLE)
# ---------------------------------------------------------------------------

def significant_text(
    searcher, query_text: str, k: int = 10, *, sample_size: int = 100,
    filter_duplicate_text: bool = False, round_to: int = 6,
) -> DataFrame:
    """ES `significant_text`: JLH-significant terms computed by
    RE-ANALYZING the stored text of a bounded hit sample — the agg ES
    offers for free-text fields with no fielddata, always run under a
    sampler because re-analysis costs per sampled doc, not per hit.

    Sample rule (deterministic single-shard analog of ES's per-shard
    sampling, same contract as aggs.sampler_terms): the top
    `sample_size` hits by (rounded score desc, doc_id asc) from
    all_matching_scores — one pruned postings scan + one TakeOrdered.
    `filter_duplicate_text=True` drops exact-duplicate texts (lowest
    doc_id survives) before counting, ES's near-dup guard in its
    deterministic exact form.  Re-analysis touches `sample_size`
    stored rows via the doc-range-pruned doc_store read; the
    background stats come from the term dictionary — NO corpus pass
    anywhere.  (term, fg_df, df, score, rank); fg_df counts SAMPLED
    docs containing the term, background df/n_docs are index-wide
    (exactly ES, where fg comes from the sampled context)."""
    from search_ingest_spark.ranking import ranked_desc

    scored = searcher.all_matching_scores(query_text, round_to=4)
    top = scored.orderBy(F.desc("score"), F.asc("doc_id")) \
        .limit(int(sample_size))
    store = searcher.cat.read(ib.DOC_STORE_TABLE).select("doc_id", "text")
    sample = store.join(top.select("doc_id"), "doc_id")
    if filter_duplicate_text:
        w = Window.partitionBy(F.md5("text")).orderBy(F.asc("doc_id"))
        sample = (sample.withColumn("_dup_rank", F.row_number().over(w))
                  .where(F.col("_dup_rank") == 1).drop("_dup_rank"))
    toks = sample.select(
        "doc_id",
        F.explode(F.array_distinct(F.expr(
            "regexp_extract_all(lower(text), '[a-z0-9]+', 0)")))
        .alias("term"))
    fg_counts = toks.groupBy("term").agg(
        F.countDistinct("doc_id").alias("fg_df"))
    n_fg = sample.agg(F.count("*").alias("_n_fg"))
    dict_df = searcher.term_dict.select("term", "df")
    joined = (fg_counts.join(F.broadcast(dict_df), "term")
              .crossJoin(F.broadcast(n_fg)))
    n_docs = F.lit(float(searcher.n_docs))
    fg_rate = F.col("fg_df").cast("double") / F.col("_n_fg").cast("double")
    bg_rate = F.col("df").cast("double") / n_docs
    jlh = (fg_rate - bg_rate) * (fg_rate / bg_rate)
    scored_t = (
        joined.where(fg_rate > bg_rate)
        .select("term", "fg_df", "df", F.round(jlh, round_to).alias("score"))
    )
    topk = scored_t.orderBy(F.desc("score"), F.asc("term")).limit(k)
    ranked = ranked_desc(topk, "score", "term")
    return (
        ranked.join(topk.select("term", "fg_df", "df"), "term")
        .select("term", "fg_df", "df", "score", "rank")
        .orderBy("rank")
    )


def significant_text_oracle_sql(
    query_text: str, k: int = 10, *, sample_size: int = 100,
    filter_duplicate_text: bool = False, round_to: int = 6,
    table: str = "documents", id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB replay: same sample rule (BM25 scores re-derived from raw
    text), same optional exact-dup filter (md5 partition, lowest doc_id
    survives), same re-analysis regex, background df/n_docs re-derived
    from the full corpus, identical JLH operand order."""
    from search_ingest_spark.query.bm25 import bm25_scores_cte

    dup = ""
    src = "sample"
    if filter_duplicate_text:
        dup = f"""
, dedup AS (
  SELECT *, row_number() OVER (PARTITION BY md5({text_col})
            ORDER BY doc_id ASC) AS _dup_rank
  FROM sample
)"""
        src = "dedup WHERE _dup_rank = 1"
    return f"""
WITH {bm25_scores_cte(query_text, round_to=4)},
top_n AS (
  SELECT doc_id FROM scores_r
  ORDER BY score DESC, doc_id ASC LIMIT {int(sample_size)}
),
sample AS (
  SELECT d.{id_col} AS doc_id, d.{text_col} AS {text_col}
  FROM {table} d JOIN top_n ON d.{id_col} = top_n.doc_id
){dup},
samp AS (SELECT * FROM {src}),
stoks AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower({text_col}), '[a-z0-9]+')) AS term
  FROM samp
),
fgt AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS fg_df
        FROM stoks GROUP BY 1),
fg AS (SELECT count(*)::BIGINT AS n_fg FROM samp),
alltoks AS (
  SELECT {id_col} AS doc_id,
         unnest(regexp_extract_all(lower({text_col}), '[a-z0-9]+')) AS term
  FROM {table}
),
bg AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df
       FROM alltoks GROUP BY 1),
n AS (SELECT count(DISTINCT doc_id)::BIGINT AS n_docs FROM alltoks),
scored_t AS (
  SELECT fgt.term, fgt.fg_df, bg.df,
         round(
           (fgt.fg_df::DOUBLE / fg.n_fg::DOUBLE - bg.df::DOUBLE / n.n_docs::DOUBLE)
           * ((fgt.fg_df::DOUBLE / fg.n_fg::DOUBLE) / (bg.df::DOUBLE / n.n_docs::DOUBLE)),
           {round_to})::DOUBLE AS score
  FROM fgt JOIN bg USING (term) CROSS JOIN fg CROSS JOIN n
  WHERE fgt.fg_df::DOUBLE / fg.n_fg::DOUBLE > bg.df::DOUBLE / n.n_docs::DOUBLE
),
topk AS (
  SELECT term, fg_df, df, score FROM scored_t
  ORDER BY score DESC, term ASC LIMIT {k}
)
SELECT term, fg_df, df, score,
       row_number() OVER (ORDER BY score DESC, term ASC)::INT AS rank
FROM topk
""".strip()
