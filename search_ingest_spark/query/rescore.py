"""ES `rescore` — second-pass re-ranking of a first-pass window.

Capability analog: the reference's ES indexes answer rescore requests
out of the box (queries are forwarded verbatim —
/root/reference/src/search-ingest/elastic.cr); the canonical use is a
cheap match query for recall + an expensive phrase query re-ranking
only the top `window_size` hits.

Semantics implemented (ES defaults): score_mode=total —

    final = query_weight * primary + rescore_query_weight * secondary

with secondary = 0 for window docs the rescore query doesn't match.
Only the window is re-ranked (docs outside it are unaffected, exactly
ES).

Spark-first shape: the first pass is the existing WAND top-k (pruned
postings, rank-identical to its oracle); the second pass rides
PhraseSearcher.all_scores — a positions scan pruned to the PHRASE
terms — joined to the k-to-window-sized first-pass frame, so the
expensive query never touches the corpus and the join is
broadcast-sized by construction.  Rounding to `round_to` happens on
both inputs AND the combination, so the DuckDB oracle replays the
arithmetic exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from search_ingest_spark.query.bm25 import B, K1, analyze_query
from search_ingest_spark.ranking import ranked_desc


def rescore_topk(
    searcher,
    phrase_searcher,
    query_text: str,
    rescore_text: str,
    k: int = 10,
    *,
    window_size: int = 50,
    query_weight: float = 1.0,
    rescore_query_weight: float = 1.0,
    round_to: int = 4,
) -> DataFrame:
    """(doc_id, score, rank): top-k of the rescored window."""
    if window_size < k:
        raise ValueError(
            f"window_size ({window_size}) must be >= k ({k})")
    win = (
        searcher.topk(query_text, window_size, round_to=round_to)
        .select("doc_id", F.col("score").alias("_p"))
    )
    sec = (
        phrase_searcher.all_scores(rescore_text, round_to=round_to)
        .select("doc_id", F.col("score").alias("_s"))
    )
    comb = win.join(sec, "doc_id", "left").select(
        "doc_id",
        F.round(
            F.lit(float(query_weight)) * F.col("_p")
            + F.lit(float(rescore_query_weight))
            * F.coalesce(F.col("_s"), F.lit(0.0)),
            round_to,
        ).alias("score"),
    )
    topk = comb.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    return ranked_desc(topk, "score", "doc_id")


def rescore_oracle_sql(
    query_text: str,
    rescore_text: str,
    k: int = 10,
    *,
    window_size: int = 50,
    query_weight: float = 1.0,
    rescore_query_weight: float = 1.0,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int = 4,
) -> str:
    """DuckDB replay of rescore_topk: primary BM25 window (rounded,
    ordered, LIMIT window_size) left-joined to the phrase score set
    (exact slot matching, slot-idf-sum BM25), weighted total."""
    pterms = sorted(set(analyze_query(query_text, mode="simple")))
    p_list = ", ".join("('" + t.replace("'", "''") + "')" for t in pterms)
    slots = analyze_query(rescore_text, mode="simple")
    nslots = len(slots)
    slot_vals = ", ".join(
        f"('{t.replace(chr(39), chr(39) * 2)}', {i})"
        for i, t in enumerate(slots)
    )
    qw, rw = float(query_weight), float(rescore_query_weight)
    return f"""
WITH toks AS (
  SELECT {id_col} AS doc_id,
         regexp_extract_all(lower({text_col}), '[a-z0-9]+') AS t
  FROM {table}
),
dl AS (SELECT doc_id, len(t)::INT AS dl FROM toks WHERE len(t) > 0),
stats AS (SELECT count(*)::BIGINT AS n_docs, avg(dl)::DOUBLE AS avgdl FROM dl),
pos AS (
  SELECT doc_id, p::INT - 1 AS pos, t[p] AS term
  FROM (SELECT doc_id, t, unnest(range(1, len(t) + 1)) AS p FROM toks)
),
tf AS (SELECT doc_id, term, count(*)::INT AS tf FROM pos GROUP BY 1, 2),
q(term) AS (VALUES {p_list}),
dfq AS (SELECT term, count(*)::BIGINT AS df FROM tf WHERE term IN (SELECT term FROM q) GROUP BY 1),
scores_p AS (
  SELECT tf.doc_id,
         sum(
           ln(1.0 + (stats.n_docs - dfq.df + 0.5) / (dfq.df + 0.5))
           * tf.tf * ({K1} + 1.0)
           / (tf.tf + {K1} * (1.0 - {B} + {B} * dl.dl / stats.avgdl))
         ) AS raw
  FROM tf JOIN dfq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
  GROUP BY tf.doc_id
),
win AS (
  SELECT doc_id, round(raw, {round_to})::DOUBLE AS p
  FROM scores_p ORDER BY p DESC, doc_id ASC LIMIT {window_size}
),
slots(term, slot) AS (VALUES {slot_vals}),
dfs AS (
  SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM pos
  WHERE term IN (SELECT term FROM slots) GROUP BY term
),
idfsum AS (
  SELECT sum(ln(1.0 + (stats.n_docs - df + 0.5) / (df + 0.5))) AS s
  FROM slots JOIN dfs USING (term) CROSS JOIN stats
),
x AS (
  SELECT doc_id, pos - slot AS base, slot FROM pos JOIN slots USING (term)
),
pf AS (
  SELECT doc_id, count(*)::BIGINT AS pfreq FROM (
    SELECT doc_id, base FROM x GROUP BY doc_id, base
    HAVING count(DISTINCT slot) = {nslots}
  ) GROUP BY doc_id
),
sec AS (
  SELECT pf.doc_id,
         round(idfsum.s * (pf.pfreq * ({K1} + 1.0))
               / (pf.pfreq + {K1} * (1.0 - {B} + {B} * dl.dl / stats.avgdl)),
               {round_to})::DOUBLE AS s
  FROM pf JOIN dl USING (doc_id) CROSS JOIN stats CROSS JOIN idfsum
),
topk AS (
  SELECT win.doc_id,
         round({qw!r} * win.p + {rw!r} * coalesce(sec.s, 0.0),
               {round_to})::DOUBLE AS score
  FROM win LEFT JOIN sec ON sec.doc_id = win.doc_id
  ORDER BY score DESC, win.doc_id ASC
  LIMIT {k}
)
SELECT doc_id, score,
       row_number() OVER (ORDER BY score DESC, doc_id ASC)::INT AS rank
FROM topk
""".strip()
