"""Federated multi-index search (`_msearch` + `indices_boost`).

The reference's deployment runs MANY indexes (one per PlaceOS table —
/root/reference/src/search-ingest/table.cr builds an ES index per
table) and ES serves cross-index queries natively: `GET a,b/_search`
scores each index with ITS OWN statistics (df, n_docs, avgdl are
per-index — scores are NOT globally normalized, a documented ES
property) and `indices_boost` multiplies per index before the global
merge.

Spark shape: one pruned postings scan per index
(Searcher.all_matching_scores — each subset index carries its own
stats, reproducing ES's per-index scoring exactly), a union, one
TakeOrdered over (boosted score desc, index name asc, doc_id asc).
At 100 TB the per-index scans are independent (no cross-index shuffle
until the ≤Σk merge) and each is bounded by its own query-term
postings.

The oracle replays every index's BM25 from first principles over its
OWN subset (per-subset tf/df/avgdl CTE chain — the defining semantics
being certified), applies the boost, and merges with the same
tie-break.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from search_ingest_spark.query.bm25 import B, K1, analyze_query


def msearch_topk(
    indexes: list[tuple], query_text: str, k: int = 10, *,
    round_to: int = 4,
) -> DataFrame:
    """`indexes`: [(name, searcher, remap_or_None, boost)] — remap
    carries subset-index doc_ids back to natural keys (the
    dense-subset pattern); None when ids are already natural.
    (index_name, doc_id, score, rank), score = per-index BM25 ×
    boost, rounded; ties break (index_name asc, doc_id asc)."""
    if not indexes:
        raise ValueError("msearch_topk needs ≥1 index")
    parts = []
    for name, searcher, remap, boost in indexes:
        scored = searcher.all_matching_scores(query_text)
        if remap is not None:
            scored = remap(scored)
        parts.append(scored.select(
            F.lit(str(name)).alias("index_name"),
            "doc_id",
            (F.col("score") * F.lit(float(boost))).alias("score")))
    un = reduce(DataFrame.unionAll, parts)
    un = un.withColumn("score", F.round("score", int(round_to)))
    topk = un.orderBy(F.desc("score"), F.asc("index_name"),
                      F.asc("doc_id")).limit(int(k))
    # ranked_desc tie-breaks on ONE id column; (index_name, zero-padded
    # doc_id) concatenated sorts lexicographically == (name asc, id asc)
    from search_ingest_spark.ranking import ranked_desc

    keyed = topk.withColumn(
        "_mid", F.concat(F.col("index_name"), F.lit(":"),
                         F.lpad(F.col("doc_id").cast("string"), 12, "0")))
    return ranked_desc(keyed, "score", "_mid",
                       extra_cols=["index_name", "doc_id"]).select(
        "index_name", "doc_id", "score", "rank")


def msearch_oracle_sql(
    query_text: str, parts: list[tuple], k: int = 10, *,
    round_to: int = 4,
) -> str:
    """DuckDB replay: `parts` = [(name, where_sql, boost)] — each
    index is the documents rows matching `where_sql`, scored with the
    SUBSET's own tf/df/dl/avgdl (per-index statistics, the ES
    semantics), boosted, merged, ranked."""
    uniq = sorted(set(analyze_query(query_text, mode="simple")))
    if not uniq:
        raise ValueError("empty query after analysis")
    term_list = ", ".join("('" + t.replace("'", "''") + "')" for t in uniq)
    chains = [f"q(term) AS (VALUES {term_list})"]
    arms = []
    for i, (name, where, boost) in enumerate(parts):
        s = f"_{i}"
        chains.append(f"""
toks{s} AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
  FROM documents WHERE {where}
),
tf{s} AS (SELECT doc_id, term, count(*)::INT AS tf FROM toks{s} GROUP BY 1, 2),
dl{s} AS (SELECT doc_id, count(*)::INT AS dl FROM toks{s} GROUP BY 1),
stats{s} AS (SELECT count(*)::BIGINT AS n_docs, avg(dl)::DOUBLE AS avgdl
             FROM dl{s}),
dfreq{s} AS (SELECT term, count(*)::BIGINT AS df FROM tf{s}
             WHERE term IN (SELECT term FROM q) GROUP BY 1),
scores{s} AS (
  SELECT tf{s}.doc_id,
         sum(
           ln(1.0 + (stats{s}.n_docs - dfreq{s}.df + 0.5)
              / (dfreq{s}.df + 0.5))
           * tf{s}.tf * ({K1} + 1.0)
           / (tf{s}.tf + {K1} * (1.0 - {B} + {B} * dl{s}.dl
              / stats{s}.avgdl))
         ) AS raw
  FROM tf{s}
  JOIN dfreq{s} USING (term)
  JOIN dl{s} USING (doc_id)
  CROSS JOIN stats{s}
  GROUP BY tf{s}.doc_id
)""".strip())
        nm = "'" + str(name).replace("'", "''") + "'"
        arms.append(
            f"SELECT {nm} AS index_name, doc_id,\n"
            f"       round(raw * {float(boost)!r}, {int(round_to)})::DOUBLE"
            f" AS score\n"
            f"FROM scores{s}")
    body = "\nUNION ALL\n".join(arms)
    return f"""
WITH {", ".join(chains)},
merged AS (
{body}
),
topk AS (
  SELECT * FROM merged
  ORDER BY score DESC, index_name ASC, doc_id ASC
  LIMIT {int(k)}
)
SELECT index_name, doc_id, score,
       row_number() OVER (ORDER BY score DESC, index_name ASC,
                          doc_id ASC)::INT AS rank
FROM topk
""".strip()


def local_msearch(
    indexes: list[tuple], query_text: str, k: int = 10, *,
    round_to: int = 4,
) -> list[tuple[str, int, float, int]]:
    """The Spark-free serving twin of :func:`msearch_topk` — ES's
    coordinating-node merge, literally: each index serves its OWN
    top-k with its OWN statistics (`LocalSearcher.topk`, raw scores),
    and the coordinator merges ≤ Σk candidate rows.

    Exactness: a per-index boost is a monotone scale within that
    index, so each index's top-k by raw score IS its top-k by boosted
    score; any global top-k row is in its own index's top-k, hence in
    the merge's candidate set — the ES two-phase argument.  Rounding
    (shared _round_half_up, after the boost multiply) and the
    (score desc, index_name asc, doc_id asc) tie-break replicate the
    Spark path bitwise, pinned by test.

    `indexes`: [(name, local_searcher, id_map_or_None, boost)] with
    id_map a plain dict carrying subset doc_ids to natural keys (the
    serving-side form of the dense-subset remap; a scale deployment
    stores the natural key in doc_store instead of a driver dict).
    Returns [(index_name, doc_id, score, rank)]."""
    from search_ingest_spark.query.wand import _round_half_up

    if not indexes:
        raise ValueError("local_msearch needs ≥1 index")
    merged = []
    for name, ls, id_map, boost in indexes:
        for doc_id, score, _rank in ls.topk(query_text, k, round_to=None):
            nat = int(id_map[doc_id]) if id_map is not None else int(doc_id)
            merged.append((_round_half_up(score * float(boost), round_to),
                           str(name), nat))
    merged.sort(key=lambda t: (-t[0], t[1], t[2]))
    return [(nm, did, sc, i + 1)
            for i, (sc, nm, did) in enumerate(merged[:int(k)])]
