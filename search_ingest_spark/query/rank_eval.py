"""ES `_rank_eval` — relevance evaluation over rated search results.

The API consumers use to regression-test their queries against a
judgment list (the reference's clients get it from the ES tier it
configures): each request pairs a query with doc ratings; the endpoint
runs the query, looks up each hit's rating and folds a ranking metric
— precision@k, recall@k, MRR, DCG — per request plus the mean.

Coordinating-node shape (exactly where ES computes it): each query's
top-k is the engine's ordinary pruned top-k; the metric folds over ≤k
(rank, rating) pairs — driver arithmetic bounded by k·|requests|,
never a corpus pass.  The DuckDB oracle recomputes every query's
top-k from raw text and folds the SAME metric arithmetic in SQL, so
the driver hash certifies both the ranking and the metric fold.

Metric definitions (ES's, made explicit):
- precision@k: |top-k hits with rating ≥ threshold| / |top-k hits|
  (ES divides by retrieved count, not k, when fewer than k match).
- recall@k:    |top-k hits with rating ≥ threshold| / |all rated docs
  with rating ≥ threshold|.
- mean_reciprocal_rank: 1/rank of the first hit with rating ≥
  threshold, 0 if none in the top k.
- dcg: Σ over top-k hits of (2^rating − 1) / log2(rank + 1), unrated
  hits rate 0 (ES's unrated_docs-are-0 default, no normalization).

Scores round to 6 (the repo's float contract); request order is
preserved and a final `_mean` row carries the average — ES's
`metric_score` summary."""

from __future__ import annotations

import math

from pyspark.sql import DataFrame

from search_ingest_spark.query.bm25 import bm25_scores_cte

_METRICS = {"precision", "recall", "mean_reciprocal_rank", "dcg",
            "expected_reciprocal_rank"}


def _metric_fold(pairs: list[tuple[int, int]], metric: str, *,
                 k: int, threshold: int,
                 n_relevant_total: int,
                 maximum_relevance: int = 3) -> float:
    """pairs = [(rank, rating)] for the top-k hits, rank ascending,
    unrated hits carry rating 0."""
    if metric == "expected_reciprocal_rank":
        # ES's ERR (Chapelle et al.): R_i = (2^rating − 1)/2^max_rel
        # is the stop probability at rank i; ERR = Σ R_i/rank_i ·
        # Π_{j<i}(1 − R_j)
        p, err = 1.0, 0.0
        denom = 2.0 ** int(maximum_relevance)
        for rank, r in pairs:
            stop = (2.0 ** r - 1.0) / denom
            err += p * stop / rank
            p *= (1.0 - stop)
        return err
    if metric == "precision":
        if not pairs:
            return 0.0
        return sum(1 for _, r in pairs if r >= threshold) / len(pairs)
    if metric == "recall":
        if n_relevant_total == 0:
            return 0.0
        return (sum(1 for _, r in pairs if r >= threshold)
                / n_relevant_total)
    if metric == "mean_reciprocal_rank":
        for rank, r in pairs:
            if r >= threshold:
                return 1.0 / rank
        return 0.0
    # dcg
    return sum((2.0 ** r - 1.0) / math.log2(rank + 1.0)
               for rank, r in pairs)


def rank_eval(searcher, requests: list[dict], *,
              metric: str = "precision", k: int = 10,
              relevant_rating_threshold: int = 1,
              maximum_relevance: int = 3,
              round_to: int = 6) -> DataFrame:
    """`requests`: [{"id": str, "query": <match text>, "ratings":
    {doc_id: rating}}] → (request_id, metric_score) per request in
    order, plus a final ("_mean", average) row.  Each query runs the
    engine's ordinary top-k (pruned postings scan); the fold is
    driver-side over ≤k pairs."""
    if metric not in _METRICS:
        raise ValueError(
            f"unsupported metric {metric!r} (supported: "
            f"{sorted(_METRICS)})")
    if not requests:
        raise ValueError("rank_eval needs ≥1 request")
    rows = []
    for req in requests:
        extra = set(req) - {"id", "query", "ratings"}
        if extra:
            raise ValueError(
                f"unsupported request options: {sorted(extra)}")
        ratings = {int(d): int(r) for d, r in req["ratings"].items()}
        hits = searcher.topk(req["query"], int(k), round_to=4)
        pairs = [(int(r["rank"]), ratings.get(int(r["doc_id"]), 0))
                 for r in hits.collect()]
        pairs.sort()
        n_rel = sum(1 for r in ratings.values()
                    if r >= int(relevant_rating_threshold))
        score = _metric_fold(pairs, metric, k=int(k),
                             threshold=int(relevant_rating_threshold),
                             n_relevant_total=n_rel,
                             maximum_relevance=int(maximum_relevance))
        # _round_half_up, not builtin round: Python rounds half-even
        # on the binary value while DuckDB rounds half away from zero
        # — a mean landing on a .xxxxxx5 boundary splits the engines
        # otherwise (bit us on the ERR _mean row)
        from search_ingest_spark.query.wand import _round_half_up

        rows.append((str(req["id"]), _round_half_up(score, round_to)))
    from search_ingest_spark.query.wand import _round_half_up

    mean = _round_half_up(sum(s for _, s in rows) / len(rows), round_to)
    rows.append(("_mean", mean))
    return searcher.spark.createDataFrame(
        rows, "request_id string, metric_score double")


def rank_eval_oracle_sql(requests: list[dict], *,
                         metric: str = "precision", k: int = 10,
                         relevant_rating_threshold: int = 1,
                         maximum_relevance: int = 3,
                         round_to: int = 6) -> str:
    """DuckDB replay: per request, the bm25 top-k from raw text, a
    ratings VALUES join (unrated → 0), the same metric fold in SQL;
    UNION ALL + the _mean row."""
    th = int(relevant_rating_threshold)
    parts = []
    for req in requests:
        ratings = {int(d): int(r) for d, r in req["ratings"].items()}
        vals = ", ".join(f"({d}, {r})" for d, r in sorted(ratings.items()))
        n_rel = sum(1 for r in ratings.values() if r >= th)
        cte = bm25_scores_cte(req["query"], round_to=4)
        if metric == "precision":
            fold = (f"coalesce(sum(CASE WHEN rating >= {th} THEN 1 "
                    f"END)::DOUBLE / nullif(count(*), 0), 0.0)")
        elif metric == "recall":
            fold = (f"coalesce(sum(CASE WHEN rating >= {th} THEN 1 "
                    f"END)::DOUBLE, 0.0) / {max(n_rel, 1)}"
                    if n_rel else "0.0")
        elif metric == "mean_reciprocal_rank":
            fold = (f"coalesce(1.0 / min(CASE WHEN rating >= {th} "
                    f"THEN rank END), 0.0)")
        elif metric == "dcg":
            fold = ("coalesce(sum((pow(2.0, rating) - 1.0) "
                    "/ log2(rank + 1.0)), 0.0)")
        else:
            fold = None  # expected_reciprocal_rank: window form below
        inner = f"""
  WITH {cte},
  topk AS (
    SELECT doc_id,
           row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank
    FROM scores_r ORDER BY score DESC, doc_id ASC LIMIT {int(k)}
  ),
  rat(doc_id, rating) AS (VALUES {vals})
  SELECT t.rank, coalesce(rat.rating, 0) AS rating
  FROM topk t LEFT JOIN rat USING (doc_id)
""".strip()
        if fold is not None:
            parts.append(f"""
SELECT '{req["id"]}' AS request_id,
       round(({fold}), {int(round_to)})::DOUBLE AS metric_score
FROM (
  {inner}
)""".strip())
        else:
            # ERR needs the running Π(1−R_j) per row FIRST (a window
            # cannot live inside an aggregate), then the sum —
            # DuckDB's product() window carries it, same operand
            # order as the Python fold
            denom = float(2 ** int(maximum_relevance))
            stop = f"((pow(2.0, rating) - 1.0) / {denom!r})"
            parts.append(f"""
SELECT '{req["id"]}' AS request_id,
       round(coalesce(sum(contrib), 0.0), {int(round_to)})::DOUBLE
         AS metric_score
FROM (
  SELECT {stop} / rank * coalesce(
           product(1.0 - {stop}) OVER (
             ORDER BY rank ROWS BETWEEN UNBOUNDED PRECEDING
             AND 1 PRECEDING), 1.0) AS contrib
  FROM (
  {inner}
  )
)""".strip())
    per = "\nUNION ALL\n".join(parts)
    return f"""
WITH per_request AS (
{per}
)
SELECT request_id, metric_score FROM per_request
UNION ALL
SELECT '_mean', round(avg(metric_score), {int(round_to)})::DOUBLE
FROM per_request
""".strip()
