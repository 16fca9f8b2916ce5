"""Top-k query engine: document-at-a-time scoring with block-max pruning.

The fast path the reference gets from Elasticsearch/Lucene (WAND /
block-max WAND over its inverted index) re-expressed for Spark's
execution model:

1. Query planning on the driver (like ES's coordinating node): analyze
   the query with the SAME analyzer as index time, look up term ids +
   document frequencies in `term_dict` (a pruned scan of a tiny table),
   read global stats — idf per term is computed once here.
2. A single distributed scan of `postings` filtered to the query's
   term_ids.  The postings table is written sorted by (shard, term_id,
   block_id), so parquet row-group min/max stats on `term_id` let the
   scan skip almost all data (`PushedFilters` visible in `.explain`).
3. `groupBy(shard).applyInPandas(scorer)` — each shard scores
   independently (the doc-sharded layout co-locates every term's
   postings for a doc range) and emits its local top-k.  Only shards
   that contain query terms produce groups, so fan-out is bounded by
   the data, not the shard count.
4. Global `orderBy(score desc, doc_id asc).limit(k)` — Spark compiles
   this to TakeOrderedAndProject (no full sort).

The scorer kernel is exact block-max pruning, NumPy-vectorized:
segments of doc-id space are processed in DESCENDING upper-bound order,
so the top-k threshold θ rises as fast as possible and every remaining
segment with UB < θ is skipped without decoding.  Exactness: a segment
is only skipped when the sum of its blocks' upper bounds (stored
rounded UP, see build) is strictly below the kth true score.

Determinism (rank-identity vs the brute-force oracle, SURVEY §4.4):
per-doc scores accumulate per-term partial products in ascending
term_id order == ascending term order == the oracle's
`deterministic_sum` order, so scores are bitwise identical.
"""

from __future__ import annotations

import heapq
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from search_ingest_spark.catalog import Catalog
from search_ingest_spark.index import build as ib
from search_ingest_spark.index.codec import decode_block, decode_blocks_bulk
from search_ingest_spark.query.bm25 import B, K1, analyze_query

# segment-count cap per kernel invocation (see shard_topk): bounds the
# Python segment loop's fixed cost while keeping pruning block-accurate
# up to ~_MAX_SEGMENTS block boundaries per frame
_MAX_SEGMENTS = 1024


class Searcher:
    """Per-index query handle; caches the tiny planning tables."""

    def __init__(self, spark: SparkSession, cat: Catalog) -> None:
        self.spark = spark
        self.cat = cat
        st = cat.read(ib.STATS_TABLE).first()
        self.n_docs = int(st["n_docs"])
        self.avgdl = float(st["avgdl"])
        self.mode = st["analyzer"]
        self.postings = cat.read(ib.POSTINGS_TABLE)
        self.term_dict = cat.read(ib.TERM_DICT_TABLE)
        # planning reads the (tiny, term-sorted) dictionary via pyarrow —
        # row groups pruned by term min/max stats, NO Spark job per query
        # (the ES analog: the coordinating node's in-memory term lookup)
        import pyarrow.dataset as ds

        self._dict_ds = ds.dataset(cat.data_path(ib.TERM_DICT_TABLE))

    # -- planning -----------------------------------------------------------
    def plan(self, query_text: str) -> dict[int, float]:
        """term_id → idf for the query's terms present in the dictionary."""
        import pyarrow.compute as pc

        terms = sorted(set(analyze_query(query_text, mode=self.mode)))
        if not terms:
            return {}
        tbl = self._dict_ds.to_table(
            columns=["term_id", "df"], filter=pc.field("term").isin(terms)
        )
        n = self.n_docs
        return {
            int(tid): float(np.log(1.0 + (n - df + 0.5) / (df + 0.5)))
            for tid, df in zip(tbl["term_id"].to_pylist(), tbl["df"].to_pylist())
        }

    # -- execution ----------------------------------------------------------
    def topk(self, query_text: str, k: int = 10, *, round_to: int | None = None,
             match_all: bool = False,
             min_match: int | None = None,
             attr_filter: dict | None = None,
             attr_where=None,
             exclude_text: str | None = None,
             search_after: tuple[float, int] | None = None) -> DataFrame:
        """(doc_id, score, rank) — rank-identical to the brute-force oracle.

        `match_all=True` = conjunctive (AND) query.  A query with terms
        missing from the dictionary can match nothing under AND.

        `attr_filter` = {attr: value} equality filters over the
        doc_attrs table (built with attr_cols=[...]) — ES bool-query
        filter context on the INDEX path: per shard, the postings
        cogroup with the shard's qualifying doc ids (the Lucene
        filter-bitset analog; the attrs scan is partition-pruned and
        predicate-pushed) and the scorer masks candidates before
        truncation.  df/avgdl are untouched, exactly like ES.

        `attr_where` = an arbitrary Column predicate over doc_attrs
        (range filters, geo distance via query.geo.haversine_km, ...) —
        the general filter context; rides the same cogroup path.

        `exclude_text` = ES bool `must_not` terms: any doc containing
        ANY of its analyzed terms is excluded.  The excluded terms'
        postings ride the same pruned per-shard scan (no extra job or
        shuffle); the kernel decodes their doc-id runs into a ban set
        before scoring.  df/avgdl are untouched, exactly like ES —
        and a doc matching both a positive and an excluded term is
        excluded (must_not wins).

        `search_after` = (score, doc_id) of the last hit of the prior
        page (ES search_after cursor): returns the top-k strictly after
        that (score desc, doc_id asc) sort position.  Stateless and
        depth-independent — page 1000 costs the same as page 1, unlike
        from/size.  The kernel keeps candidates at/below the cursor
        (overinclusive by one rounding ulp) and this method re-applies
        the exact rounded comparison before the global limit."""
        idf = self.plan(query_text)
        out_schema = "doc_id long, score double"
        n_query_terms = len(set(analyze_query(query_text, mode=self.mode)))
        if (not idf or (match_all and len(idf) < n_query_terms)
                or (min_match is not None and len(idf) < min_match)):
            return self.spark.createDataFrame([], out_schema + ", rank int")
        excluded: frozenset[int] = (
            frozenset(self.plan(exclude_text)) if exclude_text else frozenset()
        )
        term_ids = sorted(idf)
        scan_ids = sorted(set(term_ids) | excluded)
        pruned = self.postings.where(F.col("term_id").isin([int(t) for t in scan_ids]))
        if attr_filter or attr_where is not None:
            attrs = self.cat.read(ib.DOC_ATTRS_TABLE)
            for c, v in (attr_filter or {}).items():
                # scalar = ES `term` filter; list/tuple/set = ES `terms`
                # (match ANY of the values)
                if isinstance(v, (list, tuple, set, frozenset)):
                    attrs = attrs.where(F.col(c).isin(list(v)))
                else:
                    attrs = attrs.where(F.col(c) == v)
            if attr_where is not None:
                attrs = attrs.where(attr_where)
            avgdl, _idf = self.avgdl, idf

            def co_scorer(post_pdf: pd.DataFrame,
                          allow_pdf: pd.DataFrame) -> pd.DataFrame:
                if len(post_pdf) == 0 or len(allow_pdf) == 0:
                    return pd.DataFrame({
                        "doc_id": pd.array([], dtype="int64"),
                        "score": pd.array([], dtype="float64"),
                    })
                banned = None
                if excluded:
                    post_pdf, banned = split_banned(post_pdf, excluded)
                allowed = np.sort(allow_pdf["doc_id"].to_numpy(np.int64))
                return shard_topk(post_pdf, idf=_idf, k=k, avgdl=avgdl,
                                  match_all=match_all, round_to=round_to,
                                  allowed=allowed, min_match=min_match,
                                  banned=banned, after=search_after)

            per_shard = (
                pruned.groupBy("shard")
                .cogroup(attrs.select("shard", "doc_id").groupBy("shard"))
                .applyInPandas(co_scorer, schema=out_schema)
            )
        else:
            scorer = _make_shard_scorer(idf, k, self.avgdl, match_all, round_to,
                                        min_match, excluded_tids=excluded,
                                        after=search_after)
            per_shard = pruned.groupBy("shard").applyInPandas(
                scorer, schema=out_schema
            )
        topk = per_shard
        if round_to is not None:
            topk = topk.withColumn("score", F.round("score", round_to))
        if search_after is not None:
            s_a, d_a = search_after
            topk = topk.where(
                (F.col("score") < F.lit(float(s_a)))
                | ((F.col("score") == F.lit(float(s_a)))
                   & (F.col("doc_id") > F.lit(int(d_a))))
            )
        topk = topk.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
        from search_ingest_spark.ranking import ranked_desc

        return ranked_desc(topk, "score", "doc_id")


    # -- fuzzy execution ------------------------------------------------------
    def plan_fuzzy(self, query_text: str, fuzziness: int = 1) -> dict[int, float]:
        """term_id → idf over every dictionary term within `fuzziness`
        Levenshtein edits of any analyzed query term (ES match
        `fuzziness`).  ES walks an FST automaton; the analog here is a
        Catalyst filter over the (tiny, term-sorted) dictionary with a
        length pre-filter so the edit-distance evaluation touches only
        plausible rows.  Each expanded term scores with its OWN idf —
        a documented divergence from ES's blended-df rewrite, chosen so
        scores stay an exact function of corpus statistics."""
        terms = sorted(set(analyze_query(query_text, mode=self.mode)))
        if not terms:
            return {}
        f = int(fuzziness)
        cond = None
        for t in terms:
            e = (
                (F.abs(F.length("term") - F.lit(len(t))) <= f)
                & (F.levenshtein(F.col("term"), F.lit(t)) <= f)
            )
            cond = e if cond is None else cond | e
        rows = self.term_dict.where(cond).select("term_id", "df").collect()
        n = self.n_docs
        return {
            int(r["term_id"]):
                float(np.log(1.0 + (n - r["df"] + 0.5) / (r["df"] + 0.5)))
            for r in rows
        }

    def topk_fuzzy(
        self, query_text: str, k: int = 10, *, fuzziness: int = 1,
        round_to: int | None = None,
    ) -> DataFrame:
        """(doc_id, score, rank) for an OR query over the fuzzy-expanded
        term set — the expansion plan feeds the unchanged WAND kernel."""
        idf = self.plan_fuzzy(query_text, fuzziness)
        out_schema = "doc_id long, score double"
        if not idf:
            return self.spark.createDataFrame([], out_schema + ", rank int")
        pruned = self.postings.where(
            F.col("term_id").isin([int(t) for t in idf])
        )
        scorer = _make_shard_scorer(idf, k, self.avgdl, False, round_to)
        topk = pruned.groupBy("shard").applyInPandas(scorer, schema=out_schema)
        if round_to is not None:
            topk = topk.withColumn("score", F.round("score", round_to))
        topk = topk.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
        from search_ingest_spark.ranking import ranked_desc

        return ranked_desc(topk, "score", "doc_id")

    # -- prefix execution -----------------------------------------------------
    def plan_prefix(
        self, prefix: str, max_expansions: int = 50
    ) -> dict[int, float]:
        """term_id → idf for every dictionary term starting with
        `prefix` (ES `prefix` query expansion).  ES rewrites to at most
        `max_expansions` terms; the cap here is deterministic —
        highest-df first (the terms that can actually match documents),
        term asc on ties.  The term-sorted dictionary layout makes the
        scan a pruned [prefix, prefix+1) range predicate, the same
        trick the completion suggester uses (reader.suggest)."""
        p = prefix.lower()
        if not p:
            return {}
        hi = p[:-1] + chr(ord(p[-1]) + 1)
        rows = (
            self.term_dict
            .where((F.col("term") >= p) & (F.col("term") < hi))
            .orderBy(F.desc("df"), F.asc("term"))
            .limit(int(max_expansions))
            .select("term_id", "df")
            .collect()
        )
        n = self.n_docs
        return {
            int(r["term_id"]):
                float(np.log(1.0 + (n - r["df"] + 0.5) / (r["df"] + 0.5)))
            for r in rows
        }

    def topk_prefix(
        self, prefix: str, k: int = 10, *, max_expansions: int = 50,
        round_to: int | None = None,
    ) -> DataFrame:
        """(doc_id, score, rank) for an OR query over the prefix-expanded
        term set — the expansion plan feeds the unchanged WAND kernel,
        each expanded term scoring with its own idf (same documented
        divergence from ES's blended-df rewrite as topk_fuzzy)."""
        idf = self.plan_prefix(prefix, max_expansions)
        out_schema = "doc_id long, score double"
        if not idf:
            return self.spark.createDataFrame([], out_schema + ", rank int")
        pruned = self.postings.where(
            F.col("term_id").isin([int(t) for t in idf])
        )
        scorer = _make_shard_scorer(idf, k, self.avgdl, False, round_to)
        topk = pruned.groupBy("shard").applyInPandas(scorer, schema=out_schema)
        if round_to is not None:
            topk = topk.withColumn("score", F.round("score", round_to))
        topk = topk.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
        from search_ingest_spark.ranking import ranked_desc

        return ranked_desc(topk, "score", "doc_id")

    # -- quantized execution --------------------------------------------------
    def topk_quantized(
        self, query_text: str, k: int = 10, *, round_to: int | None = None,
    ) -> DataFrame:
        """(doc_id, score, rank) over the impact-quantized postings table
        (build_index(quantize=True)): score = Σ idf_t * (q + 0.5)/100
        with q the build-time-quantized tf-norm (codec module doc).

        Why a separate mode: the one-byte impacts shrink the decoded
        posting volume (no tf/dl varint streams) and max_impact is an
        EXACT per-block bound, so block-max pruning skips strictly more
        than the exact path's (max_tf, min_dl) proxy — the Lucene
        impact-ordered-postings idea on columnar storage.  Scores carry
        ~1% quantization noise, hence opt-in with its own oracle that
        models the same quantization (bm25.bm25_quantized_oracle_sql)."""
        idf = self.plan(query_text)
        out_schema = "doc_id long, score double"
        if not idf:
            return self.spark.createDataFrame([], out_schema + ", rank int")
        pq = self.cat.read(ib.POSTINGS_Q_TABLE)
        pruned = pq.where(F.col("term_id").isin([int(t) for t in idf]))
        _idf = idf

        def scorer(pdf: pd.DataFrame) -> pd.DataFrame:
            return shard_topk_impact(pdf, idf=_idf, k=k, round_to=round_to)

        topk = pruned.groupBy("shard").applyInPandas(scorer, schema=out_schema)
        if round_to is not None:
            topk = topk.withColumn("score", F.round("score", round_to))
        topk = topk.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
        from search_ingest_spark.ranking import ranked_desc

        return ranked_desc(topk, "score", "doc_id")

    # -- batch execution ------------------------------------------------------
    def topk_many(
        self, queries: dict[int, str], k: int = 10, *, round_to: int | None = None,
    ) -> DataFrame:
        """Execute a whole query set in ONE Spark job.

        This is the throughput path the architecture is built for: the
        per-job scheduling overhead that dominates single-query latency
        in local mode amortizes over the set; the postings scan prunes
        to the UNION of all queries' term ids (one pass), and each
        shard scores every query against its already-materialized
        Arrow batch.  Returns (query_id, doc_id, score, rank).
        """
        plans = {qid: self.plan(text) for qid, text in queries.items()}
        plans = {qid: p for qid, p in plans.items() if p}
        out_schema = "query_id int, doc_id long, score double"
        if not plans:
            return self.spark.createDataFrame([], out_schema + ", rank int")
        all_tids = sorted({t for p in plans.values() for t in p})
        pruned = self.postings.where(
            F.col("term_id").isin([int(t) for t in all_tids])
        )
        avgdl = self.avgdl

        def scorer(pdf: pd.DataFrame) -> pd.DataFrame:
            frames = []
            tid_col = pdf["term_id"].to_numpy(np.int64)
            for qid, idf in plans.items():
                sub = pdf[np.isin(tid_col, list(idf))]
                res = shard_topk(sub, idf=idf, k=k, avgdl=avgdl, round_to=round_to)
                res.insert(0, "query_id", np.int32(qid))
                frames.append(res)
            return pd.concat(frames, ignore_index=True)

        per_shard = pruned.groupBy("shard").applyInPandas(scorer, schema=out_schema)
        if round_to is not None:
            per_shard = per_shard.withColumn("score", F.round("score", round_to))
        from pyspark.sql import Window

        w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
        return (
            per_shard.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "doc_id", "score", "rank")
        )


def _make_shard_scorer(idf: dict[int, float], k: int, avgdl: float,
                       match_all: bool = False, round_to: int | None = None,
                       min_match: int | None = None,
                       excluded_tids: frozenset[int] | None = None,
                       after: tuple[float, int] | None = None):
    """Build the per-shard applyInPandas kernel (closure ships idf/k)."""

    def scorer(pdf: pd.DataFrame) -> pd.DataFrame:
        banned = None
        if excluded_tids:
            pdf, banned = split_banned(pdf, excluded_tids)
        return shard_topk(pdf, idf=idf, k=k, avgdl=avgdl, match_all=match_all,
                          round_to=round_to, min_match=min_match,
                          banned=banned, after=after)

    return scorer


def split_banned(
    pdf: pd.DataFrame, excluded_tids: frozenset[int],
) -> tuple[pd.DataFrame, np.ndarray | None]:
    """Split one shard's postings frame into (positive rows, sorted
    banned doc ids) for ES bool `must_not` semantics: the excluded
    terms' postings blocks are decoded (one fused pass; their tf/dl
    streams are simply ignored) and their doc-id runs unioned into the
    ban set.  Doc-id
    spaces of shards are disjoint, so the split composes with the
    multi-shard merged frames of the serving path."""
    tid = pdf["term_id"].to_numpy(np.int64)
    ex_mask = np.isin(tid, np.fromiter(excluded_tids, dtype=np.int64))
    if not ex_mask.any():
        return pdf, None
    ex = pdf[ex_mask]
    if len(ex) == 0:
        return pdf[~ex_mask], None
    d_all, _tf, _dl, _off = decode_blocks_bulk(
        list(ex["data"]),
        ex["first_doc_id"].to_numpy(np.int64),
        ex["n_docs"].to_numpy(np.int64),
    )
    return pdf[~ex_mask], np.unique(d_all)


def shard_topk(
    pdf: pd.DataFrame, *, idf: dict[int, float], k: int, avgdl: float,
    k1: float = K1, b: float = B, match_all: bool = False,
    round_to: int | None = None, allowed: np.ndarray | None = None,
    theta0: float = -np.inf, min_match: int | None = None,
    banned: np.ndarray | None = None,
    after: tuple[float, int] | None = None,
) -> pd.DataFrame:
    """Exact top-k for one shard's query-term postings (block-max pruning).

    `match_all=True` = conjunctive (AND) semantics: only docs containing
    EVERY query term qualify (ES `operator: and`); the OR upper bounds
    remain valid bounds so pruning stays exact.  `min_match=m` = ES
    `minimum_should_match`: at least m distinct query terms must match
    (same bound argument — dropping non-qualifying docs can only be
    done after counting, never loosens the UB).

    `theta0` is an external score floor (already guard-adjusted by the
    caller): segments whose upper bound is below it are skipped from the
    start.  A multi-shard caller passes its global kth-best score so a
    shard processed later inherits the earlier shards' threshold —
    pruning can only drop docs provably outside the global top-k, so
    results stay exact (LocalSearcher's shared-θ serving path).

    `banned` = sorted doc ids to EXCLUDE (ES bool `must_not` on a term:
    the caller decodes the excluded terms' postings into this set).
    Dropping docs can only lower scores, so every upper bound stays
    valid and pruning stays exact.

    Pure function over the postings rows of ONE shard — unit-testable
    without Spark."""
    if banned is not None and len(banned) == 0:
        banned = None
    if len(pdf) == 0 or (allowed is not None and len(allowed) == 0):
        return pd.DataFrame({"doc_id": pd.array([], dtype="int64"),
                             "score": pd.array([], dtype="float64")})
    term_ids = sorted(idf)
    term_order = {t: i for i, t in enumerate(term_ids)}

    # Per-block upper bound from (max_tf, min_dl): the tf-norm is
    # increasing in tf and decreasing in dl, so evaluating it at
    # (max_tf, min_dl) under the CURRENT avgdl bounds every posting in
    # the block.  Inflated 1e-9 relative so float rounding can never
    # undercut a true doc score computed with the same ops.
    tid = pdf["term_id"].to_numpy(np.int64)
    mtf = pdf["max_tf"].to_numpy(np.float64)
    mdl = pdf["min_dl"].to_numpy(np.float64)
    ub = (
        np.array([idf[t] for t in tid])
        * ((mtf * (k1 + 1.0)) / (mtf + k1 * (1.0 - b + b * mdl / avgdl)))
        * (1.0 + 1e-9)
    )
    first = pdf["first_doc_id"].to_numpy(np.int64)
    last = pdf["last_doc_id"].to_numpy(np.int64)

    # --- segment the shard's doc-id space by block boundaries ------------
    # events: +ub at first, -ub after last
    starts = np.concatenate([first, last + 1])
    deltas = np.concatenate([ub, -ub])
    order = np.argsort(starts, kind="stable")
    bounds = starts[order]
    seg_ub = np.cumsum(deltas[order])
    # float-cancellation defense: sequential-sum error after i events is
    # bounded by i * eps * Σ|delta|; inflate each prefix by that bound so
    # accumulated cancellation across many block boundaries can never
    # erode a segment UB below the true bound (the prune stays exact)
    mag = np.cumsum(np.abs(deltas[order]))
    seg_ub = seg_ub + mag * (np.arange(1, len(seg_ub) + 1) * 2.3e-16)
    # merge duplicate boundaries (keep last cumsum at each boundary)
    uniq_mask = np.concatenate([bounds[1:] != bounds[:-1], [True]])
    seg_lo = bounds[uniq_mask]                      # segment start doc ids
    seg_ub = seg_ub[uniq_mask]                      # UB within [lo, next_lo)
    seg_hi = np.concatenate([seg_lo[1:] - 1, [int(last.max())]])
    live = seg_ub > 1e-12
    seg_lo, seg_hi, seg_ub = seg_lo[live], seg_hi[live], seg_ub[live]
    # cap the segment count: past a few thousand segments the Python
    # loop's fixed per-iteration cost (searchsorted + slicing + heap)
    # dominates the kernel.  Merge runs of ADJACENT segments and bound
    # the union by its members' max UB — still a valid upper bound, so
    # pruning stays exact (merely coarser) and scores/results are
    # unchanged; the per-term bulk decode makes the wider gather cheap.
    if len(seg_lo) > _MAX_SEGMENTS:
        width = -(-len(seg_lo) // _MAX_SEGMENTS)
        starts = np.arange(0, len(seg_lo), width)
        seg_ub = np.maximum.reduceat(seg_ub, starts)
        seg_hi = seg_hi[np.minimum(starts + width - 1, len(seg_hi) - 1)]
        seg_lo = seg_lo[starts]

    # --- process segments in descending-UB order with rising threshold ---
    heap: list[tuple[float, int]] = []  # (score, -doc_id) min-heap of top-k
    results_docs: list[np.ndarray] = []
    results_scores: list[np.ndarray] = []
    decoded: dict[int, tuple[np.ndarray, np.ndarray]] = {}  # row → (docs, contrib)

    # group postings rows per term for interval lookup; first/last are
    # hoisted per term ONCE — re-slicing first[rows] inside the segment
    # loop is O(term blocks) per (segment, term) and dominated the
    # kernel at corpus scale (measured 24M element-copies on one query)
    rows_by_term: dict[int, np.ndarray] = {}
    first_by_term: dict[int, np.ndarray] = {}
    last_by_term: dict[int, np.ndarray] = {}
    for t in term_ids:
        rows = np.flatnonzero(tid == t)
        rows = rows[np.argsort(first[rows], kind="stable")]
        rows_by_term[t] = rows
        first_by_term[t] = first[rows]
        last_by_term[t] = last[rows]

    datas = pdf["data"].to_numpy(object)
    ndocs = pdf["n_docs"].to_numpy(np.int64)

    # When the caller ranks on ROUNDED scores (round_to set), a doc whose
    # raw score is below the kth raw score by less than one rounding ulp
    # can still round-tie with it and win on the doc_id tie-break — so
    # both the prune threshold and the final truncation keep a guard band
    # of one ulp (10^-round_to) around the kth raw score.
    guard = 10.0 ** -round_to if round_to is not None else 0.0

    def theta() -> float:
        own = heap[0][0] - guard if len(heap) >= k else -np.inf
        return own if own > theta0 else theta0

    terms_decoded: set[int] = set()

    def ensure_term(t: int) -> None:
        """Lazy per-term BULK decode: the first segment touching any of
        t's blocks decodes ALL of t's blocks in this frame in one
        vectorized pass (decode_blocks_bulk ≈ 18x per-block decode —
        numpy call overhead dominated the serving path's kernel time);
        a term every one of whose segments prunes is never decoded.
        The contribution arithmetic is the same elementwise expression
        as before (mirrors bm25.idf_expr * bm25.tf_norm_expr), so
        per-term partial products stay bitwise identical to the
        brute-force oracle's."""
        if t in terms_decoded:
            return
        terms_decoded.add(t)
        rows = rows_by_term[t]
        if len(rows) == 0:
            return
        d_all, tf, dl, offs = decode_blocks_bulk(
            [datas[r] for r in rows], first[rows], ndocs[rows]
        )
        contrib_all = idf[int(t)] * (
            (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl))
        )
        for i, r in enumerate(rows):
            decoded[int(r)] = (d_all[offs[i]:offs[i + 1]],
                               contrib_all[offs[i]:offs[i + 1]])

    for si in np.argsort(-seg_ub, kind="stable"):
        if seg_ub[si] < theta():
            break  # descending order → all remaining segments prune
        lo, hi = int(seg_lo[si]), int(seg_hi[si])
        # gather contributions from every term's blocks overlapping [lo, hi],
        # in term order (deterministic float accumulation)
        seg_docs: list[np.ndarray] = []
        seg_contrib: list[np.ndarray] = []
        for t in term_ids:
            rows = rows_by_term[t]
            ft = first_by_term[t]
            lt = last_by_term[t]
            # blocks with first <= hi and last >= lo
            i0 = int(np.searchsorted(ft, lo, side="left"))
            # step back while previous block's run may cover lo
            while i0 > 0 and lt[i0 - 1] >= lo:
                i0 -= 1
            j = i0
            if j < len(rows) and ft[j] <= hi:
                ensure_term(t)
            while j < len(rows) and ft[j] <= hi:
                d, c = decoded[int(rows[j])]
                m = (d >= lo) & (d <= hi)
                if allowed is not None and m.any():
                    # filter mask: membership in the sorted allowed set
                    pos = np.searchsorted(allowed, d)
                    pos = np.minimum(pos, len(allowed) - 1)
                    m &= allowed[pos] == d
                if banned is not None and m.any():
                    # must_not mask: NON-membership in the banned set
                    pos = np.searchsorted(banned, d)
                    pos = np.minimum(pos, len(banned) - 1)
                    m &= banned[pos] != d
                if m.any():
                    seg_docs.append(d[m])
                    seg_contrib.append(c[m])
                j += 1
        if not seg_docs:
            continue
        # left-fold accumulation in term order: seg_docs/seg_contrib were
        # appended term-by-term (ascending term_id), and each doc occurs
        # at most once per term, so `scores_u[idx] += c` applies each
        # doc's contributions sequentially in term order — bitwise equal
        # to the oracle's sorted F.aggregate fold.  (np.add.reduceat is
        # NOT usable here: it sums pairwise, not left-to-right.)
        docs_u = np.unique(np.concatenate(seg_docs))
        scores_u = np.zeros(len(docs_u), dtype=np.float64)
        nmatch = np.zeros(len(docs_u), dtype=np.int32)
        for d_arr, c_arr in zip(seg_docs, seg_contrib):
            idxs = np.searchsorted(docs_u, d_arr)
            scores_u[idxs] += c_arr
            nmatch[idxs] += 1
        need = len(term_ids) if match_all else (min_match or 0)
        if need > 1:
            qual = nmatch >= need
            docs_u, scores_u = docs_u[qual], scores_u[qual]
            if len(docs_u) == 0:
                continue
        if after is not None:
            # search_after cursor (s, d): only docs strictly after that
            # sort position qualify.  Drop docs PROVABLY at/before the
            # cursor (raw >= s rounds to >= s; raw > s + one ulp rounds
            # above s) and keep the rest — overinclusive by at most one
            # rounding ulp; the caller's final stage re-applies the
            # exact rounded comparison.  θ then tracks the kth best
            # QUALIFIED doc, so pruning stays exact for this page.
            s_a, d_a = after
            qual_a = (scores_u <= s_a + guard) & ~(
                (scores_u >= s_a) & (docs_u <= d_a)
            )
            docs_u, scores_u = docs_u[qual_a], scores_u[qual_a]
            if len(docs_u) == 0:
                continue
        results_docs.append(docs_u)
        results_scores.append(scores_u)
        # update threshold heap (score asc, doc_id desc so kth = weakest)
        if k > 0:
            cand = np.argsort(-scores_u, kind="stable")[: k]
            for ci in cand:
                item = (float(scores_u[ci]), -int(docs_u[ci]))
                if len(heap) < k:
                    heapq.heappush(heap, item)
                elif item > heap[0]:
                    heapq.heapreplace(heap, item)

    if not results_docs:
        return pd.DataFrame({"doc_id": pd.array([], dtype="int64"),
                             "score": pd.array([], dtype="float64")})
    docs_all = np.concatenate(results_docs)
    scores_all = np.concatenate(results_scores)
    # a doc appears in exactly one segment (segments partition doc space)
    order_all = np.lexsort((docs_all, -scores_all))
    if round_to is not None and k > 0 and len(order_all) > k:
        # emit every doc within one rounding ulp of the kth raw score —
        # the global (rounded) rank stage resolves the ties exactly
        kth = scores_all[order_all[k - 1]]
        top = order_all[scores_all[order_all] >= kth - guard]
    else:
        top = order_all[:k]
    return pd.DataFrame({
        "doc_id": docs_all[top].astype(np.int64),
        "score": scores_all[top].astype(np.float64),
    })


def shard_topk_impact(
    pdf: pd.DataFrame, *, idf: dict[int, float], k: int,
    round_to: int | None = None, theta0: float = -np.inf,
) -> pd.DataFrame:
    """Exact top-k under QUANTIZED scoring for one shard's impact blocks.

    Same segment/prune/merge machinery as shard_topk, but contributions
    come from the one-byte impacts (idf * (q+0.5)/IMPACT_SCALE) and the
    per-block bound is idf * (max_impact+0.5)/IMPACT_SCALE — exact, so
    pruning is tighter.  "Exact" here means: the top-k under the
    quantized scoring function, which is what the quantized oracle
    models."""
    from search_ingest_spark.index.codec import (
        IMPACT_SCALE,
        decode_impact_blocks_bulk,
    )

    if len(pdf) == 0:
        return pd.DataFrame({"doc_id": pd.array([], dtype="int64"),
                             "score": pd.array([], dtype="float64")})
    term_ids = sorted(idf)
    tid = pdf["term_id"].to_numpy(np.int64)
    mimp = pdf["max_impact"].to_numpy(np.float64)
    ub = (
        np.array([idf[t] for t in tid])
        * ((mimp + 0.5) / IMPACT_SCALE)
        * (1.0 + 1e-9)
    )
    first = pdf["first_doc_id"].to_numpy(np.int64)
    last = pdf["last_doc_id"].to_numpy(np.int64)

    starts = np.concatenate([first, last + 1])
    deltas = np.concatenate([ub, -ub])
    order = np.argsort(starts, kind="stable")
    bounds = starts[order]
    seg_ub = np.cumsum(deltas[order])
    mag = np.cumsum(np.abs(deltas[order]))
    seg_ub = seg_ub + mag * (np.arange(1, len(seg_ub) + 1) * 2.3e-16)
    uniq_mask = np.concatenate([bounds[1:] != bounds[:-1], [True]])
    seg_lo = bounds[uniq_mask]
    seg_ub = seg_ub[uniq_mask]
    seg_hi = np.concatenate([seg_lo[1:] - 1, [int(last.max())]])
    live = seg_ub > 1e-12
    seg_lo, seg_hi, seg_ub = seg_lo[live], seg_hi[live], seg_ub[live]
    # cap the segment count: past a few thousand segments the Python
    # loop's fixed per-iteration cost (searchsorted + slicing + heap)
    # dominates the kernel.  Merge runs of ADJACENT segments and bound
    # the union by its members' max UB — still a valid upper bound, so
    # pruning stays exact (merely coarser) and scores/results are
    # unchanged; the per-term bulk decode makes the wider gather cheap.
    if len(seg_lo) > _MAX_SEGMENTS:
        width = -(-len(seg_lo) // _MAX_SEGMENTS)
        starts = np.arange(0, len(seg_lo), width)
        seg_ub = np.maximum.reduceat(seg_ub, starts)
        seg_hi = seg_hi[np.minimum(starts + width - 1, len(seg_hi) - 1)]
        seg_lo = seg_lo[starts]

    heap: list[tuple[float, int]] = []
    results_docs: list[np.ndarray] = []
    results_scores: list[np.ndarray] = []
    decoded: dict[int, tuple[np.ndarray, np.ndarray]] = {}
    rows_by_term: dict[int, np.ndarray] = {}
    first_by_term: dict[int, np.ndarray] = {}
    last_by_term: dict[int, np.ndarray] = {}
    for t in term_ids:
        rows = np.flatnonzero(tid == t)
        rows = rows[np.argsort(first[rows], kind="stable")]
        rows_by_term[t] = rows
        first_by_term[t] = first[rows]
        last_by_term[t] = last[rows]
    datas = pdf["data"].to_numpy(object)
    ndocs = pdf["n_docs"].to_numpy(np.int64)
    guard = 10.0 ** -round_to if round_to is not None else 0.0

    def theta() -> float:
        own = heap[0][0] - guard if len(heap) >= k else -np.inf
        return own if own > theta0 else theta0

    terms_decoded: set[int] = set()

    def ensure_term(t: int) -> None:
        # lazy per-term BULK decode, same rationale as shard_topk's
        if t in terms_decoded:
            return
        terms_decoded.add(t)
        rows = rows_by_term[t]
        if len(rows) == 0:
            return
        d_all, q_all, offs = decode_impact_blocks_bulk(
            [datas[r] for r in rows], first[rows], ndocs[rows]
        )
        # same op order as the oracle: idf * ((q + 0.5) / SCALE)
        contrib_all = idf[int(t)] * (
            (q_all.astype(np.float64) + 0.5) / IMPACT_SCALE
        )
        for i, r in enumerate(rows):
            decoded[int(r)] = (d_all[offs[i]:offs[i + 1]],
                               contrib_all[offs[i]:offs[i + 1]])

    for si in np.argsort(-seg_ub, kind="stable"):
        if seg_ub[si] < theta():
            break
        lo, hi = int(seg_lo[si]), int(seg_hi[si])
        seg_docs: list[np.ndarray] = []
        seg_contrib: list[np.ndarray] = []
        for t in term_ids:
            rows = rows_by_term[t]
            ft = first_by_term[t]
            lt = last_by_term[t]
            i0 = int(np.searchsorted(ft, lo, side="left"))
            while i0 > 0 and lt[i0 - 1] >= lo:
                i0 -= 1
            j = i0
            if j < len(rows) and ft[j] <= hi:
                ensure_term(t)
            while j < len(rows) and ft[j] <= hi:
                d, c = decoded[int(rows[j])]
                m = (d >= lo) & (d <= hi)
                if m.any():
                    seg_docs.append(d[m])
                    seg_contrib.append(c[m])
                j += 1
        if not seg_docs:
            continue
        docs_u = np.unique(np.concatenate(seg_docs))
        scores_u = np.zeros(len(docs_u), dtype=np.float64)
        for d_arr, c_arr in zip(seg_docs, seg_contrib):
            idxs = np.searchsorted(docs_u, d_arr)
            scores_u[idxs] += c_arr
        results_docs.append(docs_u)
        results_scores.append(scores_u)
        if k > 0:
            cand = np.argsort(-scores_u, kind="stable")[:k]
            for ci in cand:
                item = (float(scores_u[ci]), -int(docs_u[ci]))
                if len(heap) < k:
                    heapq.heappush(heap, item)
                elif item > heap[0]:
                    heapq.heapreplace(heap, item)

    if not results_docs:
        return pd.DataFrame({"doc_id": pd.array([], dtype="int64"),
                             "score": pd.array([], dtype="float64")})
    docs_all = np.concatenate(results_docs)
    scores_all = np.concatenate(results_scores)
    order_all = np.lexsort((docs_all, -scores_all))
    if round_to is not None and k > 0 and len(order_all) > k:
        kth = scores_all[order_all[k - 1]]
        top = order_all[scores_all[order_all] >= kth - guard]
    else:
        top = order_all[:k]
    return pd.DataFrame({
        "doc_id": docs_all[top].astype(np.int64),
        "score": scores_all[top].astype(np.float64),
    })


def iter_empty(_: Iterator) -> Iterator[pd.DataFrame]:  # pragma: no cover
    yield from ()
