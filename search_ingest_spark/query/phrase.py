"""Phrase (match_phrase) top-k over the positional index.

Capability analog: any ES index built by the reference answers
`match_phrase` because Lucene records positions for every `text` field
(`/root/reference/src/search-ingest/schemas.cr:62-77`).  This module is
the Spark-native equivalent over the `positions` table written by
`build_index(with_positions=True)`.

Semantics (Lucene exact PhraseQuery, slop=0):
- a phrase occurrence at base position p requires slot i's term at
  position p+i for EVERY slot (repeated terms are distinct slots);
- phrase_freq(d) = number of bases;
- score(d) = (Σ_slots idf(term_slot)) * tfnorm(phrase_freq, dl) under
  BM25 (k1=1.2, b=0.75) — the phrase scored as one synthetic term whose
  idf is the slot-idf sum, Lucene's PhraseQuery weight.

Execution shape (scales like a WAND term query):
1. plan on the driver: analyze the phrase, slot table, per-term idf from
   the pyarrow-pruned term_dict read (no Spark job);
2. ONE scan of the positions table pruned to the phrase's terms
   (PushedFilters on `term`, term-sorted files → row-group pruning);
3. explode positions → (doc, base=pos-slot) → count distinct slots ==
   n_slots → phrase_freq per doc; shuffle volume is bounded by the
   phrase terms' postings, never the corpus;
4. join doc_lens ONLY for matched docs, score, TakeOrdered top-k.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from search_ingest_spark.catalog import Catalog
from search_ingest_spark.index import build as ib
from search_ingest_spark.query.bm25 import B, K1, analyze_query
from search_ingest_spark.ranking import ranked_desc


class PhraseSearcher:
    """Phrase query handle over a catalog built with_positions=True."""

    def __init__(self, spark: SparkSession, cat: Catalog) -> None:
        self.spark = spark
        self.cat = cat
        st = cat.read(ib.STATS_TABLE).first()
        self.n_docs = int(st["n_docs"])
        self.avgdl = float(st["avgdl"])
        self.mode = st["analyzer"]
        import pyarrow.dataset as ds

        self._dict_ds = ds.dataset(cat.data_path(ib.TERM_DICT_TABLE))

    def _idf(self, terms: list[str]) -> dict[str, float]:
        import pyarrow.compute as pc

        tbl = self._dict_ds.to_table(
            columns=["term", "df"],
            filter=pc.field("term").isin(sorted(set(terms))),
        )
        n = self.n_docs
        return {
            t: float(np.log(1.0 + (n - df + 0.5) / (df + 0.5)))
            for t, df in zip(tbl["term"].to_pylist(), tbl["df"].to_pylist())
        }

    def topk(
        self, phrase_text: str, k: int = 10, *, slop: int = 0,
        round_to: int | None = None,
    ) -> DataFrame:
        """(doc_id, score, rank) for phrase matches within `slop`.

        The query is analyzed POSITION-AWARE: under the standard
        analyzer a folded token and its preserved original occupy the
        same slot (query-side synonym stack, like ES's match_phrase on a
        preserve_original field) — a slot matches if ANY of its forms is
        at the right position.  Slot idf uses the slot's first indexed
        form (the folded primary).

        `slop > 0` = ES match_phrase slop (Lucene sloppy phrase), with
        ANCHORED semantics over adjusted positions a = pos - slot:
        every adjusted position a0 of slot 0 is an anchor; the anchor
        matches iff every other slot has an adjusted position within
        slop of a0, its match length m(a0) = max_i min_a |a - a0| (the
        anchored Chebyshev radius), and it contributes Lucene's sloppy
        weight 1/(1 + m) to the document's phrase frequency.  slop=0
        reduces EXACTLY to the exact-phrase pipeline (m=0 forces every
        slot onto the anchor; each base contributes weight 1) —
        asserted by test.  Divergence from Lucene, documented: Lucene's
        SloppyPhraseMatcher enumerates matches with a greedy pqueue
        over the span (order-dependent, repeats-aware); this
        enumeration is declarative (set-based, oracle-replayable in
        SQL) but uses the identical 1/(1+matchLength) weight and the
        identical slot-idf-sum BM25 weight on top.  Like Lucene,
        transposed terms match at slop ≥ 2."""
        out_schema = "doc_id long, score double, rank int"
        plan = self._plan_slots(phrase_text)
        if plan is None:
            return self.spark.createDataFrame([], out_schema)
        slot_rows, n_slots, idf_sum = plan
        if slop > 0 and n_slots > 1:
            return self._run_slots_sloppy(
                slot_rows, n_slots, idf_sum, k, slop, round_to)
        return self._run_slots(slot_rows, n_slots, idf_sum, k, round_to)

    def _plan_slots(
        self, phrase_text: str
    ) -> tuple[list[tuple[str, int]], int, float] | None:
        """Driver-side phrase planning: (slot_rows, n_slots, idf_sum),
        or None when the phrase cannot match (no tokens, or a slot with
        no indexed form)."""
        if self.mode == "simple":
            pairs = [(t, i) for i, t in
                     enumerate(analyze_query(phrase_text, mode="simple"))]
        else:
            from search_ingest_spark.analysis import analyze_pos

            pairs = analyze_pos(phrase_text)
        if not pairs:
            return None
        n_slots = 1 + max(p for _, p in pairs)
        slot_terms: dict[int, list[str]] = {}
        for t, p in pairs:
            slot_terms.setdefault(p, []).append(t)
        idf = self._idf([t for t, _ in pairs])
        idf_sum = 0.0
        for p in range(n_slots):
            indexed = [t for t in slot_terms.get(p, []) if t in idf]
            if not indexed:
                # a slot none of whose forms is indexed matches nothing
                return None
            idf_sum += idf[indexed[0]]

        slot_rows = [(t, p) for p, ts in sorted(slot_terms.items())
                     for t in ts if t in idf]
        return slot_rows, n_slots, idf_sum

    def all_scores(
        self, phrase_text: str, *, slop: int = 0,
        round_to: int | None = None,
    ) -> DataFrame:
        """(doc_id, score) for EVERY phrase-matching doc — no top-k.

        The rescore building block (ES `rescore` runs the expensive
        phrase query only over the first-pass window, so the consumer
        semi-joins this against its window; the plan is still pruned to
        the phrase terms' positions, never the corpus)."""
        plan = self._plan_slots(phrase_text)
        if plan is None:
            return self.spark.createDataFrame([], "doc_id long, score double")
        slot_rows, n_slots, idf_sum = plan
        if slop > 0 and n_slots > 1:
            return self._run_slots_sloppy(
                slot_rows, n_slots, idf_sum, None, slop, round_to)
        return self._run_slots(slot_rows, n_slots, idf_sum, None, round_to)

    def _run_slots(self, slot_rows: list[tuple[str, int]], n_slots: int,
                   idf_sum: float, k: int | None,
                   round_to: int | None) -> DataFrame:
        """Shared slot-matching pipeline: pruned positions scan →
        (doc, base) alignment → phrase_freq → slot-idf-sum BM25 →
        top-k (k=None → full scored set, unranked).  `slot_rows` may
        stack several terms on one slot (synonym stacks, phrase-prefix
        expansions)."""
        slot_df = self.spark.createDataFrame(
            slot_rows, "term string, slot int",
        )
        slots = sorted({t for t, _ in slot_rows})
        pos = self.cat.read(ib.POSITIONS_TABLE).where(
            F.col("term").isin(slots)
        )
        x = (
            pos.select("term", "doc_id", F.explode("positions").alias("pos"))
            .join(F.broadcast(slot_df), "term")
            .select("doc_id", (F.col("pos") - F.col("slot")).alias("base"), "slot")
        )
        bases = (
            x.groupBy("doc_id", "base")
            .agg(F.countDistinct("slot").alias("_ns"))
            .where(F.col("_ns") == n_slots)
        )
        pfreq = bases.groupBy("doc_id").agg(F.count("*").alias("pfreq"))
        dl = self.cat.read(ib.DOC_LENS_TABLE).select("doc_id", "dl")
        scored = pfreq.join(dl, "doc_id").select(
            "doc_id",
            (
                F.lit(idf_sum)
                * (F.col("pfreq") * (K1 + 1.0))
                / (F.col("pfreq") + K1 * (1.0 - B + B * F.col("dl") / F.lit(self.avgdl)))
            ).alias("score"),
        )
        if round_to is not None:
            scored = scored.withColumn("score", F.round("score", round_to))
        if k is None:
            return scored
        topk = scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
        return ranked_desc(topk, "score", "doc_id")

    def _run_slots_sloppy(self, slot_rows: list[tuple[str, int]],
                          n_slots: int, idf_sum: float, k: int | None,
                          slop: int, round_to: int | None) -> DataFrame:
        """Sloppy slot matching (see topk docstring for semantics).

        Plan shape — same envelope as the exact path: ONE positions
        scan pruned to the phrase's terms, everything downstream
        bounded by those postings (never the corpus).  The anchor ⋈
        slot join is an equi-join on doc_id + a |a-a0|<=slop residual;
        per doc both sides are the phrase terms' occurrence counts, so
        the join output is O(occ² per doc) worst case — fine for
        natural phrases, and the slop bound prunes most pairs at the
        join."""
        slot_df = self.spark.createDataFrame(
            slot_rows, "term string, slot int",
        )
        terms = sorted({t for t, _ in slot_rows})
        pos = self.cat.read(ib.POSITIONS_TABLE).where(
            F.col("term").isin(terms)
        )
        x = (
            pos.select("term", "doc_id", F.explode("positions").alias("pos"))
            .join(F.broadcast(slot_df), "term")
            .select("doc_id", (F.col("pos") - F.col("slot")).alias("a"),
                    "slot")
        )
        anchors = (x.where(F.col("slot") == 0)
                   .select("doc_id", F.col("a").alias("a0")).distinct())
        # caller guarantees n_slots > 1 (a one-slot phrase has no
        # displacement to relax — slop degenerates to the exact path)
        others = x.where(F.col("slot") > 0)
        cand = (
            anchors.join(others, "doc_id")
            .where(F.abs(F.col("a") - F.col("a0")) <= slop)
            .groupBy("doc_id", "a0", "slot")
            .agg(F.min(F.abs(F.col("a") - F.col("a0"))).alias("d"))
        )
        m = (
            cand.groupBy("doc_id", "a0")
            .agg(F.countDistinct("slot").alias("_ns"),
                 F.max("d").alias("m"))
            .where(F.col("_ns") == n_slots - 1)
        )
        pfreq = m.groupBy("doc_id").agg(
            F.sum(1.0 / (1.0 + F.col("m"))).alias("pfreq"))
        dl = self.cat.read(ib.DOC_LENS_TABLE).select("doc_id", "dl")
        scored = pfreq.join(dl, "doc_id").select(
            "doc_id",
            (
                F.lit(idf_sum)
                * (F.col("pfreq") * (K1 + 1.0))
                / (F.col("pfreq") + K1 * (1.0 - B + B * F.col("dl") / F.lit(self.avgdl)))
            ).alias("score"),
        )
        if round_to is not None:
            scored = scored.withColumn("score", F.round("score", round_to))
        if k is None:
            return scored
        topk = scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
        return ranked_desc(topk, "score", "doc_id")

    def span_near_topk(
        self, terms_text: str, k: int = 10, *, slop: int = 2,
        in_order: bool = False, round_to: int | None = None,
    ) -> DataFrame:
        """ES `span_near` with single-term clauses: docs containing one
        occurrence of EVERY clause term inside a window of
        (width − n_clauses) ≤ `slop` tokens, optionally in clause order
        (`in_order=True`, strictly increasing positions — Lucene's
        ordered SpanNearQuery).  Unlike match_phrase slop there is no
        anchor slot: any qualifying combination counts, which is what
        makes unordered proximity search ("these words near each
        other") expressible.

        Scoring, documented deterministic subset: span_freq = the
        NUMBER of qualifying position combinations, scored like the
        phrase weight — (Σ clause idf) · tfnorm(span_freq, dl).
        Lucene's SpanScorer instead sums 1/(1+matchLength) over a
        greedy non-overlapping enumeration; the combination count is
        order-independent and SQL-replayable, same monotonicity (more
        and tighter co-occurrence ⇒ larger span_freq).

        Plan: ONE positions scan pruned to the clause terms
        (PushedFilters on `term`), groupBy(doc) applyInPandas kernel
        over sorted position arrays — shuffle bounded by the clause
        terms' postings, never the corpus.  The kernel evaluates the
        combination lattice vectorized (meshgrid) and guards the
        product (content-word clauses stay tiny; a stopword clause can
        exceed it, the error says so)."""
        import pandas as pd

        if slop < 0:
            raise ValueError(f"slop must be >= 0, got {slop}")
        terms = analyze_query(terms_text, mode=self.mode)
        out_schema = "doc_id long, score double, rank int"
        if not terms:
            return self.spark.createDataFrame([], out_schema)
        if len(terms) != len(set(terms)):
            raise ValueError(
                f"span_near clauses must be distinct terms, got {terms}")
        if len(terms) > 4:
            raise ValueError(
                f"span_near caps clauses at 4, got {len(terms)}")
        idf = self._idf(terms)
        if any(t not in idf for t in terms):
            return self.spark.createDataFrame([], out_schema)
        idf_sum = 0.0
        for t in terms:  # clause-order accumulation, oracle mirrors
            idf_sum += idf[t]
        n = len(terms)
        _terms, _slop, _ord = list(terms), int(slop), bool(in_order)

        def ker(it):
            for pdf in it:
                out_d, out_c = [], []
                for d, tp in zip(pdf["doc_id"].values, pdf["tp"].values):
                    by_term = {e["term"]: np.asarray(e["positions"],
                                                     dtype=np.int64)
                               for e in tp}
                    lists = [by_term[t] for t in _terms]
                    prod = 1
                    for li in lists:
                        prod *= len(li)
                    if prod > 1_000_000:
                        raise ValueError(
                            f"span_near combination lattice too large "
                            f"({prod}) for doc {d} — clause terms too "
                            f"frequent")
                    grids = np.meshgrid(*lists, indexing="ij")
                    stack = np.stack([g.ravel() for g in grids])
                    width = stack.max(axis=0) - stack.min(axis=0) + 1
                    ok = (width - n) <= _slop
                    if _ord:
                        for i in range(n - 1):
                            ok &= stack[i] < stack[i + 1]
                    c = int(ok.sum())
                    if c > 0:
                        out_d.append(int(d))
                        out_c.append(c)
                yield pd.DataFrame(
                    {"doc_id": pd.array(out_d, dtype="int64"),
                     "spans": pd.array(out_c, dtype="int64")})

        pos = self.cat.read(ib.POSITIONS_TABLE).where(
            F.col("term").isin(sorted(terms)))
        # ONE shuffle on doc_id (bounded by the clause terms' pruned
        # postings); size(tp) == n keeps only docs with every clause
        # present (terms are distinct), so the kernel sees candidates
        # only — one row per doc, via mapInPandas (no per-group call)
        g = (pos.select("doc_id", "term", "positions")
             .groupBy("doc_id")
             .agg(F.collect_list(F.struct("term", "positions")).alias("tp"))
             .where(F.size("tp") == n))
        spans = g.mapInPandas(ker, "doc_id long, spans long")
        dl = self.cat.read(ib.DOC_LENS_TABLE).select("doc_id", "dl")
        scored = spans.join(dl, "doc_id").select(
            "doc_id",
            (F.lit(idf_sum)
             * (F.col("spans") * (K1 + 1.0))
             / (F.col("spans")
                + K1 * (1.0 - B + B * F.col("dl") / F.lit(self.avgdl)))
             ).alias("score"),
        )
        if round_to is not None:
            scored = scored.withColumn("score", F.round("score", round_to))
        topk = scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
        return ranked_desc(topk, "score", "doc_id")

    def topk_phrase_prefix(
        self, phrase_text: str, k: int = 10, *, max_expansions: int = 50,
        round_to: int | None = None,
    ) -> DataFrame:
        """ES `match_phrase_prefix` (search-as-you-type): the LAST
        analyzed term is treated as a prefix and expanded over the
        term-sorted dictionary (df desc, term asc, capped at
        `max_expansions` — the same deterministic rewrite as the
        wand prefix/wildcard queries); the phrase then matches when
        slots 0..n-2 align exactly and the last slot matches ANY
        expansion.  The last slot's idf contribution uses the highest-
        df expansion (the stack-primary convention topk() uses for
        synonym stacks).  Simple-analyzer queries only (the driver
        corpus mode)."""
        import pyarrow.compute as pc

        out_schema = "doc_id long, score double, rank int"
        terms = analyze_query(phrase_text, mode="simple")
        if not terms:
            return self.spark.createDataFrame([], out_schema)
        prefix = terms[-1]
        hi = prefix[:-1] + chr(ord(prefix[-1]) + 1)
        exp = self._dict_ds.to_table(
            columns=["term", "df"],
            filter=(pc.field("term") >= prefix) & (pc.field("term") < hi),
        ).to_pandas()
        if len(exp) == 0:
            return self.spark.createDataFrame([], out_schema)
        exp = exp.sort_values(["df", "term"], ascending=[False, True],
                              kind="stable").head(int(max_expansions))
        fixed = terms[:-1]
        idf = self._idf(fixed)
        if any(t not in idf for t in fixed):
            return self.spark.createDataFrame([], out_schema)
        n = self.n_docs
        df_top = int(exp["df"].iloc[0])
        idf_sum = sum(idf[t] for t in fixed) + float(
            np.log(1.0 + (n - df_top + 0.5) / (df_top + 0.5))
        )
        n_slots = len(terms)
        slot_rows = [(t, i) for i, t in enumerate(fixed)] + [
            (t, n_slots - 1) for t in exp["term"]
        ]
        return self._run_slots(slot_rows, n_slots, idf_sum, k, round_to)


    def topk_many(
        self, queries: dict[int, str], k: int = 10, *,
        round_to: int | None = None,
    ) -> DataFrame:
        """Execute a whole phrase set in ONE Spark job (the throughput
        path, like wand.Searcher.topk_many): the positions scan prunes
        to the UNION of all phrases' terms, slot tables for every query
        ride one broadcast, and per-query phrase frequencies come out of
        a single aggregation.  Returns (query_id, doc_id, score, rank).
        """
        from pyspark.sql import Window

        out_schema = "query_id int, doc_id long, score double, rank int"
        plans = []  # (qid, slot_rows, n_slots, idf_sum)
        for qid, text in queries.items():
            if self.mode == "simple":
                pairs = [(t, i) for i, t in
                         enumerate(analyze_query(text, mode="simple"))]
            else:
                from search_ingest_spark.analysis import analyze_pos

                pairs = analyze_pos(text)
            if not pairs:
                continue
            n_slots = 1 + max(p for _, p in pairs)
            idf = self._idf([t for t, _ in pairs])
            slot_terms: dict[int, list[str]] = {}
            for t, p in pairs:
                slot_terms.setdefault(p, []).append(t)
            idf_sum, ok = 0.0, True
            for p in range(n_slots):
                indexed = [t for t in slot_terms.get(p, []) if t in idf]
                if not indexed:
                    ok = False
                    break
                idf_sum += idf[indexed[0]]
            if not ok:
                continue
            rows = [(qid, t, p) for p, ts in sorted(slot_terms.items())
                    for t in ts if t in idf]
            plans.append((qid, rows, n_slots, idf_sum))
        if not plans:
            return self.spark.createDataFrame([], out_schema)

        slot_df = self.spark.createDataFrame(
            [r for _, rows, _, _ in plans for r in rows],
            "query_id int, term string, slot int",
        )
        meta_df = self.spark.createDataFrame(
            [(qid, n, s) for qid, _, n, s in plans],
            "query_id int, n_slots int, idf_sum double",
        )
        all_terms = sorted({r[1] for _, rows, _, _ in plans for r in rows})
        pos = self.cat.read(ib.POSITIONS_TABLE).where(
            F.col("term").isin(all_terms)
        )
        x = (
            pos.select("term", "doc_id", F.explode("positions").alias("pos"))
            .join(F.broadcast(slot_df), "term")
            .select("query_id", "doc_id",
                    (F.col("pos") - F.col("slot")).alias("base"), "slot")
        )
        bases = (
            x.groupBy("query_id", "doc_id", "base")
            .agg(F.countDistinct("slot").alias("_ns"))
            .join(F.broadcast(meta_df), "query_id")
            .where(F.col("_ns") == F.col("n_slots"))
        )
        pfreq = bases.groupBy("query_id", "doc_id", "idf_sum").agg(
            F.count("*").alias("pfreq")
        )
        dl = self.cat.read(ib.DOC_LENS_TABLE).select("doc_id", "dl")
        scored = pfreq.join(dl, "doc_id").select(
            "query_id", "doc_id",
            (
                F.col("idf_sum")
                * (F.col("pfreq") * (K1 + 1.0))
                / (F.col("pfreq") + K1 * (1.0 - B + B * F.col("dl") / F.lit(self.avgdl)))
            ).alias("score"),
        )
        if round_to is not None:
            scored = scored.withColumn("score", F.round("score", round_to))
        w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "doc_id", "score", "rank")
        )


def phrase_prefix_oracle_sql(
    phrase_text: str, k: int = 10, *, max_expansions: int = 50,
    table: str = "documents", id_col: str = "doc_id",
    text_col: str = "text", round_to: int = 4,
) -> str:
    """DuckDB oracle for topk_phrase_prefix: last term expanded over
    the corpus vocabulary ([prefix, prefix+1) range, df desc cap),
    slot matching with the expansion stacked on the last slot, last-
    slot idf from the highest-df expansion."""
    slots = analyze_query(phrase_text, mode="simple")
    fixed, prefix = slots[:-1], slots[-1]
    nslots = len(slots)
    p = prefix.replace("'", "''")
    hi = (prefix[:-1] + chr(ord(prefix[-1]) + 1)).replace("'", "''")
    fixed_vals = ", ".join(
        f"('{t.replace(chr(39), chr(39) * 2)}', {i})"
        for i, t in enumerate(fixed)
    ) or "('', -1)"
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
vocab AS (
  SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM pos GROUP BY term
),
exp AS (
  SELECT term, df, row_number() OVER (ORDER BY df DESC, term ASC) AS rn
  FROM vocab WHERE term >= '{p}' AND term < '{hi}'
  ORDER BY df DESC, term ASC LIMIT {int(max_expansions)}
),
fixed(term, slot) AS (VALUES {fixed_vals}),
slots AS (
  SELECT term, slot FROM fixed WHERE slot >= 0
  UNION ALL
  SELECT term, {nslots - 1} AS slot FROM exp
),
idfsum AS (
  SELECT (SELECT coalesce(sum(
            ln(1.0 + (stats.n_docs - v.df + 0.5) / (v.df + 0.5))), 0.0)
          FROM fixed JOIN vocab v USING (term) CROSS JOIN stats
          WHERE fixed.slot >= 0)
       + (SELECT ln(1.0 + (stats.n_docs - exp.df + 0.5) / (exp.df + 0.5))
          FROM exp CROSS JOIN stats WHERE exp.rn = 1) AS s
),
x AS (
  SELECT DISTINCT doc_id, pos - slot AS base, slot
  FROM pos JOIN slots USING (term)
),
pf AS (
  SELECT doc_id, count(*)::BIGINT AS pfreq FROM (
    SELECT doc_id, base FROM x GROUP BY doc_id, base
    HAVING count(DISTINCT slot) = {nslots}
  ) GROUP BY doc_id
),
scores AS (
  SELECT pf.doc_id,
         idfsum.s * (pf.pfreq * ({K1} + 1.0))
         / (pf.pfreq + {K1} * (1.0 - {B} + {B} * dl.dl / stats.avgdl)) AS raw
  FROM pf JOIN dl USING (doc_id) CROSS JOIN stats CROSS JOIN idfsum
),
topk AS (
  SELECT doc_id, round(raw, {round_to})::DOUBLE AS score FROM scores
  ORDER BY score DESC, doc_id ASC LIMIT {k}
)
SELECT doc_id, score,
       row_number() OVER (ORDER BY score DESC, doc_id ASC)::INT AS rank
FROM topk
""".strip()


def phrase_oracle_sql(
    phrase_text: str, k: int = 10, *, slop: int = 0,
    table: str = "documents", id_col: str = "doc_id",
    text_col: str = "text", round_to: int = 4,
) -> str:
    """DuckDB oracle computing the identical phrase top-k from RAW text
    with the simple analyzer — position extraction, slot matching
    (exact at slop=0, anchored sloppy otherwise — the same declarative
    semantics PhraseSearcher.topk documents), phrase_freq, and the
    slot-idf-sum BM25 score."""
    slots = analyze_query(phrase_text, mode="simple")
    nslots = len(slots)
    slot_vals = ", ".join(
        f"('{t.replace(chr(39), chr(39) * 2)}', {i})" for i, t in enumerate(slots)
    )
    if slop > 0 and nslots > 1:
        pf = f"""
anchors AS (
  SELECT DISTINCT doc_id, pos - slot AS a0 FROM pos JOIN slots USING (term)
  WHERE slot = 0
),
cand AS (
  SELECT a.doc_id, a.a0, x.slot, min(abs(x.a - a.a0)) AS d
  FROM anchors a JOIN (
    SELECT doc_id, pos - slot AS a, slot FROM pos JOIN slots USING (term)
    WHERE slot > 0
  ) x ON x.doc_id = a.doc_id AND abs(x.a - a.a0) <= {int(slop)}
  GROUP BY a.doc_id, a.a0, x.slot
),
m AS (
  SELECT doc_id, a0, max(d) AS m FROM cand GROUP BY doc_id, a0
  HAVING count(DISTINCT slot) = {nslots - 1}
),
pf AS (
  SELECT doc_id, sum(1.0 / (1.0 + m))::DOUBLE AS pfreq FROM m GROUP BY doc_id
)"""
    else:
        pf = f"""
x AS (
  SELECT doc_id, pos - slot AS base, slot FROM pos JOIN slots USING (term)
),
pf AS (
  SELECT doc_id, count(*)::BIGINT AS pfreq FROM (
    SELECT doc_id, base FROM x GROUP BY doc_id, base
    HAVING count(DISTINCT slot) = {nslots}
  ) GROUP BY doc_id
)"""
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
slots(term, slot) AS (VALUES {slot_vals}),
dfreq AS (
  SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM pos
  WHERE term IN (SELECT term FROM slots) GROUP BY term
),
idfsum AS (
  SELECT sum(ln(1.0 + (stats.n_docs - df + 0.5) / (df + 0.5))) AS s
  FROM slots JOIN dfreq USING (term) CROSS JOIN stats
),{pf},
scores AS (
  SELECT pf.doc_id,
         idfsum.s * (pf.pfreq * ({K1} + 1.0))
         / (pf.pfreq + {K1} * (1.0 - {B} + {B} * dl.dl / stats.avgdl)) AS raw
  FROM pf JOIN dl USING (doc_id) CROSS JOIN stats CROSS JOIN idfsum
),
topk AS (
  SELECT doc_id, round(raw, {round_to})::DOUBLE AS score FROM scores
  ORDER BY score DESC, doc_id ASC LIMIT {k}
)
SELECT doc_id, score,
       row_number() OVER (ORDER BY score DESC, doc_id ASC)::INT AS rank
FROM topk
""".strip()


def span_near_oracle_sql(
    terms_text: str, k: int = 10, *, slop: int = 2,
    in_order: bool = False, round_to: int = 4,
) -> str:
    """DuckDB replay of span_near_topk: position combinations counted
    brute-force from raw text (1-based positions — window width and
    order are offset-invariant), same clause-order idf sum and phrase
    tfnorm."""
    terms = analyze_query(terms_text, mode="simple")
    if not terms or len(terms) != len(set(terms)) or len(terms) > 4:
        raise ValueError(f"bad span_near clause list: {terms}")
    n = len(terms)
    xs, joins = [], []
    for i, t in enumerate(terms):
        lit = "'" + t.replace("'", "''") + "'"
        xs.append(f"x{i} AS (SELECT doc_id, pos AS p{i} FROM tok "
                  f"WHERE w = {lit})")
        if i:
            joins.append(f"JOIN x{i} USING (doc_id)")
    ps = ", ".join(f"p{i}" for i in range(n))
    width = (f"greatest({ps}) - least({ps}) + 1" if n > 1 else "1")
    conds = [f"({width}) - {n} <= {int(slop)}"]
    if in_order:
        conds += [f"p{i} < p{i + 1}" for i in range(n - 1)]
    idf_terms = []
    for t in terms:
        lit = "'" + t.replace("'", "''") + "'"
        idf_terms.append(
            f"ln(1.0 + (st.n_docs - "
            f"(SELECT df FROM dfreq WHERE term = {lit}) + 0.5) / "
            f"((SELECT df FROM dfreq WHERE term = {lit}) + 0.5))")
    idf_sum = " + ".join(idf_terms)
    term_list = ", ".join("('" + t.replace("'", "''") + "')"
                          for t in sorted(set(terms)))
    xs_sql = ",\n".join(xs)
    join_sql = " ".join(joins)
    cond_sql = " AND ".join(conds)
    return f"""
WITH docs_arr AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS a
  FROM documents
),
tok AS (
  SELECT doc_id, generate_subscripts(a, 1) AS pos, unnest(a) AS w
  FROM docs_arr
),
q(term) AS (VALUES {term_list}),
dfreq AS (
  SELECT w AS term, count(DISTINCT doc_id)::BIGINT AS df FROM tok
  WHERE w IN (SELECT term FROM q) GROUP BY 1
),
{xs_sql},
spans AS (
  SELECT x0.doc_id, count(*)::BIGINT AS c
  FROM x0 {join_sql}
  WHERE {cond_sql}
  GROUP BY 1
),
dl AS (SELECT doc_id, len(a)::INT AS dl FROM docs_arr),
st AS (SELECT count(*)::BIGINT AS n_docs,
              avg(len(a))::DOUBLE AS avgdl FROM docs_arr),
scored AS (
  SELECT s.doc_id,
         round(({idf_sum})
               * (s.c * ({K1} + 1.0))
               / (s.c + {K1} * (1.0 - {B} + {B} * dl.dl / st.avgdl)),
               {int(round_to)})::DOUBLE AS score
  FROM spans s JOIN dl USING (doc_id) CROSS JOIN st
),
topk AS (
  SELECT doc_id, score FROM scored
  ORDER BY score DESC, doc_id ASC LIMIT {int(k)}
)
SELECT doc_id, score,
       row_number() OVER (ORDER BY score DESC, doc_id ASC)::INT AS rank
FROM topk
""".strip()
