"""Deterministic synthetic web-pages corpus (BASELINE input_hint shape).

Generates the Group-B fixtures from FIXTURES.md: a `pages` table
`(url, warc_ts, html, text, lang)` with

- Zipfian token distribution with deliberately hot stopword-like terms
  (df > 20% of docs) to exercise the skew-defused posting merge;
- non-ASCII tokens (café, naïve, zürich) to exercise asciifolding
  preserve_original (`/root/reference/src/search-ingest/schemas.cr:69-76`);
- duplicate urls with differing warc_ts to exercise latest-per-url upsert
  semantics (reference changefeed Updated events, `table.cr:25-46`);

plus a `queries` set.  Generation is distributed: built with Spark
`range()` + JVM-side expressions and one vectorized text-assembly UDF —
no driver-side materialization, so the same generator scales to bench
sizes (and, on a real cluster, to arbitrarily large synthetic corpora).
Seeded and deterministic: doc i's content depends only on (seed, i).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

# Vocabulary: hot "stopwords" (very high df), a body of medium terms, and
# accented terms for fold tests.
HOT_TERMS = ["the", "and", "data", "page", "web"]
ACCENT_TERMS = ["café", "naïve", "zürich", "señor", "déjà"]
_BODY_VOCAB_SIZE = 5000
BODY_VOCAB = [f"tok{i:04d}" for i in range(_BODY_VOCAB_SIZE)]
LANGS = ["en", "de", "fr", "es"]

DEFAULT_SEED = 42


def _doc_words(seed: int, i: int, min_len: int = 20, max_len: int = 120) -> list[str]:
    """Deterministic token list for doc i (pure function of seed+i)."""
    rng = np.random.default_rng(np.uint64(seed) * np.uint64(1_000_003) + np.uint64(i))
    n = int(rng.integers(min_len, max_len))
    # Zipf over the body vocab (a=1.3 → heavy head), clipped to vocab
    body_idx = np.minimum(rng.zipf(1.3, size=n) - 1, _BODY_VOCAB_SIZE - 1)
    words = [BODY_VOCAB[j] for j in body_idx]
    # hot terms: each appears with prob ~0.35/doc → df >> 20% of docs
    for h in HOT_TERMS:
        if rng.random() < 0.35:
            words.insert(int(rng.integers(0, len(words) + 1)), h)
    # accented terms sprinkled at ~5%
    if rng.random() < 0.05:
        words.insert(0, ACCENT_TERMS[int(rng.integers(0, len(ACCENT_TERMS)))])
    return words


def _page_text(seed: int, i: int) -> str:
    return " ".join(_doc_words(seed, i))


def _make_page_text_udf(seed: int):
    """Seed is bound via closure so it ships inside the pickled UDF to
    executor Python workers (a module global would not propagate)."""

    @pandas_udf(StringType())
    def page_text_udf(idx: pd.Series) -> pd.Series:
        return idx.map(lambda i: _page_text(seed, int(i)))

    return page_text_udf


def generate_pages(
    spark: SparkSession,
    n_docs: int,
    *,
    seed: int = DEFAULT_SEED,
    dup_fraction: float = 0.05,
    partitions: int | None = None,
) -> DataFrame:
    """Distributed pages table: `range(n_docs)` → expressions + one Arrow UDF.

    A `dup_fraction` of urls additionally appear with an EARLIER warc_ts
    and different text (the stale crawl) — latest-per-url must win.
    """
    page_text_udf = _make_page_text_udf(seed)
    base = spark.range(0, n_docs, numPartitions=partitions)
    n_dup = int(n_docs * dup_fraction)
    # stale re-crawls of the first n_dup urls: idx i → generator index n_docs+i
    dup = (
        spark.range(0, n_dup, numPartitions=partitions)
        .select(
            F.col("id"),
            (F.col("id") + F.lit(n_docs)).alias("gen_idx"),
            F.lit(-86400).alias("ts_shift"),
        )
    )
    fresh = base.select(
        F.col("id"), F.col("id").alias("gen_idx"), F.lit(0).alias("ts_shift")
    )
    rows = fresh.unionByName(dup)
    text = page_text_udf(F.col("gen_idx"))
    return rows.select(
        F.concat(F.lit("https://example.test/page/"), F.col("id")).alias("url"),
        (
            F.to_timestamp(F.lit("2026-01-01 00:00:00"))
            + F.make_interval(secs=F.col("id") % 86400 + F.col("ts_shift"))
        ).alias("warc_ts"),
        F.encode(
            F.concat(F.lit("<html><body><p>"), text, F.lit("</p></body></html>")),
            "utf-8",
        ).alias("html"),
        text.alias("text"),
        F.element_at(
            F.array(*[F.lit(lang) for lang in LANGS]),
            (F.col("id") % len(LANGS) + 1).cast("int"),
        ).alias("lang"),
    )


def reference_queries(seed: int = DEFAULT_SEED, n: int = 20) -> list[tuple[int, str, int]]:
    """The reference query set: (query_id, query_text, k) triples.

    Mix of hot terms, body terms, accented terms (both folded and raw
    forms), and multi-term queries — deterministic."""
    rng = np.random.default_rng(seed)
    out: list[tuple[int, str, int]] = []
    for qid in range(n):
        kind = qid % 4
        if kind == 0:  # hot ∧ medium
            q = f"{HOT_TERMS[qid % len(HOT_TERMS)]} {BODY_VOCAB[int(rng.integers(0, 50))]}"
        elif kind == 1:  # medium pair
            q = f"{BODY_VOCAB[int(rng.integers(0, 200))]} {BODY_VOCAB[int(rng.integers(200, 1000))]}"
        elif kind == 2:  # accented (query-time analysis must fold identically)
            q = f"{ACCENT_TERMS[qid % len(ACCENT_TERMS)]} {BODY_VOCAB[int(rng.integers(0, 100))]}"
        else:  # three terms incl. a rare one
            q = (
                f"{HOT_TERMS[(qid + 1) % len(HOT_TERMS)]} "
                f"{BODY_VOCAB[int(rng.integers(0, 100))]} "
                f"{BODY_VOCAB[int(rng.integers(1000, _BODY_VOCAB_SIZE))]}"
            )
        out.append((qid, q, 10))
    return out
