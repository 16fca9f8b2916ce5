"""Text-analysis operators for a large-scale training-data pipeline:
language-ID heuristic, quality scoring, token counting, document
fingerprinting.  All pure JVM-side Catalyst expressions (whole-stage
codegen; no Python in the row path) and each with an exactly-equivalent
DuckDB SQL form for the driver's oracle check.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny high-frequency stopword lists per language — the n-gram-free
# heuristic: langid by stopword-hit ratio (deterministic, SQL-expressible).
_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "this"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "mit", "ein", "von", "zu"],
    "fr": ["le", "la", "et", "les", "des", "est", "une", "dans", "que", "pour"],
    "es": ["el", "la", "que", "de", "los", "es", "una", "por", "con", "para"],
}

TOKEN_PATTERN = "[a-z0-9]+"


def tokens_col(text_col: str = "text") -> Column:
    return F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_PATTERN), 0)


def token_count(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Whitespace-free token counting (BPE-ish regex tokens + distinct)."""
    toks = tokens_col(text_col)
    return df.select(
        F.col(id_col),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_unique_tokens"),
        F.length(F.col(text_col)).alias("n_chars_measured"),
    )


def quality_score(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Heuristic quality features: mean word length, stopword ratio,
    alpha ratio, and a composite score — rounded for oracle hashing."""
    toks = tokens_col(text_col)
    n = F.size(toks)
    en_hits = F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in _STOPWORDS["en"]])))
    alpha = F.length(F.regexp_replace(F.col(text_col), "[^A-Za-z]", ""))
    mean_wlen = F.when(n > 0, F.round(
        F.aggregate(F.transform(toks, lambda t: F.length(t).cast("double")),
                    F.lit(0.0), lambda a, x: a + x) / n, 4)).otherwise(F.lit(0.0))
    alpha_ratio = F.round(alpha.cast("double") / F.greatest(F.length(text_col), F.lit(1)), 4)
    return df.select(
        F.col(id_col),
        n.alias("n_tokens"),
        mean_wlen.alias("mean_word_len"),
        alpha_ratio.alias("alpha_ratio"),
        en_hits.alias("en_stopword_kinds"),
    )


def lang_id(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Stopword-ratio language heuristic over the token stream; emits the
    arg-max language with deterministic tie-break on language code."""
    toks = tokens_col(text_col)
    cols = [F.col(id_col)]
    for lang, words in sorted(_STOPWORDS.items()):
        hits = F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words])))
        cols.append(hits.alias(f"hits_{lang}"))
    scored = df.select(*cols)
    # argmax via greatest + chained when (deterministic tie-break: code order)
    langs = sorted(_STOPWORDS)
    best = F.greatest(*[F.col(f"hits_{lang}") for lang in langs])
    pick = F.lit("unknown")
    for lang in reversed(langs):
        pick = F.when((F.col(f"hits_{lang}") == best) & (best > 0), F.lit(lang)).otherwise(pick)
    return scored.select(id_col, *[f"hits_{lang}" for lang in langs],
                         pick.alias("lang_pred"))


def fingerprint(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Document fingerprint: xxhash64 of the normalized token stream
    (rolling-hash analog, exact-dup detection key)."""
    norm = F.array_join(tokens_col(text_col), " ")
    return df.select(
        F.col(id_col),
        F.xxhash64(norm).alias("fp64"),
        F.md5(norm).alias("fp_md5"),
    )


# -- oracle SQL builders ------------------------------------------------------


def repetition_ratio(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Gopher-style repetition signal (the duplicate-n-gram-fraction
    family of web-corpus curation filters): the fraction of a doc's
    n-gram OCCURRENCES that repeat an earlier occurrence —
    1 − distinct/total over the n-gram stream.  High values flag
    boilerplate, keyword stuffing, and template spam.  Pure Catalyst;
    tokens materialized in their own projection before the gram lambda
    (no CSE inside HOF lambdas — see ops/dedup.shingles_from_tokens)."""
    toks = F.col("__toks")
    idx = F.sequence(F.lit(0), F.size(toks) - n)
    grams = F.transform(idx, lambda i: F.array_join(F.slice(toks, i + 1, n), " "))
    ng = F.greatest(F.size(toks) - (n - 1), F.lit(0)).cast("long")
    return (
        df.select(F.col(id_col), tokens_col(text_col).alias("__toks"))
        .select(
            F.col(id_col),
            ng.alias("__ng"),
            F.when(F.size(toks) >= n, F.size(F.array_distinct(grams)))
            .otherwise(F.lit(0)).cast("long").alias("__nu"),
        )
        .select(
            F.col(id_col).alias("doc_id"),
            F.col("__ng").alias("n_grams"),
            F.col("__nu").alias("n_unique_grams"),
            F.when(
                F.col("__ng") > 0,
                F.round(
                    F.lit(1.0)
                    - F.col("__nu").cast("double") / F.col("__ng").cast("double"),
                    4,
                ),
            ).otherwise(F.lit(0.0)).alias("repetition_ratio"),
        )
    )


def repetition_ratio_sql(table: str = "documents", id_col: str = "doc_id",
                         text_col: str = "text", n: int = 3) -> str:
    """DuckDB replay of repetition_ratio (n-gram stream via
    generate_series + list_slice; same double arithmetic + 4dp round)."""
    return f"""
WITH toks AS (
  SELECT {id_col} AS doc_id,
         regexp_extract_all(lower({text_col}), '{TOKEN_PATTERN}') AS t
  FROM {table}
),
pos AS (
  SELECT doc_id, t,
         unnest(generate_series(1, greatest(len(t) - {n - 1}, 0))) AS i
  FROM toks
),
grams AS (
  SELECT doc_id, array_to_string(list_slice(t, i, i + {n - 1}), ' ') AS g
  FROM pos
),
agg AS (
  SELECT doc_id, count(*)::BIGINT AS n_grams,
         count(DISTINCT g)::BIGINT AS n_unique_grams
  FROM grams GROUP BY 1
)
SELECT toks.doc_id,
       coalesce(agg.n_grams, 0)::BIGINT AS n_grams,
       coalesce(agg.n_unique_grams, 0)::BIGINT AS n_unique_grams,
       CASE WHEN coalesce(agg.n_grams, 0) > 0
            THEN round(1.0 - agg.n_unique_grams::DOUBLE / agg.n_grams::DOUBLE, 4)
            ELSE 0.0 END AS repetition_ratio
FROM toks LEFT JOIN agg USING (doc_id)
""".strip()


def token_count_sql(table: str = "documents", id_col: str = "doc_id",
                    text_col: str = "text") -> str:
    return f"""
SELECT {id_col} AS doc_id,
       len(regexp_extract_all(lower({text_col}), '{TOKEN_PATTERN}'))::INT AS n_tokens,
       len(list_distinct(regexp_extract_all(lower({text_col}), '{TOKEN_PATTERN}')))::INT
           AS n_unique_tokens,
       length({text_col})::INT AS n_chars_measured
FROM {table}
""".strip()


def quality_score_sql(table: str = "documents", id_col: str = "doc_id",
                      text_col: str = "text") -> str:
    en = ", ".join(f"'{w}'" for w in _STOPWORDS["en"])
    return f"""
WITH t AS (
  SELECT {id_col} AS doc_id, {text_col} AS text,
         regexp_extract_all(lower({text_col}), '{TOKEN_PATTERN}') AS toks
  FROM {table}
)
SELECT doc_id,
       len(toks)::INT AS n_tokens,
       CASE WHEN len(toks) > 0 THEN
         round(list_sum(list_transform(toks, x -> length(x)::DOUBLE)) / len(toks), 4)
       ELSE 0.0 END::DOUBLE AS mean_word_len,
       round(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE
             / greatest(length(text), 1), 4)::DOUBLE AS alpha_ratio,
       len(list_intersect(toks, [{en}]))::INT AS en_stopword_kinds
FROM t
""".strip()


def lang_id_sql(table: str = "documents", id_col: str = "doc_id",
                text_col: str = "text") -> str:
    langs = sorted(_STOPWORDS)
    hit_exprs = ",\n       ".join(
        f"len(list_intersect(toks, [{', '.join(repr(w) for w in _STOPWORDS[lang])}]))::INT"
        f" AS hits_{lang}"
        for lang in langs
    )
    best = "greatest(" + ", ".join(f"hits_{lang}" for lang in langs) + ")"
    pick = "'unknown'"
    for lang in reversed(langs):
        pick = f"CASE WHEN hits_{lang} = {best} AND {best} > 0 THEN '{lang}' ELSE {pick} END"
    return f"""
WITH t AS (
  SELECT {id_col} AS doc_id,
         regexp_extract_all(lower({text_col}), '{TOKEN_PATTERN}') AS toks
  FROM {table}
),
h AS (
  SELECT doc_id,
       {hit_exprs}
  FROM t
)
SELECT doc_id, {', '.join(f'hits_{lang}' for lang in langs)},
       {pick} AS lang_pred
FROM h
""".strip()


def fingerprint_sql(table: str = "documents", id_col: str = "doc_id",
                    text_col: str = "text") -> str:
    # xxhash64 differs between engines → oracle checks md5 only; the Spark
    # query keeps fp64 out of the driver-facing variant for hash parity.
    return f"""
SELECT {id_col} AS doc_id,
       md5(array_to_string(regexp_extract_all(lower({text_col}), '{TOKEN_PATTERN}'), ' '))
           AS fp_md5
FROM {table}
""".strip()


def bigram_logprob(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
) -> DataFrame:
    """Self-estimated bigram language-model score per document:
    avg over a doc's bigrams of ln(c(w1,w2) / c(w1·)) with counts from
    the WHOLE corpus (MLE; every doc bigram is in the corpus, so the
    probability is always defined) — the classic gibberish/boilerplate
    filter signal a training-data pipeline thresholds on (low = token
    sequences the corpus never supports).

    Exactness contract for the oracle: the per-doc sum folds in
    POSITION order (array_sort over (pos, lp) then a left fold — Spark's
    default float agg order is nondeterministic), so DuckDB's
    list_reduce over list(lp ORDER BY pos) is bitwise identical before
    the 4dp rounding.
    """
    toks = tokens_col(text_col)
    t = df.select(F.col(id_col).alias("doc_id"), toks.alias("t")).where(
        F.size("t") >= 2
    )
    bi = t.select(
        "doc_id",
        F.posexplode(F.expr(
            "transform(slice(t, 1, size(t) - 1),"
            " (x, i) -> struct(x AS w1, t[i + 1] AS w2))"
        )).alias("pos", "bg"),
    ).select("doc_id", "pos", F.col("bg.w1").alias("w1"),
             F.col("bg.w2").alias("w2")).persist()
    # ^ materialized once: the exploded bigram stream feeds BOTH count
    # aggregates and the scoring join — unpersisted, Catalyst re-ran
    # the tokenize+explode pipeline three times (r07 plan audit; same
    # multi-consumer fix as ops/dedup.py).  MEMORY_AND_DISK, freed on GC.
    c2 = bi.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    c1 = bi.groupBy("w1").agg(F.count("*").alias("c1"))
    lp = (
        bi.join(c2, ["w1", "w2"]).join(c1, "w1")
        .withColumn("lp", F.log(F.col("c2").cast("double") / F.col("c1")))
    )
    return (
        lp.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("pos", "lp"))),
                F.lit(0.0), lambda a, x: a + x["lp"],
            ).alias("_s"),
        )
        .select(
            "doc_id", "n_bigrams",
            F.round(F.col("_s") / F.col("n_bigrams"), 4).alias("avg_logprob"),
        )
    )


def bigram_logprob_sql(table: str = "documents", id_col: str = "doc_id",
                       text_col: str = "text") -> str:
    return f"""
WITH toks AS (
  SELECT {id_col} AS doc_id,
         regexp_extract_all(lower({text_col}), '{TOKEN_PATTERN}') AS t
  FROM {table}
),
bi AS (
  SELECT doc_id, i::INT AS pos, t[i + 1] AS w1, t[i + 2] AS w2
  FROM (SELECT doc_id, t, unnest(range(0, len(t) - 1)) AS i
        FROM toks WHERE len(t) >= 2)
),
c2 AS (SELECT w1, w2, count(*) AS c2 FROM bi GROUP BY 1, 2),
c1 AS (SELECT w1, count(*) AS c1 FROM bi GROUP BY 1),
lp AS (
  SELECT doc_id, pos, ln(c2.c2::DOUBLE / c1.c1) AS lp
  FROM bi JOIN c2 USING (w1, w2) JOIN c1 USING (w1)
),
agg AS (
  SELECT doc_id, count(*)::BIGINT AS n_bigrams,
         list_reduce(list(lp ORDER BY pos), (a, b) -> a + b) AS s
  FROM lp GROUP BY doc_id
)
SELECT doc_id, n_bigrams, round(s / n_bigrams, 4)::DOUBLE AS avg_logprob
FROM agg
""".strip()
