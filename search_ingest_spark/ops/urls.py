"""URL canonicalization + canonical-URL deduplication.

Web-crawl corpora carry the same page under many spellings — scheme /
host case, explicit default ports, trailing slashes, tracking params
(`utm_*`, `gclid`, `fbclid`), fragments — and canonical-URL dedup is
the cheapest, highest-precision dedup pass a training pipeline runs
(before any content hashing): it needs no text at all.

Canonicalization rules (the conservative, loss-free subset every
crawler normalizes):
  1. drop the fragment (`#…` never reaches the server);
  2. lowercase the scheme and host (DNS is case-insensitive — paths
     are NOT touched);
  3. strip an explicit default port (`:80`, `:443`);
  4. drop tracking query params, keep the rest in their original
     order (reordering params can change semantics, so we don't);
  5. collapse a trailing `/` run on the path (empty path → `/`).

Everything is pure Catalyst (regexp + array HOFs, whole-stage
codegen): at 100 TB this is a map-only pass — the dedup groupBy is the
only shuffle and it carries (canonical_url, id), never the text.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TRACKING_RE = "^(utm_[a-z]+|gclid|fbclid)="

_SCHEME_RE = "^([A-Za-z][A-Za-z0-9+.-]*)://"
_HOST_RE = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)"
_REST_RE = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^#]*)"


def canonical_url(col: Column) -> Column:
    """Canonical form of a URL column (see module doc for the rules).
    Rows that don't look like `scheme://host…` canonicalize to
    themselves minus the fragment (conservative passthrough)."""
    u = col
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    hostport = F.lower(F.regexp_extract(u, _HOST_RE, 1))
    host = F.regexp_replace(hostport, ":(80|443)$", "")
    rest = F.regexp_extract(u, _REST_RE, 1)  # path[?query], no fragment
    path = F.regexp_extract(rest, r"^([^?]*)", 1)
    query = F.regexp_extract(rest, r"^[^?]*\?(.*)$", 1)
    path = F.regexp_replace(path, "/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    kept = F.filter(
        F.split(query, "&"),
        lambda p: ~p.rlike(TRACKING_RE) & (p != ""),
    )
    q2 = F.array_join(kept, "&")
    canon = F.concat(
        scheme, F.lit("://"), host, path,
        F.when(q2 == "", F.lit("")).otherwise(F.concat(F.lit("?"), q2)),
    )
    return F.when(scheme == "", F.regexp_replace(u, "#.*$", "")) \
            .otherwise(canon)


def url_duplicates(
    df: DataFrame, *, url_col: str = "url", id_col: str = "doc_id",
) -> DataFrame:
    """Canonical-URL dedup groups: (canonical_url, keep_doc_id,
    group_size) for every canonical form shared by ≥2 rows — keep =
    min id, the same survivor rule as content exact-dup."""
    return (
        df.select(F.col(id_col).alias("doc_id"),
                  canonical_url(F.col(url_col)).alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(F.min("doc_id").alias("keep_doc_id"),
             F.count("*").alias("group_size"))
        .where(F.col("group_size") >= 2)
    )


def url_duplicates_oracle_sql(url_expr_sql: str, *,
                              from_sql: str = "documents") -> str:
    """DuckDB replay: the same regex chain over `url_expr_sql` (a SQL
    expression producing the url string per row of `from_sql`)."""
    return f"""
WITH src AS (SELECT doc_id, ({url_expr_sql}) AS url FROM {from_sql}),
parts AS (
  -- DuckDB regexp_extract returns NULL on no-match where Spark
  -- returns '': every extract is coalesced so the two engines'
  -- empty-string algebra stays identical
  SELECT doc_id, url,
         coalesce(lower(regexp_extract(url, '{_SCHEME_RE}', 1)), '')
           AS scheme,
         regexp_replace(
           coalesce(lower(regexp_extract(url, '{_HOST_RE}', 1)), ''),
           ':(80|443)$', '') AS host,
         coalesce(regexp_extract(url, '{_REST_RE}', 1), '') AS rest
  FROM src
),
pieces AS (
  SELECT doc_id, url, scheme, host,
         CASE WHEN regexp_replace(
                coalesce(regexp_extract(rest, '^([^?]*)', 1), ''),
                '/+$', '') = ''
              THEN '/'
              ELSE regexp_replace(
                coalesce(regexp_extract(rest, '^([^?]*)', 1), ''),
                '/+$', '') END
           AS path,
         coalesce(array_to_string(
           list_filter(
             string_split(
               coalesce(regexp_extract(rest, '^[^?]*\\?(.*)$', 1), ''),
               '&'),
             p -> NOT regexp_matches(p, '{TRACKING_RE}') AND p <> ''),
           '&'), '') AS q2
  FROM parts
),
canon AS (
  SELECT doc_id,
         CASE WHEN scheme = ''
              THEN regexp_replace(url, '#.*$', '')
              ELSE scheme || '://' || host || path ||
                   (CASE WHEN q2 = '' THEN '' ELSE '?' || q2 END) END
           AS canonical_url
  FROM pieces
)
SELECT canonical_url, min(doc_id)::BIGINT AS keep_doc_id,
       count(*)::BIGINT AS group_size
FROM canon GROUP BY 1 HAVING count(*) >= 2
""".strip()
