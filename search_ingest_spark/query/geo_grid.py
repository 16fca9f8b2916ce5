"""ES `geohash_grid` aggregation — base32 geohash cell counts.

Sibling of `aggs.geotile_grid_agg` (ES's other geo-bucketing agg; the
reference's consumers get both from the ES tier it configures,
`/root/reference/src/search-ingest/schemas.cr:211-222` maps the
geo_point type).  The geohash encode is PURE INTEGER/IEEE-DOUBLE
arithmetic laid out identically in Catalyst and the DuckDB oracle, so
the driver's value-hash check is exact:

  lat_q = min(⌊(lat+90)/180·2^nlat⌋, 2^nlat−1)   (nlat = ⌊5p/2⌋)
  lon_q = min(⌊(lon+180)/360·2^nlon⌋, 2^nlon−1)  (nlon = ⌈5p/2⌉)
  v     = interleave(lon MSB first, lat)          (5p bits)
  hash  = p base32 chars of v ("0-9b-z", the geohash alphabet)

Both engines evaluate the same `(x >> b) & 1 << s` integer terms and
the same double multiply-then-floor, so a doc can never land in
different cells across engines (verified against the published
geohash test vectors in tests/test_geo_grid.py).

One projection + one map-side-combinable groupBy over the hit set's
doc-values — bucket cardinality is |occupied cells| ≤ 32^p, never
corpus-sized; the same 100 TB shape as geotile_grid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

GEOHASH_B32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def _encode_exprs(p: int, lat_ref: str, lon_ref: str) -> tuple[str, str]:
    """(quantize+interleave SQL, chars SQL over `v`) — ONE textual
    arithmetic emitted for both engines (dialect-neutral: floor/least/
    CAST/substr/>>/& behave identically on BIGINT in Spark and DuckDB)."""
    if not 1 <= int(p) <= 12:
        raise ValueError(f"geohash precision must be in 1..12, got {p}")
    p = int(p)
    bits = 5 * p
    nlon = (bits + 1) // 2
    nlat = bits // 2
    latq = (f"least(CAST(floor(({lat_ref} + 90.0) / 180.0 * {1 << nlat}) "
            f"AS BIGINT), {(1 << nlat) - 1})")
    lonq = (f"least(CAST(floor(({lon_ref} + 180.0) / 360.0 * {1 << nlon}) "
            f"AS BIGINT), {(1 << nlon) - 1})")
    terms = []
    for i in range(bits):
        shift = bits - 1 - i
        if i % 2 == 0:
            src, nb = lonq, nlon - 1 - i // 2
        else:
            src, nb = latq, nlat - 1 - i // 2
        terms.append(f"(((({src}) >> {nb}) & 1) << {shift})")
    v = " + ".join(terms)
    chars = " || ".join(
        f"substr('{GEOHASH_B32}', "
        f"CAST(((({v}) >> {5 * (p - 1 - j)}) & 31) AS INT) + 1, 1)"
        for j in range(p))
    return v, chars


def geohash_expr(p: int, *, lat_col: str = "lat",
                 lon_col: str = "lon") -> str:
    """The geohash-of-(lat,lon) SQL expression at precision `p` —
    valid in both Spark SQL and DuckDB verbatim."""
    _, chars = _encode_exprs(p, lat_col, lon_col)
    return chars


def geohash_grid_agg(searcher, query_text: str, precision: int, *,
                     lat_col: str = "lat",
                     lon_col: str = "lon") -> DataFrame:
    """ES `geohash_grid`: hit counts per geohash cell at `precision`
    (1..12 chars).  Empty cells naturally absent, NULL coords dropped
    (ES's missing rule).  (geohash, n_docs)."""
    from search_ingest_spark.index import build as ib

    hits = searcher.matching_doc_ids(query_text)
    attrs = searcher.cat.read(ib.DOC_ATTRS_TABLE).select(
        "doc_id", lat_col, lon_col)
    cell = F.expr(geohash_expr(precision, lat_col=lat_col,
                               lon_col=lon_col))
    return (attrs.join(hits, "doc_id")
            .where(F.col(lat_col).isNotNull()
                   & F.col(lon_col).isNotNull())
            .groupBy(cell.alias("geohash"))
            .agg(F.count("*").alias("n_docs")))


def geohash_grid_oracle_sql(query_text: str, precision: int, *,
                            lat_sql: str, lon_sql: str) -> str:
    """DuckDB replay over raw documents: the driver corpus's lat/lon
    are doc_id formulas (`lat_sql`/`lon_sql`), so the oracle rebuilds
    the coords then applies the IDENTICAL encode arithmetic."""
    from search_ingest_spark.query.aggs import hits_cte

    chars = geohash_expr(precision, lat_col="g.lat", lon_col="g.lon")
    return f"""
WITH {hits_cte(query_text)},
g AS (
  SELECT doc_id, {lat_sql} AS lat, {lon_sql} AS lon
  FROM documents JOIN hits USING (doc_id)
)
SELECT {chars} AS geohash, count(*)::BIGINT AS n_docs
FROM g
WHERE g.lat IS NOT NULL AND g.lon IS NOT NULL
GROUP BY 1
""".strip()
