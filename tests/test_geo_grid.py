"""geohash_grid (query/geo_grid.py): the encode arithmetic against the
published geohash test vectors (evaluated through BOTH engines'
expression evaluators), and the agg itself against a DuckDB replay
over the same synthetic geo corpus the driver entries use."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from search_ingest_spark.catalog import Catalog
from search_ingest_spark.index import build as ib
from search_ingest_spark.query import geo_grid
from search_ingest_spark.query.wand import Searcher

SF = "/root/testdata/sf0.001"
Q = "spark query data"

# (lat, lon, precision, published geohash)
VECTORS = [
    (57.64911, 10.40744, 5, "u4pru"),
    (57.64911, 10.40744, 11, "u4pruydqqvj"),
    (48.669, -4.329, 5, "gbsuv"),
    (-33.86, 151.21, 6, "r3gx2g"),
    (90.0, 180.0, 4, "zzzz"),
    (-90.0, -180.0, 4, "0000"),
    (0.0, 0.0, 1, "s"),
]


class TestEncode:
    @pytest.mark.parametrize("lat,lon,p,want", VECTORS)
    def test_duckdb_matches_published(self, lat, lon, p, want):
        expr = geo_grid.geohash_expr(p, lat_col=repr(lat),
                                     lon_col=repr(lon))
        got = duckdb.sql(f"SELECT {expr} AS g").fetchall()[0][0]
        assert got == want

    @pytest.mark.parametrize("lat,lon,p,want", VECTORS)
    def test_spark_matches_published(self, spark, lat, lon, p, want):
        expr = geo_grid.geohash_expr(p, lat_col=repr(lat),
                                     lon_col=repr(lon))
        got = spark.sql(f"SELECT {expr} AS g").collect()[0]["g"]
        assert got == want

    def test_bad_precision(self):
        with pytest.raises(ValueError):
            geo_grid.geohash_expr(0)
        with pytest.raises(ValueError):
            geo_grid.geohash_expr(13)


LAT_SQL = "((doc_id * 7919) % 18000) / 100.0 - 90.0"
LON_SQL = "((doc_id * 104729) % 36000) / 100.0 - 180.0"


@pytest.fixture(scope="module")
def geo_searcher(spark, documents_smoke, tmp_path_factory):
    cat = Catalog(spark, str(tmp_path_factory.mktemp("geogrid")))
    docs = (documents_smoke
            .withColumn("lat", ((F.col("doc_id") * 7919) % 18000)
                        / F.lit(100.0) - F.lit(90.0))
            .withColumn("lon", ((F.col("doc_id") * 104729) % 36000)
                        / F.lit(100.0) - F.lit(180.0)))
    ib.build_index(spark, docs, cat, mode="simple", docs_per_shard=50,
                   attr_cols=["lat", "lon"])
    return Searcher(spark, cat)


class TestAgg:
    @pytest.mark.parametrize("p", [1, 3, 5])
    def test_matches_oracle(self, spark, geo_searcher, p):
        df = geo_grid.geohash_grid_agg(geo_searcher, Q, p)
        got = sorted(tuple(r) for r in df.collect())
        con = duckdb.connect()
        con.execute("CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{SF}/documents.parquet')")
        want = sorted(tuple(r) for r in con.execute(
            geo_grid.geohash_grid_oracle_sql(
                Q, p, lat_sql=LAT_SQL, lon_sql=LON_SQL)).fetchall())
        assert got == want and len(got) >= 1

    def test_counts_sum_to_hits(self, geo_searcher):
        n_hits = geo_searcher.matching_doc_ids(Q).count()
        rows = geo_grid.geohash_grid_agg(geo_searcher, Q, 2).collect()
        assert sum(r["n_docs"] for r in rows) == n_hits

    def test_cells_refine(self, geo_searcher):
        # precision p+1 cells nest inside p cells (prefix property)
        fine = geo_grid.geohash_grid_agg(geo_searcher, Q, 3).collect()
        coarse = {r["geohash"] for r in
                  geo_grid.geohash_grid_agg(geo_searcher, Q, 2).collect()}
        assert all(r["geohash"][:2] in coarse for r in fine)
