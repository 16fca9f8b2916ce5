"""The shared filter spec (query/filters.py) is load-bearing for THREE
engines: the same dict must select the same rows through Catalyst
(spark_cond), pyarrow (arrow_cond), and DuckDB (sql_cond — oracle
duty).  Randomized cross-engine agreement is the guard: a semantic
drift in any one compiler (null handling, boundary ops, IN lists)
breaks the bitwise query parity everything above relies on."""

from __future__ import annotations

import random

import duckdb
import pyarrow as pa
import pytest

from search_ingest_spark.query import filters

ROWS = 120


def _data(seed: int):
    rng = random.Random(seed)
    return {
        "doc_id": list(range(ROWS)),
        "n": [rng.randint(0, 20) for _ in range(ROWS)],
        "x": [round(rng.uniform(-5.0, 5.0), 3) for _ in range(ROWS)],
        "lang": [rng.choice(["en", "es", "fr", "de"]) for _ in range(ROWS)],
        "tag": [rng.choice(["a", "b", None]) for _ in range(ROWS)],
    }


def _random_spec(rng: random.Random) -> dict:
    spec: dict = {}
    for col, kind in [("n", "int"), ("x", "float"),
                      ("lang", "str"), ("tag", "nullable")]:
        if rng.random() < 0.45:
            continue
        r = rng.random()
        if kind == "nullable" and r < 0.5:
            spec[col] = {"exists": rng.random() < 0.5}
        elif r < 0.33:
            spec[col] = (rng.randint(0, 20) if kind == "int"
                         else round(rng.uniform(-5, 5), 2) if kind == "float"
                         else rng.choice(["en", "es", "fr", "a", "b"]))
        elif r < 0.66 and kind in ("str", "nullable"):
            spec[col] = rng.sample(["en", "es", "fr", "de", "a", "b"], 2)
        else:
            ops = {}
            if rng.random() < 0.8:
                ops[rng.choice(["gte", "gt"])] = (
                    rng.randint(0, 15) if kind == "int"
                    else round(rng.uniform(-4, 2), 2) if kind == "float"
                    else rng.choice(["b", "d", "es"]))
            if rng.random() < 0.8 or not ops:
                ops[rng.choice(["lte", "lt"])] = (
                    rng.randint(5, 20) if kind == "int"
                    else round(rng.uniform(-1, 5), 2) if kind == "float"
                    else rng.choice(["f", "t", "z"]))
            spec[col] = ops
    return spec


@pytest.mark.parametrize("seed", [7, 23, 41])
def test_three_compilers_agree_on_random_specs(spark, seed):
    data = _data(seed)
    tbl = pa.table(data)
    sdf = spark.createDataFrame(tbl.to_pandas())
    con = duckdb.connect()
    con.register("t", tbl)
    rng = random.Random(seed * 31)
    tried = 0
    for _ in range(40):
        spec = _random_spec(rng)
        if not spec:
            continue
        tried += 1
        want = sorted(
            r[0] for r in con.execute(
                f"SELECT doc_id FROM t WHERE {filters.sql_cond(spec)}"
            ).fetchall()
        )
        got_spark = sorted(
            r[0] for r in
            sdf.where(filters.spark_cond(spec)).select("doc_id").collect()
        )
        got_arrow = sorted(
            tbl.filter(filters.arrow_cond(spec))["doc_id"].to_pylist()
        )
        assert got_spark == want, (seed, spec)
        assert got_arrow == want, (seed, spec)
    assert tried >= 20


def test_exists_spec_validation():
    with pytest.raises(ValueError):
        filters.spark_cond({"tag": {"exists": "yes"}})
    with pytest.raises(ValueError):
        filters.arrow_cond({"tag": {"exists": True, "gte": 1}})


def test_range_spec_validation():
    with pytest.raises(ValueError):
        filters.spark_cond({"n": {"between": (1, 2)}})
    with pytest.raises(ValueError):
        filters.sql_cond({"n": {}})
