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


def _nested_data(seed: int):
    """Rows with a list-of-struct `props` column engineered so many
    rows have k='k2' in one element and an in-range v in ANOTHER —
    the case nested semantics must distinguish from flattened."""
    rng = random.Random(seed)
    props = []
    for _ in range(ROWS):
        props.append([
            {"k": f"k{rng.randint(0, 4)}", "v": rng.randint(0, 99)}
            for _ in range(rng.randint(0, 4))
        ])
    return {"doc_id": list(range(ROWS)), "props": props}


class TestNestedClause:
    """ES `nested` query: ≥1 array element satisfies ALL inner clauses
    — three compilers (F.exists / post-scan arrow mask / DuckDB
    list_filter) must agree row-for-row."""

    @pytest.mark.parametrize("seed", [11, 29])
    def test_three_compilers_agree(self, spark, seed):
        data = _nested_data(seed)
        tbl = pa.table(data)
        sdf = spark.createDataFrame(
            [(d, p) for d, p in zip(data["doc_id"], data["props"])],
            "doc_id long, props array<struct<k string, v long>>")
        con = duckdb.connect()
        con.register("t", tbl)
        rng = random.Random(seed * 17)
        for _ in range(12):
            where: dict = {}
            if rng.random() < 0.7:
                where["k"] = (f"k{rng.randint(0, 4)}" if rng.random() < 0.6
                              else [f"k{rng.randint(0, 2)}", "k4"])
            lo, hi = sorted(rng.sample(range(0, 99), 2))
            where["v"] = {"gte": lo, "lt": hi}
            spec = {"nested": {"path": "props", "where": where}}
            want = sorted(r[0] for r in con.execute(
                f"SELECT doc_id FROM t WHERE {filters.sql_cond(spec)}"
            ).fetchall())
            got_spark = sorted(
                r[0] for r in
                sdf.where(filters.spark_cond(spec)).select("doc_id").collect())
            flat, nested = filters.split_nested(spec)
            assert flat == {} and len(nested) == 1
            mask = filters.arrow_nested_mask(tbl, *nested[0])
            got_arrow = sorted(tbl.filter(mask)["doc_id"].to_pylist())
            assert got_spark == want, (seed, spec)
            assert got_arrow == want, (seed, spec)

    def test_nested_is_not_flattened(self, spark):
        # one element matches k, a DIFFERENT one matches v: flattened
        # semantics would accept, nested must reject row 0
        tbl = pa.table({
            "doc_id": [0, 1],
            "props": [
                [{"k": "k2", "v": 99}, {"k": "k0", "v": 30}],
                [{"k": "k2", "v": 30}],
            ],
        })
        spec = {"nested": {"path": "props",
                           "where": {"k": "k2", "v": {"gte": 20, "lt": 70}}}}
        _, nested = filters.split_nested(spec)
        assert filters.arrow_nested_mask(tbl, *nested[0]).tolist() == [
            False, True]
        sdf = spark.createDataFrame(
            tbl.to_pylist(), "doc_id long, props array<struct<k string, v long>>")
        assert [r["doc_id"] for r in
                sdf.where(filters.spark_cond(spec)).collect()] == [1]
        con = duckdb.connect()
        con.register("t", tbl)
        assert con.execute(
            f"SELECT doc_id FROM t WHERE {filters.sql_cond(spec)}"
        ).fetchall() == [(1,)]

    def test_combined_flat_and_nested(self, spark):
        tbl = pa.table({
            "doc_id": [0, 1, 2],
            "lang": ["en", "es", "en"],
            "props": [[{"k": "k1", "v": 5}], [{"k": "k1", "v": 5}], []],
        })
        spec = {"lang": "en",
                "nested": {"path": "props", "where": {"k": "k1"}}}
        flat, nested = filters.split_nested(spec)
        assert flat == {"lang": "en"} and len(nested) == 1
        scanned = tbl.filter(filters.arrow_cond(flat))
        mask = filters.arrow_nested_mask(scanned, *nested[0])
        assert scanned.filter(mask)["doc_id"].to_pylist() == [0]
        sdf = spark.createDataFrame(
            tbl.to_pylist(),
            "doc_id long, lang string, props array<struct<k string, v long>>")
        assert [r["doc_id"] for r in
                sdf.where(filters.spark_cond(spec)).collect()] == [0]

    def test_nested_validation(self):
        for bad in (
            {"nested": {"path": "p"}},                      # no where
            {"nested": {"path": "p", "where": {}}},         # empty where
            {"nested": {"where": {"k": "a"}}},              # no path
            {"nested": {"path": "p", "where": {"k": "a"}, "x": 1}},
            {"nested": {"path": "p",
                        "where": {"nested": {"path": "q",
                                             "where": {"k": "a"}}}}},
        ):
            with pytest.raises(ValueError):
                filters.spark_cond(bad)
        with pytest.raises(ValueError, match="not scan-pushable"):
            filters.arrow_cond(
                {"nested": {"path": "p", "where": {"k": "a"}}})
