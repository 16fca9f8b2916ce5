"""Schema-mapping tests mirroring the reference spec
(/root/reference/spec/schemas_spec.cr, spec_models.cr — fixtures
re-declared per FIXTURES.md Group A)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from search_ingest_spark.schema import (
    FieldSpec,
    ParentRelation,
    SchemaError,
    TableSchema,
    children_of,
    equivalent_schema,
    union_index_struct,
)


def _fixture_schemas() -> dict[str, TableSchema]:
    ray_gun = TableSchema(
        "ray_gun",
        [
            FieldSpec("id", T.StringType(), nullable=False),
            FieldSpec("laser_colour", T.StringType(), analyzed=True),
            FieldSpec("barrel_length", T.FloatType()),
            FieldSpec("rounds", T.IntegerType()),
            FieldSpec("ip", T.StringType(), es_type="ip"),
            FieldSpec("last_shot", T.TimestampType()),
        ],
    )
    programmer = TableSchema(
        "programmer",
        [
            FieldSpec("id", T.StringType(), nullable=False),
            FieldSpec("name", T.StringType(), es_type="text"),
            FieldSpec("secret", T.StringType(), es_ignore=True),
        ],
    )
    beverage_coffee = TableSchema(
        "beverage_coffee",
        [
            FieldSpec("id", T.StringType(), nullable=False),
            FieldSpec("temperature", T.IntegerType()),
            FieldSpec("created_at", T.TimestampType()),
            FieldSpec("programmer_id", T.StringType()),
        ],
        parents=[ParentRelation("programmer", "programmer", "programmer_id")],
    )
    ouch = TableSchema(
        "ouch",
        [
            FieldSpec("id", T.StringType(), nullable=False),
            FieldSpec("duration", T.TimestampType()),
            FieldSpec("programmer_id", T.StringType()),
        ],
        parents=[ParentRelation("programmer", "programmer", "programmer_id")],
    )
    broke = TableSchema(
        "broke",
        [
            FieldSpec("id", T.StringType(), nullable=False),
            FieldSpec("breaks", T.StringType(), es_subfield="keyword"),
            FieldSpec("status", T.BooleanType()),
        ],
    )
    return {
        s.name: s for s in [ray_gun, programmer, beverage_coffee, ouch, broke]
    }


def test_es_type_override_resolves():
    # spec_models.cr:21 — ip override keeps raw string
    s = _fixture_schemas()["ray_gun"]
    ip = next(f for f in s.fields if f.name == "ip")
    assert ip.resolved_type == T.StringType()


def test_invalid_es_type_raises():
    # schemas.cr:136-144 — invalid tag must raise
    with pytest.raises(SchemaError):
        FieldSpec("x", T.StringType(), es_type="not_a_type")


def test_es_ignore_dropped_from_struct():
    s = _fixture_schemas()["programmer"]
    names = [f.name for f in s.struct_type().fields]
    assert "secret" not in names


def test_document_type_field_added():
    # schemas.cr:208 — every schema gains _document_type keyword
    for s in _fixture_schemas().values():
        assert "_document_type" in [f.name for f in s.struct_type().fields]


def test_children_discovery():
    # spec/schemas_spec.cr:24-33
    schemas = _fixture_schemas()
    assert children_of("programmer", schemas) == ["beverage_coffee", "ouch"]
    assert children_of("ray_gun", schemas) == []


def test_parents_triple():
    # spec/schemas_spec.cr:13-22 — (name, index, routing_attr)
    schemas = _fixture_schemas()
    [p] = schemas["ouch"].parents
    assert (p.name, p.index, p.routing_attr) == (
        "programmer", "programmer", "programmer_id",
    )


def test_parent_index_schema_is_union():
    # spec/schemas_spec.cr:75-88 — parent fields = own + children, deduped
    schemas = _fixture_schemas()
    union = union_index_struct(schemas["programmer"], schemas)
    names = {f.name for f in union.fields}
    assert {"id", "name", "temperature", "created_at", "programmer_id",
            "duration", "_document_type"} <= names
    assert "secret" not in names
    # dedup: id appears once
    assert sum(1 for f in union.fields if f.name == "id") == 1


def test_equivalent_schema_order_insensitive():
    # schemas.cr:88-118
    a = T.StructType([
        T.StructField("x", T.LongType()), T.StructField("y", T.StringType()),
    ])
    b = T.StructType([
        T.StructField("y", T.StringType()), T.StructField("x", T.LongType()),
    ])
    c = T.StructType([
        T.StructField("x", T.IntegerType()), T.StructField("y", T.StringType()),
    ])
    assert equivalent_schema(a, b)
    assert not equivalent_schema(a, c)


def test_apply_mapping_projection(spark):
    schemas = _fixture_schemas()
    df = spark.createDataFrame(
        [("1", "alice", "hunter2")], ["id", "name", "secret"]
    )
    out = schemas["programmer"].apply_mapping(df)
    assert set(out.columns) == {"id", "name", "_document_type"}
    row = out.first()
    assert row["_document_type"] == "programmer"


def test_subfield_materializes_both(spark):
    schemas = _fixture_schemas()
    df = spark.createDataFrame([("1", "Breaks Stuff", True)],
                               ["id", "breaks", "status"])
    out = schemas["broke"].apply_mapping(df)
    assert "breaks" in out.columns and "breaks__keyword" in out.columns


class TestTypedSpecials:
    """ip / geo_point / completion no longer degrade to plain strings
    (schemas.cr:211-227 type table)."""

    def test_geo_point_parses_latlon_string(self, spark):
        from search_ingest_spark.schema import FieldSpec, TableSchema
        import pyspark.sql.types as T

        ts = TableSchema("loc", [
            FieldSpec("id", T.StringType(), nullable=False),
            FieldSpec("pos", T.StringType(), es_type="geo_point"),
        ])
        df = spark.createDataFrame(
            [("a", "51.5, -0.12"), ("b", "bogus"), ("c", None)],
            "id string, pos string",
        )
        rows = {r["id"]: r["pos"] for r in ts.apply_mapping(df).collect()}
        assert rows["a"]["lat"] == 51.5 and rows["a"]["lon"] == -0.12
        assert rows["b"] is None and rows["c"] is None

    def test_completion_wraps_scalar_into_input_array(self, spark):
        from search_ingest_spark.schema import FieldSpec, TableSchema
        import pyspark.sql.types as T

        ts = TableSchema("sugg", [
            FieldSpec("id", T.StringType(), nullable=False),
            FieldSpec("name", T.StringType(), es_type="completion"),
        ])
        df = spark.createDataFrame([("a", "hello"), ("b", None)],
                                   "id string, name string")
        rows = {r["id"]: r["name"] for r in ts.apply_mapping(df).collect()}
        assert rows["a"] == ["hello"] and rows["b"] is None

    def test_ip_canonicalized_and_validated(self, spark):
        from search_ingest_spark.schema import FieldSpec, TableSchema
        import pyspark.sql.types as T

        ts = TableSchema("net", [
            FieldSpec("id", T.StringType(), nullable=False),
            FieldSpec("addr", T.StringType(), es_type="ip"),
        ])
        df = spark.createDataFrame(
            [("a", "192.168.0.1"), ("b", "2001:DB8::1"), ("c", "999.1.1.1"),
             ("d", "not-an-ip")],
            "id string, addr string",
        )
        rows = {r["id"]: r["addr"] for r in ts.apply_mapping(df).collect()}
        assert rows["a"] == "192.168.0.1"
        assert rows["b"] == "2001:db8::1"
        assert rows["c"] is None and rows["d"] is None

    def test_ip_colonless_hex_rejected(self, spark):
        # ADVICE r02: '123', 'dead', '999' are hex-charset but not ipv6 —
        # the IPv6 branch must require at least one ':'
        from search_ingest_spark.schema import FieldSpec, TableSchema
        import pyspark.sql.types as T

        ts = TableSchema("net", [
            FieldSpec("id", T.StringType(), nullable=False),
            FieldSpec("addr", T.StringType(), es_type="ip"),
        ])
        df = spark.createDataFrame(
            [("a", "123"), ("b", "dead"), ("c", "999"), ("d", "::1"),
             ("e", "fe80::dead:beef")],
            "id string, addr string",
        )
        rows = {r["id"]: r["addr"] for r in ts.apply_mapping(df).collect()}
        assert rows["a"] is None and rows["b"] is None and rows["c"] is None
        assert rows["d"] == "::1"
        assert rows["e"] == "fe80::dead:beef"
