"""Schema mapping module — the reference's `schemas.cr` re-expressed.

The reference generates a FIXED, explicit ES mapping per table from ORM
attribute metadata (never inferred from data): type table at
`/root/reference/src/search-ingest/schemas.cr:229-259`, per-attribute
override tags at `schemas.cr:149-168` (`es_type`, `es_subfield`,
`es_ignore`), parent/child relation discovery at `schemas.cr:265-293`,
parent-index schema union at `schemas.cr:171-183`, equivalence diff at
`schemas.cr:88-118`, synthetic `_document_type` field at `schemas.cr:208`.

Here the same contract is declared over Spark types: a `TableSchema` is
built from `FieldSpec`s, yields a `StructType` (for `spark.read.schema`
— no inferSchema, mirroring `dynamic: false` at `schemas.cr:78-81`), and
`apply_mapping(df)` is the projection operator (SURVEY §2 A4-A7, A12):
drop ignored fields, cast overrides, materialize analyzed+raw subfields,
stamp `_document_type`.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Legal override types, mirroring the valid-ES-types set the reference
# validates tags against (`schemas.cr:211-227`).
VALID_OVERRIDE_TYPES = {
    "text", "keyword", "boolean", "byte", "short", "integer", "long",
    "float", "double", "date", "ip", "geo_point", "object", "completion",
}

GEO_POINT_TYPE = T.StructType([
    T.StructField("lat", T.DoubleType(), True),
    T.StructField("lon", T.DoubleType(), True),
])

_SPARK_TYPE_FOR_OVERRIDE: dict[str, T.DataType] = {
    "text": T.StringType(),
    "keyword": T.StringType(),
    "boolean": T.BooleanType(),
    "byte": T.ByteType(),
    "short": T.ShortType(),
    "integer": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "date": T.TimestampType(),
    # typed ES specials (schemas.cr:211-227): geo_point → (lat, lon)
    # struct (ES object form), completion → suggestion-input array,
    # ip → canonical string (validated at mapping time)
    "ip": T.StringType(),
    "geo_point": GEO_POINT_TYPE,
    "completion": T.ArrayType(T.StringType()),
    "object": T.StringType(),
}


class SchemaError(ValueError):
    """Invalid tag/override — reference raises on bad `es_type` tags
    (`schemas.cr:136-144`)."""


@dataclass(frozen=True)
class FieldSpec:
    """One attribute → index field mapping (reference `Field`,
    `schemas.cr:296-323`)."""

    name: str
    dtype: T.DataType
    nullable: bool = True
    es_type: str | None = None      # forced type (schemas.cr:158)
    es_subfield: str | None = None  # extra raw/keyword repr (schemas.cr:159)
    es_ignore: bool = False         # excluded from index (schemas.cr:156)
    analyzed: bool = False          # text field → token column materialized

    def __post_init__(self) -> None:
        if self.es_type is not None and self.es_type not in VALID_OVERRIDE_TYPES:
            raise SchemaError(
                f"Invalid tag `es_type` on field `{self.name}`: {self.es_type}"
            )
        if self.es_subfield is not None and self.es_subfield not in VALID_OVERRIDE_TYPES:
            raise SchemaError(
                f"Invalid tag `es_subfield` on field `{self.name}`: {self.es_subfield}"
            )

    @property
    def resolved_type(self) -> T.DataType:
        if self.es_type is not None:
            return _SPARK_TYPE_FOR_OVERRIDE[self.es_type]
        return self.dtype


@dataclass(frozen=True)
class ParentRelation:
    """(name, index, routing_attr) triple — reference `types.cr:2`."""

    name: str
    index: str
    routing_attr: str


@dataclass
class TableSchema:
    """A managed table's declared schema + relations (reference
    `MODEL_METADATA` entry, `schemas.cr:362-387`)."""

    name: str
    fields: list[FieldSpec]
    parents: list[ParentRelation] = field(default_factory=list)

    # -- derived ----------------------------------------------------------
    def index_fields(self) -> list[FieldSpec]:
        """Mapped fields, ignored dropped (schemas.cr:149-168)."""
        return [f for f in self.fields if not f.es_ignore]

    def struct_type(self, *, with_doc_type: bool = True) -> T.StructType:
        out = [
            T.StructField(f.name, f.resolved_type, f.nullable)
            for f in self.index_fields()
        ]
        if with_doc_type:
            # synthetic keyword field on every schema (schemas.cr:208)
            out.append(T.StructField("_document_type", T.StringType(), False))
        return T.StructType(out)

    def apply_mapping(self, df: DataFrame, extra_cols: tuple[str, ...] = ()) -> DataFrame:
        """The projection operator (SURVEY §2 A4-A7): select mapped
        columns with override casts, add subfield/token columns, stamp
        `_document_type`.  Catalyst prunes the dropped columns all the
        way into the parquet scan."""
        cols: list[Column] = []
        for f in self.index_fields():
            cols.append(_convert_field(f))
            if f.es_subfield is not None:
                # multi-field: same source indexed twice (schemas.cr:309-323)
                cols.append(F.col(f.name).alias(f"{f.name}__{f.es_subfield}"))
        cols.append(F.lit(self.name).alias("_document_type"))
        cols.extend(F.col(c) for c in extra_cols)
        return df.select(*cols)


_IP_RE = (
    r"^((25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)\.){3}"
    r"(25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)$|^[0-9a-f:]*:[0-9a-f:]*$"
)


def _convert_field(f: FieldSpec) -> Column:
    """Field conversion for apply_mapping — plain cast for scalar types;
    structured conversions for the ES specials (schemas.cr:211-227)."""
    col = F.col(f.name)
    if f.es_type == "geo_point":
        # accept "lat,lon" strings or an existing (lat, lon) struct
        if isinstance(f.dtype, T.StringType):
            parts = F.split(col, ",")
            return F.when(
                col.isNotNull() & (F.size(parts) == 2),
                F.struct(
                    F.trim(parts[0]).cast("double").alias("lat"),
                    F.trim(parts[1]).cast("double").alias("lon"),
                ),
            ).otherwise(F.lit(None).cast(GEO_POINT_TYPE)).alias(f.name)
        return col.cast(GEO_POINT_TYPE).alias(f.name)
    if f.es_type == "completion":
        # ES completion input list: wrap a scalar suggestion, pass arrays
        if isinstance(f.dtype, T.ArrayType):
            return col.cast(T.ArrayType(T.StringType())).alias(f.name)
        return F.when(
            col.isNotNull(), F.array(col.cast("string"))
        ).otherwise(F.lit(None).cast(T.ArrayType(T.StringType()))).alias(f.name)
    if f.es_type == "ip":
        # canonical lowercase, nulled when not ipv4/ipv6-shaped (ES
        # rejects malformed ips at index time; we tombstone the value)
        low = F.lower(F.trim(col.cast("string")))
        return F.when(low.rlike(_IP_RE), low).otherwise(
            F.lit(None).cast("string")
        ).alias(f.name)
    return col.cast(f.resolved_type).alias(f.name)


# ---------------------------------------------------------------------------
# Relation discovery + schema union (schemas.cr:171-183, 265-293)
# ---------------------------------------------------------------------------


def children_of(name: str, schemas: dict[str, TableSchema]) -> list[str]:
    """Inverse of the parent tags (reference `children`, schemas.cr:283-293)."""
    return sorted(
        s.name for s in schemas.values() if any(p.index == name for p in s.parents)
    )


def union_index_struct(
    parent: TableSchema, schemas: dict[str, TableSchema]
) -> T.StructType:
    """Parent index schema = union of own + all children's fields, deduped
    first-wins (reference `collect_index_properties`, schemas.cr:171-183)."""
    seen: dict[str, T.StructField] = {}
    for f in parent.struct_type().fields:
        seen.setdefault(f.name, f)
    for child_name in children_of(parent.name, schemas):
        for f in schemas[child_name].struct_type().fields:
            seen.setdefault(f.name, f)
    return T.StructType(list(seen.values()))


def equivalent_schema(a: T.StructType, b: T.StructType) -> bool:
    """Order-insensitive deep schema compare (reference
    `equivalent_schema?`, schemas.cr:88-118).  Nullability is ignored,
    field set + types must match."""
    fa = {f.name: f.dataType for f in a.fields}
    fb = {f.name: f.dataType for f in b.fields}
    return fa == fb


def schema_diff(
    current: T.StructType, expected: T.StructType
) -> list[tuple[str, str]]:
    """The consistency check as DATA: per-field [(name, status)] with
    status ∈ {missing, extra, type_mismatch} — what the reference's
    boolean `equivalent_schema?` (schemas.cr:88-118) would report if it
    explained itself; drives reindex decisions and the A23 driver query."""
    cur = {f.name: f.dataType for f in current.fields}
    exp = {f.name: f.dataType for f in expected.fields}
    out: list[tuple[str, str]] = []
    for name in sorted(exp.keys() | cur.keys()):
        if name not in cur:
            out.append((name, "missing"))
        elif name not in exp:
            out.append((name, "extra"))
        elif cur[name] != exp[name]:
            out.append((name, "type_mismatch"))
    return out


# ---------------------------------------------------------------------------
# Denormalizing fan-out — the reference's only join-like operator
# (elastic.cr:259-283): each child row is REPLICATED into every parent
# index, routed by the parent-FK value; rows with empty FK are skipped;
# self-referential docs skip their own index when parented
# (skip_replication?, elastic.cr:214-218).
# ---------------------------------------------------------------------------


def fan_out_to_parent(
    child_df: DataFrame, relation: ParentRelation, doc_type: str
) -> DataFrame:
    """Child rows destined for the parent's index, with shard routing.

    Not an equi-join at all: a filter + projection + (caller-side) union
    into the parent doc set — `repartition("_routing")` colocates each
    child with its parent (ES routing analog, elastic.cr:396-405)."""
    fk = relation.routing_attr
    fk_str = F.col(fk).cast("string")
    return (
        child_df.where(F.col(fk).isNotNull() & (fk_str != F.lit("")))
        .withColumn("_routing", fk_str)
        .withColumn("_join_field", F.struct(
            F.lit(doc_type).alias("name"), F.col(fk).cast("string").alias("parent"),
        ))
    )


def skip_self_replication(
    df: DataFrame, index_name: str, relation: ParentRelation, doc_type: str
) -> DataFrame:
    """Guard for self-referential models (elastic.cr:214-218): when a doc
    has a parent pointing at its OWN index, the plain (unrouted) write to
    that index is skipped — only the routed replica is written."""
    if relation.index != index_name:
        return df
    fk = relation.routing_attr
    return df.where(F.col(fk).isNull() | (F.col(fk).cast("string") == F.lit("")))


# ---------------------------------------------------------------------------
# Declared schemas: target corpus (BASELINE input_hint) + index tables
# ---------------------------------------------------------------------------

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

DOC_IDS_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("doc_id", T.LongType(), False),
        # hash-bucket partition key: changefeed batches join/replace only
        # the buckets containing touched urls (O(batch), not O(corpus))
        T.StructField("id_bucket", T.IntegerType(), False),
    ]
)

DOC_LENS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("dl", T.IntegerType(), False),
        T.StructField("shard", T.IntegerType(), False),
    ]
)

TERM_DICT_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("term_id", T.LongType(), False),
        T.StructField("df", T.LongType(), False),
        T.StructField("cf", T.LongType(), False),
    ]
)

POSTINGS_SCHEMA = T.StructType(
    [
        T.StructField("term_id", T.LongType(), False),
        T.StructField("shard", T.IntegerType(), False),
        T.StructField("block_id", T.IntegerType(), False),
        T.StructField("first_doc_id", T.LongType(), False),
        T.StructField("last_doc_id", T.LongType(), False),
        T.StructField("n_docs", T.IntegerType(), False),
        T.StructField("max_tf", T.IntegerType(), False),
        T.StructField("min_dl", T.IntegerType(), False),
        T.StructField("data", T.BinaryType(), False),
    ]
)

STATS_SCHEMA = T.StructType(
    [
        T.StructField("n_docs", T.LongType(), False),
        # exact integer Σdl so incremental batches delta-maintain avgdl
        T.StructField("sum_dl", T.LongType(), False),
        T.StructField("avgdl", T.DoubleType(), False),
        T.StructField("n_shards", T.IntegerType(), False),
        T.StructField("analyzer", T.StringType(), False),
    ]
)

MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("input_fingerprint", T.StringType(), False),
        T.StructField("rows", T.LongType(), False),
        T.StructField("bytes", T.LongType(), False),
        T.StructField("wall_ms", T.LongType(), False),
        T.StructField("status", T.StringType(), False),
    ]
)
