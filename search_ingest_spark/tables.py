"""Multi-table manager — the reference's `TableManager` re-expressed.

Reference boot order (`/root/reference/src/search-ingest/table_manager.cr:31-53`):
instantiate per-table handlers → `initialise_indices` (consistency check
per table, `table.cr:190-204`; ANY mismatch → `reindex_all` drops and
recreates ALL indices, `table_manager.cr:63-73`) → `backfill_all`
(per-table parallel fan-out, `table_manager.cr:80-82`).

The ES index per table becomes a doc-store table per schema; the ES
`join`-datatype parent/child replication (`elastic.cr:259-283`) becomes
a routed union: each child row is projected into its parent's doc set
with `_routing` = parent FK and a `_join_field` struct, repartitioned by
routing so parent and children co-locate (B10) — a map + union, not an
at-query join, exactly like the reference.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from search_ingest_spark.catalog import Catalog
from search_ingest_spark.schema import (
    TableSchema,
    children_of,
    equivalent_schema,
    fan_out_to_parent,
    skip_self_replication,
    union_index_struct,
)


def _doc_table(name: str) -> str:
    return f"doc_store_{name}"


class TableManager:
    def __init__(
        self, spark: SparkSession, cat: Catalog, schemas: dict[str, TableSchema]
    ) -> None:
        self.spark = spark
        self.cat = cat
        self.schemas = schemas

    # -- consistency (A23) ----------------------------------------------------
    def expected_struct(self, name: str):
        """Index schema incl. children's replicated fields + routing cols."""
        import pyspark.sql.types as T

        base = union_index_struct(self.schemas[name], self.schemas)
        extra = [
            T.StructField("_routing", T.StringType(), True),
            T.StructField(
                "_join_field",
                T.StructType([
                    T.StructField("name", T.StringType(), False),
                    T.StructField("parent", T.StringType(), True),
                ]),
                True,
            ),
        ]
        return T.StructType(list(base.fields) + extra)

    def consistent_index(self, name: str) -> bool:
        current = self.cat.get_mapping(_doc_table(name))
        return current is not None and equivalent_schema(
            current, self.expected_struct(name)
        )

    def consistent_indices(self) -> bool:
        return all(self.consistent_index(n) for n in self.schemas)

    # -- boot (table_manager.cr:31-53) -----------------------------------------
    def initialise(self, sources: dict[str, DataFrame], *, backfill: bool = True) -> dict:
        """All-or-nothing: ANY inconsistent index → reindex_all, mirroring
        the reference's blunt consistency policy (table_manager.cr:63-73)."""
        if not self.consistent_indices():
            self.reindex_all()
        if backfill:
            return self.backfill_all(sources)
        return {}

    def reindex_all(self) -> None:
        for name in self.schemas:
            self.cat.drop(_doc_table(name))

    # -- backfill (A1/A11/A17/A19) ----------------------------------------------
    def backfill_all(self, sources: dict[str, DataFrame]) -> dict[str, int]:
        """Per-table parallel backfill (Promise.map analog, A19);
        returns per-index written-doc counts (A18)."""

        def one(name: str) -> tuple[str, int]:
            return name, self._backfill_table(name, sources)

        with ThreadPoolExecutor(max_workers=min(8, len(self.schemas))) as pool:
            return dict(pool.map(one, self.schemas))

    def _backfill_table(self, name: str, sources: dict[str, DataFrame]) -> int:
        schema = self.schemas[name]
        target = self.expected_struct(name)
        parts: list[DataFrame] = []

        # own rows — self-referential docs with a parent skip their own
        # index (elastic.cr:214-218); routing defaults to own id
        own_src = sources[name]
        for rel in schema.parents:
            own_src = skip_self_replication(own_src, name, rel, name)
        own = schema.apply_mapping(own_src).withColumn(
            "_routing", F.col("id").cast("string")
        ).withColumn(
            "_join_field",
            F.struct(F.lit(name).alias("name"),
                     F.lit(None).cast("string").alias("parent")),
        )
        parts.append(own)

        # replicated children, routed by the parent FK (elastic.cr:259-283)
        for child_name in children_of(name, self.schemas):
            child_schema = self.schemas[child_name]
            rel = next(p for p in child_schema.parents if p.index == name)
            routed = fan_out_to_parent(sources[child_name], rel, child_name)
            parts.append(
                child_schema.apply_mapping(
                    routed, extra_cols=("_routing", "_join_field")
                )
            )

        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p, allowMissingColumns=True)
        # align to the declared union struct (missing cols → nulls)
        cols = []
        for f in target.fields:
            if f.name in out.columns:
                cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
            else:
                cols.append(F.lit(None).cast(f.dataType).alias(f.name))
        aligned = out.select(*cols)
        # co-locate parent + children (ES shard routing, B10)
        n_part = max(1, self.spark.sparkContext.defaultParallelism)
        self.cat.write(_doc_table(name), aligned.repartition(n_part, "_routing"))
        return self.cat.read(_doc_table(name)).count()

    def doc_count(self, name: str) -> int:
        return self.cat.read(_doc_table(name)).count()
