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


# change-event op markers (same vocabulary as streaming.incremental)
OP_UPSERT = "upsert"
OP_DELETE = "delete"


class TableManager:
    def __init__(
        self, spark: SparkSession, cat: Catalog, schemas: dict[str, TableSchema],
        *, n_routing_buckets: int = 64,
    ) -> None:
        self.spark = spark
        self.cat = cat
        self.schemas = schemas
        # doc stores are hash-partitioned on the shard-routing value (the
        # ES routing-shard analog) so a changefeed batch reads/rewrites
        # only the buckets containing touched documents
        self.n_routing_buckets = n_routing_buckets

    def _rbucket_col(self):
        return F.pmod(F.xxhash64("_routing"), F.lit(self.n_routing_buckets)).cast("int")

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
            T.StructField("_rbucket", T.IntegerType(), True),
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
        aligned = self._align(out, target)
        # co-locate parent + children (ES shard routing, B10): same
        # routing → same bucket → same partition dir
        n_part = max(1, min(self.n_routing_buckets,
                            self.spark.sparkContext.defaultParallelism))
        self.cat.write(
            _doc_table(name), aligned.repartition(n_part, "_rbucket"),
            partition_by=["_rbucket"],
        )
        return self.cat.read(_doc_table(name)).count()

    def _align(self, out: DataFrame, target) -> DataFrame:
        """Project onto the declared union struct (missing cols → nulls)
        and stamp the routing bucket."""
        cols = []
        for f in target.fields:
            if f.name == "_rbucket":
                cols.append(self._rbucket_col().alias("_rbucket"))
            elif f.name in out.columns:
                cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
            else:
                cols.append(F.lit(None).cast(f.dataType).alias(f.name))
        return out.select(*cols)

    def doc_count(self, name: str) -> int:
        return self.cat.read(_doc_table(name)).count()

    # -- changefeed (A2/A13-A15 across tables + parent replicas) --------------
    def apply_changes(
        self, table: str, changes: DataFrame, *, order_col: str | None = None,
    ) -> dict[str, int]:
        """Apply one micro-batch of change events for `table` to its own
        index AND every parent index — the reference's core loop
        (`table.cr:25-46` dispatch; `elastic.cr:259-283` parent-index
        mutation walk; `elastic.cr:452-464` routed deletes), collapsed to
        batch semantics.

        `changes` carries the table's source columns plus `_op`
        ('upsert' | 'delete'); DELETE events carry the full row too (the
        reference deletes from parent indices by reading the model's
        routing attr — `attributes[parent[:routing_attr]]`).  With
        `order_col`, events are first reduced last-writer-wins per id.

        Scale shape: every index merge reads and rewrites ONLY the
        routing buckets touched by the batch (partition-pruned), and all
        index mutations of the batch commit in one catalog transaction.
        Like ES (and the reference), an update that CHANGES a parent FK
        re-routes the replica without visiting the old FK's bucket, so a
        stale replica can remain under the old routing — the documented
        ES join-field semantics the reference inherits.

        Returns {index_name: touched routing-bucket count}.
        """
        schema = self.schemas[table]
        ev = changes
        if order_col is not None:
            payload = [c for c in ev.columns if c not in ("id", order_col)]
            s = F.struct(order_col, *payload)
            ev = ev.groupBy("id").agg(F.max_by(s, s).alias("_s")).select(
                "id", *[F.col(f"_s.{c}").alias(c) for c in [order_col, *payload]]
            )
        ups = ev.where(F.col("_op") == OP_UPSERT).drop("_op")
        dels = ev.where(F.col("_op") == OP_DELETE).drop("_op")
        touched = ev.select(F.col("id").cast("string").alias("_tid")).distinct()

        results: dict[str, int] = {}
        self.cat.begin()
        try:
            # own index: plain rows (self-replication guard applies)
            own_src = ups
            for rel in schema.parents:
                own_src = skip_self_replication(own_src, table, rel, table)
            own_new = self._align(
                schema.apply_mapping(own_src)
                .withColumn("_routing", F.col("id").cast("string"))
                .withColumn("_join_field", F.struct(
                    F.lit(table).alias("name"),
                    F.lit(None).cast("string").alias("parent"),
                )),
                self.expected_struct(table),
            )
            # routing space of the batch in the own index = the ids
            own_routes = ev.select(F.col("id").cast("string").alias("_routing"))
            results[table] = self._merge_index(table, table, touched, own_new,
                                               own_routes)

            # parent indices: routed replicas (elastic.cr:259-283); rows
            # with an empty FK are skipped on BOTH sides, like the
            # reference's `next if parent_id.empty?`
            for rel in schema.parents:
                fk = rel.routing_attr
                routed_new = self._align(
                    schema.apply_mapping(
                        fan_out_to_parent(ups, rel, table),
                        extra_cols=("_routing", "_join_field"),
                    ),
                    self.expected_struct(rel.index),
                )
                routes = ev.where(
                    F.col(fk).isNotNull() & (F.col(fk).cast("string") != F.lit(""))
                ).select(F.col(fk).cast("string").alias("_routing"))
                results[rel.index] = self._merge_index(
                    rel.index, table, touched, routed_new, routes
                )
            self.cat.commit()
        except BaseException:
            self.cat.rollback()
            raise
        return results

    def _merge_index(
        self, index: str, doc_type: str, touched: DataFrame,
        new_rows: DataFrame, routes: DataFrame,
    ) -> int:
        """Merge a batch into one index: within the touched routing
        buckets only, drop rows of (doc_type, touched ids), add the new
        projections.  O(touched buckets), not O(index)."""
        tbl = _doc_table(index)
        dirty = sorted({
            r[0] for r in routes.select(self._rbucket_col().alias("b"))
            .distinct().collect()
        })
        if not dirty:
            return 0
        old_sub = self.cat.read(tbl).where(F.col("_rbucket").isin(dirty))
        keep = old_sub.join(
            touched,
            (old_sub["id"].cast("string") == touched["_tid"])
            & (old_sub["_document_type"] == F.lit(doc_type)),
            "left_anti",
        )
        merged = keep.unionByName(new_rows)
        n_part = max(1, min(len(dirty),
                            self.spark.sparkContext.defaultParallelism))
        self.cat.replace_partitions(
            tbl, merged.repartition(n_part, "_rbucket"), "_rbucket",
            dirty_values=dirty,
        )
        return len(dirty)
