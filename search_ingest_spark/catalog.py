"""Catalog seam: index-table persistence with Iceberg-or-Parquet backends.

No Iceberg runtime jar ships in this sandbox, so the seam keeps every
Iceberg-specific feature (MERGE, snapshot commits, REPLACE) behind
functions with Parquet implementations of the same semantics; on a
cluster with the Iceberg catalog configured, `format("iceberg")` slots in
via `use_iceberg()`.

DDL surface mirrors the reference's index lifecycle:
- create-with-mapping  (`/root/reference/src/search-ingest/table.cr:183-188`)
- drop / drop-all      (`elastic.cr:133-140,499-501`)
- truncate (delete-by-query match_all, `elastic.cr:569-587`)
- mapping fetch + consistency diff (`elastic.cr:146-157`, `table.cr:190-204`)
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from search_ingest_spark.schema import equivalent_schema

_ICEBERG = False


def use_iceberg(flag: bool = True) -> None:
    global _ICEBERG
    _ICEBERG = flag


class Catalog:
    """A directory-of-tables catalog (one subdir per table).

    Writes are atomic at table granularity: data lands in a staging dir,
    then an fsynced manifest swap makes it live — the Parquet stand-in
    for an Iceberg snapshot commit, so readers never see partial output
    and a killed build never corrupts the previous index generation."""

    def __init__(self, spark: SparkSession, root: str) -> None:
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- paths -------------------------------------------------------------
    def _dir(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _meta_path(self, name: str) -> str:
        return os.path.join(self._dir(name), "_table_meta.json")

    def _load_meta(self, name: str) -> dict | None:
        try:
            with open(self._meta_path(name)) as fh:
                return json.load(fh)
        except FileNotFoundError:
            return None

    def data_path(self, name: str) -> str:
        meta = self._load_meta(name)
        if meta is None:
            raise FileNotFoundError(f"no such table: {name}")
        return os.path.join(self._dir(name), meta["current"])

    # -- DDL ----------------------------------------------------------------
    def exists(self, name: str) -> bool:
        return self._load_meta(name) is not None

    def get_mapping(self, name: str) -> T.StructType | None:
        """Mapping fetch (elastic.cr:146-157)."""
        meta = self._load_meta(name)
        if meta is None:
            return None
        return T.StructType.fromJson(json.loads(meta["schema"]))

    def consistent(self, name: str, expected: T.StructType) -> bool:
        """Exists + schema-equivalent (table.cr:190-204)."""
        current = self.get_mapping(name)
        return current is not None and equivalent_schema(current, expected)

    def drop(self, name: str) -> None:
        shutil.rmtree(self._dir(name), ignore_errors=True)

    def drop_all(self) -> None:
        for name in self.list_tables():
            self.drop(name)

    def list_tables(self) -> list[str]:
        return sorted(
            d for d in os.listdir(self.root)
            if os.path.exists(self._meta_path(d))
        )

    def promote(self, src: str, dst: str) -> None:
        """Rename table `src` to `dst` (zero-copy publish of a staged
        table — Iceberg RENAME TABLE analog)."""
        if not self.exists(src):
            raise FileNotFoundError(src)
        self.drop(dst)
        os.rename(self._dir(src), self._dir(dst))

    def truncate(self, name: str) -> None:
        """delete-by-query match_all analog (elastic.cr:569-587)."""
        schema = self.get_mapping(name)
        if schema is None:
            raise FileNotFoundError(name)
        self.write(name, self.spark.createDataFrame([], schema))

    # -- DML ----------------------------------------------------------------
    def write(
        self,
        name: str,
        df: DataFrame,
        *,
        partition_by: list[str] | None = None,
        sort_within_partitions: list[str] | None = None,
    ) -> None:
        """CREATE OR REPLACE + INSERT as one atomic snapshot swap."""
        tdir = self._dir(name)
        os.makedirs(tdir, exist_ok=True)
        gen = f"snap-{uuid.uuid4().hex[:12]}"
        target = os.path.join(tdir, gen)
        if sort_within_partitions:
            df = df.sortWithinPartitions(*sort_within_partitions)
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(target)
        meta = {"current": gen, "schema": json.dumps(df.schema.jsonValue())}
        tmp = self._meta_path(name) + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(meta, fh)
            fh.flush()
            os.fsync(fh.fileno())
        prev = self._load_meta(name)
        os.replace(tmp, self._meta_path(name))
        if prev is not None and prev["current"] != gen:
            shutil.rmtree(os.path.join(tdir, prev["current"]), ignore_errors=True)

    def replace_partitions(
        self,
        name: str,
        df: DataFrame,
        partition_col: str,
        dirty_values: list,
        drop_values: list | None = None,
    ) -> None:
        """Replace ONLY the named partition directories of a
        `partition_by`-written table with `df`'s data (which must contain
        only dirty partitions) — the Parquet stand-in for Iceberg's
        dynamic partition overwrite.  Clean partitions are untouched on
        disk, so an incremental batch costs IO proportional to the dirty
        set, not the table.  Swap is per-partition-dir rename: atomic per
        partition; the caller's build-state marks batch completion.
        """
        cur = self.data_path(name)
        stage = os.path.join(self._dir(name), f"stage-{uuid.uuid4().hex[:12]}")
        df.write.mode("overwrite").partitionBy(partition_col).parquet(stage)
        for v in dirty_values:
            sub = f"{partition_col}={v}"
            src, dst = os.path.join(stage, sub), os.path.join(cur, sub)
            if os.path.exists(dst):
                shutil.rmtree(dst)
            if os.path.exists(src):
                os.rename(src, dst)
        for v in drop_values or []:
            shutil.rmtree(os.path.join(cur, f"{partition_col}={v}"), ignore_errors=True)
        shutil.rmtree(stage, ignore_errors=True)

    def read(self, name: str) -> DataFrame:
        schema = self.get_mapping(name)
        return self.spark.read.schema(schema).parquet(self.data_path(name))
