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
import re
import shutil
import threading
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
        self._txn: list[dict] | None = None
        # serializes txn staging across driver threads: the incremental
        # batch submits its table writes to a concurrent fan-out, so
        # entries for DISTINCT tables may be appended from several
        # threads (appends are GIL-atomic, but the lock makes the
        # append + shadow-scan pair explicitly safe)
        self._txn_mu = threading.Lock()
        self._recover_txn()

    # -- paths -------------------------------------------------------------
    def _dir(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _meta_path(self, name: str) -> str:
        return os.path.join(self._dir(name), "_table_meta.json")

    def _load_meta(self, name: str) -> dict | None:
        # a pending (uncommitted) snapshot staged inside the active
        # transaction shadows the committed one for THIS writer's reads;
        # a pending tombstone (meta None) shadows it as absent
        if self._txn is not None:
            with self._txn_mu:
                for e in reversed(self._txn):
                    if e["name"] == name:
                        return e["meta"]
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

    # -- multi-table transactions -------------------------------------------
    # The Iceberg multi-table-commit analog: snapshot swaps performed
    # inside begin()/commit() are journaled to one fsynced _txn.json and
    # applied together; a crash before the journal lands leaves every
    # table on its previous snapshot, a crash after it is rolled FORWARD
    # on the next Catalog open (_recover_txn — publishing a journaled
    # swap is idempotent).  This is what makes the incremental splice's
    # delta-maintained stats/term_dict replay-safe: replays always see
    # either the full pre-batch or the full post-batch state, never a
    # torn mix (streaming/incremental.py).

    def _txn_path(self) -> str:
        return os.path.join(self.root, "_txn.json")

    def _recover_txn(self) -> None:
        try:
            with open(self._txn_path()) as fh:
                journal = json.load(fh)
        except (FileNotFoundError, json.JSONDecodeError):
            return
        for e in journal.get("entries", []):
            self._apply_publish(e)
        os.remove(self._txn_path())

    def begin(self) -> None:
        if self._txn is not None:
            raise RuntimeError("transaction already active")
        self._txn = []

    def rollback(self) -> None:
        entries, self._txn = (self._txn or []), None
        for e in entries:
            if e["meta"] is None:
                continue  # tombstone: nothing was staged on disk
            shutil.rmtree(
                os.path.join(self._dir(e["name"]), e["meta"]["current"]),
                ignore_errors=True,
            )

    def commit(self) -> None:
        if self._txn is None:
            raise RuntimeError("no active transaction")
        entries, self._txn = self._txn, None
        if not entries:
            return
        tmp = self._txn_path() + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"entries": entries}, fh)
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, self._txn_path())  # the commit point
        for e in entries:
            self._apply_publish(e)
        os.remove(self._txn_path())

    def _apply_publish(self, e: dict) -> None:
        name = e["name"]
        if e["meta"] is None:
            # journaled drop tombstone: deletion deferred to the commit
            # point so a rollback (or crash pre-journal) keeps the table
            shutil.rmtree(self._dir(name), ignore_errors=True)
            return
        os.makedirs(self._dir(name), exist_ok=True)
        tmp = self._meta_path(name) + f".{uuid.uuid4().hex[:8]}.tmp"
        with open(tmp, "w") as fh:
            json.dump(e["meta"], fh)
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, self._meta_path(name))
        pinned = self._pinned_gens(name)
        for d in e.get("cleanup", []):
            if d in pinned:
                continue  # retained: a checkpoint still references it
            shutil.rmtree(os.path.join(self._dir(name), d), ignore_errors=True)

    def _publish(self, name: str, meta: dict, cleanup: list[str]) -> None:
        entry = {"name": name, "meta": meta, "cleanup": cleanup}
        if self._txn is not None:
            with self._txn_mu:
                self._txn.append(entry)
            return
        self._apply_publish(entry)

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
        """Drop a table.  Inside an active transaction the drop is staged
        as a journal tombstone and applied only at commit() — a failure
        after the drop request (rollback, crash before the journal lands)
        leaves the table intact, preserving all-or-nothing batch replay
        (the incremental splice drops doc_attrs mid-transaction)."""
        if self._txn is not None:
            with self._txn_mu:
                self._txn.append({"name": name, "meta": None, "cleanup": []})
            return
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
        table — Iceberg RENAME TABLE analog).

        Implemented as a snapshot-level move: src's current snapshot
        dir is renamed into dst's table dir as a fresh generation and
        published with the usual fsynced meta swap — so dst's PREVIOUS
        generations survive if pinned by a checkpoint (plain rename of
        the whole dir would destroy them).  The meta swap is the commit
        point; a crash before it leaves dst unchanged (the moved dir is
        an unreferenced orphan reclaimed by vacuum) — src is consumed
        either way.

        Checkpoint interaction: generations of SRC pinned by a
        checkpoint are left behind on disk (hardlink-copied when the
        pinned gen is the one being promoted), so `at(label).read(src)`
        keeps working after the promote — unlike drop(), which purges.
        src == dst is rejected (it would consume the table)."""
        if src == dst:
            raise ValueError("promote(src, dst) requires src != dst")
        smeta = self._load_meta(src)
        if smeta is None:
            raise FileNotFoundError(src)
        if self._txn is not None:
            raise RuntimeError("promote() is not transactional")
        os.makedirs(self._dir(dst), exist_ok=True)
        gen = f"snap-{uuid.uuid4().hex[:12]}"
        pinned = self._pinned_gens(src)
        src_cur = os.path.join(self._dir(src), smeta["current"])
        dst_gen = os.path.join(self._dir(dst), gen)
        if smeta["current"] in pinned:
            # the promoted snapshot itself is pinned: hardlink-copy so
            # the checkpointed src view survives (zero data copy)
            shutil.copytree(src_cur, dst_gen, copy_function=os.link)
        else:
            os.rename(src_cur, dst_gen)
        dmeta = self._load_meta(dst)
        cleanup = [dmeta["current"]] if dmeta else []
        self._publish(dst, {"current": gen, "schema": smeta["schema"]},
                      cleanup)
        if pinned:
            # consume src's identity (meta) and unpinned gens only;
            # pinned generation dirs stay readable via at(label)
            sdir = self._dir(src)
            for entry in os.listdir(sdir):
                if entry.startswith("snap-") and entry in pinned:
                    continue
                p = os.path.join(sdir, entry)
                if os.path.isdir(p):
                    shutil.rmtree(p, ignore_errors=True)
                else:
                    try:
                        os.remove(p)
                    except FileNotFoundError:
                        pass
        else:
            shutil.rmtree(self._dir(src), ignore_errors=True)

    def truncate(self, name: str) -> None:
        """delete-by-query match_all analog (elastic.cr:569-587)."""
        schema = self.get_mapping(name)
        if schema is None:
            raise FileNotFoundError(name)
        self.write(name, self.spark.createDataFrame([], schema))

    # -- checkpoints (time travel) ------------------------------------------
    # The Iceberg tag/snapshot-read analog: checkpoint(label) pins every
    # table's CURRENT snapshot generation under a name; at(label) returns
    # a read-only catalog view resolving reads against those pinned
    # generations.  Because publishes stage a full new snapshot dir and
    # only then swap the pointer (and replace_partitions hardlinks clean
    # partitions), retention is nearly free in space: a pinned generation
    # shares file inodes with its successors for every partition that
    # did not change.  Cleanup (in _apply_publish) skips pinned
    # generations; delete_checkpoint + vacuum() reclaim them.  drop()
    # removes the whole table dir and therefore invalidates that table
    # in every checkpoint — reads of it through at() then raise
    # FileNotFoundError (documented; matches Iceberg DROP TABLE PURGE).

    _LABEL_RE = re.compile(r"^[A-Za-z0-9._-]{1,64}$")

    def _ckpt_dir(self) -> str:
        return os.path.join(self.root, "_checkpoints")

    def _ckpt_path(self, label: str) -> str:
        if not self._LABEL_RE.match(label):
            raise ValueError(f"bad checkpoint label: {label!r}")
        return os.path.join(self._ckpt_dir(), f"{label}.json")

    def checkpoint(self, label: str) -> None:
        """Pin every table's current snapshot under `label` (fsynced,
        atomic).  Re-using a label overwrites it."""
        if self._txn is not None:
            raise RuntimeError("checkpoint() inside a transaction is "
                               "ambiguous — commit or rollback first")
        tables = {}
        for name in self.list_tables():
            meta = self._load_meta(name)
            tables[name] = {"snapshot": meta["current"],
                            "schema": meta["schema"]}
        os.makedirs(self._ckpt_dir(), exist_ok=True)
        path = self._ckpt_path(label)
        tmp = path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"tables": tables}, fh)
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, path)

    def checkpoints(self) -> list[str]:
        try:
            return sorted(
                f[:-5] for f in os.listdir(self._ckpt_dir())
                if f.endswith(".json")
            )
        except FileNotFoundError:
            return []

    def delete_checkpoint(self, label: str) -> None:
        try:
            os.remove(self._ckpt_path(label))
        except FileNotFoundError:
            pass

    def _pinned_gens(self, name: str) -> set[str]:
        pinned: set[str] = set()
        for label in self.checkpoints():
            try:
                with open(self._ckpt_path(label)) as fh:
                    t = json.load(fh).get("tables", {}).get(name)
            except (FileNotFoundError, json.JSONDecodeError):
                continue
            if t:
                pinned.add(t["snapshot"])
        return pinned

    def at(self, label: str) -> "CatalogSnapshot":
        """Read-only view of the catalog as of checkpoint `label`."""
        with open(self._ckpt_path(label)) as fh:
            tables = json.load(fh)["tables"]
        return CatalogSnapshot(self, label, tables)

    def vacuum(self) -> int:
        """Remove snapshot dirs referenced by neither a table's current
        pointer nor any checkpoint; returns the count removed.  Run
        after delete_checkpoint to reclaim retained generations.

        Refuses to run inside an active transaction (mirroring
        checkpoint()): _load_meta() would see the txn's shadow state,
        so the keep-set could miss the COMMITTED current snapshot (or,
        after an in-txn drop tombstone, keep nothing) — rollback would
        then point at a deleted dir.  Commit or rollback first.

        Also sweeps meta-less table dirs (a promote()d-away src whose
        pinned generations were left behind): unpinned snap dirs are
        reclaimed, and the dir itself once no pins remain."""
        if self._txn is not None:
            raise RuntimeError("vacuum() inside a transaction would "
                               "compute its keep-set from uncommitted "
                               "state — commit or rollback first")
        removed = 0
        for name in os.listdir(self.root):
            tdir = self._dir(name)
            if not os.path.isdir(tdir) or name.startswith("_"):
                continue
            keep = self._pinned_gens(name)
            meta = self._load_meta(name)
            if meta:
                keep.add(meta["current"])
            for d in os.listdir(tdir):
                if d.startswith("snap-") and d not in keep:
                    shutil.rmtree(os.path.join(tdir, d), ignore_errors=True)
                    removed += 1
            if meta is None and not any(
                d.startswith("snap-") for d in os.listdir(tdir)
            ):
                shutil.rmtree(tdir, ignore_errors=True)
        return removed

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
        prev = self._load_meta(name)
        cleanup = [prev["current"]] if prev and prev["current"] != gen else []
        self._publish(name, meta, cleanup)

    def read_small(self, name: str) -> list[dict]:
        """Driver-side read of a TINY table (stats, counters) via
        pyarrow — no Spark job.  Honors the txn shadow through
        data_path, so in-transaction readers see their staged writes.
        Local-mode job scheduling costs ~0.3 s per action; the
        incremental batch path reads these one-row tables several
        times, which dominated its fixed cost (VERDICT r03 item 3)."""
        import pyarrow.dataset as ds

        return ds.dataset(self.data_path(name)).to_table().to_pylist()

    _PA_TYPES = {
        "long": "int64", "bigint": "int64", "int": "int32",
        "double": "float64", "string": "string",
    }

    def write_small(self, name: str, rows: list[tuple], ddl: str) -> None:
        """Driver-side write of a TINY table via pyarrow — no Spark
        job; identical snapshot/meta/txn semantics to write().  `ddl`
        is a Spark DDL schema string ('a long, b double, ...'); the
        published meta stores the equivalent Spark schema so read()
        round-trips exactly."""
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql import types as T

        schema = T._parse_datatype_string(ddl)
        names = [f.name for f in schema.fields]
        pa_fields = []
        for f in schema.fields:
            tn = f.dataType.simpleString()
            if tn not in self._PA_TYPES:
                raise ValueError(f"write_small supports {sorted(self._PA_TYPES)}"
                                 f" columns only, got {tn} for {f.name!r}")
            pa_fields.append(pa.field(f.name, getattr(pa, self._PA_TYPES[tn])()))
        cols = list(zip(*rows)) if rows else [[] for _ in names]
        tbl = pa.table(
            {n: pa.array(list(c), type=fld.type)
             for n, c, fld in zip(names, cols, pa_fields)}
        )
        tdir = self._dir(name)
        os.makedirs(tdir, exist_ok=True)
        gen = f"snap-{uuid.uuid4().hex[:12]}"
        target = os.path.join(tdir, gen)
        os.makedirs(target)
        pq.write_table(tbl, os.path.join(target, "part-00000.parquet"))
        meta = {"current": gen, "schema": json.dumps(schema.jsonValue())}
        prev = self._load_meta(name)
        cleanup = [prev["current"]] if prev and prev["current"] != gen else []
        self._publish(name, meta, cleanup)

    _ARROW_TYPES = {
        "long": "int64", "bigint": "int64", "int": "int32",
        "integer": "int32", "string": "string", "double": "float64",
        "float": "float32", "boolean": "bool_", "binary": "binary",
    }

    def arrow_dataset(self, name: str):
        """pyarrow dataset over the table's CURRENT snapshot with the
        PUBLISHED schema — discovery never opens a data file (default
        pyarrow inference reads an arbitrary fragment's footer, which
        would break the O(dirty) contract: a partition-pruned point-
        read must not touch clean partitions).  Hive partition columns
        are detected from the snapshot's directory names."""
        import pyarrow as pa
        import pyarrow.dataset as pads

        root = self.data_path(name)
        spark_schema = self.get_mapping(name)
        part_names = {
            d.split("=", 1)[0] for d in os.listdir(root)
            if "=" in d and os.path.isdir(os.path.join(root, d))
        }

        def _pa_field(f):
            tn = f.dataType.simpleString()
            if tn not in self._ARROW_TYPES:
                raise ValueError(
                    f"arrow_dataset: unsupported column type {tn} "
                    f"for {f.name!r} in table {name!r}")
            return pa.field(f.name, getattr(pa, self._ARROW_TYPES[tn])())

        full = pa.schema([_pa_field(f) for f in spark_schema.fields])
        if part_names:
            part_schema = pa.schema(
                [full.field(n) for n in full.names if n in part_names])
            return pads.dataset(
                root, schema=full,
                partitioning=pads.partitioning(part_schema, flavor="hive"))
        return pads.dataset(root, schema=full)

    def write_small_arrow(self, name: str, tbl, ddl: str | None = None) -> None:
        """Driver-side snapshot write of a pyarrow Table, keeping the
        table's published Spark schema (so read() round-trips exactly).
        Same snapshot/meta/txn semantics as write(); no Spark job.  Used
        by the incremental micro-batch path and the build's driver-side
        term_dict stage for dictionary-class tables.

        The table must exist unless `ddl` (a Spark DDL schema string)
        is given, which CREATEs it with that published schema."""
        import pyarrow.parquet as pq

        meta = self._load_meta(name)
        if meta is None:
            if ddl is None:
                raise FileNotFoundError(
                    f"write_small_arrow requires an existing table: {name}")
            schema = T._parse_datatype_string(ddl)
            schema_json = json.dumps(schema.jsonValue())
        else:
            schema = T.StructType.fromJson(json.loads(meta["schema"]))
            schema_json = meta["schema"]
        tbl = tbl.select([f.name for f in schema.fields])
        tdir = self._dir(name)
        os.makedirs(tdir, exist_ok=True)
        gen = f"snap-{uuid.uuid4().hex[:12]}"
        target = os.path.join(tdir, gen)
        os.makedirs(target)
        pq.write_table(tbl, os.path.join(target, "part-00000.parquet"))
        self._publish(name, {"current": gen, "schema": schema_json},
                      [meta["current"]] if meta else [])

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
        disk (hardlinked, zero data copy), so an incremental batch costs
        IO proportional to the dirty set, not the table.

        Crash safety matches write(): a FULL new snapshot dir is staged
        (clean partition dirs hardlinked, dirty ones moved in from the
        staging write), then published with the same fsynced
        _table_meta.json pointer swap — a crash mid-call leaves the live
        snapshot byte-identical; no partition can go missing."""
        cur = self.data_path(name)
        meta = self._load_meta(name)
        tdir = self._dir(name)
        stage = os.path.join(tdir, f"stage-{uuid.uuid4().hex[:12]}")
        df.write.mode("overwrite").partitionBy(partition_col).parquet(stage)

        gen = f"snap-{uuid.uuid4().hex[:12]}"
        target = os.path.join(tdir, gen)
        os.makedirs(target)
        replaced = {f"{partition_col}={v}" for v in dirty_values}
        replaced.update(f"{partition_col}={v}" for v in (drop_values or []))
        for entry in os.listdir(cur):
            if entry in replaced:
                continue  # superseded (or dropped) by this batch
            src, dst = os.path.join(cur, entry), os.path.join(target, entry)
            if os.path.isdir(src):
                shutil.copytree(src, dst, copy_function=os.link)
            else:
                os.link(src, dst)  # e.g. _SUCCESS marker
        for v in dirty_values:
            sub = f"{partition_col}={v}"
            src = os.path.join(stage, sub)
            if os.path.exists(src):
                # a dirty partition absent from `df` (all rows deleted)
                # simply isn't carried into the new snapshot
                os.rename(src, os.path.join(target, sub))
        shutil.rmtree(stage, ignore_errors=True)

        new_meta = {"current": gen, "schema": meta["schema"]}
        self._publish(name, new_meta, [meta["current"]])

    def read(self, name: str) -> DataFrame:
        schema = self.get_mapping(name)
        return self.spark.read.schema(schema).parquet(self.data_path(name))


class CatalogSnapshot:
    """Read-only catalog view pinned to a checkpoint (Catalog.at).

    Duck-types the read surface the query layer uses — `read`,
    `data_path`, `exists`, `get_mapping` — so `Searcher(spark, cat.at
    ("v1"))` and `LocalSearcher(cat.at("v1"))` serve the index exactly
    as of the checkpoint while live writes continue against `cat`.
    Mutating methods don't exist here by construction."""

    def __init__(self, cat: Catalog, label: str, tables: dict) -> None:
        self.cat = cat
        self.spark = cat.spark
        self.label = label
        self._tables = tables

    def _entry(self, name: str) -> dict:
        t = self._tables.get(name)
        if t is None:
            raise FileNotFoundError(
                f"table {name!r} not in checkpoint {self.label!r}")
        return t

    def exists(self, name: str) -> bool:
        t = self._tables.get(name)
        return t is not None and os.path.exists(
            os.path.join(self.cat._dir(name), t["snapshot"]))

    def data_path(self, name: str) -> str:
        t = self._entry(name)
        path = os.path.join(self.cat._dir(name), t["snapshot"])
        if not os.path.exists(path):
            raise FileNotFoundError(
                f"snapshot {t['snapshot']} of {name!r} was dropped "
                f"(checkpoint {self.label!r} no longer fully readable)")
        return path

    def get_mapping(self, name: str) -> T.StructType | None:
        t = self._tables.get(name)
        if t is None:
            return None
        return T.StructType.fromJson(json.loads(t["schema"]))

    def read(self, name: str) -> DataFrame:
        t = self._entry(name)  # clean FileNotFoundError for absent tables
        schema = T.StructType.fromJson(json.loads(t["schema"]))
        return self.spark.read.schema(schema).parquet(self.data_path(name))
