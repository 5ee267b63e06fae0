"""Snapshot warehouse: Iceberg-essential semantics over plain parquet.

The north rule calls for Iceberg tables (atomic commits, snapshot resume,
idempotent MERGE).  The Iceberg Spark runtime jar cannot be fetched in this
offline environment, so this module provides the same *semantics* behind a
thin, swappable layer (SURVEY.md §7.2 M0 fallback):

* data lives in immutable directories ``<warehouse>/<table>/data/<name>/``
  (parquet files); a snapshot is a *manifest* mapping partition key → the
  list of data dirs that hold that partition's current rows,
* ``metadata.json`` is swapped atomically (write-temp + ``os.replace``) and
  carries the snapshot lineage (id, parent, operation, row count, manifest),
* readers always resolve the *current* snapshot → readers never see partial
  writes (the Iceberg atomic-commit property),
* ``append`` commits ONLY the new batch's files — O(batch) I/O, the old
  manifest entries are reused by reference,
* ``merge_upsert`` is an idempotent MERGE keyed on arbitrary columns;
  with ``partition_by`` it rewrites ONLY the partitions the batch touches
  (real Iceberg MERGE behavior) — per-micro-batch cost is O(touched
  partitions), not O(table), which is what keeps a long-running stream's
  total write I/O linear instead of quadratic,
* time travel: ``read(snapshot_id=...)``; retention:
  ``expire_snapshots`` deletes data dirs no kept snapshot references.

On a real cluster you'd swap this for ``df.writeTo("cat.db.t")`` with the
Iceberg catalog; every call site goes through this module only.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

UNPARTITIONED = "*"


def _anti_join_null_safe(old: DataFrame, batch_keys: DataFrame, on: list[str]) -> DataFrame:
    """``left_anti`` on ``on`` with NULL-SAFE equality (``<=>``).

    A plain column-list anti-join uses SQL equality, under which NULL never
    matches NULL — so a current row whose merge key (or partition value) is
    NULL would survive every MERGE and the replayed batch row would commit a
    duplicate, breaking the idempotent exactly-once contract.  Null-safe
    equality treats NULL as a value (Spark's ``dropDuplicates`` convention),
    which is the semantics replay-idempotence needs (round-4 ADVICE class:
    partition-representation misses skipping the anti-join)."""
    b = batch_keys
    for c in on:
        b = b.withColumnRenamed(c, f"__mk_{c}")
    cond = None
    for c in on:
        e = old[c].eqNullSafe(b[f"__mk_{c}"])
        cond = e if cond is None else cond & e
    return old.join(b, cond, "left_anti")


class Warehouse:
    def __init__(self, spark: SparkSession, root: str) -> None:
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- metadata ----------------------------------------------------------
    def _meta_path(self, table: str) -> str:
        return os.path.join(self.root, table, "metadata.json")

    def _load_meta(self, table: str) -> dict:
        p = self._meta_path(table)
        if not os.path.exists(p):
            return {"current": None, "snapshots": []}
        with open(p) as f:
            return json.load(f)

    def _commit_meta(self, table: str, meta: dict) -> None:
        p = self._meta_path(table)
        tmp = p + ".tmp"
        os.makedirs(os.path.dirname(p), exist_ok=True)
        with open(tmp, "w") as f:
            json.dump(meta, f, indent=1)
        os.replace(tmp, p)  # atomic on POSIX

    def snapshots(self, table: str) -> list[dict]:
        return self._load_meta(table)["snapshots"]

    def current_snapshot(self, table: str) -> int | None:
        return self._load_meta(table)["current"]

    def _snapshot_entry(self, meta: dict, snapshot_id: int | None) -> dict:
        snap = meta["current"] if snapshot_id is None else snapshot_id
        for s in meta["snapshots"]:
            if s["id"] == snap:
                return s
        raise FileNotFoundError(f"snapshot {snap} not found")

    # -- io ------------------------------------------------------------------
    def _data_dir(self, table: str, name: str) -> str:
        return os.path.join(self.root, table, "data", name)

    def exists(self, table: str) -> bool:
        return self.current_snapshot(table) is not None

    def read(
        self,
        table: str,
        snapshot_id: int | None = None,
        partitions: list[str] | None = None,
    ) -> DataFrame:
        """Read a snapshot; ``partitions`` restricts the scan to the named
        partition keys (manifest-level partition pruning)."""
        meta = self._load_meta(table)
        if meta["current"] is None:
            raise FileNotFoundError(f"table {table!r} has no snapshot")
        entry = self._snapshot_entry(meta, snapshot_id)
        dirs = [
            self._data_dir(table, d)
            for p, ds in sorted(entry["parts"].items())
            if partitions is None or p in partitions
            for d in ds
        ]
        if not dirs:
            raise FileNotFoundError(
                f"no data for table {table!r} partitions {partitions!r}"
            )
        # mergeSchema: dirs written before a column was added lack it —
        # schema-evolution reads fill the gap with nulls (Iceberg add-column
        # semantics)
        return self.spark.read.option("mergeSchema", "true").parquet(*dirs)

    def _next_snap(self, meta: dict) -> int:
        return (meta["current"] or 0) + 1 if meta["snapshots"] else 1

    def _finish(
        self, table: str, op: str, rows: int, meta: dict, snap: int, parts: dict
    ) -> int:
        meta["snapshots"].append(
            {
                "id": snap,
                "parent": meta["current"],
                "op": op,
                "rows": rows,
                "parts": parts,
                "committed_at": time.time(),
            }
        )
        meta["current"] = snap
        self._commit_meta(table, meta)
        return snap

    def _write_dir(self, table: str, name: str, df: DataFrame) -> int:
        out = self._data_dir(table, name)
        df.write.mode("overwrite").parquet(out)
        return self.spark.read.parquet(out).count()

    def _write_partitioned(
        self, table: str, snap: int, df: DataFrame, partition_by: str
    ) -> tuple[dict, int]:
        """All touched partition values in ONE Spark job.

        ``partitionBy`` on a duplicated string key (``__part``) fans the
        batch into one immutable subdir per value while the original
        partition column stays in the data files (schema-stable reads); the
        manifest is built from the written directories, so no driver-side
        ``collect()`` of values and no per-value job.  A backfill touching
        1,000 days is one job, not 1,000 sequential jobs (round-2 verdict
        finding)."""
        from urllib.parse import unquote

        base = f"d{snap}"
        out = self._data_dir(table, base)
        df.withColumn("__part", F.col(partition_by).cast("string")).write.mode(
            "overwrite"
        ).partitionBy("__part").parquet(out)
        parts = {}
        for d in sorted(os.listdir(out)):
            if not d.startswith("__part="):
                continue
            v = unquote(d[len("__part=") :])
            if v == "__HIVE_DEFAULT_PARTITION__":
                v = "None"
            parts[v] = [f"{base}/{d}"]
        # one read-back of the whole batch dir for the committed row count
        rows = (
            self.spark.read.parquet(out).count()
            if parts
            else 0
        )
        return parts, rows

    def overwrite(
        self,
        table: str,
        df: DataFrame,
        op: str = "overwrite",
        partition_by: str | None = None,
    ) -> int:
        """Write a new snapshot containing exactly ``df``."""
        meta = self._load_meta(table)
        snap = self._next_snap(meta)
        if partition_by is None:
            name = f"d{snap}-0"
            rows = self._write_dir(table, name, df)
            parts = {UNPARTITIONED: [name]}
        else:
            parts, rows = self._write_partitioned(table, snap, df, partition_by)
        return self._finish(table, op, rows, meta, snap, parts)

    def append(
        self, table: str, df: DataFrame, partition_by: str | None = None
    ) -> int:
        """Append-only commit: writes the batch's files, reuses every
        existing manifest entry by reference — O(batch) I/O."""
        if not self.exists(table):
            return self.overwrite(table, df, op="append", partition_by=partition_by)
        meta = self._load_meta(table)
        snap = self._next_snap(meta)
        parts = {p: list(ds) for p, ds in self._snapshot_entry(meta, None)["parts"].items()}
        if partition_by is None:
            name = f"d{snap}-0"
            rows = self._write_dir(table, name, df)
            parts.setdefault(UNPARTITIONED, []).append(name)
        else:
            new_parts, rows = self._write_partitioned(table, snap, df, partition_by)
            for p, ds in new_parts.items():
                parts.setdefault(p, []).extend(ds)
        return self._finish(table, "append", rows, meta, snap, parts)

    def merge_upsert(
        self,
        table: str,
        df: DataFrame,
        keys: list[str],
        partition_by: str | None = None,
    ) -> int:
        """Idempotent MERGE: new rows replace current rows with equal keys.

        Equivalent to ``MERGE INTO t USING s ON <keys> WHEN MATCHED THEN
        UPDATE * WHEN NOT MATCHED THEN INSERT *`` — replaying the same source
        batch is a no-op on the final state, which is what makes streaming
        restarts exactly-once at the table level.

        With ``partition_by`` (a column of ``df``), only the partitions
        present in the batch are read + rewritten; all other partitions'
        manifest entries carry over untouched.
        """
        if not self.exists(table):
            return self.overwrite(table, df, op="merge", partition_by=partition_by)
        meta = self._load_meta(table)
        cur = self._snapshot_entry(meta, None)["parts"]
        if partition_by is None or UNPARTITIONED in cur:
            # unpartitioned (or one-time migration of a table created
            # unpartitioned): full merge rewrite
            old = self.read(table)
            remaining = _anti_join_null_safe(old, df.select(*keys).distinct(), keys)
            return self.overwrite(
                table,
                remaining.unionByName(df, allowMissingColumns=True),
                op="merge",
                partition_by=partition_by,
            )
        snap = self._next_snap(meta)
        parts = {p: list(ds) for p, ds in cur.items()}
        # ONE job for the whole batch: read every touched partition's current
        # dirs together, anti-join on (keys + partition value) — identical
        # per-partition MERGE semantics to a per-value loop, since a key
        # match only ever replaces rows within the same partition value —
        # then write keep ∪ batch with a single partitionBy commit.  The
        # touched-value set is resolved with one small distinct() collect
        # (partition VALUES, not data); all data I/O is one read + one write.
        # The values are collected through Spark's OWN cast-to-string — the
        # exact representation `_write_partitioned` puts in the manifest via
        # partition directory names — because Python's str() disagrees with
        # it for booleans ('True' vs 'true') and sci-notation floats, and a
        # representation miss here would skip the anti-join and commit
        # duplicate keys (round-3 ADVICE finding).  NULL *and* the empty
        # string both land in __HIVE_DEFAULT_PARTITION__ (manifest key
        # 'None'), so both map to it here — '' kept as-is would miss the
        # manifest key, skip the anti-join for that partition, and commit
        # duplicate keys (round-4 ADVICE finding, same failure class).
        df = df.persist()
        touched = {
            "None" if r[0] is None or r[0] == "" else r[0]
            for r in df.select(
                F.col(partition_by).cast("string")
            ).distinct().collect()
        }
        old_dirs = [
            self._data_dir(table, d)
            for p, ds in parts.items()
            if p in touched
            for d in ds
        ]
        merged = df
        if old_dirs:
            on = list(dict.fromkeys([*keys, partition_by]))
            old = self.spark.read.option("mergeSchema", "true").parquet(*old_dirs)
            keep = _anti_join_null_safe(old, df.select(*on).distinct(), on)
            # allowMissingColumns: a batch carrying a NEW column (or missing
            # a legacy one) merges cleanly — the Iceberg add-column path
            merged = keep.unionByName(df, allowMissingColumns=True)
        new_parts, rows = self._write_partitioned(table, snap, merged, partition_by)
        df.unpersist()
        parts.update(new_parts)
        return self._finish(table, "merge", rows, meta, snap, parts)

    def compact(self, table: str, partition_by: str | None = None) -> int:
        """Rewrite the current snapshot into ONE data dir per partition
        (Iceberg's ``rewrite_data_files`` maintenance action): every append
        adds a dir per touched partition, so a long-running stream
        accumulates read fan-out and manifest growth; compaction restores
        O(#partitions) dirs in one partitionBy job.  A normal snapshot
        commit — time travel still reaches the pre-compaction layout until
        ``expire_snapshots`` reclaims it."""
        return self.overwrite(
            table, self.read(table), op="compact", partition_by=partition_by
        )

    def partition_keys(self, table: str, snapshot_id: int | None = None) -> list[str]:
        """Partition keys of a snapshot's manifest (sorted)."""
        meta = self._load_meta(table)
        return sorted(self._snapshot_entry(meta, snapshot_id)["parts"])

    def expire_partitions(self, table: str, before: str) -> int:
        """Retention policy: drop every partition with key < ``before``
        (string compare — day keys are ISO dates, so lexicographic ==
        chronological).  A pure metadata commit, O(#partitions): no data is
        read or rewritten (the Iceberg ``DELETE WHERE`` fast path on a
        partition predicate); the dropped dirs are reclaimed later by
        ``expire_snapshots`` once no kept snapshot references them.
        """
        meta = self._load_meta(table)
        cur = self._snapshot_entry(meta, None)["parts"]
        parts = {p: list(ds) for p, ds in cur.items() if not (p != UNPARTITIONED and p < before)}
        snap = self._next_snap(meta)
        return self._finish(table, "expire_partitions", 0, meta, snap, parts)

    def expire_snapshots(self, table: str, keep_last: int = 2) -> list[int]:
        """Retention: drop all but the newest ``keep_last`` snapshots and
        delete every data dir no kept snapshot references (the Iceberg
        ``expire_snapshots`` maintenance action)."""
        meta = self._load_meta(table)
        snaps = meta["snapshots"]
        kept, dropped = snaps[-keep_last:] if keep_last else [], snaps[:-keep_last] if keep_last else snaps
        kept = [s for s in kept] or [self._snapshot_entry(meta, None)]
        live = {
            d for s in kept for ds in s["parts"].values() for d in ds
        }
        dropped_ids = []
        for s in dropped:
            if s["id"] == meta["current"]:
                continue
            for ds in s["parts"].values():
                for d in ds:
                    if d not in live:
                        path = self._data_dir(table, d)
                        if os.path.exists(path):
                            shutil.rmtree(path)
            dropped_ids.append(s["id"])
        meta["snapshots"] = [s for s in snaps if s["id"] not in dropped_ids]
        self._commit_meta(table, meta)
        return dropped_ids
