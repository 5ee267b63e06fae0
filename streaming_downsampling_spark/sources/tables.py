"""Snapshot warehouse: Iceberg-essential semantics over plain parquet.

The north rule calls for Iceberg tables (atomic commits, snapshot resume,
idempotent MERGE).  The Iceberg Spark runtime jar cannot be fetched in this
offline environment, so this module provides the same *semantics* behind a
thin, swappable layer (SURVEY.md §7.2 M0 fallback):

* each commit writes a fresh immutable snapshot directory
  ``<warehouse>/<table>/snap-<n>/`` (parquet files),
* ``metadata.json`` is swapped atomically (write-temp + ``os.replace``) and
  carries the snapshot lineage (id, parent, operation, row count),
* readers always resolve the *current* snapshot → readers never see partial
  writes (the Iceberg atomic-commit property),
* ``merge_upsert`` is an idempotent MERGE keyed on arbitrary columns —
  replaying the same batch converges to the same table (exactly-once
  end-to-end when driven from a checkpointed stream),
* time travel: ``read(snapshot_id=...)``.

On a real cluster you'd swap this for ``df.writeTo("cat.db.t")`` with the
Iceberg catalog; every call site goes through this module only.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession


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

    # -- io ------------------------------------------------------------------
    def _snap_dir(self, table: str, snap: int) -> str:
        return os.path.join(self.root, table, f"snap-{snap}")

    def exists(self, table: str) -> bool:
        return self.current_snapshot(table) is not None

    def read(self, table: str, snapshot_id: int | None = None) -> DataFrame:
        meta = self._load_meta(table)
        snap = meta["current"] if snapshot_id is None else snapshot_id
        if snap is None:
            raise FileNotFoundError(f"table {table!r} has no snapshot")
        return self.spark.read.parquet(self._snap_dir(table, snap))

    def _next_snap(self, meta: dict) -> int:
        return (meta["current"] or 0) + 1 if meta["snapshots"] else 1

    def _finish(
        self, table: str, df_written_dir: str, op: str, rows: int, meta: dict, snap: int
    ) -> int:
        meta["snapshots"].append(
            {
                "id": snap,
                "parent": meta["current"],
                "op": op,
                "rows": rows,
                "committed_at": time.time(),
            }
        )
        meta["current"] = snap
        self._commit_meta(table, meta)
        return snap

    def overwrite(self, table: str, df: DataFrame, op: str = "overwrite") -> int:
        """Write a new snapshot containing exactly ``df``."""
        meta = self._load_meta(table)
        snap = self._next_snap(meta)
        out = self._snap_dir(table, snap)
        df.write.mode("overwrite").parquet(out)
        rows = self.spark.read.parquet(out).count()
        return self._finish(table, out, op, rows, meta, snap)

    def append(self, table: str, df: DataFrame) -> int:
        """Append-as-new-snapshot (union with current)."""
        if not self.exists(table):
            return self.overwrite(table, df, op="append")
        cur = self.read(table)
        return self.overwrite(table, cur.unionByName(df), op="append")

    def merge_upsert(self, table: str, df: DataFrame, keys: list[str]) -> int:
        """Idempotent MERGE: new rows replace current rows with equal keys.

        Equivalent to ``MERGE INTO t USING s ON <keys> WHEN MATCHED THEN
        UPDATE * WHEN NOT MATCHED THEN INSERT *`` — replaying the same source
        batch is a no-op on the final state, which is what makes streaming
        restarts exactly-once at the table level.
        """
        if not self.exists(table):
            return self.overwrite(table, df, op="merge")
        cur = self.read(table)
        remaining = cur.join(df.select(*keys).distinct(), keys, "left_anti")
        return self.overwrite(table, remaining.unionByName(df), op="merge")

    def expire_snapshots(self, table: str, keep_last: int = 2) -> list[int]:
        """Retention: delete all but the newest ``keep_last`` snapshot dirs
        (the Iceberg ``expire_snapshots`` maintenance action)."""
        import shutil

        meta = self._load_meta(table)
        snaps = [s["id"] for s in meta["snapshots"]]
        to_drop = snaps[:-keep_last] if keep_last else snaps
        dropped = []
        for s in to_drop:
            d = self._snap_dir(table, s)
            if s != meta["current"] and os.path.exists(d):
                shutil.rmtree(d)
                dropped.append(s)
        meta["snapshots"] = [
            s for s in meta["snapshots"] if s["id"] not in dropped
        ]
        self._commit_meta(table, meta)
        return dropped
