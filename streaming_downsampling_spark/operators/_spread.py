"""Fan a narrow scan out across the cluster before per-row-heavy work."""

from __future__ import annotations

import os
from urllib.parse import unquote, urlparse

from pyspark.sql import DataFrame

_UNITS = {"": 1, "b": 1, "k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "t": 1 << 40}


def _parse_bytes(conf_val: str, default: int) -> int:
    """Parse a Spark byte-size conf string ('134217728b', '128m', '1g')."""
    s = str(conf_val).strip().lower()
    for suffix in ("kb", "mb", "gb", "tb", "k", "m", "g", "t", "b", ""):
        if s.endswith(suffix):
            num = s[: len(s) - len(suffix)] if suffix else s
            try:
                return int(num) * _UNITS[suffix[:1]]
            except ValueError:
                continue
    return default


def _estimated_scan_splits(df: DataFrame, files: list[str]) -> int | None:
    """Estimate the scan's FilePartition count from file metadata alone.

    Mirrors Spark's `FilePartition.getFilePartitions` packing: split size =
    min(maxPartitionBytes, max(openCostInBytes, bytesPerCore)), files padded
    by the open cost and bin-packed.  Only local (`file:`) URIs are sized —
    a remote scheme (s3/hdfs/abfs) means production storage where the scan
    already has >= cores splits and spread() must stay a no-op, so ``None``
    (treat as wide) is returned without any filesystem round-trips.
    """
    sizes = []
    paths = []
    for uri in files:
        p = urlparse(uri)
        if p.scheme not in ("", "file"):
            return None
        try:
            path = unquote(p.path)
            sizes.append(os.path.getsize(path))
            paths.append(path)
        except OSError:
            return None
    if not sizes:
        return None
    conf = df.sparkSession.conf
    max_part = _parse_bytes(
        conf.get("spark.sql.files.maxPartitionBytes", "134217728b"), 128 << 20
    )
    open_cost = _parse_bytes(
        conf.get("spark.sql.files.openCostInBytes", "4194304b"), 4 << 20
    )
    cores = df.sparkSession.sparkContext.defaultParallelism
    padded = sum(sizes) + open_cost * len(sizes)
    split = min(max_part, max(open_cost, padded // max(cores, 1)))
    n = max(1, -(-padded // max(split, 1)))
    # Byte-ranges overstate REAL parallelism for parquet: a row group is
    # the atomic scan unit (each goes whole to the split holding its
    # midpoint), so a few-file scan whose files hold one big row group each
    # runs on len(files) tasks no matter how many nominal splits exist.
    # When the file count alone can't guarantee >= cores row groups, read
    # the footers (cheap: one local metadata read per file, only ever for
    # < cores files) and cap the estimate at the true row-group count.
    if n > len(paths) and len(paths) < cores and all(
        p.endswith(".parquet") for p in paths
    ):
        try:
            import pyarrow.parquet as pq

            rg = sum(pq.ParquetFile(p).metadata.num_row_groups for p in paths)
            n = min(n, max(rg, 1))
        except Exception:
            pass
    return n


def spread(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Repartition a too-narrow input so compute-heavy projections parallelize.

    A small input (e.g. one parquet file) arrives as a single scan partition,
    so a per-row-expensive downstream (shingle explode + hashing, per-element
    vector math) runs on one core no matter how many are free.  When the scan
    has fewer estimated splits than the session's default parallelism,
    repartition up to it — a tiny shuffle by construction (the input is
    small, that's why it has few splits).  At real scale the scan already has
    >= cores splits and this is a no-op: no shuffle is ever added to a big
    input.

    The split count comes from pure plan/file metadata (``inputFiles()`` +
    local file sizes + the session's split-size confs) — no plan-to-RDD
    conversion on the query path (round-3 verdict #5): file-backed plans
    never touch ``df.rdd``.  Remote-scheme files are treated as already-wide
    (production storage implies a multi-split scan).  Only file-less plans
    (in-memory relations, ranges — test inputs) fall back to the RDD
    partition count, guarded by try/except.

    Streaming DataFrames pass through untouched (micro-batch sources control
    their own parallelism via ``maxFilesPerTrigger``/``minPartitions``), so
    shingle/simhash/vector operators that call ``spread`` stay reusable
    inside Structured Streaming.
    """
    if df.isStreaming:
        return df
    target = min_parts or df.sparkSession.sparkContext.defaultParallelism
    try:
        files = df.inputFiles()
    except Exception:
        files = []
    if files:
        n = _estimated_scan_splits(df, files)
        if n is None:  # remote storage: real-scale scan, never add a shuffle
            return df
    else:
        try:  # file-less plan (local relation / range): cheap by construction
            n = df.rdd.getNumPartitions()
        except Exception:  # un-convertible plan: leave the input as planned
            return df
    if n < target:
        return df.repartition(target)
    return df
