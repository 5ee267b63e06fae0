"""Fan a narrow scan out across the cluster before per-row-heavy work."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Repartition a too-narrow input so compute-heavy projections parallelize.

    A small input (e.g. one parquet file) arrives as a single scan partition,
    so a per-row-expensive downstream (shingle explode + hashing, per-element
    vector math) runs on one core no matter how many are free.  When the scan
    has fewer partitions than the session's default parallelism, repartition
    up to it — a tiny shuffle by construction (the input is small, that's why
    it has few splits).  At real scale the scan already has ≥ cores splits and
    this is a no-op: no shuffle is ever added to a big input.

    Streaming DataFrames pass through untouched (plan-to-RDD conversion is
    undefined for them; micro-batch sources control their own parallelism via
    ``maxFilesPerTrigger``/``minPartitions``), so shingle/simhash/vector
    operators that call ``spread`` stay reusable inside Structured Streaming.
    The ``df.rdd`` inspection does convert the plan once — acceptable for the
    narrow scans this guards; callers with wide plans should pass inputs
    already partitioned (every engine entry point does).
    """
    if df.isStreaming:
        return df
    target = min_parts or df.sparkSession.sparkContext.defaultParallelism
    try:
        n = df.rdd.getNumPartitions()
    except Exception:  # un-convertible plan: leave the input as planned
        return df
    if n < target:
        return df.repartition(target)
    return df
