"""ECG200-format loader: whitespace-delimited floats, label in column 0.

The reference ships the ECG200 dataset in this format
(/root/reference/ECG-Dataset/ECG200_TRAIN.txt; SURVEY.md §2.1 S2 marks it an
optional fixture — current reference code has no loader, the design doc
describes the format).  Loaded distributed: ``spark.read.text`` →
split/cast → ``posexplode`` into the engine's long form
(series_id, label, idx, value), so a 100 GB dump of such files scans in
parallel with no driver-side parsing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def load_ecg(spark: SparkSession, path: str) -> DataFrame:
    """Whitespace floats, one series per line, label first.

    Output: (series_id long, label double, idx int, value double) — the
    implicit integer time axis of the reference (point index == timestamp,
    /root/reference/new_evaluation.py:186).  Lines with no numeric payload
    are dropped; malformed tokens cast to null (P4 coercion, not a crash).
    """
    lines = spark.read.text(path).select(
        F.monotonically_increasing_id().alias("series_id"),
        F.filter(
            F.split(F.trim(F.col("value")), r"\s+"), lambda x: x != F.lit("")
        ).alias("toks"),
    )
    parsed = lines.select(
        "series_id",
        F.element_at("toks", 1).try_cast("double").alias("label"),
        F.slice("toks", 2, 1 << 20).alias("vals"),
    ).filter(F.size("vals") > 0)
    return parsed.select(
        "series_id",
        "label",
        F.posexplode(F.transform("vals", lambda v: v.try_cast("double"))).alias(
            "idx", "value"
        ),
    )
