"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship rollup→gapfill→downsample pipeline on
sf0.001; ``queries()`` / ``oracle_sql()`` re-export the engine's query
catalog (streaming_downsampling_spark/queries.py) — every SQL-expressible
operator carries a DuckDB oracle with matched column names and rounding.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: tiered rollup + linear
    gap-fill + DWT wavelet-threshold downsampling over the events stream."""
    import pyspark.sql.functions as F

    from streaming_downsampling_spark.operators.downsample import (
        downsample_select,
    )
    from streaming_downsampling_spark.operators.gapfill import gapfill
    from streaming_downsampling_spark.operators.rollup import cascade, rollup

    sf_dir = "/root/testdata/sf0.001"
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    r1h = rollup(
        ev, "1h", key_col="event_type", ts_col="ts", value_col="value", order_col=None
    )
    r1d = cascade(r1h, "1d")
    filled = gapfill(r1h, "1h", method="linear")
    sel = downsample_select(
        filled.withColumnRenamed("window_start", "ts"),
        "wavelet_threshold",
        24,
        window="7 days",
        key_col="key",
        ts_col="ts",
        value_col="value",
        order_col=None,
    )
    # join the daily tier back so the result carries both representations
    return sel.join(
        r1d.select(
            "key",
            F.col("window_start").alias("day"),
            F.round("avg_value", 6).alias("day_avg"),
        ),
        (sel.key == r1d.key) & (F.date_trunc("day", sel.sel_ts) == F.col("day")),
        "left",
    ).select(sel.key, "window_start", "sel_ts", "sel_value", "day_avg")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from streaming_downsampling_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from streaming_downsampling_spark.queries import ORACLES

    return dict(ORACLES)
