"""Chunk compression operators: Gorilla/delta-of-delta chunks as a table.

Maps each (key, window) group to one row holding the compressed blobs —
the ``chunks`` retention-tier format from SURVEY.md §4.3.  Encode/decode are
``applyInPandas`` / ``mapInPandas`` over bounded groups; blob columns are
``BinaryType`` so parquet stores them raw.

The reference has no compression (gzip'd JSON Kafka messages only,
/root/reference/core/streaming_pipeline.py:172-180); this is the north-rule
Gorilla path.  Round-trip is bit-exact (tests assert float64 bit-pattern
equality end-to-end through Spark).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ..functions import gorilla as G

CHUNK_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("window_start", TimestampType()),
        StructField("n_points", IntegerType()),
        StructField("first_ts_us", LongType()),
        StructField("ts_blob", BinaryType()),
        StructField("val_blob", BinaryType()),
        StructField("checksum", LongType()),
        StructField("raw_bytes", LongType()),
        StructField("enc_bytes", LongType()),
    ]
)

POINT_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("ts_us", LongType()),
        StructField("value", DoubleType()),
    ]
)


def _ts_us(series: pd.Series) -> np.ndarray:
    """Timestamps → int64 microseconds, robust to ns/us units and tz."""
    s = pd.to_datetime(series)
    if getattr(s.dt, "tz", None) is not None:
        s = s.dt.tz_convert("UTC").dt.tz_localize(None)
    return s.to_numpy(dtype="datetime64[us]").astype(np.int64)


def _checksum(ts_us: np.ndarray, values: np.ndarray) -> int:
    """Order-independent 63-bit checksum over (ts, value-bitpattern) pairs."""
    v = values.view(np.uint64).astype(object)
    t = ts_us.astype(object)
    return int(sum((t * 1000003 + v) % ((1 << 63) - 1)) % ((1 << 63) - 1))


def compress_chunks(
    df: DataFrame,
    window: str = "1 hour",
    key_col: str = "conv_id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_col: str | None = "turn_idx",
) -> DataFrame:
    """Encode each (key, tumbling window) group into one Gorilla chunk row."""

    def kernel(key_tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        cols = [order_col, ts_col] if order_col and order_col in pdf else [ts_col]
        pdf = pdf.sort_values(cols, kind="stable")
        ts_us = _ts_us(pdf[ts_col])
        vals = pdf[value_col].to_numpy(dtype=np.float64)
        tb, vb = G.encode_chunk(ts_us, vals)
        return pd.DataFrame(
            [
                {
                    "key": key_tuple[0],
                    "window_start": key_tuple[1]["start"],
                    "n_points": len(vals),
                    "first_ts_us": int(ts_us[0]) if len(ts_us) else 0,
                    "ts_blob": tb,
                    "val_blob": vb,
                    "checksum": _checksum(ts_us, vals),
                    "raw_bytes": len(vals) * 16,
                    "enc_bytes": len(tb) + len(vb),
                }
            ]
        )

    return df.groupBy(
        F.col(key_col).alias("key"), F.window(ts_col, window).alias("w")
    ).applyInPandas(kernel, CHUNK_SCHEMA)


def decompress_chunks(chunks: DataFrame) -> DataFrame:
    """Explode chunk rows back into (key, ts_us, value) points.

    ``mapInPandas``: no shuffle — each chunk row decodes independently."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            frames = []
            for row in pdf.itertuples(index=False):
                ts, vals = G.decode_chunk(bytes(row.ts_blob), bytes(row.val_blob))
                if _checksum(ts, vals) != row.checksum:
                    raise ValueError(
                        f"chunk checksum mismatch for key={row.key} "
                        f"window_start={row.window_start}"
                    )
                frames.append(
                    pd.DataFrame({"key": row.key, "ts_us": ts, "value": vals})
                )
            yield pd.concat(frames, ignore_index=True) if frames else pd.DataFrame(
                {"key": [], "ts_us": [], "value": []}
            )

    return chunks.mapInPandas(kernel, POINT_SCHEMA)
