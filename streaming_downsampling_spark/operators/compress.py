"""Chunk compression operators: Gorilla/delta-of-delta chunks as a table.

Maps each (key, window) group to one row holding the compressed blobs —
the ``chunks`` retention-tier format from SURVEY.md §4.3.  Blob columns are
``BinaryType`` so parquet stores them raw.

Physical shape: ``repartition(key, window) → sortWithinPartitions →
mapInPandas`` with cross-batch group carry, NOT ``applyInPandas`` — per-group
Python invocation overhead (~ms) dwarfs the codec on small groups, and at
100 TB the group count is enormous while each retention window stays small.
One shuffle total; the kernel walks each sorted Arrow batch and emits one
row per complete group.

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


_MOD = np.uint64((1 << 63) - 1)


def _fold63(x: np.ndarray) -> np.ndarray:
    """x mod (2^63 - 1) for uint64 inputs, branch-free Mersenne fold."""
    y = (x & _MOD) + (x >> np.uint64(63))
    return (y & _MOD) + (y >> np.uint64(63))


def _checksum(ts_us: np.ndarray, values: np.ndarray) -> int:
    """Order-independent 63-bit checksum over (ts, value-bitpattern) pairs.

    Computes ``sum((t * 1000003 + v) mod (2^63-1)) mod (2^63-1)`` entirely in
    uint64 numpy: the multiply is split 32/32 so every intermediate fits, and
    p = 2^63-1 is Mersenne so reduction is a shift-add fold.
    """
    v = _fold63(np.ascontiguousarray(values, dtype=np.float64).view(np.uint64))
    ts_i = np.asarray(ts_us, dtype=np.int64)
    t = ts_i.astype(np.uint64)
    # pre-epoch timestamps: the uint64 view is ts + 2^64 ≡ ts + 2 (mod p),
    # so subtract 2 mod p to recover the signed value's true residue
    neg = ts_i < 0
    if neg.any():
        t = _fold63(_fold63(t) + np.where(neg, _MOD - np.uint64(2), np.uint64(0)))
    k = np.uint64(1000003)
    hi = (t >> np.uint64(32)) * k          # < 2^52
    lo = (t & np.uint64(0xFFFFFFFF)) * k   # < 2^52
    # (hi * 2^32) mod p: shift the folded hi by 32 with wraparound at bit 63
    hi = _fold63(hi)
    hi32 = _fold63(((hi << np.uint64(32)) & _MOD) + (hi >> np.uint64(31)))
    term = _fold63(_fold63(hi32 + _fold63(lo)) + v)
    # tree reduction: each pairwise sum of two <2^63 terms fits uint64, then
    # folds back under 2^63 — exact mod-p sum in log2(n) vectorized passes
    while len(term) > 1:
        if len(term) % 2:
            term = np.concatenate([term, np.zeros(1, dtype=np.uint64)])
        term = _fold63(term[0::2] + term[1::2])
    out = int(term[0]) if len(term) else 0
    return out % int(_MOD)


def compress_chunks(
    df: DataFrame,
    window: str = "1 hour",
    key_col: str = "conv_id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_col: str | None = "turn_idx",
) -> DataFrame:
    """Encode each (key, tumbling window) group into one Gorilla chunk row."""
    from ._groupmap import sorted_group_map

    return sorted_group_map(
        df, window, key_col, ts_col, value_col, order_col, encode_frame_fn(), CHUNK_SCHEMA
    )


def encode_frame_fn():
    """The chunk-encode kernel as a prepared-frame function, for sharing one
    ``prepare_sorted`` shuffle with other same-grouping kernels."""

    def encode_frame(body: pd.DataFrame) -> pd.DataFrame:
        """Encode every (key, window) run in a sorted frame — numpy boundary
        splits (the shared group_bounds walk), no per-group pandas
        objects."""
        from ._groupmap import group_bounds

        bounds, keys, ws = group_bounds(body)
        ts_us = _ts_us(body["_ts"])
        vals = body["_value"].to_numpy(dtype=np.float64)
        rows = []
        for i in range(len(bounds) - 1):
            a, b = bounds[i], bounds[i + 1]
            t, v = ts_us[a:b], vals[a:b]
            tb, vb = G.encode_chunk(t, v)
            rows.append(
                {
                    "key": keys[a],
                    "window_start": ws[a],
                    "n_points": b - a,
                    "first_ts_us": int(t[0]),
                    "ts_blob": tb,
                    "val_blob": vb,
                    "checksum": _checksum(t, v),
                    "raw_bytes": (b - a) * 16,
                    "enc_bytes": len(tb) + len(vb),
                }
            )
        return pd.DataFrame(rows)

    return encode_frame


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
