"""Windowed downsampling operators over (key, tumbling window) groups.

Kernels from :mod:`..functions.kernels` run over whole groups as numpy —
never per-row Python (BASELINE.json input_hint).  The physical shape is the
shared ``sorted_group_map`` pattern (one shuffle, numpy boundary splits,
~µs/group) rather than per-group ``applyInPandas`` — see
:mod:`._groupmap` for why this matters at 10^12 turns.

The group is one retention window of one conversation, so group size is
bounded by the window length: skewed long conversations widen the number of
groups, not the size of any single group.

On a real cluster this module ships via ``spark-submit --py-files`` (zip of
the package); in local mode the executor threads share the driver's
sys.path.

Reference parity: selector semantics are /root/reference/new_evaluation.py:66-198;
the model pipeline is /root/reference/core/downsampling_algorithm2.py:243-395
re-expressed with deterministic frozen weights.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ..functions import kernels as K
from ..functions import wavelets as wv
from ._groupmap import group_bounds, sorted_group_map

_SELECTORS: dict[str, Callable[..., np.ndarray]] = {
    "uniform": lambda x, t, **kw: K.uniform_indices(len(x), t),
    "random": lambda x, t, **kw: K.random_indices(len(x), t, seed=kw.get("seed", 42)),
    "random_hash": lambda x, t, **kw: K.hash_random_indices(
        len(x), t, group_key=kw.get("group_key", ""), seed=kw.get("seed", 42)
    ),
    "minmax": lambda x, t, **kw: K.minmax_indices(x, t),
    "lttb": lambda x, t, **kw: K.lttb_indices(x, t),
    "pip": lambda x, t, **kw: K.pip_indices(x, t),
    "wavelet_threshold": lambda x, t, **kw: K.wavelet_threshold_indices(
        x, t, wavelet=kw.get("wavelet", "db4")
    ),
    # fixed-wavelet variant so one metrics pass can evaluate BOTH the haar
    # and db4 thresholding selectors side by side (the error bench's ninth
    # value-oracled method)
    "wavelet_threshold_db4": lambda x, t, **kw: K.wavelet_threshold_indices(
        x, t, wavelet="db4"
    ),
}

SELECT_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("window_start", TimestampType()),
        StructField("sel_pos", IntegerType()),
        StructField("sel_ord", LongType()),
        StructField("sel_ts", TimestampType()),
        StructField("sel_value", DoubleType()),
        StructField("method", StringType()),
    ]
)

METRICS_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("window_start", TimestampType()),
        StructField("method", StringType()),
        StructField("n", IntegerType()),
        StructField("k", IntegerType()),
        StructField("mse", DoubleType()),
        StructField("rmse", DoubleType()),
        StructField("mae", DoubleType()),
        StructField("r2", DoubleType()),
        StructField("corr", DoubleType()),
        StructField("spectral_mse", DoubleType()),
    ]
)

MODEL_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("window_start", TimestampType()),
        StructField("n", IntegerType()),
        StructField("pooled_approx", ArrayType(DoubleType())),
        StructField("detail_values", ArrayType(DoubleType())),
        StructField("detail_indices", ArrayType(IntegerType())),
    ]
)


def downsample_select(
    df: DataFrame,
    method: str,
    target: int,
    window: str = "1 hour",
    key_col: str = "conv_id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_col: str | None = "turn_idx",
    **kw,
) -> DataFrame:
    """Select ``target`` representative points per (key, window) group.

    Output rows carry the in-group position (``sel_pos``), the stable order
    key (``sel_ord``), the original timestamp and value — never mutated, so
    the per-row text-equality invariant holds by joining back on
    (key, sel_ord).
    """
    if method not in _SELECTORS:
        raise ValueError(f"unknown method {method!r}; have {sorted(_SELECTORS)}")
    selector = _SELECTORS[method]

    def frame_fn(body: pd.DataFrame) -> pd.DataFrame:
        bounds, keys, ws = group_bounds(body)
        vals = body["_value"].to_numpy(dtype=np.float64)
        ords = body["_ord"].to_numpy()
        tss = body["_ts"].to_numpy()
        out_key, out_ws, out_pos, out_ord, out_ts, out_val = [], [], [], [], [], []
        for i in range(len(bounds) - 1):
            a, b = bounds[i], bounds[i + 1]
            x = K.sanitize(vals[a:b])
            # hash-seeded selectors salt on the group key (portable RNG)
            idx = selector(x, target, **{**kw, "group_key": str(keys[a])})
            out_key.append(np.repeat(keys[a], len(idx)))
            out_ws.append(np.repeat(ws[a], len(idx)))
            out_pos.append(idx.astype(np.int32))
            out_ord.append(ords[a:b][idx].astype(np.int64))
            out_ts.append(tss[a:b][idx])
            out_val.append(x[idx])
        return pd.DataFrame(
            {
                "key": np.concatenate(out_key),
                "window_start": np.concatenate(out_ws),
                "sel_pos": np.concatenate(out_pos),
                "sel_ord": np.concatenate(out_ord),
                "sel_ts": np.concatenate(out_ts),
                "sel_value": np.concatenate(out_val),
                "method": method,
            }
        )

    return sorted_group_map(
        df, window, key_col, ts_col, value_col, order_col, frame_fn, SELECT_SCHEMA
    )


def _method_metrics(x: np.ndarray, method: str, target: int, **kw) -> tuple[int, dict]:
    """One (group, method) evaluation: select/pool → reconstruct → metrics.
    Returns (k, metrics dict) — the reference's per-sample loop body
    (/root/reference/new_evaluation.py:185-209, 244-253)."""
    n = len(x)
    if method in _SELECTORS:
        idx = _SELECTORS[method](x, target, **kw)
        rec = K.reconstruct_linear(idx, x[idx], n)
        k = len(idx)
    else:
        pooled = K.avg_pool(x, target) if method == "avg_pool" else K.max_pool(x, target)
        w = max(1, n // target)
        centers = np.arange(len(pooled)) * w + (w - 1) / 2.0
        rec = np.interp(np.arange(n, dtype=np.float64), centers, pooled)
        k = len(pooled)
    return k, K.reconstruction_metrics(x, rec)


def downsample_metrics(
    df: DataFrame,
    method: str,
    target: int,
    window: str = "1 hour",
    key_col: str = "conv_id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_col: str | None = "turn_idx",
    **kw,
) -> DataFrame:
    """Downsample + endpoint-anchored linear reconstruction + error metrics
    per group (the reference's evaluation loop,
    /root/reference/new_evaluation.py:185-209, distributed)."""
    return downsample_metrics_multi(
        df, [method], target, window, key_col, ts_col, value_col, order_col, **kw
    )


def downsample_metrics_multi(
    df: DataFrame,
    methods: list[str],
    target: int,
    window: str = "1 hour",
    key_col: str = "conv_id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_col: str | None = "turn_idx",
    **kw,
) -> DataFrame:
    """All ``methods`` evaluated in ONE pass over the data — one shuffle
    total, mirroring the reference's one-pass-per-sample comparison loop
    (/root/reference/new_evaluation.py:244-253).  A per-method union would
    re-shuffle the input once per method; at 100× scale that multiplies the
    dominant I/O cost by len(methods)."""
    for m in methods:
        if m not in _SELECTORS and m not in ("avg_pool", "max_pool"):
            raise ValueError(f"unknown method {m!r}")

    def frame_fn(body: pd.DataFrame) -> pd.DataFrame:
        bounds, keys, ws = group_bounds(body)
        vals = body["_value"].to_numpy(dtype=np.float64)
        rows = []
        for i in range(len(bounds) - 1):
            a, b = bounds[i], bounds[i + 1]
            x = K.sanitize(vals[a:b])
            for method in methods:
                k, m = _method_metrics(
                    x, method, target, **{**kw, "group_key": str(keys[a])}
                )
                rows.append(
                    {
                        "key": keys[a],
                        "window_start": ws[a],
                        "method": method,
                        "n": len(x),
                        "k": k,
                        **m,
                    }
                )
        return pd.DataFrame(rows)

    # metrics read only the value series (group_key comes from `key`)
    frame_fn.needed_cols = ["key", "window_start", "_value"]
    return sorted_group_map(
        df, window, key_col, ts_col, value_col, order_col, frame_fn, METRICS_SCHEMA
    )


def downsample_model(
    df: DataFrame,
    window: str = "1 hour",
    key_col: str = "conv_id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_col: str | None = "turn_idx",
    wavelet: str = "db4",
    retention: float = 0.8,
    approx_ds_factor: int = 2,
    seed: int = 42,
) -> DataFrame:
    """The reference model pipeline per group: DWT → pooled approximation +
    attention-selected detail coefficients
    (/root/reference/core/downsampling_algorithm2.py:279-339)."""
    return sorted_group_map(
        df,
        window,
        key_col,
        ts_col,
        value_col,
        order_col,
        model_frame_fn(wavelet, retention, approx_ds_factor, seed),
        MODEL_SCHEMA,
    )


def model_frame_fn(
    wavelet: str = "db4",
    retention: float = 0.8,
    approx_ds_factor: int = 2,
    seed: int = 42,
):
    """The model kernel as a prepared-frame function, for sharing one
    ``prepare_sorted`` shuffle with other same-grouping kernels."""

    def frame_fn(body: pd.DataFrame) -> pd.DataFrame:
        bounds, keys, ws = group_bounds(body)
        vals = K.sanitize(body["_value"].to_numpy(dtype=np.float64))
        lengths = np.diff(bounds)
        g_count = len(lengths)
        pooled_out: list = [None] * g_count
        sel_out: list = [None] * g_count
        idx_out: list = [None] * g_count
        # bucket same-length groups (n <= the model's 200-point segment cap,
        # /root/reference/main.py:106) and run the batched kernel once per
        # distinct length; long skewed groups take the segmented scalar path
        # where numpy overhead amortizes anyway.
        small = np.flatnonzero(lengths <= 200)
        small_lens = lengths[small]
        for n in np.unique(small_lens):
            gs = small[small_lens == n]
            X = np.empty((len(gs), n), dtype=np.float64)
            for j, g in enumerate(gs):
                X[j] = vals[bounds[g] : bounds[g] + n]
            pooled, sel, idx = K.model_downsample_batch(
                X,
                wavelet=wavelet,
                approx_ds_factor=approx_ds_factor,
                retention=retention,
                seed=seed,
            )
            idx32 = idx.astype(np.int32)
            for j, g in enumerate(gs):
                pooled_out[g] = pooled[j].tolist()
                sel_out[g] = sel[j].tolist()
                idx_out[g] = idx32[j].tolist()
        for g in np.flatnonzero(lengths > 200):
            pooled, sel, idx = K.model_downsample(
                vals[bounds[g] : bounds[g + 1]],
                wavelet=wavelet,
                approx_ds_factor=approx_ds_factor,
                retention=retention,
                seed=seed,
            )
            pooled_out[g] = pooled.tolist()
            sel_out[g] = sel.tolist()
            idx_out[g] = idx.astype(np.int32).tolist()
        return pd.DataFrame(
            {
                "key": keys[bounds[:-1]],
                "window_start": ws[bounds[:-1]],
                "n": lengths.astype(np.int32),
                "pooled_approx": pooled_out,
                "detail_values": sel_out,
                "detail_indices": idx_out,
            }
        )

    # the model kernel never reads _ts/_ord — let apply_sorted prune them
    # off the Arrow hop (the sort they established is already done)
    frame_fn.needed_cols = ["key", "window_start", "_value"]
    return frame_fn


ATTN_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("window_start", TimestampType()),
        StructField("seg", IntegerType()),
        StructField("i", IntegerType()),
        StructField("n_cd", IntegerType()),
        StructField("k", IntegerType()),
        StructField("score", DoubleType()),
        StructField("sel", IntegerType()),
    ]
)


def attention_scores(
    df: DataFrame,
    window: str = "1 hour",
    key_col: str = "conv_id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_col: str | None = "turn_idx",
    wavelet: str = "db4",
    retention: float = 0.8,
    seed: int = 42,
    max_seg: int = 200,
    weights=None,
) -> DataFrame:
    """The model pipeline's attention RANKING stage exposed as rows — one
    row per (group, segment, detail-coefficient position) carrying the
    frozen scorer's softmax score and the kernel's top-k selection flag.

    This is the value-oracle seam for the one ingredient the model parity
    queries could only multiset-check: the attention importance ordering
    (/root/reference/core/downsampling_algorithm2.py:94-120).  Segmentation
    replicates :func:`kernels.model_downsample` exactly (groups <= max_seg
    run whole — even length-1 groups; longer groups split at max_seg with a
    trailing <2-point segment dropped), dwt + scoring run through the SAME
    batched kernels as the production model job (bit-equal to the scalar
    path by test), bucketed by segment length so each distinct length costs
    one numpy call chain regardless of group count.
    """

    def frame_fn(body: pd.DataFrame) -> pd.DataFrame:
        bounds, keys, ws = group_bounds(body)
        vals = K.sanitize(body["_value"].to_numpy(dtype=np.float64))
        gkey = keys[bounds[:-1]]
        gws = ws[bounds[:-1]]
        segs: list[tuple[int, int, np.ndarray]] = []
        for g in range(len(bounds) - 1):
            x = vals[bounds[g] : bounds[g + 1]]
            # segmentation comes from the ONE shared rule — this seam's
            # oracle validity depends on never diverging from the kernel
            for si, (a, b) in enumerate(K.segment_bounds(len(x), max_seg)):
                segs.append((g, si, x[a:b]))
        bylen: dict[int, list[tuple[int, int, np.ndarray]]] = {}
        for t in segs:
            bylen.setdefault(len(t[2]), []).append(t)
        frames: list[pd.DataFrame] = []
        for n_seg in sorted(bylen):
            items = bylen[n_seg]
            X = np.stack([t[2] for t in items])
            _, cD = wv.dwt(X, wavelet)
            S = K.attention_importance_batch(cD, seed=seed, weights=weights)
            m = cD.shape[1]
            k = max(1, int(round(m * retention)))
            order = np.argsort(-S, axis=1, kind="stable")[:, :k]
            selmask = np.zeros(S.shape, dtype=np.int32)
            np.put_along_axis(selmask, order, 1, axis=1)
            G = len(items)
            gs = np.array([t[0] for t in items])
            frames.append(
                pd.DataFrame(
                    {
                        "key": np.repeat(gkey[gs], m),
                        "window_start": np.repeat(gws[gs], m),
                        "seg": np.repeat(
                            np.array([t[1] for t in items], dtype=np.int32), m
                        ),
                        "i": np.tile(np.arange(m, dtype=np.int32), G),
                        "n_cd": np.full(G * m, m, dtype=np.int32),
                        "k": np.full(G * m, k, dtype=np.int32),
                        "score": S.ravel(),
                        "sel": selmask.ravel(),
                    }
                )
            )
        return pd.concat(frames, ignore_index=True)

    frame_fn.needed_cols = ["key", "window_start", "_value"]
    return sorted_group_map(
        df, window, key_col, ts_col, value_col, order_col, frame_fn, ATTN_SCHEMA
    )
