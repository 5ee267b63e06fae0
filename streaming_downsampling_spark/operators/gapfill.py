"""Gap-fill: dense time spine + LOCF / linear interpolation.

Replaces the reference's truncate/zero-pad schema enforcement
(/root/reference/main.py:44-48, /root/reference/core/streaming_pipeline.py:284-289)
with the time-series-native operation: a per-key dense grid of tier windows,
missing buckets filled by last-observation-carried-forward or
linear interpolation (the reconstruction semantics of
/root/reference/new_evaluation.py:185-198 expressed relationally).

Entirely built-in expressions — ``sequence`` + ``explode`` generates the
spine, two window functions fetch the bracketing known points, one projection
interpolates.  No Python in the path; Catalyst keeps the whole thing in
WholeStageCodegen except the two window sorts, which share a single
(key ORDER BY window_start) shuffle+sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .rollup import tier_seconds


def time_spine(rollup_df: DataFrame, tier: str, key: str = "key") -> DataFrame:
    """Per-key dense grid of window_start values spanning min..max.

    Generated in per-day slices (outer ``sequence`` over days, inner over
    ticks within each day): a single ``sequence(w0, w1, interval)`` holds the
    whole spine of a key in ONE array row — a multi-year key at the 1m tier
    is a ~10⁶-element array on one executor (and Spark hard-caps sequence
    length), whereas the sliced form bounds every array at 1440 elements and
    lets the explode stream.

    All grid arithmetic is on epoch seconds — the same 1970-anchored grid
    ``F.window`` aligns to — so the sliced spine equals the dense one in
    EVERY session timezone, including half-hour-offset and DST zones where
    local-midnight ``date_trunc('day')`` would fall off the tier grid
    (round-2 ADVICE).  NTZ inputs use ``timestampdiff/-add`` against the
    NTZ epoch literal (wall-clock arithmetic; a cast to TIMESTAMP would
    reinterpret through the session zone); true timestamps use
    ``unix_seconds``.  Asserted under a Kathmandu (+05:45) session in
    tests/test_round3.py.
    """
    step = tier_seconds(tier)
    # hand back the caller's window_start dtype (timestamp vs timestamp_ntz)
    # so the spine join needs no implicit coercion
    ws_type = dict(rollup_df.dtypes)["window_start"]
    if ws_type == "timestamp_ntz":
        # NTZ has no zone: a cast to TIMESTAMP would reinterpret via the
        # session timezone and shift the grid; timestampdiff/-add against
        # the NTZ epoch literal is wall-clock arithmetic, tz-independent
        def to_sec(c):
            return F.expr(
                f"timestampdiff(SECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', {c})"
            )

        def from_sec(c):
            return F.expr(
                f"timestampadd(SECOND, {c}, TIMESTAMP_NTZ'1970-01-01 00:00:00')"
            )

    else:

        def to_sec(c):
            return F.unix_seconds(F.col(c).cast("timestamp"))

        def from_sec(c):
            return F.timestamp_seconds(F.col(c))

    days = (
        rollup_df.groupBy(key)
        .agg(
            F.min("window_start").alias("w0"),
            F.max("window_start").alias("w1"),
        )
        .select(
            key,
            to_sec("w0").alias("s0"),
            to_sec("w1").alias("s1"),
        )
        .select(
            key,
            "s0",
            "s1",
            F.explode(
                F.sequence(
                    (F.floor(F.col("s0") / 86400) * 86400).cast("long"),
                    (F.floor(F.col("s1") / 86400) * 86400).cast("long"),
                    F.lit(86400),
                )
            ).alias("day_sec"),
        )
    )
    # Each day slice emits the epoch-grid ticks {t : t ≡ 0 (mod step)}
    # inside [day_sec, day_sec+86400) ∩ [s0, s1] — integer ceil/floor
    # division (epochs are non-negative here) anchors every slice to the
    # ABSOLUTE grid, so a step that does not divide 86400 (e.g. '7m')
    # stays on-grid across day boundaries (day-2's first tick is NOT
    # midnight), and a step longer than a day yields empty slices instead
    # of a stop < start sequence error.  For steps that DO divide 86400
    # this reduces exactly to greatest(day_sec, s0)..least(day_sec+86400-
    # step, s1), the previous form.
    start_tick = F.expr(
        f"((greatest(day_sec, s0) + {step - 1}) div {step}) * {step}"
    )
    stop_tick = F.expr(f"(least(day_sec + 86399, s1) div {step}) * {step}")
    return (
        days.select(
            key,
            F.explode(
                F.when(
                    start_tick <= stop_tick,
                    F.sequence(start_tick, stop_tick, F.lit(step)),
                ).otherwise(F.expr("array()").cast("array<bigint>"))
            ).alias("tick_sec"),
        )
        .select(
            key,
            from_sec("tick_sec").cast(ws_type).alias("window_start"),
        )
    )


def gapfill(
    rollup_df: DataFrame,
    tier: str,
    value_col: str = "avg_value",
    method: str = "linear",
    key: str = "key",
) -> DataFrame:
    """Fill missing tier buckets for ``value_col``.

    methods: ``locf`` (carry last known forward; trailing nulls backfilled),
    ``linear`` (interpolate between bracketing known points; edges clamp to
    nearest known — the endpoint-anchoring rule of
    /root/reference/new_evaluation.py:185-198), ``zero`` (the reference's
    literal pad-with-zero).

    Output: (key, window_start, value, filled:boolean).
    """
    spine = time_spine(rollup_df, tier, key=key)
    base = spine.join(
        rollup_df.select(key, "window_start", F.col(value_col).alias("_v")),
        [key, "window_start"],
        "left",
    )
    if method == "zero":
        return base.select(
            key,
            "window_start",
            F.coalesce("_v", F.lit(0.0)).alias("value"),
            F.col("_v").isNull().alias("filled"),
        )

    w_prev = (
        Window.partitionBy(key)
        .orderBy("window_start")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy(key)
        .orderBy("window_start")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    ts_long = F.unix_micros(F.col("window_start").cast("timestamp"))
    known_ts = F.when(F.col("_v").isNotNull(), ts_long)
    annotated = base.select(
        key,
        "window_start",
        "_v",
        F.last("_v", ignorenulls=True).over(w_prev).alias("prev_v"),
        F.last(known_ts, ignorenulls=True).over(w_prev).alias("prev_t"),
        F.first("_v", ignorenulls=True).over(w_next).alias("next_v"),
        F.first(known_ts, ignorenulls=True).over(w_next).alias("next_t"),
    )
    if method == "locf":
        value = F.coalesce("prev_v", "next_v")
    elif method == "linear":
        t = F.unix_micros(F.col("window_start").cast("timestamp"))
        frac = (t - F.col("prev_t")) / (F.col("next_t") - F.col("prev_t"))
        interp = F.col("prev_v") + (F.col("next_v") - F.col("prev_v")) * frac
        value = (
            F.when(F.col("_v").isNotNull(), F.col("_v"))
            .when(F.col("prev_v").isNull(), F.col("next_v"))
            .when(F.col("next_v").isNull(), F.col("prev_v"))
            .otherwise(interp)
        )
    else:
        raise ValueError(f"unknown gapfill method {method!r}")
    return annotated.select(
        key,
        "window_start",
        value.alias("value"),
        F.col("_v").isNull().alias("filled"),
    )
