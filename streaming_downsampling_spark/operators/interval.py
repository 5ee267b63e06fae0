"""Interval (time-range containment) join, bin-bucketed for scale.

Spark has no native range join; the naive formulation
``left JOIN right ON l.ts BETWEEN r.start AND r.end`` plans as a
broadcast-nested-loop (O(N·M) at scale).  The scale shape used here is the
standard bin bucketing: explode each right-side interval into the fixed-width
time bins it covers, map each left row to its single bin, equi-join on
(key, bin), then filter exact containment.  The join shuffles on (key, bin) —
never a cross product; bin width should be near the median interval length
(wider → more false candidates per bin, narrower → more bins per interval).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .rollup import tier_seconds


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_start: str,
    right_end: str,
    bin: str = "1 hour",
) -> DataFrame:
    """Inner join: left rows matched to the right intervals containing them.

    Containment is half-open: ``start <= ts < end``.  Output: all left
    columns + all right columns except the key (which would collide).
    """
    # any '<N><unit>' duration — the shared tier parser, not a hardcoded
    # subset, so the bin width can actually track the median interval
    # length as the module docstring advises (e.g. '15 minutes')
    step = tier_seconds(bin)
    to_bin = lambda c: (F.unix_timestamp(c) / step).cast("long")  # noqa: E731
    l = left.withColumn("_bin", to_bin(F.col(left_ts)))
    # every bin the interval [start, end) touches; end exactly on a bin
    # boundary contributes a harmless extra candidate bin
    r = right.withColumn(
        "_bin",
        F.explode(
            F.sequence(to_bin(F.col(right_start)), to_bin(F.col(right_end)))
        ),
    )
    rcols = [c for c in right.columns if c != key]
    out = l.join(r, [key, "_bin"]).filter(
        (F.col(left_ts) >= F.col(right_start))
        & (F.col(left_ts) < F.col(right_end))
    )
    return out.select(*[F.col(c) for c in left.columns], *rcols)
