"""As-of (most-recent-match) join — the canonical time-series enrichment op.

The reference has no relational joins at all (SURVEY.md §2.5); an as-of join
is what its "attach latest model/stats to each record" closure capture
(/root/reference/core/streaming_pipeline.py:194-257) looks like as a
distributed operator: for each left row, the single right row with the
greatest ``right_ts <= left_ts`` for the same key.

Physical shape — the union-sort trick, ONE shuffle, no range cross-join:

    tag(left) ∪ tag(right)
      → window last(right_row_struct, ignorenulls) over
          (partition by key order by ts, is_right desc
           rows unbounded preceding .. current row)
      → filter left rows → unpack struct fields

The matched right row is carried as ONE nullable struct, so the whole row
matches atomically: a matched row whose payload column is NULL yields NULL
(exactly like pandas ``merge_asof`` / DuckDB ASOF), instead of skipping back
to a stale older row — and all output columns always come from the same
right row (no torn rows).

Right rows at an equal timestamp sort *before* left rows, so the match is
inclusive (``right_ts <= left_ts``).  Several right rows sharing (key, ts)
have no defined winner under the raw union-sort; pass ``dedup_ties=True``
to resolve ties deterministically (greatest right row by lexicographic
``right_cols`` order — one map-combined aggregate, no extra shuffle
granularity) or pre-deduplicate the right side yourself.
At scale this is a single hash shuffle on the key plus an in-partition
sort — no point-in-interval explosion, skew bounded by the hottest key
(salt upstream if one key dominates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_TS_FIELD = "__rts"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    suffix: str = "_asof",
    dedup_ties: bool = False,
    tolerance: str | None = None,
) -> DataFrame:
    """Backward as-of left join.

    Every ``left`` row gains ``<col><suffix>`` for each of ``right_cols`` and
    ``<right_ts><suffix>`` (the matched right timestamp), from the latest
    right row with ``right_ts <= left_ts`` on the same ``key_col``; nulls
    when no right row precedes the left row.

    ``tolerance`` (an interval string, e.g. ``"2 hours"``) bounds how stale
    a match may be — matches older than ``left_ts − tolerance`` become
    nulls, the ``merge_asof(tolerance=...)`` semantics.  A post-projection
    on the atomic matched struct: no plan change, no extra shuffle.

    ``dedup_ties=True`` makes duplicate (key, right_ts) right rows
    well-defined: the greatest row by lexicographic ``right_cols`` order
    wins (deterministic across runs and partitionings).  Off by default —
    a right side that is already unique per (key, ts) pays nothing.

    Raises ``ValueError`` when an output or internal working column would
    collide with an existing left column.
    """
    lcols = left.columns
    internal = {"_is_left", "_t", "_r"}
    clash = internal & set(lcols)
    if clash:
        raise ValueError(f"left columns collide with asof internals: {sorted(clash)}")
    if _TS_FIELD in right_cols:
        raise ValueError(f"right_cols may not contain reserved name {_TS_FIELD!r}")
    out_names = [f"{c}{suffix}" for c in right_cols] + [f"{right_ts}{suffix}"]
    dup = sorted({n for n in out_names if n in lcols} | {n for n in out_names if out_names.count(n) > 1})
    if dup:
        raise ValueError(
            f"asof output columns {dup} collide with left columns or each other; "
            f"pass a different suffix"
        )

    if dedup_ties:
        # one deterministic winner per (key, right_ts): greatest right row
        # by lexicographic right_cols order — partial-aggregated map-side,
        # same shuffle key as the join itself
        rs = F.struct(*[F.col(c) for c in right_cols])
        right = (
            right.groupBy(key_col, right_ts)
            .agg(F.max(rs).alias("_rs"))
            .select(
                key_col,
                right_ts,
                *[F.col("_rs")[c].alias(c) for c in right_cols],
            )
        )

    # one nullable struct = the whole matched right row (atomic match)
    r_tagged = right.select(
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
            if c != key_col
        ],
        F.col(key_col),
        F.lit(0).alias("_is_left"),
        F.col(right_ts).alias("_t"),
        F.struct(
            *[F.col(c) for c in right_cols], F.col(right_ts).alias(_TS_FIELD)
        ).alias("_r"),
    ).select(*lcols, "_is_left", "_t", "_r")
    r_type = r_tagged.schema["_r"].dataType
    l_tagged = left.select(
        *lcols,
        F.lit(1).alias("_is_left"),
        F.col(left_ts).alias("_t"),
        F.lit(None).cast(r_type).alias("_r"),
    )
    u = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col("_t").asc(), F.col("_is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.select(
        *lcols, "_is_left", F.last("_r", ignorenulls=True).over(w).alias("_m")
    )
    out_m = F.col("_m")
    if tolerance is not None:
        out_m = F.when(
            F.col("_m")[_TS_FIELD]
            >= F.col(left_ts) - F.expr(f"INTERVAL {tolerance}"),
            F.col("_m"),
        )
    return (
        matched.filter(F.col("_is_left") == 1)
        .select(
            *lcols,
            *[out_m[c].alias(f"{c}{suffix}") for c in right_cols],
            out_m[_TS_FIELD].alias(f"{right_ts}{suffix}"),
        )
    )
