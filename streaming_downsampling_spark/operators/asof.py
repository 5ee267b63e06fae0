"""As-of (most-recent-match) join — the canonical time-series enrichment op.

The reference has no relational joins at all (SURVEY.md §2.5); an as-of join
is what its "attach latest model/stats to each record" closure capture
(/root/reference/core/streaming_pipeline.py:194-257) looks like as a
distributed operator: for each left row, the single right row with the
greatest ``right_ts <= left_ts`` for the same key.

Physical shape — the union-sort trick, ONE shuffle, no range cross-join:

    tag(left) ∪ tag(right)
      → window last(right_val, ignorenulls) over
          (partition by key order by ts, is_right desc
           rows unbounded preceding .. current row)
      → filter left rows

Right rows at an equal timestamp sort *before* left rows, so the match is
inclusive (``right_ts <= left_ts``), same as DuckDB/pandas ``merge_asof``
backward.  At scale this is a single hash shuffle on the key plus an
in-partition sort — no point-in-interval explosion, skew bounded by the
hottest key (salt upstream if one key dominates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of left join.

    Every ``left`` row gains ``<col><suffix>`` for each of ``right_cols`` and
    ``<right_ts><suffix>`` (the matched right timestamp), from the latest
    right row with ``right_ts <= left_ts`` on the same ``key_col``; nulls
    when no right row precedes the left row.
    """
    lcols = left.columns
    l_tagged = left.select(
        *lcols,
        F.lit(1).alias("_is_left"),
        F.col(left_ts).alias("_t"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in right_cols],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("_r_ts"),
    )
    r_tagged = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c != key_col],
        F.col(key_col),
        F.lit(0).alias("_is_left"),
        F.col(right_ts).alias("_t"),
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
        F.col(right_ts).alias("_r_ts"),
    ).select(*lcols, "_is_left", "_t", *[f"_r_{c}" for c in right_cols], "_r_ts")
    u = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col("_t").asc(), F.col("_is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        *lcols,
        "_is_left",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in right_cols
        ],
        F.last("_r_ts", ignorenulls=True).over(w).alias(f"{right_ts}{suffix}"),
    )
    return filled.filter(F.col("_is_left") == 1).drop("_is_left")
