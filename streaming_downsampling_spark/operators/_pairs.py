"""Shared in-bucket pair expansion for the bucketed candidate generators.

Every LSH-style generator (text MinHash bands, SimHash blocks, hyperplane
embedding buckets) ends the same way: a grouped row holds a sorted array of
bucket members and must emit every ordered combination (i < j) of them.
The 1-based ``slice(items, i + 2, ...)`` index walk is easy to get subtly
wrong, so it lives HERE once; callers only supply the per-pair payload.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, functions as F


def in_bucket_pairs(
    buckets: DataFrame,
    pair_struct: Callable[[Column, Column], Column],
    items_col: str = "items",
) -> DataFrame:
    """Expand each bucket row's sorted ``items_col`` array into ordered
    combinations: one output row per (x, y) with x before y in the array.

    ``pair_struct(x, y)`` builds the output struct for one pair; its fields
    become the result columns.  Because callers sort ``items`` with the id
    as the leading struct field (or sort a plain id array), "x before y"
    is "id_x < id_y" by construction — no post-hoc orientation pass.
    """
    pair = F.explode(
        F.flatten(
            F.transform(
                F.col(items_col),
                lambda x, i: F.transform(
                    F.slice(F.col(items_col), i + 2, F.size(F.col(items_col))),
                    lambda y: pair_struct(x, y),
                ),
            )
        )
    )
    return buckets.select(pair.alias("p")).select("p.*")
