"""Round-5 regression tests: the round-4 ADVICE fixes and verdict items."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


def test_merge_upsert_empty_string_partition(spark, tmp_path):
    """Round-4 ADVICE (medium): Spark's ``partitionBy`` writes BOTH NULL and
    the empty string to ``__HIVE_DEFAULT_PARTITION__`` (manifest key
    'None'), but the touched-value set kept '' as-is — so a batch carrying
    an empty-string partition value skipped the anti-join for that
    partition and committed duplicate keys (the same failure class as the
    round-3 boolean repr miss).  This is that exact scenario."""
    from streaming_downsampling_spark.sources.tables import Warehouse

    wh = Warehouse(spark, str(tmp_path / "wh_empty"))
    base = spark.createDataFrame(
        [(1, "", 10.0), (2, "", 20.0), (3, "a", 30.0), (4, None, 40.0)],
        "id long, part string, v double",
    )
    wh.overwrite("et", base, partition_by="part")
    upd = spark.createDataFrame(
        [(1, "", 11.0), (4, None, 41.0), (5, "a", 50.0)],
        "id long, part string, v double",
    )
    wh.merge_upsert("et", upd, keys=["id"], partition_by="part")
    rows = wh.read("et").collect()
    got = {r["id"]: r["v"] for r in rows}
    assert len(rows) == 5, (
        f"duplicate keys committed: empty-string partition repr mismatch "
        f"({sorted((r['id'], r['v']) for r in rows)})"
    )
    assert got[1] == 11.0 and got[4] == 41.0 and got[5] == 50.0
    assert got[2] == 20.0 and got[3] == 30.0
