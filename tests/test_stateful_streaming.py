"""Custom stateful streaming operators: cross-batch state correctness."""

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from streaming_downsampling_spark.streaming.stateful import (
    stateful_tier_stream,
    streaming_last_n,
)

TS = pa.timestamp("us", tz="UTC")


def _write_batches(tmp_path, batches):
    """One parquet file per batch → maxFilesPerTrigger=1 yields one
    micro-batch per file, so state must carry across them."""
    src = tmp_path / "src"
    os.makedirs(src)
    schema = pa.schema(
        [("conv_id", pa.string()), ("ts", TS), ("turn_idx", pa.int64()), ("value", pa.float64())]
    )
    for i, rows in enumerate(batches):
        pdf = pd.DataFrame(rows, columns=["conv_id", "ts", "turn_idx", "value"])
        pdf["ts"] = pd.to_datetime(pdf["ts"], utc=True)
        pq.write_table(pa.Table.from_pandas(pdf, schema=schema), str(src / f"b{i}.parquet"))
    return str(src), "conv_id string, ts timestamp, turn_idx long, value double"


def _run_bounded(spark, src, schema, op, name):
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        op(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}").toPandas()


def test_stateful_tier_first_last_across_batches(spark, tmp_path):
    """First-by-order arrives in batch 1, last-by-order in batch 2, same 1h
    window — only carried state can get both right."""
    b1 = [
        ("c1", "2024-01-01 10:05:00", 2, 20.0),
        ("c1", "2024-01-01 10:10:00", 1, 11.0),  # first by turn order
        ("c2", "2024-01-01 10:00:00", 5, 50.0),
    ]
    b2 = [
        ("c1", "2024-01-01 10:20:00", 7, 70.0),  # last by turn order
        ("c1", "2024-01-01 10:25:00", 3, 30.0),
        ("c2", "2024-01-01 10:30:00", 4, 40.0),  # earlier order than 5
    ]
    src, schema = _write_batches(tmp_path, [b1, b2])
    out = _run_bounded(
        spark, src, schema,
        lambda s: stateful_tier_stream(s, "1h", watermark="3650 days"),
        "tier_state_t1",
    )
    # memory sink in update mode appends every update — keep the final one
    final = (
        out.sort_values("n_points").groupby(["key", "window_start"]).last().reset_index()
    )
    c1 = final[final["key"] == "c1"].iloc[0]
    assert c1["n_points"] == 4
    assert c1["first_value"] == 11.0 and c1["last_value"] == 70.0
    assert c1["min_value"] == 11.0 and c1["max_value"] == 70.0
    assert c1["sum_value"] == pytest.approx(131.0)
    c2 = final[final["key"] == "c2"].iloc[0]
    assert c2["first_value"] == 40.0 and c2["last_value"] == 50.0


def test_streaming_last_n_lagging_key_not_dropped(spark, tmp_path):
    """A watermark on the ring is GLOBAL (max event time over ALL keys), so
    a fast key used to push the watermark past a lagging key's event times
    and Spark silently filtered the laggard's rows before its ring —
    streaming_last_n therefore defaults to NO watermark (NoTimeout state
    needs none).  Fast key 'a' runs hours ahead; lagging key 'b' delivers
    batch-2 rows 3 h behind 'a' — they must still land in b's ring."""
    base = pd.Timestamp("2024-01-01 00:00:00", tz="UTC")
    b1 = [("a", base + pd.Timedelta(hours=5), 1, 1.0),
          ("b", base, 1, 10.0)]
    b2 = [("a", base + pd.Timedelta(hours=6), 2, 2.0),
          ("b", base + pd.Timedelta(minutes=1), 2, 20.0),
          ("b", base + pd.Timedelta(minutes=2), 3, 30.0)]
    src, schema = _write_batches(tmp_path, [b1, b2])
    out = _run_bounded(
        spark, src, schema,
        lambda s: streaming_last_n(s, n=15),
        "lastn_lag_t1",
    )
    final = out.sort_values("n_seen").groupby("key").last().reset_index()
    b = final[final["key"] == "b"].iloc[0]
    assert b["n_seen"] == 3, "lagging key's late batch was dropped"
    assert list(b["buf_values"]) == [10.0, 20.0, 30.0]


def test_streaming_last_n_ring(spark, tmp_path):
    """The deque(maxlen=N) monitor buffer: ring spans batches, truncates to
    the latest N by timestamp, n_seen counts everything."""
    base = pd.Timestamp("2024-01-01 00:00:00", tz="UTC")
    b1 = [("c1", base + pd.Timedelta(minutes=i), i, float(i)) for i in range(10)]
    b2 = [("c1", base + pd.Timedelta(minutes=i), i, float(i)) for i in range(10, 20)]
    src, schema = _write_batches(tmp_path, [b1, b2])
    out = _run_bounded(
        spark, src, schema,
        lambda s: streaming_last_n(s, n=15),
        "lastn_t1",
    )
    final = out.sort_values("n_seen").groupby("key").last().reset_index().iloc[0]
    assert final["n_seen"] == 20
    assert list(final["buf_values"]) == [float(i) for i in range(5, 20)]
    # ring holds the LATEST 15 in ts order
    assert list(final["buf_ts"]) == sorted(final["buf_ts"])
