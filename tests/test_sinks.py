"""PNG plot sink (S10) and live monitor (S11): the two presentation-edge
sinks, dependency-free (stdlib zlib/struct PNG, stdlib http.server)."""

from __future__ import annotations

import datetime as dt
import json
import urllib.request

import numpy as np
import pandas as pd


def test_png_roundtrip_pixel_exact():
    from streaming_downsampling_spark.sinks.plot import decode_png, png_bytes

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(40, 60, 3), dtype=np.uint8)
    assert (decode_png(png_bytes(img)) == img).all()


def test_render_series_draws_line_and_marks():
    from streaming_downsampling_spark.sinks.plot import (
        LINE,
        MARK,
        render_series,
    )

    xs = np.arange(50, dtype=float)
    ys = np.sin(xs / 5.0)
    img = render_series(xs, ys, xs[::10], ys[::10], width=200, height=100)
    flat = img.reshape(-1, 3)
    assert (flat == np.array(LINE)).all(axis=1).any(), "no line pixels"
    assert (flat == np.array(MARK)).all(axis=1).any(), "no mark pixels"
    # marks sit ON the curve they annotate: every mark block overlaps
    n_mark = int((flat == np.array(MARK)).all(axis=1).sum())
    assert n_mark >= 5 * 25 * 0.5  # 5 marks x 5x5 blocks, some clipped


def test_plot_sink_writes_valid_pngs(spark, tmp_path):
    from streaming_downsampling_spark.operators.downsample import (
        downsample_select,
    )
    from streaming_downsampling_spark.sinks.plot import decode_png, plot_downsampled

    base = dt.datetime(2024, 1, 1)
    rows = [
        (k, base + dt.timedelta(minutes=i), float(np.sin(i / 7.0) * 10 + 50), i)
        for k in ("alpha", "beta")
        for i in range(120)
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["key", "ts", "value", "turn_idx"])
    )
    sel = downsample_select(
        df, "lttb", 20, window="1 day", key_col="key",
        ts_col="ts", value_col="value", order_col="turn_idx",
    )
    paths = plot_downsampled(df, str(tmp_path), selected=sel)
    assert [p.rsplit("/", 1)[1] for p in paths] == ["alpha.png", "beta.png"]
    for p in paths:
        img = decode_png(open(p, "rb").read())
        assert img.shape == (300, 800, 3)
        assert (img != 255).any()  # something was drawn


def test_live_monitor_serves_payload():
    from streaming_downsampling_spark.sinks.monitor import LiveMonitor

    state = {"n": 0}

    def payload():
        state["n"] += 1
        return {"points": [1, 2, 3], "calls": state["n"]}

    mon = LiveMonitor(payload).start()
    try:
        page = urllib.request.urlopen(mon.url + "/", timeout=10).read()
        assert b"monitor" in page and b"data.json" in page
        d1 = json.loads(
            urllib.request.urlopen(mon.url + "/data.json", timeout=10).read()
        )
        d2 = json.loads(
            urllib.request.urlopen(mon.url + "/data.json", timeout=10).read()
        )
        assert d1["points"] == [1, 2, 3]
        assert d2["calls"] == d1["calls"] + 1  # live, not cached
    finally:
        mon.stop()


def test_monitor_table_payload_bridges_spark(spark):
    from streaming_downsampling_spark.sinks.monitor import (
        LiveMonitor,
        table_payload,
    )

    pd_df = pd.DataFrame(
        {"k": ["a", "b"], "v": [1.5, 2.5], "ts": [dt.datetime(2024, 1, 1)] * 2}
    )
    spark.createDataFrame(pd_df).createOrReplaceTempView("mon_tbl")
    mon = LiveMonitor(table_payload(spark, "mon_tbl")).start()
    try:
        got = json.loads(
            urllib.request.urlopen(mon.url + "/data.json", timeout=30).read()
        )
        assert sorted(r["k"] for r in got) == ["a", "b"]
        assert got[0]["ts"].startswith("2024-01-01")
    finally:
        mon.stop()
