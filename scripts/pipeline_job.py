"""spark-submit entry point for the transcript pipeline (north-rule run mode).

Submit with the package shipped as --py-files, e.g.:

    python scripts/make_pyfiles_zip.py            # -> dist/sds.zip
    spark-submit --master local[8]  --py-files dist/sds.zip \
        scripts/pipeline_job.py --sf 20
    spark-submit --master local[32] --py-files dist/sds.zip \
        scripts/pipeline_job.py --sf 20

On a real cluster the master/deploy-mode flags change; nothing in the job
does.  The job imports ONLY from the shipped package (no repo-root sys.path
games), proving the zip is self-contained.  Prints one JSON line with
throughput, suitable for the two-cluster-size scaling comparison.
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=20.0)
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    args = ap.parse_args()

    import os

    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
        os.environ.setdefault(var, "1")

    from pyspark.sql import SparkSession, functions as F

    # master/cores come from spark-submit; only tune SQL conf here
    b = SparkSession.builder.appName("sds-pipeline")
    b = b.config("spark.sql.adaptive.enabled", "true")
    b = b.config("spark.sql.execution.arrow.pyspark.enabled", "true")
    b = b.config("spark.sql.session.timeZone", "UTC")
    spark = b.getOrCreate()
    cores = spark.sparkContext.defaultParallelism
    spark.conf.set(
        "spark.sql.shuffle.partitions",
        str(args.shuffle_partitions or max(cores, 8)),
    )
    spark.sparkContext.setLogLevel("ERROR")

    from streaming_downsampling_spark.datagen import transcripts_df
    from streaming_downsampling_spark.operators.compress import compress_chunks
    from streaming_downsampling_spark.operators.downsample import downsample_model
    from streaming_downsampling_spark.operators.gapfill import gapfill
    from streaming_downsampling_spark.operators.rollup import (
        cascade,
        rollup,
        with_signal,
    )

    df = (
        with_signal(transcripts_df(spark, sf=args.sf))
        .select("conv_id", "turn_idx", "ts", "value")
        .repartition(2 * cores)
        .persist()
    )
    n_turns = df.count()
    t0 = time.time()
    r1m = rollup(df, "1m")
    r1h = cascade(r1m, "1h")
    r1d = cascade(r1h, "1d")
    total = r1d.agg(F.sum("n_points")).collect()[0][0]
    gapfill(r1h, "1h", method="linear").agg(F.count(F.lit(1))).collect()
    downsample_model(df, window="1 day").agg(F.count(F.lit(1))).collect()
    compress_chunks(df, window="1 day").agg(F.sum("enc_bytes")).collect()
    elapsed = time.time() - t0
    assert total == n_turns, f"tier total {total} != input {n_turns}"
    print(
        json.dumps(
            {
                "job": "pipeline_job",
                "cores": cores,
                "sf": args.sf,
                "turns": n_turns,
                "sec": round(elapsed, 3),
                "turns_per_sec": round(n_turns / elapsed, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
