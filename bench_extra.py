"""Per-query noop-sink isolation bench (guide §1.4) — NOT the driver metric.

``bench.py`` is frozen for measurement; this harness exists for the
optimization loop: it times any subset of catalog queries (or the transcript
pipeline) with the same noop-sink methodology, one warm-up pass plus N timed
passes, and prints per-query medians.

Usage:
    python bench_extra.py [-n PASSES] [query ...]
    python bench_extra.py transcript_pipeline      # the bench.py pipeline fn
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf1.0), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    args = sys.argv[1:]
    passes = 3
    if args and args[0] == "-n":
        passes = int(args[1])
        args = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])

    from streaming_downsampling_spark.queries import QUERIES
    from streaming_downsampling_spark.session import get_spark

    names = args or list(QUERIES)
    spark = get_spark(app_name="bench-extra", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    import bench

    per: dict[str, list[float]] = {}
    for p in range(passes + 1):  # pass 0 is warm-up
        for name in names:
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            if name == "transcript_pipeline":
                _, dt = bench.transcript_pipeline(spark, max(sf * 200, 1.0))
            else:
                QUERIES[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                dt = time.time() - t0
            spark.sparkContext.setJobDescription(None)
            if p > 0:
                per.setdefault(name, []).append(round(dt, 3))
    med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
    print(json.dumps({
        "sf": sf,
        "medians": {n: med(ts) for n, ts in per.items()},
        "samples": per,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
