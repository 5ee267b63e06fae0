"""Replay-determinism check for every stream-driven catalog query.

The round-5 stateful_tier flake (fixed in a4f4f96) was this failure class:
the bounded drive's file-replay order depended on concurrent-write mtime
luck, so a real watermark could jump ahead under host-load shifts and
silently drop earlier batches.  The fix made replay deterministically
ts-ascending; this script is the regression harness for the whole class —
it runs every stream-driven catalog query ``reps`` times and fails unless
each produces a bit-identical (sorted-row, stringified) result hash every
time.  Run it twice more in separate processes under CPU load to cover the
cross-JVM case (see BENCH.md "Stream-drive replay determinism").

Usage: python scripts/stream_stability.py [reps] [sf_dir]
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STREAM_DRIVEN = [
    "stream_sessionize",
    "stateful_tier",
    "stream_rollup_1h",
    "stream_tier_cascade",
    "stateful_last_n",
    "stream_static_enrich",
    "stream_dedup",
    "compaction_roundtrip",
    "json_roundtrip",
]


def main() -> int:
    from streaming_downsampling_spark.queries import QUERIES
    from streaming_downsampling_spark.session import get_spark

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="stream-stability", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    bad = 0
    for name in STREAM_DRIVEN:
        hashes = []
        for _ in range(reps):
            pdf = QUERIES[name](spark, sf_dir).toPandas()
            pdf = pdf[sorted(pdf.columns)]
            rows = sorted(
                tuple(str(v) for v in row)
                for row in pdf.itertuples(index=False)
            )
            hashes.append(
                (hashlib.md5(repr(rows).encode()).hexdigest()[:12], len(rows))
            )
        stable = len(set(hashes)) == 1
        bad += 0 if stable else 1
        print(("OK    " if stable else "FLAKE ") + name, hashes, flush=True)
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
