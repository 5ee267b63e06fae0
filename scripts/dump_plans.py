"""Dump .explain('formatted') for catalog queries to plans/<tag>/<name>.txt.

Usage: python scripts/dump_plans.py <tag> <suffix> [query ...]
e.g.   python scripts/dump_plans.py r06 before token_count minhash_lsh
Writes plans/r06/token_count_before.txt etc.  SPARK_GRAFT_SF_DIR selects the
data (default /root/testdata/sf1.0) — plan shape, not timing, so any sf works.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")

    from streaming_downsampling_spark.queries import QUERIES
    from streaming_downsampling_spark.session import get_spark

    spark = get_spark(app_name="dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")
    spark.stop()


if __name__ == "__main__":
    main()
