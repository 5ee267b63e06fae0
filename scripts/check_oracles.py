"""Local replica of the driver's correctness gate.

Runs every QUERIES entry on Spark and its ORACLES SQL on DuckDB at the given
sf_dir, compares row count, sorted column names, and an order-insensitive
value hash (values normalized to strings, rows sorted).  Prints one line per
query.  Exit 1 on any mismatch.
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if s.dtype == object and len(s) and isinstance(s.iloc[0], (list, tuple)):
            df[c] = s.map(lambda v: str(list(v)))
        elif "datetime" in str(s.dtype):
            df[c] = pd.to_datetime(s).dt.strftime("%Y-%m-%d %H:%M:%S.%f")
        elif s.dtype == "float64" or s.dtype == "float32":
            df[c] = s.map(lambda v: f"{v:.9g}")
        else:
            df[c] = s.astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def value_hash(df: pd.DataFrame) -> str:
    return hashlib.md5(
        df.to_csv(index=False).encode()
    ).hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2:] or None

    from streaming_downsampling_spark.queries import ORACLES, QUERIES
    from streaming_downsampling_spark.session import get_spark

    spark = get_spark(cpus=16)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    failures = 0
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures += 1
            continue
        if name not in ORACLES:
            print(f"ok-   {name}: rows={len(got)} (rows-only, {time.time()-t0:.1f}s)")
            if len(got) == 0 and name != "minhash_lsh":
                print(f"      WARNING: zero rows")
            continue
        try:
            exp = con.sql(ORACLES[name]).fetchdf()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            failures += 1
            continue
        problems = []
        if len(got) != len(exp):
            problems.append(f"rows {len(got)} != {len(exp)}")
        if sorted(got.columns) != sorted(exp.columns):
            problems.append(f"cols {sorted(got.columns)} != {sorted(exp.columns)}")
        if not problems:
            ng, ne = normalize(got), normalize(exp)
            if value_hash(ng) != value_hash(ne):
                diff = (ng != ne).any(axis=1)
                problems.append(f"value hash mismatch ({int(diff.sum())} differing rows)")
                ex = pd.concat(
                    [ng[diff].head(3).add_prefix("got_"), ne[diff].head(3).add_prefix("exp_")],
                    axis=1,
                )
                print(ex.to_string())
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)}")
            failures += 1
        else:
            print(f"OK    {name}: rows={len(got)} ({time.time()-t0:.1f}s)")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
