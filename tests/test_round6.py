"""Round-6 optimization guards: every rewritten operator/query formulation
is asserted equivalent to the formulation it replaced, on adversarial
inputs the fixed testdata may not cover, plus plan-shape checks for the
structural rewrites."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import Window, functions as F


@pytest.fixture(scope="module")
def spark():
    from streaming_downsampling_spark.session import get_spark

    s = get_spark(app_name="test-round6", cpus=4, shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


ADVERSARIAL_TEXTS = [
    "",
    " ",
    "\t\n\x0b\f\r",
    "word",
    "two words",
    "a  b\t c\nd",
    "...!!!???",
    "tab\tsep\tvals  and.more,stuff;here",
    "ünïcödé wörds with ascii123 mixed),(",
    "nbsp is-not-java-ws but emspace neither",
    "ends with space ",
    " starts with space",
    "number 123abc456 mixes",
    "x" * 500,
    ("repeat me " * 60).strip(),
]


def test_token_count_equals_old_formulation(spark):
    """regexp_count/translate counts == the old split/filter/replace counts
    char-for-char, including non-ASCII and exotic whitespace (Java's \\s is
    the six chars the translate set enumerates; everything else — NBSP, em
    space — is 'other' under BOTH formulations)."""
    from streaming_downsampling_spark.operators.text import token_count

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(ADVERSARIAL_TEXTS)], ["doc_id", "text"]
    )
    got = token_count(df).toPandas().sort_values("doc_id").reset_index(drop=True)
    t = F.col("text")
    old_tokens = F.size(
        F.filter(F.split(F.trim(t), r"\s+"), lambda x: x != F.lit(""))
    )
    old_sub = F.size(
        F.filter(F.split(t, r"[^A-Za-z0-9]+"), lambda x: x != F.lit(""))
    ) + F.length(F.regexp_replace(t, r"[A-Za-z0-9\s]", ""))
    exp = (
        df.select(
            "doc_id",
            old_tokens.cast("long").alias("n_tokens"),
            old_sub.cast("long").alias("n_subwords"),
            F.length("text").cast("long").alias("n_chars"),
        )
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp)


def test_shingles_equal_old_slice_join_formulation(spark):
    """concat_ws(get...) grams == array_join(slice...) grams byte-for-byte,
    including texts with 0/1/2 words and the empty-text '' shingle."""
    from streaming_downsampling_spark.operators.dedup import shingles

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(ADVERSARIAL_TEXTS)], ["doc_id", "text"]
    )
    for n in (2, 3, 5):
        got = (
            shingles(df, n=n)
            .groupBy("doc_id")
            .agg(F.sort_array(F.collect_list("shingle")).alias("s"))
            .toPandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        words = F.filter(
            F.split(F.trim(F.col("text")), r"\s+"), lambda x: x != F.lit("")
        )
        idx = F.sequence(F.lit(0), F.greatest(F.size(words) - n, F.lit(0)))
        grams = F.transform(
            idx, lambda i: F.array_join(F.slice(words, i + 1, n), " ")
        )
        exp = (
            df.select("doc_id", F.explode(F.array_distinct(grams)).alias("shingle"))
            .groupBy("doc_id")
            .agg(F.sort_array(F.collect_list("shingle")).alias("s"))
            .toPandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, exp)


def test_ewma_literal_weights_equal_pow(spark):
    """The literal 2^-k weight array is bit-identical to per-element
    pow(0.5, i+1): same fold, same rounding, on random per-user series."""
    rng = np.random.default_rng(6)
    n = 400
    pdf = pd.DataFrame(
        {
            "event_id": np.arange(n),
            "user_id": rng.integers(0, 5, n),
            "ts": pd.to_datetime(rng.integers(0, 10**6, n), unit="s"),
            "value": np.round(rng.normal(100, 40, n), 2),
        }
    )
    df = spark.createDataFrame(pdf)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-63, 0)
    arr = F.reverse(F.collect_list("value").over(w))
    weights = F.lit([0.5 ** (j + 1) for j in range(64)])
    new = F.aggregate(
        F.transform("arr", lambda x, i: x * F.element_at(weights, i + 1)),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    old = F.aggregate(
        F.transform("arr", lambda x, i: x * F.pow(F.lit(0.5), i + 1)),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    diff = (
        df.withColumn("arr", arr)
        .select((new != old).alias("d"))
        .filter("d")
        .count()
    )
    assert diff == 0


def test_haar_lead_pairing_equals_groupby_pairing(spark):
    """lead()-based Haar pairing == the min_by/max_by groupBy pairing on
    random daily series, including odd-length (trailing unpaired day)."""
    rng = np.random.default_rng(9)
    rows = []
    for u in range(12):
        for d in range(int(rng.integers(1, 9))):
            rows.append((u, d, round(float(rng.normal(0, 10)), 6)))
    daily = spark.createDataFrame(rows, ["user_id", "d", "v"])
    wn = Window.partitionBy("user_id").orderBy("d")
    numbered = daily.withColumn("rn", F.row_number().over(wn).cast("long"))
    new = (
        numbered.withColumn("v2", F.lead("v").over(wn))
        .filter((F.col("rn") % 2 == 1) & F.col("v2").isNotNull())
        .select(
            "user_id",
            F.expr("(rn - 1) div 2").alias("pair_id"),
            F.round((F.col("v") - F.col("v2")) / F.sqrt(F.lit(2.0)), 6).alias("cd"),
        )
    )
    old = (
        numbered.withColumn("pair_id", F.expr("(rn - 1) div 2"))
        .groupBy("user_id", "pair_id")
        .agg(
            F.min_by("v", "rn").alias("v1"),
            F.max_by("v", "rn").alias("v2"),
            F.count(F.lit(1)).alias("c"),
        )
        .filter(F.col("c") == 2)
        .select(
            "user_id",
            "pair_id",
            F.round((F.col("v1") - F.col("v2")) / F.sqrt(F.lit(2.0)), 6).alias("cd"),
        )
    )
    g = new.orderBy("user_id", "pair_id").toPandas()
    e = old.orderBy("user_id", "pair_id").toPandas()
    pd.testing.assert_frame_equal(g, e)


def test_asof_enrich_plan_has_no_full_table_window(spark, tmp_path):
    """The as-of queries must never sort the raw table into a
    low-cardinality window again: the only Window sits above the tier
    aggregate, and the join back to the raw scan is a broadcast hash
    join."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(4)
    n = 3000
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(n), pa.int64()),
            "ts": pa.array(
                np.sort(rng.integers(0, 30 * 86400, n)) * 10**6,
                pa.timestamp("us", tz="UTC"),
            ),
            "user_id": pa.array(rng.integers(0, 50, n), pa.int64()),
            "event_type": pa.array(
                np.array(["a", "b", "c"])[rng.integers(0, 3, n)]
            ),
            "value": pa.array(np.round(rng.normal(50, 10, n), 2)),
            "props": pa.array(["{}"] * n),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    from streaming_downsampling_spark.queries import QUERIES

    for name in ("asof_enrich", "asof_tolerance"):
        df = QUERIES[name](spark, str(tmp_path))
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        assert "BroadcastHashJoin" in plan, name
        # the raw-table side of the broadcast join must be a bare scan:
        # no Sort/Window between the events scan and the join probe
        lines = plan.splitlines()
        tree = [ln for ln in lines if "(" in ln and ")" in ln][:40]
        join_side = "\n".join(tree)
        # window exists only above the (tiny) hourly aggregate
        assert join_side.count("Window") <= 1, name


def test_top_revenue_preagg_equals_joined_agg(spark):
    """Aggregate-before-join == join-then-aggregate when o_orderkey and
    c_custkey are unique (the TPC-H key contract the rewrite documents)."""
    rng = np.random.default_rng(2)
    n_ord, n_li, n_cu = 60, 240, 20
    cu = spark.createDataFrame(
        [(int(i),) for i in range(n_cu)], ["c_custkey"]
    )
    od = spark.createDataFrame(
        [(int(i), int(rng.integers(0, n_cu + 5))) for i in range(n_ord)],
        ["o_orderkey", "o_custkey"],  # some custkeys dangle -> filtered
    )
    li = spark.createDataFrame(
        [
            (
                int(rng.integers(0, n_ord + 10)),  # some orderkeys dangle
                round(float(rng.uniform(10, 1000)), 2),
                round(float(rng.integers(0, 10)) / 100.0, 2),
            )
            for _ in range(n_li)
        ],
        ["l_orderkey", "l_extendedprice", "l_discount"],
    )
    old = (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(F.broadcast(cu), od.o_custkey == cu.c_custkey)
        .groupBy("o_orderkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
    )
    per_order = (
        li.select(
            "l_orderkey",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("_r"),
        )
        .groupBy("l_orderkey")
        .agg(F.round(F.sum("_r"), 4).alias("revenue"))
    )
    od_kept = od.join(
        F.broadcast(cu), od.o_custkey == cu.c_custkey, "leftsemi"
    )
    new = per_order.join(
        od_kept, per_order.l_orderkey == od_kept.o_orderkey
    ).select("o_orderkey", "revenue")
    o = old.orderBy("o_orderkey").toPandas()
    n = new.orderBy("o_orderkey").toPandas()
    pd.testing.assert_frame_equal(o, n)


def test_spread_caps_at_row_groups(spark, tmp_path):
    """The split estimator must not report more parallelism than the file's
    row groups can deliver."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from streaming_downsampling_spark.operators._spread import (
        _estimated_scan_splits,
        spread,
    )

    tbl = pa.table({"x": pa.array(np.arange(200_000), pa.int64())})
    p = str(tmp_path / "one_rg.parquet")
    pq.write_table(tbl, p, row_group_size=10**9)  # ONE row group
    df = spark.read.parquet(p)
    est = _estimated_scan_splits(df, df.inputFiles())
    assert est == 1
    assert spread(df).rdd.getNumPartitions() >= 4  # repartitioned wide


def test_star_cc_driver_union_find_equals_iterative(spark):
    """The small-graph driver union-find path produces exactly the
    distributed alternations' labels — random graphs incl. chains (the
    diameter-hazard shape), cliques, isolated self-pairs and singletons."""
    from streaming_downsampling_spark.operators.dedup import (
        connected_components_star,
    )

    rng = np.random.default_rng(13)
    edges = []
    # a long chain (diameter hazard)
    chain = list(range(100, 140))
    edges += [(a, b) for a, b in zip(chain[:-1], chain[1:])]
    # a clique
    cl = [200, 201, 202, 203]
    edges += [(a, b) for i, a in enumerate(cl) for b in cl[i + 1:]]
    # random sparse pairs
    for _ in range(60):
        a, b = sorted(rng.integers(0, 80, 2).tolist())
        edges.append((int(a), int(b)))  # may include self-pairs a == b
    pairs = spark.createDataFrame(edges, ["doc_a", "doc_b"])
    fast = (
        connected_components_star(pairs)
        .orderBy("node")
        .toPandas()
    )
    slow = (
        connected_components_star(pairs, small_graph_max_edges=0)
        .orderBy("node")
        .toPandas()
    )
    pd.testing.assert_frame_equal(fast, slow)


def test_star_cc_empty_candidate_graph(spark):
    """An all-unique corpus yields ZERO candidate pairs; both CC paths must
    return an empty, correctly-typed label set (not a schema-inference
    crash)."""
    from streaming_downsampling_spark.operators.dedup import (
        connected_components_star,
    )

    pairs = spark.createDataFrame([], schema="doc_a bigint, doc_b bigint")
    for kw in ({}, {"small_graph_max_edges": 0}):
        out = connected_components_star(pairs, **kw)
        assert out.columns == ["node", "component"]
        assert out.count() == 0
