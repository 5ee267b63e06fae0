"""Query catalog: every operator as a (Spark callable, DuckDB oracle SQL) pair.

This is the engine's public query surface and the driver's correctness gate
(`__spark_entry__.py` re-exports it).  Naming convention follows SURVEY.md §2
operator ids.  Rules that keep Spark and DuckDB hash-identical:

* every computed column is aliased the same on both sides;
* float aggregates are ``round(x, 4..6)`` on both sides (double summation
  order differs between engines at the last ulp);
* every ranking has a total deterministic order (explicit id tie-breaks);
* ranking inputs are rounded *before* ranking so ulp noise can't flip ranks.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from .operators import dedup as D
from .operators import similarity as S
from .operators import text as T
from .operators.asof import asof_join
from .operators.compress import compress_chunks, decompress_chunks
from .operators.downsample import downsample_metrics, downsample_model, downsample_select
from .operators.gapfill import gapfill
from .operators.multimodal import extract_features, synth_media
from .operators.rollup import cascade, rollup


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _avg6(sum_col: str, n_col: str):
    """Average of 2-decimal source data, computed via exact integer cents.

    ``round(sum,0)*100`` recovers the exact integer cent total (double sum
    noise ≪ 0.5), so Spark and any external oracle divide *bit-identical*
    doubles — otherwise summation-order ulp noise lands the quotient on
    opposite sides of a round() half-boundary (seen in practice: avg
    3609.66/64 = 56.4009375 exactly).
    """
    return F.round(
        F.round(F.col(sum_col) * 100, 0) / F.col(n_col) / 100.0, 6
    )


def _avg6_agg(value_col, scale: int = 100):
    """Same trick as an aggregate expression over raw rows."""
    return F.round(
        F.round(F.sum(F.col(value_col) * scale), 0)
        / F.count(F.lit(1))
        / float(scale),
        6,
    )


# ---------------------------------------------------------------------------
# time-series rollup / gap-fill / downsample over `events`
# ---------------------------------------------------------------------------


def q_rollup_1h(spark, sf_dir):
    """A3/A4: tumbling 1 h continuous aggregate per event_type."""
    ev = _t(spark, sf_dir, "events")
    r = rollup(ev, "1h", key_col="event_type", ts_col="ts", value_col="value", order_col=None)
    return r.select(
        F.col("key").alias("event_type"),
        "window_start",
        F.col("n_points").alias("n"),
        F.round("sum_value", 6).alias("sum_value"),
        _avg6("sum_value", "n_points").alias("avg_value"),
        F.col("min_value"),
        F.col("max_value"),
    )


SQL_ROLLUP_1H = """
SELECT event_type, date_trunc('hour', ts) AS window_start, count(*) AS n,
       round(sum(value), 6) AS sum_value,
       round(round(sum(value) * 100) / count(*) / 100.0, 6) AS avg_value,
       min(value) AS min_value, max(value) AS max_value
FROM events GROUP BY 1, 2
"""


def q_rollup_1d_cascade(spark, sf_dir):
    """Tier cascade 1h→1d re-aggregation; oracle aggregates raw directly —
    passing proves the cascade is exact (means composed from sums)."""
    ev = _t(spark, sf_dir, "events")
    r1h = rollup(ev, "1h", key_col="event_type", ts_col="ts", value_col="value", order_col=None)
    r1d = cascade(r1h, "1d")
    return r1d.select(
        F.col("key").alias("event_type"),
        "window_start",
        F.col("n_points").alias("n"),
        F.round("sum_value", 6).alias("sum_value"),
        _avg6("sum_value", "n_points").alias("avg_value"),
        "min_value",
        "max_value",
    )


SQL_ROLLUP_1D = """
SELECT event_type, date_trunc('day', ts) AS window_start, count(*) AS n,
       round(sum(value), 6) AS sum_value,
       round(round(sum(value) * 100) / count(*) / 100.0, 6) AS avg_value,
       min(value) AS min_value, max(value) AS max_value
FROM events GROUP BY 1, 2
"""


def q_stats_per_type(spark, sf_dir):
    """A1/A6: per-key mean/stddev_pop (the normalization statistics)."""
    ev = _t(spark, sf_dir, "events")
    n = F.count(F.lit(1))
    sc = F.round(F.sum(F.col("value") * 100), 0)
    sqc = F.round(F.sum(F.col("value") * F.col("value") * 10000), 0)
    mean = sc / n / 100.0
    var = sqc / n / 10000.0 - mean * mean
    return ev.groupBy("event_type").agg(
        n.alias("n"),
        F.round(mean, 6).alias("mean_value"),
        F.round(F.sqrt(var), 6).alias("std_value"),
    )


SQL_STATS = """
SELECT event_type, count(*) AS n,
  round(round(sum(value * 100)) / count(*) / 100.0, 6) AS mean_value,
  round(sqrt(round(sum(value * value * 10000)) / count(*) / 10000.0
        - (round(sum(value * 100)) / count(*) / 100.0)
          * (round(sum(value * 100)) / count(*) / 100.0)), 6) AS std_value
FROM events GROUP BY 1
"""


def _hourly_rounded(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    r = rollup(ev, "1h", key_col="event_type", ts_col="ts", value_col="value", order_col=None)
    return r.withColumn("avg_value", _avg6("sum_value", "n_points"))


def q_gapfill_locf(spark, sf_dir):
    """W1 (LOCF flavor): dense hourly spine per key, carry last known value."""
    g = gapfill(_hourly_rounded(spark, sf_dir), "1h", method="locf")
    return g.select("key", "window_start", F.round("value", 6).alias("value"), "filled")


_SQL_GAPFILL_BASE = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS ws,
         round(round(sum(value) * 100) / count(*) / 100.0, 6) AS v
  FROM events GROUP BY 1, 2),
bounds AS (SELECT event_type, min(ws) AS w0, max(ws) AS w1 FROM hourly GROUP BY 1),
spine AS (
  SELECT event_type, unnest(generate_series(w0, w1, interval '1 hour')) AS window_start
  FROM bounds),
base AS (
  SELECT s.event_type, s.window_start, h.v
  FROM spine s LEFT JOIN hourly h ON h.event_type = s.event_type AND h.ws = s.window_start),
sel AS (
  SELECT event_type, window_start, v,
    last_value(v IGNORE NULLS) OVER wprev AS prev_v,
    last_value(CASE WHEN v IS NOT NULL THEN window_start END IGNORE NULLS) OVER wprev AS prev_t,
    first_value(v IGNORE NULLS) OVER wnext AS next_v,
    first_value(CASE WHEN v IS NOT NULL THEN window_start END IGNORE NULLS) OVER wnext AS next_t
  FROM base
  WINDOW
    wprev AS (PARTITION BY event_type ORDER BY window_start
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
    wnext AS (PARTITION BY event_type ORDER BY window_start
              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
"""

SQL_GAPFILL_LOCF = (
    _SQL_GAPFILL_BASE
    + """
SELECT event_type AS key, window_start,
       round(coalesce(prev_v, next_v), 6) AS value, v IS NULL AS filled
FROM sel
"""
)


def q_gapfill_linear(spark, sf_dir):
    """W1 (linear flavor): the reference's endpoint-anchored interpolation
    (/root/reference/new_evaluation.py:185-198) as a relational operator."""
    g = gapfill(_hourly_rounded(spark, sf_dir), "1h", method="linear")
    return g.select("key", "window_start", F.round("value", 6).alias("value"), "filled")


SQL_GAPFILL_LINEAR = (
    _SQL_GAPFILL_BASE
    + """
SELECT event_type AS key, window_start,
  round(CASE
    WHEN v IS NOT NULL THEN v
    WHEN prev_v IS NULL THEN next_v
    WHEN next_v IS NULL THEN prev_v
    ELSE prev_v + (next_v - prev_v) *
      ((epoch_us(window_start) - epoch_us(prev_t)) * 1.0
       / (epoch_us(next_t) - epoch_us(prev_t)))
  END, 6) AS value,
  v IS NULL AS filled
FROM sel
"""
)


def q_topk_per_type(spark, sf_dir):
    """T1: static top-k by value per key (relational analog of tf.top_k)."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(
        F.col("value").desc(), F.col("event_id").asc()
    )
    return (
        ev.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 10)
        .select("event_type", "rnk", "event_id", "value")
    )


SQL_TOPK = """
SELECT event_type, rnk, event_id, value FROM (
  SELECT event_type, event_id, value,
         row_number() OVER (PARTITION BY event_type ORDER BY value DESC, event_id) AS rnk
  FROM events) WHERE rnk <= 10
"""


def q_cumshare_select(spark, sf_dir):
    """T2: dynamic top-k by cumulative importance — select rows until the
    running sum reaches 99 % of the key's total
    (/root/reference/core/downsampling_algorithm3.py:146-171 semantics)."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(
        F.col("value").desc(), F.col("event_id").asc()
    )
    wall = Window.partitionBy("event_type")
    sel = (
        ev.withColumn("cum", F.sum("value").over(w))
        .withColumn("total", F.sum("value").over(wall))
        .filter(F.col("cum") <= 0.99 * F.col("total"))
    )
    return sel.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_selected"),
        F.round(F.sum("value"), 6).alias("sum_selected"),
    )


SQL_CUMSHARE = """
WITH c AS (
  SELECT event_type, value,
         sum(value) OVER (PARTITION BY event_type ORDER BY value DESC, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         sum(value) OVER (PARTITION BY event_type) AS total
  FROM events)
SELECT event_type, count(*) AS n_selected, round(sum(value), 6) AS sum_selected
FROM c WHERE cum <= 0.99 * total GROUP BY 1
"""


def q_haar_threshold(spark, sf_dir):
    """T3: Haar level-1 coefficient-magnitude thresholding, fully relational.

    Per user: daily series → pairwise Haar details (x_odd − x_even)/√2 →
    keep the top-3 |cD| pairs (semantics of
    /root/reference/new_evaluation.py:139-152 with haar, expressed with
    window functions instead of a UDF — proof the kernel is SQL-shaped)."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("d")
    ).agg(_avg6_agg("value").alias("v"))
    wn = Window.partitionBy("user_id").orderBy("d")
    numbered = daily.withColumn("rn", F.row_number().over(wn).cast("long"))
    pairs = (
        numbered.withColumn("pair_id", F.expr("(rn - 1) div 2"))
        .groupBy("user_id", "pair_id")
        .agg(
            F.min_by("v", "rn").alias("v1"),
            F.max_by("v", "rn").alias("v2"),
            F.count(F.lit(1)).alias("c"),
        )
        .filter(F.col("c") == 2)
        .withColumn("cd", F.round((F.col("v1") - F.col("v2")) / F.sqrt(F.lit(2.0)), 6))
    )
    wr = Window.partitionBy("user_id").orderBy(
        F.abs("cd").desc(), F.col("pair_id").asc()
    )
    return (
        pairs.withColumn("rnk", F.row_number().over(wr))
        .filter(F.col("rnk") <= 3)
        .select("user_id", "pair_id", "cd")
    )


SQL_HAAR = """
WITH daily AS (
  SELECT user_id, date_trunc('day', ts) AS d,
         round(round(sum(value * 100)) / count(*) / 100.0, 6) AS v
  FROM events GROUP BY 1, 2),
numbered AS (
  SELECT user_id, v, row_number() OVER (PARTITION BY user_id ORDER BY d) AS rn
  FROM daily),
pairs AS (
  SELECT user_id, (rn - 1) // 2 AS pair_id,
         arg_min(v, rn) AS v1, arg_max(v, rn) AS v2, count(*) AS c
  FROM numbered GROUP BY 1, 2),
coeffs AS (
  SELECT user_id, pair_id, round((v1 - v2) / sqrt(2.0), 6) AS cd
  FROM pairs WHERE c = 2),
ranked AS (
  SELECT user_id, pair_id, cd,
         row_number() OVER (PARTITION BY user_id ORDER BY abs(cd) DESC, pair_id) AS rnk
  FROM coeffs)
SELECT user_id, pair_id, cd FROM ranked WHERE rnk <= 3
"""


def q_uniform_sample(spark, sf_dir):
    """W5: stride sampling — every 10th event per user in stable order."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") - 1) % 10 == 0)
        .select("user_id", "event_id", "value")
    )


SQL_UNIFORM = """
SELECT user_id, event_id, value FROM (
  SELECT user_id, event_id, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events) WHERE (rn - 1) % 10 = 0
"""


def q_minmax_daily(spark, sf_dir):
    """W2: per-window min/max pair retention (MinMax downsampling)."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("window_start")
    ).agg(
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        F.count(F.lit(1)).alias("n"),
    )


SQL_MINMAX = """
SELECT event_type, date_trunc('day', ts) AS window_start,
       min(value) AS min_value, max(value) AS max_value, count(*) AS n
FROM events GROUP BY 1, 2
"""


def q_sanitize_agg(spark, sf_dir):
    """P2/P3: NaN/Inf/null-sanitized aggregation
    (/root/reference/core/streaming_pipeline.py:139-144 semantics)."""
    ev = _t(spark, sf_dir, "events")
    clean = F.when(
        F.col("value").isNull() | F.isnan("value") | (F.abs("value") == float("inf")),
        F.lit(0.0),
    ).otherwise(F.col("value"))
    return ev.groupBy("event_type").agg(
        F.round(F.sum(clean), 6).alias("sum_clean"),
        F.count(F.when(F.col("value").isNotNull(), 1)).alias("n_nonnull"),
    )


SQL_SANITIZE = """
SELECT event_type,
       round(sum(CASE WHEN value IS NULL OR isnan(value) OR isinf(value)
                 THEN 0.0 ELSE value END), 6) AS sum_clean,
       count(value) AS n_nonnull
FROM events GROUP BY 1
"""


def q_gorilla_roundtrip(spark, sf_dir):
    """M3: Gorilla/delta-of-delta chunks → decode → aggregate.  The oracle
    aggregates the RAW table — matching proves the codec round-trip is
    bit-exact through Spark, parquet-able blobs and all."""
    ev = _t(spark, sf_dir, "events").withColumn(
        "key", F.col("user_id").cast("string")
    )
    chunks = compress_chunks(
        ev, window="7 days", key_col="key", ts_col="ts", value_col="value", order_col="event_id"
    )
    points = decompress_chunks(chunks)
    return points.groupBy("key").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 6).alias("sum_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


SQL_GORILLA = """
SELECT cast(user_id AS VARCHAR) AS key, count(*) AS n,
       round(sum(value), 6) AS sum_value, min(value) AS min_value,
       max(value) AS max_value
FROM events GROUP BY 1
"""


def q_asof_enrich(spark, sf_dir):
    """As-of join: each event enriched with the most recent *completed*
    hour's average for its type (backward as-of on the hour's end time;
    events in a type's first hour get nulls).  One shuffle union-sort —
    no range cross-join."""
    ev = _t(spark, sf_dir, "events")
    hourly = rollup(
        ev, "1h", key_col="event_type", ts_col="ts", value_col="value", order_col=None
    ).select(
        F.col("key").alias("event_type"),
        F.col("window_end").alias("h_end"),
        _avg6("sum_value", "n_points").alias("prev_hour_avg"),
    )
    out = asof_join(
        ev.select("event_id", "event_type", "ts"),
        hourly,
        key_col="event_type",
        left_ts="ts",
        right_ts="h_end",
        right_cols=["prev_hour_avg"],
        suffix="",
    )
    return out.select("event_id", "event_type", "prev_hour_avg", F.col("h_end"))


SQL_ASOF = """
WITH hourly AS (
  SELECT event_type,
         date_trunc('hour', ts) + INTERVAL 1 HOUR AS h_end,
         round(round(sum(value) * 100) / count(*) / 100.0, 6) AS prev_hour_avg
  FROM events GROUP BY 1, 2)
SELECT e.event_id, e.event_type, h.prev_hour_avg, h.h_end
FROM events e ASOF LEFT JOIN hourly h
  ON e.event_type = h.event_type AND e.ts >= h.h_end
"""


def q_lttb_select(spark, sf_dir):
    """W3: LTTB point selection per (event_type, day) — Spark-only check for
    the kernel also exercised (with an error oracle) in the bench query."""
    ev = _t(spark, sf_dir, "events")
    return downsample_select(
        ev, "lttb", 20, window="1 day", key_col="event_type",
        ts_col="ts", value_col="value", order_col="event_id",
    )


def q_pip_select(spark, sf_dir):
    """W4: Perceptually-Important-Points selection per (event_type, day)."""
    ev = _t(spark, sf_dir, "events")
    return downsample_select(
        ev, "pip", 12, window="1 day", key_col="event_type",
        ts_col="ts", value_col="value", order_col="event_id",
    )


def q_random_sample(spark, sf_dir):
    """W6: seeded random sampling per (event_type, day), sorted indices."""
    ev = _t(spark, sf_dir, "events")
    return downsample_select(
        ev, "random", 20, window="1 day", key_col="event_type",
        ts_col="ts", value_col="value", order_col="event_id", seed=7,
    )


# ---------------------------------------------------------------------------
# relational shell (TPC-H-ish) over lineitem/orders/customer/nation/region
# ---------------------------------------------------------------------------


def q_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: scan-heavy grouped aggregation with filter pushdown."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2024-11-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("sum_disc_price"),
            _avg6_agg("l_quantity").alias("avg_qty"),
            _avg6_agg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


SQL_PRICING = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 4) AS sum_qty,
       round(sum(l_extendedprice), 4) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
       round(round(sum(l_quantity * 100)) / count(*) / 100.0, 6) AS avg_qty,
       round(round(sum(l_discount * 100)) / count(*) / 100.0, 6) AS avg_disc,
       count(*) AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '2024-11-01 00:00:00'
GROUP BY 1, 2
"""


def q_top_revenue_orders(spark, sf_dir):
    """TPC-H Q3 shape: 3-way join + grouped revenue + deterministic top-10.
    Customer (small) broadcasts; orders⋈lineitem shuffles on the join key."""
    cu = _t(spark, sf_dir, "customer")
    od = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    rev = (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(F.broadcast(cu), od.o_custkey == cu.c_custkey)
        .groupBy("o_orderkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
    )
    return rev.orderBy(F.col("revenue").desc(), F.col("o_orderkey")).limit(10)


SQL_TOP_REVENUE = """
SELECT o_orderkey, round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
GROUP BY 1 ORDER BY revenue DESC, o_orderkey LIMIT 10
"""


def q_brand_revenue(spark, sf_dir):
    """lineitem ⋈ part (broadcast dim) → revenue per brand.  The part table
    is small at any SF relative to lineitem — broadcast avoids shuffling the
    fact table on l_partkey."""
    li = _t(spark, sf_dir, "lineitem")
    pa = _t(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(pa), li.l_partkey == pa.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue"),
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


SQL_BRAND_REVENUE = """
SELECT p_brand,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
       round(sum(l_quantity), 4) AS sum_qty,
       count(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY 1
"""


def q_supplier_volume(spark, sf_dir):
    """lineitem ⋈ supplier ⋈ nation (both broadcast) → volume per nation."""
    li = _t(spark, sf_dir, "lineitem")
    su = _t(spark, sf_dir, "supplier")
    na = _t(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(su), li.l_suppkey == su.s_suppkey)
        .join(F.broadcast(na), su.s_nationkey == na.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


SQL_SUPPLIER_VOLUME = """
SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
       count(*) AS n_lines
FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
GROUP BY 1
"""


def q_customers_per_region(spark, sf_dir):
    """Broadcast-join chain over the dimension tables."""
    re = _t(spark, sf_dir, "region")
    na = _t(spark, sf_dir, "nation")
    cu = _t(spark, sf_dir, "customer")
    return (
        cu.join(F.broadcast(na), cu.c_nationkey == na.n_nationkey)
        .join(F.broadcast(re), na.n_regionkey == re.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            _avg6_agg("c_acctbal").alias("avg_acctbal"),
        )
    )


SQL_CUSTOMERS_REGION = """
SELECT r_name, count(*) AS n_customers, round(round(sum(c_acctbal * 100)) / count(*) / 100.0, 6) AS avg_acctbal
FROM customer JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# training-data pipeline: dedup / text / similarity
# ---------------------------------------------------------------------------


def q_dedup_exact(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return D.exact_dedup(docs)


SQL_DEDUP_EXACT = """
SELECT min(doc_id) AS doc_id, count(*) AS n_copies
FROM documents GROUP BY md5(text)
"""


def q_token_count(spark, sf_dir):
    return T.token_count(_t(spark, sf_dir, "documents"))


SQL_TOKEN_COUNT = r"""
SELECT doc_id,
  len(list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '')) AS n_tokens,
  len(list_filter(regexp_split_to_array(text, '[^A-Za-z0-9]+'), x -> x <> ''))
    + length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g')) AS n_subwords,
  length(text) AS n_chars
FROM documents
"""


def q_text_quality(spark, sf_dir):
    return T.quality_score(_t(spark, sf_dir, "documents"))


_ALL_MARKERS = "', '".join(
    w for ws in T.LANG_MARKERS.values() for w in ws
)

SQL_TEXT_QUALITY = rf"""
WITH w AS (
  SELECT doc_id, text,
         list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS words
  FROM documents),
m AS (
  SELECT doc_id, text, len(words) AS n_words, length(text) AS n_chars,
         length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS alpha_chars,
         length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS punct_chars,
         len(list_filter(words, x -> list_contains(['{_ALL_MARKERS}'], x))) AS stop_hits
  FROM w)
SELECT doc_id, n_words,
  round(n_chars * 1.0 / greatest(n_words, 1), 6) AS mean_word_len,
  round(alpha_chars * 1.0 / greatest(n_chars, 1), 6) AS alpha_ratio,
  round(punct_chars * 1.0 / greatest(n_chars, 1), 6) AS punct_ratio,
  round(stop_hits * 1.0 / greatest(n_words, 1), 6) AS stop_ratio,
  round(least(n_words / 50.0, 1.0) * 0.4
        + round(alpha_chars * 1.0 / greatest(n_chars, 1), 6) * 0.4
        + greatest(1.0 - round(punct_chars * 1.0 / greatest(n_chars, 1), 6) * 10.0, 0.0) * 0.2,
        6) AS quality
FROM m
"""


def q_lang_guess(spark, sf_dir):
    return T.lang_guess(_t(spark, sf_dir, "documents"))


def _sql_lang_guess() -> str:
    hits = []
    for lang, markers in sorted(T.LANG_MARKERS.items()):
        lst = "', '".join(markers)
        hits.append(
            f"len(list_filter(words, x -> list_contains(['{lst}'], x))) AS h_{lang}"
        )
    langs = sorted(T.LANG_MARKERS)
    g = ", ".join(f"h_{x}" for x in langs)
    case = f"CASE WHEN greatest({g}) = 0 THEN 'und' "
    for lang in langs:
        case += f"WHEN h_{lang} = greatest({g}) THEN '{lang}' "
    case += "END"
    return rf"""
WITH w AS (
  SELECT doc_id, list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS words
  FROM documents),
h AS (SELECT doc_id, {', '.join(hits)} FROM w)
SELECT doc_id, {case} AS lang_guess, greatest({g}) AS hits FROM h
"""


def q_fingerprint(spark, sf_dir):
    return T.fingerprint(_t(spark, sf_dir, "documents")).select("doc_id", "fp_md5")


SQL_FINGERPRINT = r"""
SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp_md5
FROM documents
"""


def q_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-5 for query vectors vec_id < 5."""
    emb = _t(spark, sf_dir, "embeddings")
    return S.cosine_topk(emb, emb.filter(F.col("vec_id") < 5), k=5)


def q_embedding_near_dup(spark, sf_dir):
    """Embedding-cosine near-dup pairs, blocked by label: the scale-correct
    shape (block → within-block pairs → threshold), never an unblocked
    cross join.  Deterministic output: (id_a < id_b, cos rounded)."""
    emb = _t(spark, sf_dir, "embeddings")
    e = emb.select("vec_id", "label", "embedding")
    a, b = e.alias("a"), e.alias("b")
    cos = F.round(
        S._dot(F.col("a.embedding"), F.col("b.embedding"))
        / (S._norm(F.col("a.embedding")) * S._norm(F.col("b.embedding"))),
        6,
    )
    return (
        a.join(
            b,
            (F.col("a.label") == F.col("b.label"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .withColumn("cos", cos)
        .filter(F.col("cos") >= 0.4)
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            "cos",
        )
    )


SQL_EMBEDDING_NEAR_DUP = """
WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_dot_product(a.v, b.v)
             / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) AS cos
FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE round(list_dot_product(a.v, b.v)
            / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) >= 0.4
"""


SQL_COSINE_TOPK = """
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 5),
e AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS ev FROM embeddings),
scored AS (
  SELECT query_id, neighbor_id,
         round(list_dot_product(qv, ev)
               / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(ev, ev))), 6) AS cos
  FROM q, e WHERE query_id <> neighbor_id),
r AS (SELECT query_id, neighbor_id, cos,
             row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
      FROM scored)
SELECT query_id, neighbor_id, rank, cos FROM r WHERE rank <= 5
"""


# ---------------------------------------------------------------------------
# Spark-only queries (no SQL equivalent → driver rows-only check)
# ---------------------------------------------------------------------------


def q_minhash_lsh(spark, sf_dir):
    """MinHash-LSH near-dup candidate pairs (non-SQL: banded signature join)."""
    docs = _t(spark, sf_dir, "documents")
    return D.lsh_candidates(docs, num_hashes=16, bands=4)


def q_simhash_nn(spark, sf_dir):
    """SimHash prefix-block near-dup candidates with Hamming distance."""
    docs = _t(spark, sf_dir, "documents")
    return D.simhash_near_dups(docs, prefix_bits=12)


def q_ngram_jaccard(spark, sf_dir):
    """Exact n-gram Jaccard over LSH candidates (verification stage)."""
    docs = _t(spark, sf_dir, "documents")
    cands = D.lsh_candidates(docs, num_hashes=16, bands=8)
    return D.ngram_jaccard_pairs(docs, cands).withColumn(
        "jaccard", F.round("jaccard", 6)
    )


def q_lsh_ann(spark, sf_dir):
    """Hyperplane-LSH approximate cosine top-k (bucketed scale path)."""
    emb = _t(spark, sf_dir, "embeddings")
    return S.lsh_ann_topk(emb, emb.filter(F.col("vec_id") < 5), dim=64, n_planes=6)


def q_model_downsample(spark, sf_dir):
    """The reference model pipeline (DWT + pooled approx + attention top-k)
    per (event_type, day) over events — non-SQL (frozen attention scorer).

    The operator emits array columns; the catalog query projects them to
    deterministic scalars (lengths, rounded digests, endpoint values) so the
    result is canonicalizable — the driver sorts rows by every column, and
    array cells are unhashable there.
    """
    ev = _t(spark, sf_dir, "events")
    out = downsample_model(
        ev, window="1 day", key_col="event_type", ts_col="ts",
        value_col="value", order_col="event_id",
    )
    r6 = lambda c: F.transform(c, lambda v: F.round(v, 6))  # noqa: E731
    return out.select(
        "key",
        "window_start",
        "n",
        F.size("pooled_approx").alias("n_pooled"),
        F.size("detail_values").alias("n_detail"),
        F.md5(F.to_json(r6("pooled_approx"))).alias("pooled_md5"),
        F.md5(F.to_json(r6("detail_values"))).alias("detail_md5"),
        F.md5(F.to_json("detail_indices")).alias("indices_md5"),
        F.round(F.element_at("pooled_approx", 1), 6).alias("first_pooled"),
        F.round(
            F.aggregate("detail_values", F.lit(0.0), lambda a, x: a + x), 6
        ).alias("detail_sum"),
    )


def q_downsample_error_bench(spark, sf_dir):
    """Per-method reconstruction-error benchmark (the reference's
    new_evaluation harness as one distributed query)."""
    ev = _t(spark, sf_dir, "events")
    outs = []
    for m in ["uniform", "minmax", "lttb", "wavelet_threshold", "avg_pool", "max_pool"]:
        outs.append(
            downsample_metrics(
                ev, m, 20, window="1 day", key_col="event_type",
                ts_col="ts", value_col="value", order_col="event_id",
            )
        )
    base = outs[0]
    for o in outs[1:]:
        base = base.unionByName(o)
    return base.groupBy("method").agg(
        F.round(F.avg("mse"), 6).alias("avg_mse"),
        F.round(F.avg("r2"), 6).alias("avg_r2"),
        F.count(F.lit(1)).alias("n_windows"),
    )


def q_multimodal_features(spark, sf_dir):
    """Multimodal plumbing: binary payloads → mapInPandas feature extraction
    (decode stubbed deterministically; Spark-side shapes real)."""
    media = synth_media(spark, n=200)
    feats = extract_features(media, dim=8)
    return feats.select(
        "media_id", "kind", "n_bytes", F.round(F.expr("aggregate(feature, 0D, (a, x) -> a + x)"), 6).alias("feat_sum")
    )


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "rollup_1h": q_rollup_1h,
    "rollup_1d_cascade": q_rollup_1d_cascade,
    "stats_per_type": q_stats_per_type,
    "gapfill_locf": q_gapfill_locf,
    "gapfill_linear": q_gapfill_linear,
    "topk_per_type": q_topk_per_type,
    "cumshare_select": q_cumshare_select,
    "haar_threshold": q_haar_threshold,
    "uniform_sample": q_uniform_sample,
    "minmax_daily": q_minmax_daily,
    "sanitize_agg": q_sanitize_agg,
    "gorilla_roundtrip": q_gorilla_roundtrip,
    "asof_enrich": q_asof_enrich,
    "pricing_summary": q_pricing_summary,
    "top_revenue_orders": q_top_revenue_orders,
    "customers_per_region": q_customers_per_region,
    "brand_revenue": q_brand_revenue,
    "supplier_volume": q_supplier_volume,
    "dedup_exact": q_dedup_exact,
    "token_count": q_token_count,
    "text_quality": q_text_quality,
    "lang_guess": q_lang_guess,
    "fingerprint": q_fingerprint,
    "cosine_topk": q_cosine_topk,
    "embedding_near_dup": q_embedding_near_dup,
    # Spark-only (rows-only correctness check)
    "lttb_select": q_lttb_select,
    "pip_select": q_pip_select,
    "random_sample": q_random_sample,
    "minhash_lsh": q_minhash_lsh,
    "simhash_nn": q_simhash_nn,
    "ngram_jaccard": q_ngram_jaccard,
    "lsh_ann": q_lsh_ann,
    "model_downsample": q_model_downsample,
    "downsample_error_bench": q_downsample_error_bench,
    "multimodal_features": q_multimodal_features,
}

ORACLES: dict[str, str] = {
    "rollup_1h": SQL_ROLLUP_1H,
    "rollup_1d_cascade": SQL_ROLLUP_1D,
    "stats_per_type": SQL_STATS,
    "gapfill_locf": SQL_GAPFILL_LOCF,
    "gapfill_linear": SQL_GAPFILL_LINEAR,
    "topk_per_type": SQL_TOPK,
    "cumshare_select": SQL_CUMSHARE,
    "haar_threshold": SQL_HAAR,
    "uniform_sample": SQL_UNIFORM,
    "minmax_daily": SQL_MINMAX,
    "sanitize_agg": SQL_SANITIZE,
    "gorilla_roundtrip": SQL_GORILLA,
    "asof_enrich": SQL_ASOF,
    "pricing_summary": SQL_PRICING,
    "top_revenue_orders": SQL_TOP_REVENUE,
    "customers_per_region": SQL_CUSTOMERS_REGION,
    "brand_revenue": SQL_BRAND_REVENUE,
    "supplier_volume": SQL_SUPPLIER_VOLUME,
    "dedup_exact": SQL_DEDUP_EXACT,
    "token_count": SQL_TOKEN_COUNT,
    "text_quality": SQL_TEXT_QUALITY,
    "lang_guess": _sql_lang_guess(),
    "fingerprint": SQL_FINGERPRINT,
    "cosine_topk": SQL_COSINE_TOPK,
    "embedding_near_dup": SQL_EMBEDDING_NEAR_DUP,
}
