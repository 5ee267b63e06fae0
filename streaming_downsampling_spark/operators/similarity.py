"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the correctness baseline; a random-hyperplane
LSH-bucketed variant as the scale path (candidate set shrinks from N to the
bucket population, turning the O(N·Q) scan into a bucket join).

All JVM-side: dot products via ``F.zip_with`` + ``F.aggregate`` (higher-order
functions, whole-stage codegen'd), never a Python UDF.  Queries are
broadcast — the big side streams.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window, functions as F

from ._pairs import in_bucket_pairs
from ._spread import spread


def _dot(a, b):
    # cast each element to double BEFORE multiplying: float32 multiply then
    # widen loses bits and breaks exact-match vs a double-math oracle
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int | None = 6,
) -> DataFrame:
    """Brute-force cosine top-k: for every query vector, the k nearest
    non-identical vectors.

    ``queries`` (small) is broadcast; the embeddings table is scanned once.
    Deterministic ranking: (cosine desc, neighbor_id asc) with cosine rounded
    so last-ulp float noise can't flip ranks across engines/runs.
    Output: (query_id, neighbor_id, rank, cos).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    e = spread(embeddings).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("ev")
    )
    cos = _dot(F.col("qv"), F.col("ev")) / (_norm(F.col("qv")) * _norm(F.col("ev")))
    if round_digits is not None:
        cos = F.round(cos, round_digits)
    scored = (
        e.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", cos)
        .select("query_id", "neighbor_id", "cos")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


def plane_literals(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    """The seeded random hyperplanes, exposed so external oracles (e.g. the
    DuckDB correctness gate) can embed the exact same constants."""
    rng = np.random.default_rng(seed)
    return rng.normal(size=(n_planes, dim))


def hyperplane_lsh_buckets(
    embeddings: DataFrame,
    dim: int,
    n_planes: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Sign-of-projection LSH bucket per vector (Charikar 2002 SimHash for
    cosine).  ``n_planes`` seeded random hyperplanes → ``n_planes``-bit bucket
    id; vectors in the same bucket are probable cosine neighbors.

    The hyperplanes are literal columns (deterministic, no state to ship).
    """
    planes = plane_literals(dim, n_planes, seed)
    bucket = F.lit(0).cast("long")
    for i in range(n_planes):
        proj = F.aggregate(
            F.zip_with(
                F.col(vec_col),
                F.array(*[F.lit(float(v)) for v in planes[i]]),
                lambda x, y: x.cast("double") * y,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(proj > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return spread(embeddings).select(
        id_col, vec_col, *(keep_cols or []), bucket.alias("bucket")
    )


def lsh_near_dup_pairs(
    embeddings: DataFrame,
    dim: int,
    n_planes: int = 16,  # sizing contract: >= log2(N / target_bucket_size)
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Embedding near-duplicate pairs via hyperplane-LSH blocking.

    Candidates are pairs sharing the (full-signature) bucket — each vector
    belongs to exactly one bucket, so no distinct pass is needed and the pair
    count is Σ_b |bucket_b|² instead of the O((N/k)²)-per-coarse-label blowup
    of attribute blocking.  At corpus scale, raise ``n_planes`` so buckets
    stay bounded (expected |bucket| ≈ N / 2^n_planes); recall is traded via
    multiple plane seeds (union of runs), never via a wider cross join.
    Output: (id_a, id_b, cos) with id_a < id_b and cos ≥ threshold.
    """
    b = hyperplane_lsh_buckets(embeddings, dim, n_planes, id_col, vec_col, seed)
    # groupBy-bucket + in-bucket combinations, NOT a self-join: one shuffle
    # on the bucket key and ONE scan of the plane-projection pipeline (a
    # self-join recomputes every projection per side, or needs an extra
    # materialization job to avoid it).  Norms are computed per vector
    # BEFORE the group so the pair expansion pays only the dot product.
    # array_sort on (id, ...) structs orders by id first: id_a < id_b by
    # construction.
    #
    # SIZING CONTRACT — unlike the text-LSH bucket key (a band signature,
    # effectively unbounded cardinality), there are only 2^n_planes buckets
    # here, so n_planes bounds bucket COUNT and the expected bucket SIZE is
    # N / 2^n_planes.  Each bucket's items land in ONE aggregation row
    # (struct of id, norm, vector), which cannot split or spill per-group:
    # size n_planes >= log2(N / target_bucket) so a bucket stays ~1e4-1e5
    # vectors (a few tens of MB).  That is the same regime where the pair
    # OUTPUT k(k-1)/2 is feasible at all — a bucket big enough to blow the
    # row buffer (~4M vectors -> 2 GB) implies ~1e13 output pairs, dead
    # under any shape — but the buffer fails faster and harder than a
    # streamed join, so the knob is a hard contract, not a tuning hint.
    withn = b.withColumn("nrm", _norm(F.col(vec_col)))
    buckets = (
        withn.groupBy("bucket")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col(id_col).alias("id"),
                        F.col("nrm"),
                        F.col(vec_col).alias("v"),
                    )
                )
            ).alias("items")
        )
        .filter(F.size("items") > 1)
    )
    return in_bucket_pairs(
        buckets,
        lambda x, y: F.struct(
            x["id"].alias("id_a"),
            y["id"].alias("id_b"),
            F.round(_dot(x["v"], y["v"]) / (x["nrm"] * y["nrm"]), 6).alias(
                "cos"
            ),
        ),
    ).filter(F.col("cos") >= threshold)


def lsh_ann_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Approximate NN: restrict the cosine scan to same-bucket candidates.

    At 100 TB this is the shape that survives: bucket the corpus once
    (write-time), bucket queries at read time, join on bucket — candidate
    count drops ~2^n_planes-fold vs brute force.
    Output: (query_id, neighbor_id, rank, cos) — approximate recall.
    """
    eb = hyperplane_lsh_buckets(embeddings, dim, n_planes, id_col, vec_col, seed)
    qb = hyperplane_lsh_buckets(queries, dim, n_planes, id_col, vec_col, seed)
    q = qb.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"), "bucket"
    )
    e = eb.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("ev"), "bucket"
    )
    cos = F.round(
        _dot(F.col("qv"), F.col("ev")) / (_norm(F.col("qv")) * _norm(F.col("ev"))), 6
    )
    scored = (
        e.join(F.broadcast(q), ["bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", cos)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


def centroid_literals(dim: int, n_cells: int, seed: int = 7) -> np.ndarray:
    """Seeded unit-norm centroids for the IVF coarse quantizer, exposed so
    external oracles (the DuckDB gate) can embed the exact same constants.
    Random unit centroids are the stateless stand-in for trained k-means
    centroids; swapping in trained ones is a constant swap, not a plan
    change."""
    rng = np.random.default_rng(seed)
    c = rng.normal(size=(n_cells, dim))
    return c / np.linalg.norm(c, axis=1, keepdims=True)


def _cell_projections(vec_col: str, centroids: np.ndarray):
    """Array of round-6 dot products against every centroid (JVM-side).

    Rounding before the argmax makes the cell assignment reproducible across
    engines (last-ulp fold differences can't flip the winner); ties break to
    the lowest cell index on both sides."""
    return F.array(
        *[
            F.round(
                F.aggregate(
                    F.zip_with(
                        F.col(vec_col),
                        F.array(*[F.lit(float(v)) for v in c]),
                        lambda x, y: x.cast("double") * y,
                    ),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                ),
                6,
            )
            for c in centroids
        ]
    )


def ivf_assign(
    embeddings: DataFrame,
    dim: int,
    n_cells: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
) -> DataFrame:
    """IVF coarse quantization: nearest-centroid cell per vector.

    Cosine assignment — argmax of dot(v, ĉ_i) (the vector's own norm is
    cell-invariant, so raw dots rank identically).  At write time this is
    the partition/bucket column: co-locating a cell's vectors turns every
    probe into a partition-pruned scan instead of a full pass.
    """
    cents = centroid_literals(dim, n_cells, seed)
    return (
        spread(embeddings).withColumn("_pr", _cell_projections(vec_col, cents))
        .withColumn(
            "cell",
            (F.array_position(F.col("_pr"), F.array_max("_pr")) - 1).cast("int"),
        )
        .drop("_pr")
    )


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_cells: int = 8,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
) -> DataFrame:
    """IVF-Flat approximate NN: probe the ``nprobe`` nearest cells per query,
    brute-force cosine only inside them.

    The 100 TB shape: the corpus is quantized once (``ivf_assign``, ideally a
    write-time partition column), each query joins only its probed cells —
    candidate count is ~N·nprobe/n_cells, and because every corpus vector
    lives in exactly one cell the probe join can't duplicate a neighbor, so
    no distinct pass.  Queries are broadcast; the big side streams.
    Output: (query_id, neighbor_id, rank, cos) — approximate recall.
    """
    cents = centroid_literals(dim, n_cells, seed)
    eb = ivf_assign(embeddings, dim, n_cells, id_col, vec_col, seed).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("ev"), "cell"
    )
    qp = (
        queries.withColumn("_pr", _cell_projections(vec_col, cents))
        .select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qv"),
            F.posexplode("_pr").alias("cell", "p"),
        )
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.col("p").desc(), F.col("cell").asc()
                )
            ),
        )
        .filter(F.col("_rn") <= nprobe)
        .select("query_id", "qv", F.col("cell").cast("int").alias("cell"))
    )
    cos = F.round(
        _dot(F.col("qv"), F.col("ev")) / (_norm(F.col("qv")) * _norm(F.col("ev"))), 6
    )
    scored = (
        eb.join(F.broadcast(qp), ["cell"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", cos)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )
