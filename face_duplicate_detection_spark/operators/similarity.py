"""Similarity search over embedding columns (array<float>).

The direct Spark analogue of the reference's embedding-space matching:
Euclidean tolerance 0.32 (``/root/reference/duplicate_face.py:66-67``)
and cosine > 0.65 (``face_recognition_custom.py:105-106``) over 128-d
face vectors — generalized to any embedding column:

- :func:`cosine_topk_bruteforce` — exact top-k neighbors; the small
  query side is broadcast, the corpus is scanned once (this is the
  correct *baseline*, and at 100 TB it is the plan you want when the
  query set is small: no shuffle at all, map-side only).
- :func:`embedding_dup_pairs` — all pairs above a cosine threshold
  via random-hyperplane LSH bucketing (the scale path: candidate
  generation by equi-join instead of the O(n²) cross join, same trick
  the text pipeline plays with MinHash bands).

Dot products use native higher-order functions (``zip_with`` +
``aggregate``) — JVM codegen, no Python.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_expr(a, b):
    return _dot(a, b) / (F.greatest(_norm(a) * _norm(b), F.lit(1e-12)))


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors per query (broadcast cross join).

    queries must be small (≤ broadcast threshold); corpus any size.
    Output: query_id, neighbor_id, cosine, rank (1-based).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_expr(F.col("qv"), F.col("cv")), 6).alias("cosine"),
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def random_hyperplanes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def lsh_bucket_expr(vec_col, planes: np.ndarray):
    """Sign-of-projection bucket id: bit i = 1{v · plane_i > 0}.

    Built as a native expression tree (one aggregate per plane over
    the array column) — fine for ≤ ~16 planes; beyond that use the
    pandas-UDF variant.
    """
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        proj = F.aggregate(
            F.zip_with(
                vec_col,
                F.array(*[F.lit(float(w)) for w in plane]),
                lambda x, y: x.cast("double") * y,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(proj > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


def embedding_dup_pairs(
    corpus: DataFrame,
    threshold: float = 0.9,
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs with cosine ≥ threshold via hyperplane-LSH buckets.

    n_tables independent bucketings (union) recover pairs a single
    table's unlucky cuts would miss; exact cosine verifies candidates
    (same propose-then-verify shape as the MinHash path).
    """
    dim = len(corpus.select(vec_col).first()[0])
    cand = None
    for t in range(n_tables):
        planes = random_hyperplanes(dim, n_planes, seed + t)
        b = corpus.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).alias("v"),
            lsh_bucket_expr(F.col(vec_col), planes).alias("bucket"),
        )
        left = b.select(
            F.col("id").alias("a"), F.col("v").alias("va"), "bucket"
        )
        right = b.select(
            F.col("id").alias("b"), F.col("v").alias("vb"), "bucket"
        )
        pairs = left.join(right, "bucket").filter(F.col("a") < F.col("b"))
        cand = pairs if cand is None else cand.unionByName(pairs)
    deduped = cand.dropDuplicates(["a", "b"])
    return (
        deduped.select(
            "a",
            "b",
            F.round(cosine_expr(F.col("va"), F.col("vb")), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
