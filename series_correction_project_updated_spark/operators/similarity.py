"""Similarity search over embedding columns (array<float>).

Training-data-pipeline ops (no reference analog):

- ``cosine_topk``      — brute-force exact top-k, the correctness baseline
                         (built-in ``zip_with``/``aggregate`` fold, JVM-side)
- ``lsh_topk``         — random-hyperplane LSH buckets (sign bits of dot
                         products with seeded deterministic hyperplanes) →
                         candidates share a bucket → exact re-rank inside
                         buckets. The 100 TB path: the cross join collapses
                         from O(N·Q) to O(candidates).
- ``embedding_near_dup`` — pairs with cosine ≥ threshold via LSH buckets.

Hyperplanes are generated deterministically from a seed as a broadcast-sized
literal array — no Python in the scoring path.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _as_double(col: str) -> F.Column:
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b) -> F.Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def with_norm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    e = _as_double(vec_col)
    return df.withColumn("_emb", e).withColumn("_nrm", F.sqrt(_dot(F.col("_emb"), F.col("_emb"))))


def cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query (brute force). ``queries`` should be
    small — it is broadcast; the big side streams."""
    v = with_norm(vectors, vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col("_emb").alias("eb"), F.col("_nrm").alias("nb")
    )
    q = with_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"), F.col("_emb").alias("ea"), F.col("_nrm").alias("na")
    )
    pairs = (
        F.broadcast(q)
        .crossJoin(v)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", _dot("ea", "eb") / (F.col("na") * F.col("nb")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def lsh_bucket(df: DataFrame, vec_col: str, dim: int, n_planes: int = 12, seed: int = 42) -> DataFrame:
    """Add ``bucket``: sign-bit signature of dot products with n random
    hyperplanes. Same bucket ⇔ same side of every plane."""
    planes = _hyperplanes(dim, n_planes, seed)
    emb = _as_double(vec_col)
    bits = []
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bits.append(F.when(_dot(emb, plane) >= 0, F.lit(1 << i)).otherwise(F.lit(0)))
    bucket = bits[0]
    for b in bits[1:]:
        bucket = bucket + b
    return df.withColumn("bucket", bucket.cast("int"))


def lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates = same LSH bucket, exact cosine re-rank
    inside. Recall grows with fewer planes (bigger buckets)."""
    v = lsh_bucket(with_norm(vectors, vec_col), "_emb", dim, n_planes, seed).select(
        F.col(id_col).alias("neighbor_id"), F.col("_emb").alias("eb"), F.col("_nrm").alias("nb"), "bucket"
    )
    q = lsh_bucket(with_norm(queries, vec_col), "_emb", dim, n_planes, seed).select(
        F.col(id_col).alias("query_id"), F.col("_emb").alias("ea"), F.col("_nrm").alias("na"), "bucket"
    )
    pairs = (
        q.join(v, "bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", _dot("ea", "eb") / (F.col("na") * F.col("nb")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def embedding_near_dup(
    vectors: DataFrame,
    dim: int,
    threshold: float = 0.95,
    n_planes: int = 10,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine ≥ threshold, LSH-bucketed."""
    b = lsh_bucket(with_norm(vectors, vec_col), "_emb", dim, n_planes, seed)
    a = b.alias("a")
    c = b.alias("b")
    return (
        a.join(
            c,
            (F.col("a.bucket") == F.col("b.bucket")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .withColumn(
            "cosine",
            _dot(F.col("a._emb"), F.col("b._emb")) / (F.col("a._nrm") * F.col("b._nrm")),
        )
        .where(F.col("cosine") >= threshold)
        .select(
            F.col(f"a.{id_col}").alias("vec_a"), F.col(f"b.{id_col}").alias("vec_b"), "cosine"
        )
    )
