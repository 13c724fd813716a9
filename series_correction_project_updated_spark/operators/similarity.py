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
    n_tables: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates = same LSH bucket in ANY of ``n_tables``
    independent hash tables (OR-amplification — the standard multi-table LSH
    construction), exact cosine re-rank over the deduped candidate set.

    Recall tuning: fewer planes ⇒ bigger buckets (higher recall per table);
    more tables ⇒ miss probability (1−p^planes)^tables decays geometrically.
    Each table is a seeded independent hyperplane set; candidate generation
    stays an equi-join on (table, bucket) — tiny rows, sub-quadratic, and the
    per-table joins union before ONE distinct + re-rank."""
    vn = with_norm(vectors, vec_col)
    qn = with_norm(queries, vec_col)
    cand = None
    for t in range(n_tables):
        v = lsh_bucket(vn, "_emb", dim, n_planes, seed + t).select(
            F.col(id_col).alias("neighbor_id"), F.col("bucket")
        )
        q = lsh_bucket(qn, "_emb", dim, n_planes, seed + t).select(
            F.col(id_col).alias("query_id"), F.col("bucket")
        )
        p = q.join(v, "bucket").select("query_id", "neighbor_id")
        cand = p if cand is None else cand.union(p)
    cand = cand.where(F.col("query_id") != F.col("neighbor_id")).distinct()
    v_full = vn.select(
        F.col(id_col).alias("neighbor_id"), F.col("_emb").alias("eb"), F.col("_nrm").alias("nb")
    )
    q_full = qn.select(
        F.col(id_col).alias("query_id"), F.col("_emb").alias("ea"), F.col("_nrm").alias("na")
    )
    pairs = (
        cand.join(q_full, "query_id")
        .join(v_full, "neighbor_id")
        .withColumn("cosine", _dot("ea", "eb") / (F.col("na") * F.col("nb")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def train_ivf_centroids(
    vectors: DataFrame,
    n_centroids: int = 16,
    iters: int = 8,
    seed: int = 42,
    sample: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Driver-side seeded k-means on a deterministic bounded sample — the IVF
    coarse quantizer. The ONLY collect in the similarity ops, and it is
    bounded by ``sample`` rows regardless of table size (at 100 TB you train
    the quantizer on a sample; assignment stays distributed)."""
    rows = (
        vectors.select(id_col, _as_double(vec_col).alias("e"))
        .orderBy(id_col)
        .limit(sample)
        .collect()
    )
    x = np.array([r["e"] for r in rows], dtype=np.float64)
    x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    cent = x[rng.choice(len(x), size=min(n_centroids, len(x)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(x @ cent.T, axis=1)  # cosine on unit vectors
        for c in range(len(cent)):
            members = x[assign == c]
            if len(members):
                m = members.sum(axis=0)
                cent[c] = m / max(np.linalg.norm(m), 1e-12)
    return cent


def _centroid_dots(emb_col, centroids: np.ndarray) -> F.Column:
    """array<double> of dot(emb, centroid_i) — centroid literals fold into the
    plan; scoring is pure JVM."""
    dots = []
    for c in centroids:
        lit = F.array(*[F.lit(float(v)) for v in c])
        dots.append(_dot(emb_col, lit))
    return F.array(*dots)


def ivf_assign(
    df: DataFrame, centroids: np.ndarray, vec_col: str = "_emb", nprobe: int = 1
) -> DataFrame:
    """Add ``cells``: the ``nprobe`` nearest centroid ids (by cosine, unit
    centroids). nprobe=1 for indexing, >1 for query-side probing."""
    dots = _centroid_dots(F.col(vec_col), centroids)
    ranked = F.array_sort(
        F.transform(dots, lambda d, i: F.struct((-d).alias("nd"), i.alias("cell")))
    )
    cells = F.transform(F.slice(ranked, 1, nprobe), lambda s: s["cell"])
    return df.withColumn("cells", cells)


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: vectors live in their nearest-centroid cell;
    each query probes its ``nprobe`` nearest cells and re-ranks exactly.

    Scale path vs brute force: the candidate join is an equi-join on ``cell``
    (shuffle/broadcast by Catalyst) touching ~nprobe/n_centroids of the
    corpus per query instead of all of it."""
    cent = train_ivf_centroids(vectors, n_centroids, seed=seed, id_col=id_col, vec_col=vec_col)
    v = ivf_assign(with_norm(vectors, vec_col), cent, "_emb", nprobe=1).select(
        F.col(id_col).alias("neighbor_id"),
        F.col("_emb").alias("eb"),
        F.col("_nrm").alias("nb"),
        F.col("cells")[0].alias("cell"),
    )
    q = ivf_assign(with_norm(queries, vec_col), cent, "_emb", nprobe=nprobe).select(
        F.col(id_col).alias("query_id"),
        F.col("_emb").alias("ea"),
        F.col("_nrm").alias("na"),
        F.explode("cells").alias("cell"),
    )
    pairs = (
        q.join(v, "cell")
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
