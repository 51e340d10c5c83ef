"""Similarity search over embedding columns (``array<float>``).

- ``cosine_topk``: brute-force exact top-k — the correctness baseline.
  Query side is broadcast (queries are few); the dot product runs JVM-side
  via ``zip_with``/``aggregate`` in doubles, no Python.
- ``lsh_topk``: random-hyperplane LSH bucketing — the scale path. Each
  vector hashes to a signed-projection bit signature; candidates share a
  bucket; exact cosine re-ranks within buckets. At 100 TB the bucket join
  replaces the O(N*Q) crossJoin with O(N) bucketing + skew-safe equi-join.

Hyperplanes are generated deterministically from xxhash64(seed, plane, dim)
so results are partitioning-independent (no Math.random on executors).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a, b) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    -> (query_id, neighbor_id, rank, score). Self-matches excluded.
    ``queries`` is broadcast (small); ranking window per query id.
    """
    from pyspark.sql import Window

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    base = embeddings.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nvec"))
    scored = (
        base.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("score", _dot(F.col("qvec"), F.col("nvec")) / (_norm(F.col("qvec")) * _norm(F.col("nvec"))))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("score", 6).alias("score"))
    )


def _rhp_signature(vec: Column, dim: int, n_planes: int, seed: int = 42) -> Column:
    """Random-hyperplane bit signature: bit p = sign(vec . h_p) where
    h_p[d] in {-1,+1} derives from xxhash64(seed, p, d). JVM-side only."""
    bits = []
    for p in range(n_planes):
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda x, d: x.cast("double")
                * F.when(F.xxhash64(F.lit(seed), F.lit(p), d) % 2 == 0, 1.0).otherwise(-1.0),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(proj >= 0, F.lit(1 << p)).otherwise(F.lit(0)))
    sig = bits[0]
    for b in bits[1:]:
        sig = sig + b
    return sig


def lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    dim: int = 64,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: random-hyperplane bucket join + exact re-rank.

    Recall is tunable via n_planes (fewer planes = bigger buckets = higher
    recall, more compute). -> (query_id, neighbor_id, rank, score).
    """
    from pyspark.sql import Window

    base = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("nvec"),
        _rhp_signature(F.col(vec_col), dim, n_planes).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        _rhp_signature(F.col(vec_col), dim, n_planes).alias("bucket"),
    )
    scored = (
        base.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "score",
            _dot(F.col("qvec"), F.col("nvec")) / (_norm(F.col("qvec")) * _norm(F.col("nvec"))),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("score", 6).alias("score"))
    )
