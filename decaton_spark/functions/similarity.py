"""Similarity search over embedding columns (``array<float>``).

Two paths, mirroring what a 100 TB pipeline needs:

- brute-force cosine top-k — the exact baseline. The query set is tiny
  and broadcast; candidates stream map-side (a broadcast nested-loop
  join Catalyst chooses automatically), so there is exactly one shuffle:
  the per-query top-k aggregation.
- LSH-bucketed ANN — random-hyperplane signs bucket the corpus; search
  touches only the query's bucket. Bucketing is a narrow projection;
  the bucket id doubles as a partition/cluster key at scale.

Dot products use ``F.zip_with`` + ``F.aggregate`` (sequential fold, so
the oracle's element-ordered sum matches bit-for-bit up to rounding;
results are rounded before ranking to keep rank order engine-stable).
No Python UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

EMB = "embedding"


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product of two float arrays (as double)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    df: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = EMB,
    round_digits: int = 4,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    ``queries`` (small) is broadcast; the corpus is never shuffled —
    only the (query_id, candidate) pairs reduce through the top-k
    window. Ties break by neighbor id after rounding, so ranking is
    deterministic and oracle-reproducible.
    """
    # norms hoisted to per-vector projections: O(Q+C) instead of O(Q*C)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        norm(F.col(vec_col)).alias("q_norm"),
    )
    c = df.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        norm(F.col(vec_col)).alias("c_norm"),
    )
    pairs = c.crossJoin(F.broadcast(q)).filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    sim = F.round(
        dot(F.col("q_vec"), F.col("c_vec")) / (F.col("q_norm") * F.col("c_norm")),
        round_digits,
    )
    scored = pairs.select("query_id", "neighbor_id", sim.alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


def hyperplane_bucket(
    vec_col: str = EMB, dims: tuple[int, ...] = (0, 1, 2, 3)
) -> Column:
    """Sign-of-coordinate LSH bucket id (2^len(dims) buckets).

    Uses coordinate hyperplanes (sign of dim d) — deterministic and
    oracle-expressible; swapping in seeded random hyperplanes is a
    dot-product per plane with the same downstream shape.
    """
    bucket = F.lit(0)
    for i, d in enumerate(dims):
        bit = F.when(F.element_at(F.col(vec_col), d + 1) > 0, F.lit(1)).otherwise(
            F.lit(0)
        )
        bucket = bucket + bit * (2**i)
    return bucket.cast("int")


def lsh_bucket_stats(
    df: DataFrame, *, vec_col: str = EMB, dims: tuple[int, ...] = (0, 1, 2, 3)
) -> DataFrame:
    """Bucket occupancy — the partition plan an ANN query routes by."""
    return (
        df.withColumn("bucket", hyperplane_bucket(vec_col, dims))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_vectors"))
    )


def lsh_topk(
    df: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = EMB,
    dims: tuple[int, ...] = (0, 1, 2, 3),
    round_digits: int = 4,
) -> DataFrame:
    """ANN top-k: brute force restricted to the query's LSH bucket.

    The bucket equality join replaces the cross join — at scale this is
    a co-partitioned hash join on bucket id touching 1/2^len(dims) of
    the corpus per query.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        norm(F.col(vec_col)).alias("q_norm"),
        hyperplane_bucket(vec_col, dims).alias("bucket"),
    )
    c = df.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        norm(F.col(vec_col)).alias("c_norm"),
        hyperplane_bucket(vec_col, dims).alias("bucket"),
    )
    pairs = c.join(F.broadcast(q), "bucket").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    sim = F.round(
        dot(F.col("q_vec"), F.col("c_vec")) / (F.col("q_norm") * F.col("c_norm")),
        round_digits,
    )
    scored = pairs.select("query_id", "neighbor_id", sim.alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


def embedding_near_dups(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = EMB,
    threshold: float = 0.95,
    max_id: int | None = None,
    round_digits: int = 4,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cos ≥ t).

    Quadratic verifier — at scale it runs within LSH buckets (join on
    ``hyperplane_bucket`` first); ``max_id`` bounds the fixture cohort.
    """
    base = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    if max_id is not None:
        base = base.filter(F.col("id") < max_id)
    base = base.withColumn("n", norm(F.col("v")))
    a = base.select(
        F.col("id").alias("id_a"), F.col("v").alias("v_a"), F.col("n").alias("n_a")
    )
    b = base.select(
        F.col("id").alias("id_b"), F.col("v").alias("v_b"), F.col("n").alias("n_b")
    )
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    sim = F.round(
        dot(F.col("v_a"), F.col("v_b")) / (F.col("n_a") * F.col("n_b")), round_digits
    )
    return pairs.select("id_a", "id_b", sim.alias("cosine")).filter(
        F.col("cosine") >= threshold
    )
