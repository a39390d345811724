"""Bounded-memory sketches — the engine's analog of Decaton's KeyCounter.

Reference: per-key quota estimation uses a conservative-update
Count-Min sketch with xx3 hashing, ε=5e-5, δ=1e-5
(``processor/.../runtime/internal/KeyCounter.java:76-151``,
``PerKeyQuotaManager.java:36-51``).

Two Spark-native forms:

- ``cm_sketch_table``: the sketch *as a DataFrame* — (depth, bucket,
  count) rows built by one groupBy; estimates come from a min-over-depth
  join. Fully distributed, mergeable (sketches union by summing
  buckets), and oracle-checkable because bucket routing uses the
  cross-engine md5 hash.
- ``spark_cms``: wraps Spark's built-in ``DataFrame.stat.countMinSketch``
  (JVM implementation) for driver-side state in streaming quota.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from decaton_spark.functions.hashing import md5_bucket


def cm_sketch_table(
    df: DataFrame,
    key_col: str = "key",
    *,
    depth: int = 4,
    width: int = 64,
) -> DataFrame:
    """Materialize a Count-Min sketch as (depth, bucket, cnt) rows.

    One wide groupBy (map-side combinable); the sketch size is
    depth×width regardless of key cardinality — the point of CM.
    """
    rows = [
        F.struct(
            F.lit(d).alias("depth"),
            F.expr(md5_bucket(key_col, width, salt=f"d{d}|")).alias("bucket"),
        )
        for d in range(depth)
    ]
    return (
        df.select(F.explode(F.array(*rows)).alias("db"))
        .select("db.depth", "db.bucket")
        .groupBy("depth", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cm_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str = "key",
    *,
    depth: int = 4,
    width: int = 64,
) -> DataFrame:
    """Point-estimate each key's count: min over depth of its bucket.

    CM guarantees estimate ≥ true count; conservative update tightens
    it further in the streaming path. Join is broadcast (sketch is
    depth×width rows — tiny by construction). ``depth``/``width`` must
    match the sketch's construction (kept explicit — no driver
    round-trip to discover them).
    """
    depths = range(depth)
    probes = keys.select(
        F.col(key_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("depth"),
                        F.expr(md5_bucket(key_col, width, salt=f"d{d}|")).alias(
                            "bucket"
                        ),
                    )
                    for d in depths
                ]
            )
        ).alias("db"),
    ).select(key_col, "db.depth", "db.bucket")
    joined = probes.join(F.broadcast(sketch), ["depth", "bucket"], "left").fillna(
        {"cnt": 0}
    )
    return joined.groupBy(key_col).agg(F.min("cnt").alias("estimate"))


def spark_cms(df: DataFrame, key_col: str = "key", eps: float = 5e-5, delta: float = 1e-5, seed: int = 42):
    """Spark's JVM CountMinSketch over a column — the streaming-state
    form (serializable, mergeable across microbatches)."""
    return df.stat.countMinSketch(key_col, eps=eps, confidence=1 - delta, seed=seed)


def cm_params(epsilon: float = 5e-5, delta: float = 1e-5) -> tuple[int, int]:
    """(depth, width) from the accuracy contract, exactly the
    reference's derivation (``PerKeyQuotaManager.java:36-51``,
    ``KeyCounter.java:76-130``): width = first power of two larger
    than e/ε (power of two so bucket routing is a bitmask), depth =
    ceil(ln(1/δ)). The reference defaults (ε=5e-5, δ=1e-5) give
    (12, 65536) — a ~12 MB long[] per window, the bound that makes
    per-key counting memory-safe at any key cardinality."""
    import math

    width = 1
    while width <= math.e / epsilon:
        width <<= 1
    depth = math.ceil(math.log(1.0 / delta))
    return depth, width
