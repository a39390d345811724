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


def heavy_hitters(
    df: DataFrame,
    key_col: str = "key",
    *,
    threshold: int,
    depth: int = 4,
    width: int = 64,
) -> DataFrame:
    """Exact frequency heavy hitters (keys with count >= threshold)
    via candidate generation + verification — the batch analog of the
    reference's burst-key detection (``PerKeyQuotaManager.record()``,
    ``processor/.../runtime/internal/PerKeyQuotaManager.java:112-135``:
    a key whose CM-estimated rate crosses the quota is shaped).

    Output is EXACT and partition-invariant; the sketch only prunes.

    Three stages, each with a no-false-negative guarantee:

    1. **Pigeonhole candidates** — count per (input-partition, key)
       with map-side combine (the partition id confines each group to
       one mapper, so the partial aggregate is already final and the
       shuffle carries one row per locally-distinct key). A key with
       global count >= T must have count >= ceil(T/P) in at least one
       of P partitions, so filtering local counts < ceil(T/P) cannot
       drop a true heavy hitter — under ANY partitioning.
    2. **CM prune** — estimate each candidate against a
       ``cm_sketch_table`` (depth x width rows, bounded regardless of
       key cardinality). CM never underestimates, so dropping
       estimate < T is safe.
    3. **Exact verify** — count only rows whose key survives (left
       semi join against the broadcast candidate set), keep
       count >= T. Removes every false positive.

    At 100 TB: stage 1's shuffle is bounded by per-partition distinct
    keys after a >=ceil(T/P) filter (tiny for meaningful T); stage 2
    shuffles depth x width sketch rows; stage 3 shuffles only the
    heavy keys' rows. No stage materializes the full key dictionary
    with counts the way a naive groupBy-then-filter would keep it.

    The key projection is materialized once (lazy localCheckpoint —
    the persisted key-log at cluster scale): candidates, sketch, and
    verify all read it, so the source scans once, not three times.
    """
    # narrow projection before the RDD probe: converting the full plan
    # to an RDD costs ~1 s of py4j/plan work; the key column alone is
    # ~20x cheaper and has the same partitioning
    keys = df.select(key_col)
    n_parts = max(1, keys.rdd.getNumPartitions())
    local_t = max(1, -(-threshold // n_parts))  # ceil(T / P)
    keys = keys.localCheckpoint(eager=False)
    local = (
        keys.groupBy(F.spark_partition_id().alias("pid"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= local_t)
        .select(key_col)
        .distinct()
    )
    sketch = cm_sketch_table(keys, key_col, depth=depth, width=width)
    est = cm_estimate(sketch, local, key_col, depth=depth, width=width)
    candidates = est.filter(F.col("estimate") >= threshold).select(key_col)
    return (
        keys.join(F.broadcast(candidates), key_col, "left_semi")
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= threshold)
    )
