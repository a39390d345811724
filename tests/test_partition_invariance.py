"""Partition-invariance gate over the full driver tier.

The DuckDB oracle comparison pins each query's values at ONE Spark
parallelism; this gate pins that the values do not depend on the
parallelism at all — the engine's determinism claims (DECIMAL sums,
rounded-then-summed scores, scaled-integer centroids, tie-broken
rankings, pigeonhole+verify exactness) say results are bit-identical
whether an aggregation runs in 1 shuffle partition or 17. A query
that silently depended on float aggregation order or partition-local
luck fails here before the driver (local[8]) or a 1000-executor
cluster can disagree with the bench (local[32]) about its answer.

Two gate-integrity rules learned in round 7 (self-review — both made
the original gate compare a computation to itself):

- **AQE partition coalescing is disabled for both legs.** With
  ``spark.sql.adaptive.coalescePartitions.enabled=true`` (the engine
  default) every sub-1MB shuffle at test scale coalesces to ONE
  output partition regardless of ``shuffle.partitions``, so the 1-
  and 17-partition legs executed identically and the gate was
  vacuous. ``test_invariance_legs_actually_differ`` pins that the
  legs really run at different parallelism on this build.
- **Per-dataset memo caches are cleared between legs**, and the
  on-disk centroid store is redirected per leg: otherwise leg B
  replays centroids/codebooks/count probes computed by leg A and the
  training paths — explicitly named in the determinism claims — are
  exempt from the check. Training twice per query is the cost of
  actually testing it (env-gated sweep; the within-leg process cache
  still dedups repeated calls).
"""

from __future__ import annotations

import math
import os

import pytest

from decaton_spark.queries import EXTRA_QUERIES, QUERIES

# default: the 50-query driver tier (what the driver verifies this
# round). DECATON_FULL_INVARIANCE=1 sweeps the whole registry — run it
# before a tier rotation so queries promoted next round are already
# proven parallelism-independent.
if os.environ.get("DECATON_FULL_INVARIANCE") == "1":
    QUERIES = {**QUERIES, **EXTRA_QUERIES}


def _norm(rows):
    out = []
    for r in rows:
        vals = []
        for v in r:
            if isinstance(v, float) and math.isnan(v):
                v = "NaN"
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=repr)


def _clear_dataset_caches():
    """Reset every per-dataset memo so each leg recomputes its own
    derived artifacts (centroids, PQ books, corpus-count probes)."""
    from decaton_spark.functions import similarity as sim
    from decaton_spark import queries as q

    sim._CENTROID_CACHE.clear()
    q._PQ_BOOK_CACHE.clear()
    q._BITEXT_COUNT_CACHE.clear()


class _leg:
    """Context: run one invariance leg at a given shuffle parallelism
    with AQE coalescing off and a leg-private centroid store."""

    def __init__(self, spark, tmp_path, n: str):
        self.spark, self.tmp, self.n = spark, tmp_path, n

    def __enter__(self):
        c = self.spark.conf
        self.before = {
            "spark.sql.shuffle.partitions": c.get("spark.sql.shuffle.partitions"),
            "spark.sql.adaptive.coalescePartitions.enabled": c.get(
                "spark.sql.adaptive.coalescePartitions.enabled"
            ),
        }
        c.set("spark.sql.shuffle.partitions", self.n)
        c.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
        from decaton_spark.functions import similarity as sim

        self._dir_before = sim._CENTROID_DIR
        leg_dir = os.path.join(str(self.tmp), f"centroids_p{self.n}")
        sim._CENTROID_DIR = leg_dir
        _clear_dataset_caches()
        return self

    def __exit__(self, *exc):
        for k, v in self.before.items():
            self.spark.conf.set(k, v)
        from decaton_spark.functions import similarity as sim

        sim._CENTROID_DIR = self._dir_before
        _clear_dataset_caches()
        return False


def test_invariance_legs_actually_differ(spark, tmp_path):
    """The two legs must execute at genuinely different reduce
    parallelism — guards the AQE-coalescing vacuity this gate shipped
    with (both legs collapsing to 1 partition at test scale)."""
    from pyspark.sql import functions as F

    def reduce_partitions(n: str) -> int:
        with _leg(spark, tmp_path, n):
            df = (
                spark.range(10_000)
                .groupBy((F.col("id") % 97).alias("k"))
                .agg(F.count(F.lit(1)).alias("c"))
                .select(F.spark_partition_id().alias("pid"))
                .distinct()
            )
            return df.count()

    assert reduce_partitions("1") == 1
    assert reduce_partitions("17") == 17, (
        "17-partition leg coalesced — the invariance gate would be "
        "comparing a computation to itself"
    )


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_partition_invariant(name, spark, sf_dir, tmp_path):
    spec = QUERIES[name]
    with _leg(spark, tmp_path, "1"):
        a = _norm(spec.fn(spark, sf_dir).collect())
    with _leg(spark, tmp_path, "17"):
        b = _norm(spec.fn(spark, sf_dir).collect())
    assert a == b, f"{name}: result depends on shuffle parallelism"
