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


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_partition_invariant(name, spark, sf_dir):
    spec = QUERIES[name]
    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "1")
        a = _norm(spec.fn(spark, sf_dir).collect())
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        b = _norm(spec.fn(spark, sf_dir).collect())
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
    assert a == b, f"{name}: result depends on shuffle parallelism"
