"""Measured scaling evidence: time the heaviest registry queries at
sf0.1 and at a 10x-replicated fixture (sf1-equivalent row counts) and
report the growth factor. Near-linear (<= ~12x, allowing fixed costs)
is the pass bar; anything worse names a plan that would not survive a
real scale-up.

Fixture construction (deterministic, no RNG):
- documents: 10 replicas, doc_id offset by replica * max_id; the text
  of replica r has its letters rotated via ``translate`` (a different
  letter permutation per replica) so replicas are NOT near-duplicates
  of each other — the dedup clusters keep their in-replica structure
  instead of collapsing into artificial 10-member mega-clusters that
  would quadratically distort the LSH-bucket workload.
- embeddings: vec_id offset; each replica's vectors scaled by
  (1 + r/1000) so no cross-replica exact/semantic duplicates appear.
- events: event_id offset; user_id kept (10x events per user = the
  realistic shape of a bigger scale factor).
- lineitem/orders: orderkey offset by replica * max_orderkey; dimension
  tables are copied as-is (dimensions grow much slower than facts).

Usage:  python tools/scale_ladder.py [--rebuild]
Writes SCALE_LADDER.json next to the repo root and prints the table.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from decaton_spark import get_spark, load_table  # noqa: E402
from decaton_spark.queries import _ALL_QUERIES  # noqa: E402

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
X10 = "/tmp/decaton_scale_x10"
REPLICAS = 10
HEAVY = [
    "corpus_merge_neardup",
    "dedup_near_full",
    "ann_ivf_pq_topk",
    "docs_curation_pipeline",
    "q21_waiting_suppliers",
]
ALL_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]
ALPHA = "abcdefghijklmnopqrstuvwxyz"


def _replicas(df, n):
    """UNION of n tagged replicas via an exploded literal array — one
    scan feeding an n-way multiply, no driver loop of unions."""
    return df.select(
        F.explode(F.array(*[F.lit(i) for i in range(n)])).alias("_r"), "*"
    )


def build_fixture(spark) -> None:
    if os.path.exists(X10):
        shutil.rmtree(X10)
    os.makedirs(X10)
    for t in ["region", "nation", "customer", "supplier", "part"]:
        src = os.path.join(BASE, f"{t}.parquet")
        shutil.copy(src, os.path.join(X10, f"{t}.parquet"))

    docs = load_table(spark, "documents", BASE)
    max_doc = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    rotations = ", ".join(
        f"'{ALPHA[i:] + ALPHA[:i]}'" for i in range(REPLICAS)
    )
    (
        _replicas(docs, REPLICAS)
        .withColumn("doc_id", F.col("doc_id") + F.col("_r") * F.lit(max_doc))
        .withColumn(
            "text",
            F.expr(
                f"translate(text, '{ALPHA}', "
                f"element_at(array({rotations}), _r + 1))"
            ),
        )
        .drop("_r")
        .write.parquet(os.path.join(X10, "documents.parquet"))
    )

    emb = load_table(spark, "embeddings", BASE)
    max_vec = emb.agg(F.max("vec_id")).collect()[0][0] + 1
    (
        _replicas(emb, REPLICAS)
        .withColumn("vec_id", F.col("vec_id") + F.col("_r") * F.lit(max_vec))
        .withColumn(
            "embedding",
            F.transform(
                "embedding",
                lambda x: x * (F.lit(1.0) + F.col("_r") / F.lit(1000.0)),
            ),
        )
        .drop("_r")
        .write.parquet(os.path.join(X10, "embeddings.parquet"))
    )

    ev = spark.read.parquet(os.path.join(BASE, "events.parquet"))
    max_ev = ev.agg(F.max("event_id")).collect()[0][0] + 1
    (
        _replicas(ev, REPLICAS)
        .withColumn("event_id", F.col("event_id") + F.col("_r") * F.lit(max_ev))
        .drop("_r")
        .write.parquet(os.path.join(X10, "events.parquet"))
    )

    orders = load_table(spark, "orders", BASE)
    max_ord = orders.agg(F.max("o_orderkey")).collect()[0][0] + 1
    (
        _replicas(orders, REPLICAS)
        .withColumn(
            "o_orderkey", F.col("o_orderkey") + F.col("_r") * F.lit(max_ord)
        )
        .drop("_r")
        .write.parquet(os.path.join(X10, "orders.parquet"))
    )
    li = load_table(spark, "lineitem", BASE)
    (
        _replicas(li, REPLICAS)
        .withColumn(
            "l_orderkey", F.col("l_orderkey") + F.col("_r") * F.lit(max_ord)
        )
        .drop("_r")
        .write.parquet(os.path.join(X10, "lineitem.parquet"))
    )


def _prewarm_stores(spark, sf_dir: str) -> None:
    """Offline index builds (IVF centroids, PQ codebooks) are once-per-
    corpus jobs at scale; build them outside the timed window, exactly
    as bench.py does."""
    from decaton_spark.functions import similarity as sim
    from decaton_spark.queries import _pq_books

    emb = load_table(spark, "embeddings", sf_dir)
    sim.trained_centroids(
        emb, dataset=f"{sf_dir}/embeddings", nlist=16, iters=2
    )
    _pq_books(emb, sf_dir)


def time_queries(spark, sf_dir: str) -> dict[str, float]:
    _prewarm_stores(spark, sf_dir)
    out: dict[str, float] = {}
    for name in HEAVY:
        fn = _ALL_QUERIES[name].fn
        best = None
        for _ in range(2):  # keep-min: strips cross-charged GC/JIT noise
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            sec = time.perf_counter() - t0
            best = sec if best is None else min(best, sec)
        out[name] = round(best, 3)
    return out


def main() -> None:
    spark = get_spark("decaton-scale-ladder")
    if "--rebuild" in sys.argv or not os.path.exists(X10):
        print("building x10 fixture ...", flush=True)
        t0 = time.perf_counter()
        build_fixture(spark)
        print(f"fixture built in {time.perf_counter() - t0:.1f}s", flush=True)

    base = time_queries(spark, BASE)
    big = time_queries(spark, X10)
    table = {
        n: {
            "sf0.1_sec": base[n],
            "x10_sec": big[n],
            "growth": round(big[n] / base[n], 2) if base[n] else None,
        }
        for n in HEAVY
    }
    result = {"base_dir": BASE, "x10_dir": X10, "replicas": REPLICAS,
              "queries": table}
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALE_LADDER.json",
    )
    with open(path, "w") as fh:
        json.dump(result, fh, indent=1, sort_keys=True)
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
