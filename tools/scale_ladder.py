"""Measured scaling evidence: time the heaviest registry queries at
sf0.1 and at 10x / 100x replicated fixtures (sf1 / sf10-equivalent row
counts) and report the growth factors. Near-linear growth per decade
(<= ~12x, allowing fixed costs) is the pass bar; anything worse names
a plan that would not survive a real scale-up. Two measured decades
(sf0.1 -> x10 -> x100) is the strongest local evidence available that
the plans extrapolate to cluster scale.

Fixture construction (deterministic; the only randomness is seeded
``random.Random(SEED + r)``, so fixtures are bit-reproducible):
- documents: doc_id offset by replica * max_id; the text of replica r
  has its letters mapped through a seeded alphabet permutation (a
  DIFFERENT permutation per replica) so replicas are NOT
  near-duplicates of each other — the dedup clusters keep their
  in-replica structure instead of collapsing into artificial
  mega-clusters that would quadratically distort the LSH-bucket
  workload.
- embeddings: vec_id offset; each replica's vectors scaled by
  (1 + r/1000) so no cross-replica exact duplicates appear.
- events: event_id offset; user_id kept (more events per user = the
  realistic shape of a bigger scale factor).
- lineitem/orders: orderkey offset by replica * max_orderkey;
  dimension tables are copied as-is (dimensions grow much slower than
  facts).

User-growth rung (``--users``): the x10/x100 fixtures above keep the
USER POPULATION fixed (more events per user), so they never exercise
growth in |users| — the dimension that stresses per-user window state
and the global-rank family. The ``u10`` fixture replicates events 100×
with user_id offset by (replica % 10) · max_user: **10× users AND 10×
events per user** (100× rows total). Orders get the same treatment on
o_custkey. Only events/orders/dims are built (the per-user family
touches nothing else); growth_u10 therefore compares a 100×-row,
10×-key workload against the sf0.1 base.

Usage:
    python tools/scale_ladder.py              # x10 rung (default)
    python tools/scale_ladder.py --x100       # x10 AND x100 rungs
    python tools/scale_ladder.py --users      # u10 user-growth rung
                                              # (default query set:
                                              # USER_FAMILY)
    python tools/scale_ladder.py --rebuild    # force fixture rebuild
    python tools/scale_ladder.py --only a,b   # ladder only queries a,b
                                              # (merges into the existing
                                              # SCALE_LADDER.json)

Writes SCALE_LADDER.json next to the repo root and prints the table.
"""

from __future__ import annotations

import json
import os
import random
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from decaton_spark import get_spark, load_table  # noqa: E402
from decaton_spark.queries import _ALL_QUERIES  # noqa: E402

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SEED = 1337
RUNGS = {10: "/tmp/decaton_scale_x10", 100: "/tmp/decaton_scale_x100"}
U10_DIR = "/tmp/decaton_scale_u10"
# The per-user window/rank family — the queries whose state or sort
# keys grow with |users|, which the fixed-user x10/x100 rungs never
# test (VERDICT r4 missing #3).
USER_FAMILY = [
    "events_pit_features",
    "events_rolling_zscore",
    "events_rfm_segments",
    "events_power_user_curve",
    "events_first_touch_attribution",
    "events_last_touch_attribution",
    "events_linear_attribution",
    "orders_duplicate_payments",
    # round-6 additions: the per-user SESSION/state queries from the
    # round-6 tier — their per-user windows (gap islands, lag chains,
    # basket pairs, per-user vectors/sketches) grow with BOTH events
    # per user and |users|, which only this fixture exercises; all
    # read events + dims only, the tables the u10 fixture builds
    "events_trajectories",
    "events_trajectory_dedup",
    "events_assoc_pairs",
    "events_markov_stationary",
    "users_behavior_similarity",
    "events_covisitation_recs",
    "events_covisitation_eval",
    "events_dau_mau_stickiness",
    "events_kmv_user_overlap",
]
HEAVY = [
    "corpus_merge_neardup",
    "dedup_near_full",
    "ann_ivf_pq_topk",
    "docs_curation_pipeline",
    "q21_waiting_suppliers",
    "docs_decontaminate_bloom",
    "dedup_exact_substring",
]
ALPHA = "abcdefghijklmnopqrstuvwxyz"


def _perm(r: int) -> str:
    """Seeded alphabet permutation for replica r (distinct per replica
    with overwhelming probability; deterministic across runs)."""
    letters = list(ALPHA)
    random.Random(SEED + r).shuffle(letters)
    return "".join(letters)


def _replicas(df, n):
    """UNION of n tagged replicas via an exploded literal array — one
    scan feeding an n-way multiply, no driver loop of unions."""
    return df.select(
        F.explode(F.array(*[F.lit(i) for i in range(n)])).alias("_r"), "*"
    )



def _healthy_width(base_table_file: str, replicas: int,
                   target_bytes: int = 4 * 1024 * 1024) -> int:
    """Output-file count for a replicated fixture (VERDICT r9 #9 /
    guide §6): the old single-partition write produced ONE ~90 MB file
    with ONE row group at x100, so every scan collapsed to 1-2 tasks
    and decode-bound queries (orders_backlog_sweepline: ~59 s) could
    not parallelize no matter how the query was written. Each ~4 MB
    output file is one row group = one scan split — the stand-in for
    the many-row-group layout a real 100 TB table has — so the x100
    documents/embeddings tables (~60-90 MB) still give every core a
    split, while tiny x10 tables stay at a handful of files.
    Deterministic: a pure function of the base fixture size."""
    base = os.path.getsize(base_table_file)
    return max(1, (base * replicas) // target_bytes)

def build_fixture(spark, dest: str, replicas: int) -> None:
    if os.path.exists(dest):
        shutil.rmtree(dest)
    os.makedirs(dest)
    for t in ["region", "nation", "customer", "supplier", "part"]:
        src = os.path.join(BASE, f"{t}.parquet")
        shutil.copy(src, os.path.join(dest, f"{t}.parquet"))

    docs = load_table(spark, "documents", BASE)
    max_doc = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    perms = ", ".join(f"'{_perm(i)}'" for i in range(replicas))
    (
        _replicas(docs, replicas)
        .withColumn("doc_id", F.col("doc_id") + F.col("_r") * F.lit(max_doc))
        .withColumn(
            "text",
            F.expr(
                f"translate(text, '{ALPHA}', "
                f"element_at(array({perms}), _r + 1))"
            ),
        )
        .drop("_r")
        .repartition(
            _healthy_width(os.path.join(BASE, "documents.parquet"), replicas),
            "doc_id",
        )
        .write.parquet(os.path.join(dest, "documents.parquet"))
    )

    emb = load_table(spark, "embeddings", BASE)
    max_vec = emb.agg(F.max("vec_id")).collect()[0][0] + 1
    (
        _replicas(emb, replicas)
        .withColumn("vec_id", F.col("vec_id") + F.col("_r") * F.lit(max_vec))
        .withColumn(
            "embedding",
            F.transform(
                "embedding",
                lambda x: x * (F.lit(1.0) + F.col("_r") / F.lit(1000.0)),
            ),
        )
        .drop("_r")
        .repartition(
            _healthy_width(os.path.join(BASE, "embeddings.parquet"), replicas),
            "vec_id",
        )
        .write.parquet(os.path.join(dest, "embeddings.parquet"))
    )

    ev = spark.read.parquet(os.path.join(BASE, "events.parquet"))
    max_ev = ev.agg(F.max("event_id")).collect()[0][0] + 1
    (
        _replicas(ev, replicas)
        .withColumn("event_id", F.col("event_id") + F.col("_r") * F.lit(max_ev))
        .drop("_r")
        .repartition(
            _healthy_width(os.path.join(BASE, "events.parquet"), replicas),
            "event_id",
        )
        .write.parquet(os.path.join(dest, "events.parquet"))
    )

    orders = load_table(spark, "orders", BASE)
    max_ord = orders.agg(F.max("o_orderkey")).collect()[0][0] + 1
    (
        _replicas(orders, replicas)
        .withColumn(
            "o_orderkey", F.col("o_orderkey") + F.col("_r") * F.lit(max_ord)
        )
        .drop("_r")
        .repartition(
            _healthy_width(os.path.join(BASE, "orders.parquet"), replicas),
            "o_orderkey",
        )
        .write.parquet(os.path.join(dest, "orders.parquet"))
    )
    li = load_table(spark, "lineitem", BASE)
    (
        _replicas(li, replicas)
        .withColumn(
            "l_orderkey", F.col("l_orderkey") + F.col("_r") * F.lit(max_ord)
        )
        .drop("_r")
        .repartition(
            _healthy_width(os.path.join(BASE, "lineitem.parquet"), replicas),
            "l_orderkey",
        )
        .write.parquet(os.path.join(dest, "lineitem.parquet"))
    )
    _stamp_fixture(dest, replicas)


def build_user_fixture(spark, dest: str) -> None:
    """u10: 100 event replicas, user_id += (replica % 10) · max_user —
    10× the user population, each new user with 10× the base per-user
    event volume. Orders mirror it on o_custkey (o_orderkey still
    offsets per replica so keys stay unique). Only events, orders and
    the small dims are built — the per-user family reads nothing
    else, and customer-FK consumers must not run on this fixture."""
    if os.path.exists(dest):
        shutil.rmtree(dest)
    os.makedirs(dest)
    for t in ["region", "nation", "customer", "supplier", "part"]:
        shutil.copy(
            os.path.join(BASE, f"{t}.parquet"),
            os.path.join(dest, f"{t}.parquet"),
        )
    ev = spark.read.parquet(os.path.join(BASE, "events.parquet"))
    max_ev = ev.agg(F.max("event_id")).collect()[0][0] + 1
    max_user = ev.agg(F.max("user_id")).collect()[0][0] + 1
    (
        _replicas(ev, 100)
        .withColumn("event_id", F.col("event_id") + F.col("_r") * F.lit(max_ev))
        .withColumn(
            "user_id",
            F.col("user_id") + (F.col("_r") % 10) * F.lit(max_user),
        )
        .drop("_r")
        .repartition(
            _healthy_width(os.path.join(BASE, "events.parquet"), 100),
            "event_id",
        )
        .write.parquet(os.path.join(dest, "events.parquet"))
    )
    orders = load_table(spark, "orders", BASE)
    max_ord = orders.agg(F.max("o_orderkey")).collect()[0][0] + 1
    max_cust = orders.agg(F.max("o_custkey")).collect()[0][0] + 1
    (
        _replicas(orders, 100)
        .withColumn(
            "o_orderkey", F.col("o_orderkey") + F.col("_r") * F.lit(max_ord)
        )
        .withColumn(
            "o_custkey",
            F.col("o_custkey") + (F.col("_r") % 10) * F.lit(max_cust),
        )
        .drop("_r")
        .repartition(
            _healthy_width(os.path.join(BASE, "orders.parquet"), 100),
            "o_orderkey",
        )
        .write.parquet(os.path.join(dest, "orders.parquet"))
    )
    _stamp_fixture(dest, "u10")


def _fixture_meta(replicas) -> dict:
    """Identity stamp for a built rung fixture: the inputs that make
    the fixture what it is. Written LAST by the build (so a crash
    mid-build leaves no stamp and the fixture reads as stale) and
    compared on reuse — a regenerated BASE (different fingerprint),
    changed SEED, or half-built /tmp directory can no longer be
    silently reused, mixing data generations across ladder runs
    (self-review r7)."""
    from decaton_spark.sources import fixture_fingerprint

    return {
        "seed": SEED,
        "replicas": replicas,
        "base": BASE,
        "base_fp": fixture_fingerprint(BASE),
        # bump when the physical layout recipe changes (round 10:
        # multi-file ~4 MB writes replaced the single 90 MB one-row-
        # group file) so stale-layout fixtures rebuild instead of
        # silently reusing the old physical shape
        "layout": "multifile-4mb-v3",
    }


def _stamp_fixture(dest: str, replicas) -> None:
    with open(os.path.join(dest, "_FIXTURE_META.json"), "w") as fh:
        json.dump(_fixture_meta(replicas), fh)


def _fixture_fresh(dest: str, replicas) -> bool:
    meta_path = os.path.join(dest, "_FIXTURE_META.json")
    if not os.path.exists(meta_path):
        return False
    try:
        with open(meta_path) as fh:
            got = json.load(fh)
    except (OSError, ValueError):
        return False
    return got == _fixture_meta(replicas)


def _prewarm_stores(spark, sf_dir: str) -> None:
    """Offline index builds (IVF centroids, PQ codebooks) are once-per-
    corpus jobs at scale; build them outside the timed window, exactly
    as bench.py does. Skipped when no selected query touches the
    embedding table."""
    from decaton_spark.functions import similarity as sim
    from decaton_spark.queries import _pq_books

    if not any(n.startswith(("ann_", "dedup_semantic", "emb_", "hybrid_"))
               for n in _selected()):
        return
    emb = load_table(spark, "embeddings", sf_dir)
    sim.trained_centroids(
        emb, dataset=f"{sf_dir}/embeddings", nlist=16, iters=2
    )
    _pq_books(emb, sf_dir)


def _selected() -> list[str]:
    names: list[str] | None = None
    for i, a in enumerate(sys.argv):
        if a == "--only":
            if i + 1 >= len(sys.argv):
                sys.exit("usage: --only name1,name2")
            names = sys.argv[i + 1].split(",")
        elif a.startswith("--only="):
            names = a.split("=", 1)[1].split(",")
    if names is None:
        return USER_FAMILY if "--users" in sys.argv else HEAVY
    names = [n for n in names if n]
    unknown = [n for n in names if n not in _ALL_QUERIES]
    if not names or unknown:
        sys.exit(f"--only: empty or unknown queries {unknown}")
    return names


def time_queries(spark, sf_dir: str) -> dict[str, float]:
    _prewarm_stores(spark, sf_dir)
    out: dict[str, float] = {}
    for name in _selected():
        fn = _ALL_QUERIES[name].fn
        best = None
        for _ in range(2):  # keep-min: strips cross-charged GC/JIT noise
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            sec = time.perf_counter() - t0
            best = sec if best is None else min(best, sec)
        out[name] = round(best, 3)
        print(f"  {sf_dir} {name}: {out[name]}s", flush=True)
        # drop the Python references to the finished query's frames so
        # the ContextCleaner can free their checkpoint/persist blocks
        # before the next rung — a long --only list over the x100
        # fixture otherwise accumulates blocks until the heap blows
        # (measured: OOM ~60 rungs into a 21-query x100 sweep)
        import gc

        gc.collect()
        spark.sparkContext._jvm.System.gc()
    return out


def main() -> None:
    if "--users" in sys.argv:
        if "--x100" in sys.argv:
            sys.exit("--users is its own rung; run --x100 separately")
        bad = [n for n in _selected() if n not in USER_FAMILY]
        if bad:
            sys.exit(
                f"--users fixture only builds events/orders/dims; these"
                f" queries read other tables and must ladder on the"
                f" x10/x100 rungs instead: {bad}"
            )
    spark = get_spark("decaton-scale-ladder")
    if "--users" in sys.argv:
        rung_keys: list[str] = ["u10"]
        rung_dirs = {"u10": U10_DIR}
        if "--rebuild" in sys.argv or not _fixture_fresh(U10_DIR, "u10"):
            print("building u10 fixture ...", flush=True)
            t0 = time.perf_counter()
            build_user_fixture(spark, U10_DIR)
            print(f"u10 built in {time.perf_counter() - t0:.1f}s", flush=True)
    else:
        ns = [10, 100] if "--x100" in sys.argv else [10]
        rung_keys = [f"x{n}" for n in ns]
        rung_dirs = {f"x{n}": RUNGS[n] for n in ns}
        for n in ns:
            dest = RUNGS[n]
            if "--rebuild" in sys.argv or not _fixture_fresh(dest, n):
                print(f"building x{n} fixture ...", flush=True)
                t0 = time.perf_counter()
                build_fixture(spark, dest, n)
                print(
                    f"x{n} built in {time.perf_counter() - t0:.1f}s", flush=True
                )

    timings = {"base": time_queries(spark, BASE)}
    for k in rung_keys:
        timings[k] = time_queries(spark, rung_dirs[k])

    table = {}
    for q in _selected():
        row = {"sf0.1_sec": timings["base"][q]}
        for k in rung_keys:
            row[f"{k}_sec"] = timings[k][q]
            row[f"growth_{k}"] = (
                round(timings[k][q] / timings["base"][q], 2)
                if timings["base"][q]
                else None
            )
        table[q] = row
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALE_LADDER.json",
    )
    merged_queries = dict(table)
    merged_rungs = dict(rung_dirs)
    if os.path.exists(path):
        with open(path) as fh:
            prior = json.load(fh)
        # merge only when the prior file measured the same fixtures —
        # a changed BASE/SEED invalidates every prior number
        if prior.get("base_dir") == BASE and prior.get("seed") == SEED:
            for q, row in prior.get("queries", {}).items():
                # rung-level merge: a re-ladder without --x100 must not
                # erase a query's previously measured x100 columns
                merged_queries[q] = {**row, **merged_queries.get(q, {})}
            merged_rungs = {**prior.get("rungs", {}), **merged_rungs}
    for row in merged_queries.values():  # growths consistent post-merge
        base_sec = row.get("sf0.1_sec")
        for k in ("x10", "x100", "u10"):
            if base_sec and f"{k}_sec" in row:
                row[f"growth_{k}"] = round(row[f"{k}_sec"] / base_sec, 2)
    result = {
        "base_dir": BASE,
        "rungs": merged_rungs,
        "seed": SEED,
        "queries": merged_queries,
    }
    with open(path, "w") as fh:
        json.dump(result, fh, indent=1, sort_keys=True)
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
