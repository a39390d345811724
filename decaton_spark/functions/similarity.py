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

import hashlib
import json
import os
import re
import tempfile

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

EMB = "embedding"

#: process-level + on-disk centroid store (see ``trained_centroids``);
#: keys include the dataset's snapshot fingerprint so in-place fixture
#: regeneration invalidates instead of serving stale parameters
_CENTROID_CACHE: dict[tuple, list] = {}
_CENTROID_DIR = os.environ.get(
    "DECATON_SPARK_CENTROID_DIR",
    os.path.join(tempfile.gettempdir(), "decaton_spark_centroids"),
)
#: current artifact filename format: {dataset_hash}_{fp_hash}_{suffix}
_ARTIFACT_NAME = re.compile(r"^[0-9a-f]{12}_[0-9a-f]{12}_.+\.json$")


def _artifact_path(dataset: str, fp: str, suffix: str) -> str:
    """On-disk path for a trained artifact (centroids / PQ codebooks),
    keyed ``{dataset_hash}_{fingerprint_hash}_{suffix}.json``.

    The dataset and fingerprint hashes are SEPARATE filename segments so
    artifacts left behind by earlier fixture generations are
    identifiable: every fixture regeneration changes the fingerprint,
    and the old-tag JSONs would otherwise accumulate in _CENTROID_DIR
    forever (ADVICE r7). Stale siblings — same dataset hash, different
    fingerprint hash — are opportunistically deleted here; losing a
    *live* artifact to a concurrent sweep is harmless (it regenerates
    from the parquet), so no locking is needed.
    """
    dhash = hashlib.md5(dataset.encode()).hexdigest()[:12]
    fphash = hashlib.md5(fp.encode()).hexdigest()[:12]
    if os.path.isdir(_CENTROID_DIR):
        for name in os.listdir(_CENTROID_DIR):
            stale_sibling = name.startswith(f"{dhash}_") and not name.startswith(
                f"{dhash}_{fphash}_"
            )
            # Pre-round-8 artifacts used a single {tag16}_ filename
            # segment and never match the two-segment prefix, so they
            # accumulated forever (ADVICE r8) — sweep any .json that
            # isn't in the current format. In-flight *.tmp files are
            # deliberately NOT matched: deleting a sibling writer's
            # temp file would fail its atomic os.replace.
            legacy_format = name.endswith(".json") and not _ARTIFACT_NAME.match(name)
            if stale_sibling or legacy_format:
                try:
                    os.remove(os.path.join(_CENTROID_DIR, name))
                except OSError:
                    pass  # concurrent worker already swept it
    return os.path.join(_CENTROID_DIR, f"{dhash}_{fphash}_{suffix}.json")


def _load_artifact(path: str):
    """Parsed JSON artifact, or ``None`` when absent or unreadable.

    A plain ``exists() -> open()`` races the stale-sibling sweep: two
    processes working on different fixture generations of the same
    dataset can delete the file between the two calls, turning a cache
    miss into ``FileNotFoundError`` (ADVICE r8). Treat every read
    failure — vanished, truncated by a crashed writer, corrupt — as a
    miss and fall through to retraining; the artifact regenerates from
    the parquet."""
    try:
        with open(path) as f:
            return json.load(f)
    except (OSError, json.JSONDecodeError):
        return None


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


def brute_force_topk_vectorized(
    df: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = EMB,
    round_digits: int = 4,
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact top-k cosine, numpy-vectorized: the compute-bound scale path.

    The query matrix (small) is broadcast to every Arrow batch; each
    ``mapInPandas`` batch computes a (batch × queries) cosine matrix
    with one BLAS matmul and emits only its local top-k per query —
    so the shuffle carries k rows per (query, input partition), not
    the full score matrix. A final per-query top-k reduces.

    Same results as ``brute_force_topk`` (float64 matmul; rounding
    before ranking) at ~an order of magnitude less CPU for wide
    vectors; prefer this at 100 TB, the expression form for oracle
    work.

    ``num_partitions`` hash-spreads the corpus by id before the Arrow
    scoring stage: ``mapInPandas`` inherits the input partitioning, so
    on a source with fewer scan splits than cores the matmul tower
    otherwise collapses to the split count (round-9 stage audit:
    single-task towers at sf0.1). Results are partitioning-independent
    — the per-partition local top-k is a superset filter and the final
    window re-ranks globally.
    """
    import numpy as np

    if num_partitions:
        df = df.repartition(num_partitions, id_col)

    q_rows = queries.select(id_col, vec_col).collect()  # query set is tiny
    q_ids = np.array([r[id_col] for r in q_rows], dtype=np.int64)
    q_mat = np.array([r[vec_col] for r in q_rows], dtype=np.float64)
    q_norm = np.linalg.norm(q_mat, axis=1)
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast((q_ids, q_mat, q_norm))

    out_schema = "query_id long, neighbor_id long, cosine double"

    def score(batches):
        import pandas as pd

        ids, mat, norms = bc.value
        for pdf in batches:
            c_ids = pdf[id_col].to_numpy(dtype=np.int64)
            c_mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            c_norm = np.linalg.norm(c_mat, axis=1)
            cos = (c_mat @ mat.T) / np.outer(c_norm, norms)
            cos = np.round(cos, round_digits)
            parts = []
            for j, qid in enumerate(ids):
                col = cos[:, j]
                mask = c_ids != qid
                cand_ids, cand_cos = c_ids[mask], col[mask]
                if len(cand_ids) > k:  # local top-k prune before shuffle
                    idx = np.lexsort((cand_ids, -cand_cos))[:k]
                else:
                    idx = np.argsort(-cand_cos, kind="stable")
                parts.append(
                    pd.DataFrame(
                        {
                            "query_id": qid,
                            "neighbor_id": cand_ids[idx],
                            "cosine": cand_cos[idx],
                        }
                    )
                )
            yield pd.concat(parts, ignore_index=True)

    scored = df.select(id_col, vec_col).mapInPandas(score, out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


def _centroid_literals(
    centroids: list[tuple[int, list[float]]],
) -> Column:
    """Literal array<struct<cid,cv,cn>> — centroid set inlined into the plan.

    Centroid count is small (IVF nlist), so inlining keeps cell
    assignment a pure projection: no shuffle, no join, evaluated
    map-side inside whole-stage codegen.  Norms are sequential-fold
    sums so they match the oracle's ``list_reduce`` bit-for-bit.

    Built as ONE parsed SQL literal, not composed F.lit/F.struct
    Columns: per-value ``F.lit`` costs a py4j round-trip, and 16
    centroids x 64 dims was >1000 of them — measured 4.7 s of
    DRIVER-side construction+analysis per query build at nlist=16
    (the execution itself was 1.3 s). Same rationale and identical-
    value guarantee as ``_pq_book_sql`` (repr is shortest-round-trip
    decimal; Double.parseDouble returns the same IEEE value).
    """
    structs = []
    for cid, vec in centroids:
        acc = 0.0
        for x in vec:
            acc += float(x) * float(x)
        cv = "array(" + ", ".join(f"{float(x)!r}D" for x in vec) + ")"
        structs.append(
            f"named_struct('cid', CAST({int(cid)} AS BIGINT), "
            f"'cv', {cv}, 'cn', {float(acc ** 0.5)!r}D)"
        )
    return F.expr("array(" + ", ".join(structs) + ")")


def _cell_scores(vec_col: str, cents: Column, round_digits: int) -> Column:
    """array<struct<cos,cid>>: rounded cosine of a row's vector vs each centroid."""
    v = F.col(vec_col)
    n = norm(v)
    return F.transform(
        cents,
        lambda c: F.struct(
            # + 0.0 normalizes IEEE -0.0 to +0.0 so tie ordering agrees
            # across engines (Spark struct compare vs DuckDB sort)
            (F.round(dot(v, c["cv"]) / (n * c["cn"]), round_digits) + F.lit(0.0)).alias(
                "cos"
            ),
            c["cid"].alias("cid"),
        ),
    )


def _argmax_cell(scores: Column) -> Column:
    """Fold to the best cell: max cosine, ties to the lowest centroid id.

    Sequential fold with strict ``>`` keeps the first (lowest-cid)
    winner — identical to ``row_number() ORDER BY cos DESC, cid`` = 1.
    """
    init = F.struct(F.lit(-2.0).alias("cos"), F.lit(-1).cast("long").alias("cid"))
    best = F.aggregate(
        scores,
        init,
        lambda acc, s: F.when(s["cos"] > acc["cos"], s).otherwise(acc),
    )
    return best["cid"]


def _lowest_id_centroids(
    df: DataFrame, nlist: int, id_col: str, vec_col: str
) -> list[tuple[int, list[float]]]:
    """Deterministic seed centroids: the ``nlist`` lowest-id vectors."""
    rows = (
        df.select(id_col, vec_col)
        .filter(F.col(id_col) < nlist)
        .orderBy(id_col)
        .collect()
    )
    return [(r[id_col], list(r[vec_col])) for r in rows]


def train_centroids(
    df: DataFrame,
    *,
    nlist: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = EMB,
    round_digits: int = 4,
    coord_digits: int = 7,
) -> list[tuple[int, list[float]]]:
    """Lloyd k-means over an embedding column, as DataFrame aggregations.

    Every step is engine-exact so a SQL oracle can replay training
    bit-for-bit:

    - **seed**: the ``nlist`` lowest-id vectors (no RNG);
    - **assign**: argmax of cosine rounded to ``round_digits``, ties to
      the lowest centroid id — the very same expression used for
      search-time cell assignment (``_argmax_cell``), a narrow
      projection over the inlined centroid literals;
    - **update**: elementwise mean computed exactly — coordinates are
      scaled to integer units of ``10^-coord_digits`` (``round(v*1e7)``
      — scale-0 rounding of an identical IEEE product, which both
      engines resolve identically, unlike fractional ``round(v, 7)``
      whose multiply-vs-BigDecimal implementations can disagree by one
      ulp at a digit boundary), summed as DECIMAL (associative,
      order-independent, no float summation-order hazard), divided by
      the member count and re-rounded at scale 0. Empty cells keep
      their old centroid.

    Per iteration: one narrow projection + one partial-aggregable
    groupBy with at most ``nlist * dim`` groups, so the shuffle carries
    kilobytes regardless of corpus size. At 100 TB you train on a
    sample (pass ``df.sample(...)``) and broadcast the resulting tiny
    centroid list into the search plan; assignment of the full corpus
    stays a projection.
    """
    cents_list = _lowest_id_centroids(df, nlist, id_col, vec_col)
    dim = len(cents_list[0][1])
    unit = float(10**coord_digits)
    for _ in range(iters):
        cents = _centroid_literals(cents_list)
        # two selects: mixing a generator (posexplode) with the lambda
        # struct expressions in one projection loses the lambda's field
        # aliases during generator rewrite (Spark analyzer quirk)
        assigned = df.select(
            _argmax_cell(_cell_scores(vec_col, cents, round_digits)).alias("cell"),
            F.col(vec_col).alias("_v"),
        ).select("cell", F.posexplode(F.col("_v")).alias("pos", "val"))
        v7 = F.round(F.col("val").cast("double") * F.lit(unit)).cast("long")
        means = (
            assigned.groupBy("cell", "pos")
            .agg(
                (
                    F.round(
                        F.sum(v7.cast("decimal(38,0)")).cast("double")
                        / F.count(F.lit(1))
                    )
                    .cast("long")
                    .cast("double")
                    / F.lit(unit)
                ).alias("m")
            )
            .collect()
        )
        by_cell: dict[int, dict[int, float]] = {}
        for r in means:
            by_cell.setdefault(r["cell"], {})[r["pos"]] = r["m"]
        cents_list = [
            (cid, [by_cell[cid][p] for p in range(dim)]) if cid in by_cell else (cid, old)
            for cid, old in cents_list
        ]
    return cents_list


def trained_centroids(
    df: DataFrame,
    *,
    dataset: str,
    nlist: int = 16,
    iters: int = 2,
    sample_fraction: float | None = None,
    **train_kw,
) -> list[tuple[int, list[float]]]:
    """Train-once centroid store: the 100 TB shape for IVF.

    k-means training is an *offline index build*, not query work — at
    scale you train on a sample once, persist the (tiny) centroid
    table, and every search query just inlines the literals. This
    helper makes the registered queries follow that shape: the first
    call per ``(dataset, nlist, iters)`` trains via
    ``train_centroids`` and persists the result (atomic JSON under
    ``$DECATON_SPARK_CENTROID_DIR``); every later call — same process
    or a fresh one — reads the kilobyte-sized list back with zero
    Spark jobs, so no mid-query ``collect()`` remains on the search
    path.

    ``sample_fraction`` bounds the training scan for huge corpora
    (deterministic seed so the index build is reproducible). The
    registered oracle queries leave it ``None`` because their DuckDB
    oracle replays training over the full table.
    """
    # Key the store on a snapshot fingerprint of the dataset path (file
    # size + mtime digest), not the path alone: a fixture regenerated
    # in place at the same path invalidates both the in-process cache
    # and the on-disk artifact instead of silently serving centroids
    # trained on the old contents (ADVICE r6 — same staleness hole as
    # _BITEXT_COUNT_CACHE). ``dataset`` is a path prefix by convention
    # (f"{sf_dir}/embeddings"); the parquet fixture lives at
    # ``{dataset}.parquet``.
    from decaton_spark.sources import fixture_fingerprint

    fp = fixture_fingerprint(dataset)
    if fp == "absent":
        fp = fixture_fingerprint(f"{dataset}.parquet")
    key = (dataset, fp, nlist, iters)
    if key in _CENTROID_CACHE:
        return _CENTROID_CACHE[key]
    path = _artifact_path(dataset, fp, f"n{nlist}_i{iters}")
    raw = _load_artifact(path)
    if raw is not None:
        cents = [(int(cid), [float(v) for v in vec]) for cid, vec in raw]
    else:
        train_df = (
            df.sample(fraction=sample_fraction, seed=42)
            if sample_fraction is not None
            else df
        )
        cents = train_centroids(train_df, nlist=nlist, iters=iters, **train_kw)
        os.makedirs(_CENTROID_DIR, exist_ok=True)
        tmp = f"{path}.{os.getpid()}.tmp"
        with open(tmp, "w") as f:
            json.dump(cents, f)
        os.replace(tmp, path)  # atomic vs concurrent test/bench workers
    _CENTROID_CACHE[key] = cents
    return cents


def ivf_assign(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    *,
    id_col: str = "vec_id",
    vec_col: str = EMB,
    round_digits: int = 4,
    num_partitions: int | None = None,
) -> DataFrame:
    """Cell-assigned corpus frame for IVF search: (neighbor_id, c_vec,
    c_norm, cell). The assignment is a pure projection (fold over the
    inlined centroid array — no shuffle, no join); it is exposed
    separately so multi-rung consumers (the nprobe sweep) can compute
    it ONCE and stage it instead of re-projecting the corpus per rung
    (at sf0.1 the interpreted centroid fold costs ~0.6 s per corpus
    pass — rung-invariant work).

    ``num_partitions`` hash-spreads the corpus by id first: the
    interpreted centroid fold otherwise runs at the scan's split count
    (round-9 stage audit: single-task at sf0.1). Assignment is per-row,
    so partitioning never changes it."""
    if num_partitions:
        df = df.repartition(num_partitions, id_col)
    cents = _centroid_literals(centroids)
    return df.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        norm(F.col(vec_col)).alias("c_norm"),
        _argmax_cell(_cell_scores(vec_col, cents, round_digits)).alias("cell"),
    )


def ivf_probe_ranked(
    queries: DataFrame,
    centroids: list[tuple[int, list[float]]],
    *,
    nprobe: int,
    id_col: str = "vec_id",
    vec_col: str = EMB,
    round_digits: int = 4,
) -> DataFrame:
    """Query tower of the IVF probe join with the probe ORDER explicit:
    (query_id, q_vec, q_norm, proberank, cell), proberank 1 = nearest
    cell (desc cosine, cell id asc on ties — the ivf_topk order).
    ``ivf_topk`` drops the rank (its caller fixed one nprobe); the
    nprobe SWEEP keeps it so every operating point filters
    ``proberank <= rung`` out of ONE scored candidate frame instead of
    re-running the probe join per rung."""
    cents = _centroid_literals(centroids)
    # desc sort of (cos, −cid) == cos desc, cid asc on ties (integer
    # negation — no IEEE −0.0 pitfalls)
    ranked = F.slice(
        F.sort_array(
            F.transform(
                _cell_scores(vec_col, cents, round_digits),
                lambda s: F.struct(
                    s["cos"].alias("cos"), (-s["cid"]).alias("negcid")
                ),
            ),
            asc=False,
        ),
        1,
        nprobe,
    )
    return queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        norm(F.col(vec_col)).alias("q_norm"),
        F.posexplode(ranked).alias("_pos", "_s"),
    ).select(
        "query_id",
        "q_vec",
        "q_norm",
        (F.col("_pos") + 1).cast("int").alias("proberank"),
        (-F.col("_s.negcid")).alias("cell"),
    )


def ivf_topk(
    df: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    nlist: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = EMB,
    round_digits: int = 4,
    centroids: list[tuple[int, list[float]]] | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """IVF (inverted-file) ANN top-k: probe the ``nprobe`` nearest cells.

    ``centroids`` defaults to the ``nlist`` lowest-id corpus vectors —
    deterministic and oracle-expressible; pass ``train_centroids(...)``
    output for k-means-refined cells (moves only the centroid literals,
    never the plan shape). The scale story:

    - **cell assignment is a projection** (fold over an inlined centroid
      array) — the corpus is never shuffled or joined to assign cells;
    - **queries explode to nprobe (query, cell) probes** and broadcast;
    - the candidate join is an equality join on ``cell`` touching only
      probed cells — at 100 TB the cell id becomes the storage partition
      key so unprobed cells are partition-pruned at the scan.

    ``num_partitions`` forwards to ``ivf_assign``'s hash-spread; the
    broadcast probe join and pair scoring inherit the assign
    partitioning, so the spread parallelizes the whole chain.
    """
    if centroids is None:
        centroids = _lowest_id_centroids(df, nlist, id_col, vec_col)
    cents = _centroid_literals(centroids)

    # multi-rung consumers (the nprobe sweep) do NOT call this per
    # rung — they compose ivf_assign + ivf_probe_ranked directly so
    # the corpus assignment and candidate scoring happen once
    c = ivf_assign(
        df,
        centroids,
        id_col=id_col,
        vec_col=vec_col,
        round_digits=round_digits,
        num_partitions=num_partitions,
    )
    q = ivf_probe_ranked(
        queries,
        centroids,
        nprobe=nprobe,
        id_col=id_col,
        vec_col=vec_col,
        round_digits=round_digits,
    ).drop("proberank")
    pairs = c.join(F.broadcast(q), "cell").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    sim = (
        F.round(
            dot(F.col("q_vec"), F.col("c_vec")) / (F.col("q_norm") * F.col("c_norm")),
            round_digits,
        )
        + F.lit(0.0)  # normalize -0.0 so hashes match the oracle
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


def ivf_topk_vectorized(
    df: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    nlist: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = EMB,
    round_digits: int = 4,
    centroids: list[tuple[int, list[float]]] | None = None,
) -> DataFrame:
    """IVF ANN, BLAS path: same algorithm/results as ``ivf_topk`` with
    cell assignment + probe scoring fused into one numpy pass.

    Per Arrow batch: one (batch × nlist) matmul assigns cells (argmax
    cosine, ties to lowest centroid id), then each query scores only
    the batch rows in its probed cells and emits a local top-k — so,
    as with the vectorized brute force, the shuffle carries k rows per
    (query, partition) and the corpus never moves.
    """
    import numpy as np

    if centroids is None:
        centroids = _lowest_id_centroids(df, nlist, id_col, vec_col)
    c_ids = np.array([cid for cid, _ in centroids], dtype=np.int64)
    c_mat = np.array([vec for _, vec in centroids], dtype=np.float64)
    c_norm = np.linalg.norm(c_mat, axis=1)

    def cell_scores(mat: "np.ndarray") -> "np.ndarray":
        norms = np.linalg.norm(mat, axis=1)
        cos = (mat @ c_mat.T) / np.outer(norms, c_norm)
        return np.round(cos, round_digits) + 0.0

    def assign(mat: "np.ndarray") -> "np.ndarray":
        # argmax returns the FIRST max => lowest centroid id on ties
        # (c_ids are sorted ascending), matching the expression fold
        return c_ids[np.argmax(cell_scores(mat), axis=1)]

    q_rows = queries.select(id_col, vec_col).collect()
    q_ids = np.array([r[id_col] for r in q_rows], dtype=np.int64)
    q_mat = np.array([r[vec_col] for r in q_rows], dtype=np.float64)
    q_norm = np.linalg.norm(q_mat, axis=1)
    # per query: nprobe best cells, cos desc / cid asc (stable argsort
    # over (-cos, cid) == lexsort on (cid, -cos))
    qs = cell_scores(q_mat)
    probes = []
    for i in range(len(q_ids)):
        order = np.lexsort((c_ids, -qs[i]))
        probes.append(set(c_ids[order[:nprobe]].tolist()))
    bc = df.sparkSession.sparkContext.broadcast(
        (q_ids, q_mat, q_norm, probes)
    )

    out_schema = "query_id long, neighbor_id long, cosine double"

    def score(batches):
        import pandas as pd

        ids, mat, norms, probe_sets = bc.value
        for pdf in batches:
            n_ids = pdf[id_col].to_numpy(dtype=np.int64)
            n_mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            n_norm = np.linalg.norm(n_mat, axis=1)
            cells = assign(n_mat)
            cos = (
                np.round((n_mat @ mat.T) / np.outer(n_norm, norms), round_digits)
                + 0.0
            )
            parts = []
            for j, qid in enumerate(ids):
                mask = np.isin(cells, list(probe_sets[j])) & (n_ids != qid)
                cand_ids, cand_cos = n_ids[mask], cos[mask, j]
                if len(cand_ids) > k:
                    idx = np.lexsort((cand_ids, -cand_cos))[:k]
                else:
                    idx = np.lexsort((cand_ids, -cand_cos))
                parts.append(
                    pd.DataFrame(
                        {
                            "query_id": qid,
                            "neighbor_id": cand_ids[idx],
                            "cosine": cand_cos[idx],
                        }
                    )
                )
            yield pd.concat(parts, ignore_index=True)

    scored = df.select(id_col, vec_col).mapInPandas(score, out_schema)
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


# ---------------------------------------------------------------------------
# Product quantization (PQ) — compressed-domain ANN
# ---------------------------------------------------------------------------


def pq_seed_codebooks(
    df: DataFrame,
    *,
    m: int = 8,
    ksub: int = 16,
    id_col: str = "vec_id",
    vec_col: str = EMB,
) -> list[list[list[float]]]:
    """``[subspace j][code k] -> sub-centroid`` seeded from the ``ksub``
    lowest-id vectors' sub-vectors (deterministic, oracle-expressible —
    the same no-RNG seeding rule as IVF's ``_lowest_id_centroids``).
    Lloyd refinement per subspace plugs in exactly like
    ``trained_centroids`` does for IVF (an offline index build that
    only changes these literals, never the query plan); the seed books
    keep the whole pipeline replayable by the SQL oracle."""
    rows = (
        df.select(id_col, vec_col)
        .filter(F.col(id_col) < ksub)
        .orderBy(id_col)
        .collect()
    )
    dim = len(rows[0][vec_col])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    dsub = dim // m
    return [
        [[float(x) for x in r[vec_col][j * dsub : (j + 1) * dsub]] for r in rows]
        for j in range(m)
    ]


def _pq_book_sql(book: list[list[float]]) -> str:
    """SQL literal array<array<double>> for ONE subspace's codebook.

    All PQ expressions are generated as SQL text and parsed in a single
    ``expr`` call per output column: composing them from
    F.lit/F.array/lambda Columns costs a py4j round-trip per node
    (thousands for 8×16×8 literals plus folds — seconds of driver-side
    RPC before the query even analyzes). ``repr(float)`` is
    shortest-round-trip decimal, which Double.parseDouble returns to
    the identical IEEE value."""
    return (
        "array("
        + ", ".join(
            "array(" + ", ".join(f"{float(x)!r}D" for x in cv) + ")" for cv in book
        )
        + ")"
    )


def _pq_n2row_sql(row: list[float]) -> str:
    """SQL literal array<double> of |c_{j,k}|² for one subspace."""
    return "array(" + ", ".join(f"{v!r}D" for v in row) + ")"


def pq_norm2(codebooks: list[list[list[float]]]) -> list[list[float]]:
    """|c_{j,k}|² per sub-centroid, summed sequentially (IEEE order
    matches the engines' left folds — and being literals, both engines
    necessarily agree)."""
    out = []
    for book in codebooks:
        row = []
        for cv in book:
            acc = 0.0
            for x in cv:
                acc += float(x) * float(x)
            row.append(acc)
        out.append(row)
    return out


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    *,
    id_col: str = "vec_id",
    vec_col: str = EMB,
    encode_digits: int = 6,
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """Encode each vector to ``m`` sub-codes: code_j = argmin over k of
    L2²(sub-vector_j, c_{j,k}), ties to the lowest k (strict-< left
    fold == ``row_number() ORDER BY d2, k`` in the oracle).

    This is the PQ compression step: at 100 TB the corpus column
    shrinks from 64 floats (256 B) to m bytes — the entire index fits
    two orders of magnitude more vectors per node. Pure projection:
    codebook literals are inlined, nothing shuffles.

    Returns (id, pq_codes array<int>, recon_norm double) where
    recon_norm = |reconstruction| = sqrt(Σ_j |c_{j,code_j}|²), used to
    normalize asymmetric-distance cosine. ``carry`` names additional
    ``df`` columns to pass through the projection unchanged — round 9:
    lets ``ivf_pq_topk`` ride its cell assignment along instead of
    joining two projections of the same corpus back on the id."""
    m = len(codebooks)
    ksub = len(codebooks[0])
    dsub = len(codebooks[0][0])
    n2 = pq_norm2(codebooks)

    # Assignment score is |c|² − 2·dot(sub, c): the |sub|² term is
    # constant across candidates so the argmin is identical to L2², and
    # each candidate costs ONE dot fold instead of a per-candidate
    # zip_with allocation + subtract-square (Catalyst does not CSE into
    # lambda scopes, so work inside the candidate lambda is paid 16×).
    # Sub-vector slices are hoisted to their own projection for the
    # same reason.
    #
    # MEASURED DEAD END (round 8, kept as a warning): unrolling the
    # candidate dots into flat literal multiply-adds (128 terms per
    # subspace) is SLOWER than this fold — 0.42 s vs 0.21 s per
    # subspace at sf0.1 — because the giant expression tree exceeds
    # what whole-stage codegen will compile and falls back to
    # interpreted eval, which walks ~35 tree nodes per candidate where
    # the HOF fold runs a tight loop over an already-evaluated array.
    # The HOF-lambda-is-slow rule applies to work that can move OUT of
    # the per-element lambda (see hex_to_long_spark), not to replacing
    # a small fold with a thousand-node flat tree.
    def code_sql(j: int) -> str:
        book = _pq_book_sql(codebooks[j])
        n2row = _pq_n2row_sql(n2[j])
        d2 = (
            f"round(element_at({n2row}, k + 1) - 2.0D * "
            f"aggregate(zip_with(_sub_{j}, element_at({book}, k + 1), "
            "(a, b) -> CAST(a AS DOUBLE) * b), 0.0D, (acc, x) -> acc + x), "
            f"{encode_digits}) + 0.0D"
        )
        return (
            f"(aggregate(transform(sequence(0, {ksub - 1}), "
            f"k -> named_struct('d2', {d2}, 'code', CAST(k AS INT))), "
            "named_struct('d2', CAST('Infinity' AS DOUBLE), 'code', -1), "
            "(acc, s) -> CASE WHEN s.d2 < acc.d2 THEN s ELSE acc END)).code"
        )

    subs = df.selectExpr(
        f"{id_col} AS neighbor_id",
        *[f"slice({vec_col}, {j * dsub + 1}, {dsub}) AS _sub_{j}" for j in range(m)],
        *carry,
    )
    coded = subs.selectExpr(
        "neighbor_id",
        "array(" + ", ".join(code_sql(j) for j in range(m)) + ") AS pq_codes",
        *carry,
    )
    recon2 = "0.0D"
    for j in range(m):
        recon2 = (
            f"({recon2} + element_at({_pq_n2row_sql(n2[j])}, "
            f"element_at(pq_codes, {j + 1}) + 1))"
        )
    return coded.selectExpr(
        "neighbor_id", "pq_codes", f"sqrt({recon2}) AS recon_norm", *carry
    )


def _adc_table_sql(codebooks: list[list[list[float]]], qvec: str = "q_vec") -> str:
    """SQL for the per-QUERY ADC lookup table: ``tab[j+1][c+1]`` =
    dot(q's j-th sub-vector, codeword c of subspace j), as
    ``array<array<double>>``.

    This moves the interpreted aggregate/zip_with dot folds off the
    per-(query, candidate) PAIR and onto the query row, where they run
    |queries| x m x ksub times total (hundreds, not millions); each
    pair then scores with m native element_at lookups — the textbook
    ADC table, and the round-8 fix for ann_pq/ann_ivf_pq walls. The
    inner fold is textually identical to the old per-pair expression
    (same slice, same CAST, same left-to-right accumulation), so every
    looked-up value — and therefore the final rounded cosine — is
    IEEE-bit-identical to the unfactored form (pinned in
    tests/test_quantize.py)."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    subs = []
    for j in range(m):
        subs.append(
            f"transform({_pq_book_sql(codebooks[j])}, "
            f"cv -> aggregate(zip_with(slice({qvec}, {j * dsub + 1}, {dsub}), "
            "cv, (a, b) -> CAST(a AS DOUBLE) * b), 0.0D, (acc, x) -> acc + x))"
        )
    return "array(" + ", ".join(subs) + ")"


def _adc_dot_sql(m: int, tab: str = "q_tab", codes: str = "pq_codes") -> str:
    """Per-pair ADC dot product off the precomputed table: m native
    element_at lookups summed in subspace order (matches the old
    per-pair fold's accumulation order exactly)."""
    adot = "0.0D"
    for j in range(m):
        adot = (
            f"({adot} + element_at(element_at({tab}, {j + 1}), "
            f"element_at({codes}, {j + 1}) + 1))"
        )
    return adot


def pq_topk(
    df: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    *,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = EMB,
    round_digits: int = 4,
    encode_digits: int = 6,
    num_partitions: int | None = None,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over the PQ-encoded corpus:
    approx dot(q, x) = Σ_j dot(q_j, c_{j,code_j}) — m codebook lookups
    per candidate instead of a 64-float multiply; approx cosine divides
    by |q|·|reconstruction|.

    Plan shape: encode is a projection; the tiny query set broadcasts;
    the only shuffle is the per-query top-k. At 100 TB this composes
    with IVF (probe cells, then ADC-scan only probed partitions) — the
    standard IVF+PQ stack; here the ADC linear scan is the registered,
    oracle-verified baseline."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    # num_partitions: hash-spread by id before the encode projection —
    # the per-row nearest-codeword search is the dominant CPU and
    # otherwise runs at the scan's split count (round-9 stage audit).
    if num_partitions:
        df = df.repartition(num_partitions, id_col)
    enc = pq_encode(
        df, codebooks, id_col=id_col, vec_col=vec_col, encode_digits=encode_digits
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        norm(F.col(vec_col)).alias("q_norm"),
    ).selectExpr("*", f"{_adc_table_sql(codebooks)} AS q_tab")
    pairs = enc.crossJoin(F.broadcast(q)).filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    scored = pairs.selectExpr(
        "query_id",
        "neighbor_id",
        f"round({_adc_dot_sql(m)} / (q_norm * recon_norm), {round_digits})"
        " + 0.0D AS pq_cosine",
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("pq_cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "pq_cosine")
    )


def train_pq_codebooks(
    df: DataFrame,
    *,
    dataset: str,
    m: int = 8,
    ksub: int = 16,
    iters: int = 8,
    sample: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = EMB,
) -> list[list[list[float]]]:
    """Lloyd-refined PQ codebooks — the offline index build that
    replaces the seed books for real recall. Mirrors
    ``trained_centroids``' shape exactly: train once per
    (dataset, m, ksub, iters) on a bounded sample (the ``sample``
    lowest-id vectors — deterministic, no RNG), persist the kilobyte
    codebook JSON, and every query inlines the literals; nothing about
    the query plan changes. Per subspace: k-means under L2 on the
    sub-vectors, seeded from the ksub lowest-id sub-vectors (empty
    cells keep their centroid). Training math is local numpy float64 —
    at 100 TB the sample is still a driver-sized matrix; the full
    corpus is only ever touched by the (distributed, shuffle-free)
    encode.

    Measured caveat: on the driver's near-uniform synthetic embeddings
    Lloyd refinement does NOT beat data-point seed books (means of
    near-random points collapse toward the centroid of the space and
    discriminate less than actual data points) — the registered query
    therefore keeps the seeded, oracle-exact books; this builder is
    the index path for real clustered embeddings."""
    import numpy as np

    # snapshot-fingerprinted like trained_centroids (ADVICE r6): an
    # in-place fixture regeneration invalidates both cache layers
    from decaton_spark.sources import fixture_fingerprint

    fp = fixture_fingerprint(dataset)
    if fp == "absent":
        fp = fixture_fingerprint(f"{dataset}.parquet")
    key = ("pq", dataset, fp, m, ksub, iters)
    if key in _CENTROID_CACHE:
        return _CENTROID_CACHE[key]
    path = _artifact_path(dataset, fp, f"pq_m{m}_k{ksub}_i{iters}")
    raw = _load_artifact(path)
    if raw is not None:
        books = [[[float(x) for x in cv] for cv in book] for book in raw]
    else:
        rows = (
            df.select(id_col, vec_col)
            .filter(F.col(id_col) < sample)
            .orderBy(id_col)
            .collect()
        )
        mat = np.array([list(r[vec_col]) for r in rows], dtype=np.float64)
        dim = mat.shape[1]
        if dim % m:
            raise ValueError(f"dim {dim} not divisible by m {m}")
        dsub = dim // m
        books = []
        for j in range(m):
            sub = mat[:, j * dsub : (j + 1) * dsub]
            cents = sub[:ksub].copy()
            for _ in range(iters):
                d2 = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
                assign = d2.argmin(axis=1)
                for k in range(ksub):
                    members = sub[assign == k]
                    if len(members):
                        cents[k] = members.mean(axis=0)
            books.append([[float(x) for x in cv] for cv in cents])
        os.makedirs(_CENTROID_DIR, exist_ok=True)
        tmp = f"{path}.{os.getpid()}.tmp"
        with open(tmp, "w") as f:
            json.dump(books, f)
        os.replace(tmp, path)
    _CENTROID_CACHE[key] = books
    return books


def ivf_pq_topk(
    df: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    *,
    k: int = 5,
    nlist: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = EMB,
    round_digits: int = 4,
    centroids: list[tuple[int, list[float]]] | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """The composed IVF+PQ stack — coarse quantizer prunes the corpus
    to ``nprobe`` cells, PQ codes score the survivors by asymmetric
    distance: at 100 TB the cell id is the storage partition key
    (unprobed cells partition-pruned at the scan) and each scanned
    candidate costs m LUT lookups over an 8-byte code instead of a
    256-byte float read. This is the standard billion-vector serving
    shape (FAISS IVFPQ) expressed as two narrow projections + one
    broadcast equi-join + one bounded top-k.

    Exactness caveat (honest): scores are PQ approximations, so this
    is the recall-tested scale path; the oracle-verified baselines are
    ``ann_pq_topk`` (exact same scoring, no cell pruning) and
    ``ann_ivf_topk`` (exact scoring, same pruning)."""
    if centroids is None:
        centroids = _lowest_id_centroids(df, nlist, id_col, vec_col)
    cents = _centroid_literals(centroids)
    m = len(codebooks)
    dsub = len(codebooks[0][0])

    # Round 9: the PQ codes and the cell assignment are BOTH per-row
    # projections of the same corpus row — ride the cell through
    # pq_encode's projection chain (carry=) instead of computing two
    # separate corpus scans and joining them back on the id (the old
    # plan paid 2 scans + 2 exchanges + a sort-merge join for a 1:1
    # recombination). num_partitions additionally hash-spreads by id
    # first — the codeword search otherwise runs at the scan's split
    # count (round-9 stage audit).
    if num_partitions:
        df = df.repartition(num_partitions, id_col)
    dfc = df.select(
        F.col(id_col),
        F.col(vec_col),
        _argmax_cell(_cell_scores(vec_col, cents, round_digits)).alias("cell"),
    )
    corpus = pq_encode(
        dfc, codebooks, id_col=id_col, vec_col=vec_col, carry=("cell",)
    )

    probe_cells = F.transform(
        F.slice(
            F.sort_array(
                F.transform(
                    _cell_scores(vec_col, cents, round_digits),
                    lambda s: F.struct(
                        s["cos"].alias("cos"), (-s["cid"]).alias("negcid")
                    ),
                ),
                asc=False,
            ),
            1,
            nprobe,
        ),
        lambda s: -s["negcid"],
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        norm(F.col(vec_col)).alias("q_norm"),
        F.explode(probe_cells).alias("cell"),
    ).selectExpr("*", f"{_adc_table_sql(codebooks)} AS q_tab")
    pairs = corpus.join(F.broadcast(q), "cell").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    scored = pairs.selectExpr(
        "query_id",
        "neighbor_id",
        f"round({_adc_dot_sql(m)} / (q_norm * recon_norm), {round_digits})"
        " + 0.0D AS pq_cosine",
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("pq_cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "pq_cosine")
    )


def semantic_dedup(
    df: DataFrame,
    *,
    centroids: list[tuple[int, list[float]]],
    eps: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = EMB,
    round_digits: int = 4,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster the embedding space, then drop vectors
    whose cosine similarity to another member of the *same cluster*
    reaches ``eps``.

    Clustering makes the quadratic step tractable: candidate pairs are
    confined to a cluster, so the pair count is Σ |cell|² instead of
    |corpus|² — the same cost-bounding move the paper uses (k scales
    with corpus size, keeping cells roughly constant-sized). The
    survivor rule here is deterministic keep-lowest-id (the paper keeps
    the member farthest from the centroid; swapping the tie-break is a
    one-line ORDER BY change and does not alter the plan shape).

    Plan shape at 100 TB:

    - **cell assignment is a projection** — the trained centroid list
      (see ``trained_centroids``: offline index build, kilobytes) is
      inlined as literals; no shuffle, no join to assign cells;
    - **the pair step is an equi-join on cell** (never a cartesian
      product — pinned in tests/test_plans.py), shuffling each side
      once on the cell id; at scale the cell id doubles as the storage
      partition key so the join is co-located;
    - the verdict join-back is a broadcast-able aggregation keyed by
      the duplicate id.

    Returns one row per input vector:
    ``(vec_id, cell, dup_of, keep)`` where ``dup_of`` is the lowest
    same-cell id with cosine >= eps (NULL for survivors) and
    ``keep = dup_of IS NULL``. Filter on ``keep`` to materialize the
    deduplicated corpus.

    ``eps`` defaults to 0.4 for the synthetic random test embeddings
    (real sentence embeddings cluster much tighter; the paper uses
    0.95+); cosine values are rounded to ``round_digits`` before the
    threshold so the SQL oracle replays the verdict exactly.
    """
    cents = _centroid_literals(centroids)
    assigned = df.select(
        F.col(id_col).alias("vec_id"),
        _argmax_cell(_cell_scores(vec_col, cents, round_digits)).alias("cell"),
        F.col(vec_col).alias("v"),
        norm(F.col(vec_col)).alias("vn"),
    )
    a = assigned.select(
        F.col("vec_id").alias("keep_id"),
        "cell",
        F.col("v").alias("av"),
        F.col("vn").alias("an"),
    )
    b = assigned.select(
        F.col("vec_id").alias("dup_id"),
        "cell",
        F.col("v").alias("bv"),
        F.col("vn").alias("bn"),
    )
    sim = F.round(
        dot(F.col("av"), F.col("bv")) / (F.col("an") * F.col("bn")), round_digits
    )
    dups = (
        a.join(b, "cell")
        .filter(F.col("keep_id") < F.col("dup_id"))
        .filter(sim >= F.lit(eps))
        .groupBy("dup_id")
        .agg(F.min("keep_id").alias("dup_of"))
    )
    return (
        assigned.join(dups, assigned["vec_id"] == dups["dup_id"], "left")
        .select(
            "vec_id",
            "cell",
            "dup_of",
            F.col("dup_of").isNull().alias("keep"),
        )
    )


def centroid_drift(
    emb: DataFrame,
    *,
    group_col: str = "label",
    vec_col: str = "embedding",
    dims: int = 64,
    scale: float = 1e7,
    round_digits: int = 4,
) -> DataFrame:
    """Per-group centroid vs global corpus centroid (cosine) — the
    embedding-store drift/imbalance monitor. cosine(mean_g, mean_all)
    = cosine(sum_g, sum_all) by scale invariance, so no per-dimension
    division happens.

    Determinism without float-sum order dependence: each component is
    snapped to round(v*scale) (identical IEEE double → identical
    bigint on every engine/partitioning), so all cross-row sums are
    EXACT integer arithmetic; the dot/norm products run in
    DECIMAL(38,0) (exact to ~1e38 ≫ the ~1e25 worst case). One double
    division at the end, rounded.

    Scale shape (10^9 vectors): posexplode is a narrow projection;
    both centroid groupBys are partial-agg with tiny outputs
    (|groups|·dims and dims rows); the dims-row global centroid
    broadcasts; the final per-group reduce touches dims rows/group.
    """
    comp = emb.select(
        F.col(group_col).alias("grp"),
        F.posexplode(vec_col).alias("pos", "e"),
    ).select(
        "grp",
        (F.col("pos") + 1).alias("dim"),
        F.round(F.col("e").cast("double") * scale).cast("bigint").alias("v"),
    )
    lab = comp.groupBy("grp", "dim").agg(F.sum("v").alias("lv"))
    glob = comp.groupBy("dim").agg(F.sum("v").alias("gv"))
    n = emb.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(F.lit(1)).alias("n_vecs")
    )
    lvd = F.col("lv").cast("decimal(38,0)")
    gvd = F.col("gv").cast("decimal(38,0)")
    dots = (
        lab.join(F.broadcast(glob), "dim")
        .groupBy("grp")
        .agg(
            F.sum(lvd * F.col("gv")).cast("double").alias("dot"),
            F.sum(lvd * F.col("lv")).cast("double").alias("nl"),
            F.sum(gvd * F.col("gv")).cast("double").alias("ng"),
        )
    )
    return dots.join(F.broadcast(n), "grp").select(
        F.col("grp").alias(group_col),
        "n_vecs",
        F.round(
            F.col("dot") / (F.sqrt(F.col("nl")) * F.sqrt(F.col("ng"))),
            round_digits,
        ).alias("cosine_to_global"),
    )


def mmr_rerank(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 10,
    candidates: int = 20,
    lam_pct: int = 70,
    id_col: str = "vec_id",
    vec_col: str = EMB,
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein
    1998): greedily pick ``k`` of the top-``candidates`` exact
    neighbors, each round maximizing

        ``lam·rel(d) − (1−lam)·max_{s∈selected} sim(d, s)``

    — the diversity-aware context selection a RAG pipeline runs after
    ANN retrieval so the k passages aren't k near-copies.

    Scale split: candidate generation is the distributed part (here
    exact top-N per query; compose with the IVF/LSH paths the same
    way); relevance and the candidate×candidate similarity matrix are
    DataFrame expressions (rounded cosines snapped to 1e-4 integer
    units — engine-exact); the greedy loop itself is inherently
    per-query sequential over ≤ candidates² integers, so it runs as an
    Arrow-batched ``applyInPandas`` per query group — parallel across
    queries, pure-integer inside (no floats → the oracle's unrolled
    MATERIALIZED-CTE rounds replay every pick bit-for-bit, ties to the
    lowest neighbor id).

    Returns (query_id, mmr_rank, neighbor_id, mmr_score) with
    ``mmr_score`` in 1e-4·percent units: ``lam_pct·rel4 −
    (100−lam_pct)·maxsim4``.
    """
    import pandas as pd

    top = brute_force_topk(corpus, queries, k=candidates, id_col=id_col, vec_col=vec_col)
    rel = top.select(
        "query_id",
        F.col("neighbor_id").alias("d"),
        F.round(F.col("cosine") * 10000.0).cast("long").alias("rel4"),
    )
    vecs = corpus.select(F.col(id_col).alias("_vid"), F.col(vec_col).alias("_v"))
    a = rel.join(vecs, rel["d"] == vecs["_vid"]).select(
        "query_id", "d", "rel4", F.col("_v").alias("_va")
    )
    b = rel.select("query_id", F.col("d").alias("s")).join(
        vecs, F.col("s") == vecs["_vid"]
    ).select("query_id", "s", F.col("_v").alias("_vb"))
    pairs = (
        a.join(b, "query_id")
        .filter(F.col("d") != F.col("s"))
        .select(
            "query_id",
            "d",
            "s",
            "rel4",
            F.round(
                F.round(
                    dot(F.col("_va"), F.col("_vb"))
                    / (norm(F.col("_va")) * norm(F.col("_vb"))),
                    4,
                )
                * 10000.0
            )
            .cast("long")
            .alias("sim4"),
        )
    )
    mu_pct = 100 - lam_pct

    def greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        qid = int(pdf["query_id"].iloc[0])
        rel_of = {int(r.d): int(r.rel4) for r in pdf.itertuples()}
        sim = {(int(r.d), int(r.s)): int(r.sim4) for r in pdf.itertuples()}
        sel: list[int] = []
        rem = set(rel_of)
        out = []
        for rank in range(1, min(k, len(rem)) + 1):
            best_d, best_score = None, None
            for d in sorted(rem):
                ms = max((sim[(d, s)] for s in sel), default=0)
                score = lam_pct * rel_of[d] - mu_pct * ms
                if best_score is None or score > best_score:
                    best_d, best_score = d, score
            sel.append(best_d)
            rem.discard(best_d)
            out.append((qid, rank, best_d, best_score))
        return pd.DataFrame(
            out, columns=["query_id", "mmr_rank", "neighbor_id", "mmr_score"]
        )

    return pairs.groupBy("query_id").applyInPandas(
        greedy,
        schema="query_id long, mmr_rank int, neighbor_id long, mmr_score long",
    )


def hard_negatives(
    corpus: DataFrame,
    anchors: DataFrame,
    *,
    k_neg: int = 5,
    k_pos: int = 1,
    id_col: str = "vec_id",
    vec_col: str = EMB,
    label_col: str = "label",
    round_digits: int = 4,
) -> DataFrame:
    """Contrastive training-pair mining: for each anchor, the most
    similar SAME-label vectors (positives) and the most similar
    DIFFERENT-label vectors (hard negatives) — the triplet/InfoNCE
    data an embedding-model trainer consumes. Hard negatives (near
    misses) are what make contrastive training work; random negatives
    are trivially separable.

    Same plan as the brute-force scan (anchors broadcast, corpus never
    shuffled, one per-(anchor, role) top-k reduction); compose with the
    IVF/LSH candidate paths the same way for a 100 TB corpus.

    Returns (anchor_id, role 'pos'|'neg', rank, neighbor_id, cosine).
    """
    a = anchors.select(
        F.col(id_col).alias("anchor_id"),
        F.col(vec_col).alias("a_vec"),
        F.col(label_col).alias("a_label"),
        norm(F.col(vec_col)).alias("a_norm"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        F.col(label_col).alias("c_label"),
        norm(F.col(vec_col)).alias("c_norm"),
    )
    pairs = c.crossJoin(F.broadcast(a)).filter(
        F.col("neighbor_id") != F.col("anchor_id")
    )
    scored = pairs.select(
        "anchor_id",
        "neighbor_id",
        F.when(F.col("c_label") == F.col("a_label"), F.lit("pos"))
        .otherwise(F.lit("neg"))
        .alias("role"),
        F.round(
            dot(F.col("a_vec"), F.col("c_vec"))
            / (F.col("a_norm") * F.col("c_norm")),
            round_digits,
        ).alias("cosine"),
    )
    w = Window.partitionBy("anchor_id", "role").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    ranked = scored.withColumn("rank", F.row_number().over(w))
    return ranked.filter(
        (F.col("role") == "neg") & (F.col("rank") <= k_neg)
        | (F.col("role") == "pos") & (F.col("rank") <= k_pos)
    ).select("anchor_id", "role", "rank", "neighbor_id", "cosine")


def jl_sign_matrix(
    in_dim: int, out_dim: int, *, salt: str = "rp"
) -> list[list[int]]:
    """±1 Johnson–Lindenstrauss sign matrix derived from md5, not RNG:
    ``s[j][i] = +1`` iff the first 8 hex digits of ``md5('{salt}:{i}:{j}')``
    are even. Public, deterministic, and replayable inside any engine
    that has md5 — the DuckDB oracle re-derives the matrix itself, so
    the projection is verified end-to-end, literals included."""
    return [
        [
            1
            - 2
            * (
                int(hashlib.md5(f"{salt}:{i}:{j}".encode()).hexdigest()[:8], 16)
                % 2
            )
            for i in range(in_dim)
        ]
        for j in range(out_dim)
    ]


def random_project(
    df: DataFrame,
    *,
    vec_col: str = EMB,
    out_col: str = "rp",
    in_dim: int = 64,
    out_dim: int = 16,
    salt: str = "rp",
    unit: int = 10_000,
) -> DataFrame:
    """Integer-exact JL random projection: quantize coordinates to
    BIGINT units of ``1/unit`` then fold each output dim as
    ``Σ sign(i,j)·v_i`` — a pure shuffle-free projection (the sign
    matrix rides inlined as zip_with literals, the 100 TB shape: the
    matrix is index metadata, never a join side). With ``unit=1e4``
    and |x|≤1, |p_j| ≤ 64·10⁴ so 16-dim inner products stay ≤ ~2e12:
    exact in BIGINT *and* in double, which is what makes the cosine
    cross-engine reproducible.

    Appends ``out_col`` as array<bigint>; downstream cosine top-k uses
    the same brute-force/window plan as the float towers.
    """
    signs = jl_sign_matrix(in_dim, out_dim, salt=salt)
    v_int = (
        f"transform({vec_col}, x -> "
        f"CAST(round(CAST(x AS DOUBLE) * {unit}.0) AS BIGINT))"
    )
    comps = []
    for j in range(out_dim):
        arr = "array(" + ", ".join(f"{s}L" for s in signs[j]) + ")"
        comps.append(
            f"aggregate(zip_with(_vint, {arr}, (a, b) -> a * b), "
            f"CAST(0 AS BIGINT), (acc, x) -> acc + x)"
        )
    return (
        df.withColumn("_vint", F.expr(v_int))
        .withColumn(out_col, F.expr("array(" + ", ".join(comps) + ")"))
        .drop("_vint")
    )


def margin_mining(
    src: DataFrame,
    tgt: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = EMB,
    k: int = 4,
    threshold_milli: int = 1050,
    bucket_dims: tuple[int, ...] | None = None,
) -> DataFrame:
    """Margin-based parallel-pair mining (the CCMatrix/LASER criterion):
    score(x, y) = cos(x, y) / mean(avg-top-k(x→tgt), avg-top-k(y→src)),
    keep each source's argmax target when the margin clears the
    threshold — the absolute-cosine filter's replacement that survives
    hubness (a hub y's inflated neighbourhood average cancels out of
    every margin it appears in).

    Integer-exact margin: cosines quantize to 1e-4 units (c4 BIGINT);
    margin·1000 = (8000·c4) DIV (a_sum + b_sum) where a_sum/b_sum are
    the top-k c4 sums — order-free integer arithmetic, and the
    nonnegativity pre-filter (c4 > 0 AND sums > 0) keeps truncating
    DIV equal to floor division cross-engine.

    Plan: the scoring join is the brute-force broadcast shape by
    default (exact, oracle-replayable); with ``bucket_dims`` set it
    becomes the 100 TB shape — both towers hash into sign-LSH buckets
    (``hyperplane_bucket``) and score only within-bucket candidates
    via an EQUI-join on the bucket id, so pair cost is Σ bucket²
    and the top-k neighbourhoods are within-bucket k-NN (the standard
    blocked-mining recall/cost trade; run several bucket saltings to
    recover recall). The margin/argmax tail is identical either way.
    Returns (src_id, tgt_id, cos_c4, margin_milli).
    """
    bsel = (
        []
        if bucket_dims is None
        else [hyperplane_bucket(vec_col, bucket_dims).alias("bucket")]
    )
    q = src.select(
        F.col(id_col).alias("sid"),
        F.col(vec_col).alias("q_vec"),
        norm(F.col(vec_col)).alias("q_norm"),
        *bsel,
    )
    c = tgt.select(
        F.col(id_col).alias("tid"),
        F.col(vec_col).alias("c_vec"),
        norm(F.col(vec_col)).alias("c_norm"),
        *bsel,
    )
    c4 = F.round(
        dot(F.col("q_vec"), F.col("c_vec"))
        / (F.col("q_norm") * F.col("c_norm"))
        * 10_000
    ).cast("long")
    if bucket_dims is not None:
        # explicit-width bucket exchanges: the towers' shuffle BYTES
        # are small (narrow vec rows), so AQE's byte-based coalescing
        # otherwise folds the join stage to ~1 partition and the
        # CPU-dense within-bucket dot pass (≈256·N dots with buckets
        # ∝ N) runs on one task of the session's cores (round-10
        # stage profile: three ~1.3 s single-task stages owned the
        # whole emb_bitext_margin_lsh wall). REPARTITION_BY_NUM is
        # exempt from AQE coalescing, so the width sticks.
        par = c.sparkSession.sparkContext.defaultParallelism
        paired = c.repartition(par, "bucket").join(
            q.repartition(par, "bucket"), "bucket"
        )
    else:
        # spread the STREAMED side of the broadcast cross join: the
        # embeddings scan is one or two splits at bench SFs, so without
        # this the whole |c|x|q| dot pass runs on 1-2 tasks of the
        # session's cores (guide §2.5 input skew). The exchange moves
        # only |c| narrow rows once; the work it spreads is |q|-fold
        # larger per row (round-10, measured on emb_bitext_margin_mining).
        c = c.repartition(c.sparkSession.sparkContext.defaultParallelism, "tid")
        paired = c.crossJoin(F.broadcast(q))
    scored = paired.select("sid", "tid", c4.alias("c4"))
    if bucket_dims is not None:
        # keep the checkpoint wide: AQE coalesces the bucket join's
        # output to ~1 partition (narrow rows), and every downstream
        # pass — the two WindowGroupLimit partial top-k sorts and the
        # margin join — would then run single-task over the pair set.
        # sid-keyed so the forward window's partial limit is exact per
        # partition. The exact branch already inherits the spread
        # cross-join's width.
        scored = scored.repartition(
            scored.sparkSession.sparkContext.defaultParallelism, "sid"
        )
    scored = scored.localCheckpoint(
        eager=False
    )  # consumed 3x: fwd top-k, rev top-k, margins
    fwd = Window.partitionBy("sid").orderBy(F.col("c4").desc(), F.col("tid"))
    rev = Window.partitionBy("tid").orderBy(F.col("c4").desc(), F.col("sid"))
    a_sum = (
        scored.withColumn("rnk", F.row_number().over(fwd))
        .filter(F.col("rnk") <= k)
        .groupBy("sid")
        .agg(F.sum("c4").alias("a_sum"))
    )
    b_sum = (
        scored.withColumn("rnk", F.row_number().over(rev))
        .filter(F.col("rnk") <= k)
        .groupBy("tid")
        .agg(F.sum("c4").alias("b_sum"))
    )
    margins = (
        scored.join(a_sum, "sid")
        .join(b_sum, "tid")
        .filter((F.col("c4") > 0) & (F.col("a_sum") + F.col("b_sum") > 0))
        .withColumn(
            "margin_milli",
            F.expr("(8000 * c4) DIV (a_sum + b_sum)").cast("long"),
        )
    )
    best = Window.partitionBy("sid").orderBy(
        F.col("margin_milli").desc(), F.col("tid")
    )
    return (
        margins.withColumn("rnk", F.row_number().over(best))
        .filter((F.col("rnk") == 1) & (F.col("margin_milli") >= threshold_milli))
        .select(
            F.col("sid").alias("src_id"),
            F.col("tid").alias("tgt_id"),
            F.col("c4").alias("cos_c4"),
            "margin_milli",
        )
    )


def ivf_cell_stats(
    df: DataFrame,
    *,
    centroids: list[tuple[int, list[float]]],
    vec_col: str = EMB,
    round_digits: int = 4,
) -> DataFrame:
    """IVF index health report: per-cell occupancy and cohesion — the
    diagnostics a vector-store operator reads before trusting an index
    (a fat cell means probe cost skew and a stale centroid; a cell with
    low mean cosine-to-centroid means the partition boundary cuts
    through a real cluster and recall will suffer there).

    Same inlined-literal assignment fold as search-time
    (``_cell_scores`` / argmax — a pure shuffle-free projection over
    the corpus), then ONE partial-agg groupBy over ≤nlist groups.
    Cohesion is exact: the rounded cosine re-quantizes to 1e-4 BIGINT
    units and the mean is floor() of an exact-in-double quotient.

    Returns (cell, n_vectors, mean_cos_c4, min_cos_c4, max_cos_c4).
    """
    cents = _centroid_literals(centroids)
    init = F.struct(F.lit(-2.0).alias("cos"), F.lit(-1).cast("long").alias("cid"))
    best = F.aggregate(
        _cell_scores(vec_col, cents, round_digits),
        init,
        lambda acc, s: F.when(s["cos"] > acc["cos"], s).otherwise(acc),
    )
    assigned = df.select(
        best["cid"].alias("cell"),
        F.round(best["cos"] * 10_000).cast("long").alias("c4"),
    )
    return assigned.groupBy("cell").agg(
        F.count(F.lit(1)).cast("long").alias("n_vectors"),
        F.floor(F.sum("c4").cast("double") / F.count(F.lit(1)))
        .cast("long")
        .alias("mean_cos_c4"),
        F.min("c4").alias("min_cos_c4"),
        F.max("c4").alias("max_cos_c4"),
    )
