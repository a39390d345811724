"""ANN quality gates: trained-IVF recall vs the exact brute force.

The oracle suite (test_queries_oracle) proves the IVF queries compute
what they claim; these tests prove what they claim is *good* — the
k-means-refined cells recall most true neighbors at nprobe=4/16.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from decaton_spark.functions import similarity as sim
from decaton_spark.sources import load_table


def _pairs(df):
    return {(r["query_id"], r["neighbor_id"]) for r in df.collect()}


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, "embeddings", sf_dir).cache()


@pytest.fixture(scope="module")
def queries(emb):
    return emb.filter(F.col("vec_id") < 8)


@pytest.fixture(scope="module")
def exact(emb, queries):
    return _pairs(sim.brute_force_topk(emb, queries, k=5))


def test_train_centroids_deterministic_and_well_formed(emb):
    a = sim.train_centroids(emb, nlist=16, iters=2)
    b = sim.train_centroids(emb, nlist=16, iters=2)
    assert a == b, "training must be bit-deterministic across runs"
    assert [cid for cid, _ in a] == list(range(16))
    assert all(len(v) == 64 for _, v in a)
    # training moved at least one centroid off its seed vector
    seed = sim._lowest_id_centroids(emb, 16, "vec_id", "embedding")
    assert any(v != s for (_, v), (_, s) in zip(a, seed))


def test_ivf_kmeans_recall_vs_brute_force(emb, queries, exact):
    cents = sim.train_centroids(emb, nlist=16, iters=2)
    approx = _pairs(
        sim.ivf_topk(emb, queries, k=5, nlist=16, nprobe=4, centroids=cents)
    )
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"trained-IVF recall@5 too low: {recall:.2f}"


def test_ivf_kmeans_matches_vectorized(emb, queries):
    cents = sim.train_centroids(emb, nlist=16, iters=2)
    expr = sim.ivf_topk(emb, queries, k=5, nlist=16, nprobe=4, centroids=cents)
    blas = sim.ivf_topk_vectorized(
        emb, queries, k=5, nlist=16, nprobe=4, centroids=cents
    )
    assert sorted(map(tuple, expr.collect())) == sorted(map(tuple, blas.collect()))


def test_pq_encode_shape_and_determinism(emb):
    books = sim.pq_seed_codebooks(emb, m=8, ksub=16)
    assert len(books) == 8 and len(books[0]) == 16 and len(books[0][0]) == 8
    enc = sim.pq_encode(emb, books)
    rows = enc.orderBy("neighbor_id").limit(20).collect()
    assert all(len(r["pq_codes"]) == 8 for r in rows)
    assert all(0 <= c <= 15 for r in rows for c in r["pq_codes"])
    assert all(r["recon_norm"] > 0 for r in rows)
    # codebook row k IS sub-vector k: a codebook vector encodes to itself
    own = {r["neighbor_id"]: r["pq_codes"] for r in rows if r["neighbor_id"] < 16}
    for vid, codes in own.items():
        assert list(codes) == [vid] * 8, f"vec {vid} must self-encode"


def test_pq_recall_vs_brute_force(emb, queries, exact):
    """8-byte codes lose information by design; seeded codebooks must
    still put a usable share of the true top-5 in the PQ top-5 (k-means
    refinement raises this further, as with IVF)."""
    books = sim.pq_seed_codebooks(emb, m=8, ksub=16)
    approx = _pairs(sim.pq_topk(emb, queries, books, k=5))
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.3, f"PQ recall@5 too low: {recall:.2f}"


def test_train_pq_codebooks_store(emb, tmp_path, monkeypatch):
    """Train-once PQ store: deterministic result, persisted JSON, second
    call (even after cache clear) reads the file — no retraining."""
    monkeypatch.setattr(sim, "_CENTROID_DIR", str(tmp_path))
    a = sim.train_pq_codebooks(emb, dataset="t1", m=8, ksub=16, iters=4, sample=200)
    assert len(a) == 8 and len(a[0]) == 16 and len(a[0][0]) == 8
    files = list(tmp_path.iterdir())
    assert len(files) == 1
    sim._CENTROID_CACHE.pop(("pq", "t1", "absent", 8, 16, 4))
    b = sim.train_pq_codebooks(emb, dataset="t1", m=8, ksub=16, iters=4, sample=200)
    assert a == b


def test_ivf_pq_composition_recall(emb, queries, exact):
    """The composed IVF+PQ stack (coarse prune + ADC scoring) must keep
    a usable share of true neighbors at nprobe=4/16 — both
    approximations stacked."""
    books = sim.pq_seed_codebooks(emb, m=8, ksub=16)
    cents = sim.train_centroids(emb, nlist=16, iters=2)
    out = sim.ivf_pq_topk(
        emb, queries, books, k=5, nlist=16, nprobe=4, centroids=cents
    )
    approx = _pairs(out)
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.15, f"IVF+PQ recall@5 too low: {recall:.2f}"
    # plan: broadcast probes, no corpus sort-merge join
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan


def test_semantic_dedup_planted_duplicates(spark):
    """Two planted near-identical vectors collapse to the lower id; the
    orthogonal distractor survives. Exercises cluster assignment, the
    within-cell pair join, and the keep-lowest-id survivor rule."""
    base = [1.0] + [0.0] * 63
    near = [1.0, 0.001] + [0.0] * 62
    ortho = [0.0, 1.0] + [0.0] * 62
    rows = [(0, base), (1, near), (2, ortho)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = [(0, base), (1, ortho)]
    out = {
        r["vec_id"]: r
        for r in sim.semantic_dedup(df, centroids=cents, eps=0.95).collect()
    }
    assert out[0]["keep"] and out[0]["dup_of"] is None
    assert not out[1]["keep"] and out[1]["dup_of"] == 0
    assert out[2]["keep"] and out[2]["dup_of"] is None
    # same-cell members below eps both survive
    out_hi = sim.semantic_dedup(df, centroids=cents, eps=1.1).collect()
    assert all(r["keep"] for r in out_hi)


def test_semantic_dedup_matches_registered_oracle_shape(emb, sf_dir):
    """Full-corpus run: every vector appears exactly once, every
    dropped vector points at a lower-id survivor in the same cell."""
    cents = sim.trained_centroids(
        emb, dataset=f"{sf_dir}/embeddings", nlist=16, iters=2
    )
    res = sim.semantic_dedup(emb, centroids=cents, eps=0.4).collect()
    assert len(res) == emb.count()
    cell_of = {r["vec_id"]: r["cell"] for r in res}
    kept = {r["vec_id"] for r in res if r["keep"]}
    for r in res:
        if not r["keep"]:
            assert r["dup_of"] in kept or not r["keep"], r
            assert r["dup_of"] < r["vec_id"]
            assert cell_of[r["dup_of"]] == r["cell"]


def test_mmr_rerank_diversifies(spark):
    """Plant a query, two near-identical high-relevance vectors, and a
    diverse medium-relevance vector: pure relevance ranks the twin
    second; MMR must rank the diverse vector second (the twin's
    similarity penalty outweighs its relevance edge). Plan must group
    via Arrow (FlatMapGroupsInPandas), no cartesian."""
    import math

    def vec(theta):
        v = [0.0] * 64
        v[0], v[1] = math.cos(theta), math.sin(theta)
        return v

    rows = [
        (0, vec(0.0)),            # the query
        (1, vec(0.19)),           # best relevance
        (2, vec(0.20)),           # near-twin of 1 (sim ≈ 1.0)
        (3, vec(-0.20)),          # same relevance as the twin, but on
                                  # the query's other side: far from 1
    ]
    df = spark.createDataFrame(rows, schema="vec_id long, embedding array<float>")
    q = df.filter(F.col("vec_id") == 0)
    out = sim.mmr_rerank(df, q, k=3, candidates=3, lam_pct=50).collect()
    picks = [r["neighbor_id"] for r in sorted(out, key=lambda r: r["mmr_rank"])]
    assert picks[0] == 1, picks          # best relevance first
    assert picks[1] == 3, picks          # diversity beats the twin
    assert picks[2] == 2, picks

    from tests.test_plans import plan_of

    p = plan_of(sim.mmr_rerank(df, q, k=3, candidates=3, lam_pct=50))
    assert "FlatMapGroupsInPandas" in p
    assert "CartesianProduct" not in p


def test_hard_negatives_roles_and_ranking(spark):
    """The nearest same-label vector is the positive; the nearest
    different-label vector leads the negatives; self is excluded."""
    import math

    def vec(theta):
        v = [0.0] * 64
        v[0], v[1] = math.cos(theta), math.sin(theta)
        return v

    rows = [
        (0, vec(0.00), 7),   # anchor, label 7
        (1, vec(0.05), 7),   # near, same label -> the positive
        (2, vec(0.10), 3),   # near, different label -> neg rank 1
        (3, vec(0.50), 3),   # farther, different label -> neg rank 2
        (4, vec(1.20), 7),   # far, same label (loses the pos slot)
    ]
    df = spark.createDataFrame(
        rows, schema="vec_id long, embedding array<float>, label long"
    )
    out = sim.hard_negatives(
        df, df.filter(F.col("vec_id") == 0), k_neg=2, k_pos=1
    ).collect()
    by = {(r["role"], r["rank"]): r["neighbor_id"] for r in out}
    assert by[("pos", 1)] == 1
    assert by[("neg", 1)] == 2
    assert by[("neg", 2)] == 3
    assert len(out) == 3  # k_pos + k_neg, no self row


def test_jl_projection_matches_python_and_is_narrow(spark):
    """random_project must equal the plain-Python Σ sign·v4 fold, stay
    a shuffle-free projection, and derive a roughly balanced ±1 matrix."""
    from decaton_spark.functions import similarity as sim
    from tests.test_plans import plan_of

    signs = sim.jl_sign_matrix(8, 4)
    assert sim.jl_sign_matrix(8, 4) == signs  # deterministic
    flat = [s for row in signs for s in row]
    assert set(flat) <= {-1, 1} and abs(sum(flat)) < len(flat)

    vec = [0.11, -0.52, 0.3, 0.0, 0.25, -0.4, 0.07, 0.49]
    df = spark.createDataFrame(
        [(1, vec)], schema="vec_id long, embedding array<float>"
    )
    out = sim.random_project(df, in_dim=8, out_dim=4, unit=10_000)
    got = out.collect()[0]["rp"]
    v4 = [round(float(__import__("numpy").float32(x)) * 10_000) for x in vec]
    want = [sum(s * v for s, v in zip(row, v4)) for row in signs]
    assert got == want
    assert "Exchange" not in plan_of(out), "projection must not shuffle"


def test_margin_mining_integer_math_and_argmax(spark):
    """margin_milli must equal the pure-Python (8000*c4) // (a_sum+b_sum)
    fold on a tiny planted fixture, pick each source's argmax target,
    and drop sub-threshold sources entirely."""
    import math

    from decaton_spark.functions import similarity as sim

    src_rows = [(0, [1.0, 0.0]), (1, [0.0, 1.0])]
    tgt_rows = [(10, [1.0, 0.0]), (11, [0.7, 0.7]), (12, [-1.0, 0.0])]
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, schema="vec_id long, embedding array<float>"
    )
    out = {
        r["src_id"]: r
        for r in sim.margin_mining(
            mk(src_rows), mk(tgt_rows), k=2, threshold_milli=1000
        ).collect()
    }

    def c4(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na, nb = math.sqrt(sum(x * x for x in a)), math.sqrt(sum(x * x for x in b))
        return round(d / (na * nb) * 10_000)

    cos = {(s, t): c4(sv, tv) for s, sv in src_rows for t, tv in tgt_rows}
    a_sum = {s: sum(sorted((cos[(s, t)] for t, _ in tgt_rows), reverse=True)[:2])
             for s, _ in src_rows}
    b_sum = {t: sum(sorted((cos[(s, t)] for s, _ in src_rows), reverse=True)[:2])
             for t, _ in tgt_rows}
    expected = {}
    for s, _ in src_rows:
        best = None
        for t, _ in tgt_rows:
            if cos[(s, t)] <= 0 or a_sum[s] + b_sum[t] <= 0:
                continue
            m = (8000 * cos[(s, t)]) // (a_sum[s] + b_sum[t])
            if best is None or m > best[1] or (m == best[1] and t < best[0]):
                best = (t, m)
        if best and best[1] >= 1000:
            expected[s] = best
    assert {s: (r["tgt_id"], r["margin_milli"]) for s, r in out.items()} == expected
    assert len(expected) > 0  # fixture actually mines something


def test_margin_mining_bucketed_is_equijoin_and_within_bucket(spark):
    """bucket_dims must turn the scoring join into a bucket equi-join:
    cross-bucket pairs never score, and the plan carries no
    BroadcastNestedLoopJoin/CartesianProduct."""
    from decaton_spark.functions import similarity as sim
    from tests.test_plans import plan_of

    # bucket on sign of dim0: src 1 (+), 2 (-); tgt 10 (+), 11 (-)
    src = spark.createDataFrame(
        [(1, [1.0, 0.2]), (2, [-1.0, 0.2])],
        schema="vec_id long, embedding array<float>",
    )
    tgt = spark.createDataFrame(
        [(10, [0.9, 0.1]), (11, [-0.9, 0.1])],
        schema="vec_id long, embedding array<float>",
    )
    out = sim.margin_mining(src, tgt, k=1, threshold_milli=0, bucket_dims=(0,))
    got = {(r["src_id"], r["tgt_id"]) for r in out.collect()}
    assert got == {(1, 10), (2, 11)}  # same-bucket partners only
    p = plan_of(out, "simple")
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p


def test_ivf_cell_stats_planted_clusters(spark):
    """Two tight planted clusters around orthogonal axes: every vector
    lands in its seed's cell, occupancy matches, and cohesion is near
    10000 (cosine ~1.0 to the converged centroid); the assignment stays
    a shuffle-free projection."""
    from decaton_spark.functions import similarity as sim
    from tests.test_plans import plan_of

    rows = []
    for i in range(6):  # cluster 0: x-axis-ish (ids 0..5)
        rows.append((i, [1.0, 0.01 * i, 0.0, 0.0]))
    for i in range(4):  # cluster 1: y-axis-ish (ids 6..9)
        rows.append((6 + i, [0.01 * i, 1.0, 0.0, 0.0]))
    df = spark.createDataFrame(rows, schema="vec_id long, embedding array<float>")
    cents = sim.train_centroids(df, nlist=2, iters=2)
    out = {r["cell"]: r for r in sim.ivf_cell_stats(df, centroids=cents).collect()}
    assert out[0]["n_vectors"] == 6 and out[1]["n_vectors"] == 4
    for c in (0, 1):
        assert out[c]["mean_cos_c4"] > 9900
        assert out[c]["min_cos_c4"] <= out[c]["mean_cos_c4"] <= out[c]["max_cos_c4"]
    p = plan_of(sim.ivf_cell_stats(df, centroids=cents), "simple")
    assert p.count("Exchange") - p.count("BroadcastExchange") <= 1  # the groupBy only


def test_artifact_store_sweep_and_race_tolerance(emb, tmp_path, monkeypatch):
    """ADVICE r8: (1) a concurrent sibling sweep deleting the artifact
    between exists() and open() must fall through to retraining, not
    raise FileNotFoundError — pinned by pointing the reader at corrupt
    and vanished files; (2) pre-round-8 single-segment filenames never
    match the two-segment prefix and accumulated forever — the sweep
    now clears them; in-flight *.tmp files survive the sweep."""
    monkeypatch.setattr(sim, "_CENTROID_DIR", str(tmp_path))
    # the same fingerprint trained_centroids will compute for "ds1"
    # (a non-path dataset tag has no fixture file -> "absent")
    from decaton_spark.sources import fixture_fingerprint

    fp = fixture_fingerprint("ds1")
    # corrupt file at the exact path: half-written by a crashed writer
    path = sim._artifact_path("ds1", fp, "n4_i1")
    with open(path, "w") as f:
        f.write('[["not json')
    assert sim._load_artifact(path) is None
    # vanished between exists() and open(): simply absent
    import os

    os.remove(path)
    assert sim._load_artifact(path) is None
    # trained_centroids regenerates through the corrupt-artifact path
    with open(path, "w") as f:
        f.write("{")
    cents = sim.trained_centroids(emb, dataset="ds1", nlist=4, iters=1)
    assert len(cents) == 4
    # legacy pre-r8 name, a stale same-dataset sibling, and a tmp file
    legacy = tmp_path / "0123456789abcdef_n16_i4.json"
    legacy.write_text("[]")
    stale = tmp_path / (path.split("/")[-1][:13] + "deadbeef0000_n9_i9.json")
    stale.write_text("[]")
    tmp_file = tmp_path / "whatever.json.123.tmp"
    tmp_file.write_text("{}")
    sim._artifact_path("ds1", fp, "n4_i1")  # triggers the sweep
    assert not legacy.exists(), "legacy-format artifact must be swept"
    assert not stale.exists(), "stale same-dataset sibling must be swept"
    assert tmp_file.exists(), "in-flight tmp files must survive the sweep"
    assert os.path.exists(path), "the live artifact must survive"
