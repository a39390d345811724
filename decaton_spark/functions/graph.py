"""Graph centrality over document-similarity edges.

PageRank in exact integer fixed-point arithmetic, so the DuckDB
correctness oracle replays every iteration bit-for-bit: floating-point
PageRank is NOT cross-engine reproducible (per-node sums accumulate in
engine- and partition-dependent order), but integer mass is — BIGINT
sums are order-free and both engines' non-negative integer division
truncate identically.

Scheme: total mass ``scale`` (default 10^12 micro-units) split evenly
as ``scale DIV n`` per node; each iteration a node ships
``r DIV degree`` to every neighbour and receives
``teleport + (damping_pct * incoming) DIV 100`` where
``teleport = ((100 - damping_pct) * (scale DIV n)) DIV 100``. All
remainders are dropped deterministically — this is standard damped
PageRank quantized to a fixed grid, not an approximation of unknown
direction: per-node values sit within n·iters quantization drops of
the real-valued fixed point, and the RANKING (the product a curation
pipeline consumes) is what the grid preserves.

Reference parity note: beyond-reference LLM-pipeline surface (the
reference engine has no graph operators); the published use is ranking
duplicate-cluster "hub" documents — a high-centrality node in the
near-dup graph is boilerplate or a template page whose whole cluster
deserves one curation decision.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    *,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    iters: int = 3,
    damping_pct: int = 85,
    scale: int = 10**12,
) -> DataFrame:
    """Integer-exact PageRank over an UNDIRECTED edge list (each input
    row (a, b) becomes both directions; self-loops and duplicate pairs
    are deduplicated).

    Plan shape at scale: every per-iteration step is edge-sized, never
    corpus-sized, and exactly ONE shuffle deep — the rank table joins
    the degree-annotated symmetric edge list on the source id, and one
    partial-agg groupBy on the destination produces the next rank
    table directly. Both endpoint degrees are attached to the edge
    list ONCE before the loop (the pre-round-9 form joined the degree
    table back every iteration — a second edge-sized shuffle per
    iteration — and re-derived the 1-row node count as a
    crossJoin-broadcast agg job per reference: 2 + 3·iters stages of
    pure overhead on a 16k-edge sf0.1 graph, measured ~1.1 s of the
    query's 2.1 s). The node count is collected once driver-side — a
    bounded 1-row model-state pull, same class as the IVF centroid
    pull — so the teleport term is a literal. ``iters`` is a small
    constant (3 default), so the plan stays O(iters) deep.

    Returns (id, degree, pr_micromass) — one row per node that has at
    least one edge, ``pr_micromass`` in units of ``scale`` total mass.
    """
    if not 0 <= damping_pct <= 100:
        raise ValueError("damping_pct must be in [0, 100]")
    a, b = F.col(src_col), F.col(dst_col)
    sym = (
        # symmetrize via ONE explode, not a self-union: each union
        # branch re-executes the upstream edge derivation (the
        # LSH+verify pipeline shuffles ~1.2 GB of pair+gram rows at
        # ×100) before the checkpoint materializes — the explode form
        # runs it once (same fix as connected_components, round 10)
        edges.select(
            F.explode(
                F.array(
                    F.struct(a.alias("src"), b.alias("dst")),
                    F.struct(b.alias("src"), a.alias("dst")),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        # staged once: keeps the upstream edge derivation (e.g. the
        # LSH+verify pipeline) from re-running for the degree table
        # and the annotated-edge build — same rationale as
        # connected_components' per-round checkpoint (measured 17 s ->
        # ~2 s on the near-dup graph at sf0.1)
        .localCheckpoint(eager=False)
    )
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("d")).select(
        F.col("src").alias("id"), "d"
    )
    # undirected symmetric graph: every node emits and receives ≥ 1
    # contribution, so the per-iteration groupBy below never drops a
    # node and carrying d_dst through it preserves the degree table
    sym_d = (
        sym.join(deg.select(F.col("id").alias("src"), F.col("d").alias("d_src")), "src")
        .join(deg.select(F.col("id").alias("dst"), F.col("d").alias("d_dst")), "dst")
        .select("src", "dst", "d_src", "d_dst")
        .localCheckpoint(eager=False)
    )
    n = deg.count()  # bounded driver pull: ONE long, not data rows
    if n == 0:
        # empty graph: the pre-round-9 plan computed the base rank as
        # a SQL expression over zero rows and returned an empty frame;
        # the driver-side literal would instead divide by zero
        return deg.select(
            "id",
            F.col("d").cast("long").alias("degree"),
            F.lit(0).cast("long").alias("pr_micromass"),
        )
    base = scale // n
    teleport = ((100 - damping_pct) * base) // 100
    pr = deg.select("id", "d", F.lit(base).alias("r"))
    for _ in range(iters):
        pr = (
            pr.join(sym_d, pr["id"] == sym_d["src"])
            .select("dst", "d_dst", F.expr("r DIV d_src").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"), F.max("d_dst").alias("d"))
            .select(
                F.col("dst").alias("id"),
                "d",
                F.expr(f"{teleport} + ({damping_pct} * s) DIV 100").alias("r"),
            )
        )
    return pr.select(
        "id", F.col("d").cast("long").alias("degree"), F.col("r").alias("pr_micromass")
    )


def triangle_stats(
    edges: DataFrame,
    *,
    src_col: str = "id_a",
    dst_col: str = "id_b",
) -> DataFrame:
    """Triangle count + local clustering coefficient per node over an
    UNDIRECTED edge list — the cluster-density gauge for the near-dup
    graph: a coefficient near 1000 pml means the node's duplicate
    neighbourhood is a clique (one template page copied everywhere,
    safe to collapse to a single survivor); a low coefficient flags a
    chain of pairwise-similar-but-drifting revisions that needs a
    transitivity decision before collapsing.

    Enumeration is the ordered wedge join: edges normalized to
    ``a < b``, wedge (x<y<z) from (x,y)⋈(y,z), closed against (x,z) —
    each triangle found exactly once, cost Σ deg(v)² bounded by the
    verified-bucket degree, never |V|². The edge list is consumed four
    times (three join legs + degrees), so it is staged through ONE
    lazy localCheckpoint. Coefficient is exact integer per-mille
    (``2000·tri DIV deg·(deg-1)``) so a SQL oracle replays it
    bit-for-bit.

    Returns (id, degree, triangles, clustering_pml), one row per node
    with at least one edge.
    """
    a, b = F.col(src_col), F.col(dst_col)
    e = (
        edges.select(F.least(a, b).alias("a"), F.greatest(a, b).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    deg = (
        e.select(F.col("a").alias("id"))
        .unionAll(e.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    wedge = (
        e.select(F.col("a").alias("x"), F.col("b").alias("y"))
        .join(e.select(F.col("a").alias("y"), F.col("b").alias("z")), "y")
    )
    tri = wedge.join(
        e.select(F.col("a").alias("x"), F.col("b").alias("z")), ["x", "z"]
    ).select("x", "y", "z")
    # one explode, not a 3-way self-union: the union form leans on
    # ReusedExchange to deduplicate the wedge + closure joins across
    # its branches (interleaved ×100 A/B read parity, so it DID fire
    # here) — but that reuse is fragile (it demonstrably fails across
    # alias-renamed subtrees, see verify_pairs_jaccard's round-10
    # notes), and the explode form does not rely on it (round 10)
    tcount = (
        tri.select(F.explode(F.array("x", "y", "z")).alias("id"))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    joined = deg.join(tcount, "id", "left").select(
        "id",
        F.col("degree").cast("long").alias("degree"),
        F.coalesce("triangles", F.lit(0)).cast("long").alias("triangles"),
    )
    return joined.withColumn(
        "clustering_pml",
        F.when(
            F.col("degree") >= 2,
            F.expr("(2000 * triangles) DIV (degree * (degree - 1))"),
        ).otherwise(F.lit(0)).cast("long"),
    )
