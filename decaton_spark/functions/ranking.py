"""Preference ranking: Bradley–Terry ratings from pairwise
comparisons — the aggregation step of an RLHF / preference-data
pipeline (rank generators, prompts sources, or annotator pools from
millions of pairwise win/loss records).

Two stages with very different scales, split accordingly:

1. **Comparison reduction** (corpus-sized, distributed): raw pairwise
   records reduce to the duel matrix — per ordered item pair (s, t),
   how many comparisons and how many wins for ``s``. One
   partial-aggregable groupBy; the matrix is bounded by the ITEM
   vocabulary (|items|²), not the comparison count, exactly like a
   sketch. 10⁹ comparisons over 20 items → 400 rows.

2. **MM iteration** (item-sized, driver-side): Hunter (2004)'s
   minorize–maximize update
   ``p_s ← W_s / Σ_t n_st / (p_s + p_t)``
   runs on the collected matrix — the ``train_centroids`` pattern: a
   bounded driver round-trip producing a literal result, because 400
   rows do not need a cluster and per-round DataFrame lineage over an
   iterative tiny frame is the pathology ``functions/graph.py``
   documents.

The iteration is **fixed-point integer arithmetic** (ratings in 1e-6
units, every division a floor-division of positive integers) so the
DuckDB oracle replays all rounds bit-for-bit — the same reason the
k-means trainer and PageRank use scaled integers. Per round, with
``P = 10**6`` (one rating unit):

- ``den3 = (p_s + p_t) // 1000``            (≥ 2, both p ≥ 1000)
- ``D_s  = Σ_t (n_st * 10**9) // den3``     (≥ 1 per duel)
- ``p'   = (W_s * 10**12) // D_s``          (W_s = 0 ⇒ 0, clamped below)
- ``q    = max(p' // 1000, 1)``             (shrink before normalize)
- ``p''  = max((q * K * 10**6) // Σq, 1000)``  (mean back to ~1 unit,
  floor clamp keeps every item connected — standard BT regularization)

Magnitudes stay under 2⁶³ by construction (documented per line above;
the oracle still sums through HUGEINT and casts back).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from decaton_spark.functions.hashing import md5_bucket

P_UNIT = 1_000_000
CLAMP = 1_000
ITERS = 8


def pair_comparisons(
    df: DataFrame,
    *,
    buckets: int = 8,
    item_col: str = "source",
    score_col: str = "n_chars",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic synthetic comparisons: documents pair up inside
    md5 hash buckets (consecutive rows in md5 order), and the higher
    ``score_col`` (tie → lower id) wins for its ``item_col``.

    This is the harness that turns a plain corpus into preference
    records for the oracle-paired query; a real deployment feeds
    ``bradley_terry`` its actual (winner_item, loser_item) log instead.
    Window partitions are bounded at |corpus| / buckets — widen
    ``buckets`` with the corpus.

    Returns (winner_item, loser_item) with same-item duels dropped.
    """
    b = F.expr(md5_bucket(f"CAST({id_col} AS STRING)", buckets))
    base = df.select(
        F.col(id_col).alias("_id"),
        F.col(item_col).alias("_item"),
        F.col(score_col).cast("long").alias("_score"),
        b.alias("_b"),
        F.md5(F.col(id_col).cast("string")).alias("_h"),
    )
    w = Window.partitionBy("_b").orderBy("_h", "_id")
    seq = base.select(
        "*",
        ((F.row_number().over(w) - 1) / 2).cast("long").alias("_pair"),
        ((F.row_number().over(w) - 1) % 2).alias("_side"),
    )
    a = seq.filter(F.col("_side") == 0).select(
        "_b", "_pair",
        F.col("_item").alias("a_item"), F.col("_score").alias("a_score"),
        F.col("_id").alias("a_id"),
    )
    c = seq.filter(F.col("_side") == 1).select(
        "_b", "_pair",
        F.col("_item").alias("b_item"), F.col("_score").alias("b_score"),
        F.col("_id").alias("b_id"),
    )
    paired = a.join(c, ["_b", "_pair"])  # co-partitioned equi-join
    a_wins = (F.col("a_score") > F.col("b_score")) | (
        (F.col("a_score") == F.col("b_score")) & (F.col("a_id") < F.col("b_id"))
    )
    return paired.select(
        F.when(a_wins, F.col("a_item")).otherwise(F.col("b_item")).alias("winner_item"),
        F.when(a_wins, F.col("b_item")).otherwise(F.col("a_item")).alias("loser_item"),
    ).filter(F.col("winner_item") != F.col("loser_item"))


def duel_matrix(comparisons: DataFrame) -> DataFrame:
    """Reduce (winner_item, loser_item) records to the ordered duel
    matrix (s, t, n, w): comparisons and s-wins per ordered pair.
    The distributed half: one partial-aggregable groupBy; output is
    |items|²-bounded."""
    sym = comparisons.select(
        F.col("winner_item").alias("s"),
        F.col("loser_item").alias("t"),
        F.lit(1).alias("win"),
    ).unionByName(
        comparisons.select(
            F.col("loser_item").alias("s"),
            F.col("winner_item").alias("t"),
            F.lit(0).alias("win"),
        )
    )
    return sym.groupBy("s", "t").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("win").cast("long").alias("w"),
    )


def bt_iterate(
    duels: list[tuple[str, str, int, int]], *, iters: int = ITERS
) -> dict[str, int]:
    """Fixed-point integer MM iterations over a collected duel list.
    Returns {item: rating in 1e-6 units}. Pure positive-int floor
    arithmetic — replayed verbatim by the SQL oracle."""
    items = sorted({s for s, _, _, _ in duels})
    k = len(items)
    wins = {s: 0 for s in items}
    for s, _, _, w in duels:
        wins[s] += w
    p = {s: P_UNIT for s in items}
    for _ in range(iters):
        d = {s: 0 for s in items}
        for s, t, n, _ in duels:
            den3 = (p[s] + p[t]) // 1000
            d[s] += (n * 10**9) // den3
        # d[s] ≥ 1 always: every item in the duel list has ≥1 duel and
        # each term is ≥1 (n·10⁹ ≥ 10⁹ ≫ den3 — see module docstring)
        q = {s: max(((wins[s] * 10**12) // d[s]) // 1000, 1) for s in items}
        tot = sum(q.values())
        p = {s: max((q[s] * k * P_UNIT) // tot, CLAMP) for s in items}
    return p


def bradley_terry(
    comparisons: DataFrame, *, iters: int = ITERS
) -> DataFrame:
    """Bradley–Terry ratings of every item seen in cross-item
    comparisons: (item, rating_micro, wins, n_comparisons, rank).

    Distributed duel-matrix reduction, bounded driver-side integer MM
    (module docstring), literal result frame — rank by rating desc,
    item asc."""
    rows = duel_matrix(comparisons).collect()
    duels = [(r["s"], r["t"], r["n"], r["w"]) for r in rows]
    ratings = bt_iterate(duels, iters=iters)
    wins = {s: 0 for s in ratings}
    ncomp = {s: 0 for s in ratings}
    for s, _, n, w in duels:
        wins[s] += w
        ncomp[s] += n
    ordered = sorted(ratings, key=lambda s: (-ratings[s], s))
    spark = comparisons.sparkSession
    return spark.createDataFrame(
        [
            (s, ratings[s], wins[s], ncomp[s], i + 1)
            for i, s in enumerate(ordered)
        ],
        schema="item string, rating_micro long, wins long, "
        "n_comparisons long, rank long",
    )
