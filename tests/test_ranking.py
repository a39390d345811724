"""Bradley–Terry preference ranking (functions/ranking.py): MM
convergence semantics, pairing determinism, matrix boundedness."""

from __future__ import annotations

from decaton_spark.functions import ranking as rk


def _duels(records):
    """records: (winner, loser, times) → ordered duel list."""
    from collections import Counter

    n = Counter()
    w = Counter()
    for a, b, k in records:
        n[(a, b)] += k
        n[(b, a)] += k
        w[(a, b)] += k
    return [(s, t, c, w[(s, t)]) for (s, t), c in sorted(n.items())]


def test_bt_orders_a_transitive_hierarchy():
    # a beats b 9:1, b beats c 9:1, a beats c 9:1 — rating must order
    # a > b > c with real separation.
    duels = _duels(
        [("a", "b", 9), ("b", "a", 1),
         ("b", "c", 9), ("c", "b", 1),
         ("a", "c", 9), ("c", "a", 1)]
    )
    p = rk.bt_iterate(duels)
    assert p["a"] > p["b"] > p["c"]
    assert p["a"] > 2 * p["c"]


def test_bt_symmetric_duels_tie():
    duels = _duels([("a", "b", 5), ("b", "a", 5)])
    p = rk.bt_iterate(duels)
    assert p["a"] == p["b"]


def test_bt_shutout_loser_hits_clamp():
    duels = _duels([("a", "b", 10)])
    p = rk.bt_iterate(duels)
    assert p["b"] == rk.CLAMP
    assert p["a"] > rk.P_UNIT


def test_pairing_deterministic_and_matrix_bounded(spark, sf_dir):
    from decaton_spark.sources import load_table

    docs = load_table(spark, "documents", sf_dir)
    c1 = rk.pair_comparisons(docs, buckets=8).toPandas()
    c2 = rk.pair_comparisons(docs, buckets=8).toPandas()
    key = ["winner_item", "loser_item"]
    assert (
        c1.sort_values(key, ignore_index=True)
        .equals(c2.sort_values(key, ignore_index=True))
    )
    n_items = docs.select("source").distinct().count()
    m = rk.duel_matrix(rk.pair_comparisons(docs, buckets=8))
    assert m.count() <= n_items * (n_items - 1)
