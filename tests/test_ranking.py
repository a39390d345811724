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


# ---- hypothesis properties over the pure-int MM iterator ----

from hypothesis import given, settings
from hypothesis import strategies as st

_duel_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),   # item a
        st.integers(min_value=0, max_value=5),   # item b
        st.integers(min_value=1, max_value=50),  # comparisons
    ).filter(lambda t: t[0] != t[1]),
    min_size=1,
    max_size=20,
)


def _to_duels(raw):
    """Raw (a, b, n) → symmetric ordered duel list with a wins ⌈n/2⌉."""
    from collections import Counter

    n = Counter()
    w = Counter()
    for a, b, k in raw:
        sa, sb = f"i{a}", f"i{b}"
        n[(sa, sb)] += k
        n[(sb, sa)] += k
        w[(sa, sb)] += (k + 1) // 2
        w[(sb, sa)] += k // 2
    return [(s, t, c, w[(s, t)]) for (s, t), c in sorted(n.items())]


@settings(max_examples=200, deadline=None)
@given(raw=_duel_strategy)
def test_bt_properties(raw):
    """For ANY duel list: every rating ≥ the clamp, ratings are
    permutation-invariant in the duel ordering, total wins conserve,
    and an item that never loses is rated ≥ every item it beat."""
    duels = _to_duels(raw)
    p = rk.bt_iterate(duels)
    assert all(v >= rk.CLAMP for v in p.values())
    # permutation invariance: the iterator is a sum over duels
    p2 = rk.bt_iterate(list(reversed(duels)))
    assert p == p2
    # never-lost items dominate the items they beat
    losses = {s: 0 for s in p}
    beat: dict[str, set] = {s: set() for s in p}
    for s, t, c, w in duels:
        losses[s] += c - w
        if w == c and c > 0:
            beat[s].add(t)
    for s in p:
        if losses[s] == 0:
            for t in beat[s]:
                assert p[s] >= p[t], (s, t, p)
