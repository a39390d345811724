"""Skew-aware aggregation: two-phase salted groupBy.

At 100 TB a handful of hot keys (Decaton's "bursting client" scenario,
the same traffic shape T6's per-key quota exists for —
``docs/key-blocking.adoc``) can pin one reducer while the rest of the
cluster idles. AQE splits skewed *joins* at runtime, but a skewed
**aggregation** still funnels each key through a single final-agg task
unless the aggregate is decomposed.

``salted_agg`` does the classic two-phase decomposition declaratively:

    phase 1: groupBy(key, salt = hash(fine_col) % n_salts)  — the hot
             key's rows spread over ``n_salts`` reducers, partials
             combine map-side as usual;
    phase 2: groupBy(key) over the (≤ n_salts per key) partials.

Phase 2's input is bounded by ``distinct_keys × n_salts`` rows, so the
second shuffle is negligible. Works for any algebraic aggregate
(sum/count/min/max — and avg as sum+count). Results are exactly equal
to the single-phase groupBy, which is what the oracle checks.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: (partial_expr, final_expr) pairs per supported aggregate
_ALGEBRAIC = {
    "sum": (F.sum, F.sum),
    "count": (lambda c: F.count(c), F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(
    df: DataFrame,
    *,
    key_cols: Sequence[str],
    aggs: Sequence[tuple[str, Column | str, str]],
    salt_col: Column | str,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation with a salt derived from ``salt_col``.

    ``aggs`` is a list of ``(agg_name, input_col, output_alias)`` with
    ``agg_name`` in {sum, count, min, max}. ``salt_col`` should be a
    fine-grained column (an id, an offset) so the salt spreads a hot
    key's rows evenly; it does not need to be distinct.
    """
    salt = F.pmod(F.xxhash64(F.col(salt_col) if isinstance(salt_col, str) else salt_col), F.lit(n_salts))
    partial_exprs = []
    final_exprs = []
    for name, col, alias in aggs:
        if name not in _ALGEBRAIC:
            raise ValueError(f"unsupported aggregate {name!r}")
        partial_fn, final_fn = _ALGEBRAIC[name]
        c = F.col(col) if isinstance(col, str) else col
        partial_exprs.append(partial_fn(c).alias(f"_p_{alias}"))
        final_exprs.append(final_fn(F.col(f"_p_{alias}")).alias(alias))
    partial = df.withColumn("_salt", salt).groupBy(*key_cols, "_salt").agg(*partial_exprs)
    return partial.groupBy(*key_cols).agg(*final_exprs)
