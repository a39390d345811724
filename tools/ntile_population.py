"""Population-growth evidence for the exact global-rank family
(VERDICT r5 ask #6).

The u10 ladder rung measures the per-user window family at 10× users;
the open question was whether the exact_global_ntile /
global_running_sum range exchange stays population-proportional well
past that. Ranks need only the sort key — not full event payloads — so
this tool drives the operators directly on synthetic per-user frames
(user_id + a heavy-tailed activity count, the realistic shape of a
per-user aggregate) at 1e6 / 1e7 / 1e8 users: two further decades of
USER growth beyond the u10 rung, at the same per-row width the real
consumers (events_power_user_curve, events_rfm_segments,
parts_abc_classification) feed the operator.

For each decade it records:
- wall seconds for the full ntile (and running-sum) materialization;
- the range-exchange balance: max/mean rows per physical partition of
  the ranked frame. The correctness argument says boundary placement
  cannot change any rank; the SCALE argument needs the exchange to
  spread a skewed key roughly evenly — measured here, not argued.

The sort key is deliberately heavy-tailed (Zipf-ish: ~37% of users on
the lowest activity value) with user_id as the unique tiebreak, the
worst realistic shape for a range partitioner: a total ordering whose
leading key has massive ties.

Writes NTILE_POPULATION.json at the repo root and prints the table;
PERFORMANCE.md summarizes the result.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from decaton_spark import get_spark  # noqa: E402
from decaton_spark.functions.stats import (  # noqa: E402
    exact_global_ntile,
    global_running_sum,
)

DECADES = [1_000_000, 10_000_000, 100_000_000]


def per_user_frame(spark, n_users: int):
    """Synthetic per-user aggregate: heavy-tailed activity counts.
    Knuth-hash the id so adjacent ids don't share activity, then map
    the hash to a Zipf-ish discrete distribution: activity a with
    probability ~ 1/(a+1)(a+2) — ~37% of the population ties on the
    single lowest value (the hard case for a range exchange on
    (activity DESC, user_id))."""
    h = (F.col("id") * F.lit(2654435761)) % F.lit(1_000_003)
    u = h / F.lit(1_000_003.0)  # ~uniform(0,1), deterministic
    activity = F.least(
        (F.lit(1.0) / (F.lit(1.0) - u) - F.lit(1.0)).cast("long"),
        F.lit(10_000),
    )
    return spark.range(n_users).select(
        F.col("id").alias("user_id"), activity.alias("n_events")
    )


def balance(df) -> dict:
    """Rows per physical partition after the operator's range exchange
    (re-derived exactly as the operator builds it).

    Counted per-partition in ONE mapPartitions job so EMPTY partitions
    are included: a groupBy(spark_partition_id) emits no row for an
    empty partition, and a mean over only the non-empty ones would
    understate exactly the skew this tool exists to measure (a range
    exchange that parks everything in a few partitions and leaves the
    rest empty would otherwise read as 'balanced'). A separate
    getNumPartitions() probe is NOT used — under AQE the .rdd plan and
    a second aggregation job can pick different coalesced partition
    counts, so the rows and the denominator must come from the same
    execution."""
    counts = df.rdd.mapPartitions(
        lambda it: [sum(1 for _ in it)]
    ).collect()
    mean = sum(counts) / len(counts) if counts else 0.0
    return {
        "partitions": len(counts),
        "empty_partitions": sum(1 for c in counts if c == 0),
        "max_rows": max(counts, default=0),
        "mean_rows": int(mean),
        # degenerate (empty / all-empty) frames have no meaningful skew
        # ratio — report None instead of raising (ADVICE r6)
        "max_over_mean": round(max(counts) / mean, 2) if mean else None,
    }


def main() -> None:
    spark = get_spark("decaton-ntile-population")
    order = [F.col("n_events").desc(), F.col("user_id")]
    out: dict[str, dict] = {}
    for n in DECADES:
        # No input-side checkpoint: the synthetic frame is pure
        # expression math over spark.range (recompute is ~free), and a
        # second 1e8-row cache would make the 1e8 rung measure the
        # local block manager's spill behavior, not the operator.
        df = per_user_frame(spark, n)
        ranked = df.repartitionByRange(*order).sortWithinPartitions(*order)
        bal = balance(ranked)

        ntile_sec = None
        for _ in range(2):  # keep-min: strips GC/page-cache noise
            t0 = time.perf_counter()
            exact_global_ntile(
                df, n_tiles=10, order_cols=order, out_col="decile"
            ).write.format("noop").mode("overwrite").save()
            sec = round(time.perf_counter() - t0, 2)
            ntile_sec = sec if ntile_sec is None else min(ntile_sec, sec)

        rsum_sec = None
        for _ in range(2):
            t0 = time.perf_counter()
            global_running_sum(
                df,
                order_cols=order,
                value_col="n_events",
                out_col="cum_events",
            ).write.format("noop").mode("overwrite").save()
            sec = round(time.perf_counter() - t0, 2)
            rsum_sec = sec if rsum_sec is None else min(rsum_sec, sec)

        out[f"{n:_}"] = {
            "ntile_sec": ntile_sec,
            "running_sum_sec": rsum_sec,
            "exchange_balance": bal,
        }
        print(f"{n:>11,} users: ntile {ntile_sec}s  running_sum "
              f"{rsum_sec}s  balance {bal}", flush=True)

    keys = list(out)
    for a, b in zip(keys, keys[1:]):
        g = round(out[b]["ntile_sec"] / max(out[a]["ntile_sec"], 0.01), 1)
        out[b]["ntile_growth_per_decade"] = g
        g2 = round(
            out[b]["running_sum_sec"] / max(out[a]["running_sum_sec"], 0.01),
            1,
        )
        out[b]["running_sum_growth_per_decade"] = g2
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "NTILE_POPULATION.json"), "w") as f:
        json.dump(out, f, indent=2, sort_keys=True)
    print(json.dumps(out, indent=2, sort_keys=True))


if __name__ == "__main__":
    main()
