"""Per-key stateful streaming operators (the hard part of the port).

Decaton's compaction holds ≤1 task per key in memory and flushes the
survivor when the linger window closes
(``CompactionProcessor.java:149-227``). Streaming form here:
``groupByKey(key).applyInPandasWithState`` — state holds the current
survivor per (key, linger window); every microbatch emits the updated
survivors (update-mode semantics), so the **last** emission per
(key, window) equals the batch operator's output. Unlike the
reference, state is checkpointed (RocksDB/HDFS state store), so a
restart does not lose the window — strictly stronger than Decaton's
in-memory window (SURVEY §2.6 "lost on rebalance").

The per-key hash shuffle of groupByKey IS the sub-partitioner (P1);
rows within a (key, batch) are processed in (partition, offset) order,
preserving Decaton's PROCESS_ORDERING invariant; keys are independent,
giving SERIAL_PROCESSING per key.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def _survivor_reduce(pdf: pd.DataFrame, window_ms: int) -> pd.DataFrame:
    """Batch-local last-wins per (key, window): max (ts, offset)."""
    pdf = pdf.assign(_win=(pdf["meta_timestamp_millis"] // window_ms) * window_ms)
    pdf = pdf.sort_values(["_win", "meta_timestamp_millis", "offset"])
    return pdf.groupby("_win", as_index=False).last()


def streaming_compact(
    tasks: DataFrame,
    *,
    window_ms: int = 3_600_000,
    key_col: str = "key",
) -> DataFrame:
    """Streaming T1: emits the current survivor per (key, linger window)
    each time it changes. Output schema: key, window_start_ms, offset,
    meta_timestamp_millis, value.
    """
    out_schema = (
        f"{key_col} string, window_start_ms long, offset long, "
        "meta_timestamp_millis long, value string"
    )
    state_schema = "wins array<long>, offs array<long>, tss array<long>, vals array<string>"

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            wins, offs, tss, vals = state.get
            held = pd.DataFrame(
                {
                    "_win": list(wins),
                    "offset": list(offs),
                    "meta_timestamp_millis": list(tss),
                    "value": list(vals),
                }
            )
        else:
            held = pd.DataFrame(
                columns=["_win", "offset", "meta_timestamp_millis", "value"]
            )

        batch = pd.concat(list(pdfs), ignore_index=True)
        if len(batch):
            reduced = _survivor_reduce(
                batch[["meta_timestamp_millis", "offset", "value"]], window_ms
            )
            merged = pd.concat(
                [held, reduced[["_win", "offset", "meta_timestamp_millis", "value"]]],
                ignore_index=True,
            )
        else:
            merged = held
        merged = (
            merged.sort_values(["_win", "meta_timestamp_millis", "offset"])
            .groupby("_win", as_index=False)
            .last()
        )
        state.update(
            (
                merged["_win"].astype("int64").tolist(),
                merged["offset"].astype("int64").tolist(),
                merged["meta_timestamp_millis"].astype("int64").tolist(),
                merged["value"].astype(str).tolist(),
            )
        )
        out = merged.rename(columns={"_win": "window_start_ms"})
        out[key_col] = key[0]
        yield out[
            [key_col, "window_start_ms", "offset", "meta_timestamp_millis", "value"]
        ]

    return (
        tasks.select(key_col, "meta_timestamp_millis", "offset", "value")
        .groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
