"""Reference-workload mirror: I/O-bound task throughput.

The reference's benchmark (``benchmark/.../Task.java:62-66``,
``RecordsGenerator.java:60-80``, ``DecatonRunner.java:56-120``) produces
JSON tasks ``{producedTime, processLatency}`` whose processor sleeps
``processLatency`` ms to simulate I/O, and measures sustained tasks/s —
~23,000/s per 8-core instance at ``--simulate-latency=4 --latency-count=5``
with per-partition concurrency 300 (``docs/runtime.adoc:42-99``).

Spark mirror: the same task shape processed by an Arrow-batched
``mapInPandas`` stage that drives the simulated I/O through a
per-partition thread pool — Spark's analog of Decaton's sub-partition
concurrency (partitions × threads ≈ partition count ×
``decaton.partition.concurrency``). The engine's job, like Decaton's,
is keeping every I/O slot full; wall-clock floor is
``n_tasks × latency / (partitions × concurrency)``.
"""

from __future__ import annotations

import time
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def latency_tasks(
    spark: SparkSession,
    *,
    n_tasks: int = 10_000,
    latency_ms: int = 4,
    latency_count: int = 5,
) -> DataFrame:
    """The benchmark task table: id, produced_time, process_latency_ms."""
    return spark.range(n_tasks).select(
        F.col("id").alias("task_id"),
        F.unix_millis(F.current_timestamp()).alias("produced_time"),
        F.lit(latency_ms * latency_count).alias("process_latency_ms"),
    )


def run_simulated_latency(
    tasks: DataFrame,
    *,
    partitions: int = 32,
    concurrency: int = 32,
    io_mode: str = "threads",
) -> dict:
    """Process every task with its simulated I/O latency; return
    ``{tasks, wall_sec, tasks_per_sec}``.

    Two I/O-slot models, both bounding in-flight I/Os per partition to
    ``concurrency`` (wall-clock floor ``n × latency / (partitions ×
    concurrency)`` either way):

    - ``io_mode="threads"``: a thread pool drives blocking sleeps —
      the reference benchmark's own model (THREAD_POOL runtime, 300
      threads/partition), kept as the apples-to-apples headline.
    - ``io_mode="async"``: one event loop per partition with a
      semaphore of ``concurrency`` — the reference's *async processor*
      pattern (``ProcessingContext.deferCompletion``,
      ``docs/async-processing.adoc``): completion is deferred, no
      thread blocks per in-flight I/O. Measurably faster here because
      32 × 300 OS threads cost real startup/scheduling time that
      32 event loops do not — the same reason to prefer non-blocking
      clients inside ``foreachBatch`` at scale.
    """
    from concurrent.futures import ThreadPoolExecutor

    def proc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        with ThreadPoolExecutor(max_workers=concurrency) as ex:
            done = 0
            for pdf in batches:
                list(
                    ex.map(
                        lambda ms: time.sleep(ms / 1000.0),
                        pdf["process_latency_ms"].tolist(),
                    )
                )
                done += len(pdf)
        yield pd.DataFrame({"n": [done]})

    def proc_async(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import asyncio

        async def drive(lats: list) -> None:
            sem = asyncio.Semaphore(concurrency)

            async def one(ms: float) -> None:
                async with sem:
                    await asyncio.sleep(ms / 1000.0)

            await asyncio.gather(*[one(ms) for ms in lats])

        done = 0
        for pdf in batches:
            lats = pdf["process_latency_ms"].tolist()
            asyncio.run(drive(lats))
            done += len(lats)
        yield pd.DataFrame({"n": [done]})

    fn = {"threads": proc, "async": proc_async}[io_mode]
    n_tasks = tasks.count()
    # spark.range already spreads over default parallelism; only pay a
    # shuffle when the caller asks for a different partition count
    if tasks.rdd.getNumPartitions() != partitions:
        tasks = tasks.repartition(partitions)
    t0 = time.perf_counter()
    processed = (
        tasks.mapInPandas(fn, "n long")
        .agg(F.sum("n").alias("n"))
        .collect()[0]["n"]
    )
    wall = time.perf_counter() - t0
    assert processed == n_tasks, (processed, n_tasks)
    return {
        "tasks": n_tasks,
        "wall_sec": round(wall, 3),
        "tasks_per_sec": round(n_tasks / wall) if wall else None,
    }
