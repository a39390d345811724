"""Metrics (observe/listener) and dynamic-property supplier tests."""

from __future__ import annotations

import json
import time

import pytest

from decaton_spark.config import (
    PROPERTY_DEFS,
    FilePropertySupplier,
    StaticPropertySupplier,
    chain,
)
from decaton_spark.envelope import events_to_tasks
from decaton_spark.metrics import attach, observe_tasks
from decaton_spark.sources import load_table


def test_observe_counters(spark, sf_dir):
    tasks = events_to_tasks(load_table(spark, "events", sf_dir))
    observed = observe_tasks(tasks)
    n = observed.count()
    # observation values surface on the collected metrics of the action
    metrics = observed.collect()  # materialize; observe rides along
    assert len(metrics) == n


def test_metrics_listener_streaming(spark, sf_dir, tmp_path):
    tasks = events_to_tasks(load_table(spark, "events", sf_dir)).drop("timestamp")
    d = tmp_path / "in"
    tasks.repartition(2).write.parquet(str(d))
    listener = attach(spark)
    try:
        stream = spark.readStream.schema(tasks.schema).parquet(str(d))
        q = (
            observe_tasks(stream)
            .writeStream.foreachBatch(lambda df, bid: df.count())
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()
        deadline = time.time() + 30
        while time.time() < deadline and not any(
            p.get("observed") for p in listener.progress
        ):
            time.sleep(0.5)  # listener delivery is async
    finally:
        spark.streams.removeListener(listener)
    obs = [p["observed"] for p in listener.progress if p.get("observed")]
    assert obs, "no observed metrics delivered"
    total = sum(o["tasks_processed"] for o in obs)
    assert total == tasks.count()
    assert all(o["retry_count_total"] == 0 for o in obs)


def test_static_supplier_and_defaults():
    s = StaticPropertySupplier(**{"decaton.processing.rate.per.partition": 100})
    assert s.get("decaton.processing.rate.per.partition") == 100
    assert s.get("decaton.max.pending.records") == 10_000  # default
    with pytest.raises(KeyError):
        StaticPropertySupplier(**{"not.a.property": 1})
    assert set(s.snapshot()) == set(PROPERTY_DEFS)


def test_file_supplier_reload(tmp_path):
    p = tmp_path / "props.json"
    p.write_text(json.dumps({"decaton.ignore.keys": ["a"]}))
    s = FilePropertySupplier(str(p))
    assert s.get("decaton.ignore.keys") == ["a"]
    time.sleep(0.01)
    p.write_text(json.dumps({"decaton.ignore.keys": ["a", "b"]}))
    import os

    os.utime(p, (time.time() + 1, time.time() + 1))
    assert s.get("decaton.ignore.keys") == ["a", "b"], "edit must take effect"
    assert s.get("decaton.commit.interval.ms") == 1_000  # default fallthrough


def test_chained_suppliers(tmp_path):
    p = tmp_path / "props.json"
    p.write_text(json.dumps({"decaton.processing.rate.per.partition": 5}))
    file_s = FilePropertySupplier(str(p))
    static_s = StaticPropertySupplier(**{"decaton.max.pending.records": 42})
    get = chain(file_s, static_s)
    assert get("decaton.processing.rate.per.partition") == 5
    assert get("decaton.max.pending.records") == 42
    assert get("decaton.commit.interval.ms") == 1_000


def test_chain_first_supplier_wins_even_on_default_value(tmp_path):
    """Precedence is by *definedness*, not value: a supplier explicitly
    setting a property to its default still wins over a later supplier
    with a non-default value (ProcessorProperties.Builder.setBySupplier)."""
    first = StaticPropertySupplier(**{"decaton.max.pending.records": 10_000})
    second = StaticPropertySupplier(**{"decaton.max.pending.records": 42})
    assert chain(first, second)("decaton.max.pending.records") == 10_000
    assert first.defines("decaton.max.pending.records")
    assert not first.defines("decaton.commit.interval.ms")
