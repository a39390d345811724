"""Logic tests for the transformWithStateInPandas processors (tws.py).

The TWS *engine* path is gated in this container (its Python state
server needs google.protobuf, which isn't installed), so these tests
drive the StatefulProcessor classes in-process with fake typed-state
handles — the same calls the real handle would make — covering state
transitions, native-timer registration, and emission order. The
dispatch tests pin that ``api="auto"`` falls back to the legacy
applyInPandasWithState plan here and that the gate itself is honest.

Also covers the CM-sketch bucket memoization (round-2 verdict item 6):
``_cm_buckets`` is an lru_cache, so a hot key costs one md5 set per
worker lifetime, not one per row.
"""

from __future__ import annotations

import pandas as pd
import pytest

from decaton_spark.streaming import stateful
from decaton_spark.streaming.tws import (
    BatchingProcessor,
    CompactProcessor,
    ScheduledProcessor,
    tws_available,
)


class FakeListState:
    def __init__(self):
        self.rows: list[tuple] = []

    def exists(self):
        return bool(self.rows)

    def get(self):
        return iter(list(self.rows))

    def appendValue(self, v):
        self.rows.append(tuple(v))

    def clear(self):
        self.rows = []


class FakeValueState:
    def __init__(self):
        self.v = None

    def exists(self):
        return self.v is not None

    def get(self):
        return self.v

    def update(self, v):
        self.v = tuple(v)

    def clear(self):
        self.v = None


class FakeHandle:
    """Records registerTimer calls; hands out fake typed state."""

    def __init__(self):
        self.timers: list[int] = []
        self.states: dict[str, object] = {}

    def getListState(self, name, schema, ttlDurationMs=None):
        return self.states.setdefault(name, FakeListState())

    def getValueState(self, name, schema, ttlDurationMs=None):
        return self.states.setdefault(name, FakeValueState())

    def registerTimer(self, ms):
        self.timers.append(int(ms))


class FakeTimerValues:
    def __init__(self, now_ms):
        self.now = now_ms

    def getCurrentProcessingTimeInMs(self):
        return self.now

    def getCurrentWatermarkInMs(self):
        return -1


class FakeExpiredTimer:
    def __init__(self, ms):
        self.ms = ms

    def getExpiryTimeInMs(self):
        return self.ms


def _collect(it):
    frames = [f for f in it if f is not None and len(f)]
    return pd.concat(frames, ignore_index=True) if frames else pd.DataFrame()


def test_compact_processor_last_wins_across_batches():
    p = CompactProcessor(window_ms=1000)
    h = FakeHandle()
    p.init(h)
    tv = FakeTimerValues(0)
    b1 = pd.DataFrame(
        {"meta_timestamp_millis": [100, 900, 1500], "offset": [1, 2, 3],
         "value": ["a", "b", "c"]}
    )
    out1 = _collect(p.handleInputRows(("k",), iter([b1]), tv))
    # two windows open: survivor (900,2,'b') and (1500,3,'c')
    assert list(out1["offset"]) == [2, 3]
    # a late-arriving but newer row in window 0 replaces the survivor
    b2 = pd.DataFrame(
        {"meta_timestamp_millis": [950], "offset": [9], "value": ["z"]}
    )
    out2 = _collect(p.handleInputRows(("k",), iter([b2]), tv))
    w0 = out2[out2["window_start_ms"] == 0]
    assert list(w0["offset"]) == [9] and list(w0["value"]) == ["z"]
    # only the CHANGED window is re-emitted (update-mode semantics;
    # re-emitting all history grew per-trigger output with query
    # lifetime — self-review r7): window 1000's survivor was untouched
    assert list(out2["window_start_ms"]) == [0]
    # an OLDER row must not replace it (last-wins = max (ts, offset)):
    # nothing changed, so nothing is emitted and state is untouched
    b3 = pd.DataFrame(
        {"meta_timestamp_millis": [920], "offset": [4], "value": ["old"]}
    )
    out3 = list(p.handleInputRows(("k",), iter([b3]), tv))
    assert out3 == []
    held = {int(r[0]): int(r[1]) for r in h.states["survivors"].get()}
    assert held == {0: 9, 1000: 3}


def test_scheduled_processor_uses_native_timer_for_earliest_due():
    p = ScheduledProcessor()
    h = FakeHandle()
    p.init(h)
    now = 10_000
    batch = pd.DataFrame(
        {"offset": [1, 2, 3],
         "meta_scheduled_time_millis": [9_000, 15_000, 12_000]}
    )
    out = _collect(p.handleInputRows(("k",), iter([batch]), FakeTimerValues(now)))
    # offset 1 was due; 2 and 3 held; timer armed at the EARLIEST due time
    assert list(out["offset"]) == [1]
    assert h.timers == [12_000]
    # timer fires at 12s: releases offset 3 only, re-arms for 15s
    out2 = _collect(p.handleExpiredTimer(("k",), FakeTimerValues(12_000),
                                         FakeExpiredTimer(12_000)))
    assert list(out2["offset"]) == [3]
    assert out2["emitted_at_millis"].iloc[0] >= 12_000
    assert h.timers[-1] == 15_000
    # final timer: offset 2 out, state drained
    out3 = _collect(p.handleExpiredTimer(("k",), FakeTimerValues(15_000),
                                         FakeExpiredTimer(15_000)))
    assert list(out3["offset"]) == [2]
    assert not h.states["pending"].exists()


def test_scheduled_emitted_at_never_before_due():
    p = ScheduledProcessor()
    h = FakeHandle()
    p.init(h)
    batch = pd.DataFrame(
        {"offset": [1], "meta_scheduled_time_millis": [5_000]}
    )
    out = _collect(p.handleInputRows(("k",), iter([batch]), FakeTimerValues(1_000)))
    assert out.empty  # not due yet — held, never early
    assert h.timers == [5_000]


def test_batching_processor_size_then_linger_timer():
    p = BatchingProcessor(capacity=3, linger_ms=1_000)
    h = FakeHandle()
    p.init(h)
    b = pd.DataFrame({"offset": [1, 2, 3, 4]})
    out = _collect(p.handleInputRows((0,), iter([b]), FakeTimerValues(100)))
    # one full size-batch flushes; remainder (offset 4) arms a linger timer
    assert list(out["reason"]) == ["size"]
    assert out["batch_size"].iloc[0] == 3
    assert h.timers == [100 + 1_000]
    out2 = _collect(p.handleExpiredTimer((0,), FakeTimerValues(1_100),
                                         FakeExpiredTimer(1_100)))
    assert list(out2["reason"]) == ["linger"]
    assert out2["first_offset"].iloc[0] == 4
    # batch_seq stays monotonic across the two flush paths
    assert list(out["batch_seq"]) + list(out2["batch_seq"]) == [0, 1]


def test_tws_gate_is_honest_and_auto_falls_back(spark):
    try:
        import google.protobuf  # noqa: F401

        assert tws_available() is True
        return  # real cluster: engine path active, nothing to pin here
    except ImportError:
        pass
    assert tws_available() is False
    # auto must fall back to the applyInPandasWithState plan
    tasks = spark.createDataFrame(
        [("k", 1, 1000, "v")],
        "key string, offset long, meta_timestamp_millis long, value string",
    )
    plan = stateful.streaming_compact(tasks, api="auto")._jdf.queryExecution().analyzed().toString()
    assert "flatMapGroupsInPandasWithState" in plan or "FlatMapGroupsInPandasWithState" in plan
    with pytest.raises(ValueError):
        stateful.streaming_compact(tasks, api="nope")


def test_cm_bucket_memoization():
    stateful._cm_buckets.cache_clear()
    keys = [f"k{i % 7}" for i in range(10_000)]
    for k in keys:
        stateful._cm_buckets(k, 4, 64)
    info = stateful._cm_buckets.cache_info()
    # 10k rows, 7 unique keys -> exactly 7 md5-computing misses
    assert info.misses == 7
    assert info.hits == 10_000 - 7
    # same indices as the direct computation
    import hashlib

    for k in set(keys):
        expect = tuple(
            int(hashlib.md5(f"d{d}|{k}".encode()).hexdigest()[:8], 16) % 64
            for d in range(4)
        )
        assert stateful._cm_buckets(k, 4, 64) == expect


def test_heavy_hitters_processor_alert_once_across_batches():
    """TWS heavy hitters: counts accumulate across handleInputRows
    calls (microbatches), each key alerts exactly once at its first
    crossing, and the alerted set persists in state."""
    import pandas as pd

    from decaton_spark.streaming.tws import HeavyHittersProcessor

    p = HeavyHittersProcessor(threshold=5, width=4096)
    h = FakeHandle()
    p.init(h)
    tv = FakeTimerValues(0)

    b1 = pd.DataFrame({"key": ["a"] * 3 + ["b"] * 4, "offset": range(7)})
    out1 = _collect(p.handleInputRows(("p0",), iter([b1]), tv))
    assert len(out1) == 0, "no key reaches 5 in batch 1"

    b2 = pd.DataFrame({"key": ["a"] * 2 + ["b"] * 1, "offset": range(7, 10)})
    rows = _collect(p.handleInputRows(("p0",), iter([b2]), tv))
    assert sorted(rows["key"]) == ["a", "b"], "both cross only with batch 2"
    assert set(rows["estimate"]) == {5}

    # a third batch must not re-alert
    b3 = pd.DataFrame({"key": ["a", "b"], "offset": [10, 11]})
    out3 = _collect(p.handleInputRows(("p0",), iter([b3]), tv))
    assert len(out3) == 0


def test_ordered_processor_watermark_across_batches():
    import pandas as pd

    from decaton_spark.streaming.tws import OrderedProcessor

    p = OrderedProcessor()
    h = FakeHandle()
    p.init(h)
    tv = FakeTimerValues(0)
    b1 = pd.DataFrame({"partition": [0, 0], "offset": [3, 7]})
    out1 = _collect(p.handleInputRows(("k",), iter([b1]), tv))
    assert list(out1["prev_offset"]) == [-1, 3]
    assert not out1["regressed"].any()
    # next batch continues from the stored watermark; a replayed offset
    # below it is flagged
    b2 = pd.DataFrame({"partition": [0, 0], "offset": [5, 9]})
    out2 = _collect(p.handleInputRows(("k",), iter([b2]), tv))
    # prev chains through each processed row (legacy semantics): the
    # replayed offset 5 sees prev=7 and flags, then becomes the prev
    assert list(out2["prev_offset"]) == [7, 5]
    assert list(out2["regressed"]) == [True, False]


def test_quota_processor_two_window_rotation():
    """TWS quota: estimates accumulate across the current+previous
    window (boundary-straddling bursts caught), rotate forward-only,
    and clear after a >=2-window gap — matching streaming_quota."""
    import pandas as pd

    from decaton_spark.streaming.tws import QuotaProcessor

    p = QuotaProcessor(quota_per_window=5, window_ms=1000, width=4096)
    h = FakeHandle()
    p.init(h)
    tv = FakeTimerValues(0)

    # 3 hits in window 0, then 2 in window 1: straddling estimate 5 -> shape
    b1 = pd.DataFrame(
        {"key": ["a"] * 3, "offset": range(3),
         "meta_timestamp_millis": [100, 200, 300]}
    )
    out1 = _collect(p.handleInputRows(("p0",), iter([b1]), tv))
    assert list(out1["quota_verdict"]) == ["process"] * 3
    b2 = pd.DataFrame(
        {"key": ["a"] * 2, "offset": [3, 4],
         "meta_timestamp_millis": [1100, 1200]}
    )
    out2 = _collect(p.handleInputRows(("p0",), iter([b2]), tv))
    assert list(out2["estimate"]) == [4, 5]
    assert list(out2["quota_verdict"]) == ["process", "shape"]
    # a >=2-window gap clears both windows: fresh estimates
    b3 = pd.DataFrame(
        {"key": ["a"], "offset": [5], "meta_timestamp_millis": [5000]}
    )
    out3 = _collect(p.handleInputRows(("p0",), iter([b3]), tv))
    assert list(out3["estimate"]) == [1]


def test_lsh_index_processor_emits_pairs_incrementally():
    import pandas as pd

    from decaton_spark.streaming.tws import LshIndexProcessor

    p = LshIndexProcessor()
    h = FakeHandle()
    p.init(h)
    tv = FakeTimerValues(0)
    out1 = _collect(
        p.handleInputRows(
            (2, "sigX"), iter([pd.DataFrame({"doc_id": [10, 20]})]), tv
        )
    )
    assert [tuple(r) for r in out1.itertuples(index=False)] == [(10, 20, 2)]
    # second batch: pairs against ALL indexed members; re-delivery of
    # 20 is ignored
    out2 = _collect(
        p.handleInputRows(
            (2, "sigX"), iter([pd.DataFrame({"doc_id": [20, 5]})]), tv
        )
    )
    assert sorted(tuple(r) for r in out2.itertuples(index=False)) == [
        (5, 10, 2),
        (5, 20, 2),
    ]


def test_zscore_processor_logic():
    """Rolling-window state transitions: warm-up emits nothing, the
    window slides (oldest value evicted), zero-variance windows never
    divide, and the z value matches the closed form."""
    import math

    from decaton_spark.streaming.tws import ZscoreProcessor

    h = FakeHandle()
    p = ZscoreProcessor(threshold=1.0, n=3)
    p.init(h)

    def feed(rows):
        pdf = pd.DataFrame(rows, columns=["ts", "event_id", "xv"])
        return list(p.handleInputRows((7,), iter([pdf]), None))

    assert feed([(1, 1, 100), (2, 2, 100)]) == []  # warm-up: n < 3
    out = feed([(3, 3, 400)])  # window [100,100,400]
    assert len(out) == 1 and len(out[0]) == 1
    row = out[0].iloc[0]
    z = (3 * 400 - 600) / math.sqrt(3 * 180000 - 600 * 600)
    assert row["event_id"] == 3 and row["user_id"] == 7
    assert row["zscore"] == z
    # slide: oldest 100 evicted -> [100,400,100], |z| < 1 -> silent
    assert feed([(4, 4, 100)]) == []
    # constant window -> den2 == 0 -> no division, no emission
    assert feed([(5, 5, 100), (6, 6, 100)]) == []
    assert h.states["window"].get()[0] == [100, 100, 100]


def test_zscore_processor_multi_chunk_group():
    """A key's microbatch group can arrive as MULTIPLE Arrow chunks in
    arbitrary order; the processor must concat them and sort ONCE so
    the trailing window sees (ts, event_id) order across chunk
    boundaries — per-chunk sorting would emit different alerts
    (ADVICE round-3 defect)."""
    from decaton_spark.streaming.tws import ZscoreProcessor

    def run(chunks):
        h = FakeHandle()
        p = ZscoreProcessor(threshold=1.0, n=3)
        p.init(h)
        out = list(
            p.handleInputRows(
                (7,),
                iter(
                    pd.DataFrame(c, columns=["ts", "event_id", "xv"])
                    for c in chunks
                ),
                None,
            )
        )
        emitted = (
            sorted(
                (int(r["event_id"]), round(float(r["zscore"]), 9))
                for pdf in out
                for _, r in pdf.iterrows()
            )
            if out
            else []
        )
        return emitted, h.states["window"].get()[0]

    rows = [(1, 1, 100), (2, 2, 100), (3, 3, 400), (4, 4, 100), (5, 5, 900)]
    single = run([rows])
    # same rows split across chunks, later-ts chunk delivered FIRST
    split = run([[rows[3], rows[4]], [rows[0], rows[1], rows[2]]])
    assert split == single
    assert split[1] == [400, 100, 900]  # window reflects global ts order


def test_ordered_processor_multi_chunk_group():
    """Arrow chunk boundaries are arbitrary post-shuffle: a later-offset
    chunk delivered FIRST must not produce spurious regressions or
    persist a regressed high-watermark (self-review r7 — the fix is
    concat-then-sort, the ZscoreProcessor lesson)."""
    import pandas as pd

    from decaton_spark.streaming.tws import OrderedProcessor

    def run(chunks):
        p = OrderedProcessor()
        h = FakeHandle()
        p.init(h)
        out = _collect(
            p.handleInputRows(("k",), iter([pd.DataFrame(c) for c in chunks]),
                              FakeTimerValues(0))
        )
        return (
            list(out["offset"]), list(out["regressed"]),
            int(h.states["hw"].get()[0]),
        )

    c_hi = {"partition": [0, 0], "offset": [100, 101]}
    c_lo = {"partition": [0, 0], "offset": [5, 6]}
    single = run([{"partition": [0] * 4, "offset": [100, 101, 5, 6]}])
    split = run([c_hi, c_lo])
    assert split == single
    offs, regressed, hw = split
    assert offs == [5, 6, 100, 101]
    assert regressed == [False, False, False, False]
    assert hw == 101  # NOT 6: the watermark must not regress


def test_quota_processor_multi_chunk_group():
    """Per-chunk sorting would rotate the window forward on a newer
    chunk then misfile an older chunk's rows as late; concat-then-sort
    must make chunked delivery identical to single-chunk."""
    import pandas as pd

    from decaton_spark.streaming.tws import QuotaProcessor

    rows = {
        "key": ["a"] * 4,
        "offset": [0, 1, 2, 3],
        "meta_timestamp_millis": [100, 200, 1100, 1200],
    }

    def run(chunks):
        p = QuotaProcessor(quota_per_window=5, window_ms=1000, width=4096)
        h = FakeHandle()
        p.init(h)
        out = _collect(
            p.handleInputRows(("p0",), iter([pd.DataFrame(c) for c in chunks]),
                              FakeTimerValues(0))
        )
        return list(out["offset"]), list(out["estimate"]), h.states["wins"].get()

    single = run([rows])
    # later-window rows delivered in the FIRST chunk
    split = run([
        {k: [v[2], v[3]] for k, v in rows.items()},
        {k: [v[0], v[1]] for k, v in rows.items()},
    ])
    assert split == single


def test_batching_processor_stale_timer_ignored():
    """A linger timer armed before a size flush is superseded: its
    firing must not force-flush the remainder before the remainder's
    own linger deadline (self-review r7 — TWS registerTimer ADDS,
    it does not replace)."""
    p = BatchingProcessor(capacity=3, linger_ms=1_000)
    h = FakeHandle()
    p.init(h)
    # t=0: 2 rows buffer below capacity -> timer armed for t=1000
    out0 = list(p.handleInputRows((0,), iter([pd.DataFrame({"offset": [1, 2]})]),
                                  FakeTimerValues(0)))
    assert out0 == [] and h.timers == [1_000]
    # t=400: 2 more rows -> size flush of [1,2,3]; remainder [4] restarts
    # its clock, so the live deadline is 1400
    out1 = _collect(p.handleInputRows((0,), iter([pd.DataFrame({"offset": [3, 4]})]),
                                      FakeTimerValues(400)))
    assert list(out1["reason"]) == ["size"]
    assert h.timers[-1] == 1_400
    # the STALE t=1000 timer fires: must be ignored (no premature flush)
    stale = list(p.handleExpiredTimer((0,), FakeTimerValues(1_000),
                                      FakeExpiredTimer(1_000)))
    assert stale == []
    # the live t=1400 timer flushes the remainder
    out2 = _collect(p.handleExpiredTimer((0,), FakeTimerValues(1_400),
                                         FakeExpiredTimer(1_400)))
    assert list(out2["reason"]) == ["linger"]
    assert out2["first_offset"].iloc[0] == 4


def test_compact_processor_state_ttl_evicts_old_windows():
    """state_ttl_ms bounds state: windows older than the key's newest
    window minus the TTL are evicted AFTER their final emission."""
    import pandas as pd

    from decaton_spark.streaming.tws import CompactProcessor

    p = CompactProcessor(window_ms=1000, state_ttl_ms=2000)
    h = FakeHandle()
    p.init(h)
    tv = FakeTimerValues(0)
    b1 = pd.DataFrame(
        {"meta_timestamp_millis": [100, 1100], "offset": [1, 2],
         "value": ["a", "b"]}
    )
    out1 = _collect(p.handleInputRows(("k",), iter([b1]), tv))
    assert list(out1["window_start_ms"]) == [0, 1000]
    # a row far in the future: its window is emitted AND old windows
    # beyond the TTL horizon (10000 - 2000 = 8000) leave state
    b2 = pd.DataFrame(
        {"meta_timestamp_millis": [10100], "offset": [3], "value": ["c"]}
    )
    out2 = _collect(p.handleInputRows(("k",), iter([b2]), tv))
    assert list(out2["window_start_ms"]) == [10000]
    held = sorted(int(r[0]) for r in h.states["survivors"].get())
    assert held == [10000]


def test_ab_monitor_zero_variance_yields_null_t():
    """Both arms constant (zero variance): the batch welch_ttest yields
    NULL t/dof; the streaming twin must emit None, not raise
    ZeroDivisionError and kill the query (self-review r7)."""
    import pandas as pd

    from decaton_spark.streaming.tws import AbMonitorProcessor

    p = AbMonitorProcessor("g")
    h = FakeHandle()
    p.init(h)
    b = pd.DataFrame({"arm": ["A", "A", "B", "B"], "v": [100, 100, 100, 100]})
    out = _collect(p.handleInputRows(("g",), iter([b]), FakeTimerValues(0)))
    assert out["n_a"].iloc[0] == 2 and out["n_b"].iloc[0] == 2
    assert out["t_stat"].iloc[0] is None or pd.isna(out["t_stat"].iloc[0])
    assert out["welch_dof"].iloc[0] is None or pd.isna(out["welch_dof"].iloc[0])


class FakeHandleWithDelete(FakeHandle):
    """FakeHandle variant exposing deleteTimer, mirroring the real
    Spark 4 StatefulProcessorHandle (registerTimer ADDS; superseded
    timers must be explicitly deleted)."""

    def __init__(self):
        super().__init__()
        self.deleted: list[int] = []

    def deleteTimer(self, ms):
        self.deleted.append(int(ms))

    def live_timers(self):
        live = list(self.timers)
        for d in self.deleted:
            live.remove(d)
        return live


def _batching_rearm_cycles(p, h, cycles):
    """Drive `cycles` size-flush/re-arm rounds: each round adds capacity+1
    rows so a size batch flushes and a 1-row remainder re-arms linger."""
    now = 0
    offset = 0
    for _ in range(cycles):
        rows = list(range(offset, offset + p.capacity + 1))
        offset += len(rows)
        list(p.handleInputRows((0,), iter([pd.DataFrame({"offset": rows})]),
                               FakeTimerValues(now)))
        now += 100  # well inside linger: every arm is superseded next round


def test_batching_timer_hygiene_with_delete_support():
    """VERDICT r7 #5 (bounded-wake pin, delete path): on a build WITH
    deleteTimer — the running Spark 4.1.2 handle has it — every
    superseded linger timer is cancelled, so after N frequent
    size-flush/re-arm cycles exactly ONE timer is live per partition.
    Without this, state stays correct but the partition accumulates a
    wake per re-arm (see the no-delete twin below)."""
    p = BatchingProcessor(capacity=3, linger_ms=1_000)
    h = FakeHandleWithDelete()
    p.init(h)
    _batching_rearm_cycles(p, h, cycles=50)
    assert len(h.timers) >= 30          # many re-arms actually happened
    assert len(h.live_timers()) <= 1    # bounded: at most the live deadline
    # every superseded arm was explicitly cancelled
    assert len(h.deleted) == len(h.timers) - len(h.live_timers())


def test_batching_timer_hygiene_without_delete_is_bounded_per_arm():
    """VERDICT r7 #5 (no-delete twin): on a build WITHOUT deleteTimer
    the superseded timers cannot be cancelled — each fires ONCE as a
    spurious no-output wake and clears. The wake stream is therefore
    bounded by one per re-arm (not unbounded re-fires), and no stale
    wake ever flushes early. This pins the documented cost of the
    hasattr-gated fallback in tws.py."""
    p = BatchingProcessor(capacity=3, linger_ms=1_000)
    h = FakeHandle()  # no deleteTimer attribute
    p.init(h)
    _batching_rearm_cycles(p, h, cycles=20)
    assert len(h.timers) >= 12  # every arm stays pending until it fires
    # the single live deadline is what state records; everything else
    # in h.timers is a superseded arm that will fire exactly once
    live = h.states["buf"].v[3]
    stale = [t for t in h.timers if t != live]
    assert stale  # the scenario actually produced superseded arms
    arms_before = len(h.timers)
    # fire every superseded timer: each is a no-op (ignored, no output),
    # and firing it does NOT re-arm another timer (no self-sustaining
    # wake loop) — N stale arms -> exactly N silent wakes, ever
    for t in stale:
        out = list(p.handleExpiredTimer((0,), FakeTimerValues(t),
                                        FakeExpiredTimer(t)))
        assert out == [] or all(len(f) == 0 for f in out)
    assert len(h.timers) == arms_before  # stale wakes never re-arm
    # the live deadline (if a remainder is buffered) still flushes it
    if live:
        out = _collect(p.handleExpiredTimer((0,), FakeTimerValues(live),
                                            FakeExpiredTimer(live)))
        assert list(out["reason"]) == ["linger"]


def test_running_spark_handle_supports_delete_timer():
    """Liveness pin for the hasattr gate in tws.py: the Spark build in
    this environment DOES expose deleteTimer, so the cancel path (not
    the spurious-wake fallback) is what production runs here take. If
    an upgrade removes it, this test flags that the fallback twin above
    becomes the operative behavior."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessorHandle,
    )

    assert hasattr(StatefulProcessorHandle, "deleteTimer")


def test_batching_state_restores_from_pre_timer_checkpoint():
    """ADVICE r7: the buf ValueState schema widened 3->4 fields
    (timer_ms added). A checkpoint written by the 3-field build must
    restore as 'no timer recorded' instead of crashing on unpack."""
    p = BatchingProcessor(capacity=3, linger_ms=1_000)
    h = FakeHandle()
    p.init(h)
    # simulate state written by the old build: (offs, first_ms, seq)
    h.states["buf"].update(([7, 8], 0, 5))
    out = _collect(p.handleInputRows((0,), iter([pd.DataFrame({"offset": [9]})]),
                                     FakeTimerValues(400)))
    # [7,8,9] reaches capacity -> size flush continuing the old seq
    assert list(out["reason"]) == ["size"]
    assert out["batch_seq"].iloc[0] == 5
    assert out["first_offset"].iloc[0] == 7


def test_batching_state_restores_avro_widened_none_timer():
    """ADVICE r8: under Avro state-schema evolution the restored buf
    row has FOUR fields with the added timer_ms = None (not a 3-tuple).
    Must restore as 'no timer recorded', not TypeError on int(None)."""
    p = BatchingProcessor(capacity=3, linger_ms=1_000)
    h = FakeHandle()
    p.init(h)
    h.states["buf"].update(([7, 8], 0, 5, None))
    out = _collect(p.handleInputRows((0,), iter([pd.DataFrame({"offset": [9]})]),
                                     FakeTimerValues(400)))
    assert list(out["reason"]) == ["size"]
    assert out["batch_seq"].iloc[0] == 5


def test_batching_legacy_timer_refire_flushes_overdue_remainder():
    """ADVICE r8: a checkpoint from the pre-timer_ms build restores
    with timer_ms=0, and the OLD build's persisted timer refires after
    restart with an expiry that can't match. The old build flushed on
    any fire — discarding it as 'superseded' would strand the restored
    remainder until new input arrived for that key. The shim must honor
    a legacy fire once the pending batch is linger-overdue, and still
    discard a premature unmatched wake."""
    p = BatchingProcessor(capacity=3, linger_ms=1_000)
    h = FakeHandle()
    p.init(h)
    # legacy restore: two pending offsets buffered at t=0, no timer_ms
    h.states["buf"].update(([7, 8], 0, 5))
    # premature unmatched wake (before linger elapsed): ignored
    out = list(p.handleExpiredTimer((0,), FakeTimerValues(300),
                                    FakeExpiredTimer(300)))
    assert out == [] or all(len(f) == 0 for f in out)
    # the old build's real linger deadline (first_ms + linger) refires:
    # the remainder must flush without any new input
    out = _collect(p.handleExpiredTimer((0,), FakeTimerValues(1_000),
                                        FakeExpiredTimer(1_000)))
    assert list(out["reason"]) == ["linger"]
    assert out["first_offset"].iloc[0] == 7
    assert out["last_offset"].iloc[0] == 8
    assert out["batch_seq"].iloc[0] == 5
    # state cleared: nothing pending, no timer armed in state
    assert h.states["buf"].v[0] == [] and h.states["buf"].v[3] == 0
