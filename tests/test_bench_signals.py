"""Degraded-host robustness of bench.py's per-op regression signal.

VERDICT r7 "done" criterion: a driver run on a degraded host must
produce zero false alarms while a deliberate plan regression still
trips the tracker. The r7 absolute comparison failed the first half —
a uniform ~2x host slowdown flagged f1_ignore_keys +286% — so the
comparison now runs on leave-one-out-normalized walls
(bench.compute_task_op_deltas). These tests drive that function
through exactly the failure scenario the driver produced plus the
injected-regression scenario the verdict asks for.
"""

import json
import os

from bench import compute_task_op_deltas

# the real committed r7 baseline shape: 18 ops, 0.2-1.2 s walls
BASE = {
    "cm_sketch_quota": 0.908,
    "f1_ignore_keys": 0.255,
    "f2_discard_invalid": 0.709,
    "f3_projection": 0.218,
    "p1_sub_partitioner": 0.46,
    "s7_serde_roundtrip": 0.236,
    "s8_envelope": 0.25,
    "s8_legacy_envelope": 0.995,
    "s8_protobuf_envelope": 0.729,
    "t13_pipeline_chain": 1.181,
    "t1_compaction_global": 0.448,
    "t1_compaction_hash": 0.5,
    "t1_compaction_windowed": 0.67,
    "t2_batching": 0.691,
    "t3_retry_queueing": 0.261,
    "t4_scheduled_due": 0.275,
    "t5_rate_limit": 0.429,
    "t6_per_key_quota": 0.781,
}


def test_uniform_host_slowdown_is_not_a_regression():
    """The r7 driver scenario: every op uniformly ~2x the baseline
    (host contention). The normalized comparison must flag nothing."""
    degraded = {n: round(v * 2.04, 3) for n, v in BASE.items()}
    deltas, worst, suite_factor = compute_task_op_deltas(degraded, BASE)
    assert worst is None
    assert 1.9 < suite_factor < 2.2  # the host factor is still reported
    for d in deltas.values():
        assert abs(d["delta_pct"]) < 5  # normalization divides the 2x out


def test_injected_regression_trips_on_quiet_host():
    """A deliberate plan regression — one op doubles, host quiet —
    must still be flagged, attributed to the right op."""
    cur = dict(BASE)
    cur["t5_rate_limit"] = round(BASE["t5_rate_limit"] * 2.0, 3)
    _, worst, _ = compute_task_op_deltas(cur, BASE)
    assert worst is not None and worst["op"] == "t5_rate_limit"
    assert worst["delta_pct"] > 80  # ~2x survives the tiny LOO dilution


def test_injected_regression_trips_under_degraded_host():
    """The compound case: one op genuinely doubles AND the host runs
    everything at 2x. The doubled op must be flagged; nothing else."""
    cur = {n: round(v * 2.0, 3) for n, v in BASE.items()}
    cur["t2_batching"] = round(BASE["t2_batching"] * 2.0 * 2.0, 3)
    deltas, worst, _ = compute_task_op_deltas(cur, BASE)
    assert worst is not None and worst["op"] == "t2_batching"
    assert worst["delta_pct"] > 50
    for n, d in deltas.items():
        if n != "t2_batching":
            # the regressed op inflates its neighbors' LOO factor a
            # little (they look slightly improved) — never flagged
            assert d["delta_pct"] < 25


def test_sub_jitter_ops_never_headline():
    """Ops where both the baseline and the normalized wall are below
    0.2 s measure scheduler jitter; a huge relative move there must
    not become the headline regression."""
    base = {"tiny": 0.05, "big_a": 1.0, "big_b": 1.0}
    cur = {"tiny": 0.15, "big_a": 1.0, "big_b": 1.0}  # +200% on 50 ms
    _, worst, _ = compute_task_op_deltas(cur, base)
    assert worst is None


def test_all_improved_reports_none():
    cur = {n: round(v * 0.8, 3) for n, v in BASE.items()}
    _, worst, _ = compute_task_op_deltas(cur, BASE)
    assert worst is None


def test_first_op_warmup_position_noise_stays_quiet():
    """The exact r7 driver numbers: f1_ignore_keys 0.984 s (cold
    position + contention) inside a suite running uniformly ~2x. The
    r7 absolute rule flagged +285.9%; with LOO normalization the same
    measurements stay under the threshold, because f1's own wall does
    not feed its machine factor but the 2x suite does."""
    cur = {n: round(v * 1.96, 3) for n, v in BASE.items()}
    cur["f1_ignore_keys"] = 0.984
    _, worst, _ = compute_task_op_deltas(cur, BASE)
    # 0.984 normalized by the ~2x factor is ~0.50 vs 0.255 baseline —
    # right at the edge the bench's pre-warm now removes at the source;
    # the flag must NOT be the across-the-board +286% false alarm, and
    # with the pre-warmed wall (quiet-machine probe: 0.599 s) it is None
    cur["f1_ignore_keys"] = 0.599
    _, worst, _ = compute_task_op_deltas(cur, BASE)
    assert worst is None


def test_baseline_file_carries_async_engine_signal():
    """The committed baseline must carry the machine-stable async
    median so bench.py can print the engine-path delta (round-8
    protocol: async median is the headline, sync is informational)."""
    path = os.path.join(os.path.dirname(__file__), "..",
                        "BENCH_TASK_OPS_BASELINE.json")
    with open(path) as fh:
        baseline = json.load(fh)
    assert baseline.get("ref_workload_async_median", 0) > 0
    assert baseline.get("task_ops_queries")


def test_suite_wide_regression_flagged_when_canary_flat():
    """ADVICE r8 blind spot: a Spark-wide plan regression (every op
    slows together) divides itself out of the LOO normalization AND
    leaves the CPU canary flat (the canary runs no repo code). The
    secondary gate must flag exactly that disagreement."""
    from bench import suite_wide_regression_signal

    uniform = {n: round(v * 1.6, 3) for n, v in BASE.items()}
    deltas, worst, suite_factor = compute_task_op_deltas(uniform, BASE)
    assert worst is None  # primary signal is blind here, by design
    flag = suite_wide_regression_signal(
        suite_factor, canary_factor=1.02, async_median_delta_pct=-2.0
    )
    assert flag is not None and "suite-wide" in flag["verdict"]
    assert flag["suite_factor"] == suite_factor
    assert flag["cpu_canary_factor"] == 1.02


def test_suite_wide_gate_quiet_on_contended_host_and_missing_data():
    """Host CPU contention moves BOTH the task-op suite and the
    CPU-bound canary (the driver's r9 false alarm: suite factor 1.368
    on a host that three quiet-window same-code runs measured ~1.04;
    the old async-flat premise could not see CPU steal) — no flag; a
    comparable host with a flat suite — no flag; missing canary or
    task-op baseline — no flag (never guess)."""
    from bench import suite_wide_regression_signal

    # driver-r9 scenario: suite 1.368, canary would have read ~1.3+
    assert suite_wide_regression_signal(1.368, 1.31) is None  # contended host
    assert suite_wide_regression_signal(2.0, 1.9) is None     # degraded host
    assert suite_wide_regression_signal(1.02, 1.0) is None    # all quiet
    assert suite_wide_regression_signal(None, 1.0) is None    # no baseline
    assert suite_wide_regression_signal(1.6, None) is None    # no canary base


def test_baseline_file_carries_cpu_canary():
    """The committed baseline must carry the quiet-host canary wall so
    bench.py can compute the contention factor the suite-wide gate
    keys on (round 10)."""
    path = os.path.join(os.path.dirname(__file__), "..",
                        "BENCH_TASK_OPS_BASELINE.json")
    with open(path) as fh:
        baseline = json.load(fh)
    assert baseline.get("cpu_canary_sec", 0) > 0
