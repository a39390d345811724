"""Liveness pins for every evidence gate (VERDICT r7 #6).

Two rounds in a row found audit infrastructure that silently audited
nothing: the round-6 checkpoint-plan capture was a no-op on Spark 4's
classic DataFrame subclass, and AQE coalescing made the round-7
partition-invariance legs literally identical. The standing discipline
is therefore: EVERY audit/gate must have a companion test proving the
gate actually fires on a violation — a gate that cannot fail is not
evidence.

This file is the registry. `test_every_gate_has_a_liveness_pin` pins
the gate→test mapping and asserts each named test exists, so adding a
new gate without a liveness pin fails the meta-test until the registry
(and the pin) are written.
"""

import importlib
import math
import sys

import pandas as pd
import pytest

sys.path.insert(0, "/root/repo/tools")

# gate -> (test module, liveness test name). The four evidence gates of
# the certification set, plus the driver-facing bench regression signal.
GATE_LIVENESS_REGISTRY = {
    # window/cartesian audit: checkpointed-stage plan capture must
    # actually intercept (r6 silent no-op on the classic subclass)
    "window_audit": ("tests.test_window_audit", "test_checkpoint_interception_fires"),
    # partition invariance: the two parallelism legs must produce
    # genuinely different physical partitioning (r7: AQE coalesced both
    # legs to 1 partition and the gate compared a run to itself)
    "partition_invariance": (
        "tests.test_partition_invariance",
        "test_invariance_legs_actually_differ",
    ),
    # oracle harness: the driver-shaped compare must detect each
    # corruption class (pinned below in this file)
    "oracle_harness": ("tests.test_gate_liveness", "test_harness_compare_detects_corruption"),
    # pytest oracle gate: the strict local compare must raise on a
    # perturbed frame (pinned below in this file)
    "pytest_oracle": ("tests.test_gate_liveness", "test_assert_frames_match_detects_corruption"),
    # scale ladder: replication must actually multiply rows with
    # perturbed content (pinned below), and stale fixtures must be
    # detected as stale
    "scale_ladder": ("tests.test_gate_liveness", "test_ladder_replication_actually_scales"),
    # bench per-op regression signal: an injected plan regression must
    # trip the tracker (degraded host or not)
    "bench_task_op_deltas": (
        "tests.test_bench_signals",
        "test_injected_regression_trips_under_degraded_host",
    ),
    # suite-wide bench regression (ADVICE r8): a uniform Spark slowdown
    # that the per-op LOO normalization divides out must be flagged by
    # the factor-vs-flat-CPU-canary disagreement gate (canary-based
    # since round 10; the async-flat premise was unsound — VERDICT r9 #1)
    "bench_suite_wide_regression": (
        "tests.test_bench_signals",
        "test_suite_wide_regression_flagged_when_canary_flat",
    ),
    # freshness rotation: the projection must still warn on a genuinely
    # stale tier after the r9 inter-round-window fix (which taught it
    # to project with the pre-written NEXT_TIER when the current tier
    # already landed — VERDICT r8 #3 demanded the alarm stay live)
    "freshness_rotation": (
        "tests.test_gate_liveness",
        "test_freshness_warning_fires_on_stale_rotation",
    ),
}


def test_every_gate_has_a_liveness_pin():
    for gate, (module, test_name) in GATE_LIVENESS_REGISTRY.items():
        mod = importlib.import_module(module)
        assert hasattr(mod, test_name), (
            f"gate '{gate}': liveness test {module}.{test_name} is missing — "
            f"a gate without a proof-it-fires test is not evidence"
        )


def test_harness_compare_detects_corruption():
    """The driver-shaped compare (tools/harness_compare.py — the SAME
    function tools/drive_harness.py runs) must flag every corruption
    class: wrong value, extra/missing row, renamed column. A MATCH on
    any of these would mean seven rounds of 50/50 green proved
    nothing."""
    from harness_compare import compare

    base = pd.DataFrame({"k": ["a", "b"], "v": [1.5, 2.5], "n": [10, 20]})
    assert compare(base, base.copy()) == "MATCH"
    # row order must NOT matter (driver sorts)
    assert compare(base.iloc[::-1].reset_index(drop=True), base) == "MATCH"

    wrong_value = base.copy()
    wrong_value.loc[0, "v"] = 1.6
    assert "hash=False" in compare(wrong_value, base)

    extra_row = pd.concat([base, base.iloc[[0]]], ignore_index=True)
    assert "rows=3vs2" in compare(extra_row, base)

    renamed = base.rename(columns={"v": "value"})
    assert "cols=False" in compare(renamed, base)

    # sub-rounding float drift (1e-9) is INTENTIONALLY tolerated here —
    # the stricter pytest gate owns that band (see harness_compare
    # docstring); pin the boundary so a tolerance change is loud
    drift = base.copy()
    drift.loc[0, "v"] = 1.500000001
    assert compare(drift, base) == "MATCH"


def test_assert_frames_match_detects_corruption():
    """The strict local gate must raise on value drift beyond 1e-9,
    row-count changes, and column renames."""
    from tests.utils import assert_frames_match

    base = pd.DataFrame({"k": ["a", "b"], "v": [1.5, 2.5]})
    assert_frames_match(base, base.copy(), "identity")

    drift = base.copy()
    drift.loc[0, "v"] = 1.5001
    with pytest.raises(AssertionError):
        assert_frames_match(drift, base, "drift")

    with pytest.raises(AssertionError):
        assert_frames_match(base.rename(columns={"v": "x"}), base, "cols")

    with pytest.raises(AssertionError):
        assert_frames_match(
            pd.concat([base, base], ignore_index=True), base, "rows"
        )
    # NaN == NaN must hold (oracle NULLs), while NaN vs value must fail
    nan_a = pd.DataFrame({"v": [float("nan"), 1.0]})
    assert_frames_match(nan_a, nan_a.copy(), "nan-id")
    nan_b = pd.DataFrame({"v": [0.0, 1.0]})
    with pytest.raises(AssertionError):
        assert_frames_match(nan_a, nan_b, "nan-vs-value")
    assert math.isnan(nan_a["v"][0])  # fixture sanity


def test_ladder_replication_actually_scales(spark, tmp_path, monkeypatch):
    """The scale ladder's x-N fixture builder must produce N× rows of
    CONTENT-PERTURBED replicas with disjoint id spaces — N identical
    copies would let dedup queries collapse the 'scaled' corpus back to
    x1 and the ladder would measure nothing. Runs the REAL
    build_fixture against a tiny base."""
    import numpy as np

    import scale_ladder as sl

    base_dir = tmp_path / "base"
    base_dir.mkdir()
    for t in ["region", "nation", "customer", "supplier", "part"]:
        pd.DataFrame({"id": [1, 2]}).to_parquet(base_dir / f"{t}.parquet")
    texts = [f"doc number {i} with shared words" for i in range(40)]
    pd.DataFrame({"doc_id": range(40), "text": texts}).to_parquet(
        base_dir / "documents.parquet"
    )
    pd.DataFrame(
        {"vec_id": range(8),
         "embedding": [np.array([0.1 * i, 0.2], dtype=np.float32)
                       for i in range(8)]}
    ).to_parquet(base_dir / "embeddings.parquet")
    pd.DataFrame({"event_id": range(10), "v": range(10)}).to_parquet(
        base_dir / "events.parquet"
    )
    pd.DataFrame({"o_orderkey": range(6)}).to_parquet(
        base_dir / "orders.parquet"
    )
    pd.DataFrame({"l_orderkey": [0, 0, 1, 2]}).to_parquet(
        base_dir / "lineitem.parquet"
    )

    monkeypatch.setattr(sl, "BASE", str(base_dir))
    dest = str(tmp_path / "x3")
    sl.build_fixture(spark, dest, replicas=3)

    docs = spark.read.parquet(f"{dest}/documents.parquet")
    assert docs.count() == 120  # 3x rows
    # perturbed content: 3 distinct alphabet permutations -> ~120
    # distinct texts, NOT 3 copies of the same 40
    assert docs.select("text").distinct().count() > 100
    # disjoint id spaces: no doc_id collides across replicas
    assert docs.select("doc_id").distinct().count() == 120
    ev = spark.read.parquet(f"{dest}/events.parquet")
    assert ev.count() == 30
    assert ev.select("event_id").distinct().count() == 30
    assert sl._fixture_fresh(dest, 3)  # the stamp matches what was built


def test_ladder_stale_fixture_detected(tmp_path):
    """_fixture_fresh must return False for a missing or stale stamp —
    a ladder that happily times a half-built fixture measures nothing."""
    from scale_ladder import _fixture_fresh, _stamp_fixture

    dest = str(tmp_path / "x10")
    assert not _fixture_fresh(dest, 10)  # nothing there yet
    import os

    os.makedirs(dest, exist_ok=True)
    _stamp_fixture(dest, 10)
    assert _fixture_fresh(dest, 10)
    assert not _fixture_fresh(dest, 100)  # different replication factor


def test_freshness_warning_fires_on_stale_rotation():
    """The rotation projection (tools/freshness.py) must warn when the
    active tier leaves an over-age cohort behind, and must NOT warn in
    the legitimate inter-round window (tier fully certified as the
    newest round, pre-written next tier covers the oldest cohort) —
    the r8 false alarm this fix removed."""
    from freshness import project

    # Genuinely stale: the tier re-burns fresh rows while an old cohort
    # ages out of the 5-round bound -> warning fires.
    newest = {"old1": 1, "old2": 1, "fresh1": 5, "fresh2": 5}
    hist, proj, warning = project(
        newest, [1, 2, 3, 4, 5], tier=["fresh1"], next_tier=["fresh2"]
    )
    assert warning is not None and "fell behind" in warning
    assert "r1:2" in hist

    # On-schedule mid-round: the tier targets the oldest cohort and has
    # not landed yet -> projection uses the tier, no warning.
    _, proj, warning = project(
        newest, [1, 2, 3, 4, 5], tier=["old1", "old2"], next_tier=["fresh1"]
    )
    assert warning is None and "current tier" in proj

    # Inter-round window: every tier member is already certified as the
    # newest round, so the NEXT round runs the pre-written next tier —
    # project with it; the old alarm fired here spuriously.
    newest = {"old1": 2, "old2": 2, "a": 5, "b": 5}
    _, proj, warning = project(
        newest, [1, 2, 3, 4, 5], tier=["a", "b"], next_tier=["old1", "old2"]
    )
    assert warning is None and "pre-written next tier" in proj

    # ... but a pre-written next tier that MISSES a cohort about to age
    # out must still warn — the projection is a real check, not a
    # formality. (old1 at r1 would be 5 rounds behind after r6 lands.)
    newest = {"old1": 1, "old2": 1, "a": 5, "b": 5}
    _, _, warning = project(
        newest, [1, 2, 3, 4, 5], tier=["a", "b"], next_tier=["a", "b"]
    )
    assert warning is not None and "fell behind" in warning
