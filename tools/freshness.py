"""Freshness-rotation projection for the driver harness.

Standing rotation check (VERDICT r7 #4): 240 registered queries / 50
driver slots per round = a 5-round freshness cycle, so every query's
newest green driver row must stay within 4 rounds of the latest. The
harness prints the newest-row histogram plus a projection of the
histogram after the NEXT round lands, and warns if that projection
violates the bound.

Round-9 rework (VERDICT r8 #3): the old projection assumed "the next
round runs the CURRENT tier", which is false exactly once per round —
in the inter-round window after the driver writes `CORRECTNESS_r{N}`
but before the builder rotates `_DRIVER_TIER` to the pre-written
r{N+1} list, so every harness run cried "rotation fell behind" while
the rotation was on schedule. The next tier is now data
(`decaton_spark.queries.NEXT_TIER`), and the projection uses it
whenever the current tier has already been certified as the newest
round's file (the signature of the inter-round window). A genuinely
stale tier — one whose members are NOT all newest — still projects
with itself and still trips the warning
(tests/test_gate_liveness.py::test_freshness_warning_fires_on_stale_rotation).
"""

from __future__ import annotations

from collections import Counter
from typing import Iterable, Mapping, Optional, Sequence


def project(
    newest: Mapping[str, int],
    rounds: Iterable[int],
    tier: Sequence[str],
    next_tier: Sequence[str],
) -> tuple[str, str, Optional[str]]:
    """Return (histogram line, projection line, warning-or-None).

    ``newest`` maps query name -> newest round with a green driver row;
    ``rounds`` are the rounds with a correctness file; ``tier`` is the
    active `_DRIVER_TIER`; ``next_tier`` the pre-written following one.
    """
    hist = Counter(newest.values())
    hist_line = "freshness newest-row histogram: " + " ".join(
        f"r{r}:{hist[r]}" for r in sorted(hist)
    )
    latest = max(rounds)
    nxt = latest + 1
    # Inter-round window: the current tier already landed as the newest
    # round's rows, so the round being projected will run NEXT_TIER.
    rotated_out = tier and all(newest.get(k) == latest for k in tier)
    burn = next_tier if rotated_out else tier
    projected = Counter({**dict(newest), **{k: nxt for k in burn}}.values())
    proj_line = (
        f"freshness projected after r{nxt} "
        f"({'pre-written next' if rotated_out else 'current'} tier lands): "
        + " ".join(f"r{r}:{projected[r]}" for r in sorted(projected))
    )
    warning = None
    oldest = min(projected)
    if nxt - oldest > 4:
        warning = (
            f"freshness WARNING: oldest cohort r{oldest} would exceed the "
            f"5-round cycle bound after r{nxt} — rotation fell behind"
        )
    return hist_line, proj_line, warning
