"""Harness-contract tests for bench.py (VERDICT r15 #2/#3/#8).

Pure-function tests — no Spark session. They pin:
  - the mover-guard substitution floor (_guard_adopt): a settled
    re-run never drags the printed number below the entry's committed
    history, and never above the in-suite reading;
  - the one-line JSON emit (_one_line): the suite total stays EXACT
    and per-query entries keep >= 2 significant figures even when the
    registry is large enough to force the top-40 fallback (the r10-r15
    emit degraded to 1 sig fig and clamped every round to "200.0");
  - state-growing queries are exempt from the settle pass.
"""

import json
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"),
)
import cut_canonical


def test_true_median_odd_and_even():
    assert cut_canonical.true_median([1.0, 2.0, 9.0]) == 2.0
    # even length: average the two middle values, not the upper one
    assert cut_canonical.true_median([1.0, 2.0, 4.0, 9.0]) == 3.0
    assert cut_canonical.true_median([]) is None


def test_guard_adopt_floors_at_history():
    # settled below history: adopt the history floor, not the re-run
    assert bench._guard_adopt(suite=2.10, settled=0.73, hist=0.95) == 0.95


def test_guard_adopt_substitutes_settled_when_above_history():
    assert bench._guard_adopt(suite=49.0, settled=10.6, hist=7.0) == 10.6


def test_guard_adopt_never_raises_above_suite():
    # settled re-run worse than the suite reading: keep the suite number
    assert bench._guard_adopt(suite=0.90, settled=2.87, hist=0.80) == 0.90
    # history above suite (query genuinely got faster mid-flag): keep suite
    assert bench._guard_adopt(suite=1.0, settled=0.5, hist=1.4) == 1.0


def test_state_growing_exemption_set():
    assert "d_index" in bench.STATE_GROWING
    assert "p_admit" in bench.STATE_GROWING


def _fake_registry(n):
    return {f"q_fake_entry_number_{i:03d}": 0.1 + (i % 37) * 0.173 for i in range(n)}


def test_one_line_small_registry_full_precision():
    timings = _fake_registry(20)
    out = json.loads(bench._one_line(timings, 0.1, 11.234))
    assert out["value"] == round(sum(timings.values()), 3)
    assert len(out["queries"]) == 20
    assert out["load_sec"] == 11.234


def test_one_line_large_registry_keeps_exact_value_and_precision():
    timings = _fake_registry(150)
    line = bench._one_line(timings, 0.1, 11.234)
    assert len(line) <= 1900
    out = json.loads(line)
    # the suite total must be EXACT, never the 1-sig-fig clamp ("200.0")
    assert out["value"] == round(sum(timings.values()), 3)
    assert out["n_queries_total"] == 150
    assert len(out["queries"]) == 40
    # top-40 selection: every emitted entry >= every omitted one
    emitted = set(out["queries"])
    floor = min(timings[k] for k in emitted)
    assert all(timings[k] <= floor + 1e-9 for k in timings if k not in emitted)
    # per-query precision >= 2 sig figs: round-trip error < 5% of value
    for k, v in out["queries"].items():
        assert abs(v - timings[k]) <= 0.05 * timings[k] + 1e-9
