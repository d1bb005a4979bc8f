"""Unit tests for bench.py's self-adjudicating regression watch.

No Spark: adjudicate() takes a rerun callable, so the tests drive it with
canned steady-state walls and assert the four behaviors that matter —
load-artifact flags die, true regressions survive, the first-touch cost is
preserved (never hidden), and the re-run budget is bounded-but-loud.
"""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import adjudicate  # noqa: E402


def test_load_artifact_flag_dies_on_steady_rerun():
    # first-touch 4.5s vs baseline 1.6s flags (2.8x, +2.9s); steady re-run
    # 1.7s clears the threshold -> NOT a regression, min reported.
    timings = {"compact": 4.5}
    regs, ft = adjudicate(timings, {}, {"compact": 1.6}, lambda n: 1.7)
    assert regs == []
    assert timings["compact"] == 1.7
    assert ft == {"compact": 4.5}


def test_true_regression_survives_rerun():
    timings = {"q": 5.0}
    regs, ft = adjudicate(timings, {}, {"q": 1.0}, lambda n: 4.8)
    assert regs == [["q", 1.0, 4.8, 4.8]]
    assert timings["q"] == 4.8
    assert ft == {"q": 5.0}


def test_absolute_guard_and_ratio_guard():
    # 0.4s vs 0.2s is 2x but only +0.2s absolute -> never a suspect;
    # 11s vs 10s is +1s but only 1.1x -> never a suspect. No re-runs happen.
    calls = []

    def rerun(n):
        calls.append(n)
        return 0.0

    timings = {"small": 0.4, "big": 11.0}
    regs, ft = adjudicate(timings, {}, {"small": 0.2, "big": 10.0}, rerun)
    assert regs == [] and ft == {} and calls == []
    assert timings == {"small": 0.4, "big": 11.0}


def test_errored_and_unknown_entries_never_compared():
    timings = {"boom": 9.0, "new_entry": 9.0}
    regs, ft = adjudicate(
        timings, {"boom": "RuntimeError: x"}, {"boom": 1.0}, lambda n: 1.0
    )
    assert regs == [] and ft == {}


def test_rerun_cap_is_bounded_but_loud():
    # 3 suspects, cap 2: two adjudicated (cleared), the third keeps its
    # first-touch wall and STILL flags.
    timings = {f"q{i}": 10.0 for i in range(3)}
    prev = {f"q{i}": 1.0 for i in range(3)}
    regs, ft = adjudicate(timings, {}, prev, lambda n: 1.2, cap=2)
    assert len(ft) == 2
    assert len(regs) == 1 and regs[0][2] == 10.0 and regs[0][3] == 10.0


def test_rerun_budget_spent_worst_ratio_first():
    # cap=1 with two suspects: the 20x one gets the re-run (and clears);
    # the 2x one keeps its first-touch wall and flags.
    calls = []

    def rerun(n):
        calls.append(n)
        return 1.1

    timings = {"mild": 4.0, "wild": 20.0}
    prev = {"mild": 2.0, "wild": 1.0}
    regs, ft = adjudicate(timings, {}, prev, rerun, cap=1)
    assert calls == ["wild"]
    assert ft == {"wild": 20.0} and timings["wild"] == 1.1
    assert regs == [["mild", 2.0, 4.0, 2.0]]


def test_rerun_failure_keeps_first_touch_flag():
    def rerun(n):
        raise RuntimeError("transient")

    timings = {"q": 10.0}
    regs, ft = adjudicate(timings, {}, {"q": 1.0}, rerun)
    assert regs == [["q", 1.0, 10.0, 10.0]] and ft == {}


def test_sustained_load_clears_on_confirmation_rerun():
    # Box load persists through the FIRST re-run (6.5s, still >1.5x of
    # 4.25) but the confirmation re-run lands at true steady state: the
    # flag dies, the reported wall is the min of all three, and the
    # displaced first-touch is the ORIGINAL first wall.
    walls = iter([6.5, 4.3])

    def rerun(n):
        return next(walls)

    timings = {"psample": 6.7}
    regs, ft = adjudicate(timings, {}, {"psample": 4.25}, rerun)
    assert regs == []
    assert timings["psample"] == 4.3
    assert ft == {"psample": 6.7}


def test_confirmation_pass_shares_the_bounded_budget():
    # cap=2 with two suspects: both get their first re-run, the budget is
    # exhausted, and NEITHER gets a confirmation pass even though both
    # still flag — bounded-but-loud extends to the second pass.
    calls = []

    def rerun(n):
        calls.append(n)
        return 9.5

    timings = {"a": 10.0, "b": 10.0}
    prev = {"a": 1.0, "b": 1.0}
    regs, ft = adjudicate(timings, {}, prev, rerun, cap=2)
    assert len(calls) == 2 and set(calls) == {"a", "b"}
    assert len(regs) == 2


def test_zero_baseline_never_flags_or_divides():
    # A 0.0-stamped baseline (hand-merged or truncated) must neither flag
    # nor reach the ratio sorts as a divide-by-zero — the sweep's "JSON
    # line is ALWAYS emitted" invariant depends on adjudicate not raising.
    calls = []

    def rerun(n):
        calls.append(n)
        return 1.0

    timings = {"zeroed": 5.0, "real": 5.0}
    regs, ft = adjudicate(timings, {}, {"zeroed": 0.0, "real": 1.0}, rerun)
    assert calls == ["real"]
    assert regs == [] and timings["real"] == 1.0
    assert timings["zeroed"] == 5.0  # untouched, unflagged


def test_slower_rerun_keeps_first_wall():
    # re-run slower than first (box got MORE loaded): keep min=first, no
    # first_touch entry, still flagged.
    timings = {"q": 5.0}
    regs, ft = adjudicate(timings, {}, {"q": 1.0}, lambda n: 7.0)
    assert timings["q"] == 5.0 and ft == {}
    assert regs == [["q", 1.0, 5.0, 5.0]]
