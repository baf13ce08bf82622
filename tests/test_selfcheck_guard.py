"""EntryGuard (selfcheck.py) watchdog contract.

The correctness artifacts the whole evidence chain trusts
(CORRECTNESS_SELF / ROBUSTNESS replays) come from this harness, so its
race contract gets its own tests: every run decides EXACTLY ONE of
{success, timeout}; success implies the cancel hooks never fired; a
slow entry's timeout can never poison the entry after it.

No Spark needed — the guard is engine-agnostic (hooks are plain
callables).
"""

import time

import pytest

from selfcheck import EntryGuard


def _mk(timeout_s):
    fired = []
    guard = EntryGuard(timeout_s, [lambda: fired.append(time.monotonic())])
    return guard, fired


def test_fast_entry_returns_and_hooks_never_fire():
    guard, fired = _mk(0.2)
    assert guard.run(lambda: 41 + 1) == 42
    # wait past the timer deadline: a stray post-success callback would
    # fire here if the done-gate were broken
    time.sleep(0.35)
    assert fired == []


def test_slow_entry_times_out_and_hooks_fire():
    guard, fired = _mk(0.05)
    with pytest.raises(TimeoutError):
        guard.run(lambda: time.sleep(0.5) or "partial")
    assert len(fired) == 1


def test_exception_during_timeout_window_reports_timeout():
    guard, fired = _mk(0.05)

    def fn():
        time.sleep(0.2)  # timer fires mid-flight...
        raise RuntimeError("job cancelled")  # ...cancellation surfaces

    with pytest.raises(TimeoutError):
        guard.run(fn)
    assert len(fired) == 1


def test_unrelated_exception_propagates_unchanged():
    guard, fired = _mk(5.0)
    with pytest.raises(ValueError):
        guard.run(lambda: (_ for _ in ()).throw(ValueError("real bug")))
    time.sleep(0.05)
    assert fired == []


def test_fast_entry_after_slow_entry_never_spurious_timeout():
    """The verdict's exact scenario: a slow entry times out, then a
    fast entry follows — the fast one must succeed and must not see
    the previous run's cancellation."""
    guard, fired = _mk(0.05)
    with pytest.raises(TimeoutError):
        guard.run(lambda: time.sleep(0.3))
    n_after_slow = len(fired)
    for _ in range(20):
        assert guard.run(lambda: "ok") == "ok"
    time.sleep(0.15)
    assert len(fired) == n_after_slow


def test_success_and_timeout_mutually_exclusive_under_race():
    """Drive fn duration right onto the timer deadline many times: the
    outcome may be either success or TimeoutError, but success must
    imply zero hook firings for that run, and a TimeoutError must have
    fired the hooks."""
    for i in range(30):
        fired = []
        guard = EntryGuard(0.02, [lambda: fired.append(1)])
        try:
            out = guard.run(lambda: time.sleep(0.02) or "v")
        except TimeoutError:
            time.sleep(0.03)  # let the hook finish
            assert fired, "TimeoutError without cancellation"
        else:
            assert out == "v"
            time.sleep(0.03)  # a late stray callback would land here
            assert fired == [], "hooks fired on a successful run"


def test_zero_timeout_disables_guard():
    guard, fired = _mk(0)
    assert guard.run(lambda: time.sleep(0.01) or 7) == 7
    assert fired == []
