"""The driver scores only the first ``_WINDOW`` ``queries()`` entries per
round. These tests pin the rotation contract (round-6 verdict #3 / ADVICE):
the order is derived from the recorded CORRECTNESS history — never
hand-picked — and no entry can be absent from two consecutive rounds'
scored windows. Pure-Python: ``queries()`` builds lambdas without touching
a SparkSession.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import __spark_entry__ as entry


def _names() -> list[str]:
    return list(entry.queries())


def test_window_capacity_allows_two_round_coverage():
    """The rotation guarantee needs every non-pinned entry to fit into two
    consecutive windows: N_nonpinned <= 2 * (window - pinned)."""
    names = _names()
    n_pinned = len([n for n in entry._PINNED if n in names])
    assert n_pinned == len(entry._PINNED), "pinned entry missing from queries()"
    assert len(names) - n_pinned <= 2 * (entry._WINDOW - n_pinned), (
        f"{len(names)} entries no longer fit a two-round rotation of "
        f"window={entry._WINDOW} with {n_pinned} pinned; widen the window "
        "or retire an entry"
    )


def test_pinned_parity_queries_inside_window():
    names = _names()
    for p in entry._PINNED:
        assert names.index(p) < entry._WINDOW


def test_never_verified_entries_sort_first():
    """An entry with no CORRECTNESS row ever must outrank every verified
    entry (it has waited the longest by definition)."""
    names = _names()
    hist = entry._verification_history()
    if not hist:  # fresh checkout: nothing to assert
        return
    never = [n for n in names if n not in hist and n not in entry._PINNED]
    for n in never:
        assert names.index(n) < entry._WINDOW, (
            f"never-verified entry {n} outside the scored window"
        )


def test_no_entry_absent_from_two_consecutive_windows():
    """Simulate the next round: every entry in this round's window gets a
    CORRECTNESS row (the driver writes one per scored entry, pass or
    fail), then the rotation recomputes. Everything outside this round's
    window must be inside the next one."""
    qs = entry.queries()
    names = list(qs)
    window_now = set(names[: entry._WINDOW])

    hist = entry._verification_history()
    next_round = max(hist.values(), default=0) + 1
    hist_next = dict(hist)
    for n in window_now:
        hist_next[n] = next_round

    names_next = list(entry._driver_order(qs, hist=hist_next))
    window_next = set(names_next[: entry._WINDOW])
    left_out = set(names) - window_now
    assert left_out <= window_next, (
        f"entries absent from two consecutive windows: "
        f"{sorted(left_out - window_next)}"
    )


def test_window_report_partitions_inventory():
    qs = entry.queries()
    rep = entry.window_report(qs)
    assert rep["scored"] == list(qs)[: entry._WINDOW]
    assert rep["scored"] + rep["deferred"] == list(qs)
