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


def test_window_capacity_keeps_rotation_short():
    """The derived worst-case rotation period must stay small (<= 3
    rounds): every rotating entry gets a driver CORRECTNESS row at least
    once per ``coverage_rounds()`` consecutive rounds."""
    names = _names()
    n_pinned = len([n for n in entry._PINNED if n in names])
    assert n_pinned == len(entry._PINNED), "pinned entry missing from queries()"
    k = entry.coverage_rounds(len(names))
    assert k <= 3, (
        f"{len(names)} entries need {k} rounds to rotate through a "
        f"window of {entry._WINDOW} with {n_pinned} pinned; widen the "
        "window or retire entries"
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


def test_every_entry_scored_within_coverage_rounds():
    """Simulate ``coverage_rounds()`` consecutive rounds: each round every
    windowed entry gets a CORRECTNESS row (the driver writes one per
    scored entry, pass or fail), then the rotation recomputes. Every
    entry in the inventory must be scored at least once across the k
    simulated rounds — the bound the module comment advertises."""
    qs = entry.queries()
    names = list(qs)
    k = entry.coverage_rounds(len(names))

    hist = dict(entry._verification_history())
    next_round = max(hist.values(), default=0)
    scored_at_least_once: set[str] = set()
    for _ in range(k):
        next_round += 1
        ordered = list(entry._driver_order(qs, hist=hist))
        window = ordered[: entry._WINDOW]
        scored_at_least_once.update(window)
        for n in window:
            hist[n] = next_round

    missed = set(names) - scored_at_least_once
    assert not missed, (
        f"entries never scored across {k} simulated rounds: {sorted(missed)}"
    )


def test_window_report_partitions_inventory():
    qs = entry.queries()
    rep = entry.window_report(qs)
    assert rep["scored"] == list(qs)[: entry._WINDOW]
    assert rep["scored"] + rep["deferred"] == list(qs)
    assert rep["coverage_rounds"] == entry.coverage_rounds(len(qs))


def test_unverified_rows_do_not_count_as_history():
    """A CORRECTNESS row that errored or was recorded ``no_oracle`` is
    NOT verification: the entry must re-prioritize like a never-scored
    one (this is how the portable-HLL profile re-entered the r8 window
    after its only driver row was r6's ``no_oracle``)."""
    hist = entry._verification_history()
    # r6 recorded profile_lineitem_approx with err=no_oracle and r7
    # rotated it out — with hash-verified-only history it has no entry
    # (or only a later hash-green round), never the weak r6 row alone
    import glob
    import json
    import os as _os

    here = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    weak_only = True
    for p in glob.glob(_os.path.join(here, "CORRECTNESS_r*.json")):
        try:
            row = json.load(open(p)).get("profile_lineitem_approx")
        except Exception:
            continue
        if isinstance(row, dict) and row.get("hash_match") is True:
            weak_only = False
    if weak_only and hist:
        assert "profile_lineitem_approx" not in hist
        assert _names().index("profile_lineitem_approx") < entry._WINDOW


def test_every_entry_has_an_oracle():
    """The hash-verified-only history refinement cannot starve the
    rotation only because every entry CAN be hash-verified — pin that."""
    qs = entry.queries()
    oracles = entry.oracle_sql()
    missing = [n for n in qs if n not in oracles]
    assert not missing, f"entries without a DuckDB oracle: {missing}"


def test_oracle_geometry_defaults_to_driver_anchor(monkeypatch):
    """The DRIVER calls oracle_sql() with no environment — it must get
    the sf0.01-anchored unrolling (8 bits -> 3 bands, 22 semantic
    cells) regardless of what a local tool run last set; and a tool
    that sets SPARK_GRAFT_ORACLE_N must move BOTH formula families.
    Guards the driver contract against env leakage in either
    direction."""
    import os
    import __spark_entry__ as entry

    monkeypatch.delenv("SPARK_GRAFT_ORACLE_N", raising=False)
    o = entry.oracle_sql()
    assert "LIMIT 22" in o["semantic_dedup_pairs"]
    # 3 bands -> band ids 0,1,2 unrolled in the near-dup key CTE
    assert "2 AS band" in o["embedding_near_duplicates"]
    assert "3 AS band" not in o["embedding_near_duplicates"]

    monkeypatch.setenv("SPARK_GRAFT_ORACLE_N", "2000")
    o2 = entry.oracle_sql()
    assert "LIMIT 44" in o2["semantic_dedup_pairs"]      # isqrt(2000)
    assert "3 AS band" in o2["embedding_near_duplicates"]  # 10 bits -> 4 bands


def test_rotation_constants_match_driver_contract():
    """r13 verdict ask #7: pin the LITERAL rotation arithmetic so a
    future registry edit (or a silent _WINDOW drift away from the
    driver's actual 50-entry scoring window) can't shrink coverage
    without failing CI. The observed driver behavior across r11-r13:
    exactly 50 CORRECTNESS rows per round."""
    import json
    import math

    names = _names()
    assert entry._WINDOW == 50, (
        "the driver scores 50 entries/round (observed r11-r13); if the "
        "driver widened its window, update _WINDOW AND this pin together"
    )
    k = entry.coverage_rounds(len(names))
    # ceil(total / window) is the floor any rotation needs; pinned
    # entries consume window slots every round, so k may exceed it —
    # but never the advertised 3-round bound
    assert math.ceil(len(names) / entry._WINDOW) <= k <= 3
    # cross-check against the newest recorded driver round: it scored
    # exactly _WINDOW entries (the contract the rotation is sized for)
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rounds = sorted(
        p for p in os.listdir(here)
        if p.startswith("CORRECTNESS_r") and p.endswith(".json")
    )
    if rounds:
        latest = json.load(open(os.path.join(here, rounds[-1])))
        assert len(latest) == entry._WINDOW, (
            f"driver scored {len(latest)} entries in {rounds[-1]}, "
            f"_WINDOW says {entry._WINDOW} — rotation arithmetic is stale"
        )


def test_cluster_index_cache_key_tracks_contraction_mode(monkeypatch):
    """The forced-distributed gate (SPARK_GRAFT_FORCE_DIST_CLUSTERS) must
    never be served an artifact the LOCAL fast path built: the persisted
    cluster-index cache key folds the contraction mode in, so forcing
    LOCAL_SOLVE_MAX_EDGES=0 resolves a different cache dir and really
    re-runs the large-star/small-star rounds."""
    from client_data_ingester_spark.operators import dedup

    seen = []

    def fake_cache_path(sf_dir, kind, src_table="embeddings"):
        seen.append(kind)
        return "/nonexistent/cdi_test_cache/" + kind

    built = []
    monkeypatch.setattr(entry, "_index_cache_path", fake_cache_path)
    monkeypatch.setattr(dedup, "build_cluster_index", lambda *a, **k: built.append(a))
    monkeypatch.setattr(dedup, "load_cluster_index", lambda s, p: ("loaded", p))
    monkeypatch.setattr(
        entry, "_t", lambda s, d, t: None, raising=False
    )
    monkeypatch.setattr(dedup, "lsh_spanning_edges", lambda *a, **k: None)

    entry._cluster_index(None, "sfX")
    monkeypatch.setattr(dedup, "LOCAL_SOLVE_MAX_EDGES", 0)
    entry._cluster_index(None, "sfX")
    assert seen == ["clusters", "clusters_dist"], seen
    assert len(built) == 2  # neither mode reused the other's artifact
