"""Pin the driver contract on bench.py's final stdout line.

The driver keeps only the last ~2000 chars of bench stdout and parses
them as JSON. Rounds 5-7 emitted a ~5-6 KB single-line record and every
one of them recorded ``parsed: null`` — the perf half of the contract was
invisible for three rounds. These tests guarantee the compact line stays
parseable no matter how large the query inventory grows.
"""

import json

import bench


def _fake_out(n_queries: int, name_len: int = 60) -> dict:
    queries = {
        f"query_{'x' * name_len}_{i:04d}": round(0.1 * i, 3)
        for i in range(n_queries)
    }
    # sprinkle failures to exercise the failed list
    for i in range(0, n_queries, 7):
        queries[f"query_{'x' * name_len}_{i:04d}"] = -1.0
    return {
        "metric": "headline_queries_total_wall",
        "value": 123.456,
        "unit": "sec",
        "sf": 0.1,
        "queries": queries,
        "build_costs": {f"artifact_{i}": {"sec": 1.0, "cached": False} for i in range(20)},
        "window": {"scored": list(queries), "deferred": [], "coverage_rounds": 3},
    }


def test_compact_line_under_driver_cap():
    # far beyond the 142-entry rotation capacity, with pathological names
    for n in (10, 50, 150, 400):
        line = json.dumps(bench.compact_line(_fake_out(n)))
        assert len(line) < bench.MAX_LINE_BYTES, (n, len(line))


def test_compact_line_fields():
    out = _fake_out(100)
    line = bench.compact_line(out)
    assert line["metric"] == out["metric"]
    assert line["value"] == out["value"]
    assert line["n_queries"] == 100
    assert line["n_failed"] == len([v for v in out["queries"].values() if v < 0])
    assert len(line["failed"]) <= 5
    assert len(line["slowest"]) <= 8
    # slowest excludes failures and is sorted descending
    vals = list(line["slowest"].values())
    assert all(v >= 0 for v in vals)
    assert vals == sorted(vals, reverse=True)
    # round-trips through json
    assert json.loads(json.dumps(line)) == line


def test_variance_stats_flags_noisy_queries():
    """With ≥3 repeats the first run is warmup (codegen + artifact
    first-touch, measured 1.5–4× the settled time) and is EXCLUDED from
    the stats: a spike confined to run 1 must not flag, a spike among
    the warm runs must."""
    runs = {
        "steady": [1.0, 1.05, 1.1],
        "warmup_spike": [2.5, 1.0, 1.1],   # run-1-only spike: NOT noisy
        "noisy": [1.0, 1.2, 2.5],          # warm p95 2.5 / min 1.2 > 2x
        "fast_noisy": [0.1, 0.11, 0.3],    # 3x warm spread
        "two_runs": [0.1, 0.5],            # <3 repeats: all runs count
    }
    stats, noisy = bench.variance_stats(runs)
    assert noisy == ["fast_noisy", "noisy", "two_runs"]
    assert stats["steady"] == {"median": 1.075, "min": 1.05, "p95": 1.1}
    assert stats["warmup_spike"] == {"median": 1.05, "min": 1.0, "p95": 1.1}
    assert stats["noisy"]["p95"] == 2.5 and stats["noisy"]["min"] == 1.2


def test_compact_line_carries_ambient_verdict():
    """The ambient-load canary (r15 verdict ask #5) must surface on the
    driver-visible line — a BENCH_rN.json reader adjudicates 'loaded
    box' vs 'real regression' without the detail file — and must not
    push the line past the driver cap."""
    out = _fake_out(150)
    out["canary"] = {"query": "q1_pricing_summary", "median": 1.5,
                     "prior_median": 1.0, "inflation": 1.5}
    out["ambient_inflation"] = True
    line = bench.compact_line(out)
    assert line["canary_x"] == 1.5 and line["ambient"] is True
    assert len(json.dumps(line)) < bench.MAX_LINE_BYTES
    # absent canary (first run ever): fields simply not present
    assert "ambient" not in bench.compact_line(_fake_out(10))


def test_prior_canary_median_reads_committed_detail(tmp_path):
    p = tmp_path / "BENCH_DETAIL.json"
    assert bench.prior_canary_median(str(p)) is None  # no file yet
    p.write_text(json.dumps({"canary": {"median": 2.25}}))
    assert bench.prior_canary_median(str(p)) == 2.25
    p.write_text(json.dumps({"queries": {}}))  # pre-canary artifact
    assert bench.prior_canary_median(str(p)) is None


def test_compact_line_empty_inventory():
    line = bench.compact_line(
        {"metric": "m", "value": 0.0, "unit": "sec", "sf": 0.001, "queries": {}}
    )
    assert line["n_queries"] == 0 and line["n_failed"] == 0
    assert len(json.dumps(line)) < bench.MAX_LINE_BYTES
