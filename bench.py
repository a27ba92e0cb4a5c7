"""Benchmark runner (driver contract).

Runs the headline queries from ``__spark_entry__.queries()`` at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE compact JSON line:
``{"metric": ..., "value": N, "unit": "sec", "sf": ..., "n_queries": ...,
"n_failed": ..., "slowest": {...}, "queries": {...}}``.

The driver captures only the LAST ~2000 chars of stdout, so the final
printed line MUST stay small: :func:`compact_line` caps it below 1.9 KB
(``tests/test_bench_output.py`` pins the bound) by including only the
headline metric, failure count, and the slowest-N query timings. The full
per-query timings, ``build_costs``, and the rotation-window report are
written to ``BENCH_DETAIL.json`` at the repo root instead of stdout.

Each query is forced with a write to the ``noop`` sink: every output column
is fully materialized executor-side with no driver transfer. ``.count()``
would be wrong here — Catalyst prunes unreferenced columns, so a
projection-only query (quality scores, lang-id, token counts) collapses to
a bare row-count scan and benches fake-fast while its real expression cost
stays invisible. A warmup query absorbs JVM/codegen startup so the numbers
measure the plans, not the JIT.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry  # noqa: E402
from client_data_ingester_spark.session import get_spark  # noqa: E402

# HEADLINE = every scored queries() entry except the hash_probe_* type
# canaries (sub-ms constants — they'd only add noise to the total). Derived
# dynamically so a new operator gets a perf trend the round it lands instead
# of silently missing from the bench.
def headline(qs: dict) -> list[str]:
    return [name for name in qs if not name.startswith("hash_probe_")]


def _force(df) -> None:
    """Materialize every output column executor-side (noop sink)."""
    df.write.format("noop").mode("overwrite").save()


# Upper bound for the final stdout line. The driver keeps the last 2000
# chars of stdout and json-parses them; anything longer is silently
# truncated to unparseable garbage (this happened rounds 5-7).
MAX_LINE_BYTES = 1900


def compact_line(out: dict, top_n: int = 8) -> dict:
    """Reduce the full bench record to a driver-parseable summary.

    Keeps the headline metric plus enough signal to spot a regression
    (failure names, slowest-N timings) while staying below
    ``MAX_LINE_BYTES`` when serialized, regardless of how many queries
    the inventory grows to: slowest-N and the failed list are the only
    per-query content, and both are truncated.
    """
    per_query: dict = out.get("queries", {})
    failed = sorted(n for n, s in per_query.items() if s < 0)
    slowest = dict(
        sorted(
            ((n, s) for n, s in per_query.items() if s >= 0),
            key=lambda kv: (-kv[1], kv[0]),
        )[:top_n]
    )
    line = {
        "metric": out["metric"],
        "value": out["value"],
        "unit": out["unit"],
        "sf": out["sf"],
        "n_queries": len(per_query),
        "n_failed": len(failed),
        "failed": failed[:5],
        "slowest": slowest,
        "detail": "BENCH_DETAIL.json",
    }
    # Cross-round per-query trend, compactly (r16 verdict ask #7): the
    # full {name: median} map is ~4 KB for 137 queries — it cannot ride
    # a line the driver truncates to its last ~2000 chars — so the LINE
    # carries the geometric-mean single-run seconds (robust to one
    # outlier, comparable round-over-round) and the committed
    # BENCH_DETAIL.json `stats` block is the canonical per-query
    # {median,min,p95} record.
    ok = [s for s in per_query.values() if s > 0]
    if ok:
        import math

        line["geomean_s"] = round(
            math.exp(sum(math.log(s) for s in ok) / len(ok)), 4
        )
    # ambient-load verdict travels on the driver-visible line too: a
    # reader of BENCH_rN.json alone can tell "loaded box" from "real
    # regression" without opening the detail file
    if "canary" in out:
        line["canary_x"] = out["canary"].get("inflation")
        line["ambient"] = out.get("ambient_inflation", False)
    return line


#: Fixed canary query for ambient-load adjudication. Must be cheap,
#: plan-stable, and independent of the operator families under test.
CANARY_QUERY = "q1_pricing_summary"
#: canary median above this multiple of the committed prior flags the
#: whole run as ambient-inflated (r15 verdict ask #5: the driver's
#: single run landed 1.5x the committed medians and cost an hour of
#: archaeology to adjudicate — now the artifact carries the verdict).
AMBIENT_FLAG_RATIO = 1.3


def run_canary(qs, spark, sf_dir, repeats: int = 3) -> float:
    """Median wall of the fixed canary query, forced like every bench
    query."""
    times = []
    for _ in range(repeats):
        t0 = time.time()
        _force(qs[CANARY_QUERY](spark, sf_dir))
        times.append(time.time() - t0)
    return round(statistics.median(times), 3)


def prior_canary_median(detail_path: str) -> float | None:
    """The committed reference: the canary median recorded by the last
    bench run at the same sf (BENCH_DETAIL.json is committed per
    round)."""
    try:
        with open(detail_path) as fh:
            prior = json.load(fh)
        return float(prior["canary"]["median"])
    except (OSError, KeyError, TypeError, ValueError):
        return None


def variance_stats(all_runs: dict[str, list[float]]) -> tuple[dict, list[str]]:
    """Per-query {median, min, p95} plus the names whose p95/min > 2x —
    the artifact-side evidence for adjudicating single-run spikes.

    With ≥3 repeats the FIRST run is excluded from the stats (it is
    still visible raw under "runs"): measured per-run traces show run 1
    carries each query's one-time costs — whole-stage-codegen compile of
    its unique plan shape, parquet-footer first-touch of its persisted
    artifacts — at 1.5–4× the settled time (e.g. dedup_containment
    5.26 → 1.9–2.1 s, multimodal_bmp_stats 2.19 → 0.5 s), so a
    max-of-3 p95 was flagging warmup, not variance. The flag now means
    what it says: steady-state runs disagreeing by >2×."""
    stats = {
        name: {
            "median": round(statistics.median(ts), 3),
            "min": round(min(ts), 3),
            "p95": round(
                sorted(ts)[min(len(ts) - 1, int(0.95 * len(ts)))], 3
            ),
        }
        for name, ts in (
            (name, ts[1:] if len(ts) >= 3 else ts)
            for name, ts in all_runs.items()
        )
    }
    noisy = sorted(
        name
        for name, s in stats.items()
        if s["min"] > 0 and s["p95"] / s["min"] > 2.0
    )
    return stats, noisy


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    spark = get_spark("bench", cpus=cpus)
    qs = entry.queries()

    # warmup: JVM + codegen + parquet footer caches. Not just the scan+agg
    # shape: a broadcast join, a sort-merge join, and a window run once as
    # NONCE queries (not scored entries) so whole-stage-codegen compilation
    # for those operator families is absorbed here instead of being billed
    # to whichever scored query happens to rotate into first place.
    _force(qs["q1_pricing_summary"](spark, sf_dir))
    try:
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        from client_data_ingester_spark.sources import load_table

        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_extendedprice"
        )
        od = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderpriority", "o_custkey"
        )
        smj = li.join(  # sort-merge join path
            od.hint("merge"), li.l_orderkey == od.o_orderkey
        )
        bhj = li.join(  # broadcast join path
            F.broadcast(od.limit(1000)), li.l_orderkey == od.o_orderkey
        )
        win = od.withColumn(  # window path
            "rn",
            F.row_number().over(
                Window.partitionBy("o_custkey").orderBy("o_orderkey")
            ),
        )
        for df in (smj, bhj, win):
            _force(df)
        # Arrow python-runner path: the FIRST mapInPandas / pandas_udf of
        # a session forks the Python worker pool and opens the Arrow
        # channel (~1.5 s, measured on multimodal_bmp_stats run-1 spikes)
        # — absorb it with a nonce passthrough so the multimodal / kernel
        # families don't bill worker startup to their first scored run
        _force(
            spark.range(64).mapInPandas(lambda it: it, "id long")
        )
        # touch every table once: parquet footer + file-listing caches are
        # per-table, and the first scored query over an untouched table
        # would otherwise pay the cold metadata read
        for t in (
            "region", "nation", "customer", "supplier", "part",
            "events", "documents", "embeddings",
        ):
            load_table(spark, sf_dir, t).count()
    except Exception as e:
        print(f"warmup: nonce queries failed: {e}", file=sys.stderr)

    # pre-build the persisted artifacts (IVF/RP indexes, eval bloom, zone
    # map, versioned change snapshot) OUTSIDE the timed region: they are
    # build-once-per-corpus-version write-time work, and in a cold
    # environment their first touch would otherwise be billed to whichever
    # query happens to read them first. Each build's wall seconds are
    # RECORDED in the output ("build_costs") so the one-scan build side of
    # the persisted-artifact story is published next to the warm probe
    # numbers; "cached" marks builds that found a prior artifact (their
    # sec is then just the cache check + load, not a true build cost).
    artifacts = [
        ("ivf_index", entry._ivf_index, ("ivf", "embeddings"), "_SUCCESS"),
        ("rp_index", entry._rp_index, ("rp", "embeddings"), "_SUCCESS"),
        ("bloom_index", entry._bloom_index, ("bloom", "documents"), "_SUCCESS"),
        (
            "cluster_index",
            entry._cluster_index,
            ("clusters", "documents"),
            "_SUCCESS",
        ),
        (
            "doc_band_index",
            entry._doc_band_index,
            ("docbands", "documents"),
            "_SUCCESS",
        ),
        (
            "kmeans_model",
            entry._kmeans_index,
            ("kmeans", "embeddings"),
            os.path.join("centroids", "_SUCCESS"),
        ),
        (
            "semantic_cells",
            entry._semantic_cells,
            ("semcells", "embeddings"),
            os.path.join("centroids", "_SUCCESS"),
        ),
        (
            "pq_model",
            entry._pq_index,
            ("pq", "embeddings"),
            os.path.join("codebooks", "_SUCCESS"),
        ),
        (
            "ivfpq_model",
            entry._ivfpq_index,
            ("ivfpq", "embeddings"),
            os.path.join("codebooks", "_SUCCESS"),
        ),
        (
            "text_features",
            entry._text_features_index,
            ("textfeat", "documents"),
            "_SUCCESS",
        ),
        (
            "tf_index",
            entry._tf_index,
            ("tf", "documents"),
            "_SUCCESS",
        ),
        (
            "nb_model",
            entry._nb_index,
            ("nb", "documents"),
            os.path.join("classes", "_SUCCESS"),
        ),
        (
            "zone_map",
            entry._zone_mapped_events,
            ("zonemap", "events"),
            os.path.join("manifest", "_SUCCESS"),
        ),
        (
            "changes_snapshot",
            entry._changes_table,
            ("changes", "part"),
            os.path.join("table", "_MANIFEST.v2"),
        ),
    ]
    build_costs: dict[str, dict] = {}
    for name, builder, (kind, src), marker in artifacts:
        try:
            cached = os.path.exists(
                os.path.join(
                    entry._index_cache_path(sf_dir, kind, src_table=src),
                    marker,
                )
            )
            t0 = time.time()
            builder(spark, sf_dir)
            build_costs[name] = {
                "sec": round(time.time() - t0, 3),
                "cached": cached,
            }
        except Exception as e:  # keep benching even if one artifact fails
            print(f"warmup: {name} failed: {e}", file=sys.stderr)
            build_costs[name] = {"sec": -1.0, "cached": False}

    # SPARK_GRAFT_BENCH_REPEATS>1 runs each query N times and reports the
    # median (plus all runs under "runs") — for settling noise vs regression.
    repeats = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "1")))

    # ambient-load canary: bracket the sweep with a fixed, cheap query
    # and record load averages, so a slow run is self-adjudicating from
    # the artifact (uniform canary inflation = loaded box, not code)
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    prior_med = prior_canary_median(detail_path)
    load_start = os.getloadavg()
    canary_start = run_canary(qs, spark, sf_dir)

    per_query: dict[str, float] = {}
    all_runs: dict[str, list[float]] = {}
    total = 0.0
    for name in headline(qs):
        fn = qs[name]
        times: list[float] = []
        failed = False
        for _ in range(repeats):
            t0 = time.time()
            try:
                _force(fn(spark, sf_dir))
            except Exception as e:  # a broken query must not lose the run
                print(f"bench: {name} failed: {e}", file=sys.stderr)
                failed = True
                break
            times.append(round(time.time() - t0, 3))
        if failed or not times:
            per_query[name] = -1.0
            continue
        # true median (even counts average the middle pair): the upper-
        # middle element would publish the SLOWER of 2 repeats
        med = round(statistics.median(times), 3)
        per_query[name] = med
        all_runs[name] = times
        total += med
    canary_end = run_canary(qs, spark, sf_dir)
    canary_med = round(statistics.median([canary_start, canary_end]), 3)
    inflation = (
        round(canary_med / prior_med, 2) if prior_med and prior_med > 0
        else None
    )
    out = {
        "metric": "headline_queries_total_wall",
        "value": round(total, 3),
        "unit": "sec",
        "queries": per_query,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "build_costs": build_costs,
        "canary": {
            "query": CANARY_QUERY,
            "start": canary_start,
            "end": canary_end,
            "median": canary_med,
            "prior_median": prior_med,
            "inflation": inflation,
            "loadavg_start": [round(x, 2) for x in load_start],
            "loadavg_end": [round(x, 2) for x in os.getloadavg()],
        },
        "ambient_inflation": bool(
            inflation is not None and inflation > AMBIENT_FLAG_RATIO
        ),
        # the driver's correctness gate scores only the first 50 entries;
        # record which entries rotated out this round. Every entry is
        # scored at least once per window_report's "coverage_rounds"
        # consecutive rounds (tests/test_driver_window.py simulates the
        # bound)
        "window": entry.window_report(qs),
    }
    if repeats > 1:
        out["runs"] = all_runs
    if repeats >= 3:
        # per-query variance so single-run spikes are adjudicable from the
        # artifact alone (no git archaeology): median/min/p95 per query,
        # plus the queries whose p95/min exceeds 2x — on a shared box
        # those are the ones where a driver single-run "regression" is
        # most likely noise (or, if min itself moved, a real one)
        out["stats"], noisy = variance_stats(all_runs)
        out["high_variance"] = noisy
        if noisy:
            print(
                "bench: p95/min > 2x (single-run numbers unreliable for): "
                + ", ".join(noisy),
                file=sys.stderr,
            )

    # Full detail goes to a repo file (committed per round); stdout gets
    # only the compact line the driver can actually capture and parse.
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    try:
        with open(detail_path, "w") as fh:
            json.dump(out, fh, indent=1)
            fh.write("\n")
    except OSError as e:
        print(f"bench: could not write {detail_path}: {e}", file=sys.stderr)

    line = json.dumps(compact_line(out))
    if len(line) >= MAX_LINE_BYTES:
        # never discard a completed run's output (an assert here would
        # raise AFTER the full sweep and print nothing — and vanish under
        # python -O): degrade to the metric essentials, which always fit
        print(
            f"bench: compact line is {len(line)} bytes; truncating detail",
            file=sys.stderr,
        )
        line = json.dumps(
            {k: out[k] for k in ("metric", "value", "unit", "sf")}
            | {"n_queries": len(per_query)}
        )
    print(line)


if __name__ == "__main__":
    main()
