"""Per-query scaling-exponent sweep (VERDICT r9 ask #1).

Runs every headline query at a list of scale factors (driver testdata for
sf<=0.1, `tools/gen_testdata.py` output above that), noop-forced exactly
like bench.py, artifacts prebuilt outside the timed region, and fits a
log-log slope per query over the fitted range — wall ~ sf^slope. Fixed
job overhead floors small-sf times, so the fit uses the LARGEST points
(default: the top 3 sfs) where data cost dominates.

Writes SCALING.json at the repo root:
  {"sfs": [...],
   "queries": {name: {"secs": {...}, "rows": {...}, "slope": s,
                      "rows_slope": r}},
   "superlinear": [names with wall slope > 1.2],
   "superlinear_unjustified": [superlinear names whose wall slope also
       exceeds their OUTPUT-cardinality slope — i.e. not explained by the
       answer itself growing (pair lists on clustered corpora are Θ(n²)
       rows by construction; wall ∝ output there is optimal, wall ≫
       output is a plan bug)]}

Usage:
  SPARK_GRAFT_SCALING_SFS="/root/testdata/sf0.01,/root/testdata/sf0.1,\
/root/repo/scaledata/sf0.5,/root/repo/scaledata/sf1" \
  python tools/bench_scaling.py
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402
from bench import headline  # noqa: E402
from client_data_ingester_spark.session import get_spark  # noqa: E402

ARTIFACT_BUILDERS = [
    entry._ivf_index,
    entry._rp_index,
    entry._bloom_index,
    entry._cluster_index,
    entry._doc_band_index,
    entry._kmeans_index,
    entry._semantic_cells,
    entry._pq_index,
    entry._ivfpq_index,
    entry._text_features_index,
    entry._tf_index,
    entry._nb_index,
    entry._zone_mapped_events,
    entry._changes_table,
    entry._split_pin_index,
]


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _sf_of(sf_dir: str) -> float:
    return float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))


def fit_slope(points: list[tuple[float, float]], top_n: int = 3) -> float | None:
    """Least-squares slope of ln(sec) on ln(sf) over the largest top_n sfs
    (the region where data cost, not job overhead, dominates)."""
    pts = sorted((sf, s) for sf, s in points if s > 0)[-top_n:]
    if len(pts) < 2:
        return None
    xs = [math.log(sf) for sf, _ in pts]
    ys = [math.log(s) for _, s in pts]
    n = len(pts)
    mx, my = sum(xs) / n, sum(ys) / n
    den = sum((x - mx) ** 2 for x in xs)
    if den == 0:
        return None
    return round(sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / den, 3)


#: Intermediate-bound queries: the answer SHRINKS as dedup bites harder
#: (a retained corpus gets smaller when more duplicates are found), but
#: the unavoidable work is consuming the duplicate-PAIR relation — whose
#: cardinality the sweep already measures as the named driver query's own
#: output, in the same artifact. The justification stays empirical: wall
#: may grow as fast as the MEASURED driver output (plus slack), never
#: faster. You cannot compute "corpus minus duplicates" without reading
#: the duplicate pairs.
WORK_DRIVERS = {
    "semantic_dedup_retained": "semantic_dedup_pairs",
    # deliberately NOT the minhash endgame trio (dedup_retained_corpus /
    # dedup_representatives): those probe the persisted cluster-index
    # artifact and measure at slope ~0.2, so a driver exemption there
    # would be dormant — and a dormant exemption can only ever MASK a
    # future regression. Add a mapping when a query is actually flagged
    # and the pair-consumption argument actually applies.
}


def adjudicate(out: dict) -> None:
    """Recompute slopes and the superlinear lists over the (possibly
    merged) artifact. A query is superlinear at wall slope > 1.2;
    unjustified unless wall slope ≤ its measured BOUND + 0.1, where the
    bound is its own output-cardinality slope or — for WORK_DRIVERS
    entries — the driver query's output slope, whichever is larger. The
    chosen bound and its source are recorded per flagged query so the
    committed-contract test re-verifies the arithmetic, not a verdict."""
    out["superlinear"] = []
    out["superlinear_unjustified"] = []
    for name, rec in out["queries"].items():
        pts = [(float(sf), s) for sf, s in rec["secs"].items()]
        rec["slope"] = fit_slope(pts)
        rec["rows_slope"] = fit_slope(
            [(float(sf), r) for sf, r in rec.get("rows", {}).items()]
        )
    for name, rec in out["queries"].items():
        rec.pop("bound_slope", None)
        rec.pop("bound_source", None)
        if rec["slope"] is not None and rec["slope"] > 1.2:
            out["superlinear"].append(name)
            bound, source = rec["rows_slope"], "rows"
            drv = WORK_DRIVERS.get(name)
            drv_slope = (
                out["queries"].get(drv, {}).get("rows_slope")
                if drv
                else None
            )
            if drv_slope is not None and (bound is None or drv_slope > bound):
                bound, source = drv_slope, drv
            rec["bound_slope"], rec["bound_source"] = bound, source
            if not (bound is not None and rec["slope"] <= bound + 0.1):
                out["superlinear_unjustified"].append(name)
    out["superlinear"].sort()
    out["superlinear_unjustified"].sort()


def main() -> None:
    if os.environ.get("SPARK_GRAFT_SCALING_READJUDICATE"):
        # re-run the adjudication over an existing artifact without
        # re-timing anything (e.g. after a WORK_DRIVERS change)
        path = os.environ.get("SPARK_GRAFT_SCALING_OUT") or os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "SCALING.json",
        )
        with open(path) as fh:
            out = json.load(fh)
        adjudicate(out)
        with open(path, "w") as fh:
            json.dump(out, fh, indent=1)
        print(json.dumps({
            "superlinear": out["superlinear"],
            "superlinear_unjustified": out["superlinear_unjustified"],
            "n_queries": len(out["queries"]),
        }))
        return
    sf_dirs = os.environ.get(
        "SPARK_GRAFT_SCALING_SFS",
        "/root/testdata/sf0.01,/root/testdata/sf0.1,"
        "/root/repo/scaledata/sf0.5,/root/repo/scaledata/sf1",
    ).split(",")
    repeats = max(1, int(os.environ.get("SPARK_GRAFT_SCALING_REPEATS", "2")))
    only = os.environ.get("SPARK_GRAFT_SCALING_QUERIES")
    spark = get_spark("bench-scaling", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    qs = entry.queries()
    names = headline(qs)
    if only:
        names = [n for n in names if n in set(only.split(","))]

    secs: dict[str, dict[str, float]] = {n: {} for n in names}
    rows: dict[str, dict[str, int]] = {n: {} for n in names}
    for sf_dir in sf_dirs:
        sf = _sf_of(sf_dir)
        t_wall = time.time()
        # warmup + prebuild (outside per-query timing), same as bench.py
        _force(qs["q1_pricing_summary"](spark, sf_dir))
        for b in ARTIFACT_BUILDERS:
            try:
                t0 = time.time()
                b(spark, sf_dir)
                print(
                    f"[{sf}] build {b.__name__}: {time.time() - t0:.1f}s",
                    file=sys.stderr, flush=True,
                )
            except Exception as e:
                print(f"[{sf}] build {b.__name__} failed: {e}", file=sys.stderr)
        for name in names:
            runs = []
            try:
                for _ in range(repeats):
                    t0 = time.time()
                    _force(qs[name](spark, sf_dir))
                    runs.append(time.time() - t0)
                # untimed: result cardinality, so a superlinear WALL slope
                # can be adjudicated against output volume (a query whose
                # answer itself grows ~n² — dense pair lists on clustered
                # synthetic corpora — is output-bound, not a plan bug)
                rows[name][str(sf)] = qs[name](spark, sf_dir).count()
            except Exception as e:
                print(f"[{sf}] {name} failed: {e}", file=sys.stderr)
                continue
            secs[name][str(sf)] = round(min(runs), 3)  # min = least noise
        print(
            f"[{sf}] sweep done in {time.time() - t_wall:.0f}s",
            file=sys.stderr, flush=True,
        )

    path = os.environ.get("SPARK_GRAFT_SCALING_OUT") or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALING.json",
    )
    out = {"sfs": [_sf_of(d) for d in sf_dirs], "queries": {}, "superlinear": []}
    if only and os.path.exists(path):
        # a targeted re-run (e.g. after fixing a flagged query) MERGES into
        # the existing full-sweep artifact instead of discarding it
        with open(path) as fh:
            prior = json.load(fh)
        out["queries"] = prior.get("queries", {})
        out["sfs"] = sorted(set(prior.get("sfs", [])) | set(out["sfs"]))
    out["superlinear_unjustified"] = []
    for name in names:
        prior_rec = out["queries"].get(name, {})
        merged = dict(prior_rec.get("secs", {}))
        merged.update(secs[name])
        merged_rows = dict(prior_rec.get("rows", {}))
        merged_rows.update(rows[name])
        out["queries"][name] = {"secs": merged, "rows": merged_rows, "slope": None}
    adjudicate(out)
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({
        "superlinear": out["superlinear"],
        "superlinear_unjustified": out["superlinear_unjustified"],
        "n_queries": len(names),
    }))


if __name__ == "__main__":
    main()
