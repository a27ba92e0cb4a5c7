"""Per-query scaling-exponent sweep (VERDICT r9 ask #1).

Runs every headline query at a list of scale factors (driver testdata for
sf<=0.1, `tools/gen_testdata.py` output above that), noop-forced exactly
like bench.py, artifacts prebuilt outside the timed region, and fits a
log-log slope per query over the fitted range — wall ~ sf^slope. Fixed
job overhead floors small-sf times, so the fit uses the LARGEST points
(default: the top 3 sfs) where data cost dominates.

Writes SCALING.json at the repo root:
  {"sfs": [...], "queries": {name: {"secs": {...}, "slope": s}},
   "superlinear": [names with slope > 1.2]}

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
    entry._pq_index,
    entry._ivfpq_index,
    entry._text_features_index,
    entry._tf_index,
    entry._zone_mapped_events,
    entry._changes_table,
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


def main() -> None:
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
            except Exception as e:
                print(f"[{sf}] {name} failed: {e}", file=sys.stderr)
                continue
            secs[name][str(sf)] = round(min(runs), 3)  # min = least noise
        print(
            f"[{sf}] sweep done in {time.time() - t_wall:.0f}s",
            file=sys.stderr, flush=True,
        )

    out = {"sfs": [_sf_of(d) for d in sf_dirs], "queries": {}, "superlinear": []}
    for name in names:
        pts = [(float(sf), s) for sf, s in secs[name].items()]
        slope = fit_slope(pts)
        out["queries"][name] = {"secs": secs[name], "slope": slope}
        if slope is not None and slope > 1.2:
            out["superlinear"].append(name)
    out["superlinear"].sort()
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALING.json",
    )
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({"superlinear": out["superlinear"], "n_queries": len(names)}))


if __name__ == "__main__":
    main()
