"""Cross-PROCESS same-tenant writer contention (r14 verdict ask #5).

The progress-based merge retry (ingestion/service.py) is verified by
threaded tests and the threaded part_f of bench_tenants.py — but threads
share one JVM, one filesystem cache, and one Python GIL, so they cannot
exercise the REAL contention surface: separate OS processes racing the
table's commit protocol through the filesystem (O_EXCL version files,
the write lock, staged-dir GC). This tool spawns N independent Python
processes, each with its OWN SparkSession, all ingesting disjoint-sku
files into ONE tenant of ONE table:

- a file barrier releases the writers only after every JVM is up, so
  session startup cannot serialize the contention window;
- each writer reports its wall, attempts (= merge_conflict_rounds + 1),
  and merge_stall_peak from the ingest report's telemetry;
- the parent asserts LIVENESS before writing the artifact: every writer
  succeeded, the table holds exactly N·rows_each rows, and
  attempts_max <= N + 2 (with N finite writers each one wins within N
  rounds; +2 absorbs a lost-response/GC hiccup, far under the 64-loss
  backstop).

Writes XPROC_CONTENTION.json at the repo root;
tests/test_scaling_canaries.py pins the committed numbers.

Usage:
    python tools/bench_xproc_tenant.py                  # N in {8,16}
    SPARK_GRAFT_XPROC_NS=4 python tools/bench_xproc_tenant.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROWS_EACH = 200


def child(
    table_root: str, barrier_dir: str, writer: int, n_rows: int,
    group: bool,
) -> int:
    """One writer process: own SparkSession, barrier, one ingest."""
    from client_data_ingester_spark.ingestion import (
        ParserConfig,
        ingest_data,
    )
    from client_data_ingester_spark.schemas import CLIENT_PRODUCTS_SCHEMA
    from client_data_ingester_spark.session import get_spark
    from client_data_ingester_spark.tables import SnapshotTable

    spark = get_spark(f"xproc-w{writer}", cpus="2")
    cfg = ParserConfig(
        "csv",
        {
            "sku": ("sku", "text"),
            "title": ("title", "text"),
            "qty": ("stock_quantity", "integer"),
        },
    )
    rows = "\n".join(
        f"W{writer}_S{i},w{writer} item {i},{i}" for i in range(n_rows)
    )
    payload = ("sku,title,qty\n" + rows + "\n").encode()
    table = SnapshotTable(table_root, CLIENT_PRODUCTS_SCHEMA)

    # barrier: announce readiness, then spin until the parent's GO file
    open(os.path.join(barrier_dir, f"ready.{writer}"), "w").close()
    go = os.path.join(barrier_dir, "GO")
    while not os.path.exists(go):
        time.sleep(0.05)

    t0 = time.time()
    rep = ingest_data(
        spark, table, payload, cfg, client_id=1, group_commit=group
    )
    wall = time.time() - t0
    print(
        json.dumps(
            {
                "writer": writer,
                "success": rep.success,
                "message": rep.message,
                "wall_s": round(wall, 2),
                "attempts": rep.stats.get("merge_conflict_rounds", 0) + 1,
                "stall_peak": rep.stats.get("merge_stall_peak", 0),
                "batch": rep.stats.get("group_commit_batch", 0),
                "drainer": bool(
                    rep.stats.get("group_commit_drainer", False)
                ),
            }
        ),
        flush=True,
    )
    return 0 if rep.success else 1


def run_fleet(n_writers: int, group: bool = False) -> dict:
    work = tempfile.mkdtemp(prefix=f"xproc_{n_writers}_")
    table_root = os.path.join(work, "table")
    barrier = os.path.join(work, "barrier")
    os.makedirs(barrier)
    procs = []
    for w in range(1, n_writers + 1):
        procs.append(
            subprocess.Popen(
                [
                    sys.executable,
                    os.path.abspath(__file__),
                    "--child",
                    table_root,
                    barrier,
                    str(w),
                    str(ROWS_EACH),
                    "1" if group else "0",
                ],
                stdout=subprocess.PIPE,
                stderr=subprocess.DEVNULL,
                cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            )
        )
    # wait for every JVM to come up, then release them together
    deadline = time.time() + 600
    while time.time() < deadline:
        ready = [
            n for n in os.listdir(barrier) if n.startswith("ready.")
        ]
        if len(ready) == n_writers:
            break
        if any(p.poll() not in (None,) and p.poll() != 0 for p in procs):
            raise RuntimeError("a writer died before the barrier")
        time.sleep(0.2)
    else:
        raise RuntimeError("writers did not all reach the barrier")
    t0 = time.time()
    open(os.path.join(barrier, "GO"), "w").close()
    reports = []
    for i, p in enumerate(procs, 1):
        out, _ = p.communicate(timeout=900)
        line = [ln for ln in out.decode().splitlines() if ln.startswith("{")]
        if not line:
            # a writer that died after the barrier prints no report;
            # surface the real failure instead of an IndexError
            raise RuntimeError(
                f"writer {i} exited rc={p.returncode} with no JSON "
                "report (post-barrier crash — rerun with stderr "
                "captured to diagnose)"
            )
        reports.append(json.loads(line[-1]))
    fleet_wall = time.time() - t0

    # liveness checks BEFORE the artifact is written — explicit raises,
    # not asserts: under python -O an assert vanishes and the tool would
    # write XPROC_CONTENTION.json unverified (r15 ADVICE)
    failed = [r for r in reports if not r["success"]]
    if failed:
        raise RuntimeError(f"writers failed: {failed}")
    attempts = sorted(r["attempts"] for r in reports)
    if attempts[-1] > n_writers + 2:
        raise RuntimeError(
            f"liveness bound violated: attempts_max {attempts[-1]} > "
            f"{n_writers} + 2 ({attempts})"
        )
    if group:
        # group commit's whole point: per-writer attempts are O(1), so
        # the fleet total is ~linear in N — never the direct path's
        # quadratic re-merge cascade (r15 verdict ask #4's done-bar)
        if sum(attempts) > 2 * n_writers:
            raise RuntimeError(
                f"group-commit attempts_total {sum(attempts)} exceeds "
                f"the linear bound 2x{n_writers}"
            )
        if not any(r["drainer"] for r in reports):
            raise RuntimeError("no writer reports having drained")
    # verify the table end-state from the parent (fresh session)
    from client_data_ingester_spark.schemas import CLIENT_PRODUCTS_SCHEMA
    from client_data_ingester_spark.session import get_spark
    from client_data_ingester_spark.tables import SnapshotTable

    spark = get_spark("xproc-verify", cpus="4")
    n = (
        SnapshotTable(table_root, CLIENT_PRODUCTS_SCHEMA)
        .read(spark, partition_value=1)
        .count()
    )
    if n != n_writers * ROWS_EACH:
        raise RuntimeError(
            f"row-count mismatch: table holds {n}, expected "
            f"{n_writers * ROWS_EACH}"
        )
    out = {
        "mode": "group" if group else "direct",
        "n_writers": n_writers,
        "rows_each": ROWS_EACH,
        "fleet_wall_s": round(fleet_wall, 2),
        "rows_committed": n,
        "attempts": attempts,
        "attempts_max": attempts[-1],
        "attempts_total": sum(attempts),
        "stall_peak_max": max(r["stall_peak"] for r in reports),
        "writer_wall_max_s": max(r["wall_s"] for r in reports),
    }
    if group:
        out["batches"] = sorted(r["batch"] for r in reports)
        out["n_drainers"] = sum(1 for r in reports if r["drainer"])
    return out


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        return child(
            sys.argv[2], sys.argv[3], int(sys.argv[4]), int(sys.argv[5]),
            sys.argv[6] == "1",
        )
    ns = [
        int(x)
        for x in os.environ.get("SPARK_GRAFT_XPROC_NS", "8,16").split(",")
    ]
    # group-commit fleets scale further (linear attempts), so they run
    # the larger sizes by default — the r15 ask's N=32 point included
    group_ns = [
        int(x)
        for x in os.environ.get(
            "SPARK_GRAFT_XPROC_GROUP_NS", "8,16,32"
        ).split(",")
        if x
    ]
    out_path = os.environ.get(
        "SPARK_GRAFT_XPROC_OUT",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "XPROC_CONTENTION.json",
        ),
    )
    results = []
    for n in ns:
        r = run_fleet(n)
        print(json.dumps(r), flush=True)
        results.append(r)
    for n in group_ns:
        r = run_fleet(n, group=True)
        print(json.dumps(r), flush=True)
        results.append(r)
    with open(out_path, "w") as fh:
        json.dump({"fleets": results}, fh, indent=1)
        fh.write("\n")
    print(f"wrote {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
