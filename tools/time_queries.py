"""Isolated per-query timing (optimization-round measure loop, guide §1).

Times ONLY the named queries (noop sink, N repeats, median-after-warmup)
without the full bench sweep — the tight measure→change→re-measure loop
for one operator. Same session shape as bench.py (local[$SPARK_GRAFT_CPUS],
$SPARK_GRAFT_SF_DIR), same forcing action, so numbers are comparable to
BENCH_DETAIL medians.

Usage: python tools/time_queries.py q1 q2 ... [--repeats N] [--plans DIR]
  --plans DIR additionally writes DIR/<query>.txt with explain("formatted").
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402
from client_data_ingester_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    repeats = 3
    plans_dir = None
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--repeats":
            repeats = int(args[i + 1])
            i += 2
        elif args[i] == "--plans":
            plans_dir = args[i + 1]
            i += 2
        else:
            names.append(args[i])
            i += 1

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("time_queries", cpus=cpus)
    qs = entry.queries()

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    # session warmup (JVM/codegen/python-worker) — mirror bench.py's shape
    force(qs["q1_pricing_summary"](spark, sf_dir))
    force(spark.range(64).mapInPandas(lambda it: it, "id long"))

    if plans_dir:
        os.makedirs(plans_dir, exist_ok=True)

    for name in names:
        fn = qs[name]
        if plans_dir:
            import io
            from contextlib import redirect_stdout

            buf = io.StringIO()
            with redirect_stdout(buf):
                fn(spark, sf_dir).explain("formatted")
            with open(os.path.join(plans_dir, f"{name}.txt"), "w") as fh:
                fh.write(buf.getvalue())
        if repeats <= 0:  # plans-only mode
            print(f"{name}: plan dumped")
            continue
        spark.sparkContext.setJobDescription(name)
        times = []
        for _ in range(repeats + 1):  # +1 warmup run, excluded
            t0 = time.time()
            force(fn(spark, sf_dir))
            times.append(round(time.time() - t0, 3))
        settled = times[1:]
        print(
            f"{name}: median={statistics.median(settled):.3f} "
            f"runs={times} (first=warmup)"
        )
        spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
