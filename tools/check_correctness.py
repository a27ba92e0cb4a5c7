"""Local stand-in for the driver's t2 correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same sf dir, then compares row count, column names, and an
order-insensitive value multiset. Usage:

    python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime
import decimal
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entry  # noqa: E402
from client_data_ingester_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(v):
    # STRICT decimal rendering: no normalize(). The driver's hash
    # distinguishes Decimal('123.50') from Decimal('123.5'), so the local
    # gate must too — scale/rendering mismatches between Spark and the
    # DuckDB oracle have to FAIL here (round-1 lesson: normalize() masked
    # 17 driver hash failures).
    if isinstance(v, decimal.Decimal):
        return ("dec", str(v))
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", repr(v))
    if isinstance(v, datetime.datetime):
        return ("ts", v.replace(tzinfo=None).isoformat())
    if isinstance(v, bytes):
        return ("b", v.hex())
    return (type(v).__name__, str(v))


def row_multiset(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = {}
    for r in rows:
        key = tuple(canon(r[i]) for i in order)
        out[key] = out.get(key, 0) + 1
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    spark = get_spark("correctness", cpus=os.environ.get("SPARK_GRAFT_CPUS", 8))
    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            continue
        spark_t = time.time() - t0
        sql = oracles.get(name)
        if sql is None:
            print(f"PASS? {name}: rows-only ({len(srows)} rows, {spark_t:.1f}s)")
            continue
        try:
            rel = con.sql(sql)
            ocols = [c.lower() for c in rel.columns]
            orows = rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e)[:300]}")
            failures.append(name)
            continue
        ok = True
        if len(srows) != len(orows):
            print(f"FAIL {name}: rowcount spark={len(srows)} oracle={len(orows)}")
            ok = False
        if sorted(c.lower() for c in scols) != sorted(ocols):
            print(f"FAIL {name}: columns spark={scols} oracle={ocols}")
            ok = False
        if ok:
            sm = row_multiset(srows, [c.lower() for c in scols])
            om = row_multiset(orows, ocols)
            if sm != om:
                diff_s = {k: v for k, v in sm.items() if om.get(k) != v}
                diff_o = {k: v for k, v in om.items() if sm.get(k) != v}
                print(f"FAIL {name}: value mismatch "
                      f"({len(diff_s)} spark-only, {len(diff_o)} oracle-only)")
                for k in list(diff_s)[:3]:
                    print(f"    spark: {k}")
                for k in list(diff_o)[:3]:
                    print(f"    oracle: {k}")
                ok = False
        if ok:
            print(f"PASS {name} ({len(srows)} rows, {spark_t:.1f}s)")
        else:
            failures.append(name)
    print(f"\n{len(failures)} failures: {failures}" if failures else "\nALL PASS")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
