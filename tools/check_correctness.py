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
import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

import __spark_entry__ as entry  # noqa: E402
from client_data_ingester_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(v):
    # Mirror the driver's binding: oracle values arrive via pandas
    # (``rel.df()``), so DuckDB HUGEINT/DECIMAL become float64 and DATE
    # becomes a midnight Timestamp. The driver's hash is a plain value
    # rendering with NO type tag — verified against CORRECTNESS_r02:
    #   * int 4 != float 4.0          (HUGEINT SUM reds)
    #   * Decimal('1.50') != 1.5      (round-1 trailing-zero reds)
    #   * Decimal('1.25') == 1.25     (transformer_projection green)
    #   * date == midnight timestamp  (q3/date_string_funcs green)
    # so canon() renders to strings with exactly those (in)equalities.
    if v is None or v is pd.NaT:
        return "<null>"
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v))
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, (float, np.floating)):
        f = float(v)
        return "nan" if math.isnan(f) else repr(f)
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, datetime.datetime):  # pandas Timestamp is a subclass
        v = v.replace(tzinfo=None)
        if (v.hour, v.minute, v.second, v.microsecond) == (0, 0, 0, 0):
            return v.date().isoformat()
        return v.isoformat(sep=" ")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, np.ndarray):
        return "[" + ",".join(canon(x) for x in v.tolist()) + "]"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def row_multiset(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = {}
    for r in rows:
        key = tuple(canon(r[i]) for i in order)
        out[key] = out.get(key, 0) + 1
    return out


def _union_find_clusters(con, pairs_sql: str):
    """Driver-side union-find oracle for ``embedding_dup_clusters``
    (r13 verdict ask #1 — the board's one indirect cell).

    The recursive-CTE closure oracle is an ORACLE-COST wall at scale
    (DuckDB's `reach` relation over the sf0.5 corpus's ~11M-row
    symmetric pair list ran > 2 h), but the adjudication doesn't need
    SQL recursion: the pair relation itself is already hash-exact
    against DuckDB (``embedding_near_duplicates``), so exact cluster
    labels follow from a union-find over those pairs — same semantics
    as the CTE (min node id labels each component), seconds instead of
    hours. Spark-side reference: the operator under test feeds
    ``dedup.duplicate_clusters``'s large-star/small-star contraction
    (client_data_ingester_spark/operators/dedup.py:619), whose fixpoint
    is exactly min-label connected components.

    Returns (rows, columns) shaped like the SQL oracle:
    (vec_id, cluster_id) for every node that appears in >= 1 pair."""
    df = con.sql(pairs_sql).df()
    a = df["id_a"].to_numpy(dtype=np.int64)
    b = df["id_b"].to_numpy(dtype=np.int64)
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.setdefault(r, r) != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for x, y in zip(a.tolist(), b.tolist()):
        rx, ry = find(x), find(y)
        if rx != ry:
            # union by MIN id so the final find() walk ends at the
            # component's minimum — the cluster label both the SQL
            # oracle (MIN(r)) and the Spark contraction converge to
            if rx < ry:
                parent[ry] = rx
            else:
                parent[rx] = ry
    rows = [(node, find(node)) for node in parent]
    return rows, ["vec_id", "cluster_id"]


# Corpus size at which embedding_dup_clusters switches from the
# recursive-CTE SQL oracle to the union-find override above. Below the
# threshold the SQL twin stays the adjudicator (cheap there — and the
# driver's own sf0.01 gate always runs the SQL, so small corpora keep
# proving the oracle_sql() entry itself); above it the SQL is an
# oracle-cost wall, not a correctness statement. Set to 1 to force the
# override (used to validate UF == SQL at sf0.01).
UF_ORACLE_MIN_ROWS = int(os.environ.get("SPARK_GRAFT_UF_ORACLE_MIN", "5000"))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    if os.environ.get("SPARK_GRAFT_FORCE_DIST_CLUSTERS"):
        # pin the DISTRIBUTED large-star/small-star path under the scaled
        # oracles: the size-gated driver-side fast path would otherwise
        # absorb every locally-testable corpus (it engages below ~2M
        # edges), leaving the 100 TB code path proven only at toy size
        from client_data_ingester_spark.operators import dedup

        dedup.LOCAL_SOLVE_MAX_EDGES = 0
        print("[forced distributed contraction: LOCAL_SOLVE_MAX_EDGES=0]")
    con = duckdb.connect()
    for t in TABLES:
        src = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(src):
            # Spark-written tables are directories of part files (the
            # scaledata corpora); the driver's single-file testdata
            # keeps the bare path
            src = f"{src}/*.parquet"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    spark = get_spark("correctness", cpus=os.environ.get("SPARK_GRAFT_CPUS", 8))
    qs = entry.queries()
    # the adaptive-geometry oracles (RP bits/bands, SemDeDup cells)
    # unroll formulas of the corpus row count: point them at THIS sf
    # dir's actual count so gates above sf0.01 prove the unrolling
    # tracks the geometry (the driver's own gate leaves the 500 default)
    os.environ["SPARK_GRAFT_ORACLE_N"] = str(
        con.sql("SELECT COUNT(*) FROM embeddings").fetchone()[0]
    )
    # occupancy escalation is data-driven — the formula unroll can't see
    # it (at sf0.5 the RP build escalates (14,7) → (24,20) and a
    # formula-geometry oracle compares a 2× candidate set). Pre-build
    # the artifact and hand its ACTUAL geometry to the oracle unroll.
    geom = entry._rp_index(spark, sf_dir)[1]
    os.environ["SPARK_GRAFT_ORACLE_RP_BITS"] = str(geom["bits"])
    os.environ["SPARK_GRAFT_ORACLE_RP_BANDS"] = str(geom["bands"])
    oracles = entry.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        # a typo'd name would otherwise skip every entry and print a green
        # ALL PASS having verified nothing
        print(f"unknown query name(s): {sorted(unknown)}", file=sys.stderr)
        return 2
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            # pandas fetch on the Spark side too: the driver binds BOTH
            # engines through pandas, so a nullable long column becomes
            # float64+NaN on both sides (asof_join passed the r2 driver gate
            # exactly because of this symmetry), while a non-null Spark long
            # stays int64 against a DuckDB HUGEINT→float64 — the r2 reds.
            spdf = sdf.toPandas()
            srows = list(spdf.itertuples(index=False, name=None))
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            continue
        spark_t = time.time() - t0
        sql = oracles.get(name)
        if sql is None:
            print(f"PASS? {name}: rows-only ({len(srows)} rows, {spark_t:.1f}s)")
            continue
        corpus_n = int(os.environ["SPARK_GRAFT_ORACLE_N"])
        use_uf = (
            name == "embedding_dup_clusters" and corpus_n >= UF_ORACLE_MIN_ROWS
        )
        try:
            if use_uf:
                orows, ocols = _union_find_clusters(
                    con, oracles["embedding_near_duplicates"]
                )
            else:
                rel = con.sql(sql)
                ocols = [c.lower() for c in rel.columns]
                # pandas fetch, NOT fetchall(): the driver's oracle binding
                # goes through pandas, which coerces HUGEINT/DECIMAL to
                # float64 — the local gate must see the same renderings the
                # driver hashes.
                odf = rel.df()
                orows = list(odf.itertuples(index=False, name=None))
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
            if sm != om and use_uf:
                # no decimal second chance here — all-int output, and
                # re-pulling would run the intractable recursive SQL
                diff_s = {k: v for k, v in sm.items() if om.get(k) != v}
                diff_o = {k: v for k, v in om.items() if sm.get(k) != v}
                print(f"FAIL {name}: value mismatch [union-find oracle] "
                      f"({len(diff_s)} spark-only, {len(diff_o)} oracle-only)")
                for k in list(diff_s)[:3]:
                    print(f"    spark: {k}")
                for k in list(diff_o)[:3]:
                    print(f"    oracle: {k}")
                ok = False
            elif sm != om:
                # Second chance at DECIMAL-EXACT binding: the pandas
                # fetch coerces DuckDB DECIMAL to float64 (the driver's
                # binding — correct to mirror at its sf0.01 gate, where
                # every aggregate fits float64 exactly), but above ~15
                # significant digits (sf0.5 fact sums) the float64
                # rendering diverges from Spark's exact Decimal. Re-pull
                # the oracle rows via fetchall() (Decimal-preserving):
                # an exact-multiset match means the ENGINES agree and
                # only the measurement channel saturated.
                orows2 = con.sql(sql).fetchall()
                om2 = row_multiset(orows2, ocols)
                if om2 == sm:
                    print(
                        f"PASS {name} ({len(srows)} rows, {spark_t:.1f}s) "
                        "[decimal-exact; pandas-binding precision artifact]"
                    )
                    continue
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
            tag = " [union-find oracle]" if use_uf else ""
            print(f"PASS {name} ({len(srows)} rows, {spark_t:.1f}s){tag}")
        else:
            failures.append(name)
    print(f"\n{len(failures)} failures: {failures}" if failures else "\nALL PASS")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
