"""Tenant-cardinality and tenant-skew measurement (VERDICT r11 asks #4/#5).

Every committed scaling artifact scales ROWS; this tool scales the two
multi-tenant axes the 100 TB design actually fears:

Part A — client cardinality. The products table partitions by client_id
(SURVEY §1.1): at 10k+ tenants the costs that could grow with TENANT
COUNT rather than data size are (a) manifest size/parse time, (b) the
per-ingest merge (must stay O(file + that tenant's partition), never
O(clients)), (c) a tenant-scoped search (must resolve one tenant's dirs
from the manifest, never list the table). Measured at 100 / 1k / 10k
clients with constant per-tenant data.

Part B — tenant skew. Per-file commits are per-tenant (the reference's
Postgres-parity contract), so "one client holds 90% of the batch" can
never skew a multi-tenant shuffle — there isn't one; the skewed tenant
just pays for its own rows. Measured: the same total row volume merged
(a) uniformly across 10 tenants and (b) with one tenant holding 90%,
plus (c) the intra-file hot-sku pathology (every row the same sku —
the LWW fold's groupBy key), which map-side partial aggregation absorbs.

Usage:
    SPARK_GRAFT_SF_DIR=scaledata/sf0.5 python tools/bench_tenants.py
Prints one JSON line; the PLANS.md table is transcribed from it.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from client_data_ingester_spark.ingestion import (  # noqa: E402
    ParserConfig,
    ingest_data,
)
from client_data_ingester_spark.queries.products import list_products  # noqa: E402
from client_data_ingester_spark.schemas import CLIENT_PRODUCTS_SCHEMA  # noqa: E402
from client_data_ingester_spark.session import get_spark  # noqa: E402
from client_data_ingester_spark.tables import SnapshotTable  # noqa: E402

CFG = ParserConfig(
    "csv",
    {
        "sku": ("sku", "text"),
        "title": ("title", "text"),
        "qty": ("stock_quantity", "integer"),
        "price": ("max_price", "decimal"),
        "active": ("active", "boolean"),
    },
)


def _seed_rows(spark, n_clients: int, per_client: int):
    """(id, client_id, sku, ...) seed matching CLIENT_PRODUCTS_SCHEMA."""
    base = spark.range(n_clients * per_client).select(
        (F.col("id") + 1).alias("id"),
        (F.col("id") % n_clients + 1).cast("long").alias("client_id"),
        F.concat(
            F.lit("SKU-"),
            (F.col("id") % n_clients + 1).cast("string"),
            F.lit("-"),
            (F.col("id") / n_clients).cast("long").cast("string"),
        ).alias("sku"),
    )
    for f in CLIENT_PRODUCTS_SCHEMA.fields:
        if f.name in ("id", "client_id", "sku"):
            continue
        if f.name == "active":
            base = base.withColumn("active", F.lit(True))
        elif f.name == "title":
            base = base.withColumn(
                "title", F.concat(F.lit("Item "), F.col("sku"))
            )
        else:
            base = base.withColumn(f.name, F.lit(None).cast(f.dataType))
    return base.select(*[f.name for f in CLIENT_PRODUCTS_SCHEMA.fields])


def _client_csv(spark, work: str, name: str, client: int, n_rows: int,
                hot_sku: bool = False) -> str:
    path = os.path.join(work, name)
    sku = (
        F.lit(f"HOT-{client}")
        if hot_sku
        else F.concat(F.lit(f"SKU-{client}-U"), F.col("id").cast("string"))
    )
    (
        spark.range(n_rows)
        .select(
            sku.alias("sku"),
            F.concat(F.lit("Upd "), F.col("id").cast("string")).alias("title"),
            (F.col("id") % 100).cast("string").alias("qty"),
            F.concat(F.lit("$"), (F.col("id") % 997).cast("string")).alias(
                "price"
            ),
            F.lit("1").alias("active"),
        )
        .write.option("header", True)
        .mode("overwrite")
        .csv(path)
    )
    return path


def part_a(spark, work: str) -> list[dict]:
    out = []
    for n_clients in (100, 1000, 10000):
        root = os.path.join(work, f"t{n_clients}")
        table = SnapshotTable(root, CLIENT_PRODUCTS_SCHEMA)
        seed = _seed_rows(spark, n_clients, 30)
        t0 = time.time()
        table.overwrite_partitions(
            seed, list(range(1, n_clients + 1)), props={"max_id": 0}
        )
        seed_s = time.time() - t0

        csv = _client_csv(spark, work, f"upd_{n_clients}.csv", 7, 1000)
        t0 = time.time()
        rep = ingest_data(spark, table, csv, CFG, client_id=7)
        ingest_s = time.time() - t0
        assert rep.success, rep.message

        t0 = time.time()
        rows = list_products(
            table.read(spark, partition_value=7), 7, q="sku-7", limit=50
        ).collect()
        search_s = time.time() - t0

        t0 = time.time()
        m = table.current_manifest()
        manifest_s = time.time() - t0
        mp = os.path.join(root, "_MANIFEST")
        out.append(
            {
                "n_clients": n_clients,
                "seed_s": round(seed_s, 2),
                "ingest_1client_s": round(ingest_s, 2),
                "search_1tenant_s": round(search_s, 2),
                "search_rows": len(rows),
                "manifest_parse_s": round(manifest_s, 4),
                "manifest_bytes": os.path.getsize(mp),
                "tenant7_dirs": len(m.partitions.get("7", [])),
                "total_dirs": len(
                    {d for ds in m.partitions.values() for d in ds}
                ),
            }
        )
    return out


def part_b(spark, work: str, total_rows: int) -> dict:
    def run(name: str, sizes: list[int], hot: bool = False) -> float:
        root = os.path.join(work, f"skew_{name}")
        table = SnapshotTable(root, CLIENT_PRODUCTS_SCHEMA)
        walls = []
        for i, n in enumerate(sizes, start=1):
            csv = _client_csv(
                spark, work, f"{name}_{i}.csv", i, n, hot_sku=hot
            )
            t0 = time.time()
            rep = ingest_data(spark, table, csv, CFG, client_id=i)
            walls.append(time.time() - t0)
            assert rep.success, rep.message
        return sum(walls), max(walls)

    n10 = total_rows // 10
    uni_total, uni_max = run("uniform", [n10] * 10)
    skew_sizes = [int(total_rows * 0.9)] + [total_rows // 90] * 9
    skew_total, skew_max = run("skewed", skew_sizes)
    hot_total, hot_max = run("hotsku", [n10], hot=True)
    flat_total, flat_max = run("flatsku", [n10])
    return {
        "total_rows": total_rows,
        "uniform_total_s": round(uni_total, 2),
        "uniform_max_merge_s": round(uni_max, 2),
        "skewed_total_s": round(skew_total, 2),
        "skewed_max_merge_s": round(skew_max, 2),
        "skew_over_uniform": round(skew_total / uni_total, 3),
        "hot_sku_merge_s": round(hot_total, 2),
        "flat_sku_merge_s": round(flat_total, 2),
        "hot_over_flat": round(hot_total / flat_total, 3),
    }


def _meta_files(root: str) -> dict[str, int]:
    return {
        n: os.path.getsize(os.path.join(root, n))
        for n in os.listdir(root)
        if not os.path.isdir(os.path.join(root, n))
    }


def part_c(spark, work: str) -> list[dict]:
    """Part C — manifest-layout write amplification. A single-tenant
    commit against the single-blob layout rewrites the whole O(clients)
    manifest (twice: version file + pointer); the sharded layout
    rewrites one group file + an O(groups) manifest list. Measured as
    the metadata bytes a one-tenant ingest writes, plus the tenant-
    scoped dir-resolution time (ONE group file vs the whole blob)."""
    out = []
    for n_clients in (1000, 10000, 100000):
        for layout in ("single", "sharded"):
            root = os.path.join(work, f"c_{layout}_{n_clients}")
            table = SnapshotTable(
                root,
                CLIENT_PRODUCTS_SCHEMA,
                manifest_layout=layout,
                manifest_groups=256,
            )
            seed = _seed_rows(spark, n_clients, 5)
            table.overwrite_partitions(
                seed, list(range(1, n_clients + 1)), props={"max_id": 0}
            )
            before = _meta_files(root)
            csv = _client_csv(
                spark, work, f"c_{layout}_{n_clients}.csv", 7, 200
            )
            t0 = time.time()
            rep = ingest_data(spark, table, csv, CFG, client_id=7)
            ingest_s = time.time() - t0
            assert rep.success, rep.message
            after = _meta_files(root)
            meta_bytes = sum(
                sz
                for n, sz in after.items()
                if n not in before or before[n] != sz
            )
            t0 = time.time()
            dirs = table.current_doc().partitions_for("7")
            resolve_s = time.time() - t0
            out.append(
                {
                    "n_clients": n_clients,
                    "layout": layout,
                    "commit_metadata_bytes": meta_bytes,
                    "ingest_1client_s": round(ingest_s, 2),
                    "tenant_resolve_s": round(resolve_s, 5),
                    "tenant_dirs": len(dirs),
                }
            )
            shutil.rmtree(root, ignore_errors=True)
    return out


def part_d(spark, work: str, n_writers: int, rows_each: int) -> dict:
    """Part D — disjoint-tenant concurrent commit throughput (r12
    verdict ask #1). N single-tenant ingests run (a) serially and (b)
    from N concurrent threads against ONE table. With id-block
    reservation + manifest-rebase commits there is no cross-tenant
    serialization left except the manifest encode itself (millis under
    the write lock), so the concurrent wall should approach the longest
    single ingest plus scheduler sharing — not the serial sum. Also
    counts merge recomputes (must be zero for disjoint tenants)."""
    import threading

    from client_data_ingester_spark.ingestion import service as svc

    csvs = {
        cid: _client_csv(
            spark, work, f"d_{cid}.csv", cid, rows_each
        )
        for cid in range(1, n_writers + 1)
    }

    real_merge = svc.merge_products
    counter = {"merges": 0}
    lock = threading.Lock()

    def counting_merge(*a, **kw):
        with lock:
            counter["merges"] += 1
        return real_merge(*a, **kw)

    def run(mode: str) -> tuple[float, int]:
        root = os.path.join(work, f"d_{mode}")
        table = SnapshotTable(root, CLIENT_PRODUCTS_SCHEMA)
        counter["merges"] = 0
        svc.merge_products = counting_merge
        try:
            t0 = time.time()
            if mode == "serial":
                for cid in range(1, n_writers + 1):
                    rep = ingest_data(
                        spark, table, csvs[cid], CFG, client_id=cid
                    )
                    assert rep.success, rep.message
            else:
                reports = {}

                def w(cid):
                    reports[cid] = ingest_data(
                        spark, table, csvs[cid], CFG, client_id=cid
                    )

                ts = [
                    threading.Thread(target=w, args=(cid,))
                    for cid in range(1, n_writers + 1)
                ]
                for th in ts:
                    th.start()
                for th in ts:
                    th.join()
                assert all(r.success for r in reports.values()), {
                    c: r.message
                    for c, r in reports.items()
                    if not r.success
                }
            wall = time.time() - t0
        finally:
            svc.merge_products = real_merge
        assert table.current_manifest().version == n_writers
        n = table.read(spark).count()
        assert n == n_writers * rows_each, n
        return wall, counter["merges"]

    serial_s, serial_merges = run("serial")
    conc_s, conc_merges = run("concurrent")
    return {
        "n_writers": n_writers,
        "rows_each": rows_each,
        "serial_s": round(serial_s, 2),
        "concurrent_s": round(conc_s, 2),
        "speedup": round(serial_s / conc_s, 2),
        "serial_merges": serial_merges,
        "concurrent_merges": conc_merges,
        "recomputes": conc_merges - n_writers,
    }


def part_e(spark, work: str, n_clients: int) -> dict:
    """Part E — reshard() before/after (r12 verdict ask #5): a table
    created with a group count far too small for its tenant cardinality
    (16 groups at 100k tenants → ~6.3k tenants per group file) pays
    O(clients/groups) metadata per one-tenant commit; reshard to the
    recommended √clients count and measure the same commit again."""
    root = os.path.join(work, "reshard")
    table = SnapshotTable(
        root, CLIENT_PRODUCTS_SCHEMA,
        manifest_layout="sharded", manifest_groups=16,
    )
    seed = _seed_rows(spark, n_clients, 5)
    table.overwrite_partitions(
        seed, list(range(1, n_clients + 1)), props={"max_id": 0}
    )

    def one_commit() -> tuple[int, float, float]:
        before = _meta_files(root)
        csv = _client_csv(spark, work, "e.csv", 7, 200)
        t0 = time.time()
        rep = ingest_data(spark, table, csv, CFG, client_id=7)
        ingest_s = time.time() - t0
        assert rep.success, rep.message
        after = _meta_files(root)
        meta = sum(
            sz for n, sz in after.items()
            if n not in before or before[n] != sz
        )
        t0 = time.time()
        table.current_doc().partitions_for("7")
        return meta, ingest_s, time.time() - t0

    meta16, ingest16, resolve16 = one_commit()
    rec = SnapshotTable.recommended_manifest_groups(n_clients)
    t0 = time.time()
    table.reshard(rec)
    reshard_s = time.time() - t0
    meta_rec, ingest_rec, resolve_rec = one_commit()
    assert table.current_doc().n_groups == rec
    return {
        "n_clients": n_clients,
        "groups_before": 16,
        "groups_after": rec,
        "reshard_s": round(reshard_s, 2),
        "commit_metadata_bytes_before": meta16,
        "commit_metadata_bytes_after": meta_rec,
        "metadata_ratio": round(meta16 / max(1, meta_rec), 1),
        "ingest_s_before": round(ingest16, 2),
        "ingest_s_after": round(ingest_rec, 2),
        "tenant_resolve_s_before": round(resolve16, 5),
        "tenant_resolve_s_after": round(resolve_rec, 5),
    }


def part_f(spark, work: str, n_writers: int, rows_each: int) -> dict:
    """Part F — SAME-tenant contention (r13 verdict ask #4). N threads
    ingest disjoint sku files into ONE tenant: the rebase path can't help
    (every loser must re-merge against the winner's head), so this
    measures the optimistic-concurrency worst case — completion wall,
    per-writer attempt counts, and total merge recomputes vs N — under
    the round-14 policy (12-attempt budget + decorrelated-jitter
    backoff). Expectation: all N land (liveness), recomputes ≈
    N·(N-1)/2 worst-case bound but measured well below it (the backoff
    spreads losers across winners' commit windows), wall ≈ serial sum
    (same-partition work is inherently serialized by correctness — the
    win is liveness + no thundering-herd waste, not speedup)."""
    import threading

    from client_data_ingester_spark.ingestion import service as svc

    # distinct sku namespaces per writer (client arg of _client_csv is
    # baked into the skus) — every row must survive the same-tenant fold
    csvs = {
        w: _client_csv(spark, work, f"f_{w}.csv", w, rows_each)
        for w in range(1, n_writers + 1)
    }
    real_merge = svc.merge_products
    lock = threading.Lock()
    merge_counts: dict[int, int] = {}
    tags = threading.local()

    def counting_merge(*a, **kw):
        with lock:
            merge_counts[tags.w] = merge_counts.get(tags.w, 0) + 1
        return real_merge(*a, **kw)

    def run(mode: str) -> tuple[float, list[float], dict[int, int]]:
        root = os.path.join(work, f"f_{mode}")
        table = SnapshotTable(root, CLIENT_PRODUCTS_SCHEMA)
        merge_counts.clear()
        svc.merge_products = counting_merge
        walls: dict[int, float] = {}
        try:
            t0 = time.time()
            if mode == "serial":
                for w in range(1, n_writers + 1):
                    tags.w = w
                    s = time.time()
                    rep = ingest_data(
                        spark, table, csvs[w], CFG, client_id=1
                    )
                    walls[w] = time.time() - s
                    assert rep.success, rep.message
            else:
                reports = {}

                def worker(w):
                    tags.w = w
                    s = time.time()
                    reports[w] = ingest_data(
                        spark, table, csvs[w], CFG, client_id=1
                    )
                    walls[w] = time.time() - s

                ts = [
                    threading.Thread(target=worker, args=(w,))
                    for w in range(1, n_writers + 1)
                ]
                for th in ts:
                    th.start()
                for th in ts:
                    th.join()
                assert all(r.success for r in reports.values()), {
                    w: r.message
                    for w, r in reports.items()
                    if not r.success
                }
            wall = time.time() - t0
        finally:
            svc.merge_products = real_merge
        n = table.read(spark, partition_value=1).count()
        assert n == n_writers * rows_each, n
        return wall, sorted(walls.values()), dict(merge_counts)

    serial_wall, _, serial_counts = run("serial")
    conc_wall, conc_writer_walls, conc_counts = run("concurrent")
    recomputes = sum(conc_counts.values()) - n_writers
    return {
        "n_writers": n_writers,
        "rows_each": rows_each,
        "serial_s": round(serial_wall, 2),
        "concurrent_s": round(conc_wall, 2),
        "serial_merges": sum(serial_counts.values()),
        "concurrent_merges": sum(conc_counts.values()),
        "recomputes": recomputes,
        "worst_case_recompute_bound": n_writers * (n_writers - 1) // 2,
        "attempts_max": max(conc_counts.values()),
        "attempts_budget": svc._MERGE_MAX_ATTEMPTS,
        "writer_wall_p50_s": round(
            conc_writer_walls[len(conc_writer_walls) // 2], 2
        ),
        "writer_wall_max_s": round(conc_writer_walls[-1], 2),
    }


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    total_rows = int(os.environ.get("SPARK_GRAFT_SKEW_ROWS", "3000000"))
    parts = os.environ.get("SPARK_GRAFT_TENANT_PARTS", "abc")
    spark = get_spark("bench-tenants", cpus=cpus)
    work = tempfile.mkdtemp(prefix="bench_tenants_")
    result = {}
    try:
        if "a" in parts:
            result["tenant_cardinality"] = part_a(spark, work)
        if "b" in parts:
            result["tenant_skew"] = part_b(spark, work, total_rows)
        if "c" in parts:
            result["manifest_layouts"] = part_c(spark, work)
        if "d" in parts:
            result["concurrent_writers"] = part_d(
                spark,
                work,
                int(os.environ.get("SPARK_GRAFT_WRITERS", "8")),
                int(os.environ.get("SPARK_GRAFT_WRITER_ROWS", "50000")),
            )
        if "e" in parts:
            result["reshard"] = part_e(
                spark,
                work,
                int(os.environ.get("SPARK_GRAFT_RESHARD_CLIENTS", "100000")),
            )
        if "f" in parts:
            result["same_tenant_contention"] = part_f(
                spark,
                work,
                int(os.environ.get("SPARK_GRAFT_WRITERS", "8")),
                int(os.environ.get("SPARK_GRAFT_WRITER_ROWS", "50000")),
            )
    finally:
        shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
