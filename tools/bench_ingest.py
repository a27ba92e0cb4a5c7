"""Ingest-throughput benchmark: the engine's core scale claim is that a file
of ANY size costs a constant number of Spark jobs (validate + merge + write),
vs the reference's one SELECT + one UPDATE/INSERT per row.

Builds a products CSV from the sf dir's lineitem table (one row per
(l_orderkey, l_linenumber), ~600k rows at sf0.1), ingests it through the
full pipeline (bytes path would be driver-bound; this uses the distributed
path source), then re-ingests a 10% update file to measure merge cost
against an existing snapshot. Prints one JSON line.

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/bench_ingest.py
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

from client_data_ingester_spark.ingestion import ParserConfig, ingest_data  # noqa: E402
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


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("bench-ingest", cpus=cpus)
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")

    work = tempfile.mkdtemp(prefix="bench_ingest_")
    try:
        _run(spark, li, work, sf_dir)
    finally:
        # two lineitem-sized CSV copies + a snapshot table per run would
        # otherwise accumulate in /tmp until Spark scratch writes fail
        shutil.rmtree(work, ignore_errors=True)


def _run(spark, li, work: str, sf_dir: str) -> None:
    table = SnapshotTable(os.path.join(work, "products"), CLIENT_PRODUCTS_SCHEMA)

    src = li.select(
        F.concat(
            F.lit("L"),
            F.col("l_orderkey").cast("string"),
            F.lit("-"),
            F.col("l_linenumber").cast("string"),
        ).alias("sku"),
        F.concat(F.lit("Item "), F.col("l_partkey").cast("string")).alias("title"),
        F.col("l_quantity").cast("int").cast("string").alias("qty"),
        F.concat(F.lit("$"), F.col("l_extendedprice").cast("string")).alias(
            "price"
        ),
        F.when(F.col("l_returnflag") == "R", "0").otherwise("1").alias("active"),
    )
    n_rows = src.count()
    full_csv = os.path.join(work, "full_csv")
    src.write.option("header", True).mode("overwrite").csv(full_csv)
    upd_csv = os.path.join(work, "upd_csv")
    src.sample(0.1, seed=42).withColumn(
        "title", F.concat(F.col("title"), F.lit(" v2"))
    ).write.option("header", True).mode("overwrite").csv(upd_csv)

    t0 = time.time()
    rep = ingest_data(spark, table, full_csv, CFG, client_id=1)
    t_initial = time.time() - t0
    assert rep.success, rep.message
    assert rep.processed_items == n_rows, (rep.processed_items, n_rows)

    t0 = time.time()
    rep2 = ingest_data(spark, table, upd_csv, CFG, client_id=1, full_update=True)
    t_update = time.time() - t0
    assert rep2.success, rep2.message

    print(
        json.dumps(
            {
                "metric": "ingest_throughput",
                "unit": "rows/sec",
                "value": round(n_rows / t_initial, 1),
                "rows": n_rows,
                "initial_ingest_sec": round(t_initial, 2),
                "full_update_10pct_sec": round(t_update, 2),
                "update_processed": rep2.processed_items,
                "update_deactivated": rep2.stats.get("deactivated_count"),
                "sf_dir": sf_dir,
            }
        )
    )


if __name__ == "__main__":
    main()
