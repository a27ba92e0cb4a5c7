"""Streaming ingest: landing-dir CSV files merged per micro-batch via the
same merge as the batch path (SURVEY §2.9 / Phase 4)."""

import os

from pyspark.sql import functions as F

from client_data_ingester_spark.ingestion.mapping import ParserConfig
from client_data_ingester_spark.streaming import start_ingest_stream

CFG = ParserConfig(
    "csv",
    {
        "sku": ("sku", "text"),
        "title": ("title", "text"),
        "active": ("active", "boolean"),
    },
)


def test_stream_merges_files_and_upserts(spark, products_table, tmp_path):
    landing = tmp_path / "landing"
    landing.mkdir()
    ckpt = str(tmp_path / "ckpt")
    (landing / "f1.csv").write_text("sku,title,active\nS1,First,1\nS2,Second,1\n")

    q = start_ingest_stream(
        spark,
        products_table,
        str(landing),
        ckpt,
        CFG,
        client_id=1,
        source_columns=["sku", "title", "active"],
    )
    q.awaitTermination(120)
    got = {
        r["sku"]: r.asDict()
        for r in products_table.read(spark, 1).collect()
    }
    assert set(got) == {"S1", "S2"}

    # second file updates S1 and inserts S3; availableNow re-run picks it up
    (landing / "f2.csv").write_text("sku,title,active\nS1,Updated,0\nS3,Third,1\n")
    q2 = start_ingest_stream(
        spark,
        products_table,
        str(landing),
        ckpt,
        CFG,
        client_id=1,
        source_columns=["sku", "title", "active"],
    )
    q2.awaitTermination(120)
    got = {
        r["sku"]: r.asDict()
        for r in products_table.read(spark, 1).collect()
    }
    assert set(got) == {"S1", "S2", "S3"}
    assert got["S1"]["title"] == "Updated"
    assert got["S1"]["active"] is False
    assert got["S2"]["title"] == "Second"  # untouched by second batch
