"""Streaming exact-dedup: first arrival of each normalized text survives,
copies inside the watermark horizon are dropped — including copies that
arrive in LATER micro-batches (state-backed, not per-batch distinct)."""

import json

from client_data_ingester_spark.streaming.dedup_stream import (
    start_dedup_stream,
)


def _write_docs(path, docs):
    with open(path, "w") as f:
        for d in docs:
            f.write(json.dumps(d) + "\n")


def test_stream_drops_duplicates_across_microbatches(spark, tmp_path):
    src = tmp_path / "docs"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    ts = "2024-01-01T10:{:02d}:00.000Z"
    _write_docs(
        src / "b1.json",
        [
            {"doc_id": 1, "ts": ts.format(0), "text": "alpha beta gamma"},
            # same text, whitespace/case variant → same normalized digest
            {"doc_id": 2, "ts": ts.format(1), "text": "  Alpha  BETA gamma "},
            {"doc_id": 3, "ts": ts.format(2), "text": "wholly different"},
        ],
    )
    q = start_dedup_stream(spark, str(src), ckpt, query_name="dd")
    try:
        q.processAllAvailable()
        first = {
            r["doc_id"]: r["text_hash"]
            for r in spark.sql("select * from dd").collect()
        }
        assert set(first) == {1, 3}  # doc 2 deduped within the batch

        # a copy arriving in a LATER micro-batch (inside the watermark
        # horizon) is dropped by state, and a new text passes
        _write_docs(
            src / "b2.json",
            [
                {"doc_id": 4, "ts": ts.format(3), "text": "alpha beta gamma"},
                {"doc_id": 5, "ts": ts.format(4), "text": "brand new text"},
            ],
        )
        q.processAllAvailable()
        ids = {r["doc_id"] for r in spark.sql("select * from dd").collect()}
        assert ids == {1, 3, 5}
    finally:
        q.stop()
