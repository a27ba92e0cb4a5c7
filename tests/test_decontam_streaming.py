"""Streaming decontamination: the live stream routed through the
persisted eval bloom — clean docs proven clean, contaminated docs
quarantined, exactly-once across replays."""

import json

from client_data_ingester_spark.operators.sketch import bloom_registers
from client_data_ingester_spark.operators.dedup import exploded_shingles
from client_data_ingester_spark.streaming.decontam_stream import (
    start_decontam_stream,
)


def _write_docs(path, docs):
    with open(path, "w") as f:
        for d in docs:
            f.write(json.dumps(d) + "\n")


EVAL_TEXT = "the forbidden benchmark passage that must never leak"


def _eval_bits(spark):
    eval_docs = spark.createDataFrame(
        [(100, EVAL_TEXT)], "doc_id long, text string"
    )
    sh = exploded_shingles(eval_docs, "text", 3).select("sh")
    return bloom_registers(sh, "sh")


def test_stream_routes_contaminated_to_quarantine(spark, tmp_path):
    src = tmp_path / "docs"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    clean = str(tmp_path / "clean")
    quar = str(tmp_path / "quarantine")
    ts = "2024-01-01T10:{:02d}:00.000Z"
    _write_docs(
        src / "b1.json",
        [
            {"doc_id": 1, "ts": ts.format(0), "text": "an innocent document about gardening tips"},
            {"doc_id": 2, "ts": ts.format(1), "text": "prefix words then " + EVAL_TEXT + " then suffix"},
        ],
    )
    q = start_decontam_stream(
        spark, str(src), ckpt, clean, quar, _eval_bits(spark), query_name="dc"
    )
    try:
        q.processAllAvailable()
        # second micro-batch arrives later
        _write_docs(
            src / "b2.json",
            [
                {"doc_id": 3, "ts": ts.format(5), "text": EVAL_TEXT},
                {"doc_id": 4, "ts": ts.format(6), "text": "more unrelated prose entirely separate"},
            ],
        )
        q.processAllAvailable()
    finally:
        q.stop()

    clean_ids = sorted(
        r["doc_id"] for r in spark.read.parquet(clean).collect()
    )
    quar_rows = {
        r["doc_id"]: r for r in spark.read.parquet(quar).collect()
    }
    assert clean_ids == [1, 4]
    assert sorted(quar_rows) == [2, 3]
    assert all(r["flagged"] for r in quar_rows.values())
    assert all(r["n_bloom_hits"] > 0 for r in quar_rows.values())


def test_stream_replay_is_idempotent(spark, tmp_path):
    """Restarting from the same checkpoint after the sink wrote must not
    duplicate routed rows: the replayed batch overwrites its own dir."""
    src = tmp_path / "docs"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    clean = str(tmp_path / "clean")
    quar = str(tmp_path / "quarantine")
    ts = "2024-01-01T10:00:00.000Z"
    _write_docs(
        src / "b1.json",
        [{"doc_id": 1, "ts": ts, "text": "plain words only here today"}],
    )
    bits = _eval_bits(spark)
    q = start_decontam_stream(
        spark, str(src), ckpt, clean, quar, bits, query_name="dc2"
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    first = spark.read.parquet(clean).count()

    # restart from the same checkpoint: no new input -> no new rows
    q2 = start_decontam_stream(
        spark, str(src), ckpt, clean, quar, bits, query_name="dc2b"
    )
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    assert spark.read.parquet(clean).count() == first == 1


def test_all_clean_stream_quarantine_readable(spark, tmp_path):
    """A stream that never flags a document leaves only empty batch dirs
    in quarantine — schema inference would fail there; read_routed's
    explicit schema must return an empty, well-typed frame."""
    from client_data_ingester_spark.streaming.decontam_stream import (
        ROUTED_SCHEMA,
        read_routed,
    )

    src = tmp_path / "docs"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    clean = str(tmp_path / "clean")
    quar = str(tmp_path / "quarantine")
    _write_docs(
        src / "b1.json",
        [{"doc_id": 1, "ts": "2024-01-01T10:00:00.000Z",
          "text": "plain words only here today"}],
    )
    q = start_decontam_stream(
        spark, str(src), ckpt, clean, quar, _eval_bits(spark),
        query_name="dc3",
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    quarantined = read_routed(spark, quar)
    assert quarantined.count() == 0
    assert [f.name for f in quarantined.schema.fields] == [
        f.name for f in ROUTED_SCHEMA.fields
    ]
    assert read_routed(spark, clean).count() == 1


def test_stream_probe_honors_custom_bloom_geometry(spark, tmp_path):
    """A bloom built with non-default geometry must be probed with the
    SAME m_bits/k (regression: the stream probed with defaults, so bit
    positions computed mod 2^16 missed registers set mod 2^20 and
    contaminated docs were routed to clean_dir as 'proven clean')."""
    src = tmp_path / "docs"
    src.mkdir()
    eval_docs = spark.createDataFrame(
        [(100, EVAL_TEXT)], "doc_id long, text string"
    )
    sh = exploded_shingles(eval_docs, "text", 3).select("sh")
    big_bits = bloom_registers(sh, "sh", m_bits=1 << 20)
    _write_docs(
        src / "b1.json",
        [
            {
                "doc_id": 1,
                "ts": "2024-01-01T10:00:00.000Z",
                "text": EVAL_TEXT,
            },
            {
                "doc_id": 2,
                "ts": "2024-01-01T10:01:00.000Z",
                "text": "an innocent document about gardening tips",
            },
        ],
    )
    clean = str(tmp_path / "clean")
    quar = str(tmp_path / "quarantine")
    q = start_decontam_stream(
        spark,
        str(src),
        str(tmp_path / "ckpt"),
        clean,
        quar,
        big_bits,
        m_bits=1 << 20,
        query_name="dc_geo",
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert sorted(
        r["doc_id"] for r in spark.read.parquet(quar).collect()
    ) == [1]
    assert sorted(
        r["doc_id"] for r in spark.read.parquet(clean).collect()
    ) == [2]
