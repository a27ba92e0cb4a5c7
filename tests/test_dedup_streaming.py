"""Streaming exact-dedup: first arrival of each normalized text survives,
copies inside the watermark horizon are dropped — including copies that
arrive in LATER micro-batches (state-backed, not per-batch distinct)."""

import json

from client_data_ingester_spark.streaming.dedup_stream import (
    start_dedup_stream,
    start_dedup_stream_to_parquet,
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


def test_parquet_sink_survives_restart_first_seen_only(spark, tmp_path):
    """Production sink + checkpoint restart: dedup state is recovered from
    the checkpoint, so a duplicate of a PRE-restart document arriving AFTER
    the restart is still dropped, and the parquet output holds exactly the
    first-seen rows across both incarnations of the query."""
    src = tmp_path / "docs"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    ts = "2024-01-01T10:{:02d}:00.000Z"

    _write_docs(
        src / "b1.json",
        [
            {"doc_id": 1, "ts": ts.format(0), "text": "alpha beta gamma"},
            {"doc_id": 2, "ts": ts.format(1), "text": " Alpha  beta GAMMA "},
            {"doc_id": 3, "ts": ts.format(2), "text": "wholly different"},
        ],
    )
    q = start_dedup_stream_to_parquet(spark, str(src), ckpt, out)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert got == {1, 3}

    # restart from the same checkpoint; the new batch carries a duplicate
    # of a pre-restart doc (must be dropped by RECOVERED state) and a new
    # doc (must pass)
    _write_docs(
        src / "b2.json",
        [
            {"doc_id": 4, "ts": ts.format(3), "text": "alpha beta gamma"},
            {"doc_id": 5, "ts": ts.format(4), "text": "brand new text"},
        ],
    )
    q2 = start_dedup_stream_to_parquet(spark, str(src), ckpt, out)
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()

    rows = spark.read.parquet(out).collect()
    ids = sorted(r["doc_id"] for r in rows)
    assert ids == [1, 3, 5]
    # exactly-once shape: each surviving row appears exactly once, and the
    # restarted query appended via new batch dirs rather than rewriting old
    hashes = [r["text_hash"] for r in rows]
    assert len(hashes) == len(set(hashes))


def test_cluster_stream_equals_batch_recompute(spark, tmp_path):
    """Streaming cluster maintenance is EXACT: after three micro-batches
    with duplicates chaining within and ACROSS batches, merged_clusters
    over the streamed edge shards equals duplicate_clusters over a full
    batch re-run (same LSH params) — batch-3 documents join clusters
    first formed in batches 1 and 2 through cross-batch edges alone.
    The refreshed artifact loads back identically."""
    from client_data_ingester_spark.operators.dedup import (
        duplicate_clusters,
        load_cluster_index,
        lsh_candidate_pairs,
    )
    from client_data_ingester_spark.streaming.cluster_stream import (
        merged_clusters,
        refresh_cluster_index,
        start_cluster_edge_stream,
    )

    src = tmp_path / "docs"
    src.mkdir()
    state = str(tmp_path / "state")
    ts = "2024-01-01T10:00:00.000Z"
    # empty state reads as empty labeling, not a path error
    assert merged_clusters(spark, state).count() == 0

    base_a = "the quick brown fox jumps over the lazy dog again and again"
    base_b = "entirely different words about streaming cluster maintenance"
    batches = [
        [  # batch 1: near-dup pair (1, 2) + singleton 3
            {"doc_id": 1, "ts": ts, "text": base_a},
            {"doc_id": 2, "ts": ts, "text": base_a + " tail"},
            {"doc_id": 3, "ts": ts, "text": "unique text one " + base_b[:20]},
        ],
        [  # batch 2: 4 duplicates doc 1 ACROSS batches; (5, 6) new pair
            {"doc_id": 4, "ts": ts, "text": base_a},
            {"doc_id": 5, "ts": ts, "text": base_b},
            {"doc_id": 6, "ts": ts, "text": base_b + " tail"},
        ],
        [  # batch 3: 7 joins batch-1's cluster, 8 joins batch-2's
            {"doc_id": 7, "ts": ts, "text": base_a},
            {"doc_id": 8, "ts": ts, "text": base_b},
        ],
    ]
    q = start_cluster_edge_stream(
        spark,
        str(src),
        str(tmp_path / "ckpt"),
        state,
        reader_options={"maxFilesPerTrigger": 1},
    )
    try:
        for i, docs in enumerate(batches):
            _write_docs(src / f"b{i}.json", docs)
        q.processAllAvailable()
    finally:
        q.stop()

    streamed = {
        (r["doc_id"], r["cluster_id"])
        for r in merged_clusters(spark, state).collect()
    }
    all_docs = spark.createDataFrame(
        [(d["doc_id"], d["text"]) for b in batches for d in b],
        "doc_id long, text string",
    )
    batch = {
        (r["doc_id"], r["cluster_id"])
        for r in duplicate_clusters(
            lsh_candidate_pairs(all_docs, num_perm=4, bands=2)
        ).collect()
    }
    assert streamed == batch
    # docs sharing base_a text all landed in doc 1's cluster
    labels = dict(streamed)
    assert labels[2] == labels[4] == labels[7] == 1
    # the artifact refresh round-trips
    path = str(tmp_path / "cluster_idx")
    refresh_cluster_index(spark, state, path)
    assert {
        (r["doc_id"], r["cluster_id"])
        for r in load_cluster_index(spark, path).collect()
    } == streamed


def test_warm_refresh_equals_cold_rebuild_across_merges(spark, tmp_path):
    """The warm-started refresh (fold only edge shards above the
    watermark into the previous labeling) must equal the cold rebuild
    even when the delta MERGES clusters first formed before the previous
    refresh — and a refresh with nothing new must be a no-op."""
    import os as _os

    from client_data_ingester_spark.operators.dedup import (
        duplicate_clusters,
        load_cluster_index,
        lsh_candidate_pairs,
    )
    from client_data_ingester_spark.streaming.cluster_stream import (
        _read_watermark,
        refresh_cluster_index,
        start_cluster_edge_stream,
    )

    src = tmp_path / "docs"
    src.mkdir()
    state = str(tmp_path / "state")
    path = str(tmp_path / "cluster_idx")
    ts = "2024-01-01T10:00:00.000Z"
    base_a = "the quick brown fox jumps over the lazy dog again and again"
    base_b = "entirely different words about streaming cluster maintenance"

    def run_stream(files):
        q = start_cluster_edge_stream(
            spark,
            str(src),
            str(tmp_path / "ckpt"),
            state,
            reader_options={"maxFilesPerTrigger": 1},
        )
        try:
            for name, docs in files:
                _write_docs(src / name, docs)
            q.processAllAvailable()
        finally:
            q.stop()

    # phase 1: two disjoint clusters (1,2) on base_a and (5,6) on base_b
    run_stream(
        [
            (
                "b0.json",
                [
                    {"doc_id": 1, "ts": ts, "text": base_a},
                    {"doc_id": 2, "ts": ts, "text": base_a + " tail"},
                ],
            ),
            (
                "b1.json",
                [
                    {"doc_id": 5, "ts": ts, "text": base_b},
                    {"doc_id": 6, "ts": ts, "text": base_b + " tail"},
                ],
            ),
        ]
    )
    refresh_cluster_index(spark, state, path)  # cold build + watermark
    wm1 = _read_watermark(path)
    assert wm1 is not None
    labels1 = {
        (r["doc_id"], r["cluster_id"])
        for r in load_cluster_index(spark, path).collect()
    }
    assert dict(labels1)[2] == 1 and dict(labels1)[6] == 5

    # no-op refresh: watermark current, artifact untouched
    mtimes = {
        f: _os.path.getmtime(_os.path.join(path, f))
        for f in _os.listdir(path)
        if f.endswith(".parquet")
    }
    refresh_cluster_index(spark, state, path)
    assert _read_watermark(path) == wm1
    for f, m in mtimes.items():
        assert _os.path.getmtime(_os.path.join(path, f)) == m

    # phase 2: doc 7 duplicates base_a (joins cluster 1), doc 8 duplicates
    # base_b (joins cluster 5) — cross-refresh merges through new edges only
    run_stream(
        [
            (
                "b2.json",
                [
                    {"doc_id": 7, "ts": ts, "text": base_a},
                    {"doc_id": 8, "ts": ts, "text": base_b},
                ],
            )
        ]
    )
    refresh_cluster_index(spark, state, path)  # WARM path
    assert _read_watermark(path) > wm1
    warm = {
        (r["doc_id"], r["cluster_id"])
        for r in load_cluster_index(spark, path).collect()
    }
    all_docs = spark.createDataFrame(
        [
            (1, base_a),
            (2, base_a + " tail"),
            (5, base_b),
            (6, base_b + " tail"),
            (7, base_a),
            (8, base_b),
        ],
        "doc_id long, text string",
    )
    cold = {
        (r["doc_id"], r["cluster_id"])
        for r in duplicate_clusters(
            lsh_candidate_pairs(all_docs, num_perm=4, bands=2)
        ).collect()
    }
    assert warm == cold
    assert dict(warm)[7] == 1 and dict(warm)[8] == 5
