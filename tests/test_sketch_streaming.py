"""Streaming HLL register maintenance ([EXT], streaming/sketch_stream.py):
the live estimate must equal a batch build over the union of everything
streamed — across micro-batches, restarts, and compaction."""

import json

from pyspark.sql import functions as F

from client_data_ingester_spark.operators.sketch import hll_distinct
from client_data_ingester_spark.streaming.sketch_stream import (
    compact_registers,
    read_hll_estimate,
    start_hll_register_stream,
)


def _write_events(path, events):
    with open(path, "w") as f:
        for e in events:
            f.write(json.dumps(e) + "\n")


def _events(id0, users, etype="click"):
    ts = "2024-01-01T10:{:02d}:00.000Z"
    return [
        {
            "event_id": id0 + i,
            "ts": ts.format(i % 60),
            "user_id": u,
            "event_type": etype,
        }
        for i, u in enumerate(users)
    ]


def test_streaming_estimate_matches_batch_across_restart(spark, tmp_path):
    src = tmp_path / "events"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    regs = str(tmp_path / "regs")

    batch1 = _events(0, [1, 2, 3, 4, 5, 2, 3])
    _write_events(src / "b1.json", batch1)
    q = start_hll_register_stream(spark, str(src), ckpt, regs)
    try:
        q.processAllAvailable()
        batch2 = _events(100, [4, 5, 6, 7, 8, 9])
        _write_events(src / "b2.json", batch2)
        q.processAllAvailable()
    finally:
        q.stop()

    def batch_build(events):
        df = spark.createDataFrame(
            [(e["user_id"],) for e in events], "user_id long"
        )
        return hll_distinct(df, "user_id").collect()[0]

    live = read_hll_estimate(spark, regs).collect()[0]
    ref = batch_build(batch1 + batch2)
    assert (live["s_int"], live["est_distinct"]) == (
        ref["s_int"],
        ref["est_distinct"],
    )
    # 9 distinct users; m=64 keeps a tiny set in linear-counting territory
    assert abs(live["est_distinct"] - 9) <= 2

    # restart from the checkpoint: only the NEW file is processed, its
    # shard lands next to the old ones, and the merged estimate advances
    batch3 = _events(200, [10, 11, 12, 1, 2])
    _write_events(src / "b3.json", batch3)
    q2 = start_hll_register_stream(spark, str(src), ckpt, regs)
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    live2 = read_hll_estimate(spark, regs).collect()[0]
    ref2 = batch_build(batch1 + batch2 + batch3)
    assert (live2["s_int"], live2["est_distinct"]) == (
        ref2["s_int"],
        ref2["est_distinct"],
    )

    # compaction preserves the estimate exactly
    compact_registers(spark, regs, str(tmp_path / "regs_c"))
    compacted = read_hll_estimate(spark, str(tmp_path / "regs_c")).collect()[0]
    assert (compacted["s_int"], compacted["est_distinct"]) == (
        ref2["s_int"],
        ref2["est_distinct"],
    )


def test_streaming_grouped_registers(spark, tmp_path):
    src = tmp_path / "events"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    regs = str(tmp_path / "regs")
    _write_events(
        src / "b1.json",
        _events(0, [1, 2, 3], "click") + _events(50, [1, 2], "view"),
    )
    q = start_hll_register_stream(
        spark, str(src), ckpt, regs, group_cols=["event_type"]
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = {
        r["event_type"]: r["est_distinct"]
        for r in read_hll_estimate(
            spark, regs, group_cols=["event_type"]
        ).collect()
    }
    assert set(rows) == {"click", "view"}
    assert abs(rows["click"] - 3) <= 1
    assert abs(rows["view"] - 2) <= 1


def test_streaming_cms_matches_batch_counts(spark, tmp_path):
    """SUM-merged micro-batch counter shards estimate exactly like a batch
    CMS over the union — and est >= exact stays one-sided throughout."""
    from client_data_ingester_spark.operators.sketch import (
        cms_estimate,
        cms_registers,
    )
    from client_data_ingester_spark.streaming.sketch_stream import (
        read_cms_estimate,
        start_cms_register_stream,
    )

    src = tmp_path / "events"
    src.mkdir()
    users1 = [1, 1, 1, 2, 3]
    users2 = [1, 2, 2, 4]
    _write_events(src / "b1.json", _events(0, users1))
    q = start_cms_register_stream(
        spark, str(src), str(tmp_path / "ckpt"), str(tmp_path / "regs")
    )
    try:
        q.processAllAvailable()
        _write_events(src / "b2.json", _events(100, users2))
        q.processAllAvailable()
    finally:
        q.stop()

    all_users = users1 + users2
    union_df = spark.createDataFrame(
        [(u,) for u in all_users], "user_id long"
    )
    probes = union_df.select("user_id").distinct()
    live = {
        r["user_id"]: r["est_count"]
        for r in read_cms_estimate(
            spark, str(tmp_path / "regs"), probes, "user_id"
        ).collect()
    }
    batch = {
        r["user_id"]: r["est_count"]
        for r in cms_estimate(
            cms_registers(union_df, "user_id"), probes, "user_id"
        ).collect()
    }
    assert live == batch
    from collections import Counter

    exact = Counter(all_users)
    assert all(live[u] >= exact[u] for u in exact)


def test_readers_before_first_commit_return_empty_not_path_error(
    spark, tmp_path
):
    """A poller racing the stream's first micro-batch sees 'nothing
    streamed yet' — an empty typed relation / zero estimates — instead of
    PATH_NOT_FOUND (the guarded-reader contract the sibling modules
    pq_stream.read_codes and cluster_stream.merged_band_index already
    keep)."""
    from client_data_ingester_spark.streaming.sketch_stream import (
        merged_registers,
        read_cms_estimate,
        read_hll_estimate,
    )

    regs = str(tmp_path / "never_written")
    assert merged_registers(spark, regs).count() == 0
    assert merged_registers(spark, regs, ["event_type"]).columns == [
        "event_type",
        "bucket",
        "r",
    ]
    est = read_hll_estimate(spark, regs).collect()
    assert len(est) <= 1  # global estimate over zero registers
    probes = spark.createDataFrame([(1,), (2,)], "user_id bigint")
    cms = read_cms_estimate(spark, regs, probes, "user_id").collect()
    assert all((r["est_count"] or 0) == 0 for r in cms)


def test_streaming_reservoir_matches_batch_and_serves_kmv(spark, tmp_path):
    """The streamed bottom-k sample over two micro-batches (+ a restart)
    must equal the batch reservoir over the union of all streamed users,
    row-for-row, and the KMV estimate must serve off the same shards;
    before the first commit both readers return empty, not PATH errors."""
    from client_data_ingester_spark.operators.sketch import (
        kmv_distinct_from_registers,
        reservoir_registers,
    )
    from client_data_ingester_spark.streaming.sketch_stream import (
        read_kmv_estimate,
        read_reservoir_sample,
        start_reservoir_register_stream,
    )

    src = tmp_path / "events"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    regs = str(tmp_path / "regs")

    # poller contract before any stream exists: empty sample; the
    # ungrouped estimate is the one-row "0 distinct" global aggregate
    assert read_reservoir_sample(spark, regs, k=8).count() == 0
    empty_est = read_kmv_estimate(spark, regs, k=8).first()
    assert (empty_est["n_kept"], empty_est["est_distinct"]) == (0, 0.0)

    users1 = list(range(0, 40)) + [3, 7]  # dups collapse
    users2 = list(range(30, 90))
    _write_events(src / "b1.json", _events(0, users1))
    q = start_reservoir_register_stream(spark, str(src), ckpt, regs, k=8)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # restart the stream for the second batch (checkpoint resume)
    _write_events(src / "b2.json", _events(1000, users2))
    q = start_reservoir_register_stream(spark, str(src), ckpt, regs, k=8)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    streamed = sorted(
        (r["pos"], r["v"], r["hk"])
        for r in read_reservoir_sample(spark, regs, k=8).collect()
    )
    union = spark.createDataFrame(
        [(u,) for u in users1 + users2], "user_id long"
    )
    batch = sorted(
        (r["pos"], r["v"], r["hk"])
        for r in reservoir_registers(union, "user_id", k=8).collect()
    )
    assert streamed == batch and len(streamed) == 8
    est_stream = read_kmv_estimate(spark, regs, k=8).first()
    est_batch = kmv_distinct_from_registers(
        reservoir_registers(union, "user_id", k=8), k=8
    ).first()
    assert est_stream.asDict() == est_batch.asDict()
