"""Watermarked event-time windows over a streaming source: late data beyond
the watermark is dropped; windows emit once the watermark passes them
(append mode). One long-lived query driven by processAllAvailable()."""

import json

from pyspark.sql import functions as F

from client_data_ingester_spark.streaming.events_stream import (
    start_windowed_event_stream,
)


def _write_events(path, events):
    with open(path, "w") as f:
        for e in events:
            f.write(json.dumps(e) + "\n")


def test_windowed_counts_and_late_data(spark, tmp_path):
    src = tmp_path / "events"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    base = "2024-01-01T{}:00:00.000Z"
    _write_events(
        src / "batch1.json",
        [
            {"event_id": 1, "ts": base.format("10"), "user_id": 1,
             "event_type": "click", "value": 1.0, "props": "{}"},
            {"event_id": 2, "ts": base.format("10"), "user_id": 2,
             "event_type": "click", "value": 2.0, "props": "{}"},
            {"event_id": 3, "ts": base.format("11"), "user_id": 1,
             "event_type": "view", "value": 3.0, "props": "{}"},
            # watermark driver: far-future event closes the 10/11:00 windows
            {"event_id": 4, "ts": base.format("15"), "user_id": 1,
             "event_type": "view", "value": 4.0, "props": "{}"},
        ],
    )
    q = start_windowed_event_stream(spark, str(src), ckpt, query_name="we")
    try:
        q.processAllAvailable()
        rows = {
            (r["window_start"].hour, r["event_type"]): r["n_events"]
            for r in spark.sql("select * from we").collect()
        }
        # 10:00/11:00 windows are final (watermark = 15:00 - 10min);
        # the 15:00 window is still open → absent in append mode
        assert rows.get((10, "click")) == 2
        assert rows.get((11, "view")) == 1
        assert (15, "view") not in rows

        # straggler inside a finalized window is late → dropped; the 17:00
        # event pushes the watermark past the 15:00 window's end
        _write_events(
            src / "batch2.json",
            [
                {"event_id": 5, "ts": base.format("10"), "user_id": 9,
                 "event_type": "click", "value": 9.0, "props": "{}"},
                {"event_id": 6, "ts": base.format("17"), "user_id": 1,
                 "event_type": "view", "value": 1.0, "props": "{}"},
            ],
        )
        q.processAllAvailable()
        rows2 = [
            (r["window_start"].hour, r["event_type"], r["n_events"])
            for r in spark.sql("select * from we").collect()
        ]
        assert (10, "click", 2) in rows2  # unchanged — late row dropped
        assert (10, "click", 3) not in rows2

        # append-mode emission uses the watermark from the PREVIOUS batch,
        # so one more batch flushes the now-finalized 15:00 window
        _write_events(
            src / "batch3.json",
            [
                {"event_id": 7, "ts": base.format("18"), "user_id": 1,
                 "event_type": "view", "value": 1.0, "props": "{}"},
            ],
        )
        q.processAllAvailable()
        rows3 = [
            (r["window_start"].hour, r["event_type"], r["n_events"])
            for r in spark.sql("select * from we").collect()
        ]
        assert (15, "view", 1) in rows3  # emitted exactly once, exactly right
        assert (10, "click", 2) in rows3
    finally:
        q.stop()


def test_hopping_windowed_stream(spark, tmp_path):
    """Streaming twin of hopping_window_agg: an event at 10:15 emits in BOTH
    the [9:30,10:30) and [10:00,11:00) windows once the watermark closes
    them (1h windows sliding by 30m)."""
    from client_data_ingester_spark.streaming.events_stream import (
        EVENT_SCHEMA,
        windowed_event_counts,
    )

    src = tmp_path / "events"
    src.mkdir()
    _write_events(
        src / "batch1.json",
        [
            {"event_id": 1, "ts": "2024-01-01T10:15:00.000Z", "user_id": 1,
             "event_type": "click", "value": 1.5, "props": "{}"},
            # watermark driver closes both click windows
            {"event_id": 2, "ts": "2024-01-01T15:00:00.000Z", "user_id": 1,
             "event_type": "view", "value": 0.0, "props": "{}"},
        ],
    )
    stream = (
        spark.readStream.schema(EVENT_SCHEMA).format("json").load(str(src))
    )
    agg = windowed_event_counts(
        stream, "1 hour", "10 minutes", slide="30 minutes"
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("hop")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        clicks = spark.sql(
            "select * from hop where event_type = 'click'"
        ).collect()
        starts = {
            (r["window_start"].hour, r["window_start"].minute) for r in clicks
        }
        assert starts == {(9, 30), (10, 0)}
        assert all(r["n_events"] == 1 and float(r["sum_value"]) == 1.5
                   for r in clicks)
    finally:
        q.stop()


def test_streaming_cumulative_users_matches_batch_across_restart(
    spark, tmp_path
):
    """The merged first-seen curve must equal the batch operator over the
    union of everything streamed — across micro-batches and a restart —
    and shard replays must be harmless (MIN-merge idempotence)."""
    import json as _json

    from client_data_ingester_spark.operators.events import (
        cumulative_unique_users,
    )
    from client_data_ingester_spark.streaming.users_stream import (
        read_cumulative_users,
        start_first_seen_stream,
    )

    src = tmp_path / "events"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    shards = str(tmp_path / "first_seen")

    def _write(name, id0, pairs):
        with open(src / name, "w") as f:
            for i, (u, hour) in enumerate(pairs):
                f.write(_json.dumps({
                    "event_id": id0 + i,
                    "ts": f"2024-01-01T{hour:02d}:15:00.000Z",
                    "user_id": u,
                    "event_type": "click",
                }) + "\n")

    all_pairs = []

    def _batch_curve():
        df = spark.createDataFrame(
            [(u, f"2024-01-01 {h:02d}:15:00") for u, h in all_pairs],
            ["user_id", "ts_s"],
        ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"))
        return [tuple(r) for r in cumulative_unique_users(df, "hour").collect()]

    b1 = [(1, 0), (2, 0), (1, 2), (3, 3)]
    all_pairs += b1
    _write("b1.json", 0, b1)
    q = start_first_seen_stream(spark, str(src), ckpt, shards)
    try:
        q.processAllAvailable()
        # batch 2: returning user 1 earlier in the day than batch 1 saw
        # it is impossible (time moves forward), but a LATE event for
        # user 2 at hour 1 must not move its first-seen back... it
        # should: MIN-merge takes the earliest observed bucket. Include
        # a genuinely-new user too.
        b2 = [(2, 1), (4, 5)]
        all_pairs += b2
        _write("b2.json", 100, b2)
        q.processAllAvailable()
    finally:
        q.stop()

    live = [tuple(r) for r in read_cumulative_users(spark, shards).collect()]
    assert live == _batch_curve()

    # restart from the checkpoint: only the new file is processed. b3
    # includes a genuine BACKFILL: user 4 (first seen at hour 5 in b2)
    # arrives out-of-order at hour 2 — MIN-merge must move its
    # first-seen EARLIER, which a last-write-wins or MAX merge would
    # silently miss
    b3 = [(5, 4), (1, 6), (4, 2)]
    all_pairs += b3
    _write("b3.json", 200, b3)
    q2 = start_first_seen_stream(spark, str(src), ckpt, shards)
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    live2 = [tuple(r) for r in read_cumulative_users(spark, shards).collect()]
    assert live2 == _batch_curve()
    # dense curve invariants: consecutive hourly buckets, monotone totals
    hours = [b.hour for b, _, _ in live2]
    assert hours == list(range(hours[0], hours[-1] + 1))
    totals = [c for _, _, c in live2]
    assert totals == sorted(totals)
