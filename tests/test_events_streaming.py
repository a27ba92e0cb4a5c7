"""Watermarked event-time windows over a streaming source: late data beyond
the watermark is dropped; windows emit once the watermark passes them
(append mode). One long-lived query driven by processAllAvailable()."""

import json

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
