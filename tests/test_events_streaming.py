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
