"""applyInPandasWithState custom stateful operator: running per-user totals
accumulate across micro-batches (state survives between batches)."""

import json

from client_data_ingester_spark.streaming.events_stream import EVENT_SCHEMA
from client_data_ingester_spark.streaming.stateful import running_user_totals


def _write(path, events):
    with open(path, "w") as f:
        for e in events:
            f.write(json.dumps(e) + "\n")


def test_state_accumulates_across_batches(spark, tmp_path):
    src = tmp_path / "ev"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    _write(
        src / "b1.json",
        [
            {"event_id": 1, "ts": "2024-01-01T10:00:00Z", "user_id": 1,
             "event_type": "click", "value": 1.0, "props": "{}"},
            {"event_id": 2, "ts": "2024-01-01T10:05:00Z", "user_id": 1,
             "event_type": "click", "value": 2.0, "props": "{}"},
            {"event_id": 3, "ts": "2024-01-01T10:00:00Z", "user_id": 2,
             "event_type": "view", "value": 5.0, "props": "{}"},
        ],
    )
    stream = spark.readStream.schema(EVENT_SCHEMA).format("json").load(str(src))
    q = (
        running_user_totals(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("totals")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            r["user_id"]: (r["total_events"], r["total_value"], r["n_sessions"])
            for r in spark.sql("select * from totals").collect()
        }
        assert got[1] == (2, 3.0, 1)
        assert got[2] == (1, 5.0, 1)

        # batch 2: user 1 returns after >30min idle → second session;
        # state carried over, totals accumulate
        _write(
            src / "b2.json",
            [
                {"event_id": 4, "ts": "2024-01-01T11:00:00Z", "user_id": 1,
                 "event_type": "click", "value": 10.0, "props": "{}"},
            ],
        )
        q.processAllAvailable()
        latest = {}
        for r in spark.sql("select * from totals").collect():
            latest[r["user_id"]] = (
                r["total_events"], r["total_value"], r["n_sessions"]
            )
        assert latest[1] == (3, 13.0, 2)  # accumulated + new session
    finally:
        q.stop()


def test_null_ts_event_skipped_not_fatal():
    """One malformed (null-ts) event must not kill the whole streaming
    query: the update fn skips the row instead of raising on NaT."""
    import pandas as pd

    from client_data_ingester_spark.streaming.stateful import _make_update_fn

    class _State:
        hasTimedOut = False
        exists = False

        def update(self, v):
            self.value = v

        def remove(self):
            pass

    fn = _make_update_fn(False)
    pdf = pd.DataFrame(
        {
            "ts": [pd.Timestamp("2026-01-01 00:00:00"), pd.NaT],
            "value": [2.0, 3.0],
        }
    )
    state = _State()
    [out] = list(fn((7,), iter([pdf]), state))
    assert out["total_events"].iloc[0] == 1  # NaT row skipped
    assert out["total_value"].iloc[0] == 2.0
