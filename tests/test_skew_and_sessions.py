"""Skew-salting join (same result as the plain join, bounded task fan-out)
and native streaming session windows."""

import json

from pyspark.sql import functions as F

from client_data_ingester_spark.operators.skew import hot_keys, salted_join
from client_data_ingester_spark.streaming.events_stream import (
    EVENT_SCHEMA,
    session_window_counts,
)


def test_salted_join_matches_plain_join(spark):
    # one pathological key (0) with 5k rows; others tiny
    big = spark.range(0, 5000).select(
        F.when(F.col("id") < 4000, 0).otherwise(F.col("id") % 50).alias("k"),
        F.col("id").alias("v"),
    )
    small = spark.createDataFrame(
        [(i, f"dim{i}") for i in range(50)], "k long, name string"
    )
    plain = salted = None
    plain = big.join(small, "k").groupBy("k").count().collect()
    salted = (
        salted_join(big, small, "k", salt=8).groupBy("k").count().collect()
    )
    assert {(r["k"], r["count"]) for r in plain} == {
        (r["k"], r["count"]) for r in salted
    }


def test_salted_join_rejects_small_side_preserving_types(spark):
    # right/full replicate unmatched small-side rows once per salt value —
    # salted_join must refuse them rather than emit duplicates
    import pytest

    big = spark.range(5).select(F.col("id").alias("k"))
    small = spark.range(5).select(F.col("id").alias("k"))
    for how in ("right", "full", "outer", "full_outer", "rightouter"):
        with pytest.raises(ValueError):
            salted_join(big, small, "k", salt=4, how=how)
    # big-side-preserving types still work
    assert salted_join(big, small, "k", salt=4, how="left").count() == 5


def test_hot_keys_detects_skew(spark):
    big = spark.range(0, 1000).select(
        F.when(F.col("id") < 900, 7).otherwise(F.col("id")).alias("k")
    )
    hot = hot_keys(big, "k", min_rows=100).collect()
    assert [(r["k"], r["n_rows"]) for r in hot] == [(7, 900)]


def test_streaming_session_window(spark, tmp_path):
    src = tmp_path / "ev"
    src.mkdir()
    with open(src / "b1.json", "w") as f:
        for e in [
            # user 1: two events 5min apart (one session), then 2h later (new)
            {"event_id": 1, "ts": "2024-01-01T10:00:00Z", "user_id": 1,
             "event_type": "click", "value": 1.0, "props": "{}"},
            {"event_id": 2, "ts": "2024-01-01T10:05:00Z", "user_id": 1,
             "event_type": "click", "value": 2.0, "props": "{}"},
            {"event_id": 3, "ts": "2024-01-01T12:30:00Z", "user_id": 1,
             "event_type": "view", "value": 3.0, "props": "{}"},
            # watermark driver
            {"event_id": 4, "ts": "2024-01-01T18:00:00Z", "user_id": 2,
             "event_type": "view", "value": 0.0, "props": "{}"},
        ]:
            f.write(json.dumps(e) + "\n")
    stream = spark.readStream.schema(EVENT_SCHEMA).format("json").load(str(src))
    q = (
        session_window_counts(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("sessions")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        rows = [
            (r["user_id"], r["session_start"].hour, r["n_events"])
            for r in spark.sql("select * from sessions").collect()
        ]
        assert (1, 10, 2) in rows  # 10:00+10:05 merged into one session
        assert (1, 12, 1) in rows  # 12:30 is its own session (gap > 30min)
        assert all(u != 2 for u, _, _ in rows)  # user 2's session still open
    finally:
        q.stop()
