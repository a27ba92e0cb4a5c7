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


def _skewed_frames(spark):
    # one pathological key (0) with 4k rows; some keys missing from each
    # side so outer/anti semantics are exercised; nulls on both sides
    big = spark.range(0, 5000).select(
        F.when(F.col("id") < 4000, 0)
        .when(F.col("id") % 50 == 49, None)
        .otherwise(F.col("id") % 50)
        .alias("k"),
        F.col("id").alias("v"),
    )
    small = spark.createDataFrame(
        [(i, f"dim{i}") for i in range(0, 40)] + [(None, "dimnull")],
        "k long, name string",
    )
    return big, small


def test_hot_scoped_salted_join_matches_plain_join_all_types(spark):
    """With hot_keys wired in, only flagged keys are salted; every
    supported join type must still match the plain join exactly —
    including null keys and keys absent from the small side."""
    big, small = _skewed_frames(spark)
    from collections import Counter

    for how in ("inner", "left", "semi", "anti"):
        plain = big.join(small, "k", how)
        scoped = salted_join(
            big, small, "k", salt=8, how=how, hot_threshold=1000
        )
        assert Counter(map(tuple, plain.collect())) == Counter(
            map(tuple, scoped.collect())
        ), how


def test_hot_scoped_salted_join_replication_bounded(spark):
    """Replication must cover only the hot slice of the small side: the
    explode sits above a filtered small side, and the non-hot remainder
    unions through a plain join (no rand() anywhere — the salt is a
    deterministic content hash, so re-runs re-produce the bucketing)."""
    big, small = _skewed_frames(spark)
    hot = hot_keys(big, "k", min_rows=1000)
    df = salted_join(big, small, "k", salt=8, hot=hot)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "extended"
    )
    assert "rand(" not in plan
    physical = plan.split("== Physical Plan ==")[1]
    assert physical.count("Generate explode") == 1
    assert "Union" in physical
    # the salted branch's small side is filtered to the hot keys before
    # the explode: replication = |hot ∩ small| x salt, not |small| x salt
    from client_data_ingester_spark.operators.skew import _replicate

    hot_vals = [r[0] for r in hot.collect()]
    small_hot = small.filter(F.col("k").isin(hot_vals))
    assert _replicate(small_hot, 8).count() == small_hot.count() * 8
    assert small_hot.count() < small.count()


def test_salted_join_empty_hot_set_is_plain_join(spark):
    big, small = _skewed_frames(spark)
    from collections import Counter

    out = salted_join(big, small, "k", salt=8, hot_threshold=10**9)
    plain = big.join(small, "k")
    assert Counter(map(tuple, out.collect())) == Counter(
        map(tuple, plain.collect())
    )


def test_salted_join_null_hot_key_loses_no_rows(spark):
    """hot_keys can flag the null-key group (a classic skew source); a
    NULL inside the isin list would make `x IN (...)` NULL for every
    non-hot key and silently drop those rows from BOTH branches. Nulls
    must be stripped from the hot set (null never equi-joins — the plain
    branch is the correct treatment)."""
    from collections import Counter

    big, small = _skewed_frames(spark)
    # a hot frame that includes NULL alongside the real hot key
    hot = spark.createDataFrame([(None,), (0,)], "k long")
    for how in ("inner", "left"):
        plain = big.join(small, "k", how)
        scoped = salted_join(big, small, "k", salt=8, how=how, hot=hot)
        assert Counter(map(tuple, plain.collect())) == Counter(
            map(tuple, scoped.collect())
        ), how


def test_salted_join_hot_set_cap(spark):
    import pytest

    from client_data_ingester_spark.operators import skew

    big = spark.range(0, 5).select(F.col("id").alias("k"))
    small = spark.range(0, 5).select(F.col("id").alias("k"))
    many = spark.range(0, skew.MAX_HOT_KEYS + 1).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="hot key set exceeds"):
        salted_join(big, small, "k", hot=many)


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
