"""Change feed between snapshot versions: manifest-level partition diff
(untouched tenants contribute zero I/O) + row-level insert/delete/update
classification."""

import pytest

from client_data_ingester_spark.schemas import CLIENT_PRODUCTS_SCHEMA
from client_data_ingester_spark.tables import SnapshotTable
from client_data_ingester_spark.tables.changes import (
    changed_partitions,
    changes_between,
)


def _row(i, client_id, sku, title, qty=None, active=True):
    return (
        i, client_id, sku, None, None, title, None, qty, active,
        None, None, None,
    )


@pytest.fixture()
def versioned_table(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"), CLIENT_PRODUCTS_SCHEMA)
    v1 = [
        _row(1, 1, "A", "alpha"),
        _row(2, 1, "B", "beta"),
        _row(3, 1, "C", "gamma"),
        _row(10, 2, "X", "ex"),  # tenant 2: never touched again
    ]
    t.overwrite_partitions(
        spark.createDataFrame(v1, CLIENT_PRODUCTS_SCHEMA), [1, 2]
    )
    v2 = [
        _row(1, 1, "A", "alpha"),            # unchanged
        _row(2, 1, "B", "beta-renamed"),     # update
        _row(4, 1, "D", "delta"),            # insert; C deleted
    ]
    t.overwrite_partitions(
        spark.createDataFrame(v2, CLIENT_PRODUCTS_SCHEMA), [1]
    )
    return t


def test_manifest_diff_scopes_to_touched_partitions(versioned_table):
    assert changed_partitions(versioned_table, 1, 2) == ["1"]


def test_change_rows_classified(spark, versioned_table):
    feed = {
        (r["client_id"], r["sku"]): r
        for r in changes_between(
            spark, versioned_table, ["client_id", "sku"], 1, 2
        ).collect()
    }
    assert set(feed) == {(1, "B"), (1, "C"), (1, "D")}
    assert feed[(1, "B")]["change_type"] == "update"
    assert feed[(1, "B")]["old_row"]["title"] == "beta"
    assert feed[(1, "B")]["new_row"]["title"] == "beta-renamed"
    assert feed[(1, "C")]["change_type"] == "delete"
    assert feed[(1, "C")]["new_row"] is None
    assert feed[(1, "D")]["change_type"] == "insert"
    assert feed[(1, "D")]["old_row"] is None


def test_same_version_diff_is_empty(spark, versioned_table):
    assert (
        changes_between(
            spark, versioned_table, ["client_id", "sku"], 2, 2
        ).count()
        == 0
    )


def test_gc_horizon_raises(spark, versioned_table):
    with pytest.raises(ValueError, match="not available"):
        changed_partitions(versioned_table, 0, 99)


def test_change_feed_stream_incremental_versions(spark, tmp_path):
    """The streaming CDC twin: each published snapshot version reaches a
    tailing consumer as one micro-batch of classified rows, without any
    re-diff of already-published versions."""
    from client_data_ingester_spark.streaming.changes_stream import (
        ChangeFeedPublisher,
        read_change_feed_stream,
    )

    t = SnapshotTable(str(tmp_path / "t"), CLIENT_PRODUCTS_SCHEMA)
    t.overwrite_partitions(
        spark.createDataFrame(
            [_row(1, 1, "A", "alpha"), _row(2, 1, "B", "beta")],
            CLIENT_PRODUCTS_SCHEMA,
        ),
        [1],
    )
    pub = ChangeFeedPublisher(
        spark, t, ["client_id", "sku"], str(tmp_path / "feed")
    )
    assert pub.poll() == [1]
    assert pub.poll() == []  # nothing new: no re-diff, no re-emit

    stream = read_change_feed_stream(
        spark, t, ["client_id", "sku"], str(tmp_path / "feed")
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("cdc_feed")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        v1 = spark.sql("select * from cdc_feed").collect()
        assert {(r["sku"], r["change_type"], r["version"]) for r in v1} == {
            ("A", "insert", 1),
            ("B", "insert", 1),
        }

        # second version: update B, delete A, insert C
        t.overwrite_partitions(
            spark.createDataFrame(
                [_row(2, 1, "B", "beta-renamed"), _row(3, 1, "C", "gamma")],
                CLIENT_PRODUCTS_SCHEMA,
            ),
            [1],
        )
        assert pub.poll() == [2]
        q.processAllAvailable()
        rows = {
            (r["sku"], r["version"]): r
            for r in spark.sql("select * from cdc_feed").collect()
        }
        assert rows[("A", 2)]["change_type"] == "delete"
        assert rows[("B", 2)]["change_type"] == "update"
        assert rows[("B", 2)]["old_row"]["title"] == "beta"
        assert rows[("B", 2)]["new_row"]["title"] == "beta-renamed"
        assert rows[("C", 2)]["change_type"] == "insert"
        assert len(rows) == 5  # 2 from v1 + 3 from v2, no duplicates
    finally:
        q.stop()


def test_change_feed_publisher_replay_and_horizon(spark, tmp_path):
    """Publisher crash-safety: a version dir whose write completed
    (_SUCCESS present) is not rewritten when only the cursor advance was
    lost — the tailing file stream sees each part file once. And a feed
    that lagged past the snapshot GC horizon refuses to skip silently."""
    import os

    from client_data_ingester_spark.streaming.changes_stream import (
        ChangeFeedPublisher,
    )

    t = SnapshotTable(
        str(tmp_path / "t"), CLIENT_PRODUCTS_SCHEMA, keep_versions=2
    )
    t.overwrite_partitions(
        spark.createDataFrame([_row(1, 1, "A", "alpha")],
                              CLIENT_PRODUCTS_SCHEMA), [1]
    )
    feed_dir = str(tmp_path / "feed")
    pub = ChangeFeedPublisher(spark, t, ["client_id", "sku"], feed_dir)
    assert pub.poll() == [1]

    # simulate "crash after write, before cursor advance": roll the
    # cursor back; the completed version dir must be reused as-is
    vdir = os.path.join(feed_dir, "version=1")
    before = sorted(os.listdir(vdir))
    os.remove(os.path.join(feed_dir, "_cdc_state.json"))
    assert pub.poll() == [1]
    assert sorted(os.listdir(vdir)) == before  # same part files, no rewrite

    # lag past the GC horizon: publish enough versions that version 1's
    # manifest is GC'd while the feed cursor still points at 1
    for i in range(2, 6):
        t.overwrite_partitions(
            spark.createDataFrame(
                [_row(1, 1, "A", f"alpha-v{i}")], CLIENT_PRODUCTS_SCHEMA
            ),
            [1],
        )
    assert t._manifest_at(2) is None  # keep_versions=2: old manifests gone
    with pytest.raises(RuntimeError, match="GC horizon"):
        pub.poll()
    # recovery: seed at current and continue
    assert pub.seed() == t.current_manifest().version
    assert pub.poll() == []


def test_change_feed_lost_cursor_on_fully_published_feed(spark, tmp_path):
    """A lost cursor on a feed whose every version dir is complete must
    replay for free via the _SUCCESS skips — even when the old snapshot
    manifests are long GC'd (no re-diff is needed, so the horizon doesn't
    apply)."""
    import os

    from client_data_ingester_spark.streaming.changes_stream import (
        ChangeFeedPublisher,
    )

    t = SnapshotTable(
        str(tmp_path / "t"), CLIENT_PRODUCTS_SCHEMA, keep_versions=2
    )
    feed_dir = str(tmp_path / "feed")
    pub = ChangeFeedPublisher(spark, t, ["client_id", "sku"], feed_dir)
    for i in range(1, 6):  # publish + poll in lockstep: every dir lands
        t.overwrite_partitions(
            spark.createDataFrame(
                [_row(1, 1, "A", f"alpha-v{i}")], CLIENT_PRODUCTS_SCHEMA
            ),
            [1],
        )
        assert pub.poll() == [i]
    assert t._manifest_at(1) is None  # old manifests GC'd
    os.remove(os.path.join(feed_dir, "_cdc_state.json"))
    assert pub.poll() == [1, 2, 3, 4, 5]  # pure replay, no horizon error


def test_changes_table_builder_recovers_from_partial_build(spark):
    """If a prior run crashed between the two publishes (cache dir holds
    only v1), the scored-query builder must wipe and rebuild — resuming
    from v1 would publish v2 as a copy of v1 and the scored 1→2 diff
    would silently be empty (round-6 ADVICE)."""
    import os
    import shutil

    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    t = entry._changes_table(spark, sf)
    assert t.current_manifest().version == 2
    n_changes = changes_between(spark, t, ["sku"], 1, 2).count()
    assert n_changes > 0

    # simulate the crash: roll the manifest pointer back to v1 and drop v2
    root = t.root
    shutil.copyfile(
        os.path.join(root, "_MANIFEST.v1"), os.path.join(root, "_MANIFEST")
    )
    os.remove(os.path.join(root, "_MANIFEST.v2"))

    t2 = entry._changes_table(spark, sf)
    assert t2.current_manifest().version == 2
    assert changes_between(spark, t2, ["sku"], 1, 2).count() == n_changes


def test_change_feed_on_boolean_partition_col(spark, tmp_path):
    """Partition keys are minted with Python str() ('True'), but rows
    were previously matched with Spark cast-to-string ('true') — a
    boolean-partitioned table's change feed silently reported zero
    changes (regression: the key is now cast back to the column's native
    type, which parses either rendering)."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("flag", T.BooleanType()),
            T.StructField("payload", T.StringType()),
        ]
    )
    t = SnapshotTable(str(tmp_path / "bt"), schema, partition_col="flag")
    t.overwrite_partitions(
        spark.createDataFrame(
            [(1, True, "a"), (2, True, "b"), (3, False, "z")], schema
        ),
        [True, False],
    )
    t.overwrite_partitions(
        spark.createDataFrame([(1, True, "a"), (2, True, "B2")], schema),
        [True],
    )
    assert changed_partitions(t, 1, 2) == ["True"]
    feed = {
        r["id"]: r["change_type"]
        for r in changes_between(spark, t, ["id"], 1, 2).collect()
    }
    assert feed == {2: "update"}


def test_change_feed_on_subsecond_timestamp_partition_col(spark, tmp_path):
    """str(datetime) renders '.500000' where Spark's cast renders '.5' —
    the string-space match dropped every row of a sub-second-timestamp
    partition from the feed."""
    import datetime

    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("batch_ts", T.TimestampType()),
            T.StructField("payload", T.StringType()),
        ]
    )
    ts = datetime.datetime(2024, 1, 1, 0, 0, 0, 500000)
    t = SnapshotTable(str(tmp_path / "tt"), schema, partition_col="batch_ts")
    t.overwrite_partitions(
        spark.createDataFrame([(1, ts, "a"), (2, ts, "b")], schema), [ts]
    )
    t.overwrite_partitions(
        spark.createDataFrame([(1, ts, "a")], schema), [ts]
    )
    feed = {
        r["id"]: r["change_type"]
        for r in changes_between(spark, t, ["id"], 1, 2).collect()
    }
    assert feed == {2: "delete"}
