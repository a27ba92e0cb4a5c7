"""Writer-serialization tests for the snapshot table layer.

The reference serializes per-tenant writes through Postgres row locks
(single ``db.commit()`` per file); here two guards replace that: the
per-table O_CREAT|O_EXCL lock file held across read-manifest → publish, and
the O_EXCL versioned-manifest create that detects a same-version collision
from writers that bypassed the lock.
"""

import os

import pytest
from pyspark.sql import functions as F

from client_data_ingester_spark.schemas import CLIENT_PRODUCTS_SCHEMA
from client_data_ingester_spark.tables import SnapshotTable
from client_data_ingester_spark.tables.snapshot import (
    _MANIFEST,
    Manifest,
    SnapshotConflictError,
)


def _df(spark, client_id, skus):
    # 12 fields, matching CLIENT_PRODUCTS_SCHEMA field order exactly
    rows = [
        (i + 1, client_id, sku, None, None, None, None, None, True,
         None, None, None)
        for i, sku in enumerate(skus)
    ]
    return spark.createDataFrame(rows, CLIENT_PRODUCTS_SCHEMA)


def test_lock_file_held_then_released(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"), CLIENT_PRODUCTS_SCHEMA)
    lock_path = os.path.join(t.root, _MANIFEST + ".lock")
    with t._write_lock():
        assert os.path.exists(lock_path)
        # a second writer cannot acquire while the first holds it
        with pytest.raises(SnapshotConflictError):
            with t._write_lock(timeout=0.2):
                pass
    assert not os.path.exists(lock_path)


def test_lock_released_after_successful_write(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"), CLIENT_PRODUCTS_SCHEMA)
    t.overwrite_partitions(_df(spark, 1, ["A"]), [1])
    assert not os.path.exists(os.path.join(t.root, _MANIFEST + ".lock"))
    assert t.current_manifest().version == 1


def test_version_collision_detected(spark, tmp_path):
    """A writer that would publish an already-published version fails loudly
    instead of silently clobbering the other writer's commit."""
    t = SnapshotTable(str(tmp_path / "t"), CLIENT_PRODUCTS_SCHEMA)
    t.overwrite_partitions(_df(spark, 1, ["A"]), [1])  # publishes v1
    # simulate a racing writer that already published v2 behind our back
    with open(os.path.join(t.root, f"{_MANIFEST}.v2"), "w") as f:
        f.write(t.current_manifest().to_json())
    with pytest.raises(SnapshotConflictError):
        t.overwrite_partitions(_df(spark, 1, ["B"]), [1])
    # the surviving pointer still reads: no partial state
    assert t.read(spark, 1).filter(F.col("sku") == "A").count() == 1


def test_stale_merge_conflicts_on_expected_version(spark, tmp_path):
    """A merge computed from manifest vN must NOT publish over a racer's
    vN+1 write to the same partition — the lost-update window of round 3."""
    t = SnapshotTable(str(tmp_path / "t"), CLIENT_PRODUCTS_SCHEMA)
    t.overwrite_partitions(_df(spark, 1, ["A"]), [1])  # v1
    read_version = t.current_manifest().version
    # racer publishes v2 for the SAME partition after our read
    t.overwrite_partitions(_df(spark, 1, ["A", "B"]), [1])
    with pytest.raises(SnapshotConflictError):
        t.overwrite_partitions(
            _df(spark, 1, ["A", "C"]), [1], expected_version=read_version
        )
    # the racer's commit survives untouched
    assert {r["sku"] for r in t.read(spark, 1).collect()} == {"A", "B"}


def test_other_partition_advance_does_not_conflict(spark, tmp_path):
    """A racer writing a DIFFERENT partition advances the version but not
    our partition's entry — the stale-version check must let us publish."""
    t = SnapshotTable(str(tmp_path / "t"), CLIENT_PRODUCTS_SCHEMA)
    t.overwrite_partitions(_df(spark, 1, ["A"]), [1])  # v1
    read_version = t.current_manifest().version
    t.overwrite_partitions(_df(spark, 2, ["X"]), [2])  # v2, other tenant
    t.overwrite_partitions(
        _df(spark, 1, ["A", "B"]), [1], expected_version=read_version
    )
    assert {r["sku"] for r in t.read(spark, 1).collect()} == {"A", "B"}
    assert {r["sku"] for r in t.read(spark, 2).collect()} == {"X"}


def test_expected_max_id_guards_id_ledger(spark, tmp_path):
    """Any writer advancing max_id after our read conflicts an id-minting
    publish (ids computed from the stale base would collide)."""
    t = SnapshotTable(str(tmp_path / "t"), CLIENT_PRODUCTS_SCHEMA)
    t.overwrite_partitions(_df(spark, 1, ["A"]), [1], props={"max_id": 10})
    base = int(t.current_manifest().props["max_id"])
    t.overwrite_partitions(_df(spark, 2, ["X"]), [2], props={"max_id": 20})
    with pytest.raises(SnapshotConflictError):
        t.overwrite_partitions(
            _df(spark, 1, ["B"]), [1], expected_max_id=base
        )


def test_concurrent_same_client_ingests_both_land(spark, tmp_path):
    """VERDICT r3 #2 done-check: two threads ingesting the same client
    concurrently must BOTH have their rows in the final snapshot (the loser
    re-reads and re-merges instead of silently dropping the winner's rows)."""
    import threading

    from client_data_ingester_spark.ingestion import ParserConfig, ingest_data

    t = SnapshotTable(str(tmp_path / "t"), CLIENT_PRODUCTS_SCHEMA)
    cfg = ParserConfig("csv", {"sku": ("sku", "text"), "title": ("title", "text")})
    reports = {}

    def run(tag):
        data = f"sku,title\n{tag},Product {tag}\n".encode()
        reports[tag] = ingest_data(spark, t, data, cfg, client_id=1)

    threads = [threading.Thread(target=run, args=(tag,)) for tag in ("A", "B")]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert all(r.success for r in reports.values()), {
        k: v.message for k, v in reports.items()
    }
    rows = t.read(spark, 1).collect()
    assert {r["sku"] for r in rows} == {"A", "B"}
    # the id ledger must not have handed both writers the same surrogate id
    ids = [r["id"] for r in rows]
    assert len(set(ids)) == len(ids)


def test_sequential_writers_interleave_cleanly(spark, tmp_path):
    """Two writers that take turns (lock respected) both commit; partitions
    written by the first writer survive the second writer's publish."""
    t = SnapshotTable(str(tmp_path / "t"), CLIENT_PRODUCTS_SCHEMA)
    t.overwrite_partitions(_df(spark, 1, ["A"]), [1])
    t.overwrite_partitions(_df(spark, 2, ["B"]), [2])
    assert t.current_manifest().version == 2
    assert t.read(spark, 1).count() == 1
    assert t.read(spark, 2).count() == 1


def test_time_travel_retention_horizon(spark, tmp_path):
    """Pins the time-travel contract: ``read(version=N)`` is guaranteed for
    the last ``keep_versions`` generations behind latest; anything older is
    GC'd — its manifest is gone, the read raises with a clear message, and
    its orphaned data dirs are actually deleted from disk."""
    t = SnapshotTable(
        str(tmp_path / "t"), CLIENT_PRODUCTS_SCHEMA, keep_versions=2
    )
    for n in range(1, 6):  # v1..v5, version v has skus S0..S{v-1}
        t.overwrite_partitions(
            _df(spark, 1, [f"S{i}" for i in range(n)]), [1]
        )
    latest = t.current_manifest().version
    assert latest == 5

    # every version within the horizon reads back its exact as-of content
    for v in range(latest - t.keep_versions, latest + 1):  # v3..v5
        got = {r["sku"] for r in t.read(spark, 1, version=v).collect()}
        assert got == {f"S{i}" for i in range(v)}, v

    # versions past the horizon: manifest unlinked, read raises
    for v in (1, 2):
        assert not os.path.exists(t._manifest_path(v))
        with pytest.raises(ValueError, match="GC horizon"):
            t.read(spark, 1, version=v)

    # GC removed orphaned data dirs: everything on disk is referenced by a
    # still-live manifest (no unbounded storage growth under churn)
    live = set()
    for v in range(latest - t.keep_versions, latest + 1):
        with open(t._manifest_path(v)) as f:
            m = Manifest.from_json(f.read())
        for dirs in m.partitions.values():
            live.update(dirs)
    on_disk = {
        name
        for name in os.listdir(t.root)
        if os.path.isdir(os.path.join(t.root, name))
    }
    assert on_disk == live
