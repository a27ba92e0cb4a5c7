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


def test_sequential_writers_interleave_cleanly(spark, tmp_path):
    """Two writers that take turns (lock respected) both commit; partitions
    written by the first writer survive the second writer's publish."""
    t = SnapshotTable(str(tmp_path / "t"), CLIENT_PRODUCTS_SCHEMA)
    t.overwrite_partitions(_df(spark, 1, ["A"]), [1])
    t.overwrite_partitions(_df(spark, 2, ["B"]), [2])
    assert t.current_manifest().version == 2
    assert t.read(spark, 1).count() == 1
    assert t.read(spark, 2).count() == 1
