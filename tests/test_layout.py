"""Write-side layout tests: partition pruning, file counts, compaction.

The 100 TB read story depends on the write layout — these tests pin that
(a) partition predicates prune at the PATH level (PartitionFilters in the
scan, not a post-scan Filter), (b) clustering-before-write prevents the
small-files explosion, and (c) snapshot compaction collapses a partition's
file count without changing its data.
"""

import glob
import io
import os
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from conftest import SF_DIR

from client_data_ingester_spark.schemas import CLIENT_PRODUCTS_SCHEMA
from client_data_ingester_spark.sources import load_table
from client_data_ingester_spark.tables import SnapshotTable
from client_data_ingester_spark.tables.layout import (
    read_events_day,
    write_events_partitioned,
)


def _events(spark):
    return load_table(spark, SF_DIR, "events")


def test_partitioned_write_prunes_and_avoids_small_files(spark, tmp_path):
    path = str(tmp_path / "events_by_day")
    ev = _events(spark)
    write_events_partitioned(ev, path)

    # layout: one file per partition dir (clustered write), not one per task
    day_dirs = glob.glob(os.path.join(path, "event_date=*"))
    assert day_dirs, "expected Hive-style partition dirs"
    for d in day_dirs:
        files = [f for f in os.listdir(d) if f.endswith(".parquet")]
        assert len(files) == 1, f"small-files explosion in {d}: {files}"

    # pruning: the date predicate must appear as a PartitionFilter on the
    # scan (path-level pruning), and the scan must not read all partitions
    day = ev.select(F.to_date("ts").cast("string")).first()[0]
    pruned = read_events_day(spark, path, day)
    buf = io.StringIO()
    with redirect_stdout(buf):
        pruned.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    assert "event_date" in plan.split("PartitionFilters", 1)[1].split("]")[0]
    # correctness: the pruned read returns exactly that day's rows
    expected = ev.filter(F.to_date("ts") == F.lit(day)).count()
    assert pruned.count() == expected > 0


def test_salted_write_is_byte_stable_across_runs(spark, tmp_path):
    """The files_per_partition salt is content-derived (hash, not rand):
    writing the same input twice — as a task retry or speculative attempt
    would — produces byte-identical files in every partition dir."""
    import hashlib

    ev = _events(spark)
    p1, p2 = str(tmp_path / "w1"), str(tmp_path / "w2")
    write_events_partitioned(ev, p1, files_per_partition=2)
    write_events_partitioned(ev, p2, files_per_partition=2)

    def digests(root):
        out = {}
        for d in sorted(glob.glob(os.path.join(root, "event_date=*"))):
            hs = sorted(
                hashlib.md5(open(f, "rb").read()).hexdigest()
                for f in glob.glob(os.path.join(d, "*.parquet"))
            )
            out[os.path.basename(d)] = hs
        return out

    d1, d2 = digests(p1), digests(p2)
    assert d1 and d1 == d2
    # the salt actually splits hot partitions across >1 file
    assert any(len(hs) > 1 for hs in d1.values())


def test_sorted_layout_pushes_residual_filter(spark, tmp_path):
    path = str(tmp_path / "events_sorted")
    write_events_partitioned(_events(spark), path)
    q = (
        read_events_day(
            spark, path, _events(spark).select(F.to_date("ts").cast("string")).first()[0]
        )
        .filter(F.col("user_id") == 7)
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        q.explain("formatted")
    plan = buf.getvalue()
    # the user_id predicate reaches the parquet reader (row-group stats are
    # selective because the write sorted on user_id within each day)
    assert "PushedFilters" in plan
    pushed = plan.split("PushedFilters", 1)[1].split("]")[0]
    assert "user_id" in pushed


def test_snapshot_compact_collapses_files_keeps_data(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"), CLIENT_PRODUCTS_SCHEMA)
    rows = [
        (i, 1, f"S{i}", None, None, None, None, None, True, None, None, None)
        for i in range(1, 201)
    ]
    # force a many-files write (one file per slice)
    df = spark.createDataFrame(rows, CLIENT_PRODUCTS_SCHEMA).repartition(8)
    t.overwrite_partitions(df, [1])

    def files_of(version_dirs):
        out = []
        for d in version_dirs:
            out += glob.glob(os.path.join(d, "*.parquet"))
        return out

    m1 = t.current_manifest()
    dirs1 = [os.path.join(t.root, d) for d in m1.partitions["1"]]
    assert len(files_of(dirs1)) == 8

    before = sorted(
        (r["id"], r["sku"]) for r in t.read(spark, 1).collect()
    )
    m2 = t.compact(spark, 1, target_files=1)
    assert m2.version == m1.version + 1
    dirs2 = [os.path.join(t.root, d) for d in m2.partitions["1"]]
    assert len(files_of(dirs2)) == 1
    after = sorted((r["id"], r["sku"]) for r in t.read(spark, 1).collect())
    assert after == before
    # the id ledger survives compaction
    assert int(m2.props["max_id"]) == int(m1.props["max_id"])


def test_snapshot_retention_pins_time_travel_horizon(spark, tmp_path):
    """The time-travel guarantee is exactly ``keep_versions`` generations:
    versions inside the horizon stay readable after later publishes, older
    versions raise (not silently read wrong data), and GC actually removes
    the dropped versions' manifests and data dirs from disk."""
    import pytest

    t = SnapshotTable(
        str(tmp_path / "t"), CLIENT_PRODUCTS_SCHEMA, keep_versions=2
    )

    def df(skus):
        rows = [
            (i + 1, 1, s, None, None, None, None, None, True, None, None, None)
            for i, s in enumerate(skus)
        ]
        return spark.createDataFrame(rows, CLIENT_PRODUCTS_SCHEMA)

    for v, skus in enumerate((["A"], ["A", "B"], ["A", "B", "C"], ["D"]), 1):
        t.overwrite_partitions(df(skus), [1])
    # the horizon is INCLUSIVE: current + keep_versions generations back
    # stay readable (v2..v4 here), anything older raises — never a silent
    # wrong-data read
    assert {r["sku"] for r in t.read(spark, 1, version=4).collect()} == {"D"}
    assert {r["sku"] for r in t.read(spark, 1, version=3).collect()} == {
        "A", "B", "C",
    }
    assert {r["sku"] for r in t.read(spark, 1, version=2).collect()} == {
        "A", "B",
    }
    with pytest.raises(ValueError):
        t.read(spark, 1, version=1)
    # GC physically removed the expired manifest AND unreferenced data dirs
    names = set(os.listdir(t.root))
    assert not any(n.endswith(".v1") for n in names)
    live = set()
    for v in (2, 3, 4):
        import json as _json

        with open(os.path.join(t.root, f"_MANIFEST.v{v}")) as f:
            m = _json.load(f)
        for ds in m["partitions"].values():
            live.update(ds)
    data_dirs = {n for n in names if os.path.isdir(os.path.join(t.root, n))}
    assert data_dirs <= live


def test_snapshot_time_travel_reads_old_version(spark, tmp_path):
    import pytest

    t = SnapshotTable(str(tmp_path / "t"), CLIENT_PRODUCTS_SCHEMA)

    def df(skus):
        rows = [
            (i + 1, 1, s, None, None, None, None, None, True, None, None, None)
            for i, s in enumerate(skus)
        ]
        return spark.createDataFrame(rows, CLIENT_PRODUCTS_SCHEMA)

    t.overwrite_partitions(df(["A"]), [1])          # v1
    t.overwrite_partitions(df(["A", "B"]), [1])     # v2
    assert {r["sku"] for r in t.read(spark, 1).collect()} == {"A", "B"}
    assert {r["sku"] for r in t.read(spark, 1, version=1).collect()} == {"A"}
    with pytest.raises(ValueError):
        t.read(spark, 1, version=99)


def test_ivf_cells_as_partition_key_prune_the_probe_scan(spark, tmp_path):
    """The similarity module's 100 TB claim — 'cells are the partition
    key, so a probe reads ~nprobe/num_cells of the table' — demonstrated
    physically: a cell-partitioned embeddings layout gives the probe's
    cell filter a PartitionFilters entry (directory pruning before any
    file IO), and only the probed cells' files are listed."""
    import os

    from pyspark.sql import functions as F

    from client_data_ingester_spark.operators.similarity import kmeans_model
    from conftest import SF_DIR

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    assigns, _ = kmeans_model(emb, k=4, n_iter=2)
    out = str(tmp_path / "emb_by_cell")
    (
        emb.join(assigns.select("vec_id", "cluster"), "vec_id")
        .repartition("cluster")
        .write.partitionBy("cluster")
        .parquet(out)
    )
    cells = sorted(
        int(d.split("=")[1])
        for d in os.listdir(out)
        if d.startswith("cluster=")
    )
    assert len(cells) >= 2
    probed = cells[:2]
    df = spark.read.parquet(out).filter(F.col("cluster").isin(probed))
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    assert "cluster" in plan.split("PartitionFilters")[1].split("\n")[0]
    # and the filtered read returns exactly the probed cells' rows
    want = spark.read.parquet(out)
    n_probed = want.filter(F.col("cluster").isin(probed)).count()
    assert df.count() == n_probed > 0
