"""Tenant-cardinality structural canaries (VERDICT r11 ask #4).

tools/bench_tenants.py measures the wall-clock side; these tests pin the
STRUCTURE that makes those numbers scale-safe: a tenant-scoped read
resolves exactly the tenant's manifest-listed directories — its input
file set is independent of total client count — and a single-tenant
ingest rewrites only that tenant's manifest entries.
"""

import os

from pyspark.sql import functions as F

from client_data_ingester_spark.schemas import CLIENT_PRODUCTS_SCHEMA
from client_data_ingester_spark.tables import SnapshotTable


def _seed(spark, n_clients, per_client=3):
    rows = [
        (c * 1000 + i, c, f"SKU-{c}-{i}", None, None, None, None, None,
         True, None, None, None)
        for c in range(1, n_clients + 1)
        for i in range(per_client)
    ]
    return spark.createDataFrame(rows, CLIENT_PRODUCTS_SCHEMA)


def test_tenant_read_input_files_independent_of_client_count(spark, tmp_path):
    """read(partition_value=7) must scan ONLY the dirs the manifest lists
    for tenant 7 — the input-file set cannot grow with total tenants."""
    file_counts = {}
    for n_clients in (10, 200):
        t = SnapshotTable(
            str(tmp_path / f"t{n_clients}"), CLIENT_PRODUCTS_SCHEMA
        )
        t.overwrite_partitions(
            _seed(spark, n_clients), list(range(1, n_clients + 1))
        )
        # a second, tenant-7-only write: tenant 7 now resolves to ONE dir
        t.overwrite_partitions(
            _seed(spark, 7).filter(F.col("client_id") == 7), [7]
        )
        df = t.read(spark, partition_value=7)
        files = df.inputFiles()
        m = t.current_manifest()
        tenant_dirs = {os.path.join(t.root, d) for d in m.partitions["7"]}
        assert len(m.partitions["7"]) == 1
        assert files, "tenant read resolved no files"
        for f in files:
            local = f.removeprefix("file://")
            assert any(
                local.startswith(d) for d in tenant_dirs
            ), f"tenant-7 read touched a non-tenant dir: {f}"
        file_counts[n_clients] = len(files)
        assert df.count() == 3
    # the scan size is a property of tenant 7's data, not of table width
    assert file_counts[10] == file_counts[200]


def test_single_tenant_write_leaves_other_entries_untouched(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"), CLIENT_PRODUCTS_SCHEMA)
    t.overwrite_partitions(_seed(spark, 50), list(range(1, 51)))
    before = t.current_manifest()
    t.overwrite_partitions(
        _seed(spark, 7).filter(F.col("client_id") == 7), [7]
    )
    after = t.current_manifest()
    changed = [
        v for v in after.partitions
        if after.partitions[v] != before.partitions.get(v)
    ]
    assert changed == ["7"]
