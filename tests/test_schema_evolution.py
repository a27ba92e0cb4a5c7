"""Additive schema evolution on snapshot tables: widening the declared
schema (new nullable columns) must read every version — files written
BEFORE the widening fill the new column with NULL (parquet reads under an
explicit schema resolve missing columns to null), time travel included,
and narrowing back (reading new files under the old schema) simply prunes
the extra column. Pins the contract so a future reader change (e.g.
mergeSchema or name-based resolution) can't silently break old data."""

from pyspark.sql import functions as F
from pyspark.sql import types as T

from client_data_ingester_spark.tables.snapshot import SnapshotTable

V1 = T.StructType(
    [
        T.StructField("client_id", T.LongType(), False),
        T.StructField("sku", T.StringType(), True),
        T.StructField("title", T.StringType(), True),
    ]
)

V2 = T.StructType(
    V1.fields + [T.StructField("stock_quantity", T.LongType(), True)]
)


def _rows(spark, schema, rows):
    return spark.createDataFrame(rows, schema)


def test_widened_schema_reads_old_versions_with_nulls(spark, tmp_path):
    root = str(tmp_path / "t")
    t1 = SnapshotTable(root, V1)
    t1.overwrite_partitions(
        _rows(spark, V1, [(1, "A", "first"), (1, "B", "second")]), [1]
    )

    # widen: same root, new declared schema with an extra nullable column
    t2 = SnapshotTable(root, V2)
    t2.overwrite_partitions(
        _rows(spark, V2, [(2, "C", "third", 7)]), [2]
    )

    cur = {r.sku: r for r in t2.read(spark).collect()}
    assert set(cur) == {"A", "B", "C"}
    assert cur["A"].stock_quantity is None  # pre-widening file → NULL
    assert cur["C"].stock_quantity == 7

    # time travel to the pre-widening version under the WIDENED schema
    old = {r.sku: r for r in t2.read(spark, version=1).collect()}
    assert set(old) == {"A", "B"}
    assert all(r.stock_quantity is None for r in old.values())

    # reading new files under the OLD declared schema prunes the column
    narrow = SnapshotTable(root, V1).read(spark).collect()
    assert {r.sku for r in narrow} == {"A", "B", "C"}
    assert "stock_quantity" not in narrow[0].asDict()
