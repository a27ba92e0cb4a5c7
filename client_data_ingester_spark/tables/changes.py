"""Change feed between snapshot versions ([EXT]) — the CDC read a
downstream consumer (search indexer, cache invalidator, replication job)
uses instead of re-diffing two full table copies.

The snapshot manifest makes this O(changed partitions), not O(table):
each version's manifest maps partition value → data directories, and a
partition whose directory list is IDENTICAL in both manifests provably
did not change (directories are immutable once written — every write
publishes new dirs). The diff therefore scans only the partitions whose
dir lists differ between the two versions; an untouched tenant
contributes zero I/O however large its data is. Within the changed
partitions, a full-outer join on the key classifies each row as
insert / delete / update (update detected by an md5 fingerprint of the
non-key columns, so wide rows compare with one string equality).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .snapshot import Manifest, SnapshotTable


def changed_partitions(
    table: SnapshotTable, from_version: int, to_version: int
) -> list[str]:
    """Partition values whose directory lists differ between the two
    manifests — the provable superset of all row changes."""
    m_old = table._manifest_at(from_version)
    m_new = table._manifest_at(to_version)
    if m_old is None or m_new is None:
        missing = from_version if m_old is None else to_version
        raise ValueError(
            f"version {missing} is not available (GC horizon is "
            f"{table.keep_versions} versions)"
        )
    keys = set(m_old.partitions) | set(m_new.partitions)
    return sorted(
        k
        for k in keys
        if m_old.partitions.get(k) != m_new.partitions.get(k)
    )


def _read_partitions(
    spark: SparkSession,
    table: SnapshotTable,
    manifest: Manifest,
    parts: list[str],
) -> DataFrame:
    dirs = sorted(
        {d for p in parts for d in manifest.partitions.get(p, [])}
    )
    if not dirs:
        return spark.createDataFrame([], schema=table.schema)
    df = spark.read.schema(table.schema).parquet(
        *[os.path.join(table.root, d) for d in dirs]
    )
    # dirs may be shared across partitions; the predicate keeps the diff
    # scoped to the changed partition values. The manifest keys were
    # minted with Python str() (snapshot.overwrite_partitions), whose
    # rendering diverges from Spark's cast-to-string for booleans
    # ('True' vs 'true'), sub-second timestamps ('.500000' vs '.5') and
    # large floats ('1e+20' vs '1.0E20') — so match by casting the KEY
    # back to the column's native type instead (Spark's string->T cast
    # parses every str() rendering: case-insensitive booleans, padded
    # fractions, exponent forms). try_cast keeps an unparseable key from
    # aborting the read under ANSI; such a key matches nothing — except
    # 'None', whose NULL try_cast eqNullSafe-matches the NULL-partition
    # rows str(None) minted it for.
    dtype = df.schema[table.partition_col].dataType
    pc = F.col(table.partition_col)
    pred = F.lit(False)
    for p in parts:
        key = F.lit(p).try_cast(dtype)
        if p == "None":
            pred = pred | pc.eqNullSafe(key)
        else:
            pred = pred | (pc == key)
    return df.filter(pred)


def changes_between(
    spark: SparkSession,
    table: SnapshotTable,
    key_cols: list[str],
    from_version: int,
    to_version: int,
) -> DataFrame:
    """One row per changed key between two snapshot versions:
    ``*key_cols, change_type ('insert'|'delete'|'update'), old_row,
    new_row`` (structs of the non-key columns; null on the absent side).

    Unchanged rows — including every row of every partition the manifests
    prove untouched — never appear and are never scanned.
    """
    parts = changed_partitions(table, from_version, to_version)
    m_old = table._manifest_at(from_version)
    m_new = table._manifest_at(to_version)
    non_key = [c for c in table.schema.names if c not in key_cols]
    fp = F.md5(F.to_json(F.struct(*[F.col(c) for c in non_key])))

    old = _read_partitions(spark, table, m_old, parts).select(
        *key_cols,
        F.lit(1).alias("_p_old"),
        fp.alias("_fp_old"),
        F.struct(*non_key).alias("old_row"),
    )
    new = _read_partitions(spark, table, m_new, parts).select(
        *key_cols,
        F.lit(1).alias("_p_new"),
        fp.alias("_fp_new"),
        F.struct(*non_key).alias("new_row"),
    )
    j = old.join(new, key_cols, "full_outer")
    change = (
        F.when(F.col("_p_old").isNull(), F.lit("insert"))
        .when(F.col("_p_new").isNull(), F.lit("delete"))
        .when(F.col("_fp_old") != F.col("_fp_new"), F.lit("update"))
        .otherwise(F.lit(None))
    )
    return (
        j.withColumn("change_type", change)
        .filter(F.col("change_type").isNotNull())
        .select(*key_cols, "change_type", "old_row", "new_row")
    )
