"""Layout-optimized parquet writes for analytic tables ([EXT], SURVEY §4).

The read-side scale story (partition pruning, row-group stat skipping) is
only as good as the write-side layout. This module is the write-side half
for append-mostly analytic tables like ``events``:

- **Hive-style partition dirs** (``partitionBy``) make coarse predicates
  (date, tenant) prune at the PATH level — Spark's scan shows them under
  ``PartitionFilters`` and never opens the excluded directories' footers.
- **Cluster-before-write** (``repartition`` on the partition columns) sends
  each output partition's rows to one task: without it, every one of N
  shuffle tasks writes a sliver into every partition dir — the small-files
  explosion (N × partitions files per write) that kills 100 TB listings.
- **Sort-within-partitions** on the frequent residual predicate columns
  tightens parquet row-group min/max ranges, so data skipping drops
  row groups inside the surviving dirs (visible as ``PushedFilters`` plus
  small ``numOutputRows`` at scan).

This is the generic layout primitive; the transactional per-tenant snapshot
table (snapshot.py) handles the mutable products table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    sort_cols: list[str] | None = None,
    files_per_partition: int = 1,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a Hive-partitioned parquet table with a pruning- and
    skipping-friendly layout.

    ``files_per_partition > 1`` splits hot partitions across several tasks
    (a salt column keeps the shuffle balanced and is dropped before write).
    The salt is CONTENT-DERIVED (hash of the row's non-partition columns,
    not ``rand``): a retried task re-produces the identical row→file
    assignment, so speculative/retried writes are byte-stable.

    The salted ``repartition`` carries an EXPLICIT partition count: a
    column-only repartition is a hint AQE's ``coalescePartitions`` is free
    to collapse — on a small-footprint write it merges the whole shuffle
    into one task and the split silently no-ops (one file per dir again).
    A user-specified count is never coalesced. The count is
    ``n_dirs * files_per_partition * 4``: one hash bucket per intended
    (dir, salt) file, overprovisioned 4x so two (dir, salt) groups rarely
    collide into the same task (a collision merges two intended files —
    harmless for correctness, but it would blunt the split). The
    ``n_dirs`` distinct-count is one cheap map-side-combined scan of the
    partition columns only.
    """
    if files_per_partition <= 1:
        out = df.repartition(*[F.col(c) for c in partition_cols])
    else:
        salt_cols = [c for c in df.columns if c not in partition_cols]
        # F.hash rejects zero args and MapType columns: serialize maps to
        # JSON first, and fall back to a constant salt (no split — every
        # column is a partition column, so rows within a dir are
        # indistinguishable and any content-derived split is impossible).
        hashable = [
            F.to_json(F.col(c))
            if df.schema[c].dataType.typeName() == "map"
            else F.col(c)
            for c in salt_cols
        ]
        if hashable:
            salt = F.pmod(F.hash(*hashable), F.lit(files_per_partition))
        else:
            salt = F.lit(0)
        n_dirs = df.select(*partition_cols).distinct().count()
        n_tasks = max(1, n_dirs * files_per_partition * 4)
        out = (
            df.withColumn("_salt", salt)
            .repartition(
                n_tasks, *[F.col(c) for c in partition_cols], F.col("_salt")
            )
            .drop("_salt")
        )
    if sort_cols:
        out = out.sortWithinPartitions(*partition_cols, *sort_cols)
    (
        out.write.mode(mode)
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def events_layout(events: DataFrame) -> DataFrame:
    """The events table's layout projection: derive the ``event_date``
    partition column from the event timestamp (daily partitions — the
    coarsest predicate every time-ranged query carries)."""
    return events.withColumn("event_date", F.to_date(F.col("ts")))


def write_events_partitioned(
    events: DataFrame, path: str, files_per_partition: int = 1
) -> None:
    """events → daily partition dirs, user-sorted within each (time-range
    queries prune dirs; per-user queries skip row groups)."""
    write_partitioned(
        events_layout(events),
        path,
        partition_cols=["event_date"],
        sort_cols=["user_id", "ts"],
        files_per_partition=files_per_partition,
    )


def read_events_day(
    spark: SparkSession, path: str, day: str
) -> DataFrame:
    """One day of events — the predicate lands in PartitionFilters (path
    pruning), not a post-scan filter."""
    return spark.read.parquet(path).filter(F.col("event_date") == F.lit(day))
