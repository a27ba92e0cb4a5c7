"""Bucketed (hash-clustered) tables: co-located joins without a shuffle
([EXT], SURVEY §4 scale story).

At 100 TB the dominant cost of a fact-fact equi-join (lineitem ⋈ orders,
events ⋈ users) is the pairwise shuffle of BOTH inputs on the join key.
Bucketing spends that shuffle ONCE at write time: ``bucketBy(n, key)``
hash-partitions rows into a fixed number of per-partition files, and the
catalog records the spec. Every later equi-join or aggregation on the
bucket key reads the matching buckets side-by-side — the physical plan has
NO Exchange on either side (asserted in tests/test_bucketed.py), which at
scale means no terabyte-sized shuffle files, no shuffle-fetch stragglers,
and join stages bounded by scan speed.

Pairs with ``sortBy`` on the same key: one file per bucket lets Spark also
skip the sort (SortMergeJoin reads pre-sorted runs).

Bucketed tables require the session catalog (the spec lives in table
metadata, not parquet), so writers take a table name, not a path; callers
scope test tables in a ``CREATE DATABASE ... LOCATION`` under a temp dir.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    num_buckets: int,
    bucket_cols: list[str],
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (optionally bucket-sorted) catalog
    table. ``num_buckets`` must match between tables meant to co-join —
    mismatched counts fall back to a shuffled join on one side."""
    writer = (
        df.write.format("parquet").mode(mode).bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def cojoin(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-spec bucketed tables on their bucket key.

    The ``merge`` hint pins SortMergeJoin (a broadcast would *also* avoid
    the shuffle, but only while one side still fits in memory — the
    bucketed SMJ is the plan that survives both sides growing 1000×).
    """
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.hint("merge").join(right, on, how)
