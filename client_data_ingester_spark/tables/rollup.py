"""Incrementally-maintained daily rollup over events ([EXT], SURVEY §2.9 —
the hypertable-style continuous aggregate).

At 100 TB you never re-aggregate the whole events table to refresh a daily
summary: maintenance cost must scale with NEW data, not table size. The
recipe here is the idiomatic Spark form of a continuous aggregate:

- the rollup is a parquet table partitioned by ``event_date``;
- ``maintain_daily_rollup`` diffs the source's days against the rollup's
  existing partition dirs (a LISTING, not a scan) and aggregates ONLY the
  missing days plus a ``reprocess_tail_days`` window for late/partial data
  (the batch analogue of a streaming watermark);
- the write uses **dynamic partition overwrite** (``partitionOverwriteMode=
  dynamic``): only the partitions present in the incremental batch are
  atomically replaced — untouched days' files are never rewritten, so a
  maintenance run is idempotent and re-runnable after failure;
- completeness is tracked in a ledger (``_COMPLETED_DAYS``, written
  atomically AFTER the job commit), not inferred from directory
  presence: a crash mid job-commit leaves a partially-written
  ``event_date=D`` dir, and presence-based detection would skip D
  forever once it aged out of the reprocess tail. Single-writer, like
  the snapshot table's maintenance jobs.

The day filter prunes the source scan at the PATH level when the events
table is itself date-partitioned (see ``tables/layout.py``); on a flat
table it still prunes row groups via parquet ``ts`` stats.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

D182 = "decimal(18,2)"


def daily_rollup(events: DataFrame) -> DataFrame:
    """The rollup definition: per (day, event_type) counts, value sum, and
    distinct users. One map-side-combinable aggregation (countDistinct
    expands to a two-phase distinct-then-count — still shuffle-on-key)."""
    return events.groupBy(
        F.to_date(F.col("ts")).alias("event_date"),
        F.col("event_type"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast(D182)).cast("double").alias("sum_value"),
        F.countDistinct("user_id").alias("n_users"),
    )


_LEDGER = "_COMPLETED_DAYS"


def existing_rollup_days(rollup_path: str) -> set[str]:
    """Days already FULLY materialized — a directory listing intersected
    with the completion ledger, never a data scan. A day whose dir exists
    but was never recorded (crash between the write job and the ledger
    append) is treated as missing and re-aggregated; dynamic partition
    overwrite makes the redo idempotent. A ledger-less path (fresh table)
    reports nothing complete — one redundant but idempotent first pass,
    never a silently-skipped partial day."""
    if not os.path.isdir(rollup_path):
        return set()
    ledger = os.path.join(rollup_path, _LEDGER)
    if not os.path.exists(ledger):
        return set()
    with open(ledger) as f:
        recorded = {line.strip() for line in f if line.strip()}
    dirs = {
        name.split("=", 1)[1]
        for name in os.listdir(rollup_path)
        if name.startswith("event_date=")
    }
    return recorded & dirs


def _record_days_complete(rollup_path: str, days: list[str]) -> None:
    """Append ``days`` to the completion ledger atomically (write-temp +
    fsync + rename, the manifest-pointer recipe): the ledger either
    records the whole batch or none of it."""
    ledger = os.path.join(rollup_path, _LEDGER)
    prior: set[str] = set()
    if os.path.exists(ledger):
        with open(ledger) as f:
            prior = {line.strip() for line in f if line.strip()}
    tmp = ledger + ".tmp"
    with open(tmp, "w") as f:
        f.write("\n".join(sorted(prior | set(days))) + "\n")
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, ledger)


def maintain_daily_rollup(
    spark: SparkSession,
    events: DataFrame,
    rollup_path: str,
    reprocess_tail_days: int = 1,
) -> list[str]:
    """Bring the rollup up to date incrementally; returns the days written.

    Missing days are aggregated from scratch; the LAST ``reprocess_tail_days``
    existing days are re-aggregated too (they may have been partial when
    first materialized — late data lands there). Everything else is left
    untouched on disk."""
    have = existing_rollup_days(rollup_path)
    # the ONE driver-side materialization in this maintenance path: the
    # distinct day list. Bounded by the calendar (100 years ≈ 36.5k rows),
    # but cap it so a corrupt ts column (e.g. epoch-zero garbage fanning
    # out to millions of "days") fails loudly instead of OOMing the driver.
    _DAY_CAP = 100_000
    # null ts rows have no day: drop them here, or the phantom 'None' day
    # is never satisfied by a written partition and every maintenance run
    # re-queues (and claims to have written) it forever
    day_rows = (
        events.select(F.to_date(F.col("ts")).alias("d"))
        .where(F.col("d").isNotNull())
        .distinct()
        .limit(_DAY_CAP + 1)
        .collect()
    )
    if len(day_rows) > _DAY_CAP:
        raise ValueError(
            f"maintain_daily_rollup: source has more than {_DAY_CAP} distinct "
            "days — the ts column is likely corrupt; refusing to collect the "
            "day list on the driver"
        )
    source_days = {str(r["d"]) for r in day_rows}
    # guard reprocess_tail_days=0: list[-0:] is the WHOLE list, not none of it
    tail = (
        set(sorted(have)[-reprocess_tail_days:])
        if have and reprocess_tail_days > 0
        else set()
    )
    todo = sorted((source_days - have) | (tail & source_days))
    if not todo:
        return []
    batch = daily_rollup(
        events.filter(F.to_date(F.col("ts")).isin(todo))
    )
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            batch.write.mode("overwrite")
            .partitionBy("event_date")
            .parquet(rollup_path)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    _record_days_complete(rollup_path, todo)
    return todo


def read_rollup(spark: SparkSession, rollup_path: str) -> DataFrame:
    return spark.read.parquet(rollup_path)
