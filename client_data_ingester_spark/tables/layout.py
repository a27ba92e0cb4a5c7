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

        # F.hash rejects zero args and MapType columns — including maps
        # NESTED in arrays/structs, so the check must recurse, not just
        # inspect the top-level type. Serialize any map-bearing column to
        # JSON first, and fall back to a constant salt (no split — every
        # column is a partition column, so rows within a dir are
        # indistinguishable and any content-derived split is impossible).
        def _has_map(dt) -> bool:
            tn = dt.typeName()
            if tn == "map":
                return True
            if tn == "array":
                return _has_map(dt.elementType)
            if tn == "struct":
                return any(_has_map(f.dataType) for f in dt.fields)
            return False

        hashable = [
            F.to_json(F.col(c))
            if _has_map(df.schema[c].dataType)
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


# ---------------------------------------------------------------------------
# Z-order (Morton) clustering: multi-dimensional data skipping


def zorder_key(
    df: DataFrame, cols: list[str], bits: int = 16
) -> "tuple[DataFrame, str]":
    """Attach a Morton (Z-order) clustering key over ``cols``.

    A 1-D sort gives tight parquet min/max stats on the sort column only —
    a predicate on any OTHER column touches every file. Interleaving the
    bits of several columns' rank-normalized values gives a key whose sort
    order is a space-filling curve: each output file covers a small hyper-
    rectangle, so min/max stats stay tight on EVERY participating column
    and a selective predicate on any of them prunes files/row groups.

    Normalization is min/max-linear into ``bits`` bits per column (one
    cheap map-side-combined aggregate for the bounds — 2 scalars per
    column on the driver, scale-independent). Numeric columns cast to
    double directly; DATE goes through ``datediff`` and TIMESTAMP through
    an epoch-seconds cast (DATE → DOUBLE is a Spark type ERROR, not a
    coercion — a bare double cast broke the module's own (event_date,
    user_id) use case at plan time). Any monotone rendering preserves the
    curve, so the timezone the epoch cast implies is irrelevant. NULLs
    map to bucket 0 (they cluster together at the curve's origin).

    Returns ``(df_with_key, key_col_name)``; the key is a plain BIGINT
    column built from shift/and/or expressions — whole-stage-codegen'd,
    no UDF.

    ``bits`` is clamped so the interleaved key fits the 63 value bits of
    a signed BIGINT (``len(cols) * bits <= 63``): without the clamp, a
    4-column key at the default 16 bits reaches bit 63 (the sign bit —
    high-curve rows sort BEFORE the origin) and 5+ columns alias through
    Java's mod-64 shift, silently colliding different columns' bits.
    Coarser per-column resolution only widens each file's hyper-
    rectangle; the curve ordering stays correct.
    """
    if len(cols) * bits > 63:
        bits = 63 // len(cols)

    def _as_double(col: str):
        dt = df.schema[col].dataType.typeName()
        c = F.col(col)
        if dt == "date":
            return F.datediff(c, F.lit("1970-01-01")).cast("double")
        if dt in ("timestamp", "timestamp_ntz"):
            return c.cast("timestamp").cast("double")  # epoch seconds
        return c.cast("double")

    bounds_row = df.select(
        *[
            c
            for col in cols
            for c in (
                F.min(_as_double(col)).alias(f"min_{col}"),
                F.max(_as_double(col)).alias(f"max_{col}"),
            )
        ]
    ).collect()[0]
    n = len(cols)
    scaled = []
    top = (1 << bits) - 1
    for col in cols:
        lo = bounds_row[f"min_{col}"]
        hi = bounds_row[f"max_{col}"]
        v = _as_double(col)
        if lo is None or hi is None or hi == lo:
            scaled.append(F.lit(0).cast("long"))
        else:
            frac = (v - F.lit(lo)) / F.lit(hi - lo)
            # NULL check must come first: least()/greatest() IGNORE nulls
            # (a coalesce around least(NULL, top) would yield top, sending
            # NULL rows to the far corner of the curve instead of origin)
            scaled.append(
                F.when(v.isNull(), F.lit(0).cast("long")).otherwise(
                    F.least(
                        F.floor(frac * F.lit(top + 1)).cast("long"),
                        F.lit(top).cast("long"),
                    )
                )
            )
    key = F.lit(0).cast("long")
    for b in range(bits):
        for i, s in enumerate(scaled):
            bit = F.shiftright(s, b).bitwiseAND(F.lit(1).cast("long"))
            key = key.bitwiseOR(F.shiftleft(bit, b * n + i))
    out = df.withColumn("_zkey", key)
    return out, "_zkey"


def write_zordered(
    df: DataFrame,
    path: str,
    zorder_cols: list[str],
    num_files: int = 16,
    bits: int = 16,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet clustered on the Z-order curve of
    ``zorder_cols``.

    ``repartitionByRange`` on the key range-partitions the curve (a
    sampled global sort boundary — one extra pass over the key column
    only), and the within-partition sort makes row-group stats monotone
    inside each file. The key itself is dropped before write; skipping
    works off the ORIGINAL columns' min/max footers, so readers need no
    knowledge of the layout.
    """
    keyed, kcol = zorder_key(df, zorder_cols, bits)
    (
        keyed.repartitionByRange(num_files, F.col(kcol))
        .sortWithinPartitions(kcol)
        .drop(kcol)
        .write.mode(mode)
        .parquet(path)
    )
