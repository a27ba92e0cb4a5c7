"""File-level zone maps ([EXT]): a manifest table of per-file column
min/max statistics, and a reader that plans scans FROM the manifest —
the data-skipping layer table formats (Iceberg/Delta) put between the
query and the file listing, expressed over plain parquet.

Partition dirs prune on the partition value only (layout.py); zone maps
prune on ANY sorted-ish column inside the surviving dirs, at file
granularity, before a single data footer is opened by the query itself:

- ``build_manifest`` reads each data file's parquet FOOTER (row-group
  stats, folded to file min/max) and lands them in a tiny manifest table
  — one row per (file, column). The footer reads are distributed with
  ``mapInPandas`` over the file list (pyarrow on the executors, batched;
  the driver never touches a footer), so building the manifest for a
  100 TB table is a parallel metadata pass over O(files), not O(bytes).
  The manifest is a write-time artifact: rebuild it per table version,
  like the IVF/bloom indexes.
- ``prune_files`` intersects a column range predicate with the manifest:
  a file survives unless its [min, max] provably excludes the range.
  Files with missing stats always survive (pruning is evidence-based,
  never assumption-based).
- ``read_pruned`` reads ONLY the surviving files (with ``basePath`` set
  so Hive partition columns still materialize) and re-applies the
  predicate — pruning is an optimization, the filter stays authoritative,
  so results are byte-identical to the full scan.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("file", T.StringType(), False),
        T.StructField("col_name", T.StringType(), False),
        T.StructField("n_rows", T.LongType(), True),
        T.StructField("min_num", T.DoubleType(), True),
        T.StructField("max_num", T.DoubleType(), True),
        T.StructField("min_str", T.StringType(), True),
        T.StructField("max_str", T.StringType(), True),
    ]
)


def list_data_files(table_path: str) -> list[str]:
    """Every parquet data file under ``table_path`` (recursive, sorted —
    deterministic manifest row order for a given tree).

    DRIVER-side walk: bounded by file count, not data size — fine to
    ~10⁵ files. Beyond that, source the list from the table's own
    metadata (:func:`build_manifest_for_snapshot` — the snapshot manifest
    already enumerates every data directory) or list per-directory on the
    executors (:func:`list_data_files_distributed`)."""
    out = []
    for root, dirs, files in os.walk(table_path):
        dirs.sort()
        for name in sorted(files):
            if name.endswith(".parquet") and not name.startswith("_"):
                out.append(os.path.join(root, name))
    return out


def list_data_files_distributed(
    spark: SparkSession, dirs: list[str]
) -> list[str]:
    """List parquet data files under ``dirs`` ON THE EXECUTORS — one walk
    task per directory, so listing a 10⁶-file table is a parallel metadata
    pass and the driver only receives the final path list. (Paths must be
    visible from executors — true for any shared POSIX mount; an object
    store would swap the walk for its native list API.)"""
    if not dirs:
        return []
    sc = spark.sparkContext
    rdd = sc.parallelize(sorted(set(dirs)), min(len(set(dirs)), 64))
    # one walk task per directory, same predicate as the driver-side
    # listing (list_data_files is a module-level function, so the closure
    # ships it by reference — one definition, two execution sites)
    return sorted(set(rdd.flatMap(list_data_files).collect()))


def build_manifest(
    spark: SparkSession,
    table_path: str,
    columns: list[str],
    files: list[str] | None = None,
) -> DataFrame:
    """One manifest row per (data file, column) with file-level min/max.

    The file list parallelizes across executors; each task opens only the
    FOOTERS of its files with pyarrow and folds row-group stats to file
    stats. Numeric and temporal stats land in ``min_num``/``max_num``
    (timestamps as epoch micros), strings in ``min_str``/``max_str``.

    ``files`` overrides the driver-side walk with an explicit list (e.g.
    sourced from a snapshot manifest or a distributed listing).
    """
    if files is None:
        files = list_data_files(table_path)
    if not files:
        raise FileNotFoundError(f"no parquet data files under {table_path}")
    files_df = spark.createDataFrame(
        [(f,) for f in files], "file string"
    ).repartition(min(len(files), 32))
    cols = list(columns)

    def _footer_stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pyarrow.parquet as pq

        for pdf in batches:
            rows = []
            for path in pdf["file"]:
                md = pq.read_metadata(path)
                name_to_idx = {
                    md.schema.column(i).path: i
                    for i in range(len(md.schema))
                }
                for col in cols:
                    idx = name_to_idx.get(col)
                    mins, maxs = [], []
                    if idx is not None:
                        for rg in range(md.num_row_groups):
                            st = md.row_group(rg).column(idx).statistics
                            if st is None or not st.has_min_max:
                                mins, maxs = [], []
                                break
                            mins.append(st.min)
                            maxs.append(st.max)
                    row = {
                        "file": path,
                        "col_name": col,
                        "n_rows": md.num_rows,
                        "min_num": None,
                        "max_num": None,
                        "min_str": None,
                        "max_str": None,
                    }
                    if mins:
                        lo, hi = min(mins), max(maxs)
                        if isinstance(lo, bool) or isinstance(lo, str):
                            row["min_str"], row["max_str"] = str(lo), str(hi)
                        elif isinstance(lo, (int, float)):
                            row["min_num"] = float(lo)
                            row["max_num"] = float(hi)
                        else:  # datetime/date -> epoch micros
                            ts = pd.Timestamp(lo), pd.Timestamp(hi)
                            row["min_num"] = float(ts[0].value // 1000)
                            row["max_num"] = float(ts[1].value // 1000)
                    rows.append(row)
            yield pd.DataFrame(
                rows, columns=[f.name for f in MANIFEST_SCHEMA.fields]
            )

    return files_df.mapInPandas(_footer_stats, MANIFEST_SCHEMA)


def write_manifest(
    spark: SparkSession, table_path: str, columns: list[str], manifest_path: str
) -> None:
    """Persist the manifest (the write-time half of the skipping story)."""
    build_manifest(spark, table_path, columns).write.mode(
        "overwrite"
    ).parquet(manifest_path)


def update_manifest(
    spark: SparkSession,
    table_path: str,
    columns: list[str],
    existing: DataFrame,
    files: list[str] | None = None,
) -> DataFrame:
    """Incrementally refresh a manifest against the live tree: keep the
    existing stats rows for files still present, footer-read ONLY the
    files added since the manifest was built, drop rows for vanished
    files. Appending one file to a 10⁶-file table costs one footer read,
    not a full metadata pass — the maintenance half of the zone-map
    story (pair with ``write_manifest`` for the initial build).

    ``files`` (the live listing) defaults to a driver-side walk — pass
    the list from ``list_data_files_distributed`` or the table's own
    metadata at large file counts, same contract as ``build_manifest``.
    """
    existing_cols = {
        r["col_name"]
        for r in existing.select("col_name").distinct().collect()
    }
    if set(columns) != existing_cols:
        raise ValueError(
            f"column set changed ({sorted(existing_cols)} -> "
            f"{sorted(columns)}): rebuild the manifest instead of "
            "updating it, or old files silently lose stats for the new "
            "columns"
        )
    if files is None:
        files = list_data_files(table_path)
    # the only driver-side materialization is the ADDITIONS list (what
    # build_manifest must footer-read); the existing manifest is never
    # collected — membership runs as joins against the live-file relation
    live_df = spark.createDataFrame(
        [(f,) for f in sorted(set(files))], "file string"
    )
    new_files = sorted(
        r["file"]
        for r in live_df.join(
            existing.select("file").distinct(), "file", "left_anti"
        ).collect()
    )
    kept = existing.join(live_df, "file")
    if not new_files:
        return kept
    fresh = build_manifest(spark, table_path, columns, files=new_files)
    return kept.unionByName(fresh)


def build_manifest_for_snapshot(
    spark: SparkSession, table, columns: list[str]
) -> DataFrame:
    """Zone-map manifest for a :class:`SnapshotTable` with NO driver-side
    walk: the snapshot manifest already enumerates every data directory of
    the current version, and the per-directory file listing runs on the
    executors. This is the 100 TB path — the driver handles directory
    *names* (O(partitions)), never the file tree."""
    snap = table.current_manifest()
    if getattr(snap, "stale", None):
        # a degraded shared dir holds rows of partitions that were
        # later overwritten elsewhere; SnapshotTable.read anti-filters
        # them, but this module reads the listed files RAW — a zone-map
        # scan would resurrect the superseded rows and break the
        # pruned-read ≡ full-scan contract. Refuse loudly: compact the
        # partitions still referencing the degraded dirs first.
        raise ValueError(
            "snapshot has stale rows in shared dirs "
            f"({sorted(snap.stale)}); compact the partitions that still "
            "reference them before building a zone-map manifest"
        )
    dirs = sorted(
        {
            os.path.join(table.root, d)
            for ds in snap.partitions.values()
            for d in ds
        }
    )
    files = list_data_files_distributed(spark, dirs)
    if not files:
        raise FileNotFoundError(
            f"snapshot at {table.root} (version {snap.version}) has no "
            "data files"
        )
    return build_manifest(spark, table.root, columns, files=files)


def prune_files(
    manifest: DataFrame,
    col_name: str,
    lo: float | None = None,
    hi: float | None = None,
) -> list[str]:
    """Files whose [min, max] for ``col_name`` may intersect [lo, hi].

    A file is dropped only when its stats PROVE exclusion
    (``max < lo`` or ``min > hi``); missing stats keep the file. The
    manifest is tiny (files × columns rows), so the collect here is the
    planner's file-listing step, not a data read.
    """
    m = manifest.filter(F.col("col_name") == col_name)
    excluded = F.lit(False)
    # Non-numeric bounds (string/boolean prune requests) can never prove
    # exclusion — min_num/max_num hold only the numeric/temporal domain —
    # so they keep every file: correct-but-unpruned, not an error.
    def _as_num(v):
        try:
            return float(v)
        except (TypeError, ValueError):
            return None

    lo_num = _as_num(lo) if lo is not None else None
    hi_num = _as_num(hi) if hi is not None else None
    if lo_num is not None:
        excluded = excluded | (F.col("max_num") < F.lit(lo_num))
    if hi_num is not None:
        excluded = excluded | (F.col("min_num") > F.lit(hi_num))
    keep = m.filter(
        F.col("min_num").isNull() | ~excluded
    )
    files = sorted(r["file"] for r in keep.select("file").collect())
    if not files and m.limit(1).count() == 0:
        # the manifest carries NO stats rows for this column (it wasn't in
        # the build's column list). "Missing stats keep the file" applies
        # to the whole table, not just per-row — returning [] here would
        # silently turn an unmanifested-column prune into zero results.
        return sorted(
            r["file"] for r in manifest.select("file").distinct().collect()
        )
    return files


def read_pruned(
    spark: SparkSession,
    table_path: str,
    manifest: DataFrame,
    col_name: str,
    lo: float | None = None,
    hi: float | None = None,
    live_files: list[str] | None = None,
) -> DataFrame:
    """Scan only the files the manifest can't exclude, then re-apply the
    range predicate (authoritative — results match the full scan exactly;
    zone maps only shrink the file list).

    Stale-manifest safety: the manifest is a write-time artifact, so the
    live tree is cross-checked per read. A data file written AFTER the
    manifest was built has no stats row — it is treated like a
    missing-stats file (evidence-based keep, always scanned), never
    silently excluded; a manifested file that has since been compacted or
    GC'd away is dropped from the scan list instead of failing the read.

    ``live_files`` overrides the cross-check's driver-side walk (bounded
    by file count — fine to ~10⁵ files): at snapshot scale pass the list
    the table's own metadata already holds (the snapshot manifest dirs +
    ``list_data_files_distributed``), so a pruned read never pays an
    O(files) serial listing.
    """
    files = prune_files(manifest, col_name, lo, hi)
    live = set(
        live_files if live_files is not None else list_data_files(table_path)
    )
    manifested = {
        r["file"] for r in manifest.select("file").distinct().collect()
    }
    unmanifested = live - manifested  # stale manifest: no evidence -> keep
    files = sorted((set(files) & live) | unmanifested)
    if not files:
        full = spark.read.parquet(table_path)
        return full.filter(F.lit(False))
    df = spark.read.option("basePath", table_path).parquet(*files)
    cmp_col, render = _stats_domain_col(df, col_name)
    pred = F.lit(True)
    if lo is not None:
        pred = pred & (cmp_col >= F.lit(render(lo)))
    if hi is not None:
        pred = pred & (cmp_col <= F.lit(render(hi)))
    return df.filter(pred)


def _stats_domain_col(df: DataFrame, col_name: str):
    """The (column, literal-renderer) pair for ``read_pruned``'s re-applied
    predicate, matched to the manifest's ``min_num``/``max_num`` domain so
    the comparison is like-with-like. ``build_manifest`` stores numerics as
    doubles and timestamps/dates as epoch MICROSECONDS — comparing a raw
    timestamp column to a double literal is a Spark type error
    (DATATYPE_MISMATCH.BINARY_OP_DIFF_TYPES), not an implicit coercion, so
    the temporal columns the manifest explicitly supports need the same
    epoch-micros rendering at read time.

    Non-numeric types (string, boolean) get NO file-level pruning — their
    stats land in ``min_str``/``max_str``, which ``prune_files`` never
    consults, so every file is kept — but the predicate itself is still
    applied CORRECTLY, as a raw-column comparison against the caller's
    raw bound. (An earlier revision raised ValueError here, which turned
    existing correct-but-unpruned callers into hard errors.)"""
    dt = df.schema[col_name].dataType
    if isinstance(dt, T.TimestampType):
        return (
            F.unix_micros(F.col(col_name)).cast("double"),
            float,
        )
    if isinstance(dt, T.DateType):
        # days since epoch -> micros at midnight UTC, matching the
        # pd.Timestamp(...).value // 1000 rendering in build_manifest
        # (independent of the session timezone, unlike cast-to-timestamp)
        return (
            F.datediff(F.col(col_name), F.lit("1970-01-01")).cast("double")
            * F.lit(86400.0 * 1_000_000.0),
            float,
        )
    if isinstance(dt, T.NumericType):
        return F.col(col_name).cast("double"), float
    # correct-but-unpruned fallback: compare the raw column to the raw bound
    return F.col(col_name), lambda v: v
