"""Shard compaction for the append-only ``batch_id=N`` stream artifacts.

Every foreachBatch sink in this package lands one idempotent shard dir
per micro-batch (``shard_dir/batch_id=N`` + overwrite — the replay-safe
merge-on-read pattern of streaming/users_stream.py). That bounds WRITE
cost, but the READ side accumulates one directory (and its part files)
per batch forever: after a week of 1-minute batches a reader lists ~10k
dirs before scanning a byte. ``compact_batch_shards`` folds the settled
prefix of shards into one, so the read-side file count is O(1) in batch
count between compactions — the same role ``sketch_stream.
compact_registers`` plays for the HLL/CMS register shards, generalized
to every batch-shard artifact (cluster band/edge shards, dedup/decontam
doc shards, PQ code shards, user first-seen shards).

Safety model (why this is correct under crash and replay):

- **Replay**: Structured Streaming replays at most the LAST uncommitted
  batch; committed batches never re-run. Compaction therefore folds only
  shards strictly below the newest ``keep_last`` ids — a replayed batch
  overwrites its OWN still-unfolded dir, never the compacted one.
- **Crash mid-compaction**: the fold is staged under ``_compact_tmp``
  (underscore-prefixed paths are invisible to Spark's partition
  discovery), then published by overwriting the fold set's HIGHEST
  ``batch_id`` dir, then the now-redundant source dirs are removed. A
  crash between publish and removal leaves the folded rows present
  TWICE (in the compacted dir and in not-yet-deleted source dirs) —
  harmless for every consumer this package points at it, because their
  read-side merges are idempotent by construction: band keys feed
  ``collect_set`` bucket expansion, candidate edges feed ``distinct`` /
  connected components, registers max-merge, first-seen min-merges, and
  doc shards are deduplicated by the caller-supplied ``dedupe_cols``.
  Re-running compaction converges (it re-folds whatever is left).
- **Watermarked consumers** (``cluster_stream.refresh_cluster_index``):
  folding shards ≤ K into ``batch_id=K`` can resurface already-folded
  edges above a refresh watermark W < K; ``warm_start_clusters`` is
  at-least-once-safe (edges already in the closure map to one root and
  vanish), so the refresh stays exact.

At 100 TB this is the standard lakehouse small-files job (OPTIMIZE /
rewrite_data_files): run it from a maintenance schedule, not the hot
ingest path.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def batch_shard_ids(shard_dir: str) -> list[int]:
    """Sorted numeric ``batch_id=N`` partition ids under ``shard_dir``
    (missing dir → empty list: the nothing-streamed-yet state)."""
    if not os.path.isdir(shard_dir):
        return []
    ids = []
    for d in os.listdir(shard_dir):
        if d.startswith("batch_id="):
            try:
                ids.append(int(d.split("=", 1)[1]))
            except ValueError:
                continue
    return sorted(ids)


def compact_batch_shards(
    spark: SparkSession,
    shard_dir: str,
    keep_last: int = 1,
    min_shards: int = 8,
    dedupe_cols: list[str] | None = None,
) -> int | None:
    """Fold all but the newest ``keep_last`` shard dirs into a single
    ``batch_id=<highest folded id>`` dir. Returns that id, or None when
    there are fewer than ``min_shards`` shards (nothing worth folding —
    compaction itself costs a full rewrite of the folded bytes, so it
    should run at a cadence, not per batch; with a fixed cadence the
    read-side dir count is bounded by cadence + keep_last, i.e. O(1) in
    total batch count).

    ``dedupe_cols``: for sinks whose rows are NOT naturally set-merged
    on read (e.g. per-document output shards), dropDuplicates on these
    columns during the fold so a crash-window re-fold cannot multiply
    rows across compaction generations.
    """
    ids = batch_shard_ids(shard_dir)
    if len(ids) < max(min_shards, keep_last + 2):
        return None
    fold = ids[: len(ids) - keep_last]
    target = fold[-1]
    src = spark.read.option("basePath", shard_dir).parquet(
        *[f"{shard_dir}/batch_id={b}" for b in fold]
    )
    data_cols = [c for c in src.columns if c != "batch_id"]
    folded: DataFrame = src.select(*data_cols)
    if dedupe_cols:
        folded = folded.dropDuplicates(dedupe_cols)
    tmp = os.path.join(shard_dir, "_compact_tmp")
    folded.write.mode("overwrite").parquet(tmp)
    # publish: the tmp read is a fresh scan (grouped by
    # files.maxPartitionBytes, so a thousand tiny shards re-emerge as a
    # handful of right-sized files), and overwriting the target — one of
    # the fold sources — is safe because its bytes were already staged
    spark.read.parquet(tmp).write.mode("overwrite").parquet(
        f"{shard_dir}/batch_id={target}"
    )
    for b in fold[:-1]:
        shutil.rmtree(f"{shard_dir}/batch_id={b}", ignore_errors=True)
    shutil.rmtree(tmp, ignore_errors=True)
    return target
