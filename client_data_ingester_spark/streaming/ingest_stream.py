"""Streaming ingestion (SURVEY §2.9 / §7 Phase 4).

The reference's ingest is request-scoped batch (one uploaded file per call).
Here the same pipeline is also exposed as Structured Streaming over a landing
directory: ``readStream`` (CSV/JSON file source) → ``foreachBatch`` invoking
the *same* merge used by the batch path, so batch and stream share one code
path — including the batch path's whole-file validation contract:

- the micro-batch runs the same invalid-cell gate as ``ingest_data``
  (B/ingestion/service.py:56-64 semantics): any garbage decimal/boolean cell
  or a null sku aborts the WHOLE micro-batch with zero rows changed; the raw
  batch goes to the dead-letter directory (if configured) with the abort
  reason, instead of silently merging nulls;
- exactly-once across crash/replay is transactional, not aspirational: the
  last applied epoch id is committed in the snapshot manifest's props
  atomically with the data publish, and a replayed micro-batch whose epoch is
  already recorded is a no-op. This covers the otherwise non-idempotent
  empty-sku always-insert rows, not just the keyed upserts. (Dead-letter
  writes sit outside that transaction — an error batch replayed after a
  crash can be dead-lettered twice; the TABLE is exactly-once, the error
  channel is at-least-once.)

Event-time windowed aggregation over the ``events`` table (watermarks, late
data) lives in operators/events.py; this module is the ingest stream.
"""

from __future__ import annotations

import datetime as _dt
import logging
import os
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from ..ingestion.mapping import ParserConfig, compile_mapping
from ..ingestion.parsers import ROW_IDX_COL
from ..ingestion.service import (
    _MERGE_MAX_ATTEMPTS,
    _MERGE_STALL_LIMIT,
    _conflict_backoff,
    dense_row_idx,
    merge_products,
)
from ..tables.snapshot import SnapshotConflictError, SnapshotTable

_log = logging.getLogger(__name__)


def _landing_schema(columns: list[str]) -> T.StructType:
    return T.StructType([T.StructField(c, T.StringType(), True) for c in columns])


def start_ingest_stream(
    spark: SparkSession,
    table: SnapshotTable,
    landing_dir: str,
    checkpoint_dir: str,
    parser_config: ParserConfig,
    client_id: int,
    source_columns: list[str],
    full_update: bool = False,
    fmt: str = "csv",
    dead_letter_dir: str | None = None,
    stream_id: str | None = None,
    reader_options: dict | None = None,
) -> StreamingQuery:
    """Tail ``landing_dir`` for new files and merge each micro-batch.

    ``source_columns`` declares the landing files' header (streaming sources
    need a fixed schema up front; everything is read as string, same as the
    batch parser). ``stream_id`` keys the per-stream epoch ledger in the
    table manifest (defaults to the checkpoint path — override it if the
    checkpoint directory can move between runs). ``reader_options`` pass
    through to the file source — chiefly ``maxFilesPerTrigger``, the
    landing-zone rate limit that bounds micro-batch size (and so commit
    latency + merge-shuffle memory) when a backfill drops thousands of
    files at once; AvailableNow triggers honor it across batches."""
    schema = _landing_schema(source_columns)
    reader = spark.readStream.schema(schema)
    if fmt == "csv":
        # same CSV empty/null conventions as the batch path reader: quoted
        # "" survives as the empty string (always-insert sku), \N is null
        reader = (
            reader.option("header", True)
            .option("emptyValue", "")
            .option("nullValue", "\\N")
        )
    elif fmt != "json":
        raise ValueError(f"Unsupported streaming format: {fmt!r}")
    # applied AFTER the format defaults so callers can override any of
    # them (the pass-through contract above)
    for k, v in (reader_options or {}).items():
        reader = reader.option(k, v)
    stream = reader.csv(landing_dir) if fmt == "csv" else reader.json(landing_dir)

    txn_key = f"stream_epoch:{stream_id or os.path.abspath(checkpoint_dir)}"

    def dead_letter(batch_df: DataFrame, epoch_id: int, reason: str) -> None:
        _log.warning(
            "ingest stream %s epoch %d aborted, zero rows changed: %s",
            txn_key, epoch_id, reason,
        )
        if dead_letter_dir is None:
            return
        (
            batch_df.withColumn("_epoch", F.lit(epoch_id).cast("long"))
            .withColumn("_reason", F.lit(reason))
            .write.mode("append")
            .parquet(dead_letter_dir)
        )

    def merge_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # replay guard: epoch committed atomically with the publish below
        manifest = table.current_doc()
        if int(epoch_id) <= int(manifest.props.get(txn_key, -1)):
            return
        # row order within the micro-batch (monotonically_increasing_id is
        # legal here — batch_df is a plain DataFrame inside foreachBatch)
        batch_df = batch_df.withColumn(
            ROW_IDX_COL, F.monotonically_increasing_id()
        )
        compiled = compile_mapping(parser_config, batch_df)

        # same "processed row" gate as the batch path: ≥1 mapped cell present
        if compiled.source_cols:
            present = reduce(
                lambda a, b: a | b,
                [F.col(s).isNotNull() for s in compiled.source_cols],
            )
        else:
            present = F.lit(False)
        sku_mapped = "sku" in compiled.target_cols
        bad_cols = [f"_bad_{i}" for i in range(len(compiled.invalid_flags))]
        staged = batch_df.filter(present).select(
            *compiled.projection,
            *[flag.alias(b) for flag, b in zip(compiled.invalid_flags, bad_cols)],
            ROW_IDX_COL,
        )
        if not sku_mapped:
            staged = staged.withColumn("sku", F.lit(None).cast("string"))
        staged = staged.cache()
        try:
            stats_row = staged.agg(
                F.count(F.lit(1)).alias("_processed"),
                F.sum(F.col("sku").isNull().cast("long")).alias("_null_sku"),
                *[F.sum(F.col(b).cast("long")).alias(b) for b in bad_cols],
            ).first()
            processed_count = stats_row["_processed"]
            reason = None
            for b, dst in zip(bad_cols, compiled.target_cols):
                if stats_row[b]:
                    reason = (
                        f"{stats_row[b]} invalid value(s) in column {dst!r}"
                    )
                    break
            if reason is None and processed_count and (
                stats_row["_null_sku"] or not sku_mapped
            ):
                reason = (
                    'null value in column "sku" violates not-null constraint'
                )
            if reason is not None:
                dead_letter(batch_df.drop(ROW_IDX_COL), epoch_id, reason)
                return  # whole-batch abort: zero rows changed, batch parity
            if processed_count == 0 and not full_update:
                return

            updates = staged.drop(*bad_cols)
            batch_ts = _dt.datetime.now(_dt.timezone.utc).replace(
                tzinfo=None, microsecond=0
            )
            # id-block reservation, as in the batch path (service.py):
            # the epoch's inserts mint from an exclusively-reserved TIGHT
            # block (dense row indexes — id-space cost is epoch rows, not
            # partitions·2^33), so writers on OTHER partitions never
            # force a re-merge (the commit rebases its manifest delta
            # onto the new head) and can never collide on ids. An epoch
            # REPLAY after a crash reserves a fresh block — burned ids,
            # never duplicate ones (the txn_key guard above skips epochs
            # that already committed).
            updates, id_span = dense_row_idx(updates)
            if id_span == 0:
                id_base, reserved_top = 0, None
            else:
                id_base = table.reserve_id_block(id_span)
                reserved_top = id_base + id_span
            # same optimistic-concurrency loop as the batch path
            # (service.py): the merge is derived from a snapshot read, so
            # a concurrent writer ON THIS PARTITION (batch ingest, another
            # stream on a different txn_key) landing in between must force
            # a re-read and re-merge — an unguarded publish would drop the
            # racer's rows
            last_conflict: Exception | None = None
            losses = 0
            stalled = 0
            last_version = -1
            while True:
                if losses:
                    # same contention policy as the batch path: jitter
                    # the losing herd; progress-based retry (see
                    # service.py — a loss where the head advanced burns
                    # no stall budget, so liveness holds for any finite
                    # writer count)
                    _conflict_backoff(min(losses, 10))
                manifest = table.current_doc()
                # re-check the replay guard EVERY attempt, not just at
                # entry: a crash between the commit point and the
                # pointer publish leaves this epoch committed behind a
                # stale pointer — the replay's first attempt then
                # collides, the collision self-heals the pointer, and
                # without this re-check the retry would re-merge
                # against the healed head (which already contains this
                # epoch) and apply it TWICE (duplicated always-insert
                # rows with fresh ids). Found by the r13 review.
                if int(epoch_id) <= int(manifest.props.get(txn_key, -1)):
                    return
                # pin the read to the version the conflict guard
                # compares against (the batch path's convention): an
                # unpinned read could see a commit newer than
                # expected_version and spend a wasted conflict retry
                current = table.read(
                    spark,
                    client_id,
                    version=manifest.version if manifest.version else None,
                )
                merged = merge_products(
                    current,
                    updates,
                    compiled.distinct_targets,
                    client_id,
                    full_update,
                    batch_ts,
                    id_base,
                )
                try:
                    props = {txn_key: int(epoch_id)}
                    if reserved_top is not None:
                        # the block top is a floor; overwrite_partitions
                        # keeps the ledger monotone vs head and data
                        props["max_id"] = reserved_top
                    table.overwrite_partitions(
                        merged,
                        [client_id],
                        props=props,
                        expected_version=manifest.version,
                    )
                    break
                except SnapshotConflictError as e:
                    last_conflict = e
                    losses += 1
                    stalled = (
                        stalled + 1
                        if manifest.version == last_version
                        else 0
                    )
                    last_version = manifest.version
                    if (
                        stalled >= _MERGE_STALL_LIMIT
                        or losses >= _MERGE_MAX_ATTEMPTS
                    ):
                        raise last_conflict
                    continue
        finally:
            staged.unpersist()

    return (
        stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
