"""Streaming ingestion (SURVEY §2.9 / §7 Phase 4).

The reference's ingest is request-scoped batch (one uploaded file per call).
Here the same pipeline is also exposed as Structured Streaming over a landing
directory: ``readStream`` (CSV/JSON file source) → ``foreachBatch`` invoking
the *same* merge used by the batch path, so batch and stream share one code
path. Per-file atomicity maps to per-microbatch atomicity (the snapshot swap
inside foreachBatch is the transactional boundary; the checkpoint gives
exactly-once across restarts — a microbatch replayed after a crash re-merges
idempotently because the merge is keyed upsert, not append).

Event-time windowed aggregation over the ``events`` table (watermarks, late
data) lives in operators/events.py; this module is the ingest stream.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from ..ingestion.mapping import ParserConfig, compile_mapping
from ..ingestion.parsers import ROW_IDX_COL
from ..ingestion.service import merge_products
from ..tables.snapshot import SnapshotTable


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
) -> StreamingQuery:
    """Tail ``landing_dir`` for new files and merge each micro-batch.

    ``source_columns`` declares the landing files' header (streaming sources
    need a fixed schema up front; everything is read as string, same as the
    batch parser)."""
    schema = _landing_schema(source_columns)
    reader = spark.readStream.schema(schema)
    if fmt == "csv":
        stream = reader.option("header", True).option("emptyValue", "").csv(
            landing_dir
        )
    elif fmt == "json":
        stream = reader.json(landing_dir)
    else:
        raise ValueError(f"Unsupported streaming format: {fmt!r}")

    def merge_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # row order within the micro-batch (monotonically_increasing_id is
        # legal here — batch_df is a plain DataFrame inside foreachBatch)
        batch_df = batch_df.withColumn(
            ROW_IDX_COL, F.monotonically_increasing_id()
        )
        compiled = compile_mapping(parser_config, batch_df)
        updates = batch_df.select(*compiled.projection, ROW_IDX_COL)
        if "sku" not in compiled.target_cols:
            updates = updates.withColumn("sku", F.lit(None).cast("string"))
        updates = updates.filter(F.col("sku").isNotNull())
        current = table.read(spark, client_id)
        manifest = table.current_manifest()
        id_base = int(manifest.props.get("max_id", 0))
        n = updates.count()
        batch_ts = _dt.datetime.now(_dt.timezone.utc).replace(
            tzinfo=None, microsecond=0
        )
        merged = merge_products(
            current,
            updates,
            compiled.target_cols,
            client_id,
            full_update,
            batch_ts,
            id_base,
        )
        table.overwrite_partitions(
            merged, [client_id], props={"max_id": id_base + max(n, 1)}
        )

    return (
        stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
