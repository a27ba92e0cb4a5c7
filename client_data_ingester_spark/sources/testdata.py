"""Schema-adaptive parquet loaders for the synthetic testdata tables.

The events table's ``ts`` column has shipped in two different parquet
encodings across testdata generations:

* ``TIMESTAMP(NANOS)`` — not natively readable by Spark; with
  ``spark.sql.legacy.parquet.nanosAsLong=true`` it arrives as BIGINT
  nanoseconds and needs ``timestamp_micros(ts DIV 1000)`` (integer floor
  division matches DuckDB's ns→us truncation).
* ``TIMESTAMP(MICROS)`` — arrives as TIMESTAMP or TIMESTAMP_NTZ (depending
  on ``isAdjustedToUTC`` and ``spark.sql.parquet.inferTimestampNTZ.enabled``)
  and only needs a cast to the session-canonical TIMESTAMP type.

Branching on the *loaded dtype* rather than assuming one encoding makes the
loader robust to either generation (and to a future regeneration).  At 100 TB
this normalization is a zero-shuffle projection folded into the parquet scan,
so it costs nothing beyond the cast expression itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def normalize_event_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Return ``df`` with ``col`` as a session-canonical TIMESTAMP column.

    Accepts any of the encodings the testdata has used: BIGINT nanoseconds
    (legacy nanosAsLong read), TIMESTAMP, or TIMESTAMP_NTZ.  With the session
    timezone pinned to UTC, NTZ→LTZ is a value-preserving cast.
    """
    dtype = dict(df.dtypes).get(col)
    if dtype is None:
        return df
    if dtype == "bigint":
        # nanos → micros with integer division (exact; floor matches DuckDB's
        # ns→us truncation), then a proper timestamp column
        return df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` DIV 1000")))
    if dtype.startswith("timestamp"):
        return df.withColumn(col, F.col(col).cast("timestamp"))
    raise TypeError(
        f"events column {col!r} has unsupported dtype {dtype!r}; "
        "expected bigint (nanos), timestamp, or timestamp_ntz"
    )


#: (applicationId, sf_dir, name) -> lazy DataFrame HANDLE. This caches
#: the unresolved plan + inferred schema only — the catalog-metadata
#: read (`spark.read.parquet` re-reads the file footer over py4j on
#: every call, ~0.1-0.2 s; a 7-table audit paid ~1.5 s of plan-BUILD
#: per invocation, more than its execution). No rows, partial results,
#: or computed values are ever stored: every action on the returned
#: DataFrame plans and scans the parquet files from scratch. Same
#: immutable-inputs-per-session assumption as Spark's own
#: filesourcePartitionFileCacheSize. Keyed by applicationId so a new
#: session never sees a stale handle.
_HANDLE_CACHE: "dict[tuple[str, str, str], DataFrame]" = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table, normalizing the events timestamp column.

    ``spark.sql.legacy.parquet.nanosAsLong`` is pinned so a TIMESTAMP(NANOS)
    encoding degrades to a readable BIGINT instead of an unreadable-type
    error; :func:`normalize_event_ts` then branches on what actually loaded.
    """
    key = (spark.sparkContext.applicationId, sf_dir, name)
    cached = _HANDLE_CACHE.get(key)
    if cached is not None:
        return cached
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = normalize_event_ts(df)
    _HANDLE_CACHE[key] = df
    return df
