"""One-pass table profiling ([EXT]) — the ANALYZE/data-quality primitive a
pipeline runs on every new drop before it is allowed into the corpus:
per-column null counts, distinct counts, and type-appropriate min/max,
computed in a SINGLE scan.

Shape: one wide ``agg`` carries every per-column statistic, then a
``stack`` pivots the 1-row result into one row per column. Numeric min/max
land in DOUBLE columns; string and timestamp min/max land in a VARCHAR
pair (timestamps rendered with an explicit format so both engines emit one
canonical string).

Two ndv modes, same output schema:

* ``exact_ndv=True`` — ``count_distinct`` per column. Catalyst compiles the
  multi-distinct into one Expand + partial-aggregate pass: the scan happens
  once but every row is replicated ×(k+1) before the partial aggregate, and
  the partial-aggregate state is proportional to the per-partition distinct
  count. Right for dimension tables and for the driver's hash-checked
  oracle (deterministic).
* ``exact_ndv=False`` — ``approx_count_distinct`` (Spark's JVM-side
  HyperLogLog++, relativeSD=``rsd``). No Expand at all: one plain
  hash-aggregate whose per-column state is a fixed register array, map-side
  partial merge, a single 1-row-per-task shuffle. This is the 100 TB shape
  for wide fact tables. The estimate is engine-specific (not hash-matchable
  against DuckDB); when a cross-engine-auditable sketch is required, use
  the open-state HLL family in ``operators/sketch.py`` (registers are
  engine-independent integers) instead of a profile row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TS_FMT = "yyyy-MM-dd HH:mm:ss"


def profile_table(
    table: DataFrame,
    columns: list[tuple[str, str]],
    exact_ndv: bool = True,
    rsd: float = 0.05,
) -> DataFrame:
    """Profile ``columns`` (list of (name, kind) with kind in
    ``num|str|ts``) in one scan; one output row per column.

    Output: col_name, n_rows, n_nulls, ndv, min_num, max_num (DOUBLE,
    NULL for non-numeric), min_str, max_str (VARCHAR, NULL for numeric).
    ``exact_ndv=False`` swaps the exact multi-distinct (Expand plan) for
    HLL++ ``approx_count_distinct`` with relative error ``rsd`` — identical
    output schema, bounded aggregation state.
    """
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for name, kind in columns:
        c = F.col(name)
        aggs.append(
            F.sum(F.when(c.isNull(), 1).otherwise(0))
            .cast("long")
            .alias(f"{name}__nulls")
        )
        if exact_ndv:
            aggs.append(F.count_distinct(c).alias(f"{name}__ndv"))
        else:
            aggs.append(F.approx_count_distinct(c, rsd).alias(f"{name}__ndv"))
        if kind == "num":
            aggs.append(F.min(c).cast("double").alias(f"{name}__min_num"))
            aggs.append(F.max(c).cast("double").alias(f"{name}__max_num"))
        elif kind == "ts":
            aggs.append(
                F.date_format(F.min(c), TS_FMT).alias(f"{name}__min_str")
            )
            aggs.append(
                F.date_format(F.max(c), TS_FMT).alias(f"{name}__max_str")
            )
        else:
            aggs.append(F.min(c).cast("string").alias(f"{name}__min_str"))
            aggs.append(F.max(c).cast("string").alias(f"{name}__max_str"))
    one = table.agg(*aggs)

    stack_args = []
    for name, kind in columns:
        mn_num = f"{name}__min_num" if kind == "num" else "CAST(NULL AS DOUBLE)"
        mx_num = f"{name}__max_num" if kind == "num" else "CAST(NULL AS DOUBLE)"
        mn_str = "CAST(NULL AS STRING)" if kind == "num" else f"{name}__min_str"
        mx_str = "CAST(NULL AS STRING)" if kind == "num" else f"{name}__max_str"
        stack_args.append(
            f"'{name}', __rows, {name}__nulls, {name}__ndv, "
            f"{mn_num}, {mx_num}, {mn_str}, {mx_str}"
        )
    n = len(columns)
    return one.select(
        F.expr(
            f"stack({n}, {', '.join(stack_args)}) AS "
            "(col_name, n_rows, n_nulls, ndv, min_num, max_num, "
            "min_str, max_str)"
        )
    )
