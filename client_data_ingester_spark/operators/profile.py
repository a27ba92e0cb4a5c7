"""One-pass table profiling ([EXT]) — the ANALYZE/data-quality primitive a
pipeline runs on every new drop before it is allowed into the corpus:
per-column null counts, exact distinct counts, and type-appropriate
min/max, computed in a SINGLE scan.

Shape: one wide ``agg`` carries every per-column statistic (Catalyst
compiles the multi-distinct into one Expand + partial-aggregate pass — the
scan happens once, and each executor pre-reduces before the shuffle), then
a ``stack`` pivots the 1-row result into one row per column. Numeric
min/max land in DOUBLE columns; string and timestamp min/max land in a
VARCHAR pair (timestamps rendered with an explicit format so both engines
emit one canonical string).

At 100 TB: the Expand multiplies scan rows by the distinct-column count
before the partial aggregate absorbs them — for very wide tables swap the
exact ndv for the mergeable HLL sketch (operators/sketch.py) column by
column; the row layout here is the contract either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TS_FMT = "yyyy-MM-dd HH:mm:ss"


def profile_table(table: DataFrame, columns: list[tuple[str, str]]) -> DataFrame:
    """Profile ``columns`` (list of (name, kind) with kind in
    ``num|str|ts``) in one scan; one output row per column.

    Output: col_name, n_rows, n_nulls, ndv, min_num, max_num (DOUBLE,
    NULL for non-numeric), min_str, max_str (VARCHAR, NULL for numeric).
    """
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for name, kind in columns:
        c = F.col(name)
        aggs.append(
            F.sum(F.when(c.isNull(), 1).otherwise(0))
            .cast("long")
            .alias(f"{name}__nulls")
        )
        aggs.append(F.count_distinct(c).alias(f"{name}__ndv"))
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
