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
  against DuckDB).

Third mode, ``ndv_mode="portable"`` — the open-state HLL from
``operators/sketch.py`` (md5 bucketing, exact integer registers): base
stats ride the ungrouped wide agg (one partial-agg row per task), and a
second pass explodes each row into k per-column ``(col, bucket, rho)``
int-only tuples folded by two HashAggregates (register relation of
k×(m+1) groups, map-side combined, bounded state — no Expand, no sort;
keeping strings out of the grouped fold is what keeps it hash-based).
The estimate is a deterministic cross-engine formula a DuckDB oracle
reproduces bit-exactly (``portable_profile_oracle_sql``). Hash inputs
are canonicalized per column kind (num → DECIMAL(30,6) string via
TRY_CAST, ts → one explicit format, str → as-is) so both engines hash
identical text.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .sketch import _HEX_DIGITS, _hash60

TS_FMT = "yyyy-MM-dd HH:mm:ss"
_TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S"


def _bt(name: str) -> str:
    """Backtick-quoted Spark SQL identifier (column names are data here —
    they may contain spaces or keywords)."""
    return "`" + name.replace("`", "``") + "`"


def _dq(name: str) -> str:
    """Double-quoted DuckDB identifier."""
    return '"' + name.replace('"', '""') + '"'


def _sq(name: str) -> str:
    """Single-quoted Spark SQL STRING literal (backslashes and quotes
    escaped — Spark literals process backslash escapes)."""
    return "'" + name.replace("\\", "\\\\").replace("'", "\\'") + "'"



def _canon_col(name: str, kind: str) -> Column:
    """Canonical string rendering of a value for cross-engine hashing
    (the md5 input must be byte-identical in Spark and DuckDB; raw
    double→string rendering differs between engines at 1e7+, so numerics
    go through a fixed-scale decimal). Deliberate canonicalization
    semantics: values equal at 6 decimal places hash identically, and
    magnitudes beyond DECIMAL(30,6) (|x| >= 1e24, ±inf, NaN) TRY_CAST to
    NULL in BOTH engines — excluded from the sketch rather than throwing
    (Spark runs ANSI mode, so a plain cast would abort the profile)."""
    c = F.col(_bt(name))
    if kind == "num":
        return F.expr(f"try_cast({_bt(name)} AS DECIMAL(30,6))").cast(
            "string"
        )
    if kind == "ts":
        return F.date_format(c, TS_FMT)
    return c.cast("string")


def _canon_sql(name: str, kind: str) -> str:
    """DuckDB twin of :func:`_canon_col`."""
    if kind == "num":
        return f"CAST(TRY_CAST({_dq(name)} AS DECIMAL(30,6)) AS VARCHAR)"
    if kind == "ts":
        return f"STRFTIME({_dq(name)}, '{_TS_FMT_DUCK}')"
    return f"CAST({_dq(name)} AS VARCHAR)"


def profile_table(
    table: DataFrame,
    columns: list[tuple[str, str]],
    exact_ndv: bool = True,
    rsd: float = 0.05,
    ndv_mode: str | None = None,
    p: int = 6,
) -> DataFrame:
    """Profile ``columns`` (list of (name, kind) with kind in
    ``num|str|ts``); one output row per column.

    Output: col_name, n_rows, n_nulls, ndv, min_num, max_num (DOUBLE,
    NULL for non-numeric), min_str, max_str (VARCHAR, NULL for numeric).

    ``ndv_mode`` selects the distinct-count strategy (defaults to
    ``"exact"``/``"hllpp"`` according to the legacy ``exact_ndv`` flag):

    * ``"exact"`` — ``count_distinct`` (Expand ×(k+1); dimension tables).
    * ``"hllpp"`` — ``approx_count_distinct(rsd)`` (engine-native HLL++,
      no oracle).
    * ``"portable"`` — the open-state md5 HLL (explode into per-column
      register tuples + two bounded aggregations; deterministic
      cross-engine estimate, oracle via
      :func:`portable_profile_oracle_sql`). Two column-pruned scan
      passes (base stats + registers), no Expand, no sort.
    """
    if ndv_mode is None:
        ndv_mode = "exact" if exact_ndv else "hllpp"
    if ndv_mode not in ("exact", "hllpp", "portable"):
        # loud, not a silent hllpp fallback: a typo'd mode would return
        # an engine-specific estimate that breaks the deterministic
        # profile contract with no signal at the call site
        raise ValueError(f"unknown ndv_mode {ndv_mode!r}")
    if ndv_mode == "portable":
        return _profile_portable(table, columns, p)
    if ndv_mode == "exact":
        ndv_agg = F.count_distinct
    else:
        ndv_agg = lambda c: F.approx_count_distinct(c, rsd)  # noqa: E731
    return _stacked_base_stats(table, columns, ndv_agg)


def _stacked_base_stats(table, columns, ndv_agg=None) -> DataFrame:
    """One ungrouped wide agg + ``stack`` pivot → one row per column with
    the base stats (n_rows, n_nulls, type-appropriate min/max).

    The ungrouped aggregate is the cheap shape for strings too: with no
    grouping keys there is nothing to sort, so the per-task partial state
    is ONE row however the physical operator is named. ``ndv_agg``
    (callable Column→Column) rides the same agg for the exact/hllpp
    modes; ``None`` omits the ndv column entirely (the portable mode
    joins its own register-fold estimate instead)."""
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for name, kind in columns:
        c = F.col(_bt(name))
        aggs.append(
            F.sum(F.when(c.isNull(), 1).otherwise(0))
            .cast("long")
            .alias(f"{name}__nulls")
        )
        if ndv_agg is not None:
            aggs.append(ndv_agg(c).alias(f"{name}__ndv"))
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
        mn_num = (
            _bt(f"{name}__min_num") if kind == "num" else "CAST(NULL AS DOUBLE)"
        )
        mx_num = (
            _bt(f"{name}__max_num") if kind == "num" else "CAST(NULL AS DOUBLE)"
        )
        mn_str = (
            "CAST(NULL AS STRING)" if kind == "num" else _bt(f"{name}__min_str")
        )
        mx_str = (
            "CAST(NULL AS STRING)" if kind == "num" else _bt(f"{name}__max_str")
        )
        ndv_part = f"{_bt(f'{name}__ndv')}, " if ndv_agg is not None else ""
        stack_args.append(
            f"{_sq(name)}, __rows, {_bt(f'{name}__nulls')}, "
            f"{ndv_part}"
            f"{mn_num}, {mx_num}, {mn_str}, {mx_str}"
        )
    n = len(columns)
    ndv_header = "ndv, " if ndv_agg is not None else ""
    return one.select(
        F.expr(
            f"stack({n}, {', '.join(stack_args)}) AS "
            f"(col_name, n_rows, n_nulls, {ndv_header}min_num, max_num, "
            "min_str, max_str)"
        )
    )


# ---------------------------------------------------------------------------
# portable-HLL ndv mode (cross-engine deterministic, hash-checkable)


def _hll_consts(p: int) -> tuple[int, int, str, str]:
    # single source of truth for the estimator formula (sketch.py) — a
    # coefficient edit there reaches the sketch estimate, its DuckDB
    # oracle, and this portable-ndv mode together
    from .sketch import hll_formula

    return hll_formula(p)


def _profile_portable(
    table: DataFrame, columns: list[tuple[str, str]], p: int
) -> DataFrame:
    """Single-scan profile whose ndv is the open md5-HLL estimate.

    Shape: one staged projection computes each column's 60-bit md5 hash
    once per row; a Generate (explode) pivots every row into k per-column
    tuples ``(col_name, bucket, rho, num_val, str_val, is_null)``; a first
    aggregate folds to the bounded register relation (k×(m+1) groups —
    max(rho) is the HLL register, and min/max/count are re-aggregable so
    the base stats ride the same fold); a second aggregate collapses the
    registers to per-column (n_used, s_used) and the base stats to their
    finals. The k× row replication is pipelined through map-side partial
    aggregation (state ≤ k×(m+1) groups per task, NOT per-partition-ndv
    like the Expand multi-distinct), and the only shuffle carries the
    register relation. ndv = FLOOR(estimate + 0.5) as BIGINT — same
    formula text evaluated in both engines over identical doubles, so the
    driver hash matches.
    """
    from .par import fan_out

    m, scale, _raw, _est = _hll_consts(p)

    # base stats ride the plain ungrouped wide agg (same shape as the
    # exact mode minus its Expand): one pass, one partial-agg row per
    # task. Keeping min/max(string) OUT of the register fold below
    # matters — a grouped aggregate with string buffers can't run as a
    # HashAggregate (UnsafeRow buffers must be mutable fixed-size), so
    # Spark fell back to SortAggregate and SORTED the whole k×N exploded
    # relation, with every tuple dragging the row's num/str values along.
    # The base pass reads the RAW scan: its per-row work (null flags +
    # min/max) is far cheaper than a round-robin exchange of the full
    # row (measured at sf0.1: 1.0 s raw vs 1.5 s behind the fan-out
    # exchange the register pass needs).
    base = _stacked_base_stats(table, columns, None)

    # the k md5s/row dominate the REGISTER pass; when the source yields
    # fewer splits than cores (single-row-group local files), fan the
    # rows out first so the hash projection runs at full parallelism
    # (measured: 2.4 s fanned vs 10 s on the raw single-split scan). At
    # scale the scan already has >= cores splits and fan_out is a no-op.
    table = fan_out(table)

    # register relation: explode carries ONLY (col_name, bucket, rho) —
    # three small ints per (row, column) — and both folds are pure
    # int-buffer HashAggregates (map-side combined, state ≤ k×(m+1)
    # groups per task, shuffle carries the register relation only).
    staged = table.select(
        *[
            _hash60(_canon_col(name, kind)).alias(f"__h_{name}")
            for name, kind in columns
        ],
    )
    structs = []
    for name, _kind in columns:
        h = F.col(_bt(f"__h_{name}"))
        w = F.expr(f"{_bt(f'__h_{name}')} DIV {m}")
        rho = F.when(w == 0, F.lit(scale)).otherwise(
            F.lit(scale) - F.length(F.bin(w))
        )
        structs.append(
            F.struct(
                F.lit(name).alias("col_name"),
                F.pmod(h, F.lit(m)).alias("bucket"),
                rho.cast("int").alias("rho"),
            )
        )
    exploded = (
        staged.select(F.explode(F.array(*structs)).alias("e"))
        .select("e.*")
        # null values don't register (COUNT-DISTINCT semantics; the
        # oracle's WHERE h IS NOT NULL twin)
        .where(F.col("bucket").isNotNull())
    )
    regs = exploded.groupBy("col_name", "bucket").agg(
        F.max("rho").alias("r")
    )
    per_col = regs.groupBy("col_name").agg(
        F.count(F.lit(1)).cast("int").alias("n_used"),
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {scale} - r)")
        ).alias("s_used"),
    )
    # n_used >= 1 by construction here (a col_name group exists only when
    # at least one non-null value registered); the all-null / empty-table
    # case yields NO row, so the left join below leaves ndv NULL — the
    # same NULL the oracle's CASE WHEN n_used = 0 emits.
    ndv = F.expr(
        "CAST(FLOOR(("
        + _est.replace(
            "s_int",
            f"(s_used + CAST({m} - n_used AS BIGINT) * {2 ** scale})",
        ).replace("zeros", f"({m} - n_used)")
        + ") + 0.5) AS BIGINT)"
    )
    ndv_df = per_col.select("col_name", ndv.alias("ndv"))
    return base.join(ndv_df, "col_name", "left").select(
        "col_name",
        "n_rows",
        "n_nulls",
        "ndv",
        "min_num",
        "max_num",
        "min_str",
        "max_str",
    )


def portable_profile_oracle_sql(
    table_expr: str, columns: list[tuple[str, str]], p: int = 6
) -> str:
    """DuckDB twin of ``profile_table(..., ndv_mode="portable")`` — exact
    oracle (one UNION ALL branch per column; the hll subquery mirrors
    ``sketch.hll_oracle_sql`` without grouping)."""
    m, scale, _raw, _est = _hll_consts(p)
    selects = []
    for cname, kind in columns:
        q = _dq(cname)
        if kind == "num":
            mn = f"CAST(MIN({q}) AS DOUBLE) AS min_num"
            mx = f"CAST(MAX({q}) AS DOUBLE) AS max_num"
            ms = "CAST(NULL AS VARCHAR) AS min_str"
            xs = "CAST(NULL AS VARCHAR) AS max_str"
        elif kind == "ts":
            mn = "CAST(NULL AS DOUBLE) AS min_num"
            mx = "CAST(NULL AS DOUBLE) AS max_num"
            ms = f"STRFTIME(MIN({q}), '{_TS_FMT_DUCK}') AS min_str"
            xs = f"STRFTIME(MAX({q}), '{_TS_FMT_DUCK}') AS max_str"
        else:
            mn = "CAST(NULL AS DOUBLE) AS min_num"
            mx = "CAST(NULL AS DOUBLE) AS max_num"
            ms = f"CAST(MIN({q}) AS VARCHAR) AS min_str"
            xs = f"CAST(MAX({q}) AS VARCHAR) AS max_str"
        hll = f"""(
            SELECT CAST(FLOOR((CASE WHEN n_used = 0 THEN NULL
                               ELSE {_est} END) + 0.5) AS BIGINT) AS ndv
            FROM (
              SELECT n_used, {m} - n_used AS zeros,
                     CAST(s_used + ({m} - n_used)::BIGINT * {2 ** scale}
                          AS BIGINT) AS s_int
              FROM (
                SELECT CAST(COUNT(*) AS INTEGER) AS n_used,
                       SUM(1::BIGINT << ({scale} - r)) AS s_used
                FROM (
                  SELECT bucket, MAX(rho) AS r
                  FROM (
                    SELECT h % {m} AS bucket,
                           CASE WHEN h // {m} = 0 THEN {scale}
                                ELSE {scale} - length(bin(h // {m})) END AS rho
                    FROM (
                      SELECT ('0x' || substr(md5({_canon_sql(cname, kind)}),
                                             1, {_HEX_DIGITS}))::BIGINT AS h
                      FROM {table_expr} WHERE {_dq(cname)} IS NOT NULL
                    )
                    -- canon overflow (TRY_CAST NULL) must not form a NULL
                    -- register bucket: the engine side drops null hashes
                    WHERE h IS NOT NULL
                  )
                  GROUP BY bucket
                )
              )
            )
        )"""
        selects.append(f"""
            SELECT '{cname.replace("'", "''")}' AS col_name,
                   b.n_rows, b.n_nulls, h.ndv,
                   b.min_num, b.max_num, b.min_str, b.max_str
            FROM (
              SELECT COUNT(*) AS n_rows,
                     CAST(SUM(CASE WHEN {_dq(cname)} IS NULL
                                   THEN 1 ELSE 0 END)
                          AS BIGINT) AS n_nulls,
                     {mn}, {mx}, {ms}, {xs}
              FROM {table_expr}
            ) b CROSS JOIN {hll} h""")
    return " UNION ALL ".join(selects)
