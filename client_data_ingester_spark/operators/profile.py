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
``operators/sketch.py`` (md5 bucketing, exact integer registers) riding
the same single scan: an explode pivots each row into k per-column
``(col, bucket, rho, base-stats)`` tuples and two bounded aggregations
fold them (register relation of k×(m+1) groups, map-side combined), so
the plan stays scan → project → generate → hash-aggregate — no Expand,
one scan, bounded state — and the estimate is a deterministic
cross-engine formula a DuckDB oracle reproduces bit-exactly
(``portable_profile_oracle_sql``). Hash inputs are canonicalized per
column kind (num → DECIMAL(30,6) string via TRY_CAST, ts → one explicit
format, str → as-is) so both engines hash identical text.
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
    ``num|str|ts``) in one scan; one output row per column.

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
      :func:`portable_profile_oracle_sql`). Still one scan, no Expand.
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
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for name, kind in columns:
        c = F.col(_bt(name))
        aggs.append(
            F.sum(F.when(c.isNull(), 1).otherwise(0))
            .cast("long")
            .alias(f"{name}__nulls")
        )
        if ndv_mode == "exact":
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
        stack_args.append(
            f"{_sq(name)}, __rows, {_bt(f'{name}__nulls')}, "
            f"{_bt(f'{name}__ndv')}, "
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
    m, scale, _raw, _est = _hll_consts(p)
    # the k md5s/row dominate the pass; when the source yields fewer
    # splits than cores (small local files), fan the rows out first so the
    # hash projection runs at full parallelism. At scale the scan already
    # has >= cores splits and this branch never triggers (no shuffle).
    sc = table.sparkSession.sparkContext
    if table.rdd.getNumPartitions() < sc.defaultParallelism:
        table = table.repartition(sc.defaultParallelism)
    staged = table.select(
        "*",
        *[
            _hash60(_canon_col(name, kind)).alias(f"__h_{name}")
            for name, kind in columns
        ],
    )
    structs = []
    for name, kind in columns:
        c = F.col(_bt(name))
        h = F.col(_bt(f"__h_{name}"))
        w = F.expr(f"{_bt(f'__h_{name}')} DIV {m}")
        rho = F.when(w == 0, F.lit(scale)).otherwise(
            F.lit(scale) - F.length(F.bin(w))
        )
        if kind == "num":
            num_val = c.cast("double")
            str_val = F.lit(None).cast("string")
        elif kind == "ts":
            num_val = F.lit(None).cast("double")
            str_val = F.date_format(c, TS_FMT)
        else:
            num_val = F.lit(None).cast("double")
            str_val = c.cast("string")
        structs.append(
            F.struct(
                F.lit(name).alias("col_name"),
                F.pmod(h, F.lit(m)).alias("bucket"),
                rho.cast("int").alias("rho"),
                num_val.alias("num_val"),
                str_val.alias("str_val"),
                F.when(c.isNull(), 1).otherwise(0).alias("is_null"),
            )
        )
    exploded = staged.select(
        F.explode(F.array(*structs)).alias("e")
    ).select("e.*")

    regs = exploded.groupBy("col_name", "bucket").agg(
        F.max("rho").alias("r"),
        F.count(F.lit(1)).alias("cnt"),
        F.sum("is_null").cast("long").alias("nulls"),
        F.min("num_val").alias("mn_num"),
        F.max("num_val").alias("mx_num"),
        F.min("str_val").alias("mn_str"),
        F.max("str_val").alias("mx_str"),
    )
    live = F.col("bucket").isNotNull()
    per_col = regs.groupBy("col_name").agg(
        F.sum("cnt").alias("n_rows"),
        F.sum("nulls").alias("n_nulls"),
        F.count(F.when(live, 1)).cast("int").alias("n_used"),
        F.sum(
            F.when(
                live,
                F.expr(f"shiftleft(CAST(1 AS BIGINT), {scale} - r)"),
            )
        ).alias("s_used"),
        F.min("mn_num").alias("min_num"),
        F.max("mx_num").alias("max_num"),
        F.min("mn_str").alias("min_str"),
        F.max("mx_str").alias("max_str"),
    )
    # all-null column: no live register -> NULL state (matches the
    # register-table SQL, where SUM over zero rows is NULL)
    ndv = F.expr(
        "CAST(FLOOR((CASE WHEN n_used = 0 THEN NULL ELSE "
        + _est.replace(
            "s_int",
            f"(s_used + CAST({m} - n_used AS BIGINT) * {2 ** scale})",
        ).replace("zeros", f"({m} - n_used)")
        + " END) + 0.5) AS BIGINT)"
    )
    # empty-input parity: an ungrouped-aggregate oracle emits one row per
    # column even over zero input rows; seed the same rows here (n_rows 0,
    # everything else NULL — matching SUM/MIN/MAX over an empty relation)
    seed = table.sparkSession.createDataFrame(
        [(name,) for name, _ in columns], "col_name string"
    )
    per_col = seed.join(per_col, "col_name", "left")
    is_num = {name: kind == "num" for name, kind in columns}
    num_names = [n for n, yes in is_num.items() if yes]
    in_num = F.col("col_name").isin(num_names) if num_names else F.lit(False)
    return per_col.select(
        "col_name",
        F.coalesce(F.col("n_rows"), F.lit(0).cast("long")).alias("n_rows"),
        "n_nulls",
        ndv.alias("ndv"),
        F.when(in_num, F.col("min_num")).alias("min_num"),
        F.when(in_num, F.col("max_num")).alias("max_num"),
        F.when(~in_num, F.col("min_str")).alias("min_str"),
        F.when(~in_num, F.col("max_str")).alias("max_str"),
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
