"""Mergeable distinct-count sketches (HyperLogLog) — [EXT].

The reference engine has no sketch support; at 100 TB an exact
``COUNT(DISTINCT)`` over a high-cardinality key is a full shuffle of every
distinct value, while an HLL register table is ``m`` (here 64) tiny rows per
group that merge by ``MAX`` — the classic pre-aggregated-rollup shape: keep
per-partition / per-day register tables and combine them associatively at
query time without re-reading the raw data.

Spark ships ``approx_count_distinct`` (also HLL), but its register layout
and hashing are engine-internal: the state can't be persisted as a table,
merged with registers produced elsewhere, or reproduced by another engine.
This implementation trades its tuned accuracy for an *open* register format
(md5-based bucketing, exact BIGINT register sums) that is deterministic
across engines — the same formula runs in DuckDB and hash-matches, which is
what makes the sketch auditable and the oracle exact.

Determinism across engines:

- hash: first 15 hex digits of ``md5(value)`` → a 60-bit non-negative
  BIGINT (identical in Spark ``conv(.., 16, 10)`` and DuckDB
  ``('0x' || ..)::BIGINT``);
- bucket = ``h % m``; remaining ``w = h DIV m`` has ``W = 60 - p`` bits and
  ``rho = W - length(bin(w)) + 1`` (``bin`` renders without leading zeros
  in both engines; ``w = 0`` → ``rho = W + 1``);
- register sums are kept in exact integer units of ``2^-(W+1)``
  (``shiftleft(1, W+1-r)``), so the merge is BIGINT addition —
  order-independent, no float accumulation;
- the only floating-point steps are one multiply/divide chain for the raw
  estimate and the standard small-range linear-counting correction, both
  written as the *same* literal arithmetic in both engines and rounded to
  one decimal at the end.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# p=6 → m=64 registers: ±~13% standard error. Deliberately small so the
# small-range (linear counting) branch is exercised only when a group
# really is tiny, and so the whole register table for thousands of groups
# is still broadcast-sized.
DEFAULT_P = 6
_HEX_DIGITS = 15  # 60-bit hash: fits BIGINT with headroom, md5-derived


def _hash60(c: Column) -> Column:
    """Deterministic 60-bit non-negative hash of the value's string form."""
    return F.conv(F.substring(F.md5(c.cast("string")), 1, _HEX_DIGITS), 16, 10).cast(
        "long"
    )


def hll_formula(p: int) -> "tuple[int, int, str, str]":
    """``(m, scale, raw, est)`` — the estimator formula shared by
    :func:`hll_estimate`, :func:`hll_oracle_sql`, and the profile
    module's portable-ndv mode. ONE source of truth (the codec module's
    ``_gen_bgr`` rule): a coefficient edit here reaches every consumer,
    so the Spark estimate, the DuckDB oracle, and the profile ndv can
    never silently desynchronize. The strings reference the column names
    ``s_int`` / ``zeros`` of the register-collapse relation."""
    m = 2**p
    scale = (60 - p) + 1  # register term exponent ceiling (W + 1)
    # every fractional literal is CAST AS DOUBLE: Spark parses a bare
    # 0.7213 as DECIMAL(4,4) and evaluates the alpha chain in
    # DECIMAL(19,13) (DuckDB promotes to DOUBLE), so the two engines'
    # estimates diverged in the 8th decimal — invisible at the sf0.01
    # gate, but at sf0.1 profile_orders landed 0.003 from a .5 boundary
    # and the FLOOR(est + 0.5) ndv split 123987 vs 123986. With explicit
    # doubles every op is IEEE-correctly-rounded and bit-identical
    # cross-engine at ANY scale.
    alpha = (
        f"(CAST(0.7213 AS DOUBLE) / (CAST(1.0 AS DOUBLE) "
        f"+ CAST(1.079 AS DOUBLE) / {m}))"
    )
    raw = f"{alpha} * {m * m} * CAST({2 ** scale} AS DOUBLE) / s_int"
    est = (
        f"CASE WHEN {raw} <= CAST(2.5 AS DOUBLE) * {m} AND zeros > 0 "
        f"THEN {m} * LN(CAST({m} AS DOUBLE) / zeros) "
        f"ELSE {raw} END"
    )
    return m, scale, raw, est


def hll_registers(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    p: int = DEFAULT_P,
) -> DataFrame:
    """Per-group HLL register table: ``group_cols..., bucket, r``.

    This is the sketch's mergeable state — register tables from disjoint
    slices of the data (days, partitions, engines) combine with
    ``groupBy(group, bucket).agg(max(r))`` and estimate exactly as if built
    in one pass. Two-stage aggregation: the ``max`` is map-side partial, so
    the shuffle carries at most ``m`` rows per group per task.
    """
    group_cols = group_cols or []
    m = 2**p
    w_bits = 60 - p
    h = _hash60(F.col(value_col))
    w = F.expr(f"h DIV {m}")
    rho = F.when(w == 0, F.lit(w_bits + 1)).otherwise(
        F.lit(w_bits + 1) - F.length(F.bin(w))
    )
    return (
        df.select(*group_cols, h.alias("h"))
        # COUNT(DISTINCT x) semantics: nulls are not values. Without this
        # filter a null hashes to a phantom (bucket=NULL, r=NULL) register
        # that inflates n_used / shrinks zeros and skews the estimate
        .where(F.col("h").isNotNull())
        .select(
            *group_cols,
            F.pmod(F.col("h"), F.lit(m)).alias("bucket"),
            rho.alias("rho"),
        )
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("r"))
    )


def hll_estimate(
    registers: DataFrame,
    group_cols: list[str] | None = None,
    p: int = DEFAULT_P,
) -> DataFrame:
    """Collapse a register table to one row per group:
    ``n_used, zeros, s_int, est_distinct``.

    ``s_int`` is the exact integer register sum (units of ``2^-(W+1)``) —
    the auditable scalar state; ``est_distinct`` applies the standard HLL
    raw estimate with the linear-counting small-range correction, rounded
    to one decimal so the value renders identically cross-engine.
    """
    group_cols = group_cols or []
    m, scale, raw, est = hll_formula(p)
    per_group = registers.groupBy(*group_cols).agg(
        F.count("*").cast("int").alias("n_used"),
        # pyspark's shiftleft() binding only takes a literal int shift;
        # the SQL form accepts the per-row expression
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {scale} - r)")).alias(
            "s_used"
        ),
    )
    s_int = (
        F.col("s_used") + F.col("zeros").cast("long") * F.lit(2**scale)
    ).alias("s_int")
    return (
        per_group.withColumn("zeros", F.lit(m) - F.col("n_used"))
        .select(
            *group_cols,
            "n_used",
            "zeros",
            s_int,
        )
        .withColumn("est_distinct", F.round(F.expr(est), 1))
    )


def hll_distinct(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    p: int = DEFAULT_P,
) -> DataFrame:
    """One-pass per-group approximate distinct count with open state.

    Equivalent to ``hll_estimate(hll_registers(df, ...))``; at scale the
    two halves run separately — registers are materialized per
    day/partition and estimates are served off the merged register table.
    """
    return hll_estimate(
        hll_registers(df, value_col, group_cols, p), group_cols, p
    )


def hll_oracle_sql(
    table_expr: str,
    value_col: str,
    group_cols: list[str] | None = None,
    p: int = DEFAULT_P,
) -> str:
    """The DuckDB-dialect twin of :func:`hll_distinct` (exact oracle)."""
    group_cols = group_cols or []
    m, scale, raw, est = hll_formula(p)
    w_bits = scale - 1
    gsel = "".join(f"{c}, " for c in group_cols)
    gby_b = ", ".join(group_cols + ["bucket"]) or "bucket"
    gby = ", ".join(group_cols)
    return f"""
WITH hashed AS (
  SELECT {gsel}('0x' || substr(md5(CAST({value_col} AS VARCHAR)), 1, {_HEX_DIGITS}))::BIGINT AS h
  FROM {table_expr}
  WHERE {value_col} IS NOT NULL
),
regs AS (
  SELECT {gsel}h % {m} AS bucket,
         CASE WHEN h // {m} = 0 THEN {w_bits + 1}
              ELSE {w_bits + 1} - length(bin(h // {m})) END AS rho
  FROM hashed
),
folded AS (
  SELECT {gsel}bucket, MAX(rho) AS r FROM regs GROUP BY {gby_b}
),
summed AS (
  SELECT {gsel}CAST(COUNT(*) AS INTEGER) AS n_used,
         SUM(1::BIGINT << ({scale} - r)) AS s_used
  FROM folded{(" GROUP BY " + gby) if group_cols else ""}
),
finalized AS (
  SELECT {gsel}n_used, {m} - n_used AS zeros,
         CAST(s_used + ({m} - n_used)::BIGINT * {2 ** scale} AS BIGINT) AS s_int
  FROM summed
)
SELECT {gsel}n_used, zeros, s_int, round({est}, 1) AS est_distinct
FROM finalized
"""


def hll_overlap(
    df_a: DataFrame,
    df_b: DataFrame,
    value_col: str,
    p: int = DEFAULT_P,
) -> DataFrame:
    """Cohort-overlap estimate by HLL inclusion-exclusion over MERGED
    register tables: |A∩B| ≈ est(A) + est(B) − est(A∪B), where the
    union's registers are the per-bucket MAX of the two sides' registers
    — never a join or a shuffle of the raw values. This is the mergeable
    state earning its keep: at 100 TB the two cohorts' register tables
    (m rows each) are typically PERSISTED per slice, and the overlap is
    served off them alone, reading zero raw rows.

    Register-level merge == value-level union (max of per-side maxes is
    the max over the concatenated values), pinned by
    ``tests/test_sketch.py``. Error: inclusion-exclusion SUBTRACTS two
    estimates, so the absolute errors add — size ``p`` for the overlap
    magnitude you care about, not for the cohort sizes (the scored entry
    uses p=10, ~3% per estimate, vs the DEFAULT_P=6 display default).

    One row: ``est_a, est_b, est_union, est_overlap, jaccard_est``
    (overlap clamped at 0 — estimate noise can push a+b−u negative on
    near-disjoint cohorts; jaccard floor-rounded to 4 decimals with the
    cross-engine-stable floor(x·10⁴+0.5) rendering)."""
    return hll_overlap_from_registers(
        hll_registers(df_a, value_col, p=p),
        hll_registers(df_b, value_col, p=p),
        p=p,
    )


def hll_overlap_from_registers(
    ra: DataFrame,
    rb: DataFrame,
    p: int = DEFAULT_P,
) -> DataFrame:
    """:func:`hll_overlap` served off REGISTER TABLES — the form a 100 TB
    deployment actually calls: both sides are persisted ``(bucket, r)``
    state (written at ingest time, maintained by
    ``streaming/sketch_stream.py``), so the overlap estimate reads zero
    raw rows. ``p`` must match the geometry the registers were built
    with (the estimate formula depends on m)."""
    # each side's registers contribute to their own scope AND the union
    # scope; the groupBy MAX below is exactly the register-table merge
    scoped = (
        ra.select(F.lit("a").alias("scope"), "bucket", "r")
        .unionByName(rb.select(F.lit("b").alias("scope"), "bucket", "r"))
        .select(
            F.explode(
                F.array(F.col("scope"), F.lit("union"))
            ).alias("scope"),
            "bucket",
            "r",
        )
        .groupBy("scope", "bucket")
        .agg(F.max("r").alias("r"))
    )
    ests = hll_estimate(scoped, group_cols=["scope"], p=p)

    def pick(s: str) -> Column:
        # empty cohorts leave their scope row absent (no registers at
        # all) — a missing estimate IS zero distinct values, so coalesce
        # rather than propagate NULL into the arithmetic below
        return F.coalesce(
            F.max(F.when(F.col("scope") == s, F.col("est_distinct"))),
            F.lit(0.0),
        )

    row = ests.groupBy().agg(
        pick("a").alias("est_a"),
        pick("b").alias("est_b"),
        pick("union").alias("est_union"),
    )
    raw_overlap = F.greatest(
        F.lit(0.0), F.col("est_a") + F.col("est_b") - F.col("est_union")
    )
    # floor(x*10+0.5)/10, not round(): identical HALF-UP rendering in
    # Spark and DuckDB (round() half-mode differs between engines)
    overlap = (F.floor(raw_overlap * 10 + F.lit(0.5)) / F.lit(10.0)).cast(
        "double"
    )
    # guard the quotient: est_union == 0 means both cohorts were empty
    # (Jaccard of two empty sets is conventionally 0, never NULL — and
    # NULL-division semantics are exactly where engines drift)
    jac = F.when(
        F.col("est_union") > 0,
        (
            F.floor(overlap / F.col("est_union") * 10000 + F.lit(0.5))
            / F.lit(10000.0)
        ).cast("double"),
    ).otherwise(F.lit(0.0))
    return row.select(
        "est_a",
        "est_b",
        "est_union",
        overlap.alias("est_overlap"),
        jac.alias("jaccard_est"),
    )


def overlap_p_for_error(
    target_rel_err: float,
    cohort_size_hint: float,
    overlap_hint: float,
    p_min: int = 4,
    p_max: int = 18,
) -> int:
    """Pick the HLL precision ``p`` that keeps the inclusion-exclusion
    overlap estimate's RELATIVE error at or under ``target_rel_err``.

    The overlap is a DIFFERENCE of three estimates, so its absolute error
    budget is the SUM of theirs (conservative linear add — the docstring
    contract, measured in OVERLAP_ERROR.json): each estimate's standard
    error is ≈1.04/√m of its own magnitude, and est_a + est_b + est_union
    ≤ 4·cohort for same-sized cohorts, so

        4 · cohort · 1.04/√m  ≤  target_rel_err · overlap
        m  ≥  (4.16 · cohort / (target_rel_err · overlap))²

    rounded up to the next power of two and clamped to [p_min, p_max]
    (beyond 2^18 registers the "sketch" stops being small — at that point
    size the SLICES instead, or use exact distinct).

    BIAS-WINDOW SKIP (measured, not theoretical — see OVERLAP_ERROR.json):
    the variance bound assumes the raw estimator is unbiased, which holds
    dense (n ≫ m) and sparse (linear counting, n < 2.5m) but NOT in
    between — raw HLL without HLL++ bias correction systematically
    overestimates when n/m ∈ ~(2.5, 8), and inclusion-exclusion does not
    cancel the bias (the union's differs from the sides'): the sweep
    shows p=14 LOSING to p=10 at n=50k on small overlaps. So when the
    variance-sized m lands inside that window relative to the union
    (≈2·cohort), it is bumped up to union/2 — the linear-counting zone,
    which is strictly more accurate than either window edge. The hints
    are coarse by design: order-of-magnitude guesses move p by ±2ish,
    and the measured grid shows the chosen p meeting its target across
    overlap fractions 0.01–0.5."""
    import math

    if not (target_rel_err > 0 and cohort_size_hint > 0 and overlap_hint > 0):
        raise ValueError("all three sizing inputs must be positive")
    m_needed = (
        4 * 1.04 * cohort_size_hint / (target_rel_err * overlap_hint)
    ) ** 2
    union = 2.0 * cohort_size_hint
    p = max(p_min, math.ceil(math.log2(max(m_needed, 1.0))))
    p = min(p, p_max)
    # the window check must run on the FINAL m = 2^p, not on m_needed:
    # rounding up to a power of two (or the p_max clamp) can itself land
    # m inside the bias zone even when m_needed was below it
    if union / 8 < 2 ** p < union / 2:
        p_lc = math.ceil(math.log2(union / 2))  # linear-counting side
        if p_lc <= p_max:
            p = max(p_min, p_lc)
        else:
            # can't reach the LC zone within p_max: step DOWN to the
            # dense unbiased side — measured better than sitting in the
            # window (the variance target is already unreachable here,
            # so take the best-achievable UNBIASED geometry)
            p = max(p_min, math.floor(math.log2(union / 8)))
    return p


def hll_overlap_oracle_sql(
    select_a: str,
    select_b: str,
    value_col: str,
    p: int = DEFAULT_P,
) -> str:
    """DuckDB twin of :func:`hll_overlap`. The oracle duplicates VALUES
    into scopes (side + union) instead of merging register tables — the
    two are register-identical (MAX over a union of values == MAX of
    per-side MAXes), so this independently recomputes the same numbers
    through :func:`hll_oracle_sql`'s grouped pipeline."""
    table_expr = f"""(
      SELECT 'a' AS scope, {value_col} FROM ({select_a})
      UNION ALL SELECT 'union' AS scope, {value_col} FROM ({select_a})
      UNION ALL SELECT 'b' AS scope, {value_col} FROM ({select_b})
      UNION ALL SELECT 'union' AS scope, {value_col} FROM ({select_b})
    ) scoped_vals"""
    inner = hll_oracle_sql(table_expr, value_col, ["scope"], p)
    return f"""
WITH est AS ({inner}),
pv AS (
  SELECT COALESCE(MAX(CASE WHEN scope = 'a' THEN est_distinct END), 0.0)
             AS est_a,
         COALESCE(MAX(CASE WHEN scope = 'b' THEN est_distinct END), 0.0)
             AS est_b,
         COALESCE(MAX(CASE WHEN scope = 'union' THEN est_distinct END), 0.0)
             AS est_union
  FROM est),
ov AS (
  SELECT est_a, est_b, est_union,
         FLOOR(GREATEST(0.0, est_a + est_b - est_union) * 10 + 0.5) / 10.0
             AS est_overlap
  FROM pv)
SELECT est_a, est_b, est_union, est_overlap,
       CASE WHEN est_union > 0
            THEN FLOOR(est_overlap / est_union * 10000 + 0.5) / 10000.0
            ELSE 0.0 END AS jaccard_est
FROM ov
"""


# ---------------------------------------------------------------------------
# Count-Min sketch: mergeable approximate frequencies / heavy hitters


CMS_DEPTH = 4
CMS_WIDTH = 256


def cms_registers(
    df: DataFrame,
    value_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Count-Min register table ``(r, bucket, cnt)`` over ``value_col``.

    The complement of the HLL sketch above: HLL answers "how many
    distinct", CMS answers "how often does key k occur" with one-sided
    (over-)estimates. State is ``depth × width`` counters regardless of
    corpus size, and register tables from disjoint slices merge by plain
    SUM — so per-day counter tables roll up to any window without
    re-reading raw events.

    Each input row fans out to ``depth`` (row, bucket) increments; the
    groupBy folds them with map-side partial counts, so the shuffle
    carries at most ``depth × width`` rows per task.
    """
    rows = F.explode(
        F.array(*[F.lit(j) for j in range(depth)])
    ).alias("r")
    return (
        df.select(F.col(value_col).cast("string").alias("v"))
        .select(rows, "v")
        .select(
            "r",
            F.pmod(
                _hash60(F.concat_ws(":", F.col("r"), F.col("v"))),
                F.lit(width),
            ).alias("bucket"),
        )
        .groupBy("r", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def cms_estimate(
    registers: DataFrame,
    probes: DataFrame,
    key_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Point-estimate counts for ``probes[key_col]`` from a register table:
    ``est = min over rows of the key's bucket counter`` (never less than
    the true count; collisions only inflate).

    The register table is ``depth × width`` rows — broadcast-sized by
    construction — so probing is a broadcast join however large the
    corpus that built the registers was.
    """
    rows = F.explode(
        F.array(*[F.lit(j) for j in range(depth)])
    ).alias("r")
    keyed = probes.select(F.col(key_col).alias("k")).select(
        "k", rows
    )
    keyed = keyed.select(
        "k",
        "r",
        F.pmod(
            _hash60(F.concat_ws(":", F.col("r"), F.col("k").cast("string"))),
            F.lit(width),
        ).alias("bucket"),
    )
    return (
        keyed.join(F.broadcast(registers), ["r", "bucket"], "left")
        .groupBy("k")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0).cast("long"))).alias("est_count"))
        .withColumnRenamed("k", key_col)
    )


# ---------------------------------------------------------------------------
# Fixed-bin histogram sketch: mergeable approximate quantiles


def hist_registers(
    df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int = 200,
    group_cols: "list[str] | None" = None,
) -> DataFrame:
    """Histogram register table ``(*group_cols, bin, cnt)`` over a FIXED
    domain.

    The third mergeable-sketch family: registers merge by SUM (like CMS),
    state is ≤ ``n_bins`` rows per group however large the input, and
    quantile estimates are deterministic bin edges — no rank shuffle of
    raw values. The domain is fixed up front (not derived from the data)
    precisely so register tables from different days/slices share bin
    boundaries and stay mergeable; at 100 TB you know your metric's
    domain, and outliers clamp into the edge bins (bounded error, never
    lost rows). ``group_cols`` keys the registers (like the HLL/CMS
    families) for per-group quantiles from one pass.
    """
    group_cols = list(group_cols or [])
    span = hi - lo
    v = F.col(value_col).cast("double")
    bin_expr = F.least(
        F.greatest(F.floor((v - F.lit(lo)) / F.lit(span) * F.lit(n_bins)), F.lit(0)),
        F.lit(n_bins - 1),
    )
    return (
        df.filter(v.isNotNull())
        .select(*group_cols, bin_expr.alias("bin"))
        .groupBy(*group_cols, "bin")
        .agg(F.count("*").alias("cnt"))
    )


def hist_quantiles(
    registers: DataFrame,
    qs: list[float],
    lo: float,
    hi: float,
    n_bins: int = 200,
    group_cols: "list[str] | None" = None,
) -> DataFrame:
    """Quantile estimates from a register table: for each (group, q), the
    upper edge of the first bin whose cumulative count reaches
    ``q * total``.

    Estimate error is one bin width — the classic accuracy/state trade.
    The cumulative windows run over the AGGREGATED relation (≤ n_bins
    rows per group), so the window sort is bounded and constant, never
    data-sized; ungrouped registers use the documented bounded global
    window (runtime's "No Partition Defined" warning is expected there).
    """
    from pyspark.sql import Window

    group_cols = list(group_cols or [])
    span = hi - lo
    w_cum = Window.partitionBy(*group_cols).orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.partitionBy(*group_cols).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    c = registers.withColumn("cum", F.sum("cnt").over(w_cum)).withColumn(
        "total", F.sum("cnt").over(w_all)
    )
    q_rows = F.explode(
        F.array(*[F.lit(float(q)).alias("q") for q in qs])
    ).alias("q")
    qdf = c.sparkSession.range(1).select(q_rows)
    hit = (
        c.crossJoin(F.broadcast(qdf))
        .filter(F.col("cum") >= F.col("q") * F.col("total"))
        .groupBy(*group_cols, "q")
        .agg(F.min("bin").alias("bin"))
    )
    est = F.lit(lo) + ((F.col("bin") + 1) * F.lit(span)) / F.lit(n_bins)
    return hit.select(*group_cols, "q", est.alias("est_value"))


# ---------------------------------------------------------------------------
# Bloom filter: mergeable set membership / semi-join reduction


BLOOM_K = 3


def _probe_bloom_membership(
    probed: DataFrame, eval_bits: DataFrame, m_bits: int, k: int
) -> DataFrame:
    """Append ``maybe_eval`` to a relation carrying a STAGED md5 digest
    column ``d`` (every other column passes through untouched).

    Membership = k broadcast LEFT joins, one per digest slice — no
    explode, no per-key groupBy: each join is map-side against the
    bounded bit set (distinct, so it can never duplicate probe rows).
    Shared by the doc-level screen (:func:`bloom_probe`) and the
    span-level screen (:func:`contaminated_spans`) so the digest-slice
    scheme can never desynchronize between them.
    """
    bit_cols = _digest_bits(m_bits, k)
    carry = [c for c in probed.columns if c != "d"]
    probed = probed.select(
        *carry, *[bit_cols[j].alias(f"_b{j}") for j in range(k)]
    )
    hit = F.lit(True)
    for j in range(k):
        probed = probed.join(
            F.broadcast(
                eval_bits.select(
                    F.col("bit").alias(f"_b{j}"),
                    F.lit(1).alias(f"_s{j}"),
                )
            ),
            f"_b{j}",
            "left",
        )
        hit = hit & F.col(f"_s{j}").isNotNull()
    return probed.select(*carry, hit.alias("maybe_eval"))


def _digest_bits(m_bits: int, k: int) -> "list[Column]":
    """The k bloom positions as expressions, sliced from ONE md5 digest
    (column ``d``): position j = 40-bit int from hex chars [1+10j, 10+10j]
    mod m_bits. One digest per key instead of k keyed hashes — the hash
    work is the probe's dominant cost, so this is ~k× cheaper, and slicing
    independent digest regions keeps the k positions pairwise independent.
    ``d`` must be a STAGED named column (its own projection) so the three
    references share one md5 evaluation instead of re-inlining it.
    """
    if k * 10 > 32:
        raise ValueError("md5 has 32 hex chars: at most 3 ten-char slices")
    return [
        F.pmod(
            F.conv(
                F.substring(F.col("d"), 1 + 10 * j, 10), 16, 10
            ).cast("long"),
            F.lit(m_bits),
        )
        for j in range(k)
    ]


def bloom_registers(
    df: DataFrame,
    value_col: str,
    m_bits: int = 1 << 16,
    k: int = BLOOM_K,
) -> DataFrame:
    """Bloom register table ``(bit,)`` — the distinct set positions.

    Fourth mergeable-sketch family: state merges by UNION+distinct, is
    bounded by ``m_bits`` rows however large the keyed set, and membership
    tests are one-sided — a key whose ``k`` positions are all present MAY
    be in the set (false-positive rate ≈ (1-e^{-kn/m})^k); a key with any
    position missing is DEFINITELY absent. That asymmetry is exactly what
    semi-join reduction wants: pre-filter the huge side with the bloom of
    the small side, then (optionally) verify survivors exactly — the
    shuffle only ever carries rows that might match.
    """
    return (
        df.select(F.md5(F.col(value_col).cast("string")).alias("d"))
        .select(F.explode(F.array(*_digest_bits(m_bits, k))).alias("bit"))
        .distinct()
    )


def bloom_probe(
    train_docs: DataFrame,
    eval_bits: DataFrame,
    text_col: str = "text",
    shingle_k: int = 3,
    m_bits: int = 1 << 16,
    k: int = BLOOM_K,
    fan: bool = True,
) -> DataFrame:
    """The deployment-shape decontamination screen: probe the (pre-built,
    typically persisted) bloom register table of the EVAL set's shingles
    with the train corpus — per train document, how many of its shingles
    hit the bloom, and whether the doc must be dropped (any hit).

    This is the scale-correct direction: train is the 100 TB side, eval
    benchmarks are small, so the bloom (≤ m_bits rows, here 64Ki) is
    broadcast and the membership test is a broadcast join — the
    shingle-keyed shuffle of two corpus-sized sides that
    ``contamination_check``'s exact join pays disappears entirely. The
    only remaining wide op is the per-document fold (keyed by doc_id,
    map-side combined). One-sidedness makes the screen safe: a bloom miss
    proves the shingle is not in eval, so a doc with zero hits is
    definitely clean; flagged docs are a small superset of the truly
    contaminated (drop them all, or verify exactly — the verify join's
    input is now the flagged sliver, not the corpus). The bloom itself is
    a build-once artifact per eval-set version — like the IVF/RP-LSH
    indexes, it must never be rebuilt per probe batch.
    """
    from .dedup import exploded_shingles

    probed = exploded_shingles(
        train_docs, text_col, shingle_k, fan=fan
    ).select("doc_id", F.md5(F.col("sh")).alias("d"))
    return (
        _probe_bloom_membership(probed, eval_bits, m_bits, k)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shingles"),
            F.sum(F.col("maybe_eval").cast("long")).alias("n_bloom_hits"),
        )
        .withColumn("dropped", F.col("n_bloom_hits") > 0)
    )


def bloom_decontaminate(
    docs: DataFrame,
    text_col: str = "text",
    shingle_k: int = 3,
    train_pct: int = 80,
    m_bits: int = 1 << 16,
    k: int = BLOOM_K,
) -> DataFrame:
    """Self-contained demo of the bloom screen: hash-split ``docs`` into
    train/eval, build the eval bloom, probe the train side. Semantics
    (and output) are identical to building the bloom once with
    :func:`bloom_registers` and probing with :func:`bloom_probe`; a real
    deployment uses those two halves so the eval-side build cost is paid
    once per eval-set version, not per probe batch.
    """
    from .corpus import hash_split  # local import to avoid a cycle
    from .dedup import exploded_shingles

    split = hash_split(docs, train_pct=train_pct).select("doc_id", "split")
    sh = exploded_shingles(docs, text_col, shingle_k).join(split, "doc_id")
    eval_bits = bloom_registers(
        sh.filter(F.col("split") == "eval").select("sh"), "sh", m_bits, k
    )
    train_docs = docs.join(
        split.filter(F.col("split") == "train").select("doc_id"), "doc_id"
    )
    return bloom_probe(train_docs, eval_bits, text_col, shingle_k, m_bits, k)


def contaminated_spans(
    train_docs: DataFrame,
    eval_bits: DataFrame,
    text_col: str = "text",
    shingle_k: int = 3,
    m_bits: int = 1 << 16,
    k: int = BLOOM_K,
) -> DataFrame:
    """Span-level decontamination: WHERE inside each flagged document the
    eval overlap sits — contiguous runs of bloom-hit shingle positions as
    (doc_id, start_pos, end_pos, n_shingles) islands.

    Doc-level screens (``bloom_probe``) answer drop-or-keep; a surgical
    pipeline instead removes just the overlapping spans and keeps the
    rest of the document. Positioned (non-distinct) shingles probe the
    same broadcast bloom (k digest-slice joins, map-side), then the
    classic gaps-and-islands fold groups consecutive hit positions:
    ``pos - row_number() over (doc, pos)`` is constant within a
    contiguous run, so one doc-keyed aggregate emits the spans. The only
    shuffle is the hit relation keyed by doc — bounded by the flagged
    sliver, not the corpus; one-sidedness still holds (a span is a
    SUPERSET hint: every shingle in it bloom-hit, so unflagged text is
    proven clean).
    """
    from pyspark.sql import Window

    from .dedup import words_expr
    from .par import fan_out

    # positioned-shingle assembly + k md5 digest probes per shingle are
    # the kernel; fan the single-split local scan out first (no-op at
    # scale — see par.fan_out)
    staged = fan_out(train_docs).select(
        "doc_id", words_expr(F.col(text_col)).alias("_ws")
    )
    ws = F.col("_ws")
    idx = F.sequence(
        F.lit(0), F.greatest(F.size(ws) - shingle_k, F.lit(0))
    )
    sh_arr = F.transform(
        idx, lambda i: F.array_join(F.slice(ws, i + 1, shingle_k), " ")
    )
    pos_sh = (
        staged.select(
            "doc_id", F.posexplode_outer(sh_arr).alias("pos", "sh")
        )
        # != '': an empty words array (empty doc) regenerates a '' shingle
        # via join(slice([])); legit shingles are never ''
        .filter(F.col("sh").isNotNull() & (F.col("sh") != ""))
        .select("doc_id", "pos", F.md5(F.col("sh")).alias("d"))
    )
    hits = (
        _probe_bloom_membership(pos_sh, eval_bits, m_bits, k)
        .filter(F.col("maybe_eval"))
        .select("doc_id", "pos")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    return (
        hits.withColumn("_g", F.col("pos") - F.row_number().over(w))
        .groupBy("doc_id", "_g")
        .agg(
            F.min("pos").alias("start_pos"),
            F.max("pos").alias("end_pos"),
            F.count(F.lit(1)).alias("n_shingles"),
        )
        .select("doc_id", "start_pos", "end_pos", "n_shingles")
        .orderBy("doc_id", "start_pos")
    )


# ---------------------------------------------------------------------------
# Bottom-k reservoir: mergeable uniform sample (+ KMV distinct estimate)


RESERVOIR_K = 64


def reservoir_registers(
    df: DataFrame,
    value_col: str,
    k: int = RESERVOIR_K,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Fifth mergeable-sketch family: a per-group BOTTOM-K reservoir —
    the ``k`` distinct values with the smallest deterministic 60-bit
    hash keys (``group_cols..., pos, v, hk``).

    Why bottom-k instead of random reservoir sampling: the hash makes it
    a pure function of the value SET — deterministic across engines
    (the DuckDB oracle recomputes it exactly), stable across
    partitionings and reruns, and MERGEABLE with no RNG state: the
    bottom-k of a union is the bottom-k of the per-slice bottom-k's
    (:func:`reservoir_merge`), so per-day/per-shard registers persisted
    at ingest time combine into any rollup window after the fact. A
    uniform hash means the kept set is a uniform sample of the DISTINCT
    values (duplicates collapse — the semantics corpus debugging wants
    post-dedup; for row-weighted sampling salt the value with a row id).

    The same registers double as a KMV ("k minimum values") distinct
    estimator — :func:`kmv_distinct_from_registers` — so one persisted
    state serves both "show me examples from this slice" and "how many
    distinct are there", the two questions every profiling UI asks.

    Shape at 100 TB: one (group, v) distinct (map-side combinable), one
    per-group rank window that WindowGroupLimit prunes to k rows per
    partition BEFORE the sort — never a global sort, never a collect.
    State is ≤ k rows per group forever.
    """
    from pyspark.sql import Window

    from .par import fan_out

    g = group_cols or []
    # fan the NARROW projection first: the partial WindowGroupLimit
    # below needs a per-partition sort, and on a single-split local scan
    # that sort (plus the md5) would run in ONE task. The r17 hash-key
    # fan_out no longer pays round-robin's hidden local sort, which is
    # what made the old A/B here a net loss (events 0.68 s -> 1.17 s
    # under round-robin fan).
    src = fan_out(df.select(*g, value_col))
    w = Window.partitionBy(*g).orderBy("hk", "v")
    # dense_rank FIRST, distinct after (r17): ranking the raw rows lets
    # InferWindowGroupLimit insert a PARTIAL WindowGroupLimit below the
    # group exchange — each map task ships only its own bottom-k
    # DISTINCT values (dense_rank ties duplicates together, so a value's
    # duplicate rows can never evict a distinct value from the k), and
    # the old shape's full (group, v) distinct shuffle of the raw
    # relation disappears; the distinct that remains sees ≤ k values per
    # group per task. Ordering is (hk, v) with hk = f(v), so rows tie in
    # the dense_rank iff they carry the same value — the surviving value
    # set is EXACTLY the old distinct-then-row_number bottom-k, and the
    # final row_number over the deduped ≤k rows reproduces pos.
    pruned = (
        src.select(
            *g,
            F.col(value_col).alias("v"),
            _hash60(F.col(value_col)).alias("hk"),
        )
        .where(F.col("hk").isNotNull())
        .withColumn("_dr", F.dense_rank().over(w))
        .where(F.col("_dr") <= k)
        .select(*g, "v", "hk")
        .distinct()
    )
    return (
        pruned.withColumn("pos", F.row_number().over(w))
        .where(F.col("pos") <= k)
        .select(*g, "pos", "v", "hk")
    )


def reservoir_merge(
    ra: DataFrame,
    rb: DataFrame,
    k: int = RESERVOIR_K,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Merge two reservoir register tables: union, re-rank, keep k.
    EXACTLY equals building one reservoir over the concatenated inputs
    (hash keys are value-deterministic, so the union's bottom-k is a
    subset of the per-side bottom-k's — pinned by tests)."""
    from pyspark.sql import Window

    g = group_cols or []
    u = ra.select(*g, "v", "hk").unionByName(
        rb.select(*g, "v", "hk")
    ).distinct()
    w = Window.partitionBy(*g).orderBy("hk", "v")
    return (
        u.withColumn("pos", F.row_number().over(w))
        .where(F.col("pos") <= k)
        .select(*g, "pos", "v", "hk")
    )


def kmv_distinct_from_registers(
    regs: DataFrame,
    k: int = RESERVOIR_K,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """KMV distinct-count estimate off persisted reservoir registers:
    if the group filled its reservoir, ndv ≈ (k-1) / U(k) where U(k) is
    the k-th smallest hash normalized to (0,1]; a reservoir that never
    filled holds EVERY distinct value, so its count is exact. Rendered
    with the engine-stable floor(x·10+0.5)/10 recipe (the hll pattern).
    Standard error ≈ 1/√(k−2) of the estimate — k=64 ⇒ ~13%; size k for
    the ndv precision you need, the sample rides along for free."""
    g = group_cols or []
    agg = regs.groupBy(*g).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.max("hk").alias("hk_max"),
    )
    u_k = F.col("hk_max").cast("double") / F.lit(float(2 ** 60))
    est = F.when(F.col("n_kept") < k, F.col("n_kept").cast("double")).otherwise(
        F.lit(float(k - 1)) / u_k
    )
    return agg.select(
        *g,
        "n_kept",
        (F.floor(est * 10 + F.lit(0.5)) / F.lit(10.0))
        .cast("double")
        .alias("est_distinct"),
    )


def kmv_annotate_registers(
    regs: DataFrame,
    k: int = RESERVOIR_K,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """The KMV estimate attached to the register rows via a same-key
    window instead of ``regs.join(kmv_distinct_from_registers(regs))``.

    Value-identical to the join form (same n_kept/est_distinct formula,
    same rendering), but the estimate rides the registers' OWN hash
    partitioning: no join, and — the real win — no second execution of
    the registers' lineage. The join form re-planned the whole
    distinct + WindowGroupLimit subtree once per side because the
    estimate side's narrower projection defeats ReuseExchange (observed
    in the sketch_reservoir_sample plan: two full source folds). Use
    :func:`kmv_distinct_from_registers` when the registers are already
    persisted state (there the input is a tiny parquet scan and the
    per-group AGG relation is the right shape to store)."""
    from pyspark.sql import Window

    g = group_cols or []
    w = Window.partitionBy(*g)
    n_kept = F.count(F.lit(1)).over(w)
    u_k = F.max("hk").over(w).cast("double") / F.lit(float(2 ** 60))
    est = F.when(n_kept < k, n_kept.cast("double")).otherwise(
        F.lit(float(k - 1)) / u_k
    )
    return regs.select(
        *g,
        "pos",
        "v",
        "hk",
        n_kept.alias("n_kept"),
        (F.floor(est * 10 + F.lit(0.5)) / F.lit(10.0))
        .cast("double")
        .alias("est_distinct"),
    )


def reservoir_oracle_sql(
    table_expr: str,
    value_col: str,
    k: int = RESERVOIR_K,
    group_cols: list[str] | None = None,
) -> str:
    """DuckDB twin of :func:`reservoir_registers` (+ the KMV estimate
    joined on, so one scored query pins both consumers)."""
    g = group_cols or []
    gsel = "".join(f"{c}, " for c in g)
    gby = ", ".join(g)
    part = f"PARTITION BY {gby} " if g else ""
    grp = f" GROUP BY {gby}" if g else ""
    join_on = (
        " AND ".join(f"r.{c} = e.{c}" for c in g) if g else "TRUE"
    )
    return f"""
WITH vals AS (
  SELECT DISTINCT {gsel}{value_col} AS v,
         ('0x' || substr(md5(CAST({value_col} AS VARCHAR)), 1,
          {_HEX_DIGITS}))::BIGINT AS hk
  FROM {table_expr}
  WHERE {value_col} IS NOT NULL
),
ranked AS (
  SELECT {gsel}v, hk,
         CAST(ROW_NUMBER() OVER ({part}ORDER BY hk, v) AS INTEGER) AS pos
  FROM vals
),
regs AS (SELECT * FROM ranked WHERE pos <= {k}),
est AS (
  SELECT {gsel}CAST(COUNT(*) AS BIGINT) AS n_kept,
         CASE WHEN COUNT(*) < {k} THEN CAST(COUNT(*) AS DOUBLE)
              ELSE {k - 1} / (CAST(MAX(hk) AS DOUBLE) / {2 ** 60}.0)
         END AS raw_est
  FROM regs{grp}
)
SELECT {"".join(f"r.{c}, " for c in g)}r.pos, r.v, r.hk, e.n_kept,
       FLOOR(e.raw_est * 10 + 0.5) / 10.0 AS est_distinct
FROM regs r JOIN est e ON {join_on}
"""
