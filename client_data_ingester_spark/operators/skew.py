"""Skew-handling join utilities (SURVEY §4 / the 100 TB design bar).

AQE's skew-join handles most cases at runtime (enabled in the session
factory), but when a key's fan-out is known-pathological (one tenant with
10⁹ rows, a null-ish default key), explicit salting bounds the worst task:

- ``salted_join``: scatter the big side's HOT keys across salt buckets and
  replicate only the matching small-side rows per bucket; non-hot keys
  take a plain join and a union. Every shuffle partition then receives at
  most |hot key|/salt of that key's rows, and the replication cost is
  bounded by the hot fraction of the small side — not |small| × salt.
- ``hot_keys``: find keys whose row count exceeds a threshold — run it on
  a sample (or maintain it as a write-time stat) to decide what to salt.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import MapType as _MapType

SALT_COL = "_salt"

# hot keys are by definition few; a driver-side list beyond this bound
# means the caller's threshold is mis-set, not that salting needs to scale
MAX_HOT_KEYS = 10_000

_ALLOWED_HOW = {
    "inner", "left", "leftouter", "left_outer",
    "semi", "leftsemi", "left_semi",
    "anti", "leftanti", "left_anti", "cross",
}


def hot_keys(df: DataFrame, key: str, min_rows: int) -> DataFrame:
    """Keys whose row count exceeds ``min_rows`` (candidates for salting)."""
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .filter(F.col("n_rows") >= min_rows)
    )


def _salt_expr(df: DataFrame, salt: int, salt_on: list[str] | None):
    """Deterministic salt in [0, salt): a content hash, never ``rand()`` —
    re-running the same input re-produces the same bucketing (rand's
    per-partition streams make plans re-run-unstable under retries or AQE
    re-planning even when the output is salt-invariant).

    Hashes ``salt_on`` (default: every column), so rows of one hot key
    spread across buckets as long as they differ in ANY hashed column;
    pass an explicit row-id column for corpora with fully-duplicate rows.
    """
    if salt_on:
        cols = salt_on
    else:
        # xxhash64 rejects MapType; exclude maps from the default mix
        cols = [
            f.name
            for f in df.schema.fields
            if not isinstance(f.dataType, _MapType)
        ] or df.columns
    return F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(salt))


def _replicate(small: DataFrame, salt: int) -> DataFrame:
    """The small side, once per salt value (join-key side of the scatter)."""
    return small.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt: int = 8,
    how: str = "inner",
    hot: DataFrame | None = None,
    hot_threshold: int | None = None,
    salt_on: list[str] | None = None,
) -> DataFrame:
    """Equi-join where ``big``'s key distribution is heavily skewed.

    Scope: when ``hot`` (a ``hot_keys`` result — any DataFrame whose first
    column holds the skewed key values) or ``hot_threshold`` (computes
    ``hot_keys(big, key, hot_threshold)`` inline — an extra aggregate over
    ``big``, fine for tests, use a sample or persisted stats at scale) is
    given, ONLY the flagged keys are salted: their big rows get a
    deterministic content-hash salt and their small rows are replicated
    ``salt`` times; every other key takes the plain join; the two halves
    union. Replication is then |hot ∩ small| × salt, not |small| × salt.
    With neither given, every key is salted (the legacy shape — correct,
    but it replicates the whole small side).

    Output columns = the plain join's columns (salt is internal), and the
    result equals the plain ``big.join(small, key, how)`` row-for-row.

    Only big-side-preserving join types are supported: because the small
    side is replicated once per salt value, an unmatched small-side row
    would surface ``salt`` times under right/full outer joins. Those are
    rejected rather than silently de-duplicated.
    """
    normalized = how.lower().replace(" ", "")
    if normalized not in _ALLOWED_HOW:
        raise ValueError(
            f"salted_join does not support how={how!r}: the small side is "
            f"replicated {salt}x, so right/full outer joins would emit every "
            "unmatched small-side row once per salt value. Use a plain join "
            "(with AQE skew handling) for those."
        )
    if hot is None and hot_threshold is not None:
        hot = hot_keys(big, key, hot_threshold)

    if hot is None:
        big_salted = big.withColumn(SALT_COL, _salt_expr(big, salt, salt_on))
        joined = big_salted.join(
            _replicate(small, salt), on=[key, SALT_COL], how=how
        )
        return joined.drop(SALT_COL)

    # drop a NULL hot key before building the isin: `x IN (..., NULL)` is
    # NULL (never FALSE), which would silently drop every non-hot row from
    # BOTH branches. Null-keyed rows route through the plain branch below,
    # which is also the correct skew treatment for them — null never
    # equi-joins, so salting a null key cannot spread real work.
    hot_vals = [
        r[0]
        for r in hot.select(hot.columns[0]).distinct().limit(
            MAX_HOT_KEYS + 2
        ).collect()
        if r[0] is not None
    ]
    if len(hot_vals) > MAX_HOT_KEYS:
        raise ValueError(
            f"hot key set exceeds {MAX_HOT_KEYS} values — that is no longer "
            "'a few pathological keys'; raise the threshold or fall back to "
            "AQE skew handling"
        )
    if not hot_vals:  # nothing pathological: the plain join IS the plan
        return big.join(small, on=key, how=how)

    is_hot = F.col(key).isin(hot_vals)
    # null keys are never hot (isin -> NULL): route them through the plain
    # branch explicitly so big-preserving joins keep their unmatched rows
    big_hot = big.filter(is_hot)
    big_rest = big.filter(F.col(key).isNull() | ~is_hot)
    small_hot = small.filter(F.col(key).isin(hot_vals))
    small_rest = small.filter(F.col(key).isNull() | ~F.col(key).isin(hot_vals))

    salted = (
        big_hot.withColumn(SALT_COL, _salt_expr(big, salt, salt_on))
        .join(_replicate(small_hot, salt), on=[key, SALT_COL], how=how)
        .drop(SALT_COL)
    )
    plain = big_rest.join(small_rest, on=key, how=how)
    return salted.unionByName(plain)
