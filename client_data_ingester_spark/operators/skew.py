"""Skew-handling join utilities (SURVEY §4 / the 100 TB design bar).

AQE's skew-join handles most cases at runtime (enabled in the session
factory), but when a key's fan-out is known-pathological (one tenant with
10⁹ rows, a null-ish default key), explicit salting bounds the worst task:

- ``salted_join``: replicate the small side ``salt`` times, scatter the big
  side's hot keys across salt buckets → every shuffle partition receives at
  most |key|/salt of the hot key's rows.
- ``hot_keys``: find keys whose row count exceeds a threshold — run it on a
  sample to decide whether salting is worth the replication cost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "_salt"


def hot_keys(df: DataFrame, key: str, min_rows: int) -> DataFrame:
    """Keys whose row count exceeds ``min_rows`` (candidates for salting)."""
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .filter(F.col("n_rows") >= min_rows)
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``big``'s key distribution is heavily skewed.

    big rows get a random salt in [0, salt); small rows are replicated once
    per salt value; the join key becomes (key, salt) so the hot key's rows
    spread over ``salt`` shuffle partitions instead of one straggler task.
    Output columns = the plain join's columns (salt is internal).

    Cost model: replicates the small side ×salt — only worth it when
    |small| × salt ≪ the straggler's row count. For broadcast-able small
    sides prefer F.broadcast (no shuffle at all); salting is for the
    mid-size dimension that is too big to broadcast but joins a skewed fact.

    Only big-side-preserving join types are supported: because the small
    side is replicated once per salt value, an unmatched small-side row
    would surface ``salt`` times under right/full outer joins. Those are
    rejected rather than silently de-duplicated.
    """
    allowed = {
        "inner", "left", "leftouter", "left_outer",
        "semi", "leftsemi", "left_semi",
        "anti", "leftanti", "left_anti", "cross",
    }
    normalized = how.lower().replace(" ", "")
    if normalized not in allowed:
        raise ValueError(
            f"salted_join does not support how={how!r}: the small side is "
            f"replicated {salt}x, so right/full outer joins would emit every "
            "unmatched small-side row once per salt value. Use a plain join "
            "(with AQE skew handling) for those."
        )
    big_salted = big.withColumn(
        SALT_COL, (F.rand(seed=42) * salt).cast("int")
    )
    small_salted = small.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    joined = big_salted.join(small_salted, on=[key, SALT_COL], how=how)
    return joined.drop(SALT_COL)
