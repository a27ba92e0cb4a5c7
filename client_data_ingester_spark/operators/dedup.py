"""Deduplication operators over a document corpus ([EXT], SURVEY §7 Phase 5).

All hashing is **md5-based and engine-portable** (Spark ``md5`` ≡ DuckDB
``md5``), so every operator here has an exact ANSI-SQL oracle — no
engine-specific hash functions. Integer hashes are derived as
``conv(substr(md5(x),1,8),16,10)`` (Spark) ≡ ``('0x'||substr(md5(x),1,8))::bigint``
(DuckDB).

Scale design:
- exact dedup is a hash-groupBy (one shuffle on the 128-bit digest, never on
  the full text);
- MinHash/LSH: shingle → per-permutation min-hash → band buckets → self-join
  *within buckets only* (the classic O(n²) → O(candidates) reduction; band
  buckets are the shuffle key, so skewed buckets are handled by AQE skew
  join);
- SimHash: one explode + one groupBy per doc (bit-vote aggregation), pairs by
  equal fingerprint;
- n-gram Jaccard verifies candidate pairs exactly (array intersect/union on
  distinct shingle sets) — run it on LSH candidates, not all pairs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# shared expressions


def norm_text(c: Column) -> Column:
    """Normalization for exact dedup: lower + collapse whitespace + trim."""
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def words_expr(c: Column) -> Column:
    return F.split(norm_text(c), " ")


def word_shingles(c: Column, k: int) -> Column:
    """Distinct k-word shingles of a text column, as an array<string>."""
    ws = words_expr(c)
    n = F.size(ws)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    return F.array_distinct(
        F.transform(
            idx, lambda i: F.array_join(F.slice(ws, i + 1, k), " ")
        )
    )


def md5_int(c: Column) -> Column:
    """Portable 32-bit-ish integer hash (first 8 hex chars of md5)."""
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")


# ---------------------------------------------------------------------------
# exact dedup


def exact_duplicates(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Groups of byte-identical (normalized) texts.

    Returns (text_hash, n_copies, keeper_id) for every group; n_copies = 1
    means unique. Shuffles on the digest, not the text."""
    return (
        docs.select(
            F.col("doc_id"), F.md5(norm_text(F.col(text_col))).alias("text_hash")
        )
        .groupBy("text_hash")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("doc_id").alias("keeper_id"),
        )
    )


# ---------------------------------------------------------------------------
# MinHash + LSH


def minhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    num_perm: int = 8,
    shingle_k: int = 3,
) -> DataFrame:
    """doc_id + minhash_0..minhash_{num_perm-1} (md5-hex min per permutation).

    A "permutation" p is the keyed hash md5(p || ':' || shingle); the
    signature element is the lexicographic min of the hex digests — fully
    portable across engines, no RNG.

    Shape: one explode + one groupBy(doc_id) with num_perm MIN aggregates.
    The flat explode keeps md5 hashing inside whole-stage codegen (nested
    higher-order-function expressions fall back to interpreted eval), and the
    single doc_id shuffle has map-side partial aggregation — at corpus scale
    this is hash-per-shingle work, not hash-per-shingle-per-permutation
    recomputation of the shingle arrays."""
    exploded = docs.select(
        "doc_id",
        F.explode(word_shingles(F.col(text_col), shingle_k)).alias("sh"),
    )
    return exploded.groupBy("doc_id").agg(
        *[
            F.min(F.md5(F.concat(F.lit(f"{p}:"), F.col("sh")))).alias(
                f"minhash_{p}"
            )
            for p in range(num_perm)
        ]
    )


def lsh_candidate_pairs(
    docs: DataFrame,
    text_col: str = "text",
    num_perm: int = 8,
    bands: int = 4,
    shingle_k: int = 3,
) -> DataFrame:
    """Candidate near-duplicate pairs (a < b) sharing ≥1 LSH band.

    bands must divide num_perm; each band key is the concat of its rows'
    minhashes. The self-join happens per band bucket (shuffle key = band
    value), never across the whole corpus."""
    assert num_perm % bands == 0
    rows_per_band = num_perm // bands
    sigs = minhash_signatures(docs, text_col, num_perm, shingle_k)
    band_exprs = []
    for b in range(bands):
        parts = [
            F.col(f"minhash_{b * rows_per_band + r}") for r in range(rows_per_band)
        ]
        band_exprs.append(
            F.struct(
                F.lit(b).alias("band"),
                F.md5(F.concat_ws("|", *parts)).alias("key"),
            )
        )
    buckets = sigs.select(
        "doc_id", F.explode(F.array(*band_exprs)).alias("bk")
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    a = buckets.alias("a")
    b = buckets.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


# ---------------------------------------------------------------------------
# SimHash


def simhash(
    docs: DataFrame, text_col: str = "text", bits: int = 16
) -> DataFrame:
    """doc_id + simhash fingerprint (``bits``-bit, bit-vote over word hashes).

    One explode + one groupBy; the per-bit votes are plain conditional sums,
    all inside whole-stage codegen."""
    w = docs.select(
        "doc_id", F.explode(words_expr(F.col(text_col))).alias("w")
    ).withColumn("h", md5_int(F.col("w")))
    votes = [
        F.sum(
            F.when(F.col("h").bitwiseAND(F.lit(1 << j)) != 0, 1).otherwise(-1)
        ).alias(f"bit_{j}")
        for j in range(bits)
    ]
    agg = w.groupBy("doc_id").agg(*votes)
    fp = None
    for j in range(bits):
        term = F.when(F.col(f"bit_{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        fp = term if fp is None else fp + term
    return agg.select("doc_id", fp.cast("long").alias("simhash"))


def simhash_duplicate_groups(
    docs: DataFrame, text_col: str = "text", bits: int = 16
) -> DataFrame:
    """Fingerprint → group size + keeper (docs colliding on all bits)."""
    return (
        simhash(docs, text_col, bits)
        .groupBy("simhash")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("keeper_id"))
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard verification


def jaccard_pairs(
    docs: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    shingle_k: int = 3,
    threshold: float = 0.0,
) -> DataFrame:
    """Exact Jaccard over distinct k-word shingle sets for candidate pairs.

    ``pairs`` has (doc_a, doc_b). Jaccard is |∩| / |∪| with scale-4 decimal
    output (portable across engines). Joining shingle *arrays* onto bounded
    candidate pairs keeps this O(candidates), not O(n²)."""
    sh = docs.select(
        F.col("doc_id"),
        word_shingles(F.col(text_col), shingle_k).alias("sh"),
    )
    j = (
        pairs.join(sh.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sh", "sh_a"), "doc_a")
        .join(sh.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sh", "sh_b"), "doc_b")
    )
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    union = F.size(F.col("sh_a")) + F.size(F.col("sh_b")) - inter
    ratio = inter.cast("double") / union.cast("double")
    jac = F.floor(ratio * 10000 + F.lit(0.5)) / 10000  # portable half-up
    return (
        j.select(
            "doc_a",
            "doc_b",
            jac.cast("decimal(9,4)").alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def ngram_jaccard_dedup(
    docs: DataFrame,
    text_col: str = "text",
    shingle_k: int = 3,
    num_perm: int = 8,
    bands: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """LSH-blocked exact-Jaccard near-dup pairs above ``threshold``."""
    cands = lsh_candidate_pairs(docs, text_col, num_perm, bands, shingle_k)
    return jaccard_pairs(docs, cands, text_col, shingle_k, threshold)
