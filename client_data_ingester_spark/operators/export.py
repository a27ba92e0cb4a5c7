"""Training-data export layout ([EXT]): deterministic sharding + manifest.

The write side of a curation pipeline: after dedup/filter/pack, the
corpus ships as N shards whose membership must be a PURE FUNCTION of the
data (not of partitioning, executor count, or execution order) so a
re-export of the same corpus version is byte-identical, downstream
loaders can address shards independently, and a failed export resumes
per-shard. Shard id is md5-derived from the document id — the same
engine-portable hash discipline the samplers use — never Spark's
``hash()`` (seed- and version-dependent) and never round-robin
(order-dependent).

At 100 TB: the assignment is map-only; the physical write is
``repartition(shard_id)`` → one file group per shard (each writer task
streams one shard); the manifest is one vocabulary-free aggregate whose
output is n_shards rows — the thing an orchestrator polls to verify an
export, so it's scored with an oracle like any read-path operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def shard_id_expr(id_col: str, n_shards: int) -> F.Column:
    """Deterministic shard id: top-52-bit md5 of the id, mod n_shards.
    Non-negative by construction (13 hex chars < 2^52), so plain ``%``
    agrees across engines without pmod gymnastics."""
    return (
        F.conv(
            F.substring(F.md5(F.col(id_col).cast("string")), 1, 13), 16, 10
        ).cast("long")
        % n_shards
    ).cast("int")


def _content_digest(id_col: str, content_col: str) -> F.Column:
    """60-bit md5 of ``id || '|' || null-flagged content`` — the row term
    the XOR checksum folds. Shared by :func:`shard_checksums` and the
    checksum-carrying :func:`shard_manifest` so the digest rendering
    cannot drift between the standalone and merged forms."""
    return F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col(id_col).cast("string"),
                    F.lit("|"),
                    F.when(F.col(content_col).isNull(), F.lit("0")).otherwise(
                        F.concat(F.lit("1"), F.col(content_col))
                    ),
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")


def shard_assignments(
    docs: DataFrame, n_shards: int = 16, id_col: str = "doc_id"
) -> DataFrame:
    """Map-only ``(id, shard_id)`` relation — no shuffle, no state."""
    return docs.select(
        F.col(id_col), shard_id_expr(id_col, n_shards).alias("shard_id")
    )


def shard_manifest(
    docs: DataFrame,
    n_shards: int = 16,
    id_col: str = "doc_id",
    size_col: str = "n_chars",
    content_col: str | None = None,
) -> DataFrame:
    """Per-shard export manifest: doc count, payload size, id range, and
    the shard's deviation from the ideal even share in permille (the
    skew number an orchestrator alerts on — md5 sharding keeps it small
    without a size-balancing pass). ``total_chars`` sums ``size_col``
    (default ``n_chars``, a CHARACTER count — a size proxy, not encoded
    bytes: non-ASCII text occupies more UTF-8 bytes than characters;
    pass an actual byte-length column if the alert threshold is in
    bytes). With ``content_col`` set, the manifest also carries each
    shard's order-independent content ``checksum`` (the
    :func:`shard_checksums` XOR digest) computed in the SAME aggregate —
    one scan and one n_shards-group shuffle serve both the layout
    numbers and the validation digests, instead of an orchestrator
    running two corpus passes. One partial-aggregated shuffle; the
    corpus total rides a broadcast 1-row join."""
    cols = [
        shard_id_expr(id_col, n_shards).alias("shard_id"),
        F.col(id_col).alias("_id"),
        F.col(size_col).alias("_sz"),
    ]
    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("_sz").cast("long").alias("total_chars"),
        F.min("_id").alias("min_id"),
        F.max("_id").alias("max_id"),
    ]
    out_cols = ["shard_id", "n_docs", "total_chars", "min_id", "max_id"]
    if content_col is not None:
        cols.append(_content_digest(id_col, content_col).alias("_d"))
        aggs.append(F.expr("bit_xor(_d)").alias("checksum"))
        out_cols.append("checksum")
    per_shard = docs.select(*cols).groupBy("shard_id").agg(*aggs)
    total = docs.agg(F.count(F.lit(1)).alias("_n"))
    return per_shard.crossJoin(F.broadcast(total)).select(
        *out_cols,
        F.floor(
            F.abs(F.col("n_docs") * n_shards - F.col("_n")) * 1000
            / F.col("_n")
        )
        .cast("long")
        .alias("skew_permille"),
    )


def write_shards(
    df: DataFrame,
    path: str,
    n_shards: int = 16,
    id_col: str = "doc_id",
) -> None:
    """Physically export the relation as ``path/shard_id=K/`` parquet:
    repartition BY the shard column first so each shard is written by one
    task as one contiguous file group (partitionBy alone would have every
    input task append a sliver to every shard — N x M small files, the
    classic small-file export bug)."""
    with_shard = df.withColumn("shard_id", shard_id_expr(id_col, n_shards))
    (
        with_shard.repartition(n_shards, "shard_id")
        .write.mode("overwrite")
        .partitionBy("shard_id")
        .parquet(path)
    )


def shard_checksums(
    docs: DataFrame,
    n_shards: int = 16,
    id_col: str = "doc_id",
    content_col: str = "text",
) -> DataFrame:
    """Order-independent per-shard content checksum: XOR of the 60-bit
    md5 of ``id || '|' || content`` over each shard's rows. XOR is
    associative/commutative, so the checksum is partition- and
    order-independent AND incrementally maintainable (a late-arriving
    row folds in with one XOR; a removed row folds OUT with the same
    XOR). This is the export-validation primitive: re-export the corpus
    anywhere and compare n_shards numbers instead of re-reading the
    data.

    NULL content hashes too: a bare ``concat`` null-propagates the
    digest, and ``bit_xor`` skips nulls — so two exports differing only
    in WHICH doc ids carry null text produced identical (n_docs,
    checksum) pairs. The content is rendered with a null-flag prefix
    ('0' for NULL, '1' || text otherwise — prefix-free, so '' and NULL
    and a literal '0' all hash apart) to keep every counted row visible
    in the checksum."""
    return (
        docs.select(
            shard_id_expr(id_col, n_shards).alias("shard_id"),
            _content_digest(id_col, content_col).alias("_d"),
        )
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.expr("bit_xor(_d)").alias("checksum"),
        )
    )
