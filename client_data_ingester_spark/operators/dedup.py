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

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# shared expressions


def norm_text(c: Column) -> Column:
    """Normalization for exact dedup: lower + collapse whitespace + trim."""
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def words_expr(c: Column) -> Column:
    """Word array of normalized text. Empty/whitespace-only text yields an
    EMPTY array, not [''] — split('', ' ') returns [''], which would flow
    an empty-string "word" through every shingle/n-gram/token pipeline
    (all empty docs sharing the '' shingle would read as near-duplicates
    of each other, and contamination would hit 100% on empty eval docs).
    array_remove is a native expression (no higher-order lambda); after
    trim+collapse, '' can only appear for empty text, so this is a no-op
    on any non-empty document."""
    return F.array_remove(F.split(norm_text(c), " "), "")


def word_shingles(c: Column, k: int) -> Column:
    """Distinct k-word shingles of a text column, as an array<string>.

    PERFORMANCE: only use this expression form when the words array is
    already a materialized column; over a raw text column prefer
    ``shingle_arrays``/``exploded_shingles`` below — inlined into one
    projection, the ``slice(split(text)...)`` inside the lambda re-evaluates
    the split once PER SHINGLE POSITION (no common-subexpression elimination
    inside higher-order functions; measured 5× on sf0.1)."""
    ws = words_expr(c)
    n = F.size(ws)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    # array_remove: an EMPTY words array (empty doc) would otherwise
    # regenerate [''] here (slice of [] joins to ''); short-but-nonempty
    # docs keep their partial shingle
    return F.array_remove(
        F.array_distinct(
            F.transform(
                idx, lambda i: F.array_join(F.slice(ws, i + 1, k), " ")
            )
        ),
        "",
    )


def shingle_arrays(
    docs: DataFrame, text_col: str = "text", k: int = 3, fan: bool = True
) -> DataFrame:
    """(doc_id, sh): distinct k-word shingle array per document.

    Two projections ON PURPOSE: the words array is materialized in its own
    project so the shingle lambda references a bound attribute. CollapseProject
    keeps them separate (the alias is referenced more than once); collapsed
    into a single expression the split re-runs per shingle position.

    The tokenize + per-position slice/join kernel is the dominant per-row
    cost of every shingle consumer (minhash, LSH, boilerplate,
    contamination, containment, bloom probes), so the source is fanned
    out here once for all of them (par.fan_out — no-op at scale and on
    already-fanned inputs). ``fan=False`` is for consumers whose lazy
    plan re-executes this subtree several times (the pipeline entry):
    there the added exchange multiplies per re-execution."""
    from .par import fan_out

    if fan:
        docs = fan_out(docs)
    staged = docs.select(
        "doc_id", words_expr(F.col(text_col)).alias("_ws")
    )
    ws = F.col("_ws")
    idx = F.sequence(F.lit(0), F.greatest(F.size(ws) - k, F.lit(0)))
    # array_remove: same empty-doc guard as word_shingles
    sh = F.array_remove(
        F.array_distinct(
            F.transform(
                idx, lambda i: F.array_join(F.slice(ws, i + 1, k), " ")
            )
        ),
        "",
    )
    return staged.select("doc_id", sh.alias("sh"))


def exploded_shingles(
    docs: DataFrame, text_col: str = "text", k: int = 3, fan: bool = True
) -> DataFrame:
    """(doc_id, sh): one row per distinct shingle.

    ``explode_outer`` + IS NOT NULL instead of ``explode``: for a plain
    explode, InferFiltersFromGenerate synthesizes a ``size(arr) > 0``
    pre-filter whose pushdown through the projections re-inlines the whole
    shingle construction against the raw text — the dominant cost of the
    minhash pipeline before this formulation (measured 4× on sf0.1). Result
    set is identical (empty arrays yield a null that the filter drops)."""
    return (
        shingle_arrays(docs, text_col, k, fan=fan)
        .select("doc_id", F.explode_outer("sh").alias("sh"))
        .filter(F.col("sh").isNotNull())
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
    exploded = exploded_shingles(docs, text_col, shingle_k)
    return exploded.groupBy("doc_id").agg(
        *[
            F.min(F.md5(F.concat(F.lit(f"{p}:"), F.col("sh")))).alias(
                f"minhash_{p}"
            )
            for p in range(num_perm)
        ]
    )


def minhash_band_keys(
    docs: DataFrame,
    text_col: str = "text",
    num_perm: int = 8,
    bands: int = 4,
    shingle_k: int = 3,
) -> DataFrame:
    """``(doc_id, band, key)`` — the persistable LSH index relation.

    A band key is a per-document function only (md5 over that band's
    minhash rows), so the relation is INCREMENTAL by construction: computing
    it for a new batch of documents never touches previously-indexed ones.
    Persist it partitioned/bucketed by ``key`` and daily dedup becomes
    "hash the new docs, equi-join the index" (see
    :func:`incremental_lsh_candidates`) instead of re-signing the corpus.
    """
    if num_perm % bands != 0:
        # a real raise, not assert: under python -O a non-dividing bands
        # would silently use only num_perm//bands*bands permutations,
        # quietly changing LSH recall
        raise ValueError(f"bands ({bands}) must divide num_perm ({num_perm})")
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
    return (
        sigs.select("doc_id", F.explode(F.array(*band_exprs)).alias("bk"))
        .select(
            "doc_id",
            F.col("bk.band").alias("band"),
            F.col("bk.key").alias("key"),
        )
    )


def incremental_lsh_candidates(
    new_docs: DataFrame,
    index: DataFrame,
    text_col: str = "text",
    num_perm: int = 8,
    bands: int = 4,
    shingle_k: int = 3,
    band_keys: DataFrame | None = None,
) -> DataFrame:
    """Near-duplicate candidates of a NEW batch against an already-indexed
    corpus: ``(doc_a, doc_b)`` with ``doc_a < doc_b``, where one side is a
    new document and the other an indexed one.

    The batch is signed once (cost ∝ batch size, never corpus size) and its
    band keys equi-join the persisted index on ``(band, key)`` — a plain
    hash join that prunes/partitions on the key at scale. Together with
    in-batch pairs (``lsh_candidate_pairs`` over the batch alone) this
    reproduces exactly the pairs a full re-run over old ∪ new would emit
    involving a new document (pinned by test): a shared band key between
    two documents does not depend on what else is in the corpus.

    ``band_keys``: pass the batch's precomputed ``(doc_id, band, key)``
    relation (same escape hatch as :func:`lsh_candidate_pairs`) when the
    caller has already signed the batch — e.g. the streaming twin signs
    once, lands the shard, and reuses it for both the in-batch pairs and
    this cross-index join.
    """
    new_bands = (
        band_keys
        if band_keys is not None
        else minhash_band_keys(new_docs, text_col, num_perm, bands, shingle_k)
    )
    joined = new_bands.alias("n").join(
        index.alias("i"),
        (F.col("n.band") == F.col("i.band"))
        & (F.col("n.key") == F.col("i.key"))
        & (F.col("n.doc_id") != F.col("i.doc_id")),
    )
    return (
        joined.select(
            F.least(F.col("n.doc_id"), F.col("i.doc_id")).alias("doc_a"),
            F.greatest(F.col("n.doc_id"), F.col("i.doc_id")).alias("doc_b"),
        )
        .distinct()
    )


def lsh_candidate_pairs(
    docs: DataFrame,
    text_col: str = "text",
    num_perm: int = 8,
    bands: int = 4,
    shingle_k: int = 3,
    band_keys: DataFrame | None = None,
) -> DataFrame:
    """Candidate near-duplicate pairs (a < b) sharing ≥1 LSH band.

    bands must divide num_perm; each band key is the concat of its rows'
    minhashes. Pairs are generated by grouping doc ids per band bucket and
    expanding combinations *inside* the (tiny) bucket array — one shuffle on
    the bucket key and one pass over the minhash pipeline, instead of a
    self-join that computes the signature relation twice. Work stays
    O(Σ bucket²) with bucket sizes bounded by collision rate; a pathological
    all-identical corpus degenerates the same way under either formulation.

    ``band_keys``: pass a precomputed ``(doc_id, band, key)`` relation
    (e.g. the persisted ``minhash_band_keys`` index, or a batch signed
    once and reused for both in-batch and cross-index pair generation)
    to skip the signing pass entirely."""
    buckets = (
        band_keys
        if band_keys is not None
        else minhash_band_keys(docs, text_col, num_perm, bands, shingle_k)
    )
    return in_bucket_pairs(buckets, "doc_id", "doc_a", "doc_b")


def in_bucket_pairs(
    keyed: DataFrame,
    id_col: str,
    out_a: str,
    out_b: str,
    bucket_cols: tuple[str, str] = ("band", "key"),
    min_band: bool = False,
) -> DataFrame:
    """Distinct ordered pairs (a < b) of ids sharing at least one bucket.

    THE banded-LSH pair-generation idiom, shared by the minhash pipeline
    here and the random-hyperplane pipeline
    (``similarity.embedding_near_duplicates``) so a change to the
    expansion (a bucket-size cap, an ordering tweak) lands in both: one
    shuffle on the bucket key, ids collected and sorted per bucket, and
    combinations expanded INSIDE the (tiny) bucket array — never a
    self-join that would compute the key relation twice. Work is
    O(Σ bucket²); bucket sizes are bounded by the hash's collision rate.

    ``min_band=True`` switches the final dedup from DISTINCT to
    **min-band emission**: each id carries its full per-band key vector
    into the bucket, and a pair is emitted ONLY from its first common
    band (no earlier band where both keys match). Output set is
    identical — every colliding pair still appears exactly once — but
    nothing is shuffled twice: the DISTINCT pass over the expanded pairs
    disappears. This matters precisely where banded LSH is most
    duplicative: near-identical vectors (the duplicate clusters the
    operator exists to find) collide in EVERY band, so with b bands the
    expansion emits each true pair b times and the distinct shuffles
    b× the answer (~20× at the sf1 recall-holding RP geometry).
    REQUIRES every id to appear in every band of ``keyed`` (true for any
    full-corpus band-key table; NOT for streaming probe unions where a
    standing index and a probe batch are mixed — keep the default there).
    """
    if min_band:
        band_col, _ = bucket_cols
        # collect_SET: duplicate (band, key, id) rows must not misalign
        # the band-indexed key vector (same hazard the default path's
        # collect_set guards against)
        key_vecs = keyed.groupBy(id_col).agg(
            F.transform(
                F.sort_array(
                    F.collect_set(F.struct(*bucket_cols))
                ),
                lambda s: s[bucket_cols[1]],
            ).alias("_bk")
        )
        grouped = (
            keyed.join(key_vecs, id_col)
            .groupBy(*bucket_cols)
            .agg(
                F.sort_array(
                    F.collect_set(F.struct(F.col(id_col).alias("i"), "_bk"))
                ).alias("ids")
            )
            .filter(F.size("ids") > 1)
        )
        ids = F.col("ids")
        band = F.col(band_col)
        pair_structs = F.flatten(
            F.transform(
                ids,
                lambda x, i: F.transform(
                    F.filter(
                        F.slice(ids, i + 2, F.size(ids)),
                        # first-common-band test: no band j < this one
                        # where both key vectors already collide (slice of
                        # length `band` is empty at band 0 — every pair
                        # passes there, the base of the induction)
                        lambda y: ~F.exists(
                            F.zip_with(
                                F.slice(x["_bk"], 1, band),
                                F.slice(y["_bk"], 1, band),
                                lambda a, b: a == b,
                            ),
                            lambda hit: hit,
                        ),
                    ),
                    lambda y: F.struct(
                        x["i"].alias(out_a), y["i"].alias(out_b)
                    ),
                ),
            )
        )
        return grouped.select(F.explode(pair_structs).alias("p")).select(
            f"p.{out_a}", f"p.{out_b}"
        )
    grouped = (
        keyed.groupBy(*bucket_cols)
        # collect_SET, not list: a duplicate (bucket, id) row — e.g. a doc
        # present in both a re-signed batch and the standing band index it
        # is probed against — must not fabricate a self-pair (id, id)
        .agg(F.sort_array(F.collect_set(id_col)).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    ids = F.col("ids")
    pair_structs = F.flatten(
        F.transform(
            ids,
            lambda x, i: F.transform(
                F.slice(ids, i + 2, F.size(ids)),
                lambda y: F.struct(x.alias(out_a), y.alias(out_b)),
            ),
        )
    )
    return (
        grouped.select(F.explode(pair_structs).alias("p"))
        .select(f"p.{out_a}", f"p.{out_b}")
        .distinct()
    )


def in_bucket_star_edges(
    keyed: DataFrame,
    id_col: str,
    out_a: str,
    out_b: str,
    bucket_cols: tuple[str, str] = ("band", "key"),
) -> DataFrame:
    """Spanning star edges per bucket: ``(min_id_in_bucket, other_id)``
    for every non-minimum member — **O(bucket) rows where
    ``in_bucket_pairs`` emits Θ(bucket²)**.

    The clustering-path twin of ``in_bucket_pairs``: connected components
    over exact-key buckets only needs the buckets CONNECTED, not every
    pair enumerated — a star through the bucket minimum spans exactly the
    same components (any in-bucket pair (x, y) is the 2-path x—hub—y), so
    ``duplicate_clusters(star_edges)`` is value-identical to
    ``duplicate_clusters(pairs)`` while the edge relation stays linear in
    corpus rows at ANY bucket density. At 100 TB nobody materializes the
    Θ(n²) pair list of a duplicate-dense corpus to then throw 99% of it
    away inside the contraction's first ``distinct`` — feed the cluster /
    retained consumers THIS; keep ``in_bucket_pairs`` for consumers whose
    ANSWER is the pair list.

    One shuffle (window-min over the bucket key — partitioned, bounded
    state); emits nothing for singleton buckets. Cross-band duplicate
    edges are left in: ``duplicate_clusters`` canonicalizes + distincts
    its (linear) input edge set anyway, which is where dedup belongs.
    For VERIFIED pipelines (a similarity check between candidacy and
    clustering) a plain star is NOT equivalence-preserving — use
    ``similarity.embedding_dup_edges``, which verifies hub edges and
    re-expands only the members whose hub edge failed."""
    w = Window.partitionBy(*[F.col(c) for c in bucket_cols])
    return (
        keyed.select(
            F.col(id_col).alias(out_b),
            F.min(id_col).over(w).alias(out_a),
        )
        .where(F.col(out_b) != F.col(out_a))
        .select(out_a, out_b)
    )


def incremental_lsh_star_edges(
    new_docs: DataFrame,
    index: DataFrame,
    text_col: str = "text",
    num_perm: int = 8,
    bands: int = 4,
    shingle_k: int = 3,
    band_keys: DataFrame | None = None,
) -> DataFrame:
    """``incremental_lsh_candidates`` for CLUSTERING consumers: each new
    document emits ONE edge per colliding bucket — to the bucket's
    minimum indexed doc id — instead of one per indexed member.

    Why components are preserved across batches (induction on arrival
    order): every already-indexed member of bucket B connected into B's
    component when IT arrived (via its own cross star edge, or the
    in-batch star of the batch that introduced it), so a new doc only
    needs ANY single anchor into B. Full emission pays
    Θ(batch × cluster) edges in steady state — every new duplicate
    re-enumerates the entire standing cluster — which is the same
    quadratic the batch path shed with ``in_bucket_star_edges``; this
    pays O(batch × bands). Keep ``incremental_lsh_candidates`` where the
    pair list is the answer (the scored incremental-candidates query).
    """
    new_bands = (
        band_keys
        if band_keys is not None
        else minhash_band_keys(new_docs, text_col, num_perm, bands, shingle_k)
    )
    joined = new_bands.alias("n").join(
        index.alias("i"),
        (F.col("n.band") == F.col("i.band"))
        & (F.col("n.key") == F.col("i.key"))
        & (F.col("n.doc_id") != F.col("i.doc_id")),
    )
    anchored = (
        joined.select(
            F.col("n.doc_id").alias("_nd"),
            F.col("n.band").alias("band"),
            F.col("n.key").alias("key"),
            F.col("i.doc_id").alias("_id"),
        )
        .groupBy("_nd", "band", "key")
        .agg(F.min("_id").alias("_anchor"))
    )
    return anchored.select(
        F.least(F.col("_nd"), F.col("_anchor")).alias("doc_a"),
        F.greatest(F.col("_nd"), F.col("_anchor")).alias("doc_b"),
    ).distinct()


def lsh_spanning_edges(
    docs: DataFrame,
    text_col: str = "text",
    num_perm: int = 8,
    bands: int = 4,
    shingle_k: int = 3,
    band_keys: DataFrame | None = None,
) -> DataFrame:
    """``lsh_candidate_pairs`` for CLUSTERING consumers: same banded
    minhash blocking, but emits the per-bucket spanning star
    (``in_bucket_star_edges``) instead of the full pair expansion —
    connected components over the two edge sets are identical (see the
    star-edge docstring), and the edge relation is O(n·bands) instead of
    Θ(Σ bucket²). Feed this to ``build_cluster_index`` /
    ``duplicate_clusters``; keep ``lsh_candidate_pairs`` where the pair
    list itself is the answer (verify stages, scored pair queries)."""
    buckets = (
        band_keys
        if band_keys is not None
        else minhash_band_keys(docs, text_col, num_perm, bands, shingle_k)
    )
    return in_bucket_star_edges(buckets, "doc_id", "doc_a", "doc_b")


# ---------------------------------------------------------------------------
# SimHash


def simhash(
    docs: DataFrame, text_col: str = "text", bits: int = 16
) -> DataFrame:
    """doc_id + simhash fingerprint (``bits``-bit, bit-vote over word hashes).

    One explode + one groupBy; the per-bit votes are plain conditional sums,
    all inside whole-stage codegen. (outer-explode + IS NOT NULL for the
    same InferFiltersFromGenerate reason as ``exploded_shingles``.)"""
    w = (
        docs.select("doc_id", words_expr(F.col(text_col)).alias("_w"))
        .select("doc_id", F.explode_outer("_w").alias("w"))
        .filter(F.col("w").isNotNull())
        .withColumn("h", md5_int(F.col("w")))
    )
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
    sh = shingle_arrays(docs, text_col, shingle_k)
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
            jac.cast("double").alias("jaccard"),
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


# ---------------------------------------------------------------------------
# duplicate clustering (connected components over candidate pairs)


# Edge count at or below which ``duplicate_clusters`` solves the
# components on the driver (vectorized numpy hash-min over the collected
# edge list) instead of scheduling large-star/small-star rounds. The
# bound is on the COLLECTED payload — 2M edges = two int64 columns =
# 32 MB, the same order as a default broadcast-join threshold — so the
# fast path is exactly the AQE-style "small enough to centralize"
# decision, never a driver-side loop over big data: a 100 TB corpus's
# spanning-edge relation (O(n·bands) rows, billions) fails the gate and
# takes the distributed contraction unchanged. At bench scale the
# contraction is pure scheduler overhead (~6 rounds x 4 shuffles over a
# few hundred edges), so the local solve removes ~20 scheduled jobs.
LOCAL_SOLVE_MAX_EDGES = 2_000_000

_LOCAL_SOLVE_NP_TYPES = {
    "bigint": "int64", "int": "int32", "smallint": "int16", "tinyint": "int8",
}


def _local_min_label_components(hi, lo):
    """Exact min-label connected components over int64 edge arrays:
    vectorized hash-min (scatter-min along edges + full pointer-jump
    compression per round) — the same fixpoint the distributed
    large-star/small-star converges to, O(log n) numpy passes, no
    Python-per-edge loop. Returns (nodes, labels) aligned arrays."""
    import numpy as np

    nodes, inv = np.unique(np.concatenate([hi, lo]), return_inverse=True)
    ia, ib = inv[: len(hi)], inv[len(hi):]
    label = np.arange(len(nodes), dtype=np.int64)
    for _ in range(64):
        before = label.copy()
        m = np.minimum(label[ia], label[ib])
        np.minimum.at(label, ia, m)
        np.minimum.at(label, ib, m)
        while True:  # pointer-jump to a rooted forest (label == label[label])
            nxt = label[label]
            if np.array_equal(nxt, label):
                break
            label = nxt
        if np.array_equal(label, before):
            # fixpoint: labels are constant along every edge, and the
            # constant is the component's minimum dense index (labels
            # only ever move to same-component node indices and the
            # minimum's own label can never rise above itself)
            return nodes, nodes[label]
    raise RuntimeError(
        "local components did not converge in 64 rounds — impossible for "
        "hash-min over a finite graph; file a bug"
    )


def duplicate_clusters(
    pairs: DataFrame,
    max_iter: int = 25,
    reliable: bool = False,
    check_every: int = 1,
    local_max_edges: int | None = None,
) -> DataFrame:
    """(doc_id, cluster_id): connected components over candidate-pair edges,
    labeling every member with the cluster's minimum doc id (the keeper).

    HYBRID: after canonicalizing+materializing the edge relation, ONE
    count decides the physical strategy (the AQE pattern — plan by
    measured size, not hope). At or below ``local_max_edges``
    (default ``LOCAL_SOLVE_MAX_EDGES``; pass 0 to disable) the edges are
    collected and solved exactly on the driver with a vectorized numpy
    hash-min — a bounded O(threshold)=~32 MB centralize, like a
    broadcast join's build side — because at that size the distributed
    contraction is pure job-scheduling overhead. Above it (any corpus
    that matters at 100 TB: spanning edges are O(n·bands)) the
    large-star/small-star rounds below run unchanged. Both paths
    converge to the identical min-label fixpoint; equality is pinned by
    ``tests/test_operators.py`` property tests and the scaled
    union-find oracle gates.

    The dedup ENDGAME: LSH/verify emits pairs, but retention policy needs
    per-document cluster assignment ("keep min id, drop the rest") even when
    duplicates chain A~B~C without A~C ever being a candidate pair.

    Algorithm: alternating **large-star / small-star** rounds (Kiveris et
    al., "Connected Components in MapReduce and Beyond", SoCC'14) — each
    round rewires every node toward the smallest id it can currently see,
    which contracts a component of ANY diameter in **O(log n) rounds**
    (min-label propagation needs O(diameter) rounds: a 10⁶-document chain
    would need 10⁶ of them; this needs ~20). Per round the work is two
    groupBy-min's and two joins on the node id — plain shuffles Catalyst/AQE
    handle like any aggregation, nothing driver-side except the convergence
    scalar. Lineage is truncated between rounds through ``ckpt.pin`` so
    round N's plan doesn't embed rounds 1..N-1 — ``reliable=True`` swaps
    the executor-local blocks for SparkContext-checkpoint-dir blocks,
    which survive executor loss on a real cluster (set
    ``ckpt.ensure_checkpoint_dir`` first); the local default is free on
    local[N] but non-recoverable at cluster scale. On the LOCAL fast
    path ``reliable=`` is a no-op: the driver-side collect IS the
    materialization (there are no per-round lineage chains to truncate
    and no checkpoint blocks are written), so callers must not assume
    checkpoint-dir blocks exist unless the edge count exceeded the gate.

    - large-star(u): every neighbor v > u re-attaches to m = min(Γ(u) ∪ u)
    - small-star(u): u and its neighbors v < u collapse onto their minimum

    At the fixpoint the edge set IS the answer: a star per component, every
    member pointing at the component's minimum id. Convergence is detected
    by a (count, id-sum) checksum going stable — then CONFIRMED with an
    exact consecutive-round set compare before trusting it (so checksum
    aliasing can never yield a wrong clustering). The checksum doubles
    as the checkpoint-materializing action (``pin(eager=False)``): what
    used to be 2 scheduled jobs per round — materialize, then
    aggregate — is 1. ``check_every`` > 1 would skip intermediate
    checksums, but measured at sf0.1 it LOSES: convergence detection
    lags by up to ``check_every`` rounds and each undetected round adds
    a full round of shuffles — 2.6 s (every round) vs 3.6 s (every 2nd)
    vs 4.0 s (every 4th) for the same 407-edge relation — so the
    default checks every round; the knob stays for corpora whose round
    cost dwarfs a delayed stop."""
    from .ckpt import pin
    # canonical directed edges (hi > lo), deduped, self-loops dropped, and
    # materialized ONCE — otherwise every round re-executes the entire
    # upstream pipeline (LSH, verify, ...) that produced the pairs
    edges = pin(
        pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
        .where(F.col("a") != F.col("b"))
        .select(
            F.greatest("a", "b").alias("hi"), F.least("a", "b").alias("lo")
        )
        .distinct(),
        reliable,
        eager=False,  # materializes under the size probe's count action
    )
    cap = LOCAL_SOLVE_MAX_EDGES if local_max_edges is None else local_max_edges
    id_sql_type = edges.schema["hi"].dataType.simpleString()
    np_type = _LOCAL_SOLVE_NP_TYPES.get(id_sql_type)
    # the count doubles as the checkpoint-materializing action (the job
    # round 1's checksum used to play), so the size probe is ~free.
    # cap <= 0 disables the fast path UNCONDITIONALLY (even for an empty
    # edge relation — `0 <= 0` must not sneak an all-self-loop input
    # onto the local path when a caller asked for the distributed one)
    if np_type is not None and cap > 0 and edges.count() <= cap:
        import numpy as np
        import pandas as pd

        epdf = edges.toPandas()
        nodes, labels = _local_min_label_components(
            epdf["hi"].to_numpy(dtype=np.int64),
            epdf["lo"].to_numpy(dtype=np.int64),
        )
        out = pd.DataFrame(
            {
                "doc_id": nodes.astype(np_type),
                "cluster_id": labels.astype(np_type),
            }
        )
        id_type = edges.schema["hi"].dataType
        return pairs.sparkSession.createDataFrame(
            out,
            schema=T.StructType(
                [
                    T.StructField("doc_id", id_type, False),
                    T.StructField("cluster_id", id_type, False),
                ]
            ),
        )
    prev_chk = None
    converged = False
    for it in range(max_iter):
        sym = edges.select(
            F.col("hi").alias("u"), F.col("lo").alias("v")
        ).union(edges.select(F.col("lo").alias("u"), F.col("hi").alias("v")))
        # large-star: neighbors above u re-attach to min(Γ(u) ∪ {u})
        mins = sym.groupBy("u").agg(F.min("v").alias("mn"))
        large = (
            sym.join(mins, "u")
            .where(F.col("v") > F.col("u"))
            .select(
                F.col("v").alias("hi"),
                F.least(F.col("mn"), F.col("u")).alias("lo"),
            )
        )
        # small-star: u and its below-u neighbors collapse onto their min
        lsym = large.select(
            F.col("hi").alias("u"), F.col("lo").alias("v")
        ).union(large.select(F.col("lo").alias("u"), F.col("hi").alias("v")))
        sn = lsym.where(F.col("v") < F.col("u"))
        smins = sn.groupBy("u").agg(F.min("v").alias("mn"))
        new_edges = pin(
            sn.join(smins, "u")
            .where(F.col("v") != F.col("mn"))
            .select(F.col("v").alias("hi"), F.col("mn").alias("lo"))
            .union(
                smins.select(F.col("u").alias("hi"), F.col("mn").alias("lo"))
            )
            .where(F.col("hi") != F.col("lo"))
            .distinct(),
            reliable,
            eager=False,
        )
        if (it + 1) % max(1, check_every) == 0 or it == max_iter - 1:
            # one action serves double duty: materializes every pending
            # round checkpoint in the lineage AND returns the checksum
            chk = tuple(
                new_edges.agg(
                    F.count(F.lit(1)), F.sum(F.col("hi") + F.col("lo"))
                ).first()
            )
            if chk == prev_chk:
                # checksum-stable; confirm exactly against the previous
                # ROUND (consecutive-round equality IS a fixpoint: the
                # operator applied to `edges` reproduced `edges`). ONE
                # symmetric-difference action instead of two exceptAll
                # probes — both sides are deduped star edges, so a plain
                # full-outer null check is an exact set compare; runs
                # once per clustering, not once per round.
                diff = (
                    new_edges.join(edges, ["hi", "lo"], "full_outer")
                    .where(
                        new_edges["hi"].isNull() | edges["hi"].isNull()
                    )
                )
                if diff.limit(1).count() == 0:
                    edges = new_edges
                    converged = True
                    break
            prev_chk = chk
        edges = new_edges
    if not converged:
        # a partial contraction is a WRONG clustering (members of one
        # component may still point at different minima) — fail loudly
        # instead of silently diverging from the exact transitive closure.
        raise RuntimeError(
            f"duplicate_clusters: large-star/small-star did not converge "
            f"within max_iter={max_iter} rounds — pathological for O(log n) "
            f"contraction; raise max_iter"
        )
    # fixpoint edges ARE the labeling — a star per component: every
    # non-minimum member appears exactly once as hi pointing at its
    # component minimum, and each minimum appears only on the lo side
    # (labeling itself). No node table, no final join.
    member = edges.select(
        F.col("hi").alias("doc_id"), F.col("lo").alias("cluster_id")
    )
    minima = (
        edges.select(F.col("lo").alias("doc_id"))
        .distinct()
        .withColumn("cluster_id", F.col("doc_id"))
    )
    return member.union(minima)


def build_cluster_index(
    pairs: DataFrame,
    path: str,
    max_iter: int = 25,
    reliable: bool = False,
) -> None:
    """BUILD STEP: run the large-star/small-star contraction ONCE and persist
    the (doc_id, cluster_id) labeling as parquet.

    Clustering is the dominant dedup cost at scale (iterative, O(log n)
    shuffle rounds over the candidate-edge set); like the IVF/RP/k-means/PQ
    indexes it is a pure function of the corpus, so it belongs at WRITE
    time. The retention-policy consumers (membership, representative
    selection, retained corpus) then PROBE a narrow 2-column table instead
    of each re-paying LSH + the full contraction."""
    duplicate_clusters(pairs, max_iter=max_iter, reliable=reliable).write.mode(
        "overwrite"
    ).parquet(path)


def load_cluster_index(spark, path: str) -> DataFrame:
    """Read a persisted (doc_id, cluster_id) labeling written by
    ``build_cluster_index``."""
    return spark.read.parquet(path)


def warm_start_clusters(
    old_labels: DataFrame,
    new_edges: DataFrame,
    max_iter: int = 25,
    reliable: bool = False,
) -> DataFrame:
    """Incremental connected components: fold ``new_edges`` into a previous
    ``duplicate_clusters`` labeling WITHOUT re-contracting the full edge
    set. Exactly equivalent to re-running the batch contraction over
    (old edges ∪ new edges) — including merges of clusters first formed
    in different refreshes — because the old labeling IS the old edge
    set's transitive closure in star form.

    Shape (the 100 TB argument):
    - each new-edge endpoint is mapped to its old cluster root (itself if
      unlabeled) — one broadcast-sized join per side against the
      delta-distinct endpoint set;
    - the iterative large-star/small-star contraction then runs over the
      ROOT-level super-graph only: |nodes| ≤ 2·|new edges|, so
      rounds-to-fixpoint and per-round shuffle depend on the delta, never
      the corpus (old components are stars — diameter ≤ 2 — so they never
      add rounds);
    - relabeling is a single narrow pass over the old 2-column labeling
      with a broadcast remap of the AFFECTED roots; untouched clusters
      stream through a broadcast left-anti.

    Correctness of the minimum-id label: an old ``cluster_id`` is the min
    doc id of its members, so the super-graph's min over
    {old roots ∪ new doc ids} is the min over the merged membership.
    """
    lab = old_labels.select("doc_id", "cluster_id")
    e = (
        new_edges.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    # endpoint -> old root (itself when unlabeled). The labeling may be
    # corpus-sized, but the JOIN OUTPUT is delta-sized; hash-partitioned
    # equi-joins on doc_id, nothing corpus-sized is broadcast.
    la = lab.select(
        F.col("doc_id").alias("a"), F.col("cluster_id").alias("_ra")
    )
    lb = lab.select(
        F.col("doc_id").alias("b"), F.col("cluster_id").alias("_rb")
    )
    super_edges = (
        e.join(la, "a", "left")
        .join(lb, "b", "left")
        .select(
            F.coalesce("_ra", "a").alias("doc_a"),
            F.coalesce("_rb", "b").alias("doc_b"),
        )
        .where(F.col("doc_a") != F.col("doc_b"))  # intra-cluster edges vanish
    )
    if super_edges.isEmpty():
        return lab
    # delta-sized contraction: nodes are old roots and brand-new doc ids
    super_labels = duplicate_clusters(
        super_edges, max_iter=max_iter, reliable=reliable
    )
    from .ckpt import pin

    # delta-sized; broadcast below. Same reliable= seam as the
    # contraction rounds: executor-local blocks are fine interactively,
    # durable checkpoints on a cluster where an executor loss mid-remap
    # must recover instead of failing the refresh.
    remap = pin(
        super_labels.select(
            F.col("doc_id").alias("_old_root"),
            F.col("cluster_id").alias("_new_root"),
        ),
        reliable,
    )
    updated = lab.join(
        F.broadcast(remap), lab.cluster_id == F.col("_old_root")
    ).select("doc_id", F.col("_new_root").alias("cluster_id"))
    untouched = lab.join(
        F.broadcast(remap.select(F.col("_old_root").alias("cluster_id"))),
        "cluster_id",
        "left_anti",
    ).select("doc_id", "cluster_id")
    # super-graph nodes that were never labeled before (new docs)
    new_nodes = super_labels.join(
        lab.select("doc_id"), "doc_id", "left_anti"
    ).select("doc_id", "cluster_id")
    return untouched.unionByName(updated).unionByName(new_nodes)


def cluster_representatives(
    docs: DataFrame,
    pairs: DataFrame | None = None,
    text_col: str = "text",
    clusters: DataFrame | None = None,
) -> DataFrame:
    """(cluster_id, n_members, rep_doc_id, rep_quality): pick the document
    to KEEP from every duplicate cluster — the retention-policy step after
    clustering. Representative = highest quality score, ties to the lowest
    doc id.

    The argmax is a single ``min_by`` over a packed sort key
    ``lpad(10000−q₄) || lpad(doc_id)`` (q₄ = the quality score at scale 4 as
    an integer): engines disagree on composite argmax support, but min-by-
    one-string is universal and the pack makes the tie-break explicit. One
    groupBy on cluster_id; quality joins 1:1 on doc_id."""
    from .text import quality_scores

    # pass precomputed clusters (ideally the persisted ``build_cluster_index``
    # artifact) to share one contraction across consumers —
    # duplicate_clusters runs its star rounds EAGERLY at build time, so a
    # second call re-pays the whole iterative loop
    if clusters is None:
        if pairs is None:
            raise ValueError(
                "cluster_representatives: pass candidate pairs or a "
                "precomputed clusters labeling"
            )
        clusters = duplicate_clusters(pairs)
    # re-quantize the (already half-up-rounded) score to its exact scale-4
    # integer — floor(q*1e4+0.5) recovers the integer the rounding produced,
    # immune to the binary representation of n/1e4
    qual = quality_scores(docs, text_col).select(
        "doc_id",
        F.floor(F.col("quality_score") * 10000 + F.lit(0.5))
        .cast("int")
        .alias("_q4"),
    )
    # 20-digit id pad: Spark's lpad TRUNCATES over-length strings, so a
    # 12-digit pad silently corrupts the key for doc_id ≥ 10^12 — reachable
    # with sparse monotonically_increasing_id (partition p starts at p·2^33,
    # 13 digits at ~117 partitions). 20 digits covers all of int64.
    # DOMAIN: the pack assumes NON-NEGATIVE numeric ids (this repo's id
    # contract — monotonically_increasing_id and the snapshot ledger never
    # mint negatives); a negative id's '-' inside the pad, or a >20-char
    # string id, would corrupt the tie-break ordering. For external string
    # id spaces (UUIDs), pass ids through a numeric surrogate first.
    pack = F.concat(
        F.lpad((F.lit(10000) - F.col("_q4")).cast("string"), 5, "0"),
        F.lpad(F.col("doc_id").cast("string"), 20, "0"),
    )
    return (
        clusters.join(qual, "doc_id")
        .withColumn("_pack", pack)
        .groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.min_by(F.col("doc_id"), F.col("_pack")).alias("rep_doc_id"),
            (
                F.min_by(F.col("_q4"), F.col("_pack")).cast("double") / 10000
            ).alias("rep_quality"),
        )
    )


def retained_corpus(
    docs: DataFrame,
    pairs: DataFrame | None = None,
    text_col: str = "text",
    clusters: DataFrame | None = None,
) -> DataFrame:
    """(doc_id): the post-dedup corpus — every unclustered document plus
    exactly one representative (highest quality, ties to lowest id) from
    each duplicate cluster. The end-to-end retention step: this is the set
    a training pipeline actually keeps after LSH → verify → cluster →
    pick-representative.

    One clustering pass (ideally the persisted ``build_cluster_index``
    artifact, passed via ``clusters``) shared between membership and
    representative selection; the drop set (cluster members that are not
    their cluster's representative) is corpus-small and the final
    subtraction is a LEFT ANTI join on doc_id — no full-corpus shuffle
    beyond it."""
    if clusters is None:
        if pairs is None:
            raise ValueError(
                "retained_corpus: pass candidate pairs or a precomputed "
                "clusters labeling"
            )
        clusters = duplicate_clusters(pairs)
    reps = cluster_representatives(
        docs, None, text_col, clusters=clusters
    ).select("rep_doc_id")
    drop = clusters.select("doc_id").join(
        reps, F.col("doc_id") == F.col("rep_doc_id"), "left_anti"
    )
    return docs.select("doc_id").join(drop, "doc_id", "left_anti")


def chunk_dedup_stats(
    docs: DataFrame,
    text_col: str = "text",
    divisor: int = 8,
) -> DataFrame:
    """Substring-level dedup via content-defined chunking (CDC): split each
    document's token stream at ROLLING-HASH boundaries, hash each chunk,
    and report per document how many of its chunks also occur elsewhere in
    the corpus (the "duplicated span" signal document-level dedup misses —
    boilerplate headers, quoted passages, templated spans).

    Content-defined (not fixed-width) boundaries are what make the chunks
    insertion-stable: a boundary fires where the hash of the trailing
    3-token window ≡ 0 (mod ``divisor``), so an edit only redraws the
    chunks it touches — the same shared passage chunks identically in two
    different documents, which is exactly what lets the corpus-wide
    chunk-hash count find it. Expected chunk length ≈ ``divisor`` tokens.

    Shape: chunking is MAP-SIDE per document — boundary positions, chunk
    slices, and chunk hashes are array expressions over the staged words
    column, so the token relation NEVER shuffles (the previous form
    posexploded every token through a doc-keyed window sort plus a
    (doc, chunk) aggregate: two full token-relation shuffles that existed
    only to rebuild per-doc adjacency the words array already has). The
    only shuffled relations are chunk-level (~tokens/divisor rows): the
    global occurrence count and the per-doc fold. All keys are doc_id or
    chunk_hash — uniform, unskewed at any corpus size.
    """
    from .par import fan_out

    # tokenize + per-trigram md5 rolling hash is the per-row kernel; fan
    # the single-split local scan out first (no-op at scale — par.fan_out)
    staged = fan_out(docs).select(
        "doc_id", words_expr(F.col(text_col)).alias("_ws")
    )
    ws = F.col("_ws")
    n = F.size(ws)

    def rolling32(i):
        # identical hash text to the previous lag-based form: the
        # trailing 3-token window joined with single spaces (defined for
        # 0-based positions i >= 2 only, the sole place it is evaluated)
        h = F.md5(
            F.concat_ws(
                " ",
                F.element_at(ws, i - 1),
                F.element_at(ws, i),
                F.element_at(ws, i + 1),
            )
        )
        return F.conv(F.substring(h, 1, 8), 16, 10).cast("long")

    # boundary positions (0-based): pos 0 always opens a chunk; pos >= 2
    # opens one where the rolling hash ≡ 0 (mod divisor) — bit-for-bit
    # the predicate the windowed running-sum form evaluated per token.
    # sequence() counts DOWN for n = 0 (the bigram_rows footgun), so
    # empty docs get an explicitly empty index array — they emitted no
    # token rows before and must emit no chunk rows now.
    idx = F.when(n > 0, F.sequence(F.lit(0), n - 1)).otherwise(
        F.array().cast("array<int>")
    )
    # the rolling hash is evaluated ONLY under the i >= 2 branch (CASE
    # WHEN is lazily evaluated per row): ANSI mode is on, so an unguarded
    # element_at(ws, i - 1) at i = 1 would throw on the invalid index 0
    bpos = F.filter(
        idx,
        lambda i: (i == 0)
        | F.when(
            i >= 2, F.pmod(rolling32(i), F.lit(divisor)) == 0
        ).otherwise(F.lit(False)),
    )
    staged = staged.select("doc_id", "_ws", bpos.alias("_bp"))
    bp = F.col("_bp")
    # F.get is 0-based and yields NULL (never an ANSI error) past the
    # end: chunk j spans [bp[j], bp[j+1]) — the last chunk runs to n-1
    chunk_hashes = F.transform(
        bp,
        lambda start, j: F.md5(
            F.array_join(
                F.slice(
                    ws,
                    start + 1,
                    F.coalesce(F.get(bp, j + 1), F.size(ws)) - start,
                ),
                " ",
            )
        ),
    )
    # explode_outer + IS NOT NULL for the InferFiltersFromGenerate reason
    # documented on exploded_shingles (a synthesized size()>0 pushdown
    # would re-inline the whole chunk construction against the raw text)
    chunks = (
        staged.select(
            "doc_id", F.explode_outer(chunk_hashes).alias("chunk_hash")
        )
        .filter(F.col("chunk_hash").isNotNull())
    )
    global_counts = chunks.groupBy("chunk_hash").agg(
        F.count(F.lit(1)).alias("_n_occ")
    )
    dup = F.sum(F.when(F.col("_n_occ") > 1, 1).otherwise(0)).cast("long")
    return (
        chunks.join(global_counts, "chunk_hash")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            dup.alias("n_dup_chunks"),
            (
                F.floor(
                    dup.cast("double") / F.count(F.lit(1)) * 10000
                    + F.lit(0.5)
                )
                / 10000
            )
            .cast("double")
            .alias("dup_chunk_ratio"),
        )
    )


def containment_pairs(
    docs: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    shingle_k: int = 3,
    threshold: float = 0.0,
) -> DataFrame:
    """Exact shingle-set CONTAINMENT for candidate pairs — the asymmetric
    near-dup measure Jaccard misses: a short document quoted wholesale
    inside a long one has containment ≈ 1 from the short side while
    Jaccard stays tiny (|∩|/|∪| is diluted by the long side). Emits both
    directions per pair (``containment_a`` = |∩|/|A|, ``containment_b`` =
    |∩|/|B|) plus the max, filtered at ``threshold`` on the max.

    Same O(candidates) shape as ``jaccard_pairs``: shingle ARRAYS join
    onto the bounded candidate pairs, never a corpus self-join.
    """
    sh = shingle_arrays(docs, text_col, shingle_k)
    j = (
        pairs.join(
            sh.withColumnRenamed("doc_id", "doc_a").withColumnRenamed(
                "sh", "sh_a"
            ),
            "doc_a",
        )
        .join(
            sh.withColumnRenamed("doc_id", "doc_b").withColumnRenamed(
                "sh", "sh_b"
            ),
            "doc_b",
        )
    )
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    r4 = lambda c: (  # noqa: E731
        F.floor(c * 10000 + F.lit(0.5)) / 10000
    ).cast("double")
    cont_a = r4(inter.cast("double") / F.size("sh_a").cast("double"))
    cont_b = r4(inter.cast("double") / F.size("sh_b").cast("double"))
    return (
        j.select(
            "doc_a",
            "doc_b",
            cont_a.alias("containment_a"),
            cont_b.alias("containment_b"),
            F.greatest(cont_a, cont_b).alias("containment_max"),
        )
        .filter(F.col("containment_max") >= threshold)
    )
