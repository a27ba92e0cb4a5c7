"""Similarity search over an embedding column ([EXT], SURVEY §7 Phase 5).

Embeddings are ``array<float>``; all math is done in double via built-in
higher-order functions (``zip_with`` + ``aggregate``) — JVM-side, no Python
UDF in the scoring loop. Scores are rounded to 6 decimals *before* ranking so
that top-k boundaries are stable across engines/summation orders, and emitted
as DOUBLE (floor-rounded — one canonical rendering for the value hash).

The search paths, cheapest-scan first:
- brute-force top-k: broadcast the (small) query set against the corpus —
  the exact baseline. One shuffle (the per-query top-k window).
- IVF cell-probed search: restrict the scan to the query's ``nprobe``
  nearest coarse cells (label column or the k-means model) — reads
  ~nprobe/num_cells of the table when cells are the partition key.
- RP-LSH band probe: signature-bucket candidates, exact rerank.
- PQ / ADC: the corpus side is an n×m code table (64× smaller than the
  vectors); one map-side broadcast-LUT join scores a query batch.
- IVF-PQ: residual PQ inside the k-means cells — candidate pruning AND
  compression compose (the faiss-standard serving shape at 100 TB).
Plus: deterministic distributed k-means (int64-exact rounds), SemDeDup
semantic dedup, embedding near-dup pairs, and recall@k eval harnesses
for the IVF and PQ paths. Every index (IVF centroids, RP bands, k-means
model, PQ/IVF-PQ codes+codebooks) is a persisted build artifact probed
by queries, never retrained inline.
"""

from __future__ import annotations

import json
import math
import os

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def round6(c: Column) -> Column:
    """Half-up rounding at 1e-6 via floor — deterministic across engines on
    bit-identical doubles (native ROUNDs disagree on decimal halves)."""
    return F.floor(c * 1000000 + F.lit(0.5)) / 1000000


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2norm(a) * l2norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k of ``corpus`` for each query vector.

    queries: (query_id, embedding). The query side is broadcast (it is small
    by construction); scoring is a narrow map over the corpus, then one
    top-k-per-query window."""
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("_qvec")
    )
    scored = corpus.select(
        F.col(id_col), F.col(vec_col)
    ).crossJoin(F.broadcast(q)).filter(F.col(id_col) != F.col(query_id_col))
    scored = scored.withColumn(
        "score", round6(cosine(F.col(vec_col), F.col("_qvec")))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("score"), F.col(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col(query_id_col),
            F.col(id_col).alias("neighbor_id"),
            F.col("rank"),
            F.col("score").alias("score"),
        )
    )


def ivf_centroids(
    corpus: DataFrame, cell_col: str = "label", vec_col: str = "embedding"
) -> DataFrame:
    """Per-cell mean embedding (the coarse quantizer), quantized at 1e-6.

    Each component is computed INTEGER-EXACTLY — ``floor(Σ floor(v·10⁶) / n)
    / 10⁶`` over long sums — instead of a float ``avg``. A float mean is
    summation-order-dependent (shuffle/partition order changes the last ulp),
    which makes the probe's cell ranking nondeterministic across runs AND
    engines; the integer form is associative, so the centroid (and therefore
    every downstream top-k) is bit-stable everywhere. The 1e-6 quantization
    is far below any angular resolution the coarse quantizer needs."""
    exploded = corpus.select(
        F.col(cell_col), F.posexplode(F.col(vec_col)).alias("pos", "v")
    )
    per_pos = exploded.groupBy(cell_col, "pos").agg(
        F.sum(
            F.floor(F.col("v").cast("double") * 1000000).cast("long")
        ).alias("_s"),
        F.count(F.lit(1)).alias("_n"),
    )
    # _s/_n stays well under 2^53, so the double division + floor is exact
    m = (
        F.floor(F.col("_s").cast("double") / F.col("_n")).cast("double")
        / 1000000.0
    )
    return (
        per_pos.select(F.col(cell_col), F.col("pos"), m.alias("m"))
        .groupBy(cell_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct("pos", "m"))
            ).alias("_pm")
        )
        .select(
            F.col(cell_col),
            F.transform(F.col("_pm"), lambda s: s["m"]).alias("centroid"),
        )
    )


def build_ivf_index(
    corpus: DataFrame,
    path: str,
    cell_col: str = "label",
    vec_col: str = "embedding",
) -> None:
    """BUILD STEP: persist the coarse quantizer (per-cell centroids) as a
    small parquet table. At 100 TB the centroid aggregation is one full scan
    of the corpus — it must run once per corpus version, never per query
    batch; ``ivf_topk`` then reads this table (rows = num_cells, i.e. tiny)
    instead of re-aggregating the corpus."""
    ivf_centroids(corpus, cell_col, vec_col).write.mode("overwrite").parquet(
        path
    )


def load_ivf_index(spark, path: str) -> DataFrame:
    """Read a persisted coarse quantizer written by ``build_ivf_index``."""
    return spark.read.parquet(path)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 3,
    cell_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """Cell-probed approximate top-k: score only the nprobe nearest cells.

    Recall < 1.0 by construction (that's the point); the probe set is chosen
    by cosine to the per-cell centroid. Corpus partitioned/bucketed by
    ``cell_col`` at scale → the probe is a partition-pruned scan.

    ``centroids`` should be the persisted quantizer from ``build_ivf_index``
    (pass ``load_ivf_index(...)``); recomputing it inline is the ad-hoc
    fallback only — it rescans the whole corpus per query batch."""
    cents = (
        centroids
        if centroids is not None
        else ivf_centroids(corpus, cell_col, vec_col)
    )
    q = queries.select(F.col(query_id_col), F.col(vec_col).alias("_qvec"))
    probe_w = Window.partitionBy(query_id_col).orderBy(
        F.desc("cscore"), F.col(cell_col)
    )
    probes = (
        q.crossJoin(F.broadcast(cents))
        .withColumn(
            "cscore", round6(cosine(F.col("_qvec"), F.col("centroid")))
        )
        .withColumn("crank", F.row_number().over(probe_w))
        .filter(F.col("crank") <= nprobe)
        .select(query_id_col, cell_col, "_qvec")
    )
    scored = corpus.join(
        F.broadcast(probes), on=cell_col
    ).filter(F.col(id_col) != F.col(query_id_col))
    scored = scored.withColumn(
        "score", round6(cosine(F.col(vec_col), F.col("_qvec")))
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("score"), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col(query_id_col),
            F.col(id_col).alias("neighbor_id"),
            F.col("rank"),
            F.col("score").alias("score"),
        )
    )


def cosine_scores_pandas(
    corpus: DataFrame,
    query_vec: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Arrow-vectorized Pandas-UDF scoring path — the documented escape hatch
    for when the expression form can't express the math (e.g. a real model's
    scoring fn). Numerically it matmuls per Arrow batch; prefer the
    expression-based ``cosine`` for anything SQL can say (it stays JVM-side),
    but THIS is the shape custom Python scoring should take: one
    ``pandas_udf`` over batches, never a row-at-a-time ``F.udf``."""
    q = np.asarray(query_vec, dtype="float64")
    qn = np.sqrt((q * q).sum())

    @F.pandas_udf(T.DoubleType())
    def score(vecs: pd.Series) -> pd.Series:
        m = np.vstack(vecs.to_numpy())  # (batch, dim) float32
        m = m.astype("float64")
        dots = m @ q
        norms = np.sqrt((m * m).sum(axis=1))
        return pd.Series(dots / (norms * qn))

    return corpus.select(
        F.col(id_col), score(F.col(vec_col)).alias("score")
    )


RP_SEED = "cdi-rp-v1"


def rademacher_planes(
    bits: int, dim: int, seed: str = RP_SEED
) -> list[list[float]]:
    """Fixed ±1 random-hyperplane matrix, derived from md5 so both engines
    (and every run) see the SAME planes — no RNG state, no data dependence.

    Signed ±1 (Rademacher) projections are a valid random-projection family
    for angular LSH; the sign of ``v · plane_b`` is signature bit b."""
    import hashlib

    return [
        [
            1.0
            if int(hashlib.md5(f"{seed}:{b}:{d}".encode()).hexdigest()[0], 16) % 2
            == 0
            else -1.0
            for d in range(dim)
        ]
        for b in range(bits)
    ]


def _rp_keys_udf(bits: int, bands: int, dim: int):
    """Arrow-batched band-key kernel: ONE int64 matmul per batch instead of
    ``bands × bits`` separate fold expressions.

    Why not built-in expressions: a (24-bit, 20-band) geometry unrolled as
    per-plane ``zip_with``+``aggregate`` folds is ~480 aggregate
    expressions ≈ tens of thousands of Catalyst nodes — measured 2.5 MiB
    task binaries and ~35 s of plan/codegen overhead PER QUERY at sf0.5/
    sf1 (flat in corpus size — it's driver/compile cost, not data cost).
    The kernel collapses that to one vectorized projection, so plan size
    is O(1) in the geometry.

    Why integer dots: the bit is the sign of ``quantize(v) · plane`` with
    the same ×10⁶ floor/clamp quantization as ``_quantize_vec`` — an
    exact BIGINT sum of ±q_i terms, identical under ANY summation order
    and therefore bit-portable across numpy, Spark, and the DuckDB oracle
    (a float dot's sign near zero depends on fold order; an int sum's
    never does). Quantizing before projecting perturbs each coordinate by
    < 10⁻⁶, which only re-randomizes planes that were already within
    rounding of orthogonal — still the same angular-LSH family.

    Plane ``j`` of band ``b`` is row ``b * RP_MAX_BITS + j`` of the seeded
    Rademacher table, preserving the prefix property the occupancy
    escalation masks against."""
    planes = rademacher_planes(bands * RP_MAX_BITS, dim)
    proj = np.array(
        [
            planes[b * RP_MAX_BITS + j]
            for b in range(bands)
            for j in range(bits)
        ],
        dtype=np.int64,
    )  # (bands*bits, dim), entries ±1
    weights = 1 << np.arange(bits, dtype=np.int64)

    @F.pandas_udf("array<int>")
    def band_keys(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        m = np.stack(vecs.to_numpy()).astype(np.float64)  # (n, dim)
        q = np.clip(
            np.floor(m * 1_000_000.0), -2_000_000, 2_000_000
        ).astype(np.int64)
        signs = (q @ proj.T) >= 0  # (n, bands*bits) — exact int64 sums
        keys = (
            signs.astype(np.int64).reshape(len(vecs), bands, bits) * weights
        ).sum(axis=2)
        return pd.Series(list(keys.astype(np.int32)))

    return band_keys


def adaptive_rp_bits(n_rows: int, lo: int = 8, hi: int = 24) -> int:
    """Per-band hyperplane count sized to the corpus at BUILD time.

    Fixed bits are a scale bug, measured: with 8 bits the per-band bucket
    count is a constant 256, so average bucket occupancy grows linearly
    with the corpus and the in-bucket candidate expansion (Σ bucket²)
    goes QUADRATIC — the round-10 scaling sweep caught
    ``embedding_near_duplicates`` at 33× wall for 5× rows before OOMing
    at sf1. Sizing ``2^bits ≈ n/2`` keeps expected occupancy O(1), so
    candidate generation stays ~linear in corpus rows at any scale.

    Deterministic (pure function of the corpus row count); clamped to
    [lo, hi] so tiny corpora keep today's 8-bit geometry — at the sf0.01
    oracle gate (500 vectors) this returns exactly 8, which is what the
    DuckDB oracle SQL unrolls. More bits trade recall per band for
    precision, the documented LSH knob (raise ``bands`` to win recall
    back)."""
    return min(hi, max(lo, math.ceil(math.log2(max(n_rows, 2) / 2.0))))


#: Design point for recall-targeted band sizing: hold ≥80% candidate
#: recall for pairs at cosine ≥0.95 (the near-duplicate regime this index
#: family exists for). Both are geometry DEFAULTS, not query thresholds —
#: a probe may verify at any threshold; the build just guarantees the
#: bucket structure still surfaces the high-similarity pairs at scale.
RP_DESIGN_COS = 0.95
RP_TARGET_RECALL = 0.8
RP_MAX_BANDS = 32


def rp_bands_for_recall(
    bits: int,
    cos_threshold: float = RP_DESIGN_COS,
    target_recall: float = RP_TARGET_RECALL,
) -> int:
    """Band count holding LSH candidate recall at the design point as
    ``bits`` grows.

    ``adaptive_rp_bits`` fixes the occupancy (and therefore cost) side of
    the geometry, but raising bits SILENTLY cuts recall: a pair at angle
    θ collides in one sign-bit band with p = (1 − θ/π)^bits, so going
    8 → 16 bits drops per-band collision for a 0.95-cosine pair from
    ~0.43 to ~0.18 and 2-band recall from ~0.67 to ~0.33 — recall decaying
    with corpus size is a scale bug just like occupancy growing with it.
    Banding is the standard repair (any-of-``bands`` collision):
    recall = 1 − (1 − p)^bands ≥ R  ⇔  bands ≥ ln(1−R) / ln(1−p).

    Pure deterministic function of (bits, design point), so the build is
    reproducible and the sf0.01 oracle can unroll the same band count
    (bits=8 ⇒ 3 bands at the 0.95/0.8 design point). Cost scales linearly
    in bands (key table rows, probe dots, in-bucket pairs), preserving the
    ~linear-in-corpus candidate generation the adaptive bits bought.
    Clamped to [1, RP_MAX_BANDS]."""
    theta = math.acos(max(-1.0, min(1.0, cos_threshold)))
    p_band = (1.0 - theta / math.pi) ** bits
    if p_band >= 1.0:  # degenerate design point (cos=1): one band suffices
        return 1
    need = math.log(1.0 - target_recall) / math.log(1.0 - p_band)
    return min(RP_MAX_BANDS, max(1, math.ceil(need)))


def rp_recall_curve(
    bits: int,
    bands: int,
    thresholds: "list[float] | None" = None,
) -> "list[dict]":
    """The threshold→expected-candidate-recall mapping of an RP geometry
    — what a user at a LAXER threshold than the 0.95 design point needs
    before trusting the candidate stage (round-10 finding: measured
    recall@0.9 is ~0.39 BY DESIGN; the contract holds only at ≥0.95).

    One row per cosine threshold: per-band collision
    p = (1 − acos(c)/π)^bits and any-of-bands recall 1 − (1−p)^bands —
    the same collision model the band formula inverts, which matches
    measurement to 3 decimals at cos 0.9 (RECALL_RP.json) and is
    validated against exhaustive PLANTED-pair recall at 0.96/0.98/0.995
    (`tools/measure_rp_recall.py` + the planted-recall canary). Read the
    geometry of a persisted index from its sidecar
    (``load_rp_geometry``) and feed it here to see what a given corpus
    index actually promises:

        geom = load_rp_geometry(path)
        rp_recall_curve(geom["bits"], geom["bands"])
    """
    if thresholds is None:
        thresholds = [0.80, 0.85, 0.90, 0.92, 0.95, 0.97, 0.99]
    out = []
    for c in thresholds:
        theta = math.acos(max(-1.0, min(1.0, c)))
        p = (1.0 - theta / math.pi) ** bits
        out.append(
            {
                "cos_threshold": c,
                "band_collision_p": round(p, 6),
                "expected_recall": round(1.0 - (1.0 - p) ** bands, 4),
            }
        )
    return out


def semantic_cells_k(n_rows: int) -> int:
    """Semantic-cell count for SemDeDup blocking: ``k = isqrt(n)``.

    Exact in-cell pairwise dedup costs Σ cell² ≈ n·(n/k) verifies while
    cell assignment costs n·k distance evaluations; k = √n balances the
    two at O(n^1.5) total — the best exponent exact SemDeDup admits
    (blocking on a FIXED-cardinality cell column is n²; the round-10
    sweep measured slope 2.28 on the label-blocked version, 330 s at
    sf1). Pure function of the corpus row count, so the build is
    deterministic and the sf0.01 oracle can unroll the same k."""
    return max(2, math.isqrt(max(n_rows, 0)))


#: Plane-table stride per band: band ``b``'s bit ``j`` always uses plane
#: ``b * RP_MAX_BITS + j`` regardless of how many bits a build chooses.
#: This gives band keys the PREFIX PROPERTY — a b-bit key is the low-b-bit
#: mask of the RP_MAX_BITS-bit key over the same planes — so the
#: occupancy-capped build (``build_rp_index``) can hash its probe band ONCE
#: at full width and evaluate every candidate width by masking, and two
#: builds with different widths stay comparable. 24 bits = 16M buckets/band,
#: plenty below int-key range.
RP_MAX_BITS = 24


def rp_band_keys(
    corpus: DataFrame,
    bits: int = 8,
    bands: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, band, key): per-band sign-bit LSH bucket keys over fixed seeded
    hyperplanes. ``bands`` independent tables of ``bits`` bits each — a pair
    is a candidate if it collides in ANY band (same banding trade-off as
    MinHash LSH). Data-independent: bucket population scales with the corpus,
    never with a class column's cardinality. Keys have the prefix property
    (see ``RP_MAX_BITS``): band ``b`` bit ``j`` is the sign under plane
    ``b * RP_MAX_BITS + j``, so ``bits`` truncates the same plane table
    rather than re-dealing planes across bands.

    Computed by the Arrow-batched integer kernel (``_rp_keys_udf``): one
    exact int64 matmul per batch, O(1) plan size in the geometry —
    unrolled per-plane fold expressions cost ~35 s of plan/codegen at the
    (24-bit, 20-band) sf1 geometry; see the kernel docstring."""
    if bits > RP_MAX_BITS:
        raise ValueError(f"bits={bits} exceeds RP_MAX_BITS={RP_MAX_BITS}")
    # fail fast on a dim mismatch BEFORE the kernel: a silent divergence in
    # the candidate-pair set across engines (DuckDB errors on mismatched
    # list_zip; numpy would raise a shape error only if the batch is
    # ragged). The assert lives in a FILTER (assert_true yields null →
    # isNull keeps every row) so column pruning can't eliminate it.
    corpus = corpus.filter(
        F.assert_true(
            F.size(F.col(vec_col)) == F.lit(dim),
            F.concat(
                F.lit(f"rp_band_keys: embedding dim != {dim} (got "),
                F.size(F.col(vec_col)).cast("string"),
                F.lit(")"),
            ),
        ).isNull()
    )
    keys = _rp_keys_udf(bits, bands, dim)
    return corpus.select(
        F.col(id_col).alias("id"),
        F.posexplode(keys(F.col(vec_col))).alias("band", "key"),
    )


def build_rp_index(
    corpus: DataFrame,
    path: str,
    bits: int | None = None,
    bands: int | None = None,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    occ_cap: int = 64,
) -> None:
    """BUILD STEP: persist the corpus-side LSH band keys as parquet.

    The band keys are pure functions of the embedding and the fixed seeded
    planes, so they belong at WRITE time: at 100 TB, computing
    ``bands × bits`` 64-dim dot products per corpus row on every query
    batch is a full-corpus scan of wasted FLOPs. Persisted (and at scale
    bucketed by ``(band, key)``), the probe side becomes a narrow
    bucket-pruned scan of a 3-int-column table; only the exact rerank
    touches the wide embedding column — and only for candidates.

    ``bits=None`` (the default) sizes the COST side of the geometry to
    the corpus:

    1. floor = ``adaptive_rp_bits(count)`` (2^bits ≈ n/2 — O(1) expected
       occupancy under the hashing assumption);
    2. occupancy escalation: real corpora are CLUSTERED, and sign-bit
       keys of a tight cluster agree on every high-margin plane, so the
       count-based floor can still leave mega-buckets (measured on the
       sf1 synthetic corpus: 15-bit floor, yet max bucket = 1996 of 50k
       rows and 11.5M candidate pairs — the n² tail in miniature). The
       escalation hashes ONE probe band at ``RP_MAX_BITS`` width, then —
       via the prefix property, by masking, no rehash — picks the
       smallest width whose max bucket occupancy ≤ ``occ_cap``, up to
       ``RP_MAX_BITS``. Occupancy is a deterministic function of the
       corpus, so the choice is too.

    ``bands=None`` (the default) then sizes the RECALL side:
    ``rp_bands_for_recall(bits)`` — wider keys cut per-band collision
    probability for genuinely similar pairs, so holding recall at the
    design point (≥80% for cosine ≥0.95 pairs) requires the band count
    to grow with bits (3 bands at the 8-bit gate geometry, ~9 at 16,
    20 at 24). Without this, the adaptive bits would silently trade
    recall for speed as the corpus grows — fixed RECALL decaying with
    scale is as much a scale bug as fixed bucket counts overflowing.

    Build cost: one bounded-histogram escalation pass (24 plane dots per
    row) plus the final ``bands × bits`` hash — two linear corpus scans,
    both at write time, never per query.

    The chosen geometry is recorded in a ``_rp_geometry.json`` sidecar
    inside the parquet dir (underscore-prefixed ⇒ ignored by parquet
    reads, the same convention as the cluster-index refresh watermark).
    Probe-side key computation MUST use the same bits/bands/dim as the
    persisted corpus keys or buckets never collide; read them back with
    ``load_rp_geometry``. At the sf0.01 oracle gate (500 vectors) the
    floor is 8, no bucket exceeds ``occ_cap``, and the recall formula
    gives 3 bands, so the build settles exactly at the geometry the
    DuckDB oracle unrolls — pinned by test_scaling_canaries."""
    if bits is None:
        floor = adaptive_rp_bits(corpus.count())
        # occupancy probes run over a SINGLE band's full-width bucket
        # histogram (band 0 — bands are iid draws of the same seeded
        # plane family, so one band's occupancy profile stands in for
        # all): occupancy at width b is a sum of 24-bit bucket counts
        # sharing the masked prefix, and the histogram is bounded at
        # 2^24 rows no matter how large the corpus is — each probe of
        # the escalation shuffles bucket counts, never corpus rows.
        probe = rp_band_keys(corpus, RP_MAX_BITS, 1, dim, id_col, vec_col)
        hist = probe.groupBy("band", "key").count().localCheckpoint()
        bits = RP_MAX_BITS
        for b in range(floor, RP_MAX_BITS):
            occ = (
                hist.groupBy(
                    "band", F.col("key").bitwiseAND(F.lit((1 << b) - 1))
                )
                .agg(F.sum("count").alias("occ"))
                .agg(F.max("occ"))
                .first()[0]
            )
            if occ is not None and occ <= occ_cap:
                bits = b
                break
    if bands is None:
        bands = rp_bands_for_recall(bits)
    final = rp_band_keys(corpus, bits, bands, dim, id_col, vec_col)
    final.write.mode("overwrite").parquet(path)
    with open(os.path.join(path, "_rp_geometry.json"), "w") as fh:
        json.dump({"bits": bits, "bands": bands, "dim": dim}, fh)


def load_rp_index(spark, path: str) -> DataFrame:
    """Read persisted corpus band keys written by ``build_rp_index``."""
    return spark.read.parquet(path)


def load_rp_geometry(path: str) -> dict:
    """The {bits, bands, dim} geometry a persisted RP index was built
    with — the probe side must compute its query keys with the SAME
    geometry or bucket keys never match. Raises on a pre-geometry
    artifact (rebuild it: a silent 8-bit default against an adaptive
    corpus index would return empty candidate sets, not an error)."""
    p = os.path.join(path, "_rp_geometry.json")
    try:
        with open(p) as fh:
            geom = json.load(fh)
        return {
            "bits": int(geom["bits"]),
            "bands": int(geom["bands"]),
            "dim": int(geom["dim"]),
        }
    except (OSError, ValueError, KeyError, TypeError,
            json.JSONDecodeError) as e:
        raise ValueError(
            f"RP index at {path} has no readable _rp_geometry.json sidecar "
            "(pre-adaptive-geometry artifact?) — rebuild with build_rp_index"
        ) from e


def embedding_near_duplicates(
    corpus: DataFrame,
    threshold: float = 0.95,
    bits: int = 8,
    bands: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    band_keys: DataFrame | None = None,
) -> DataFrame:
    """Near-duplicate pairs by cosine ≥ threshold, blocked by sign-bit LSH.

    Candidate pairs collide on at least one of ``bands`` random-hyperplane
    band keys (see ``rp_band_keys``), then are verified with EXACT cosine.
    The blocking key is data-independent, and with the build sizing bits
    via ``adaptive_rp_bits`` (2^bits ≈ n/2) expected bucket occupancy is
    O(1), keeping the in-bucket pair expansion ~linear in corpus rows.
    FIXED bits are a measured scale bug — at 8 bits the round-10 sweep
    saw 33× wall for 5× rows, then an OOM at sf1, because constant
    bucket count means occupancy ∝ n and Σ bucket² goes quadratic (the
    same failure mode as blocking on a low-cardinality class column).
    Recall < 1 by construction (angular LSH misses pairs whose bits all
    differ); raise ``bands`` for higher recall — more bits lowers
    per-band recall while raising precision. Emits (id_a, id_b, score).

    Scale shape: pass ``band_keys=load_rp_index(...)`` (the persisted
    ``build_rp_index`` artifact, same contract as ``lsh_probe_topk``'s
    ``corpus_keys``) so the corpus-side hyperplane dot products are
    write-time work — the in-bucket pair expansion then starts from a
    narrow 3-int-column scan and only the exact-cosine verify touches
    raw vectors, for candidates only. Recomputing inline is the ad-hoc
    fallback and re-pays bands x bits dot products per corpus row."""
    from .dedup import in_bucket_pairs

    keys = (
        band_keys
        if band_keys is not None
        else rp_band_keys(corpus, bits, bands, dim, id_col, vec_col)
    )
    # min_band: near-identical vectors collide in EVERY band, so with the
    # recall-holding geometry (20 bands at sf1) the plain expansion emits
    # each true pair ~bands× and the dedup DISTINCT shuffles ~bands× the
    # answer; first-common-band emission produces each pair exactly once.
    # Valid here because the corpus key table carries every band per id.
    pairs = in_bucket_pairs(keys, "id", "id_a", "id_b", min_band=True)
    v = corpus.select(F.col(id_col), F.col(vec_col))
    a = v.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    b = v.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    scored = pairs.join(a, "id_a").join(b, "id_b").withColumn(
        "score", round6(cosine(F.col("_va"), F.col("_vb")))
    )
    return scored.filter(F.col("score") >= threshold).select(
        "id_a", "id_b", F.col("score").alias("score")
    )


def embedding_dup_edges(
    corpus: DataFrame,
    threshold: float = 0.95,
    bits: int = 8,
    bands: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    band_keys: DataFrame | None = None,
    reliable: bool = False,
) -> DataFrame:
    """Spanning edge set for the CLUSTERING consumer of embedding
    near-duplicates: connected components over these edges equal those
    over the full ``embedding_near_duplicates`` pair list, at
    **O(n·bands) verified edges instead of Θ(Σ bucket²) pairs** on
    duplicate-dense corpora.

    A plain per-bucket star (``dedup.in_bucket_star_edges``) is NOT
    equivalence-preserving here — there is a similarity check between
    candidacy and clustering, and a member whose hub edge fails cosine
    may still pass against another bucket member. The exact recipe:

    1. per (band, key) bucket, hub = min id; verify only the hub
       (star) edges with exact cosine — O(bucket) pairs per bucket;
    2. members whose hub edge FAILED re-expand against their full
       bucket and those pairs are verified — quadratic only in the
       failing (false-positive) population, which occupancy-capped
       adaptive geometry keeps O(1) per bucket; the duplicate-dense
       buckets that made the pair list Θ(n²) are exactly the ones whose
       hub edges PASS, so they contribute O(bucket) edges.

    Equivalence: let E = verified in-bucket pairs. For (x, y) ∈ E in
    bucket B with hub h: if both (h,x) and (h,y) passed, x—h—y connects
    them in the star; otherwise the failed endpoint's re-expansion
    contains (x, y) itself. Every emitted edge passes the same cosine
    test, so the edge set is a subgraph of E's closure with identical
    components (pinned by ``tests/test_cc_property.py``). Emits
    (id_a < id_b, score); cross-bucket duplicate edges are left for the
    contraction's canonical distinct."""
    keys = (
        band_keys
        if band_keys is not None
        else rp_band_keys(corpus, bits, bands, dim, id_col, vec_col)
    )
    w = Window.partitionBy("band", "key")
    spokes = keys.select(
        "id",
        "band",
        "key",
        F.min("id").over(w).alias("_hub"),
        F.count(F.lit(1)).over(w).alias("_bn"),
    ).where(F.col("id") != F.col("_hub"))
    a = corpus.select(F.col(id_col).alias("_ha"), F.col(vec_col).alias("_va"))
    b = corpus.select(F.col(id_col).alias("_hb"), F.col(vec_col).alias("_vb"))
    hub_scored = (
        spokes.select(F.col("_hub").alias("_ha"), F.col("id").alias("_hb"))
        .distinct()
        .join(a, "_ha")
        .join(b, "_hb")
        .select(
            "_ha", "_hb", round6(cosine(F.col("_va"), F.col("_vb"))).alias("score")
        )
    )
    # both branches (pass → edge, fail → re-expand) consume this:
    # materialize once so the verify join doesn't run twice. reliable=True
    # uses the SparkContext checkpoint dir (survives executor loss at
    # cluster scale) instead of executor-local blocks — see operators.ckpt
    from .ckpt import pin

    hub_scored = pin(hub_scored, reliable)
    hub_pass = hub_scored.filter(F.col("score") >= threshold).select(
        F.col("_ha").alias("id_a"), F.col("_hb").alias("id_b"), "score"
    )
    # re-expansion SKIPS 2-member buckets (their only pair IS the failed
    # hub edge — nothing left to check), which under O(1)-occupancy
    # geometry is most buckets, so a high-threshold run where most hub
    # edges fail degrades to ~the plain pair cost instead of paying the
    # hub pass AND a full expansion; and the hub itself is excluded from
    # a failed member's partners (that pair is the already-failed edge).
    failed = spokes.where(F.col("_bn") >= 3).join(
        hub_scored.filter(F.col("score") < threshold).select(
            F.col("_ha").alias("_hub"), F.col("_hb").alias("id")
        ),
        ["_hub", "id"],
    ).select("band", "key", F.col("id").alias("_fx"), "_hub")
    expand = (
        failed.join(keys.select(F.col("id").alias("_y"), "band", "key"),
                    ["band", "key"])
        .where((F.col("_fx") != F.col("_y")) & (F.col("_y") != F.col("_hub")))
        .select(
            F.least("_fx", "_y").alias("id_a"),
            F.greatest("_fx", "_y").alias("id_b"),
        )
        .distinct()
    )
    exp_scored = (
        expand.join(a.withColumnRenamed("_ha", "id_a"), "id_a")
        .join(b.withColumnRenamed("_hb", "id_b"), "id_b")
        .select(
            "id_a", "id_b", round6(cosine(F.col("_va"), F.col("_vb"))).alias("score")
        )
        .filter(F.col("score") >= threshold)
    )
    return hub_pass.unionByName(exp_scored)


def embedding_dup_clusters(
    corpus: DataFrame,
    threshold: float = 0.95,
    bits: int = 8,
    bands: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    band_keys: DataFrame | None = None,
    reliable: bool = False,
) -> DataFrame:
    """(vec_id, cluster_id): connected components over embedding
    near-duplicate edges — the retention-policy labeling a 100 TB dedup
    run actually wants, WITHOUT materializing the Θ(n²) pair list of a
    duplicate-dense corpus: the contraction is fed by
    ``embedding_dup_edges`` (verified spanning stars + failed-hub
    re-expansion), which spans identical components at O(n·bands) edges.
    Labels every vector that has ≥1 near-duplicate; the label is the
    component's minimum id (``dedup.duplicate_clusters`` semantics)."""
    from .dedup import duplicate_clusters

    edges = embedding_dup_edges(
        corpus, threshold, bits, bands, dim, id_col, vec_col, band_keys,
        reliable=reliable,
    ).select(F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"))
    return duplicate_clusters(edges, reliable=reliable).select(
        F.col("doc_id").alias(id_col), "cluster_id"
    )


def lsh_probe_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    bits: int = 8,
    bands: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    corpus_keys: DataFrame | None = None,
) -> DataFrame:
    """ANN top-k via sign-bit LSH bucket probe + exact-cosine rerank.

    A second fully-DETERMINISTIC approximate path (companion to ``ivf_topk``,
    which since the integer-exact centroid quantization is deterministic
    too): candidates are corpus vectors sharing at least one of
    the query's ``bands`` seeded-hyperplane band keys; only candidates are
    scored. Same recall trade-off as any LSH probe — raise ``bands`` for
    recall, ``bits`` for precision. Queries may return < k rows when a
    bucket holds few candidates; that IS the ANN contract.

    Scale shape: the corpus-side band keys should be the PERSISTED index
    from ``build_rp_index`` (pass ``corpus_keys=load_rp_index(...)``) —
    computed at write time and bucketable by (band, key), the probe is a
    bucket-pruned scan of a narrow table; recomputing them inline is the
    ad-hoc fallback and rescans the corpus per query batch. The query-side
    keys and vectors are broadcast; exact rerank touches only candidates.
    """
    ckeys = (
        corpus_keys
        if corpus_keys is not None
        else rp_band_keys(corpus, bits, bands, dim, id_col, vec_col)
    )
    qkeys = rp_band_keys(
        queries, bits, bands, dim, query_id_col, vec_col
    ).select(F.col("id").alias(query_id_col), "band", "key")
    cand = (
        ckeys.join(F.broadcast(qkeys), ["band", "key"])
        .select(F.col(query_id_col), F.col("id").alias("neighbor_id"))
        .distinct()
        .filter(F.col("neighbor_id") != F.col(query_id_col))
    )
    qv = queries.select(F.col(query_id_col), F.col(vec_col).alias("_qvec"))
    nv = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_nvec")
    )
    scored = (
        cand.join(F.broadcast(qv), query_id_col)
        .join(nv, "neighbor_id")
        .withColumn("score", round6(cosine(F.col("_nvec"), F.col("_qvec"))))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("score"), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            query_id_col,
            "neighbor_id",
            "rank",
            F.col("score").cast("double").alias("score"),
        )
    )


def semantic_dedup_pairs(
    corpus: DataFrame,
    threshold: float = 0.25,
    cell_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style semantic duplicate pairs: exact pairwise cosine, but
    ONLY within a semantic cluster (the corpus's cluster/cell column — at
    100 TB this is the k-means cell assignment from the persisted
    ``build_semantic_cells_index`` artifact, computed once per corpus
    version).

    Clustering first is what makes semantic dedup tractable — IF the
    cell count scales with the corpus. Pair work is Σ c² (c = cell
    size): a fixed-cardinality cell column (a label, a language) means
    c ∝ n and the join is n² — the round-10 scaling sweep measured
    exactly that (slope 2.28, 330 s at sf1) on label-blocked cells.
    With ``k = semantic_cells_k(n) = √n`` cells the pair expansion is
    n·√n, balanced against the n·k assignment pass — the best exponent
    exact SemDeDup admits. The cell equi-join shuffles each vector
    once. Emits one row per unordered in-cell pair with cosine ≥
    threshold; scores are round6-quantized so the threshold comparison
    is engine-portable.
    """
    # norms are attached per VECTOR before the pair join — computed once
    # per row, not once per pair (each vector appears in ~cell_size pairs,
    # so inlining l2norm into the cosine would redo it cell_size times).
    # dot/(na*nb) keeps the exact expression structure of cosine(), so the
    # scores are bit-identical to the inlined form.
    v = corpus.select(
        F.col(cell_col).alias("cell"),
        F.col(id_col),
        F.col(vec_col),
        l2norm(F.col(vec_col)).alias("_n"),
    )
    a = v.select(
        "cell",
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("_va"),
        F.col("_n").alias("_na"),
    )
    b = v.select(
        "cell",
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("_vb"),
        F.col("_n").alias("_nb"),
    )
    scored = (
        a.join(b, "cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "score",
            round6(
                dot(F.col("_va"), F.col("_vb"))
                / (F.col("_na") * F.col("_nb"))
            ),
        )
    )
    return scored.filter(F.col("score") >= threshold).select(
        "cell", "id_a", "id_b", F.col("score").cast("double").alias("score")
    )


def semantic_dedup_retained(
    corpus: DataFrame,
    centroids: DataFrame,
    threshold: float = 0.25,
    cell_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The SemDeDup keep-list: per duplicate pair, keep the vector LESS
    similar to its cell centroid (retaining the diverse example, dropping
    the prototypical near-copy), with the id as a deterministic
    tie-break.

    A vector is dropped iff some in-cell neighbor with cosine ≥ threshold
    ranks strictly lower on (centroid_similarity, id). The rule is local
    to each edge — no connected-components iteration — so the whole
    keep-list is two joins: the pair relation (see
    :func:`semantic_dedup_pairs`) and a broadcast of the k-row centroid
    table for the rank key. Greedy-per-edge is deliberately NOT
    transitive-closure dedup: in a chain a~b~c, c survives only if b
    still outranks it even though b itself was dropped — deterministic,
    oracle-checkable, and the standard SemDeDup behavior.
    """
    cent = centroids.select(
        F.col(cell_col).alias("cell"), F.col("centroid")
    )
    ranked = (
        corpus.select(
            F.col(cell_col).alias("cell"), F.col(id_col), F.col(vec_col)
        )
        .join(F.broadcast(cent), "cell")
        .select(
            "cell",
            F.col(id_col),
            round6(cosine(F.col(vec_col), F.col("centroid")))
            .cast("double")
            .alias("cent_sim"),
        )
    )
    pairs = semantic_dedup_pairs(
        corpus, threshold, cell_col, id_col, vec_col
    )
    edges = pairs.select(
        F.col("id_a").alias("_u"), F.col("id_b").alias("_v")
    ).union(
        pairs.select(F.col("id_b").alias("_u"), F.col("id_a").alias("_v"))
    )
    ru = ranked.select(
        F.col(id_col).alias("_u"), F.col("cent_sim").alias("_cs_u")
    )
    rv = ranked.select(
        F.col(id_col).alias("_v"), F.col("cent_sim").alias("_cs_v")
    )
    dropped = (
        edges.join(ru, "_u")
        .join(rv, "_v")
        .filter(
            (F.col("_cs_u") < F.col("_cs_v"))
            | ((F.col("_cs_u") == F.col("_cs_v")) & (F.col("_u") < F.col("_v")))
        )
        .select(F.col("_v").alias(id_col))
        .distinct()
    )
    return ranked.join(dropped, id_col, "left_anti").select(
        id_col, "cell", "cent_sim"
    )


# ---------------------------------------------------------------------------
# Deterministic distributed k-means (Lloyd's iterations)
# ---------------------------------------------------------------------------

def _quantize_vec(vec: Column) -> Column:
    """array<float> -> array<long> at 1e-6 — ALL downstream k-means math is
    int64-exact (distances, argmin ties, centroid means), so iterations are
    bit-stable across engines, partitionings, and retries. float->double
    widening and the 1e6 product round identically under IEEE on any
    engine; everything after is integer.

    Quantized components are clamped to ±2*10^6 (magnitude ≤ 2.0) so the
    ``_sq_dist`` int64 bound holds BY CONSTRUCTION for any input: without
    the clamp, an unnormalized vector overflows long arithmetic, which
    Spark silently wraps (non-ANSI) while DuckDB raises — a silent
    cross-engine divergence instead of a loud failure. Embeddings are
    expected in [-1,1]; the clamp is a no-op on valid data."""
    return F.transform(
        vec,
        lambda x: F.greatest(
            F.lit(-2000000).cast("long"),
            F.least(
                F.lit(2000000).cast("long"),
                F.floor(x.cast("double") * 1000000).cast("long"),
            ),
        ),
    )


def _sq_dist(a: Column, b: Column) -> Column:
    """Exact int64 squared L2 distance between two quantized vectors.
    Bound: (2*10^6)^2 * dim = 4*10^12 * dim — safe under 2^63 up to
    dim ~2*10^6."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def kmeans_model(
    corpus: DataFrame,
    k: int = 8,
    n_iter: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_cap: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Lloyd's k-means, returning BOTH halves of the model: the
    assignments ``(id, cluster, dist_sq)`` and the final centroids
    ``(cluster, centroid array<double>)`` — the latter drops into
    ``ivf_topk(..., centroids=...)`` as a coarse quantizer, so a corpus
    with no precomputed cell column can still get cell-probed ANN
    (see the kmeans-IVF scored query).

    Spark-first iterative-algorithm shape:
    - init: the ``k`` lowest-id vectors seed the centroids (no RNG;
      an ascending top-k — TakeOrderedAndProject, scale-safe — so any
      id space works: sparse, non-zero-based, whatever. Cluster labels
      ARE the seed ids);
    - assign: broadcast the k quantized centroids against the corpus,
      exact-int64 squared distance, argmin via ``min(struct(dist, c))``
      — lexicographic struct ordering makes ties break on the lower
      cluster id, identically everywhere;
    - update: per-(cluster, position) integer mean ``floor(Σq / n)`` (the
      ivf_centroids arithmetic) rebuilt into centroid arrays.

    The whole chain is LAZY — no driver-side collect between rounds; each
    round's centroid relation (k rows) broadcasts into the next, so the
    physical plan reads the corpus exactly ``n_iter`` times (linear, not
    exponential — every round's centroids have exactly one consumer).
    At 100 TB each round is one scan + one k×dim-bounded aggregate, the
    textbook distributed Lloyd's cost. For large ``n_iter`` checkpoint
    the centroid relation every few rounds to cap lineage depth.

    ``train_cap`` bounds TRAINING cost for large k: Lloyd's rounds run
    over the ``train_cap`` corpus rows with the smallest
    ``md5(id)`` (a deterministic, engine-portable uniform sample — TakeOrdered,
    scale-safe), while the FINAL assignment still covers the whole
    corpus. With k ∝ √n (see ``semantic_cells_k``) full-corpus training
    would pay n·k distances per round; sample-trained it pays cap·k per
    round plus one n·k assignment pass — the standard coarse-quantizer
    recipe (IVF quantizers train on samples at any real scale). When the
    corpus has ≤ ``train_cap`` rows the sample IS the corpus, so small
    corpora (and the sf0.01 oracle gate) are bit-identical to full
    training.
    """
    if train_cap is not None and train_cap < k:
        raise ValueError(
            f"kmeans_model: train_cap={train_cap} < k={k} — centroid "
            "seeding draws the first k ids of the training sample, so a "
            "sample smaller than k silently caps the model at train_cap "
            "clusters; raise train_cap (≥ k, ideally ≥ 50·k)"
        )
    q = corpus.select(
        F.col(id_col), _quantize_vec(F.col(vec_col)).alias("_q")
    )
    q_train = (
        q
        if train_cap is None
        else q.orderBy(
            # md5 of the DECIMAL-RENDERED id, not xxhash64: the sample
            # membership must be reproducible by the DuckDB oracle (md5
            # is the one hash both engines render identically — the
            # same cross-engine rule every sketch/sampling op here uses;
            # xxhash64 is a Spark-private function). Uniform order, id
            # tie-break, TakeOrdered limit — one corpus scan at build.
            F.md5(F.col(id_col).cast("string")), F.col(id_col)
        ).limit(train_cap)
    )
    centroids = (
        q_train.orderBy(id_col)
        .limit(k)
        .select(
            F.col(id_col).cast("long").alias("_c"), F.col("_q").alias("_cvec")
        )
    )

    def assign(rel: DataFrame, cents: DataFrame) -> DataFrame:
        # MAP-SIDE argmin: the k centroids fold into ONE array-of-structs
        # row, broadcast-attached, and the best cluster is a pure
        # expression reduce over that array — no row expansion, no
        # shuffle. The previous shape (crossJoin ×k then
        # groupBy(id, _q).agg(min(struct(d, c)))) re-shuffled the whole
        # quantized-vector relation ONCE PER LLOYD ROUND with the 64-long
        # array inside the grouping key (hashed per row on both sides of
        # the exchange). The reduce keeps the exact same argmin and
        # tie-break (strictly smaller distance, then lower cluster id —
        # identical to lexicographic min over struct(d, c)), and all
        # arithmetic stays int64-exact, so assignments are bit-identical.
        cents_arr = cents.agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("_c"), F.col("_cvec")))
            ).alias("_cs")
        )
        best = F.array_min(
            F.transform(
                F.col("_cs"),
                lambda x: F.struct(
                    _sq_dist(F.col("_q"), x["_cvec"]).alias("d"),
                    x["_c"].alias("c"),
                ),
            )
        )
        return rel.crossJoin(F.broadcast(cents_arr)).select(
            F.col(id_col),
            "_q",
            best["c"].alias("cluster"),
            best["d"].alias("dist_sq"),
        )

    for _ in range(n_iter - 1):
        assigned = assign(q_train, centroids)
        per_pos = assigned.select(
            F.col("cluster"), F.posexplode("_q").alias("pos", "v")
        ).groupBy("cluster", "pos").agg(
            F.floor(
                F.sum("v").cast("double") / F.count(F.lit(1))
            ).cast("long").alias("m")
        )
        centroids = (
            per_pos.groupBy("cluster")
            .agg(
                F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("_pm")
            )
            .select(
                F.col("cluster").alias("_c"),
                F.transform(F.col("_pm"), lambda s: s["m"]).alias("_cvec"),
            )
        )

    assignments = assign(q, centroids).select(id_col, "cluster", "dist_sq")
    centroids_d = centroids.select(
        F.col("_c").alias("cluster"),
        F.transform(
            F.col("_cvec"), lambda x: x.cast("double") / 1000000.0
        ).alias("centroid"),
    )
    return assignments, centroids_d


def kmeans_assignments(
    corpus: DataFrame,
    k: int = 8,
    n_iter: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Just the (id, cluster, dist_sq) half of ``kmeans_model``."""
    assignments, _ = kmeans_model(corpus, k, n_iter, id_col, vec_col)
    return assignments


def build_kmeans_index(
    corpus: DataFrame,
    path: str,
    k: int = 8,
    n_iter: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_cap: int | None = None,
) -> None:
    """BUILD STEP: persist BOTH halves of the deterministic k-means model
    (assignments under ``path/assignments``, centroids under
    ``path/centroids``) — the same write-time-artifact pattern as the
    IVF/RP/bloom indexes. Training is ``n_iter + 1`` full corpus scans;
    at 100 TB that is a training JOB, never a per-query-batch expense.
    A probe (cluster → cell-probe → rerank) then reads the k-row centroid
    table and joins the persisted assignments instead of retraining.
    ``kmeans_model`` is bit-deterministic (int64-exact rounds), so the
    persisted model is value-identical to an inline recompute."""
    assignments, centroids = kmeans_model(
        corpus, k, n_iter, id_col, vec_col, train_cap=train_cap
    )
    assignments.write.mode("overwrite").parquet(f"{path}/assignments")
    centroids.write.mode("overwrite").parquet(f"{path}/centroids")


def load_kmeans_index(spark, path: str) -> tuple[DataFrame, DataFrame]:
    """Read a persisted k-means model written by ``build_kmeans_index``:
    returns ``(assignments, centroids)``."""
    return (
        spark.read.parquet(f"{path}/assignments"),
        spark.read.parquet(f"{path}/centroids"),
    )


def build_semantic_cells_index(
    corpus: DataFrame,
    path: str,
    n_iter: int = 3,
    train_cap: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """BUILD STEP: the SemDeDup blocking cells — a k-means model with
    ``k = semantic_cells_k(count)`` cells, sample-trained, persisted in
    the ``build_kmeans_index`` layout.

    This is what makes semantic dedup's cost O(n^1.5) instead of n²: the
    round-10 scaling sweep measured slope 2.28 (330 s at sf1) for
    pairwise-within-``label`` blocking, because a FIXED-cardinality cell
    column means cell size ∝ corpus. With k = √n cells the per-cell
    expansion and the assignment pass balance at n·√n, and training cost
    stays flat via ``train_cap`` sampling. Deterministic end-to-end
    (int64-exact Lloyd's + hash-ordered sample), so the sf0.01 oracle
    unrolls the same k and matches value-for-value.

    ``train_cap`` scales with k (≥ 50 samples per cell): with k = √n and
    a FIXED cap, once n exceeds cap² the seeding (first k ids of the
    sample) would silently clamp cells at ``cap`` — reintroducing the
    cell-size-grows-with-n quadratic this index exists to kill — and
    near the clamp Lloyd's degenerates to one point per centroid."""
    k = semantic_cells_k(corpus.count())
    build_kmeans_index(
        corpus, path, k=k, n_iter=n_iter, id_col=id_col, vec_col=vec_col,
        train_cap=max(train_cap, 50 * k),
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ): subspace codebooks + ADC top-k
# ---------------------------------------------------------------------------

def _subvectors(
    q: DataFrame, dim: int, m: int, id_col: "str | list[str]"
) -> DataFrame:
    """Fan a quantized-vector relation out to ``m`` rows per vector —
    ``(*keys, sub, _qs)`` with ``_qs`` the contiguous dim/m slice for
    subspace ``sub``. ``id_col`` may be a list to carry extra keys (the
    IVF-PQ query side keys by (query, cell)). Pure map-side (an array
    of slices + posexplode): no shuffle, no UDF."""
    keys = [id_col] if isinstance(id_col, str) else list(id_col)
    sd = dim // m
    slices = F.array(
        *[F.slice(F.col("_q"), s * sd + 1, sd) for s in range(m)]
    )
    return q.select(
        *[F.col(k) for k in keys], F.posexplode(slices).alias("sub", "_qs")
    )


def pq_model(
    corpus: DataFrame,
    dim: int = 64,
    m: int = 4,
    k: int = 4,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    pre_quantized: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Product-quantization model: per-subspace Lloyd's k-means over the
    ``m`` contiguous dim/m slices of each vector, returning
    ``codes (id, sub, code)`` and ``codebooks (sub, code, _cvec)``
    (quantized-int64 centroid subvectors).

    This is THE memory-bounded ANN representation at 100 TB: the encoded
    corpus is ``n x m`` small integers (m bytes/vector at k<=256) instead
    of ``n x dim`` floats — a 64-dim float corpus compresses 64x, so the
    scan side of a query fits in a fraction of the executor memory the
    raw vectors need, and the ADC scan reads ONLY the codes table.

    All arithmetic reuses the int64-exact k-means machinery
    (:func:`_quantize_vec` / :func:`_sq_dist`, floor-integer centroid
    means, lexicographic tie-breaks), with ``sub`` as an extra grouping
    key — every subspace trains in the SAME distributed jobs (one scan
    per Lloyd round for all m codebooks, not m separate trainings), and
    the whole chain is lazy with no driver collects. Seeds are the ``k``
    lowest-id vectors' slices (cluster labels ARE seed ids), identical
    across engines."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    # pre_quantized: the vectors are already int64 arrays (e.g. IVF-PQ
    # residuals) — skip the 1e-6 quantize+clamp
    vec = (
        F.col(vec_col)
        if pre_quantized
        else _quantize_vec(F.col(vec_col))
    )
    q = corpus.select(F.col(id_col), vec.alias("_q"))
    sv = _subvectors(q, dim, m, id_col)
    seeds = q.orderBy(id_col).limit(k)
    codebooks = _subvectors(seeds, dim, m, id_col).select(
        "sub", F.col(id_col).cast("long").alias("_c"),
        F.col("_qs").alias("_cvec"),
    )

    def assign(cents: DataFrame) -> DataFrame:
        scored = sv.join(F.broadcast(cents), on="sub").select(
            F.col(id_col),
            "sub",
            "_qs",
            F.struct(
                _sq_dist(F.col("_qs"), F.col("_cvec")).alias("d"),
                F.col("_c").alias("c"),
            ).alias("_dc"),
        )
        best = scored.groupBy(id_col, "sub", "_qs").agg(
            F.min("_dc").alias("_best")
        )
        return best.select(
            F.col(id_col),
            "sub",
            "_qs",
            F.col("_best.c").alias("code"),
            F.col("_best.d").alias("dist_sq"),
        )

    for _ in range(n_iter - 1):
        assigned = assign(codebooks)
        per_pos = assigned.select(
            "sub", F.col("code"), F.posexplode("_qs").alias("pos", "v")
        ).groupBy("sub", "code", "pos").agg(
            F.floor(
                F.sum("v").cast("double") / F.count(F.lit(1))
            ).cast("long").alias("m")
        )
        codebooks = (
            per_pos.groupBy("sub", "code")
            .agg(
                F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("_pm")
            )
            .select(
                "sub",
                F.col("code").alias("_c"),
                F.transform(F.col("_pm"), lambda s: s["m"]).alias("_cvec"),
            )
        )

    codes = assign(codebooks).select(id_col, "sub", "code")
    return codes, codebooks.select(
        "sub", F.col("_c").alias("code"), F.col("_cvec")
    )


def pq_topk(
    queries: DataFrame,
    codes: DataFrame,
    codebooks: DataFrame,
    dim: int = 64,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over a PQ-encoded corpus:
    ``(query_id, neighbor_id, rank, adc_dist)`` with the approximate
    squared L2 ``sum over subspaces of ||q_sub - centroid[sub, code]||^2``
    — the query side stays EXACT (uncompressed), only the corpus is
    quantized, which is what makes ADC beat symmetric distance at equal
    memory.

    Plan shape at scale: the per-query lookup table (m x k distances,
    tiny) broadcasts into a single map-side join + partial-aggregated
    sum over the codes table — ONE scan of n x m small ints per query
    batch, no shuffle of raw vectors anywhere. The full-corpus scan is
    PQ's contract (memory-bounded, not candidate-pruned); compose with
    the IVF cell probe upstream when 100 TB needs pruning too, exactly
    as the kmeans->IVF compose query does for raw vectors. adc_dist is
    int64-exact, so ranks are bit-stable across engines."""
    qv = queries.select(
        F.col(query_id_col), _quantize_vec(F.col(vec_col)).alias("_q")
    )
    n_sub = codebooks.groupBy().agg(
        (F.max("sub") + 1).alias("m")
    )  # tiny; only used to slice query vectors identically to training
    # slice with the codebook's own subspace count (broadcast 1-row join)
    qsv = (
        qv.crossJoin(F.broadcast(n_sub))
        .select(
            F.col(query_id_col),
            F.posexplode(
                F.expr(
                    f"transform(sequence(0, m - 1), "
                    f"s -> slice(_q, s * ({dim} div m) + 1, {dim} div m))"
                )
            ).alias("sub", "_qs"),
        )
    )
    lut = qsv.join(F.broadcast(codebooks), on="sub").select(
        F.col(query_id_col),
        "sub",
        "code",
        _sq_dist(F.col("_qs"), F.col("_cvec")).alias("d"),
    )
    adc = (
        codes.join(F.broadcast(lut), on=["sub", "code"])
        .filter(F.col(id_col) != F.col(query_id_col))
        .groupBy(query_id_col, id_col)
        .agg(F.sum("d").alias("adc_dist"))
    )
    w = Window.partitionBy(query_id_col).orderBy("adc_dist", F.col(id_col))
    return (
        adc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col(query_id_col),
            F.col(id_col).alias("neighbor_id"),
            F.col("rank"),
            F.col("adc_dist"),
        )
    )


def build_pq_index(
    corpus: DataFrame,
    path: str,
    dim: int = 64,
    m: int = 4,
    k: int = 4,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """BUILD STEP: persist both halves of the PQ model (``path/codes``,
    ``path/codebooks``) — the same write-time-artifact pattern as the
    IVF/RP/kmeans indexes. Encoding is the expensive scan (n x m
    assignments); a query batch then reads the m-x-k codebook plus the
    compact codes table and never touches raw vectors."""
    codes, codebooks = pq_model(corpus, dim, m, k, n_iter, id_col, vec_col)
    codes.write.mode("overwrite").parquet(f"{path}/codes")
    codebooks.write.mode("overwrite").parquet(f"{path}/codebooks")


def load_pq_index(spark, path: str) -> tuple[DataFrame, DataFrame]:
    """Read a persisted PQ model written by ``build_pq_index``: returns
    ``(codes, codebooks)``."""
    return (
        spark.read.parquet(f"{path}/codes"),
        spark.read.parquet(f"{path}/codebooks"),
    )


def pq_encode(
    corpus: DataFrame,
    codebooks: DataFrame,
    dim: int = 64,
    m: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode vectors against FIXED codebooks — the incremental path:
    new corpus arrivals get ``(id, sub, code)`` rows without retraining
    (exactly how a production PQ index absorbs appends between periodic
    re-trainings). Same int64-exact assignment arithmetic as
    :func:`pq_model`'s final round, so encoding the training corpus
    against its own codebooks reproduces the persisted codes
    bit-for-bit. One map-side broadcast join per batch; no shuffle of
    vector data."""
    q = corpus.select(
        F.col(id_col), _quantize_vec(F.col(vec_col)).alias("_q")
    )
    sv = _subvectors(q, dim, m, id_col)
    cents = codebooks.select(
        "sub", F.col("code").alias("_c"), F.col("_cvec")
    )
    scored = sv.join(F.broadcast(cents), on="sub").select(
        F.col(id_col),
        "sub",
        F.struct(
            _sq_dist(F.col("_qs"), F.col("_cvec")).alias("d"),
            F.col("_c").alias("c"),
        ).alias("_dc"),
    )
    return (
        scored.groupBy(id_col, "sub")
        .agg(F.min("_dc").alias("_best"))
        .select(
            F.col(id_col),
            "sub",
            F.col("_best.c").alias("code"),
            F.col("_best.d").alias("dist_sq"),
        )
    )


# ---------------------------------------------------------------------------
# IVF-PQ: coarse cells + residual product quantization (the faiss-standard
# composition — candidate pruning AND memory-bounded scoring together)
# ---------------------------------------------------------------------------

def _centroids_as_int(centroids: DataFrame) -> DataFrame:
    """Recover the exact int64 quantized centroids from the persisted
    double form: each component is an integer/10^6 whose double rendering
    has absolute error far below 0.5e-6, so ``floor(x*1e6 + 0.5)``
    round-trips exactly — and identically in DuckDB."""
    return centroids.select(
        F.col("cluster"),
        F.transform(
            F.col("centroid"),
            lambda x: F.floor(x * 1000000 + F.lit(0.5)).cast("long"),
        ).alias("_cq"),
    )


def ivfpq_encode(
    corpus: DataFrame,
    assignments: DataFrame,
    centroids: DataFrame,
    dim: int = 64,
    m: int = 4,
    k_codes: int = 4,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """Residual PQ over a k-means-partitioned corpus: each vector's
    RESIDUAL against its cell centroid (int64-exact subtraction) is
    product-quantized with ONE shared codebook set across cells (the
    faiss IVF-PQ layout — residuals are centered, so one codebook
    family fits all cells). Returns ``(codes, codebooks)``; the codes
    CARRY their cell id, so the persisted table (partitioned by
    ``cluster``) is the complete scan-side artifact — the probe prunes
    cells at the path level and never joins back to the assignment
    table. Residual components are bounded by ±4e6, so the int64
    distance bound still holds by construction."""
    cq = _centroids_as_int(centroids)
    cell = assignments.select(id_col, "cluster")
    res = (
        corpus.select(
            F.col(id_col), _quantize_vec(F.col(vec_col)).alias("_qv")
        )
        .join(cell, id_col)
        .join(F.broadcast(cq), "cluster")
        .select(
            F.col(id_col),
            F.zip_with(
                F.col("_qv"), F.col("_cq"), lambda a, b: a - b
            ).alias("_res"),
        )
    )
    codes, books = pq_model(
        res, dim, m, k_codes, n_iter, id_col, "_res", pre_quantized=True
    )
    # denormalize the cell onto the codes at BUILD time (one extra join in
    # the write job) so every query batch skips the codes⋈assignments
    # shuffle and the cell restriction can prune the codes scan itself
    return codes.join(cell, id_col), books


def ivfpq_topk(
    queries: DataFrame,
    centroids: DataFrame,
    codes: DataFrame,
    codebooks: DataFrame,
    dim: int = 64,
    m: int = 4,
    k: int = 5,
    nprobe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF-PQ search: probe the ``nprobe`` int64-nearest cells, then ADC
    over ONLY those cells' codes with a per-(query, cell) residual
    lookup table. This composes the two approximations — candidate
    pruning (IVF) bounds how much of the codes table a query touches,
    residual PQ bounds the bytes per candidate — which is the shape a
    100 TB vector corpus actually serves: the scan side is
    ``nprobe/num_cells`` of an already-64x-compressed table.

    Plan: centroids broadcast twice (probe + residual), LUT broadcast
    into a map-side join against the codes relation — which MUST carry
    its cell id from ``ivfpq_encode``, so no assignments join ever runs
    at query time and a cluster-partitioned codes layout prunes unprobed
    cells at the path level. Cluster-less codes raise: the legacy
    fallback (re-joining an assignments table per query batch) silently
    re-created the full codes-sized shuffle this operator exists to
    avoid, so a loud error beats a 100x-slower path. Partial-aggregated
    sum, WindowGroupLimit top-k. All integer; ranks bit-stable."""
    if "cluster" not in codes.columns:
        raise ValueError(
            "ivfpq_topk requires cell-carrying codes (a 'cluster' column, "
            "emitted by ivfpq_encode). Re-encode the corpus — the legacy "
            "assignments-join fallback was removed because it re-created "
            "the full codes shuffle at query time."
        )
    cq = _centroids_as_int(centroids)
    qv = queries.select(
        F.col(query_id_col), _quantize_vec(F.col(vec_col)).alias("_q")
    )
    probe_w = Window.partitionBy(query_id_col).orderBy("_pd", "cluster")
    probes = (
        qv.crossJoin(F.broadcast(cq))
        .withColumn("_pd", _sq_dist(F.col("_q"), F.col("_cq")))
        .withColumn("_pr", F.row_number().over(probe_w))
        .filter(F.col("_pr") <= nprobe)
        .select(
            query_id_col,
            "cluster",
            F.zip_with(
                F.col("_q"), F.col("_cq"), lambda a, b: a - b
            ).alias("_q"),  # per-(query, cell) residual
        )
    )
    qsv = _subvectors(probes, dim, m, [query_id_col, "cluster"])
    lut = qsv.join(F.broadcast(codebooks), on="sub").select(
        F.col(query_id_col),
        "cluster",
        "sub",
        "code",
        _sq_dist(F.col("_qs"), F.col("_cvec")).alias("d"),
    )
    adc = (
        codes.join(
            F.broadcast(lut), on=["cluster", "sub", "code"]
        )
        .filter(F.col(id_col) != F.col(query_id_col))
        .groupBy(query_id_col, id_col)
        .agg(F.sum("d").alias("adc_dist"))
    )
    w = Window.partitionBy(query_id_col).orderBy("adc_dist", F.col(id_col))
    return (
        adc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col(query_id_col),
            F.col(id_col).alias("neighbor_id"),
            F.col("rank"),
            F.col("adc_dist"),
        )
    )
