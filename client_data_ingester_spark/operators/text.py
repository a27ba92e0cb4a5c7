"""Text-analysis operators over the documents table ([EXT], SURVEY §7 Ph. 5).

Everything is built-in column expressions (split/regexp/arrays) — no Python
in the hot path — and every formula is portable to ANSI SQL so each operator
has an exact DuckDB oracle. Ratios are floor-rounded at scale 4 and emitted as DOUBLE so value-hash
comparison is stable across engines (one canonical rendering).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword lang-id heuristic.
# Deliberately small and hard-coded: the heuristic must be reproducible in
# SQL, not accurate — the testdata's texts are synthetic word-soup anyway.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "it", "for", "on", "with"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "für", "auf", "ein"],
    "fr": ["le", "la", "les", "et", "est", "de", "pour", "avec", "sur", "un"],
    "es": ["el", "la", "los", "las", "y", "es", "de", "para", "con", "un"],
    "zh": ["的", "是", "在", "了", "和", "有", "人", "不", "我", "他"],
}

_WORD_SPLIT = r"\s+"


def tokens(c: Column) -> Column:
    """Whitespace tokens of the lowercased text (empty strings removed)."""
    return F.filter(
        F.split(F.lower(F.trim(c)), _WORD_SPLIT), lambda w: w != ""
    )


def lang_scores(c: Column) -> dict[str, Column]:
    toks = tokens(c)
    return {
        lang: F.size(
            F.filter(toks, lambda w: w.isin(*LANG_STOPWORDS[lang]))
        )
        for lang in LANG_STOPWORDS
    }


def _staged_text_features(
    docs: DataFrame,
    text_col: str,
    langs: "list[str] | None" = None,
    with_alpha: bool = False,
    fan: bool = True,
) -> DataFrame:
    """Tokenize ONCE, then compute every heavy per-doc text feature exactly
    once, each landing as a named attribute behind a projection boundary.

    This staging is a PERFORMANCE CONTRACT, not style: expressions built by
    composing ``lang_scores``/ratio columns inline re-tokenize the text per
    reference, and the lang-id argmax CASE tree doubles per language — the
    fully-inlined form re-evaluated the tokenizer ~100x per row (measured
    ~600 µs/row on the stratified query — a 3.4 s scan of 5 k docs, i.e.
    catastrophic at corpus scale). Catalyst's CollapseProject keeps these
    boundaries because every staged column is non-trivial and referenced
    more than once downstream.

    ``langs`` restricts the stopword-hit columns (default: all);
    ``with_alpha`` adds ``_n_alpha_words`` (tokens containing an
    alphabetic char) — the extra feature the Gopher rules need. One
    staged projection serves every text operator so the feature
    expressions (tokenizer, punct/digit regexes, word-length fold) have
    exactly ONE definition to keep oracle-portable."""
    from .par import fan_out

    t = F.col(text_col)
    # the tokenizer + per-token regex battery below is the heaviest
    # per-row kernel in the text family; fan the single-split local scan
    # out first (no-op at scale — see par.fan_out). ``fan=False`` is for
    # consumers whose LAZY plan re-executes this subtree several times
    # (the pipeline entry): there the added exchange multiplies per
    # re-execution and costs more than the kernel width buys.
    if fan:
        docs = fan_out(docs)
    s1 = docs.select("doc_id", t.alias("_t"), tokens(t).alias("_toks"))
    tt, toks = F.col("_t"), F.col("_toks")
    extra = (
        [
            F.size(F.filter(toks, lambda w: w.rlike("[a-z]"))).alias(
                "_n_alpha_words"
            )
        ]
        if with_alpha
        else []
    )
    return s1.select(
        "doc_id",
        F.length(tt).alias("n_chars"),
        F.size(toks).alias("n_words"),
        F.aggregate(toks, F.lit(0), lambda a, w: a + F.length(w)).alias(
            "_sum_wlen"
        ),
        (
            F.length(tt) - F.length(F.regexp_replace(tt, r"[^\w\s]", ""))
        ).alias("_n_punct"),
        (F.length(tt) - F.length(F.regexp_replace(tt, r"[0-9]", ""))).alias(
            "_n_digit"
        ),
        *[
            F.size(F.filter(toks, _isin_fn(LANG_STOPWORDS[lang]))).alias(
                f"hits_{lang}"
            )
            for lang in sorted(langs if langs is not None else LANG_STOPWORDS)
        ],
        *extra,
    )


def _isin_fn(words: list[str]):
    # closure factory, NOT a default-arg lambda: pyspark derives the lambda
    # arity from the signature, so an extra bound parameter would be handed
    # a Column
    return lambda w: w.isin(*words)


def _pred_from_hits() -> Column:
    """Lang-id argmax over the staged ``hits_<lang>`` ATTRIBUTES: highest
    stopword-hit count wins, ties go to the alphabetically-first language,
    zero hits → 'und'. The CASE tree still doubles per language, but its
    leaves are plain column refs — cheap to duplicate."""
    best = None
    best_score = None
    for lang in sorted(LANG_STOPWORDS):
        s = F.col(f"hits_{lang}")
        if best is None:
            best, best_score = F.lit(lang), s
        else:
            cond = s > best_score
            best = F.when(cond, F.lit(lang)).otherwise(best)
            best_score = F.when(cond, s).otherwise(best_score)
    return F.when(best_score > 0, best).otherwise(F.lit("und"))


def build_text_features_index(
    docs: DataFrame, path: str, text_col: str = "text"
) -> None:
    """BUILD STEP: materialize the staged per-doc text-feature table ONCE
    and persist it (the cluster-index pattern, dedup.build_cluster_index).

    The staged tokenize/feature pass is the dominant cost of every text
    query (lang-id, quality, mixture, gopher, curriculum) — and it is a
    pure function of the corpus, so it belongs at WRITE time. Consumers
    pass the loaded artifact as their ``features=`` argument and probe a
    narrow typed table instead of each re-running the shingle/tokenize
    scan. Written with ``with_alpha=True`` and ALL languages so every
    consumer's column set is covered (Catalyst prunes unused columns out
    of the probe scan)."""
    _staged_text_features(docs, text_col, with_alpha=True).write.mode(
        "overwrite"
    ).parquet(path)


def load_text_features_index(spark, path: str) -> DataFrame:
    """Read a persisted staged-feature table written by
    ``build_text_features_index``."""
    return spark.read.parquet(path)


def identify_language(
    docs: DataFrame, text_col: str = "text", features: DataFrame | None = None
) -> DataFrame:
    """Per-doc language id + per-language stopword hit counts: argmax of
    stopword hits; ties go to the alphabetically-first language; zero hits
    → 'und' (undetermined)."""
    f = features if features is not None else _staged_text_features(docs, text_col)
    return f.select(
        "doc_id",
        *[f"hits_{lang}" for lang in sorted(LANG_STOPWORDS)],
        _pred_from_hits().alias("pred_lang"),
    )


def _quality_cols() -> dict[str, Column]:
    """Quality features + composite score as expressions over the staged
    feature ATTRIBUTES (cheap arithmetic — safe to duplicate).

    - n_chars, n_words, mean word length
    - punct_ratio: punctuation chars / chars
    - digit_ratio: digit chars / chars
    - stop_ratio: english-stopword tokens / tokens (== hits_en)
    - score: 0..1 composite (word-length sweet spot + low punct/digit noise)
    """
    n_chars, n_words = F.col("n_chars"), F.col("n_words")
    mean_wlen = F.when(
        n_words > 0, F.col("_sum_wlen").cast("double") / n_words
    ).otherwise(F.lit(0.0))
    punct_ratio = F.when(
        n_chars > 0, F.col("_n_punct").cast("double") / n_chars
    ).otherwise(0.0)
    digit_ratio = F.when(
        n_chars > 0, F.col("_n_digit").cast("double") / n_chars
    ).otherwise(0.0)
    stop_ratio = F.when(
        n_words > 0, F.col("hits_en").cast("double") / n_words
    ).otherwise(0.0)
    wlen_term = F.greatest(
        F.lit(0.0), F.lit(1.0) - F.abs(mean_wlen - F.lit(5.0)) / F.lit(5.0)
    )
    score = F.greatest(
        F.lit(0.0),
        F.least(
            F.lit(1.0),
            F.lit(0.5) * wlen_term
            + F.lit(0.3) * (F.lit(1.0) - punct_ratio * 4)
            + F.lit(0.2) * (F.lit(1.0) - digit_ratio * 4),
        ),
    )
    # floor(x*1e4+0.5): deterministic half-up on identical doubles — Spark's
    # ROUND and DuckDB's ROUND disagree on decimal-looking halves (0.94125)
    dec = lambda x: (F.floor(x * 10000 + F.lit(0.5)) / 10000).cast(  # noqa: E731
        "double"
    )
    return {
        "n_chars": n_chars,
        "n_words": n_words,
        "mean_word_len": dec(mean_wlen),
        "punct_ratio": dec(punct_ratio),
        "digit_ratio": dec(digit_ratio),
        "stop_ratio": dec(stop_ratio),
        "quality_score": dec(score),
    }


def quality_scores(
    docs: DataFrame,
    text_col: str = "text",
    features: DataFrame | None = None,
    fan: bool = True,
) -> DataFrame:
    """Heuristic doc-quality features + composite score (see
    ``_quality_cols`` for the feature list; tokenization is staged once —
    see ``_staged_text_features``; pass the persisted artifact as
    ``features`` to skip the tokenize scan entirely; ``fan=False`` for
    multi-execution lazy consumers — see ``_staged_text_features``)."""
    f = (
        features
        if features is not None
        else _staged_text_features(docs, text_col, fan=fan)
    )
    cols = _quality_cols()
    return f.select(
        "doc_id", *[cols[name].alias(name) for name in cols]
    )


# A BPE-ish tokenizer regex: alpha runs, single digits, or single
# non-alnum-non-space symbols (the common "pre-tokenizer" shape).
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + BPE-ish regex token count per doc."""
    t = F.col(text_col)
    return docs.select(
        "doc_id",
        F.size(tokens(t)).alias("ws_tokens"),
        F.size(F.regexp_extract_all(t, F.lit(BPE_ISH_PATTERN), 0)).alias(
            "re_tokens"
        ),
    )


def document_fingerprints(
    docs: DataFrame, text_col: str = "text", shingle_k: int = 3, bottom_k: int = 4
) -> DataFrame:
    """Bottom-k sketch fingerprint via rolling word-shingle hashes.

    The k lexicographically-smallest md5 digests of the doc's k-word shingles,
    concatenated and re-hashed into one fingerprint — a compact, portable
    stand-in for winnowing; identical-fingerprint docs are near-identical.

    Built over ``shingle_arrays`` (materialized words/shingle columns) so the
    shingle construction runs once per doc, not once per reference of the
    shingle expression — see dedup.word_shingles' performance note."""
    from .dedup import shingle_arrays

    arr = shingle_arrays(docs, text_col, shingle_k)
    sh = F.col("sh")
    hashes = F.array_sort(F.transform(sh, lambda s: F.md5(s)))
    bottom = F.slice(hashes, 1, bottom_k)
    return arr.select(
        "doc_id",
        F.md5(F.array_join(bottom, "|")).alias("fingerprint"),
        F.size(sh).alias("n_shingles"),
    )


def _split_bucket(key: Column) -> Column:
    """THE digest-bucket recipe every split variant shares (md5 first-8-hex
    → int, mod 100) — one definition so the bucket can never drift between
    the id-keyed and cluster-keyed splits (or their DuckDB oracles)."""
    from .dedup import md5_int

    return md5_int(key.cast("string")) % 100


def _split_decision(bucket: Column, train_pct: int) -> Column:
    return F.when(bucket < train_pct, F.lit("train")).otherwise(F.lit("eval"))


def split_expr(
    id_col: str = "doc_id",
    train_pct: int = 80,
    key: Column | None = None,
) -> Column:
    """The hash-split decision as a pure map-only EXPRESSION — use this
    inside an existing projection when a relation already carries the id
    (no self-join, no second scan); :func:`hash_split` is the relation
    form of the same rule. ``key`` overrides the bucketed expression
    (default: the id column) — :func:`leakage_safe_split` passes the
    cluster label through here."""
    k = F.col(id_col) if key is None else key
    return _split_decision(_split_bucket(k), train_pct)


def hash_split(
    docs: DataFrame,
    id_col: str = "doc_id",
    train_pct: int = 80,
) -> DataFrame:
    """Deterministic train/eval split by id hash — the training-pipeline
    holdout primitive. ``sample()`` is seed- and partitioning-dependent; a
    digest bucket is stable across runs, engines, and repartitions, and a
    document keeps its split when the corpus grows (the property that keeps
    eval sets uncontaminated across dataset versions). Pure expressions,
    no shuffle."""
    bucket = _split_bucket(F.col(id_col))
    return docs.select(
        F.col(id_col),
        bucket.cast("int").alias("bucket"),
        split_expr(id_col, train_pct).alias("split"),
    )


def leakage_safe_split(
    docs: DataFrame,
    clusters: DataFrame,
    id_col: str = "doc_id",
    train_pct: int = 80,
    carry_cols: "list[str] | None" = None,
) -> DataFrame:
    """Train/eval split that can never put two NEAR-DUPLICATES on
    opposite sides: the hash bucket is keyed on the document's duplicate
    CLUSTER label (``duplicate_clusters``' min-id labeling; the doc's own
    id for unclustered docs) instead of its id, so a whole near-dup
    cluster moves as one unit. Plain id-hash splits leak: a paraphrase
    of a training document lands in eval with probability 1-train_pct
    and the eval loss silently measures memorization. Keyed on the
    cluster, singleton docs get exactly the ``hash_split`` assignment
    (same digest-bucket recipe), so adopting the leakage-safe split only
    reassigns documents that HAVE near-duplicates.

    Stability caveat (vs ``hash_split``'s absolute stability): a doc
    keeps its split as the corpus grows EXCEPT when a new document
    bridges two previously-separate clusters — the merged cluster
    re-keys to the joint minimum and one side's members flip. That flip
    is not an artifact, it IS the guarantee: once the sides are
    near-duplicates of each other they must land on one side of the
    split, and min-id re-keying is the deterministic way to pick it.
    Pipelines that need eval-set freezing should pin the labeling
    artifact version they split against.

    Shape at 100 TB: one hash-partitioned equi-join of the corpus
    against the persisted 2-column cluster labeling (the write-time
    artifact every dedup endgame consumer probes), then map-only
    expressions — no extra shuffle, no window.

    Emits (doc_id, split_key, bucket, split) — a 4-column ASSIGNMENT
    relation by default: text/metadata are deliberately dropped so the
    join ships only the id, and consumers re-join the result against the
    corpus on ``doc_id`` (or pass ``carry_cols`` to carry named doc
    columns through the split join instead)."""
    lab = clusters.select(
        F.col("doc_id").alias(id_col), F.col("cluster_id")
    )
    carry = list(carry_cols or [])
    # carrying a reserved output name duplicates a column, and carrying
    # cluster_id makes the post-join key reference ambiguous
    # (AnalysisException deep in the plan) — fail at the API edge with
    # the actual offenders instead (r15 ADVICE)
    reserved = {id_col, "split_key", "bucket", "split", "cluster_id"}
    clash = sorted(set(carry) & reserved)
    if clash:
        raise ValueError(
            f"carry_cols {clash} collide with the split output columns "
            f"({sorted(reserved)}); rename or re-join on {id_col} instead"
        )
    j = docs.select(id_col, *carry).join(lab, id_col, "left")
    key = F.coalesce(F.col("cluster_id"), F.col(id_col))
    bucket = _split_bucket(key)
    return j.select(
        F.col(id_col),
        key.alias("split_key"),
        bucket.cast("int").alias("bucket"),
        split_expr(id_col, train_pct, key=key).alias("split"),
        *carry,
    )


def build_split_index(
    docs: DataFrame,
    clusters: DataFrame,
    path: str,
    id_col: str = "doc_id",
    train_pct: int = 80,
) -> None:
    """BUILD STEP: run :func:`leakage_safe_split` ONCE and persist the
    assignment as a versioned SPLIT MANIFEST (doc_id, split_key, bucket,
    split) — the eval-set freeze the leakage-safe split's stability
    caveat calls for. ``leakage_safe_split`` re-keys a document when a
    later corpus refresh bridges two clusters (correct for leakage, fatal
    for a benchmark whose eval membership must never move); pinning the
    manifest at eval-set-creation time makes the assignment a durable
    artifact, exactly like the cluster/IVF/RP indexes: a pure function of
    the corpus version it was built from, re-built only when the eval set
    is re-versioned. Consumers apply it with :func:`frozen_split`."""
    leakage_safe_split(
        docs, clusters, id_col=id_col, train_pct=train_pct
    ).write.mode("overwrite").parquet(path)


def load_split_index(spark, path: str) -> DataFrame:
    """Read a persisted split manifest written by
    :func:`build_split_index`."""
    return spark.read.parquet(path)


def frozen_split(
    docs: DataFrame,
    split_index: DataFrame,
    clusters: DataFrame | None = None,
    id_col: str = "doc_id",
    train_pct: int = 80,
) -> DataFrame:
    """Apply a PINNED split manifest to a (possibly grown) corpus:

    - a document present in the manifest keeps its pinned ``split``
      unconditionally — eval membership among pinned docs is
      byte-identical across corpus refreshes, whatever the current
      clustering says;
    - a NEW document lands by the eval-protective cluster rule: if its
      CURRENT near-dup cluster (from ``clusters``) contains any pinned
      member, it adopts that member's side — preferring ``eval`` when a
      merged cluster straddles pinned sides, because a near-duplicate of
      a frozen eval document put in train contaminates training, while
      the reverse merely shrinks train by one doc;
    - a new document with no pinned cluster-mates falls back to the
      shared digest-bucket split on its cluster key (== plain
      ``leakage_safe_split``; ``hash_split`` when ``clusters`` is None).

    Shape at 100 TB: two hash-partitioned equi-joins on the id (corpus ×
    labeling, corpus × manifest), one groupBy on the cluster key (the
    pinned-side vote), one equi-join back on the key — no window, no
    broadcast of anything corpus-sized.

    Emits (doc_id, split_key, bucket, split, frozen) where ``split_key``/
    ``bucket`` reflect the CURRENT clustering (informative) and ``frozen``
    marks rows whose split came from the manifest."""
    pinned = split_index.select(F.col(id_col), F.col("split").alias("_pin"))
    if clusters is None:
        keyed = docs.select(id_col).select(
            F.col(id_col), F.col(id_col).alias("split_key")
        )
    else:
        lab = clusters.select(
            F.col("doc_id").alias(id_col), F.col("cluster_id")
        )
        keyed = (
            docs.select(id_col)
            .join(lab, id_col, "left")
            .select(
                F.col(id_col),
                F.coalesce("cluster_id", F.col(id_col)).alias("split_key"),
            )
        )
    j = keyed.join(pinned, id_col, "left")
    key_pin = (
        j.where(F.col("_pin").isNotNull())
        .groupBy("split_key")
        .agg(
            F.max(
                F.when(F.col("_pin") == "eval", F.lit(1)).otherwise(F.lit(0))
            ).alias("_ke"),
            F.max(
                F.when(F.col("_pin") == "train", F.lit(1)).otherwise(F.lit(0))
            ).alias("_kt"),
        )
    )
    out = j.join(key_pin, "split_key", "left")
    bucket = _split_bucket(F.col("split_key"))
    cluster_pin = F.when(F.col("_ke") == 1, F.lit("eval")).when(
        F.col("_kt") == 1, F.lit("train")
    )
    split = F.coalesce(
        F.col("_pin"), cluster_pin, _split_decision(bucket, train_pct)
    )
    return out.select(
        F.col(id_col),
        F.col("split_key"),
        bucket.cast("int").alias("bucket"),
        split.alias("split"),
        F.col("_pin").isNotNull().alias("frozen"),
    )


def quality_stratified_topk(docs: DataFrame, k: int = 50) -> DataFrame:
    """Top-k docs per detected language by quality score — the quality/
    curriculum filtering shape (keep the best k of every stratum, so
    low-resource languages aren't crowded out by the dominant one).

    Lang-id and quality score both derive from the SAME staged feature
    projection over one scan (joining two derived tables on doc_id would
    re-scan and shuffle for a row the scan already had whole). The only
    shuffle is the pred_lang rank window; k≪stratum at corpus scale, so
    WindowGroupLimit prunes per partition before the sort."""
    qual = _staged_text_features(docs, "text").select(
        "doc_id",
        _pred_from_hits().alias("pred_lang"),
        _quality_cols()["quality_score"].alias("quality_score"),
    )
    w = Window.partitionBy("pred_lang").orderBy(
        F.desc("quality_score"), F.col("doc_id")
    )
    return (
        qual.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("doc_id", "pred_lang", "quality_score", "rnk")
    )


def pack_sequences(
    docs: DataFrame,
    budget_tokens: int = 512,
    text_col: str = "text",
    chunk_size: int = 100_000,
) -> DataFrame:
    """(doc_id, n_tokens, shard_id, pos): pack documents in doc_id order
    into contiguous fixed-token-budget shards — the sequence-packing step
    that turns a curated corpus into uniform training chunks.

    A document lands in shard ``floor(tokens_before_it / budget)`` of the
    running whitespace-token count; ``pos`` is its rank inside the shard.
    Deterministic (pure function of ids + token counts — no RNG, no
    partitioning dependence), so shard composition is reproducible across
    runs and engines.

    Scale shape — a DISTRIBUTED PREFIX SUM, not one global window: a single
    unpartitioned ``sum() over (order by doc_id)`` funnels the whole corpus
    through ONE task. Instead: (1) chunk docs by ``doc_id div chunk_size``;
    (2) cumsum within each chunk (window partitioned by chunk — parallel);
    (3) aggregate per-chunk totals — rows = n_chunks, tiny — and cumsum
    those into chunk base offsets (the only serial step, over n_chunks rows
    not n_docs); (4) broadcast-join the offsets back. At 100 TB every
    per-row pass stays parallel and the serial window touches ~corpus/10⁵
    rows."""
    counted = docs.select(
        "doc_id",
        F.size(tokens(F.col(text_col))).alias("n_tokens"),
        (F.col("doc_id") / chunk_size).cast("long").alias("_chunk"),
    )
    in_chunk = Window.partitionBy("_chunk").orderBy("doc_id")
    local = counted.withColumn(
        "_cum_in_chunk",
        F.sum("n_tokens").over(
            in_chunk.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    # unpartitioned on purpose — runtime's "No Partition Defined" warning
    # is expected and bounded: this window runs over the per-chunk TOTALS
    # relation (n_docs / chunk_size rows, ~corpus/10^5), never the docs
    chunk_w = Window.orderBy("_chunk").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = (
        counted.groupBy("_chunk")
        .agg(F.sum("n_tokens").alias("_chunk_total"))
        .withColumn(
            "_base", F.coalesce(F.sum("_chunk_total").over(chunk_w), F.lit(0))
        )
        .select("_chunk", "_base")
    )
    before = F.col("_base") + F.col("_cum_in_chunk") - F.col("n_tokens")
    packed = local.join(F.broadcast(offsets), "_chunk").select(
        "doc_id",
        "n_tokens",
        F.floor(before / budget_tokens).cast("long").alias("shard_id"),
    )
    pos_w = Window.partitionBy("shard_id").orderBy("doc_id")
    return packed.withColumn(
        "pos", F.row_number().over(pos_w).cast("int")
    )


def mixture_sample(
    docs: DataFrame,
    rates: dict[str, int] | None = None,
    default_pct: int = 10,
    text_col: str = "text",
    features: DataFrame | None = None,
) -> DataFrame:
    """Deterministic per-language corpus mixture sampling: keep
    ``rates[lang]`` percent of each detected language's documents (the
    mixture-rebalancing step that up/down-weights strata when assembling a
    training mix).

    Selection is a pure id-hash bucket per document (see ``hash_split`` for
    why not ``sample()``): a doc's keep/drop decision is stable across
    runs, engines, repartitions, and corpus growth, so mixes are
    reproducible and audit-able.

    The rates ride a BROADCAST-JOINED 5-row table rather than a
    ``when``-chain column: a chained-``when`` ``keep_pct`` makes the keep
    filter a plain deterministic predicate over projections, and Catalyst
    pushes it to the scan by ALIAS SUBSTITUTION — re-inlining the staged
    lang-id (and its tokenizer) into the pushed condition, which undoes
    ``_staged_text_features``'s staging wholesale (measured 6.8 s vs
    0.9 s at sf0.1). A post-outer-join filter referencing the rate column
    can't sink below the left projection, so ``pred_lang`` stays a
    computed-once attribute; the join itself is a broadcast against
    len(rates) rows — free at any corpus size."""
    from .dedup import md5_int

    rates = rates if rates is not None else {"en": 100, "de": 50, "und": 5}
    f = features if features is not None else _staged_text_features(docs, text_col)
    bucket = (
        md5_int(F.concat(F.lit("mix:"), F.col("doc_id").cast("string")))
        % 100
    ).cast("int")
    rates_df = docs.sparkSession.createDataFrame(
        sorted((lang, int(pct)) for lang, pct in rates.items()),
        "lang string, rate int",
    )
    scored = f.select(
        "doc_id", _pred_from_hits().alias("pred_lang"), bucket.alias("bucket")
    )
    return (
        scored.join(
            F.broadcast(rates_df),
            scored["pred_lang"] == rates_df["lang"],
            "left",
        )
        .withColumn(
            "keep_pct", F.coalesce(F.col("rate"), F.lit(default_pct)).cast("int")
        )
        .filter(F.col("bucket") < F.col("keep_pct"))
        .select("doc_id", "pred_lang", "bucket", "keep_pct")
    )


def packed_shard_texts(
    docs: DataFrame, budget_tokens: int = 512, text_col: str = "text"
) -> DataFrame:
    """(shard_id, n_docs, shard_tokens, text_md5): the materialized training
    shards — each shard's documents concatenated in packing order (pos) with
    newline separators, emitted as an md5 so the result row stays compact
    and hash-comparable (the actual packed text is the array_join input).

    Per-shard state is bounded by ``budget_tokens`` (a shard holds roughly
    one budget's worth of documents), so the collect_list is a bounded
    aggregation, not an unbounded group materialization."""
    packed = pack_sequences(docs, budget_tokens, text_col)
    j = packed.join(docs.select("doc_id", text_col), "doc_id")
    ordered = F.transform(
        F.array_sort(
            F.collect_list(F.struct(F.col("pos"), F.col(text_col).alias("t")))
        ),
        lambda s: s["t"],
    )
    return j.groupBy("shard_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("shard_tokens"),
        F.md5(F.array_join(ordered, "\n")).alias("text_md5"),
    )


def balanced_sample(
    docs: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    k: int = 20,
) -> DataFrame:
    """Deterministic k-per-group sample — the per-source rebalancing
    primitive a mixture pipeline runs before weighting (cap every source
    at k docs so one crawl can't dominate).

    ``sample()``/``rand()`` are seed- and partitioning-dependent; ranking
    an id digest is stable across runs, engines, and repartitions, and a
    kept document stays kept when OTHER groups grow. The rank window
    partitions by the group (parallel across groups, no global sort); at
    100 TB WindowGroupLimit prunes each partition to its top-k before the
    per-group sort materializes.
    """
    from .dedup import md5_int

    key = md5_int(F.concat(F.lit("bal:"), F.col(id_col).cast("string")))
    rn = F.row_number().over(
        Window.partitionBy(group_col).orderBy(key.asc(), F.col(id_col))
    )
    return (
        docs.select(
            F.col(id_col),
            F.col(group_col),
            key.alias("sample_key"),
            rn.alias("rnk"),
        )
        .filter(F.col("rnk") <= k)
    )


# ---------------------------------------------------------------------------
# PII redaction / URL-domain extraction (privacy + provenance scrubbing)
# ---------------------------------------------------------------------------

# Character-class-only regexes: identical semantics under Java regex (Spark)
# and RE2 (DuckDB) — no backrefs, no lookaround, no \b.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    "phone": (r"\(\d{3}\) \d{3}-\d{4}", "[PHONE]"),
    "ssn": (r"\d{3}-\d{2}-\d{4}", "[SSN]"),
}

# host capture tolerates an optional :port and doesn't require a path —
# 'https://example.com today' and 'https://h.example.com:8080/x' both
# yield their host (non-capturing groups work identically in Java regex
# and RE2)
_URL_DOMAIN = r"https?://([A-Za-z0-9.-]+)(?::[0-9]+)?(?:[/\s]|$)"


def redact_pii(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Scrub emails / US-phone / SSN-shaped spans from the text column:
    (id, clean_text, n_emails, n_phones, n_ssns, clean_md5, clean_len).

    Pure JVM column expressions. The redaction chains ``regexp_replace``
    email→phone→ssn, and each count is taken on the text AS THAT STAGE
    SEES IT (email count on the original, phone count after emails are
    gone, ...) — so the counts are exactly the number of ``[EMAIL]`` /
    ``[PHONE]`` / ``[SSN]`` markers placed, even when spans overlap
    across patterns (an SSN-shaped local part inside an email is counted
    once, as the email that consumed it — an audit reading counts vs
    markers can't desync). ``clean_md5`` gives an engine-portable
    fingerprint of the scrubbed text without shipping it around.
    Embarrassingly parallel — no shuffle at all; at 100 TB this is a
    map-only pass whose cost is the regex engine, which is exactly where
    it should be.
    """
    stage = F.col(text_col)
    counts: dict[str, Column] = {}
    for name, (pat, repl) in PII_PATTERNS.items():
        counts[name] = F.size(F.regexp_extract_all(stage, F.lit(pat), F.lit(0)))
        stage = F.regexp_replace(stage, pat, repl)
    clean = stage
    return docs.select(
        F.col(id_col),
        clean.alias("clean_text"),
        counts["email"].cast("long").alias("n_emails"),
        counts["phone"].cast("long").alias("n_phones"),
        counts["ssn"].cast("long").alias("n_ssns"),
        F.md5(clean).alias("clean_md5"),
        F.length(clean).cast("long").alias("clean_len"),
    )


def url_domain_stats(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-domain corpus stats from the first URL in each document:
    (domain, n_docs, total_chars) — the provenance histogram a crawl
    curation pipeline reports per host.

    One ``regexp_extract`` per row (map-side), then a single aggregate
    on the domain key. Domain cardinality is bounded by the host space,
    so the shuffle is tiny relative to the corpus; no-URL docs group
    under the empty domain and are filtered before the aggregate.
    """
    domain = F.regexp_extract(F.col(text_col), _URL_DOMAIN, 1)
    return (
        docs.select(domain.alias("domain"), F.length(F.col(text_col)).alias("_len"))
        .filter(F.col("domain") != "")
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_len").cast("long").alias("total_chars"),
        )
        .orderBy(F.desc("n_docs"), "domain")
    )


def weighted_sample(
    docs: DataFrame,
    weight_col: str = "n_chars",
    n: int = 100,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic weight-proportional sample of ``n`` docs
    (Efraimidis-Spirakis A-ES): rank by ``u^(1/w)`` with ``u`` drawn from
    the doc id's md5 — heavier docs win more often, yet the draw is a
    pure function of the id, so resampling the same corpus version is
    reproducible and both engines agree row-for-row.

    Float discipline (the unigram_logprob recipe): ``u`` is a dyadic
    rational from the top 52 md5 bits (exactly representable), the only
    transcendental — ``ln(u)/w`` — is quantized to integer micro-nats
    immediately, and selection is an integer top-n with id tie-break
    riding TakeOrderedAndProject (no global sort materialization).
    Map-only until the bounded top-n — at 100 TB the cost is one scan.

    Rows with non-positive (or NULL) weights are excluded up front:
    ``ln(u)/0`` is ±inf/NaN, which Spark's non-ANSI long cast folds to a
    NULL/extreme while DuckDB errors on ``CAST(FLOOR(-inf) AS BIGINT)`` —
    filtering keeps dirty data engine-convergent instead of divergent.
    """
    docs = docs.filter(F.col(weight_col) > 0)
    u = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 13), 16, 10)
        .cast("long")
        + 1
    ).cast("double") / F.lit(float(1 << 52))
    key_micro = F.floor(
        F.log(u) / F.col(weight_col).cast("double") * 1000000.0 + F.lit(0.5)
    ).cast("long")
    return (
        docs.select(
            F.col(id_col),
            F.col(weight_col).cast("long").alias("weight"),
            key_micro.alias("key_micro"),
        )
        .orderBy(F.desc("key_micro"), id_col)
        .limit(n)
    )


def quality_curriculum(
    docs: DataFrame, n_bins: int = 40, features: DataFrame | None = None
) -> DataFrame:
    """Curriculum binning: split the corpus into quality quartiles whose
    boundaries come from the HISTOGRAM SKETCH, not an exact rank — the
    composed shape a 100 TB pipeline uses to build staged training mixes
    (low→high quality ordering) without ever rank-shuffling raw scores.

    Compose: :func:`quality_scores` → ``sketch.hist_registers`` over the
    fixed [0,1] quality domain (state ≤ n_bins rows) →
    ``sketch.hist_quantiles`` for the 25/50/75 edges → a broadcast
    3-value bound row tiers every doc in one map-side pass → per-tier
    aggregate. Two corpus scans total (register build + tiering); the
    quantile estimate error is one bin width, which for curriculum
    bucketing is exactly the tolerable kind of approximate.

    Float discipline: per-tier mean quality is summed as exact integer
    4-dec units (``floor(score·1e4+0.5)`` recovers the quantized score's
    integer numerator), one double division at the end — no
    order-dependent float accumulation."""
    from .sketch import hist_quantiles, hist_registers

    scores = quality_scores(docs, features=features).select(
        "doc_id", "n_words", "quality_score"
    )
    regs = hist_registers(scores, "quality_score", 0.0, 1.0, n_bins)
    qs = hist_quantiles(regs, [0.25, 0.5, 0.75], 0.0, 1.0, n_bins)
    bounds = qs.agg(
        F.max(F.when(F.col("q") == 0.25, F.col("est_value"))).alias("_b25"),
        F.max(F.when(F.col("q") == 0.50, F.col("est_value"))).alias("_b50"),
        F.max(F.when(F.col("q") == 0.75, F.col("est_value"))).alias("_b75"),
    )
    s = F.col("quality_score")
    tier = (
        F.when(s < F.col("_b25"), 0)
        .when(s < F.col("_b50"), 1)
        .when(s < F.col("_b75"), 2)
        .otherwise(3)
    )
    q4 = F.floor(s * 10000 + F.lit(0.5)).cast("long")
    tiered = scores.crossJoin(F.broadcast(bounds)).select(
        tier.cast("int").alias("tier"),
        F.col("n_words"),
        q4.alias("_q4"),
        "_b25",
        "_b50",
        "_b75",
    )
    per_tier = tiered.groupBy("tier").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_words").cast("long").alias("total_words"),
        F.sum("_q4").alias("_sq4"),
        F.max("_b25").alias("_b25"),
        F.max("_b50").alias("_b50"),
        F.max("_b75").alias("_b75"),
    )
    tier_hi = (
        F.when(F.col("tier") == 0, F.col("_b25"))
        .when(F.col("tier") == 1, F.col("_b50"))
        .when(F.col("tier") == 2, F.col("_b75"))
        .otherwise(F.lit(1.0))
    )
    return per_tier.select(
        "tier",
        "n_docs",
        "total_words",
        (
            F.floor(
                F.col("_sq4").cast("double") / F.col("n_docs") + F.lit(0.5)
            )
            / 10000.0
        ).cast("double").alias("mean_quality"),
        tier_hi.cast("double").alias("tier_hi"),
    )


def gopher_rule_filter(
    docs: DataFrame, text_col: str = "text", features: DataFrame | None = None
) -> DataFrame:
    """Gopher-style hard quality rules (Rae et al. 2021's heuristic
    filter family, thresholds adapted to short-doc corpora): per-doc
    keep/drop verdict with a BITMASK audit of which rules failed — the
    auditable shape a curation pipeline needs (aggregate the mask and
    you have the per-rule rejection report; filter on ``kept`` and you
    have the surviving corpus). Bit i set = rule i violated:

      0: word count outside [10, 100000]
      1: mean word length outside [3, 10]
      2: fewer than 2 English stopword hits
      3: alphabetic-word fraction < 0.8
      4: digit character ratio > 0.2
      5: punctuation character ratio > 0.3

    Map-only: one staged tokenize projection (the SHARED
    :func:`_staged_text_features`, with the alpha-word extra) → one
    verdict projection; no shuffle, no UDF, no window — embarrassingly
    parallel at any scale. All ratios are double quotients of exact
    integers, so the threshold comparisons are engine-identical."""
    # fan=False: the map-only/no-shuffle contract above is load-bearing
    # (pinned by tests/test_operators.py::test_gopher_rules_is_map_only)
    # and the verdict projection is cheap relative to the exchange an
    # opt-in fan_out would insert on sub-core-split local scans — the
    # heavy-kernel opt-in stays with the quality/repetition consumers.
    staged = (
        features
        if features is not None
        else _staged_text_features(
            docs, text_col, langs=["en"], with_alpha=True, fan=False
        )
    )
    n_chars, n_words = F.col("n_chars"), F.col("n_words")
    mean_wlen = F.when(
        n_words > 0, F.col("_sum_wlen").cast("double") / n_words
    ).otherwise(F.lit(0.0))
    alpha_frac = F.when(
        n_words > 0, F.col("_n_alpha_words").cast("double") / n_words
    ).otherwise(F.lit(0.0))
    digit_ratio = F.when(
        n_chars > 0, F.col("_n_digit").cast("double") / n_chars
    ).otherwise(F.lit(0.0))
    punct_ratio = F.when(
        n_chars > 0, F.col("_n_punct").cast("double") / n_chars
    ).otherwise(F.lit(0.0))
    violations = [
        (n_words < 10) | (n_words > 100000),
        (mean_wlen < 3.0) | (mean_wlen > 10.0),
        F.col("hits_en") < 2,
        alpha_frac < 0.8,
        digit_ratio > 0.2,
        punct_ratio > 0.3,
    ]
    mask = None
    n_failed = None
    for i, v in enumerate(violations):
        bit = F.when(v, F.lit(1 << i)).otherwise(F.lit(0))
        one = F.when(v, F.lit(1)).otherwise(F.lit(0))
        mask = bit if mask is None else mask + bit
        n_failed = one if n_failed is None else n_failed + one
    return staged.select(
        "doc_id",
        n_words.cast("long").alias("n_words"),
        mask.cast("int").alias("failed_mask"),
        n_failed.cast("int").alias("n_failed"),
        (mask == 0).alias("kept"),
    )
