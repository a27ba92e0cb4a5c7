"""Corpus-level training-data curation operators ([EXT], SURVEY §7 Phase 5).

The operators a large-scale LLM data pipeline runs BETWEEN dedup and
training: decontamination (train/eval n-gram overlap), repetition-based
quality signals (the Gopher/C4 rules), boilerplate detection by shingle
document-frequency, and tf-idf term profiling. Everything is built-in column
expressions over the same md5/shingle primitives as operators/dedup.py, so
every operator has an exact DuckDB oracle; ratios use the repo's portable
half-up convention (floor(x*1e4+0.5)/1e4 emitted as DOUBLE).

Scale design (the 100 TB story):
- all joins here shuffle on a WORD/SHINGLE key whose cardinality grows with
  the corpus (never on a bounded label), so AQE can split skewed hot terms;
- the contamination join's build side (distinct train shingles) and the
  boilerplate document-frequency relation are groupBy-reduced BEFORE the
  join — map-side partial aggregation shrinks them by the duplication
  factor;
- the only scalar that reaches the driver is the corpus size used by
  tf-idf; it rides a broadcast 1-row cross join, not a collect into the
  expression tree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import exploded_shingles, words_expr
from .text import hash_split


def _dec4(c: F.Column) -> F.Column:
    """Portable half-up at scale 4 (Spark ROUND and DuckDB ROUND disagree on
    decimal-looking halves; floor(x*1e4+0.5) does not)."""
    return (F.floor(c * 10000 + F.lit(0.5)) / 10000).cast("double")


def word_rows(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, w): one row PER OCCURRENCE of each word (non-distinct —
    frequency work needs multiplicity, unlike dedup's distinct shingles)."""
    return (
        docs.select("doc_id", words_expr(F.col(text_col)).alias("_w"))
        .select("doc_id", F.explode_outer("_w").alias("w"))
        .filter(F.col("w").isNotNull())
    )


def build_tf_index(docs: DataFrame, path: str, text_col: str = "text") -> None:
    """BUILD STEP: persist the per-(doc, word) term-frequency relation —
    the corpus pass every frequency-based operator starts from. Like the
    text-features artifact it is a pure function of the corpus and belongs
    at write time; ``nb_language_scores(tf=load_tf_index(...))`` probes it
    instead of re-running the explode+count scan per query."""
    word_rows(docs, text_col).groupBy("doc_id", "w").agg(
        F.count(F.lit(1)).alias("_tf")
    ).write.mode("overwrite").parquet(path)


def load_tf_index(spark, path: str) -> DataFrame:
    """Read a persisted (doc_id, w, _tf) relation written by
    ``build_tf_index``."""
    return spark.read.parquet(path)


def ngram_rows(docs: DataFrame, text_col: str = "text", k: int = 2) -> DataFrame:
    """(doc_id, g): one row per occurrence of each k-word gram (non-distinct).

    Same two-projection + explode_outer formulation as
    ``dedup.shingle_arrays``/``exploded_shingles`` (materialized words column;
    InferFiltersFromGenerate must not re-inline the split per gram position).
    """
    staged = docs.select("doc_id", words_expr(F.col(text_col)).alias("_ws"))
    ws = F.col("_ws")
    idx = F.sequence(F.lit(0), F.greatest(F.size(ws) - k, F.lit(0)))
    grams = F.transform(idx, lambda i: F.array_join(F.slice(ws, i + 1, k), " "))
    return (
        staged.select("doc_id", F.explode_outer(grams).alias("g"))
        # != '': an empty words array (empty doc) regenerates a '' gram
        # via join(slice([])); legit grams are never '' (words are
        # non-empty after words_expr)
        .filter(F.col("g").isNotNull() & (F.col("g") != ""))
    )


def repetition_scores(
    docs: DataFrame, text_col: str = "text", k: int = 2
) -> DataFrame:
    """Gopher-style repetition signals per document.

    - dup_word_frac: 1 − distinct/total words (vocabulary collapse);
    - top_gram_frac: share of k-gram occurrences held by the single most
      frequent k-gram (loops / chant text);
    - rep_gram_frac: share of k-gram occurrences whose gram occurs more than
      once (overall k-gram redundancy).

    Shape: two explodes (words, k-grams), each reduced by a map-side-partial
    groupBy on (doc_id[, gram]), then a 1:1 join on doc_id. No windows, no
    Python. Both explode kernels (tokenize + gram assembly) hang off the
    raw scan, so the source is fanned out first (operators/par.fan_out —
    no-op at scale, 32x kernel width on single-split local files).
    """
    from .par import fan_out

    docs = fan_out(docs)
    w = word_rows(docs, text_col)
    wstats = w.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.countDistinct("w").alias("n_distinct_words"),
    )
    gcounts = ngram_rows(docs, text_col, k).groupBy("doc_id", "g").agg(
        F.count(F.lit(1)).alias("c")
    )
    gstats = gcounts.groupBy("doc_id").agg(
        F.sum("c").alias("n_grams"),
        F.max("c").alias("max_c"),
        F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(F.lit(0))).alias(
            "rep_c"
        ),
    )
    nw = F.col("n_words").cast("double")
    ng = F.col("n_grams").cast("double")
    return wstats.join(gstats, "doc_id").select(
        "doc_id",
        F.col("n_words").cast("long").alias("n_words"),
        F.col("n_distinct_words").cast("long").alias("n_distinct_words"),
        _dec4(F.lit(1.0) - F.col("n_distinct_words") / nw).alias(
            "dup_word_frac"
        ),
        _dec4(F.col("max_c") / ng).alias("top_gram_frac"),
        _dec4(F.col("rep_c") / ng).alias("rep_gram_frac"),
    )


def boilerplate_scores(
    docs: DataFrame,
    text_col: str = "text",
    shingle_k: int = 3,
    df_threshold: int = 3,
) -> DataFrame:
    """Per-doc share of shingles that are corpus-common (document frequency
    ≥ ``df_threshold``) — the C4-style boilerplate signal: navigation chrome,
    license banners, and template text recur across many documents while
    body prose does not.

    Shape: distinct-per-doc shingles → groupBy(sh) document frequency →
    join back on the shingle → groupBy(doc_id). Both shuffles key on the
    shingle/doc id; the df relation is corpus-vocabulary-sized, never
    broadcast. The shingle-assembly kernel (fanned out centrally in
    ``dedup.shingle_arrays`` — measured 2.1 s -> 1.3 s at sf0.1) feeds
    both subtrees."""
    sh = exploded_shingles(docs, text_col, shingle_k)
    df_rel = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
    n_boiler = F.sum(
        F.when(F.col("df") >= df_threshold, 1).otherwise(0)
    )
    return (
        sh.join(df_rel, "sh")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            n_boiler.alias("n_boilerplate"),
        )
        .select(
            "doc_id",
            F.col("n_shingles").cast("long").alias("n_shingles"),
            F.col("n_boilerplate").cast("long").alias("n_boilerplate"),
            _dec4(
                F.col("n_boilerplate").cast("double")
                / F.col("n_shingles")
            ).alias("boilerplate_ratio"),
        )
    )


def contamination_check(
    docs: DataFrame,
    text_col: str = "text",
    shingle_k: int = 3,
    train_pct: int = 80,
) -> DataFrame:
    """Train→eval n-gram contamination audit (decontamination primitive).

    Splits the corpus with the deterministic ``hash_split``, then reports,
    for every EVAL document, how many of its distinct k-word shingles also
    appear anywhere in the TRAIN split. An eval doc with a high
    contamination_ratio is leaked into training and must be dropped from the
    benchmark (the reverse — dropping train docs — is the same query with
    the splits swapped).

    Shape: one left join keyed on the shingle string; the train side is
    groupBy-distinct first (map-side combine), so the join's build input is
    the train shingle VOCABULARY, not its occurrence list. No broadcast —
    both sides scale with the corpus."""
    split = hash_split(docs, train_pct=train_pct).select("doc_id", "split")
    sh = exploded_shingles(docs, text_col, shingle_k).join(split, "doc_id")
    train_sh = (
        sh.filter(F.col("split") == "train").select("sh").distinct()
        .withColumn("_hit", F.lit(1))
    )
    ev = sh.filter(F.col("split") == "eval")
    n_cont = F.sum(F.coalesce(F.col("_hit"), F.lit(0)))
    return (
        ev.join(train_sh, "sh", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            n_cont.alias("n_contaminated"),
        )
        .select(
            "doc_id",
            F.col("n_shingles").cast("long").alias("n_shingles"),
            F.col("n_contaminated").cast("long").alias("n_contaminated"),
            _dec4(
                F.col("n_contaminated").cast("double") / F.col("n_shingles")
            ).alias("contamination_ratio"),
        )
    )


def tfidf_top_terms(
    docs: DataFrame, text_col: str = "text", top_k: int = 5
) -> DataFrame:
    """Top-k characteristic terms per document by rational tf-idf.

    The score is ``tf · N / df`` — the idf log is deliberately dropped: the
    log doesn't change the per-document ranking (N is constant and log is
    monotone in N/df only when comparing equal-tf terms; the product form is
    the plain lift of the term over its corpus rate) and the rational form
    is bit-exact across engines, where ``ln`` need not be.

    Shape: word explode → tf groupBy(doc_id, w) → df groupBy(w) (derived
    from tf, so df is one narrow count over the already-reduced relation) →
    join on the term, corpus size rides a broadcast 1-row cross join →
    per-doc rank window (WindowGroupLimit prunes to top_k per partition
    before any sort at scale)."""
    tf = word_rows(docs, text_col).groupBy("doc_id", "w").agg(
        F.count(F.lit(1)).alias("tf")
    )
    dfr = tf.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n"))
    scored = (
        tf.join(dfr, "w")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            F.col("w").alias("term"),
            F.col("tf").cast("long").alias("tf"),
            F.col("df").cast("long").alias("df"),
            _dec4(
                (F.col("tf") * F.col("n")).cast("double") / F.col("df")
            ).alias("score"),
        )
    )
    rnk = F.row_number().over(
        Window.partitionBy("doc_id").orderBy(F.desc("score"), F.col("term"))
    )
    return (
        scored.withColumn("rnk", rnk)
        .filter(F.col("rnk") <= top_k)
        .select("doc_id", "term", "tf", "df", "score", "rnk")
    )


def bigram_rows(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, w1, w2): one row per ADJACENT word pair occurrence.

    Unlike ``ngram_rows(k=2)`` (which pads single-word docs with a
    degenerate 1-word gram), docs shorter than two words emit nothing:
    the index sequence is explicitly emptied below two words because
    Spark's ``sequence(1, 0)`` counts DOWN instead of returning empty.
    """
    staged = docs.select("doc_id", words_expr(F.col(text_col)).alias("_ws"))
    ws = F.col("_ws")
    idx = F.when(
        F.size(ws) >= 2, F.sequence(F.lit(1), F.size(ws) - 1)
    ).otherwise(F.array().cast("array<int>"))
    pairs = F.transform(
        idx,
        lambda i: F.struct(
            F.element_at(ws, i).alias("w1"),
            F.element_at(ws, i + 1).alias("w2"),
        ),
    )
    return (
        staged.select("doc_id", F.explode_outer(pairs).alias("_p"))
        .filter(F.col("_p").isNotNull())
        .select("doc_id", F.col("_p.w1").alias("w1"), F.col("_p.w2").alias("w2"))
    )


def unigram_logprob(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document average negative log-probability under the corpus's own
    unigram LM — the CCNet-style "perplexity filter" quality signal (a doc
    of globally-rare words scores high; boilerplate scores low).

    Cross-engine float discipline: ``ln`` is evaluated ONLY on the reduced
    per-word count table, quantized to integer micro-nats
    (``floor(ln(cnt)·1e6 + 0.5)``) right there. Everything that aggregates
    per document — the hot path — is exact BIGINT arithmetic (a sum of
    micro-nats), so executor-order float drift is impossible; one double
    division at the end renders the score. Shape: ONE explode → per-(doc,
    word) tf (map-side combine) → corpus counts derived FROM tf
    (vocabulary-sized) → tf⨝counts join → per-doc long sum of tf·lp. The
    join input is the tf relation, not raw occurrences — document length
    drops out of the shuffle entirely.
    """
    tf = word_rows(docs, text_col).groupBy("doc_id", "w").agg(
        F.count(F.lit(1)).alias("_tf")
    )
    wc = tf.groupBy("w").agg(F.sum("_tf").alias("_cnt"))
    lp = wc.select(
        "w",
        F.floor(F.log(F.col("_cnt").cast("double")) * 1000000.0 + 0.5)
        .cast("long")
        .alias("_lp_micro"),
    )
    totals = wc.agg(
        F.floor(
            F.log(F.sum("_cnt").cast("double")) * 1000000.0 + 0.5
        )
        .cast("long")
        .alias("_lnN_micro")
    )
    per_doc = (
        tf.join(lp, "w")
        .groupBy("doc_id")
        .agg(
            F.sum("_tf").alias("n_tokens"),
            F.sum(F.col("_tf") * F.col("_lp_micro")).alias("_s"),
        )
    )
    x = F.col("_lnN_micro") * F.col("n_tokens") - F.col("_s")
    return (
        per_doc.crossJoin(F.broadcast(totals))
        .select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            (
                F.floor(x.cast("double") / F.col("n_tokens") / 100.0 + 0.5)
                / 10000.0
            )
            .cast("double")
            .alias("neg_logprob"),
        )
    )


def pmi_bigrams(
    docs: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    top_k: int = 50,
) -> DataFrame:
    """Top-k adjacent word pairs by pointwise mutual information — the
    classic phrase-detection pass (word2vec/BPE-merge style) a tokenizer
    pipeline runs over the corpus.

    All counts are exact integers; PMI takes ONE ``ln`` per surviving
    (frequency-filtered) pair over a double built from those integers in a
    fixed operation order, then floor-rounds at 1e-4 — the only float step
    is deterministic given identical inputs. The rank window runs over the
    filtered pair-count relation (vocabulary², then min_count-pruned —
    reduced long before any window).
    """
    bi = bigram_rows(docs, text_col)
    bc = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_xy"))
    uc = word_rows(docs, text_col).groupBy("w").agg(
        F.count(F.lit(1)).alias("_c")
    )
    totals = (
        bc.agg(F.sum("c_xy").alias("_nb"))
        .crossJoin(F.broadcast(uc.agg(F.sum("_c").alias("_nu"))))
    )
    cx = uc.select(F.col("w").alias("_wx"), F.col("_c").alias("c_x"))
    cy = uc.select(F.col("w").alias("_wy"), F.col("_c").alias("c_y"))
    joined = (
        bc.filter(F.col("c_xy") >= min_count)
        .join(cx, F.col("w1") == F.col("_wx"))
        .join(cy, F.col("w2") == F.col("_wy"))
        .crossJoin(F.broadcast(totals))
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    pmi_raw = F.log(
        (d("c_xy") / d("_nb"))
        / ((d("c_x") / d("_nu")) * (d("c_y") / d("_nu")))
    )
    scored = joined.select(
        "w1",
        "w2",
        F.col("c_xy").cast("long").alias("c_xy"),
        F.col("c_x").cast("long").alias("c_x"),
        F.col("c_y").cast("long").alias("c_y"),
        _dec4(pmi_raw).alias("pmi"),
    )
    # bounded global window: ranks the thresholded BIGRAM-TYPE relation
    # (c_xy >= min_count survivors, vocabulary-scale), never occurrences
    rnk = F.row_number().over(
        Window.partitionBy(F.lit(1)).orderBy(
            F.desc("pmi"), F.col("w1"), F.col("w2")
        )
    )
    return (
        scored.withColumn("rnk", rnk)
        .filter(F.col("rnk") <= top_k)
        .select("w1", "w2", "c_xy", "c_x", "c_y", "pmi", "rnk")
    )


def oov_rate(
    docs: DataFrame, text_col: str = "text", vocab_size: int = 30
) -> DataFrame:
    """Per-document out-of-vocabulary rate against the corpus's own top-k
    vocabulary — the "does this doc look like the rest of the corpus"
    screen a tokenizer-budgeted pipeline applies before training.

    The vocabulary is a rank window over the REDUCED word-count relation
    (deterministic tie-break on the word), broadcast into the occurrence
    stream as a left join — the fact-side explode never shuffles on the
    word; only the per-doc fold shuffles, on doc_id.
    """
    tf = word_rows(docs, text_col).groupBy("doc_id", "w").agg(
        F.count(F.lit(1)).alias("_tf")
    )
    wc = tf.groupBy("w").agg(F.sum("_tf").alias("_cnt"))
    vocab = (
        wc.withColumn(
            "_r",
            # bounded global window over the WORD-COUNT relation
            # (vocabulary-sized) — not document occurrences
            F.row_number().over(
                Window.partitionBy(F.lit(1)).orderBy(
                    F.desc("_cnt"), F.col("w")
                )
            ),
        )
        .filter(F.col("_r") <= vocab_size)
        .select(F.col("w").alias("_vw"))
    )
    return (
        tf.join(F.broadcast(vocab), tf.w == F.col("_vw"), "left_outer")
        .groupBy("doc_id")
        .agg(
            F.sum("_tf").alias("n_tokens"),
            F.sum(
                F.when(F.col("_vw").isNull(), F.col("_tf")).otherwise(0)
            ).alias("n_oov"),
        )
        .select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.col("n_oov").cast("long").alias("n_oov"),
            _dec4(F.col("n_oov") / F.col("n_tokens")).alias("oov_ratio"),
        )
    )


def corpus_composition(
    docs: DataFrame,
    text_col: str = "text",
    group_cols: tuple = ("lang", "source"),
) -> DataFrame:
    """Mixture statistics per corpus slice — the report a training run's
    data card is built from: document counts and share, exact char/token
    totals, and per-doc averages for every (lang, source) cell.

    One corpus scan: per-doc char/token counts are computed inline (the
    tokenizer runs once per doc), partially aggregated map-side onto the
    tiny (lang × source) domain, and the grand total for the share column
    comes from RE-aggregating the grouped relation (a few rows), never
    from a second scan. The 1-row total then broadcasts back onto the
    group rows. Integer-exact sums; shares and averages are one double
    division, floor-rounded at scale 4.
    """
    from .text import tokens

    per = docs.select(
        *group_cols,
        F.length(F.col(text_col)).cast("long").alias("_chars"),
        F.size(tokens(F.col(text_col))).cast("long").alias("_toks"),
    )
    g = per.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("_chars").alias("sum_chars"),
        F.sum("_toks").alias("sum_tokens"),
    )
    total = g.agg(F.sum("n_docs").alias("_total_docs"))
    share = _dec4(
        F.col("n_docs").cast("double") / F.col("_total_docs")
    )
    return (
        g.join(F.broadcast(total))
        .select(
            *group_cols,
            "n_docs",
            share.alias("doc_share"),
            "sum_chars",
            _dec4(F.col("sum_chars").cast("double") / F.col("n_docs")).alias(
                "avg_chars"
            ),
            "sum_tokens",
            _dec4(F.col("sum_tokens").cast("double") / F.col("n_docs")).alias(
                "avg_tokens"
            ),
        )
    )


def nb_language_scores(
    docs: DataFrame,
    text_col: str = "text",
    label_col: str = "lang",
    cache_model: bool = False,
    tf: DataFrame | None = None,
    model: "tuple[DataFrame, DataFrame] | None" = None,
    model_out: dict | None = None,
) -> DataFrame:
    """Multinomial Naive Bayes language classifier, trained ON the corpus
    and applied back to it — the distributed shape of the model-based
    quality/language filters real curation pipelines run (CCNet/FineWeb
    style): a train step that reduces the corpus to a per-(class, word)
    count table, then a score step that is one join against that table.
    Returns ``(doc_id, pred_lang, score_micro, is_correct)``.

    Float discipline (the :func:`unigram_logprob` recipe): ``ln`` runs
    ONLY on the reduced class-conditional tables — Laplace-smoothed
    ``ln((cnt+1)/(tot+V))`` per (class, word), the unseen-word default
    ``ln(1/(tot+V))`` and the class prior ``ln(n_c/N)`` per class — each
    quantized to integer micro-nats at the source. Per-document scoring
    is then an exact BIGINT sum, so executor order can't drift a score
    and argmax ties break identically everywhere (higher score, then
    lexicographic class).

    Scale shape: training is two vocabulary-sized aggregates (tf →
    class counts); scoring joins the per-(doc, word) tf relation —
    document length already folded out — against the class table on
    ``w``, with the tiny per-class row (prior, default) broadcast. The
    only row multiplier is n_classes (a handful), applied to the tf
    relation, never to raw occurrences. At 100 TB: one corpus scan to
    tf, vocab-bounded shuffles after.

    ``tf`` accepts a PRECOMPUTED (doc_id, w, _tf) relation — the persisted
    write-time artifact (``build_tf_index``): the explode+count corpus
    pass is a pure function of the corpus and nb scoring consumes the tf
    relation twice (train + score), so probing the parquet artifact
    replaces two tokenize derivations with two pruned columnar reads.

    ``model`` accepts a PRECOMPUTED ``(lp, classes)`` pair — ideally the
    persisted write-time artifact (``build_nb_index``): training is a
    pure function of the corpus, so at scale it belongs at write time
    and scoring becomes ONE broadcast-join pass over the tf relation
    (the same build/probe split as the IVF/RP/k-means indexes).

    ``model_out``: pass a dict to receive the trained model —
    ``model_out["model"]`` is the ``(lp, classes)`` pair (reusable as
    ``model=`` on later calls) and ``model_out["release"]`` is a
    zero-arg callable that unpersists the ``cache_model=True``
    intermediates (a no-op otherwise). Without it a cache_model caller
    has no way to ever free the executor storage the cache pins."""
    if tf is None:
        tf = word_rows(docs, text_col).groupBy("doc_id", "w").agg(
            F.count(F.lit(1)).alias("_tf")
        )
    doc_lang = docs.select("doc_id", F.col(label_col).alias("_lang"))
    if model is not None:
        lp, classes = model
        return _nb_score(tf, doc_lang, lp, classes)
    lp, classes, handles = _nb_model(tf, doc_lang, cache_model)
    if model_out is not None:
        # hand the caller the trained relations and an explicit release
        # for the cache_model=True persists — without this the handles
        # were unreachable and executor storage stayed pinned for the
        # session (ADVICE r12)
        model_out["model"] = (lp, classes)
        model_out["release"] = lambda: [
            h.unpersist() for h in handles
        ] and None
    return _nb_score(tf, doc_lang, lp, classes)


def _nb_model(
    tf: DataFrame, doc_lang: DataFrame, cache_model: bool = False
) -> "tuple[DataFrame, DataFrame, list]":
    """The NB TRAIN step: reduce (tf, doc_lang) to the ``(lp, classes)``
    model relations.

    The TRAINED MODEL is vocab x n_classes rows — with cache_model=True
    the intermediates persist so their three consumers (class totals,
    vocab size, smoothed logprobs) share one derivation instead of each
    re-scanning the corpus through the tf chain (16 scans -> 2
    column-pruned scans + 2 tf derivations; the cached relation is the
    reduced model, never raw data, so the memory bound is the model size
    at any corpus scale). OPT-IN because the cache lives until the
    caller unpersists or the session ends (``build_nb_index`` unpersists
    after its writes). One-shot analysis jobs should pass True; services
    should persist the trained tables themselves via ``build_nb_index``
    (the build-artifact pattern)."""
    cc = (
        tf.join(doc_lang, "doc_id")
        .groupBy("_lang", "w")
        .agg(F.sum("_tf").alias("_cnt"))
    )
    priors = doc_lang.groupBy("_lang").agg(F.count(F.lit(1)).alias("_nd"))
    handles: list = []
    if cache_model:
        cc = cc.persist()
        priors = priors.persist()
        handles = [cc, priors]
    tot = cc.groupBy("_lang").agg(F.sum("_cnt").alias("_tot"))
    vocab = cc.agg(F.countDistinct("w").alias("_v"))
    # corpus total derives from the priors — no extra corpus aggregate
    n_docs = priors.agg(F.sum("_nd").alias("_n"))

    def _micro(x: F.Column) -> F.Column:
        return F.floor(F.log(x) * 1000000.0 + F.lit(0.5)).cast("long")

    classes = (
        tot.join(priors, "_lang")
        .crossJoin(F.broadcast(vocab))
        .crossJoin(F.broadcast(n_docs))
        .select(
            "_lang",
            "_tot",
            "_v",
            _micro(
                F.lit(1.0) / (F.col("_tot") + F.col("_v")).cast("double")
            ).alias("_lp0"),
            _micro(
                F.col("_nd").cast("double") / F.col("_n").cast("double")
            ).alias("_prior"),
        )
    )
    lp = cc.join(classes.select("_lang", "_tot", "_v"), "_lang").select(
        "_lang",
        "w",
        _micro(
            (F.col("_cnt") + 1).cast("double")
            / (F.col("_tot") + F.col("_v")).cast("double")
        ).alias("_lp"),
    )
    return lp, classes, handles


def _nb_score(
    tf: DataFrame, doc_lang: DataFrame, lp: DataFrame, classes: DataFrame
) -> DataFrame:
    """The NB SCORE step over a trained ``(lp, classes)`` model: one
    broadcast of the tiny per-class row, one join of the tf relation
    against the vocab×class logprob table, one map-side-partial argmax.
    Exact BIGINT micro-nat sums throughout (see nb_language_scores)."""
    scored = (
        tf.crossJoin(F.broadcast(classes.select("_lang", "_lp0", "_prior")))
        .join(lp, ["_lang", "w"], "left")
        .groupBy("doc_id", "_lang", "_prior")
        .agg(
            F.sum(
                F.col("_tf") * F.coalesce(F.col("_lp"), F.col("_lp0"))
            ).alias("_s")
        )
        .select(
            "doc_id",
            "_lang",
            (F.col("_s") + F.col("_prior")).alias("_score"),
        )
    )
    # argmax as min_by over a packed (negated-score, lang) key — ties break
    # on (score DESC, lang ASC) exactly like the oracle's ROW_NUMBER, but
    # with a map-side-partial aggregate over the docs x n_classes relation
    # instead of a per-doc sort window (scores are exact BIGINTs, so the
    # negation is lossless)
    pred = scored.groupBy("doc_id").agg(
        F.min_by(
            F.struct(F.col("_lang"), F.col("_score")),
            F.struct(
                (-F.col("_score")).alias("_k1"), F.col("_lang").alias("_k2")
            ),
        ).alias("_best")
    ).select(
        "doc_id",
        F.col("_best._lang").alias("pred_lang"),
        F.col("_best._score").cast("long").alias("score_micro"),
    )
    return pred.join(doc_lang, "doc_id").select(
        "doc_id",
        "pred_lang",
        "score_micro",
        (F.col("pred_lang") == F.col("_lang")).alias("is_correct"),
    )


def build_nb_index(
    docs: DataFrame,
    path: str,
    text_col: str = "text",
    label_col: str = "lang",
    tf: DataFrame | None = None,
) -> None:
    """BUILD STEP: train the NB model ONCE and persist both reduced
    relations — ``path/lp`` (vocab×class micro-nat logprobs) and
    ``path/classes`` (per-class prior + unseen-word default) — the same
    write-time-artifact pattern as the IVF/RP/k-means/tf indexes.
    Training reduces the corpus through ~16 tiny jobs (class counts,
    vocab size, totals, priors, three consumers of the cached model);
    at 100 TB that is a training JOB, never per-query work. Scoring then
    probes two narrow parquet tables and the query plan is one
    broadcast-join pass over the tf relation (``_nb_score``) — this cut
    the scored query's committed median from ~2.0 s to well under the
    1.5 s round-9 target. Deterministic (integer micro-nat quantization
    at the source), so the persisted model is value-identical to inline
    training and the DuckDB oracle needs no change."""
    if tf is None:
        tf = word_rows(docs, text_col).groupBy("doc_id", "w").agg(
            F.count(F.lit(1)).alias("_tf")
        )
    doc_lang = docs.select("doc_id", F.col(label_col).alias("_lang"))
    lp, classes, handles = _nb_model(tf, doc_lang, cache_model=True)
    lp.write.mode("overwrite").parquet(f"{path}/lp")
    classes.write.mode("overwrite").parquet(f"{path}/classes")
    # unpersist only THIS call's handles — a shared module-global here
    # would clobber persisted models of unrelated concurrent callers
    for df in handles:
        df.unpersist()


def load_nb_index(spark, path: str) -> "tuple[DataFrame, DataFrame]":
    """Read a persisted NB model written by ``build_nb_index``:
    returns ``(lp, classes)`` for ``nb_language_scores(model=...)``."""
    return (
        spark.read.parquet(f"{path}/lp"),
        spark.read.parquet(f"{path}/classes"),
    )


def split_drift_report(
    docs: DataFrame,
    group_cols: "list[str] | None" = None,
    train_pct: int = 80,
) -> DataFrame:
    """Dataset-shift check on the deterministic train/eval split: per
    (lang, source) slice, each side's share of its split in permille and
    the absolute drift between the shares — the data-card number that
    catches a skewed holdout (a hash split should drift only by sampling
    noise; a systematic gap means the id space correlates with the
    slice). One corpus scan — the split decision is ``text.split_expr``,
    a map-only expression in the same projection, never a self-join —
    then one slice-sized aggregate; the per-split totals ride a
    broadcast join of a 2-row relation."""
    from .text import split_expr

    group_cols = list(group_cols or ["lang", "source"])
    tagged = docs.select(
        *group_cols, split_expr(train_pct=train_pct).alias("split")
    )
    per_slice = tagged.groupBy(*group_cols).agg(
        F.sum(F.when(F.col("split") == "train", 1).otherwise(0)).alias(
            "_n_train"
        ),
        F.sum(F.when(F.col("split") == "eval", 1).otherwise(0)).alias(
            "_n_eval"
        ),
    )
    # bounded global window: totals over the per-SLICE aggregate
    # (|lang x source| rows, never documents) — deriving them via a
    # second agg would re-scan the corpus (two consumers of per_slice)
    w_all = Window.partitionBy(F.lit(1))
    with_tot = per_slice.withColumn(
        "_t_train", F.sum("_n_train").over(w_all)
    ).withColumn("_t_eval", F.sum("_n_eval").over(w_all))
    # t=0 guard: a degenerate corpus whose eval (or train) side is empty
    # must report share 0, not inf (Spark) vs a division error (DuckDB)
    share = lambda n, t: F.when(  # noqa: E731
        t > 0, F.floor(n.cast("double") * 1000 / t)
    ).otherwise(F.lit(0)).cast("long")
    return with_tot.select(
        *group_cols,
        F.col("_n_train").cast("long").alias("n_train"),
        F.col("_n_eval").cast("long").alias("n_eval"),
        share(F.col("_n_train"), F.col("_t_train")).alias(
            "train_share_permille"
        ),
        share(F.col("_n_eval"), F.col("_t_eval")).alias(
            "eval_share_permille"
        ),
        F.abs(
            share(F.col("_n_train"), F.col("_t_train"))
            - share(F.col("_n_eval"), F.col("_t_eval"))
        ).cast("long").alias("drift_permille"),
    )


def zipf_slope(
    docs: DataFrame, text_col: str = "text", top_n: int = 100
) -> DataFrame:
    """Zipf power-law fit over the top-``top_n`` word frequencies: the
    least-squares slope of ln(freq) on ln(rank) — the corpus-health
    number reviewers eyeball (natural text sits near -1; template spam
    and vocabulary collapse bend it). One row out: slope, intercept, n.

    Float discipline: ln runs only on the ranked top-N count table and
    is quantized to integer micro-nats there; the per-point moments
    (Σx, Σy, Σxy, Σx²) accumulate as exact int64 sums (bounded: top_n ≤
    ~200 keeps Σxy < 2^63 even at astronomic counts), their FINAL
    combinations (n·Σxy − Σx·Σy etc.) run in DECIMAL(38,0) — at 100 TB
    word counts the int64 products already sit at ~7e18 of the 9.2e18
    range, so decimal keeps the overflow headroom explicit instead of
    one corpus-doubling away — and the slope/intercept are two double
    divisions rendered at 4 decimals. The rank window is bounded global
    (vocabulary-sized input, top-N output) — the documented 'No
    Partition Defined' fold.

    ``top_n`` is ENFORCED <= 200 (not just documented): it bounds the
    int64 per-point moment sums, and a degenerate corpus (fewer than two
    distinct ranked points) yields NULL slope/intercept in both engines
    rather than an engine-dependent 0/0."""
    if top_n > 200:
        raise ValueError(
            f"top_n={top_n} exceeds the int64-exact moment bound (200)"
        )
    wc = word_rows(docs, text_col).groupBy("w").agg(
        F.count(F.lit(1)).alias("_cnt")
    )
    # bounded global window: ranks the WORD-COUNT relation (vocabulary-
    # sized) and keeps top_n rows
    ranked = (
        wc.withColumn(
            "_r",
            F.row_number().over(
                Window.partitionBy(F.lit(1)).orderBy(
                    F.desc("_cnt"), F.col("w")
                )
            ),
        )
        .filter(F.col("_r") <= top_n)
    )
    micro = lambda c: F.floor(  # noqa: E731
        F.log(c.cast("double")) * 1000000.0 + F.lit(0.5)
    ).cast("long")
    pts = ranked.select(
        micro(F.col("_r")).alias("_x"), micro(F.col("_cnt")).alias("_y")
    )
    mom = pts.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("_x").alias("_sx"),
        F.sum("_y").alias("_sy"),
        F.sum(F.col("_x") * F.col("_y")).alias("_sxy"),
        F.sum(F.col("_x") * F.col("_x")).alias("_sxx"),
    )
    # final moment combinations in DECIMAL(38,0): the int64 sums are exact
    # by the top_n <= 200 guard, but their products (n·Σxy, Σx·Σy) sit at
    # ~7e18 of the 9.2e18 int64 range at 100 TB word counts — a corpus a
    # few orders larger would wrap SILENTLY under non-ANSI long math.
    # Decimal keeps ~1e38 of explicit headroom; the values are identical
    # (exact integers either way), so the double renderings can't drift.
    d38 = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    num = d38(F.col("_n")) * d38(F.col("_sxy")) - d38(F.col("_sx")) * d38(
        F.col("_sy")
    )
    den = d38(F.col("_n")) * d38(F.col("_sxx")) - d38(F.col("_sx")) * d38(
        F.col("_sx")
    )
    slope = num.cast("double") / den.cast("double")
    # intercept in micro-nats back to nats: (Σy - slope·Σx) / (n·1e6)
    intercept = (
        F.col("_sy").cast("double") - slope * F.col("_sx").cast("double")
    ) / (F.col("_n").cast("double") * 1000000.0)
    dec4 = lambda c: (F.floor(c * 10000 + F.lit(0.5)) / 10000).cast(  # noqa: E731
        "double"
    )
    guard = lambda c: F.when(F.col("_den") != 0, dec4(c))  # noqa: E731
    return mom.withColumn("_den", den).select(
        F.col("_n").cast("long").alias("n_points"),
        guard(slope).alias("slope"),
        guard(intercept).alias("intercept_ln"),
    )


def shingle_novelty(
    docs: DataFrame, text_col: str = "text", shingle_k: int = 3
) -> DataFrame:
    """Per-document NOVELTY score: the fraction of a doc's distinct
    k-shingles whose GLOBAL first occurrence (min doc id over the corpus)
    is this document — the curation signal between exact dedup (whole-doc
    identity) and near-dup clustering (high pairwise overlap): a document
    can evade both while contributing almost nothing new (boilerplate
    stitched from earlier docs scores ~0; genuinely fresh text scores
    ~1). Training-mixture builders weight by it; memorization audits
    read it in reverse (low-novelty docs are the ones a model has
    effectively already seen).

    Plan shape at 100 TB: ONE distinct (doc, shingle) explode (the exact
    relation the minhash pipeline already stages), consumed ONCE — the
    global first-occurrence is a whole-partition ``min(doc_id)`` window
    keyed on the shingle, so the big relation shuffles on ``sh`` exactly
    once and flows straight into the per-doc fold (second shuffle, on
    ``doc_id``). The r15 formulation (groupBy-min + join back) consumed
    the exploded subtree twice — its two consumers shuffled it
    identically but the aggregate was folded into one side, so AQE had
    no identical exchange to reuse; at 100 TB that was 2× the biggest
    scan+explode in the query (r15 verdict ask #3; plan-pinned in
    tests/test_plan_quality.py: one Generate, no join). Window-group
    size is docs-per-shingle — a boilerplate shingle shared by millions
    of docs lands one task, the same key-skew a join on ``sh`` has, and
    WindowExec spills; the trade buys back a full execution of the
    dominant stage. min(doc_id) as "first" is the corpus-order-free
    tiebreak (same rule the dedup keeper uses), so the score is
    deterministic under any partitioning.

    Emits (doc_id, n_shingles, n_first_here, novelty). Docs shorter
    than k words contribute their whole text as one short shingle (the
    minhash pipeline's shingle semantics, shared via
    ``exploded_shingles`` so the two can never disagree)."""
    sh = exploded_shingles(docs, text_col, shingle_k)
    first = F.min("doc_id").over(Window.partitionBy("sh"))
    per_doc = (
        sh.select("doc_id", first.alias("_first"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(
                F.when(F.col("doc_id") == F.col("_first"), 1).otherwise(0)
            ).alias("n_first_here"),
        )
    )
    frac = (
        F.col("n_first_here").cast("double")
        / F.col("n_shingles").cast("double")
    )
    return per_doc.select(
        "doc_id",
        F.col("n_shingles").cast("long").alias("n_shingles"),
        F.col("n_first_here").cast("long").alias("n_first_here"),
        _dec4(frac).alias("novelty"),
    )
