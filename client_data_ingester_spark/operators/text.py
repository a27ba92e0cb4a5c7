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


def identify_language(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Stopword-hit lang-id: argmax of per-language stopword counts; ties go
    to the alphabetically-first language; zero hits → 'und' (undetermined)."""
    scores = lang_scores(F.col(text_col))
    langs = sorted(scores)  # deterministic tie-break: alphabetical
    best = None
    best_score = None
    for lang in langs:
        s = scores[lang]
        if best is None:
            best, best_score = F.lit(lang), s
        else:
            cond = s > best_score
            best = F.when(cond, F.lit(lang)).otherwise(best)
            best_score = F.when(cond, s).otherwise(best_score)
    pred = F.when(best_score > 0, best).otherwise(F.lit("und"))
    return docs.select(
        "doc_id",
        *[scores[lang].alias(f"hits_{lang}") for lang in langs],
        pred.alias("pred_lang"),
    )


def quality_scores(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic doc-quality features + composite score.

    Features (all deterministic, SQL-portable):
    - n_chars, n_words, mean word length
    - punct_ratio: punctuation chars / chars
    - digit_ratio: digit chars / chars
    - stop_ratio: english-stopword tokens / tokens
    - score: 0..1 composite (word-length sweet spot + low punct/digit noise)
    """
    t = F.col(text_col)
    toks = tokens(t)
    n_chars = F.length(t)
    n_words = F.size(toks)
    mean_wlen = F.when(n_words > 0, (
        F.aggregate(toks, F.lit(0), lambda acc, w: acc + F.length(w))
        .cast("double") / n_words
    )).otherwise(F.lit(0.0))
    n_punct = F.length(t) - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    n_digit = F.length(t) - F.length(F.regexp_replace(t, r"[0-9]", ""))
    punct_ratio = F.when(n_chars > 0, n_punct.cast("double") / n_chars).otherwise(0.0)
    digit_ratio = F.when(n_chars > 0, n_digit.cast("double") / n_chars).otherwise(0.0)
    en = LANG_STOPWORDS["en"]
    n_stop = F.size(F.filter(toks, lambda w: w.isin(*en)))
    stop_ratio = F.when(n_words > 0, n_stop.cast("double") / n_words).otherwise(0.0)
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
    return docs.select(
        "doc_id",
        n_chars.alias("n_chars"),
        n_words.alias("n_words"),
        dec(mean_wlen).alias("mean_word_len"),
        dec(punct_ratio).alias("punct_ratio"),
        dec(digit_ratio).alias("digit_ratio"),
        dec(stop_ratio).alias("stop_ratio"),
        dec(score).alias("quality_score"),
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
    from .dedup import md5_int

    bucket = md5_int(F.col(id_col).cast("string")) % 100
    return docs.select(
        F.col(id_col),
        bucket.cast("int").alias("bucket"),
        F.when(bucket < train_pct, F.lit("train"))
        .otherwise(F.lit("eval"))
        .alias("split"),
    )


def quality_stratified_topk(docs: DataFrame, k: int = 50) -> DataFrame:
    """Top-k docs per detected language by quality score — the quality/
    curriculum filtering shape (keep the best k of every stratum, so
    low-resource languages aren't crowded out by the dominant one). One
    shuffle on pred_lang for the rank window; at corpus scale k≪stratum
    so WindowGroupLimit prunes per partition before the sort."""
    lang = identify_language(docs).select("doc_id", "pred_lang")
    qual = quality_scores(docs).select("doc_id", "quality_score")
    w = Window.partitionBy("pred_lang").orderBy(
        F.desc("quality_score"), F.col("doc_id")
    )
    return (
        lang.join(qual, "doc_id")
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("doc_id", "pred_lang", "quality_score", "rnk")
    )
