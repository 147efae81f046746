"""Text-analysis operators for training-data pipelines.

Beyond-reference operators (BASELINE.json north star): token statistics,
quality scoring, n-gram language identification, and rolling-hash document
fingerprinting. Everything is built from JVM-side string/array expressions
(split, filter, transform, aggregate) — no Python UDFs in the hot path —
so the operators run inside whole-stage codegen at corpus scale and every
one has an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from qudo_etl_pipeline_spark.operators.dedup import _hash64_frag

STOPWORDS = {
    "en": ["the", "a", "of", "and", "in", "to", "is"],
    "es": ["el", "la", "de", "y", "en", "que", "es"],
    "de": ["der", "die", "das", "und", "in", "zu", "ist"],
    "fr": ["le", "la", "de", "et", "en", "que", "est"],
}


def token_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document token counts and type-token ratio."""
    toks = F.split(F.col(text_col), " ")
    n_tokens = F.size(toks)
    n_unique = F.size(F.array_distinct(toks))
    return df.select(
        F.col(id_col),
        n_tokens.cast("bigint").alias("n_tokens"),
        n_unique.cast("bigint").alias("n_unique_tokens"),
        F.round(n_unique / n_tokens, 6).alias("type_token_ratio"),
        F.length(text_col).cast("bigint").alias("n_chars"),
    )


# BPE-style pre-tokenization: letter runs, short digit groups (BPE vocabs
# split long numbers), punctuation runs. Alternation branches match
# disjoint character classes, so Java regex (Spark) and RE2 (DuckDB)
# produce identical tokenizations.
BPE_TOKEN_PATTERN = "[A-Za-z]+|[0-9]{1,3}|[^A-Za-z0-9 ]+"


def bpe_token_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """LLM-corpus token estimates: BPE-ish regex tokens vs whitespace.

    The regex count approximates what a byte-pair tokenizer's
    pre-tokenizer yields (words, <=3-digit number groups, punctuation
    runs) — the standard cheap token-budget estimate for a pretraining
    corpus. Pure column expressions; chars_per_token is the usual
    compression diagnostic.
    """
    bpe = F.expr(f"regexp_extract_all({text_col}, '{BPE_TOKEN_PATTERN}', 0)")
    n_bpe = F.size(bpe)
    n_ws = F.size(F.split(F.col(text_col), " "))
    # try_divide: a whitespace-only document has zero BPE tokens, and a
    # plain / would throw DIVIDE_BY_ZERO under ANSI mode (on by default)
    return df.select(
        F.col(id_col),
        n_bpe.cast("bigint").alias("n_bpe_tokens"),
        n_ws.cast("bigint").alias("n_ws_tokens"),
        F.round(F.try_divide(F.length(text_col), n_bpe), 6).alias(
            "chars_per_token"
        ),
    )


def _stopword_count(text_col: str, words: list[str]) -> Column:
    lst = ", ".join(f"'{w}'" for w in words)
    return F.expr(f"size(filter(split({text_col}, ' '), t -> t in ({lst})))")


def quality_exprs(text_col: str = "text") -> dict[str, Column]:
    """The quality-feature column expressions, reusable by any caller
    (quality_score's output frame, the corpus-curation gate)."""
    toks = F.split(F.col(text_col), " ")
    n_tokens = F.size(toks)
    n_chars = F.length(text_col)
    alpha_chars = n_chars - (n_tokens - 1)  # chars excluding single spaces
    stop = _stopword_count(text_col, STOPWORDS["en"])
    stop_ratio = F.round(stop / n_tokens, 6)
    awl = F.round(alpha_chars / n_tokens, 6)
    score = F.round(
        F.when(n_tokens < 5, 0.0).otherwise(
            F.least(F.lit(1.0), stop_ratio * 2 + F.lit(0.5))
            * F.least(F.lit(1.0), n_tokens / F.lit(50.0))
        ),
        6,
    )
    return {
        "n_tokens": n_tokens.cast("bigint"),
        "avg_word_len": awl,
        "stopword_ratio": stop_ratio,
        "quality_score": score,
    }


def quality_score(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Heuristic quality features: length, word length, stopword density.

    Mirrors the standard pretraining-corpus filters (length bounds,
    stopword ratio, symbol ratio) in pure column arithmetic.
    """
    ex = quality_exprs(text_col)
    return df.select(
        F.col(id_col), *[c.alias(name) for name, c in ex.items()]
    )


def langid_pred(text_col: str = "text") -> Column:
    """The stopword-vote language prediction as one column expression
    (deterministic argmax: score desc, lang asc; 'und' when all zero...
    all scores are >= 0 so the first sorted language wins an all-zero
    tie — identical semantics to langid_heuristic's loop)."""
    scores = {
        lang: _stopword_count(text_col, words)
        for lang, words in STOPWORDS.items()
    }
    pred = F.lit("und")
    best = F.lit(-1)
    for lang in sorted(STOPWORDS):
        s = scores[lang]
        pred = F.when(s > best, F.lit(lang)).otherwise(pred)
        best = F.when(s > best, s).otherwise(best)
    return pred


def langid_heuristic(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """Stopword-vote language ID with deterministic argmax (score desc, lang asc)."""
    scores = {
        lang: _stopword_count(text_col, words) for lang, words in STOPWORDS.items()
    }
    langs = sorted(STOPWORDS)  # tie-break order
    pred = langid_pred(text_col)
    return df.select(
        F.col(id_col),
        *[scores[lang].cast("bigint").alias(f"score_{lang}") for lang in langs],
        pred.alias("pred_lang"),
        F.col(lang_col).alias("claimed_lang"),
        F.when(pred == F.col(lang_col), F.lit(1)).otherwise(F.lit(0))
        .cast("bigint")
        .alias("is_match"),
    )


def doc_fingerprint(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    shingle: int = 3,
) -> DataFrame:
    """Rolling word-shingle fingerprint: min hash over 3-gram shingles.

    Documents sharing a fingerprint are near-dup candidates (a 1-hash
    MinHash over shingles). Short docs (< shingle words) fall back to the
    whole-text hash.
    """
    toks = f"split({text_col}, ' ')"
    grams = (
        f"transform(sequence(0, size({toks}) - {shingle}), i -> "
        f"concat_ws(' ', slice({toks}, i + 1, {shingle})))"
    )
    fp = (
        f"case when size({toks}) >= {shingle} then "
        f"array_min(transform({grams}, g -> {_hash64_frag('g', 7)})) "
        f"else {_hash64_frag(text_col, 7)} end"
    )
    return df.select(F.col(id_col), F.expr(fp).alias("fingerprint"))
