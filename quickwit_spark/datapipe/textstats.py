"""Text analysis for corpus curation: token stats, quality scoring,
language-ID heuristic, document fingerprinting.

All built-in JVM expressions (split/size/filter/aggregate) — these run
at scan speed and fold into whatever projection the pipeline already
does; no UDF, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny stopword sets for the language-ID heuristic (top function words)
STOPWORDS = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu", "den"),
    "fr": ("le", "la", "les", "de", "et", "un", "une", "est", "que", "pour"),
}


def _tokens(col: Column) -> Column:
    return F.filter(F.split(F.lower(col), r"\s+"), lambda t: t != "")


def token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds (token_count, uniq_tokens, uniq_ratio, mean_token_len)."""
    toks = _tokens(F.col(text_col))
    n = F.size(toks)
    total_len = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )
    return (
        df.withColumn("token_count", n.cast("long"))
        .withColumn("uniq_tokens", F.size(F.array_distinct(toks)).cast("long"))
        .withColumn(
            "uniq_ratio",
            F.when(n > 0, F.col("uniq_tokens") / n).otherwise(F.lit(0.0)).cast("double"),
        )
        .withColumn(
            "mean_token_len",
            F.when(n > 0, total_len / n).otherwise(F.lit(0.0)).cast("double"),
        )
    )


# GPT-2-style pre-tokenization pattern (public, from the GPT-2 BPE
# paper/code): contractions, letter runs, digit runs, punctuation runs.
# Counting these pieces approximates BPE token counts ~piece-for-piece
# on English text without needing a merges table. (The original's
# trailing-whitespace lookahead is dropped — whitespace-only pieces are
# not counted anyway, and RE2-based engines lack lookahead.)
BPE_PRETOKEN_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+"


def bpe_token_count(df: DataFrame, text_col: str = "text", out: str = "bpe_tokens") -> DataFrame:
    """Approximate BPE token count via the GPT-2 pre-tokenizer regex —
    JVM-side regexp extraction, no Python. A real tokenizer's merges
    only split these pieces further, so this is a stable lower bound
    used for corpus token budgeting."""
    matches = F.regexp_extract_all(
        F.col(text_col), F.lit(f"({BPE_PRETOKEN_RE})"), 1
    )
    return df.withColumn(out, F.size(matches).cast("long"))


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality in [0,1] (C4/Gopher-style cheap filters):
    penalizes very short docs, low vocabulary diversity, and
    non-alphabetic character excess. Adds (alpha_ratio, quality)."""
    df = token_stats(df, text_col)
    txt = F.col(text_col)
    alpha = F.length(F.regexp_replace(txt, r"[^A-Za-z ]", ""))
    alpha_ratio = F.when(
        F.length(txt) > 0, alpha / F.length(txt)
    ).otherwise(F.lit(0.0))
    length_term = F.least(F.col("token_count") / F.lit(50.0), F.lit(1.0))
    quality = (
        length_term * F.lit(0.4)
        + F.least(F.col("uniq_ratio") * 2, F.lit(1.0)) * F.lit(0.3)
        + F.least(alpha_ratio * 1.25, F.lit(1.0)) * F.lit(0.3)
    )
    return df.withColumn("alpha_ratio", alpha_ratio.cast("double")).withColumn(
        "quality", quality.cast("double")
    )


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-vote language ID: per language, the fraction of tokens
    in its stopword set; winner if its score ≥ 2× runner-up and > 0,
    else 'und'. Adds (lang_pred, lang_score)."""
    toks = _tokens(F.col(text_col))
    n = F.greatest(F.size(toks), F.lit(1))
    scores = {
        lang: F.size(F.filter(toks, lambda t: t.isin(*words))) / n
        for lang, words in STOPWORDS.items()
    }
    langs = sorted(scores)
    arr = F.array(
        *[F.struct(scores[lg].alias("s"), F.lit(lg).alias("lg")) for lg in langs]
    )
    best = F.array_max(arr)
    runner = F.array_max(F.array_remove(arr, best))
    pred = F.when(
        (best["s"] > 0) & (best["s"] >= runner["s"] * 2), best["lg"]
    ).otherwise(F.lit("und"))
    return df.withColumn("lang_pred", pred).withColumn(
        "lang_score", best["s"].cast("double")
    )


def fingerprint(df: DataFrame, text_col: str = "text", out: str = "fingerprint") -> DataFrame:
    """Order-sensitive 64-bit document fingerprint: xxhash64 folded over
    the token stream (rolling-hash style; reordered or edited token
    streams change it, unlike a bag-of-words hash)."""
    toks = _tokens(F.col(text_col))
    fp = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: F.xxhash64(acc, t),
    )
    return df.withColumn(out, fp)


def fingerprint_portable(
    df: DataFrame, text_col: str = "text", out: str = "fingerprint"
) -> DataFrame:
    """Engine-portable variant (same value computable in ANSI SQL):
    Σ position·v(token) with v = 4861·len + 31·ascii(first) +
    ascii(last) — weaker than xxhash64 but expressible in any engine,
    which is what the correctness oracle needs."""
    toks = _tokens(F.col(text_col))
    n = F.size(toks)
    val = lambda t: (  # noqa: E731
        F.length(t) * 4861
        + F.ascii(F.substring(t, 1, 1)) * 31
        + F.ascii(F.substring(t, -1, 1))
    ).cast("long")
    fp = F.aggregate(
        F.zip_with(
            toks,
            F.sequence(F.lit(1), F.greatest(n, F.lit(1))),
            lambda t, i: i.cast("long") * val(t),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    return df.withColumn(out, F.when(n > 0, fp).otherwise(F.lit(0)))
