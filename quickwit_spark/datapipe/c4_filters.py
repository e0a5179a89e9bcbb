"""C4-style line cleaning + page filters (Raffel et al. 2020, §2.2).

The public C4 recipe ("Exploring the Limits of Transfer Learning with a
Unified Text-to-Text Transformer", JMLR 2020; reference implementation
`tensorflow_datasets` `c4_utils.py`) cleans Common-Crawl pages with
line-level rules, then drops whole pages by content rules:

line level (a line is kept only if ALL hold; lines are stripped first):
  - ends in a terminal punctuation mark (``.``, ``!``, ``?``, ``"``)
  - has at least ``min_words`` words (default 5)
  - does not contain the word "javascript" (case-insensitive)
  - does not contain a cookie/policy boilerplate phrase
    (``POLICY_SUBSTRINGS``, from the public implementation)

page level (the page is dropped if ANY holds):
  - raw page contains "lorem ipsum" (case-insensitive)
  - raw page contains a curly brace ``{`` (code, not prose)
  - cleaned page has fewer than ``min_sentences`` sentences —
    here "sentence" is deterministically the count of ``.!?`` marks in
    the cleaned text (C4 proper uses an NLTK sentence tokenizer; a
    library tokenizer is neither available nor reproducible in SQL, so
    this engine pins the terminal-mark count and documents it)
  - any blocklist phrase appears (``blocklist`` param; C4 uses the
    public "bad words" list, not shipped here — pass your own)

The reference engine (`/root/reference`) has no analog; this belongs to
the training-data curation surface next to `gopher_quality` /
`repetition`. Everything is pure Column expressions — higher-order
array functions on the line array plus regexes — so at 100 TB the stage
runs inside the scan/projection with no shuffle and no Python. The
DuckDB oracle in `__spark_entry__` mirrors every rule 1:1
(`list_filter` lambda + RE2 regexes).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# from the public c4_utils.py (badwords aside, which isn't shipped)
POLICY_SUBSTRINGS: tuple[str, ...] = (
    "terms of use",
    "privacy policy",
    "cookie policy",
    "uses cookies",
    "use of cookies",
    "use cookies",
)
END_MARKS: tuple[str, ...] = (".", "!", "?", '"')


def _keep_line(
    line: Column, min_words: int, policy_substrings: tuple[str, ...]
) -> Column:
    """Keep-predicate over an already-trimmed line."""
    lower = F.lower(line)
    cond = line.rlike('[.!?"]$')
    cond &= F.size(F.split(line, "[ \t]+")) >= min_words
    cond &= ~lower.contains("javascript")
    for phrase in policy_substrings:
        cond &= ~lower.contains(phrase)
    return cond


def c4_clean_lines(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "text_clean",
    *,
    min_words: int = 5,
    policy_substrings: tuple[str, ...] = POLICY_SUBSTRINGS,
) -> DataFrame:
    """Line-level C4 clean: `out_col` = the kept (stripped) lines
    re-joined with newlines. Pure Column expressions, no shuffle."""
    trimmed = F.transform(F.split(F.col(text_col), "\n"), F.trim)
    kept = F.filter(
        trimmed, lambda l: _keep_line(l, min_words, policy_substrings)
    )
    return df.withColumn(out_col, F.array_join(kept, "\n"))


def c4_page_predicate(
    raw: Column,
    cleaned: Column,
    *,
    min_sentences: int = 3,
    blocklist: tuple[str, ...] | None = None,
) -> Column:
    """True for pages C4 keeps (lorem-ipsum / brace / sentence-count /
    blocklist rules)."""
    lower_raw = F.lower(raw)
    keep = ~lower_raw.contains("lorem ipsum")
    keep &= ~raw.contains("{")
    keep &= F.regexp_count(cleaned, F.lit("[.!?]")) >= min_sentences
    for phrase in blocklist or ():
        keep &= ~lower_raw.contains(phrase.lower())
    return keep


def c4_filter(
    df: DataFrame,
    text_col: str = "text",
    *,
    min_words: int = 5,
    min_sentences: int = 3,
    policy_substrings: tuple[str, ...] = POLICY_SUBSTRINGS,
    blocklist: tuple[str, ...] | None = None,
) -> DataFrame:
    """Full C4 clean: line rules rewrite `text_col` in place, page rules
    drop rows. Returns the input schema (text cleaned)."""
    orig = df.columns
    cleaned = c4_clean_lines(
        df,
        text_col,
        "_c4_clean",
        min_words=min_words,
        policy_substrings=policy_substrings,
    )
    kept = cleaned.filter(
        c4_page_predicate(
            F.col(text_col),
            F.col("_c4_clean"),
            min_sentences=min_sentences,
            blocklist=blocklist,
        )
    )
    return (
        kept.drop(text_col)
        .withColumnRenamed("_c4_clean", text_col)
        .select(*orig)
    )
