"""PII detection + redaction for training-corpus curation.

Standard public patterns (emails, IPv4 addresses, phone-like digit
runs) replaced by typed placeholder tokens — the common pre-training
privacy scrub. Everything is JVM-side `regexp_replace` /
`regexp_extract_all`; the patterns avoid lookaround and backreferences
so RE2-based engines (the DuckDB oracle) match Java's semantics
exactly (both use leftmost, greedy quantifiers).

Order matters and is part of the contract: emails are redacted first,
then IPv4, then phones, each stage operating on the previous stage's
output — so an IPv4 never double-counts as a phone-like digit run,
and the per-kind counts (`n_email`, `n_ipv4`, `n_phone`) are the
number of replacements each stage actually made.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (kind, pattern, placeholder) — applied in this order. The phone
# pattern requires the 1-3 / 3 / 3 / 2-4 digit-group shape with at most
# two separator chars between groups (space, dot, dash, parens — never
# \s, so a match can't span lines), which leaves ISO dates
# (2024-01-01: no 3-digit group follows a separator) and bare digit runs
# shorter than 8 unmatched.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IPV4>"),
    (
        "phone",
        r"(?:\+?[0-9]{1,3}[-. (]{0,2})?[0-9]{3}[-. )]{0,2}[0-9]{3}[-. ]{0,2}[0-9]{2,4}",
        "<PHONE>",
    ),
)


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    out_col: str | None = None,
    with_counts: bool = True,
) -> DataFrame:
    """Adds `out_col` (default: `<text_col>_redacted`) with all PII
    kinds replaced by their placeholders, plus per-kind match counts
    (n_email, n_ipv4, n_phone) when `with_counts`."""
    out_col = out_col or f"{text_col}_redacted"
    # NULL text behaves as '' (counts 0, redacted ''), not as NULL
    # poisoning every downstream expression
    cur = F.coalesce(F.col(text_col), F.lit(""))
    counts = {}
    for kind, pat, token in PII_PATTERNS:
        if with_counts:
            counts[f"n_{kind}"] = F.size(
                F.regexp_extract_all(cur, F.lit(pat), 0)
            ).cast("long")
        cur = F.regexp_replace(cur, pat, token)
    out = df.withColumn(out_col, cur)
    for name, col in counts.items():
        out = out.withColumn(name, col)
    return out
