"""Web-corpus curation operators: URL canonicalization, URL-level
dedup, and per-domain corpus statistics.

A Common-Crawl-style pipeline (the BASELINE input_hint payload) sees
the same page fetched under many URL spellings — uppercased scheme or
host, explicit default ports, tracking query parameters, fragments.
Canonicalizing before URL-level dedup is the standard first pass of a
web training-data pipeline (ahead of content MinHash in
`dedup.py`), and per-domain stats drive domain-level filtering and
sampling decisions.

Everything here is a pure built-in column expression — no UDF, no
Python on the hot path — deliberately restricted to string functions
whose semantics are identical in Spark SQL and DuckDB (split_part /
substring / lower / regexp_replace WITHOUT backreferences) so the
driver's oracle comparison can re-run the exact arithmetic. The
equivalent SQL fragments are kept adjacent (``CANONICAL_SQL`` /
``HOST_SQL``) so the two can't drift.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _canonical_expr(u: Column) -> Column:
    """scheme-lowered, host-lowered, default-port-stripped,
    fragment-stripped, utm_*-tracking-param-stripped URL."""
    no_frag = F.split_part(u, F.lit("#"), F.lit(1))
    # drop utm_* tracking params while preserving any others:
    # pass 1 removes "utm_x=y&" (non-final param), pass 2 removes a
    # final "?utm_x=y" / "&utm_x=y" together with its separator.
    t1 = F.regexp_replace(no_frag, "utm_[^&]*&", "")
    t2 = F.regexp_replace(t1, "[?&]utm_[^&]*$", "")
    scheme_raw = F.split_part(t2, F.lit("://"), F.lit(1))
    scheme = F.lower(scheme_raw)
    after = F.substring(t2, F.length(scheme_raw) + 4, F.lit(2147483647))
    authority = F.split_part(after, F.lit("/"), F.lit(1))
    rest = F.substring(after, F.length(authority) + 1, F.lit(2147483647))
    auth_lc = F.lower(authority)
    auth_np = (
        F.when(
            (scheme == "https") & auth_lc.endswith(":443"),
            F.substring(auth_lc, 1, F.length(auth_lc) - 4),
        )
        .when(
            (scheme == "http") & auth_lc.endswith(":80"),
            F.substring(auth_lc, 1, F.length(auth_lc) - 3),
        )
        .otherwise(auth_lc)
    )
    return F.concat(scheme, F.lit("://"), auth_np, rest)


def _host_expr(u: Column) -> Column:
    """Lowercased host of the canonical URL: authority minus port
    minus a leading ``www.`` label."""
    canon = _canonical_expr(u)
    after = F.substring(
        canon,
        F.length(F.split_part(canon, F.lit("://"), F.lit(1))) + 4,
        F.lit(2147483647),
    )
    authority = F.split_part(after, F.lit("/"), F.lit(1))
    host = F.split_part(authority, F.lit(":"), F.lit(1))
    return F.when(
        host.startswith("www."), F.substring(host, 5, F.lit(2147483647))
    ).otherwise(host)


# DuckDB-portable SQL for the same arithmetic, parameterized on the URL
# expression. Kept adjacent to the Column versions above; the gate
# oracles in __spark_entry__ compose these.
CANONICAL_SQL = """
(WITH s AS (SELECT
    regexp_replace(
      regexp_replace(split_part({u}, '#', 1), 'utm_[^&]*&', ''),
      '[?&]utm_[^&]*$', '') AS t2)
 SELECT lower(split_part(t2, '://', 1)) || '://' ||
   CASE
     WHEN lower(split_part(t2, '://', 1)) = 'https'
          AND lower(split_part(substring(t2, length(split_part(t2, '://', 1)) + 4), '/', 1)) LIKE '%:443'
     THEN left(lower(split_part(substring(t2, length(split_part(t2, '://', 1)) + 4), '/', 1)),
               length(split_part(substring(t2, length(split_part(t2, '://', 1)) + 4), '/', 1)) - 4)
     WHEN lower(split_part(t2, '://', 1)) = 'http'
          AND lower(split_part(substring(t2, length(split_part(t2, '://', 1)) + 4), '/', 1)) LIKE '%:80'
     THEN left(lower(split_part(substring(t2, length(split_part(t2, '://', 1)) + 4), '/', 1)),
               length(split_part(substring(t2, length(split_part(t2, '://', 1)) + 4), '/', 1)) - 3)
     ELSE lower(split_part(substring(t2, length(split_part(t2, '://', 1)) + 4), '/', 1))
   END ||
   substring(substring(t2, length(split_part(t2, '://', 1)) + 4),
             length(split_part(substring(t2, length(split_part(t2, '://', 1)) + 4), '/', 1)) + 1)
 FROM s)
"""


def canonicalize_url(
    df: DataFrame, url_col: str = "url", out: str = "canonical_url"
) -> DataFrame:
    """Adds the canonical form of ``url_col`` (see `_canonical_expr`)."""
    return df.withColumn(out, _canonical_expr(F.col(url_col)))


def host_of(df: DataFrame, url_col: str = "url", out: str = "host") -> DataFrame:
    """Adds the lowercased, ``www.``-stripped host of ``url_col``."""
    return df.withColumn(out, _host_expr(F.col(url_col)))


def url_dedup(
    df: DataFrame,
    key_col: str,
    url_col: str = "url",
) -> DataFrame:
    """URL-level exact dedup after canonicalization.

    Adds ``canonical_url``, ``url_group`` (the min key sharing the
    canonical URL — the retained representative) and ``is_url_dup``.
    Same skew-free hash-keyed window shape as `dedup.exact_dedup`:
    one shuffle on the canonical URL; no key is hotter than its true
    duplicate count, so this holds at 10^12 rows.
    """
    out = canonicalize_url(df, url_col)
    w = Window.partitionBy("canonical_url")
    return out.withColumn("url_group", F.min(key_col).over(w)).withColumn(
        "is_url_dup", F.col(key_col) != F.col("url_group")
    )


def domain_stats(
    df: DataFrame,
    url_col: str = "url",
    text_col: str | None = "text",
) -> DataFrame:
    """Per-domain corpus statistics: doc count, total/mean text chars.

    One partial/final hash aggregation on the host — the shape that
    survives a 100 TB corpus (domains are Zipfian but the map-side
    combine absorbs the hot ones; no window, no collect).
    """
    with_host = host_of(df, url_col)
    aggs = [F.count(F.lit(1)).alias("doc_count")]
    if text_col is not None:
        aggs += [
            F.sum(F.length(F.col(text_col))).alias("total_chars"),
            F.avg(F.length(F.col(text_col))).alias("mean_chars"),
        ]
    return with_host.groupBy("host").agg(*aggs)
