"""Driver contract for the spark-graft builder (PySpark target).

Exposes the quickwit_spark engine (SURVEY.md §2 operator inventory) as
driver-checkable queries. Each `queries()` entry builds (once, cached)
a full inverted index over the web corpus derived from
`documents.parquet`, runs the engine's Spark plan, and returns a
DataFrame; the matching `oracle_sql()` entry re-derives the same answer
in pure ANSI SQL (DuckDB) — including the full BM25 formula
(idf = ln(1+(N-df+0.5)/(df+0.5)), tf-norm with k1=1.2, b=0.75) in
"oracle" scoring mode (float64, global stats, scores rounded).

The synthetic corpus text is lowercase [a-z0-9 ] so the engine's
tantivy-parity `default` tokenizer and SQL `string_split(text, ' ')`
produce identical token streams, which is what makes the SQL oracle of
an inverted-index engine possible at all.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quickwit_spark.index.builder import FieldConfig, IndexConfig, build_index
from quickwit_spark.query.ast import (
    Bool,
    Boost,
    FullText,
    MatchAll,
    Range,
    Term,
    Wildcard,
)
from quickwit_spark.search import aggs
from quickwit_spark.search.engine import IndexSearcher

# --------------------------------------------------------------------------
# corpus + index (cached per sf_dir)
# --------------------------------------------------------------------------

_IDX_ROOT = os.environ.get("QWS_ENTRY_IDX_ROOT", "/tmp/qws_entry_indexes")
_searchers: dict[str, IndexSearcher] = {}


def _corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.parquet → web corpus (url, warc_ts, text, lang + stored
    source/n_chars). Same derivation as sources/corpus.py, kept SQL-mirrorable."""
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id",
        F.concat(
            F.lit("https://site"),
            (F.col("doc_id") % 1000).cast("string"),
            F.lit(".example/p/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        (
            F.to_timestamp(F.lit("2024-01-01 00:00:00"))
            + F.make_interval(secs=(F.col("doc_id") * 97).cast("double"))
        ).alias("warc_ts"),
        "text",
        "lang",
        "source",
        "n_chars",
    )


def _searcher(spark: SparkSession, sf_dir: str) -> IndexSearcher:
    key = os.path.abspath(sf_dir)
    if key in _searchers:
        return _searchers[key]
    idx_dir = os.path.join(_IDX_ROOT, key.strip("/").replace("/", "_"))
    cfg = IndexConfig(
        fields=[FieldConfig("text"), FieldConfig("lang", tokenizer="raw")],
        doc_key="doc_id",
        num_partitions=4,
        stored_columns=("url", "lang", "source", "n_chars"),
        time_column="warc_ts",
    )
    # build_index is resumable/idempotent: committed batches are skipped,
    # so a cached index is reused and a partial one is completed.
    build_index(spark, _corpus(spark, sf_dir), idx_dir, cfg, job_id="entry")
    s = IndexSearcher(spark, idx_dir)
    _searchers[key] = s
    return s


def _topk(searcher: IndexSearcher, ast, k: int = 10, **kw) -> DataFrame:
    res = searcher.search(ast, k=k, mode="oracle", **kw)
    return res.select(
        "doc_key",
        F.round("score", 6).alias("score"),
        F.col("rank").cast("long").alias("rank"),
    )


# --------------------------------------------------------------------------
# BM25 oracle SQL generator
# --------------------------------------------------------------------------

_TOKS_CTE = """
toks AS (
  SELECT doc_id, term FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
  ) WHERE term <> ''
),
dl AS (SELECT doc_id, CAST(COUNT(*) AS DOUBLE) AS dl FROM toks GROUP BY doc_id),
stats AS (
  SELECT CAST((SELECT COUNT(*) FROM documents) AS DOUBLE) AS n,
         CAST((SELECT COUNT(*) FROM toks) AS DOUBLE) AS total
)"""


def _sql_quote(t: str) -> str:
    return "'" + t.replace("'", "''") + "'"


def _bm25_sql(
    scoring: list[tuple[str, float]],
    must: list[str] | None = None,
    must_not: list[str] | None = None,
    filter_sql: str | None = None,
    term_pred: str | None = None,
    k: int = 10,
) -> str:
    """Top-k BM25 oracle. `scoring` = [(term, boost)]; `must` terms are
    required (AND); `term_pred` overrides the term membership predicate
    (wildcard expansion); `filter_sql` is a predicate over `documents`."""
    # tf/df only need the SCORING terms; must/must_not are doc-set
    # predicates evaluated straight against `toks` below.
    pred = term_pred or (
        "term IN (" + ", ".join(_sql_quote(t) for t, _ in scoring) + ")"
    )
    boost_case = "1.0"
    boosted = [(t, b) for t, b in scoring if b != 1.0]
    if boosted:
        whens = " ".join(
            f"WHEN tf.term = {_sql_quote(t)} THEN {b!r}" for t, b in boosted
        )
        boost_case = f"CASE {whens} ELSE 1.0 END"
    conds = []
    for t in must or []:
        conds.append(
            f"doc_id IN (SELECT doc_id FROM toks WHERE term = {_sql_quote(t)})"
        )
    for t in must_not or []:
        conds.append(
            f"doc_id NOT IN (SELECT doc_id FROM toks WHERE term = {_sql_quote(t)})"
        )
    if filter_sql:
        conds.append(f"doc_id IN (SELECT doc_id FROM documents WHERE {filter_sql})")
    having = " AND ".join(conds) if conds else "TRUE"
    return f"""
WITH {_TOKS_CTE},
tf AS (
  SELECT doc_id, term, CAST(COUNT(*) AS DOUBLE) AS tf
  FROM toks WHERE {pred} GROUP BY doc_id, term
),
df AS (
  SELECT term, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS df
  FROM toks WHERE {pred} GROUP BY term
),
contrib AS (
  SELECT tf.doc_id,
         ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5)) * 2.2 * ({boost_case})
           * tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / (s.total / s.n))) AS sc
  FROM tf JOIN df USING (term) JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN stats s
),
scored AS (
  SELECT doc_id, ROUND(SUM(sc), 9) AS s9
  FROM contrib
  WHERE {having}
  GROUP BY doc_id
)
SELECT doc_id AS doc_key,
       ROUND(s9, 6) AS score,
       CAST(ROW_NUMBER() OVER (ORDER BY s9 DESC, doc_id DESC) AS BIGINT) AS rank
FROM scored
ORDER BY s9 DESC, doc_id DESC
LIMIT {k}
"""


def _and_sql(terms: list[str], k: int = 10) -> str:
    return _bm25_sql([(t, 1.0) for t in terms], must=list(terms), k=k)


_MATCH_TERM_SQL = """
WITH toks AS (
  SELECT doc_id, term FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
  ) WHERE term <> ''
)
SELECT d.doc_id AS doc_key, d.lang, d.source
FROM documents d
WHERE d.doc_id IN (SELECT doc_id FROM toks WHERE term = 'spark')
"""

_COUNT_TERM_SQL = """
WITH toks AS (
  SELECT doc_id, term FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
  ) WHERE term <> ''
)
SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS num_hits
FROM toks WHERE term = 'spark'
"""

_LIST_TERMS_SQL = """
WITH toks AS (
  SELECT doc_id, term FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
  ) WHERE term <> ''
)
SELECT DISTINCT term FROM toks
WHERE term >= 's' AND term < 't'
ORDER BY term LIMIT 100
"""

_AGG_MATCH_CTE = """
toks AS (
  SELECT doc_id, term FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
  ) WHERE term <> ''
),
m AS (
  SELECT d.* FROM documents d
  WHERE d.doc_id IN (SELECT doc_id FROM toks WHERE term = 'table')
)"""


# --------------------------------------------------------------------------
# query callables
# --------------------------------------------------------------------------

_TIME_HI = "2024-01-03 00:00:00"


def _q_term_topk(spark, sf_dir):
    return _topk(_searcher(spark, sf_dir), Term("text", "spark"))


def _q_or_topk(spark, sf_dir):
    return _topk(_searcher(spark, sf_dir), FullText("text", "spark join stream", "or"))


def _q_and_topk(spark, sf_dir):
    return _topk(_searcher(spark, sf_dir), FullText("text", "table join", "and"))


def _q_bool_mixed(spark, sf_dir):
    ast = Bool(
        must=[Term("text", "spark")],
        should=[Term("text", "join"), Term("text", "stream")],
        must_not=[Term("text", "slow")],
    )
    return _topk(_searcher(spark, sf_dir), ast)


def _q_boost(spark, sf_dir):
    ast = Bool(should=[Boost(Term("text", "join"), 2.0), Term("text", "stream")])
    return _topk(_searcher(spark, sf_dir), ast)


def _q_filter_time(spark, sf_dir):
    import datetime as dt

    hi = dt.datetime.fromisoformat(_TIME_HI)
    ast = Bool(must=[Term("text", "spark")], filter=[Range("warc_ts", lt=hi)])
    return _topk(_searcher(spark, sf_dir), ast)


def _q_filter_lang(spark, sf_dir):
    ast = Bool(must=[Term("text", "query")], filter=[Term("lang", "en")])
    return _topk(_searcher(spark, sf_dir), ast)


def _q_wildcard(spark, sf_dir):
    return _topk(_searcher(spark, sf_dir), Wildcard("text", "qu*"))


def _q_match_stream(spark, sf_dir):
    s = _searcher(spark, sf_dir)
    return s.search_stream(Term("text", "spark"), ["lang", "source"])


def _q_count_term(spark, sf_dir):
    n = _searcher(spark, sf_dir).count(Term("text", "spark"))
    return spark.createDataFrame([(n,)], "num_hits long")


def _q_count_all(spark, sf_dir):
    n = _searcher(spark, sf_dir).count(MatchAll())
    return spark.createDataFrame([(n,)], "num_hits long")


def _q_list_terms(spark, sf_dir):
    return _searcher(spark, sf_dir).list_terms("text", start="s", end="t", limit=100)


def _agg_match(spark, sf_dir, columns=None):
    return aggs.matches(_searcher(spark, sf_dir), Term("text", "table"), columns=columns)


def _q_agg_terms_lang(spark, sf_dir):
    return aggs.terms_agg(_agg_match(spark, sf_dir, ["lang"]), "lang", size=10)


def _q_agg_date_histogram(spark, sf_dir):
    return aggs.date_histogram(_agg_match(spark, sf_dir, ["warc_ts"]), "warc_ts", "day")


def _q_agg_histogram(spark, sf_dir):
    return aggs.histogram(_agg_match(spark, sf_dir, ["n_chars"]), "n_chars", 100.0)


def _q_agg_range(spark, sf_dir):
    return aggs.range_agg(
        _agg_match(spark, sf_dir, ["n_chars"]),
        "n_chars",
        [("short", None, 150), ("mid", 150, 300), ("long", 300, None)],
    )


def _q_agg_stats(spark, sf_dir):
    return aggs.stats_agg(_agg_match(spark, sf_dir, ["n_chars"]), "n_chars")


def _q_agg_cardinality(spark, sf_dir):
    return aggs.cardinality(_agg_match(spark, sf_dir, ["source"]), "source", exact=True)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: BM25 top-10 disjunction over the sf0.001 corpus with
    hit materialization (url/lang fetched from the docmap)."""
    s = _searcher(spark, "/root/testdata/sf0.001")
    res = s.search(
        FullText("text", "spark join stream", "or"), k=10, mode="oracle",
        fetch=["url", "lang"],
    )
    return res.select(
        "doc_key", F.round("score", 6).alias("score"), "rank", "url", "lang"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "search_term_topk": _q_term_topk,
        "search_or_topk": _q_or_topk,
        "search_and_topk": _q_and_topk,
        "search_bool_mixed": _q_bool_mixed,
        "search_boost": _q_boost,
        "search_filter_time": _q_filter_time,
        "search_filter_lang": _q_filter_lang,
        "search_wildcard": _q_wildcard,
        "match_stream_term": _q_match_stream,
        "count_term": _q_count_term,
        "count_all": _q_count_all,
        "list_terms_range": _q_list_terms,
        "agg_terms_lang": _q_agg_terms_lang,
        "agg_date_histogram": _q_agg_date_histogram,
        "agg_histogram_nchars": _q_agg_histogram,
        "agg_range_nchars": _q_agg_range,
        "agg_stats_nchars": _q_agg_stats,
        "agg_cardinality_source": _q_agg_cardinality,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "search_term_topk": _bm25_sql([("spark", 1.0)]),
        "search_or_topk": _bm25_sql([("spark", 1.0), ("join", 1.0), ("stream", 1.0)]),
        "search_and_topk": _and_sql(["table", "join"]),
        "search_bool_mixed": _bm25_sql(
            [("spark", 1.0), ("join", 1.0), ("stream", 1.0)],
            must=["spark"],
            must_not=["slow"],
        ),
        "search_boost": _bm25_sql([("join", 2.0), ("stream", 1.0)]),
        "search_filter_time": _bm25_sql(
            [("spark", 1.0)],
            must=["spark"],
            filter_sql=(
                "TIMESTAMP '2024-01-01 00:00:00' + INTERVAL (doc_id * 97) SECOND"
                f" < TIMESTAMP '{_TIME_HI}'"
            ),
        ),
        "search_filter_lang": _bm25_sql(
            [("query", 1.0)], must=["query"], filter_sql="lang = 'en'"
        ),
        "search_wildcard": _bm25_sql([], term_pred="term LIKE 'qu%'"),
        "match_stream_term": _MATCH_TERM_SQL,
        "count_term": _COUNT_TERM_SQL,
        "count_all": "SELECT CAST(COUNT(*) AS BIGINT) AS num_hits FROM documents",
        "list_terms_range": _LIST_TERMS_SQL,
        "agg_terms_lang": f"""
WITH {_AGG_MATCH_CTE}
SELECT CAST(lang AS VARCHAR) AS key, CAST(COUNT(*) AS BIGINT) AS doc_count
FROM m GROUP BY lang ORDER BY doc_count DESC, key ASC LIMIT 10
""",
        "agg_date_histogram": f"""
WITH {_AGG_MATCH_CTE}
SELECT CAST(date_trunc('day', TIMESTAMP '2024-01-01 00:00:00'
                          + INTERVAL (doc_id * 97) SECOND) AS TIMESTAMP) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS doc_count
FROM m GROUP BY 1 ORDER BY bucket
""",
        "agg_histogram_nchars": f"""
WITH {_AGG_MATCH_CTE}
SELECT CAST(FLOOR((n_chars - 0.0) / 100.0) * 100.0 + 0.0 AS DOUBLE) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS doc_count
FROM m GROUP BY 1 ORDER BY bucket
""",
        "agg_range_nchars": f"""
WITH {_AGG_MATCH_CTE}
SELECT key, CAST(COUNT(*) AS BIGINT) AS doc_count FROM (
  SELECT CASE WHEN n_chars < 150 THEN 'short'
              WHEN n_chars >= 150 AND n_chars < 300 THEN 'mid'
              ELSE 'long' END AS key
  FROM m
) GROUP BY key
""",
        "agg_stats_nchars": f"""
WITH {_AGG_MATCH_CTE}
SELECT CAST(COUNT(n_chars) AS BIGINT) AS count,
       CAST(MIN(n_chars) AS DOUBLE) AS min,
       CAST(MAX(n_chars) AS DOUBLE) AS max,
       CAST(SUM(n_chars) AS DOUBLE) AS sum,
       AVG(CAST(n_chars AS DOUBLE)) AS avg
FROM m
""",
        "agg_cardinality_source": f"""
WITH {_AGG_MATCH_CTE}
SELECT CAST(COUNT(DISTINCT source) AS BIGINT) AS value FROM m
""",
    }
