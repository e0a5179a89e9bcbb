"""Common-Crawl-style web corpus `(url, warc_ts, html, text, lang)`.

The engine's contract input (BASELINE input_hint) is an Iceberg table of
web pages. In this sandbox the corpus is DERIVED deterministically from
the driver-generated `documents.parquet` (doc_id, text, lang, source,
n_chars) — every derivation below is a pure column expression that an
independent SQL engine (DuckDB) reproduces verbatim, which is what makes
the oracle comparisons possible:

    url      = 'https://site<doc_id % 1000>.example/p/<doc_id>'
    warc_ts  = TIMESTAMP '2024-01-01' + doc_id * 97 seconds
    html     = '<!DOCTYPE html><html><head><title>doc <doc_id></title>'
               '</head><body><p>' || text || '</p></body></html>'  (utf-8)
    lang     = lang

`extract_text` recovers `text` from `html` BYTE-IDENTICALLY (the
per-url invariant the north rule requires; tested in
tests/test_corpus.py). Iceberg note: the runtime image has no Iceberg
jars, so tables are Parquet here; `read_corpus_table` goes through
`spark.read.format(...)` so an Iceberg catalog drops in unchanged.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

HTML_PREFIX = "<!DOCTYPE html><html><head><title>doc %s</title></head><body><p>"
HTML_SUFFIX = "</p></body></html>"

# equivalent DuckDB SQL for the same derivation (kept adjacent to the
# PySpark expressions so the two can't drift)
DUCKDB_CORPUS_SQL = """
SELECT
  'https://site' || (doc_id % 1000) || '.example/p/' || doc_id AS url,
  TIMESTAMP '2024-01-01' + INTERVAL (doc_id * 97) SECOND        AS warc_ts,
  doc_id,
  text,
  lang
FROM documents
"""


def read_corpus_table(spark: SparkSession, ref: str) -> DataFrame:
    """Input-table resolver for the engine's contract input (an
    Iceberg table of web pages with columns url/warc_ts/html/text/
    lang). Accepted forms:

      "iceberg:db.table" / "catalog.db.table" / any dotted name with
          no path separator → `spark.table(...)`: with the standard
          Iceberg catalog confs (`spark.sql.catalog.<name>` +
          `--packages org.apache.iceberg:iceberg-spark-runtime-...`)
          this IS an Iceberg scan — snapshot isolation, hidden
          partitioning, file pruning all come from the catalog, no
          engine change needed. This runtime image carries no Iceberg
          jar, so tests resolve through temp views instead.
      "parquet:/path" or any path-like string → `spark.read.parquet`,
          the sandbox stand-in with identical column semantics.

    Every downstream operator takes the returned DataFrame, so the
    Iceberg↔parquet choice stays entirely inside this function."""
    if ref.startswith("iceberg:"):
        return spark.table(ref[len("iceberg:"):])
    if ref.startswith("parquet:"):
        return spark.read.parquet(ref[len("parquet:"):])
    if "/" not in ref and "\\" not in ref:
        return spark.table(ref)
    return spark.read.parquet(ref)


def web_corpus(spark: SparkSession, sf_dir: str, with_html: bool = False) -> DataFrame:
    """documents.parquet → (doc_id, url, warc_ts, [html,] text, lang)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = docs.select(
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
    )
    if with_html:
        out = out.withColumn(
            "html",
            F.encode(
                F.concat(
                    F.lit("<!DOCTYPE html><html><head><title>doc "),
                    F.col("doc_id").cast("string"),
                    F.lit("</title></head><body><p>"),
                    F.col("text"),
                    F.lit(HTML_SUFFIX),
                ),
                "utf-8",
            ),
        )
    return out


def _extract_batch(html: pd.Series) -> pd.Series:
    def one(b: bytes) -> str:
        if b is None:
            return ""
        start = b.index(b"<p>") + 3
        end = b.rindex(b"</p>")
        return b[start:end].decode("utf-8")

    return html.map(one)


def extract_text(df: DataFrame, html_col: str = "html") -> DataFrame:
    """Recover `text` byte-identically from `html` (pinned extractor)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["extracted_text"] = _extract_batch(pdf[html_col])
            yield pdf

    from pyspark.sql.types import StringType, StructField, StructType

    # NB: StructType.add mutates — never call it on df.schema itself
    schema = StructType(df.schema.fields + [StructField("extracted_text", StringType())])
    return df.mapInPandas(run, schema)
