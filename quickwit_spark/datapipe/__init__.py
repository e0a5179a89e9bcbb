"""Large-scale training-data pipeline operators over the web corpus.

Beyond the reference's search operators (SURVEY.md §2), a 100 TB
corpus pipeline needs dedup, similarity search, text analysis, and
multimodal plumbing. Everything here is DataFrame-first: built-in
JVM expressions where possible, Arrow-vectorized UDFs otherwise,
never per-row Python.
"""

from quickwit_spark.datapipe import dedup, multimodal, similarity, textstats  # noqa: F401
