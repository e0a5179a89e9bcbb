"""quickwit_spark — a PySpark-native full-text indexing + BM25 search engine.

A brand-new engine with the query/data-processing capabilities of
Quickwit (studied read-only at /root/reference), re-expressed
Spark-first: web pages are tokenized with tantivy-parity analyzers
inside vectorized pandas/Arrow UDFs, turned into immutable per-partition
segments (sorted term dictionaries, delta-gap varint posting lists with
term frequencies, block-max metadata, quantized fieldnorms), and merged
hierarchically; BM25 top-k queries run with block-max WAND pruning and
reproduce the reference's ranking semantics (per-segment statistics,
desc-docid tie-break, missing-last sorting).

Layout:
    analysis/   tokenizers (tantivy `default` parity, whitespace, raw, ...)
    codec/      numpy varint/delta posting codec + fieldnorm quantization
    index/      segment builder (applyInPandas), manifest, merge policy
    query/      QueryAst dataclasses, query-string parser, ES DSL,
                tag-predicate extraction for split pruning
    search/     BM25 scorer, block-max WAND kernel, searcher (snippets,
                scroll, es_search+aggs DSL, msearch), aggregations
    datapipe/   training-data ops (dedup, ANN incl. multi-table LSH +
                IVF, text stats, multimodal plumbing)
    sources/    corpus derivation + Transform (VRL-analog ingest hook)
    streaming/  micro-batch indexing + watermarked analytics +
                applyInPandasWithState sessionization
"""

__version__ = "0.1.0"
